#!/usr/bin/env python
"""Zip the package for spark-submit --py-files distribution."""

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "finance_sc_relations_spark"
DIST = REPO / "dist"


def main() -> None:
    DIST.mkdir(exist_ok=True)
    out = DIST / "finance_sc_relations_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(PKG.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
