"""Text cleaning — the byte-identical invariant of the whole pipeline.

Reference: ``rm_special_char`` in src/utils/data_clean.py:5-6 ::

    re.sub('[-[\\] ]+', ' ', x).strip()

i.e. collapse any run of hyphen / '[' / ']' / space into a single space, then
strip.  This is the ONLY cleaning applied before NER
(src/language_model/spacy_loader.py:150,370), so our Spark-side expression
must reproduce it byte-for-byte per url (BASELINE.json input_hint).

The Spark form stays JVM-side (regexp_replace + trim) — no Python in the hot
path. Java and Python regex semantics agree for this class + quantifier.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact pattern from src/utils/data_clean.py:6 — a character class of
# {'-', '[', ']', ' '} repeated, replaced by a single space.
CLEAN_PATTERN = "[-\\[\\] ]+"
_PY_CLEAN_RE = re.compile(r"[-[\] ]+")


def rm_special_char(text: str) -> str:
    """Reference implementation, run in-process (oracle for tests)."""
    return _PY_CLEAN_RE.sub(" ", text).strip()


def clean_text_col(col: Column | str) -> Column:
    """JVM-side equivalent of ``rm_special_char`` (src/utils/data_clean.py:5-6).

    Python ``str.strip()`` strips all unicode whitespace — including the
    \\x1c-\\x1f separators that Java's (?U)\\s does not cover — so the strip
    regex is (?U)\\s plus that range, not ``trim``.
    """
    c = F.col(col) if isinstance(col, str) else col
    collapsed = F.regexp_replace(c, CLEAN_PATTERN, " ")
    strip_class = "[\\s\\x1c-\\x1f]"
    return F.regexp_replace(
        collapsed, f"(?U)^{strip_class}+|(?U){strip_class}+$", ""
    )
