import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from finance_sc_relations_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="fsr-tests", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def fixture_corpus():
    """Deterministic 300-page corpus (pages_pdf, gold_pdf, companies_pdf)."""
    from finance_sc_relations_spark.fixtures import generate_corpus

    return generate_corpus(300)
