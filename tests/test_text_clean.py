"""Byte-identical cleaning invariant (BASELINE.md target row 2).

The Spark-side clean expression must reproduce the reference's
rm_special_char (src/utils/data_clean.py:5-6) byte-for-byte.
"""

import pandas as pd
from hypothesis import given, settings, strategies as st

from finance_sc_relations_spark.functions.text_clean import (
    clean_text_col,
    rm_special_char,
)

EDGE_CASES = [
    "",
    " ",
    "---",
    "[[[]]]",
    "a-b",
    "Hewlett-Packard reports [strong] results - again",
    "  leading and trailing  ",
    "- [ ] -",
    "tabs\tand\nnewlines stay",
    "\tleading tab",
    "trailing newline\n",
    "no specials at all",
    "[E1] tag-like [/E1] text",
    "unicode — dash stays, hyphen-goes",
]


def _spark_clean(spark, texts):
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    return [
        r["c"] for r in df.select(clean_text_col("text").alias("c")).collect()
    ]


def test_edge_cases_match_reference(spark):
    got = _spark_clean(spark, EDGE_CASES)
    expected = [rm_special_char(t) for t in EDGE_CASES]
    assert got == expected


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_property_match_reference(spark, texts):
    got = _spark_clean(spark, texts)
    expected = [rm_special_char(t) for t in texts]
    assert got == expected
