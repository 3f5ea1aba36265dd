"""Stateful streaming dedup: emit each document fingerprint once, ever.

A custom stateful operator via applyInPandasWithState (the Structured
Streaming extension point for operators the built-ins can't express —
cross-micro-batch exact dedup here): state per fingerprint remembers that it
was seen; later arrivals of the same fingerprint are dropped. At scale the
state store is partitioned by the fingerprint hash and each key's state is a
single boolean + timestamp, so state size is O(distinct docs) with optional
timeout-based eviction.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUTPUT = StructType(
    [
        StructField("fingerprint", StringType(), False),
        StructField("doc_id", LongType(), False),
    ]
)
_STATE = StructType([StructField("seen", LongType(), False)])


def _dedup_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # fingerprint already emitted in an earlier micro-batch
        for _ in pdfs:
            pass
        return
    first_id = None
    for pdf in pdfs:
        batch_min = int(pdf["doc_id"].min())
        first_id = batch_min if first_id is None else min(first_id, batch_min)
    state.update((1,))
    if first_id is not None:
        yield pd.DataFrame({"fingerprint": [key[0]], "doc_id": [first_id]})


def streaming_exact_dedup(doc_stream: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_stream(doc_id, text) -> one row per first-ever-seen fingerprint.

    Grouping key = the md5 fingerprint (same normalization as the batch
    exact-dedup tier, operators/text_stats.fingerprint_col)."""
    from ..operators.text_stats import fingerprint_col

    fp = doc_stream.select(
        "doc_id", fingerprint_col(text_col).alias("fingerprint")
    )
    return fp.groupBy("fingerprint").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_OUTPUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
