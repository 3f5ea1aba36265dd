"""Stage 4: supply-chain sentence gate (C1-C4).

Reference: binary sec-bert classifier scored in batch
(src/sc_classifier/trainer.py:512-569), gated in production by
`supply_label == 1` (src/sagemaker/re_inference.py:96) and in the notebook by
`sc_label == 1 and sc_score > 0.95` (DemoNotebooks/re_with_glue.ipynb cell 21).

Runs BEFORE pair fan-out: sentences without supply cues never pay the
C(groups,2) x positions expansion — the cheap->expensive ordering the
reference implements manually (SURVEY.md §4 "early selectivity gates").
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import FloatType, IntegerType, StructField, StructType

from .models import get_sc_model


def sc_classify(mentions: DataFrame) -> DataFrame:
    """Append (sc_label, sc_score) columns via an Arrow-batched scorer."""
    schema = StructType(
        mentions.schema.fields
        + [
            StructField("sc_label", IntegerType(), False),
            StructField("sc_score", FloatType(), False),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = get_sc_model()
        for batch in batches:
            if len(batch) == 0:
                continue
            scores = model.score_batch(batch["sentence"].tolist())
            out = batch.copy()
            out["sc_label"] = scores.argmax(axis=1).astype("int32")
            out["sc_score"] = scores.max(axis=1).astype("float32")
            yield out

    return mentions.mapInPandas(_map, schema=schema)


def sc_gate(classified: DataFrame, threshold: float = 0.95) -> DataFrame:
    """`sc_label == 1 and sc_score > threshold` (re_with_glue.ipynb cell 21;
    src/sagemaker/re_inference.py:96-97)."""
    return classified.filter(
        (F.col("sc_label") == 1) & (F.col("sc_score") > threshold)
    )
