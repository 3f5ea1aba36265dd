"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Small inputs often arrive as one parquet file = one partition, which
    serializes every narrow stage (gram building, signature/embedding UDFs)
    onto a single core. Repartition up to the cluster's slot count; a no-op
    for big inputs that already carry enough partitions."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
