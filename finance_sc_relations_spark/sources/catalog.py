"""Table-format layer: Iceberg when available, partitioned parquet otherwise.

The reference persists everything as Glue-registered Parquet with
partition-overwrite semantics (wr.s3.to_parquet mode="overwrite_partitions",
src/sagemaker/re_inference.py:148-171; schema/partition defs
src/glue/glue_etl.py:93-133) and ingests incrementally by anti-joining
requested file ids against a logs table (glue_etl.py:649-679, 722-789).

This module provides the same three capabilities Spark-natively:
- `TableCatalog.write/overwrite_partitions/append` — dynamic partition
  overwrite (spark.sql.sources.partitionOverwriteMode=dynamic is set by
  session.build_session), which is Iceberg's overwritePartitions() on a
  parquet fallback;
- `read` with partition pruning (Catalyst handles predicate pushdown);
- `incremental_ingest` — left_anti against the already-ingested key set.

When an Iceberg runtime jar + catalog are configured on the cluster
(spark.sql.catalog.* set), the same calls route through `writeTo(...)`,
gaining snapshot isolation and time travel; this sandbox has no Iceberg jar,
so the parquet path is what tests exercise.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: SLF001
        return True
    except Exception:
        return False


class TableCatalog:
    def __init__(self, spark: SparkSession, warehouse: str | Path,
                 catalog_name: str | None = None):
        self.spark = spark
        self.warehouse = Path(warehouse)
        self.warehouse.mkdir(parents=True, exist_ok=True)
        self.iceberg = catalog_name is not None and _iceberg_available(spark)
        self.catalog_name = catalog_name

    def _path(self, table: str) -> str:
        return str(self.warehouse / table)

    def _qualified(self, table: str) -> str:
        return f"{self.catalog_name}.{table}"

    # -- writes -------------------------------------------------------------

    def create_or_replace(
        self, df: DataFrame, table: str, partition_by: Sequence[str] = ()
    ) -> None:
        if self.iceberg:
            w = df.writeTo(self._qualified(table)).using("iceberg")
            for c in partition_by:
                w = w.partitionedBy(F.col(c))
            w.createOrReplace()
            return
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(table))

    def overwrite_partitions(
        self, df: DataFrame, table: str, partition_by: Sequence[str] = ()
    ) -> None:
        """Dynamic partition overwrite: only partitions present in df are
        replaced (K1, re_inference.py:148-171)."""
        if self.iceberg:
            df.writeTo(self._qualified(table)).overwritePartitions()
            return
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        # partitionOverwriteMode=dynamic (session config) scopes the
        # overwrite to the partitions present in df
        writer.parquet(self._path(table))

    def append(self, df: DataFrame, table: str, partition_by: Sequence[str] = ()) -> None:
        if self.iceberg:
            df.writeTo(self._qualified(table)).append()
            return
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(table))

    # -- reads ----------------------------------------------------------------

    def read(self, table: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(self._qualified(table))
        return self.spark.read.parquet(self._path(table))

    def exists(self, table: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(self._qualified(table))
        p = Path(self._path(table))
        return p.exists() and any(p.rglob("*.parquet"))

    # -- bucketed tables (co-located joins) -----------------------------------

    def write_bucketed(
        self, df: DataFrame, table: str, bucket_col: str, n_buckets: int = 16
    ) -> None:
        """Bucket + sort by the join key so later equi-joins on that key are
        planned WITHOUT a shuffle on either side (SortMergeJoin reads
        co-located buckets). This is the parquet-table form; Iceberg's
        bucket(n, col) partition transform is the catalog form."""
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .option("path", self._path(table))
            .saveAsTable(table)
        )

    def read_table(self, table: str) -> DataFrame:
        """Read a saveAsTable-registered (possibly bucketed) table."""
        return self.spark.read.table(table)

    # -- incremental ingest (S8) ---------------------------------------------

    def incremental_ingest(
        self,
        incoming: DataFrame,
        table: str,
        key: str,
        partition_by: Sequence[str] = (),
    ) -> int:
        """Append only rows whose `key` is not already in `table`
        (anti-join incremental ingest, glue_etl.py:722-789). Returns the
        number of newly ingested rows."""
        if self.exists(table):
            existing_keys = self.read(table).select(key).distinct()
            fresh = incoming.join(existing_keys, key, "left_anti")
        else:
            fresh = incoming
        n = fresh.count()
        if n > 0:
            self.append(fresh, table, partition_by)
        return n
