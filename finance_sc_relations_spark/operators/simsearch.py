"""Approximate-nearest-neighbor search over an embedding column.

Two tiers (SURVEY.md training-data ops; reference analog: the FAISS
IndexFlatIP / IVF matcher, src/matcher/core.py:222-300):
- brute-force cosine top-k — JVM-side zip_with/aggregate dot products +
  window top-k. The exact baseline; O(n_queries x n_corpus).
- random-hyperplane LSH — deterministic hyperplanes from a seed; corpus and
  queries bucketed by per-band signbit signatures; candidates only meet
  inside a bucket, then exact cosine rerank. This is the 100 TB path: the
  shuffle key is (band, bucket) and bucket sizes are bounded.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..util import ensure_parallelism as _parallelize
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _dot(a: str, b: str) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(col: str) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(col), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, vec_id, cosine, rank).

    Self-matches (same id) are excluded. The corpus side is the big side;
    queries are broadcast when small."""
    c = _parallelize(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        _norm(vec_col).alias("cnorm"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(vec_col).alias("qnorm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine", F.round(_dot("cvec", "qvec") / (F.col("cnorm") * F.col("qnorm")), 4)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def lsh_signatures(
    df: DataFrame,
    dim: int,
    bands: int = 8,
    bits_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket) — signbit signatures under deterministic random
    hyperplanes, one bucket value per band."""
    n_planes = bands * bits_per_band
    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("band", IntegerType(), False),
            StructField("bucket", LongType(), False),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = _hyperplanes(dim, n_planes, seed)
        weights = (1 << np.arange(bits_per_band, dtype=np.int64))
        for batch in batches:
            if len(batch) == 0:
                continue
            vecs = np.stack(batch[vec_col].to_numpy())
            bits = (vecs @ planes.T) > 0  # (n, n_planes)
            ids = batch[id_col].astype("int64").to_numpy()
            rows = {"id": np.repeat(ids, bands),
                    "band": np.tile(np.arange(bands, dtype=np.int32), len(ids)),
                    "bucket": (
                        bits.reshape(len(ids), bands, bits_per_band) @ weights
                    ).reshape(-1)}
            yield pd.DataFrame(rows)

    return _parallelize(
        df.select(F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col))
    ).mapInPandas(_map, schema=schema)


def _collect_training_sample(
    corpus: DataFrame, max_sample_rows: int, seed: int, vec_col: str
) -> np.ndarray:
    """Driver-side training matrix, hard-bounded at max_sample_rows rows
    regardless of corpus size (sample to ~the target, then cap exactly)."""
    sample = corpus.select(vec_col)
    n = sample.count()
    if n > max_sample_rows:
        sample = sample.sample(
            fraction=min(1.0, 1.05 * max_sample_rows / n), seed=seed
        ).limit(max_sample_rows)
    return np.stack(sample.toPandas()[vec_col].to_numpy()).astype(np.float32)


def train_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 16,
    max_sample_rows: int = 100_000,
    iterations: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic k-means centroids for IVF cells (the FAISS IndexIVF
    analog, src/matcher/core.py:266-292): Lloyd iterations over a driver-side
    sample that is HARD-BOUNDED at max_sample_rows — the driver never
    materializes the corpus (a 10^12-row toPandas() would OOM instantly).
    Centroid count follows faiss's ~sqrt(n) guidance."""
    mat = _collect_training_sample(corpus, max_sample_rows, seed, vec_col)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(iterations):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    return centroids


def _assign_cells(df: DataFrame, centroids: np.ndarray, n_probe: int,
                  id_col: str, vec_col: str) -> DataFrame:
    """(id, cell) rows — top-n_probe nearest centroids per vector."""
    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("cell", IntegerType(), False),
        ]
    )
    bc_c = df.sparkSession.sparkContext.broadcast(centroids)

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc_c.value
        for batch in batches:
            if len(batch) == 0:
                continue
            vecs = np.stack(batch[vec_col].to_numpy()).astype(np.float32)
            vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            sims = vecs @ cents.T
            top = np.argsort(-sims, axis=1)[:, :n_probe]
            ids = batch[id_col].astype("int64").to_numpy()
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, n_probe),
                    "cell": top.reshape(-1).astype("int32"),
                }
            )

    return _parallelize(df).mapInPandas(_map, schema=schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN: corpus vectors live in their single nearest cell; queries
    probe their n_probe nearest cells; candidates meet on the cell key and
    rerank by exact cosine. Recall grows with n_probe; the shuffle key is
    the cell id (bounded cardinality, AQE-coalesced)."""
    centroids = train_ivf_centroids(corpus, dim, n_cells, seed=seed, vec_col=vec_col)
    c_cells = _assign_cells(corpus, centroids, 1, id_col, vec_col).withColumnRenamed(
        "id", "vec_id"
    )
    q_cells = _assign_cells(queries, centroids, n_probe, query_id_col, vec_col)
    q_cells = q_cells.withColumnRenamed("id", "query_id")
    cand = (
        c_cells.join(q_cells, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"),
        _norm(vec_col).alias("cnorm"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        _norm(vec_col).alias("qnorm"),
    )
    scored = (
        cand.join(c, "vec_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cosine",
            F.round(_dot("cvec", "qvec") / (F.col("cnorm") * F.col("qnorm")), 4),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bands: int = 8,
    bits_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k: bucket-join candidates on any shared (band, bucket), exact
    cosine rerank within candidates. Recall is tunable via bands/bits."""
    csig = lsh_signatures(corpus, dim, bands, bits_per_band, seed, id_col, vec_col)
    qsig = lsh_signatures(queries, dim, bands, bits_per_band, seed, query_id_col, vec_col)
    cand = (
        csig.withColumnRenamed("id", "vec_id")
        .join(qsig.withColumnRenamed("id", "query_id"), ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        _norm(vec_col).alias("cnorm"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(vec_col).alias("qnorm"),
    )
    scored = (
        cand.join(c, "vec_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cosine",
            F.round(_dot("cvec", "qvec") / (F.col("cnorm") * F.col("qnorm")), 4),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
