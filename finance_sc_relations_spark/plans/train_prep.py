"""Training-data preparation: stratified split, inverse augmentation, balance.

Spark forms of the reference's training pipeline steps:
- stratified split by (concept/Label) on unique sentence ids with re-expansion
  (split_data/spread_rows, src/utils/preprocess.py:356-447; train/valid idx
  disjointness asserted as in src/stages/data_split.py:60);
- inverse augmentation: tag-swapped copies with the inverse label
  (preprocessing_funcs.py:128-151);
- balance_relations: seeded downsampling of the majority class
  (preprocessing_funcs.py:153-180 — reference sampling is unseeded; ours is
  deterministic per the engine-wide policy).

All are DataFrame transforms: the split decision is made once per GROUP
(sentence id) so multi-position rows of one sentence never straddle the
train/valid boundary.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.relations import INVERSE_DICT


def stratified_split(
    df: DataFrame,
    index_col: str,
    stratify_by: Sequence[str],
    val_size: float = 0.2,
    seed: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Group-level stratified train/valid split.

    One row per index (first value of each stratum column), a deterministic
    per-stratum hash split, then re-expansion by joining back — the Spark
    form of split_data + spread_rows (preprocess.py:397-447). The split is a
    pure function of (seed, index value), so it is stable under
    repartitioning (F.rand would not be row-stable).
    """
    meta = df.groupBy(index_col).agg(
        *[F.first(c).alias(c) for c in stratify_by]
    )
    # per-stratum percent_rank over a seeded hash -> exact val fraction per
    # stratum (the stratification guarantee)
    from pyspark.sql import Window

    w = Window.partitionBy(*stratify_by).orderBy(
        F.xxhash64(F.col(index_col).cast("string"), F.lit(seed))
    )
    ranked = meta.withColumn("_pr", F.percent_rank().over(w))
    valid_idx = ranked.filter(F.col("_pr") < val_size).select(index_col)
    train_idx = ranked.filter(F.col("_pr") >= val_size).select(index_col)
    train = df.join(F.broadcast(train_idx), index_col, "inner")
    valid = df.join(F.broadcast(valid_idx), index_col, "inner")
    return train, valid


def inverse_augment(
    df: DataFrame, sents_col: str = "sents", label_col: str = "relations"
) -> DataFrame:
    """Append tag-swapped copies with the inverse label
    (preprocessing_funcs.py:128-151): [E1]<->[E2] swap via the 3-step rename
    expressed as a JVM-side translate-free regexp chain."""
    swapped = df
    for a, b in [("[E1]", "[E3]"), ("[/E1]", "[/E3]"), ("[E2]", "[E4]"),
                 ("[/E2]", "[/E4]"), ("[E4]", "[E1]"), ("[/E4]", "[/E1]"),
                 ("[E3]", "[E2]"), ("[/E3]", "[/E2]")]:
        swapped = swapped.withColumn(
            sents_col,
            F.replace(F.col(sents_col), F.lit(a), F.lit(b)),
        )
    inv_map = F.create_map(
        *[F.lit(x) for kv in INVERSE_DICT.items() for x in kv]
    )
    swapped = swapped.withColumn(label_col, inv_map[F.col(label_col)])
    return df.unionByName(swapped)


def balance_relations(
    df: DataFrame, label_col: str = "relations", seed: int = 42
) -> DataFrame:
    """Downsample every class to the minority class size via seeded
    per-class sampling (sampleBy) — the deterministic form of
    balance_relations (preprocessing_funcs.py:153-180)."""
    counts = {r[label_col]: r["count"] for r in df.groupBy(label_col).count().collect()}
    if not counts:
        return df
    target = min(counts.values())
    fractions = {k: min(target / v, 1.0) for k, v in counts.items()}
    return df.sampleBy(label_col, fractions, seed=seed)


def split_distribution_report(
    train: DataFrame,
    valid: DataFrame,
    stratify_by: Sequence[str],
) -> tuple[DataFrame, str]:
    """Per-(split, stratum, value) counts + fractions — the distribution
    report the reference logs after splitting (src/stages/data_split.py:62-70:
    value_counts()/len per stratify column, rendered to markdown).

    Returns (report DataFrame, markdown string). The DataFrame is one
    groupBy per stratum column over each split — map-side combinable counts,
    no extra shuffle beyond the aggs."""
    parts = []
    for split_name, df in (("train", train), ("valid", valid)):
        n = df.count()
        for col in stratify_by:
            parts.append(
                df.groupBy(F.col(col).cast("string").alias("value"))
                .agg(F.count("*").alias("count"))
                .select(
                    F.lit(split_name).alias("split"),
                    F.lit(col).alias("stratum"),
                    "value",
                    "count",
                    F.round(F.col("count") / F.lit(max(n, 1)), 4).alias("fraction"),
                )
            )
    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)

    pdf = report.toPandas().sort_values(["split", "stratum", "value"])
    lines = ["| split | stratum | value | count | fraction |",
             "|---|---|---|---|---|"]
    for r in pdf.itertuples(index=False):
        lines.append(
            f"| {r.split} | {r.stratum} | {r.value} | {r.count} | {r.fraction} |"
        )
    return report, "\n".join(lines)
