"""G9 cross-cleaner: out-of-fold label-issue detection for training data.

Port of src/data_cleansing/cross_cleaner.py:83-540 re-expressed Spark-first:

- cross_split (cross_cleaner.py:85-200) -> `assign_folds`: deterministic
  k-fold assignment, stratified per label, group-level on the sentence index
  so multi-position rows never straddle folds. The reference slices
  contiguous chunks per stratum; we hash-bucket (same stratification
  guarantee, stable under repartitioning).
- process_folds (cross_cleaner.py:368-436) -> `out_of_fold_scores`: every
  row is scored by the model that did NOT see its fold (per-fold model
  broadcasts plug into the same BatchModel seam; the deterministic scorer
  needs no training, so the default uses one model for all folds), with the
  reference's inverse augmentation and multi-position mean.
- generate_issues_report (cross_cleaner.py:501-524, cleanlab Datalab) ->
  `label_issues`: confident-learning issue detection from out-of-fold
  pred_probs — per-class confidence thresholds (mean self-confidence of
  rows carrying the class), a row is an issue when a DIFFERENT class is
  predicted above that class's threshold; ranked by self-confidence
  (cleanlab's `label_score`). Pure Catalyst: per-class AVG aggregates for
  thresholds folded back as literals, no driver-side row loops.
- search_candidates vote agreement (cross_cleaner.py:469-496) ->
  `vote_agreement`: per-row multi-model agreement + score-weighted vote.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.relations import INVERSE_DICT, LABELS


def assign_folds(
    df: DataFrame,
    index_col: str,
    stratify_by: str,
    n_folds: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Append a `fold` column (0..n_folds-1): per-stratum percent_rank over
    a seeded hash, cut into n_folds equal slices — every fold carries the
    stratum proportions of the whole set (the cross_split guarantee)."""
    from pyspark.sql import Window

    meta = df.groupBy(index_col).agg(F.first(stratify_by).alias("_stratum"))
    w = Window.partitionBy("_stratum").orderBy(
        F.xxhash64(F.col(index_col).cast("string"), F.lit(seed))
    )
    folds = meta.withColumn(
        "fold",
        F.least(
            F.floor(F.percent_rank().over(w) * n_folds).cast("int"),
            F.lit(n_folds - 1),
        ),
    ).select(index_col, "fold")
    return df.join(folds, index_col, "inner")


def _swap_tags_col(col) -> F.Column:
    """JVM-side [E1]<->[E2] swap — the 3-step rename of
    functions.tagging.inverse_relations, kept in Catalyst (no Python UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    for a, b in (("[E1]", "[E3]"), ("[/E1]", "[/E3]"), ("[E2]", "[E4]"),
                 ("[/E2]", "[/E4]"), ("[E4]", "[E1]"), ("[/E4]", "[/E1]"),
                 ("[E3]", "[E2]"), ("[/E3]", "[/E2]")):
        c = F.replace(c, F.lit(a), F.lit(b))
    return c


def out_of_fold_scores(
    tagged: DataFrame,
    label_col: str = "relations",
    sent_col: str = "sents",
    fold_models: dict | None = None,
    mutate: bool = True,
) -> DataFrame:
    """Score every row OUT-OF-FOLD: fold i is scored by fold_models[i] (a
    broadcast from models.serialize_model, trained WITHOUT fold i); with no
    fold_models the deterministic scorer stands in for every fold (it sees
    no training data, so every fold is out-of-fold by construction).

    Applies the reference's inverse augmentation first (process_folds:
    tag-swapped copies with the inverse label, 'other' rows excluded); the
    augmented copy gets its own r_id so the position-mean never mixes an
    original with its swap. Input needs columns (fold, url, sentence_id,
    r_id, sents, entity1, entity2, org_groups, <label_col>). Returns one row
    per r_id: scores (position-mean pred_probs), prediction, given label.
    """
    from ..operators.re_classifier import aggregate_positions, score_pairs

    inv_map = F.create_map(*[F.lit(x) for kv in INVERSE_DICT.items() for x in kv])
    aug = (
        tagged.filter(F.col(label_col) != "other")
        .withColumn("r_id", F.concat(F.col("r_id"), F.lit("_inv")))
        .withColumn(sent_col, _swap_tags_col(sent_col))
        .withColumn(label_col, F.coalesce(inv_map[F.col(label_col)], F.col(label_col)))
    )
    augmented = tagged.unionByName(aug)

    folds = (
        sorted(fold_models)
        if fold_models
        else [r["fold"] for r in augmented.select("fold").distinct().collect()]
    )
    if not folds:  # empty input — return an empty frame with the contract schema
        spark = tagged.sparkSession
        return spark.createDataFrame(
            [], f"r_id string, scores array<float>, prediction string, {label_col} string"
        )
    scored = None
    for fold in folds:
        part = augmented.filter(F.col("fold") == fold).select(
            "url", "sentence_id", "r_id", "sents", "entity1", "entity2",
            "org_groups",
        )
        s = score_pairs(
            part, mutate=mutate, reverse=False,
            model_broadcast=(fold_models or {}).get(fold),
        )
        scored = s if scored is None else scored.unionByName(s)
    agg = aggregate_positions(scored).select(
        "r_id", "scores", F.col("relation").alias("prediction")
    )
    labels = augmented.select("r_id", label_col).dropDuplicates(["r_id"])
    return agg.join(labels, "r_id", "inner")


def label_issues(
    oof: DataFrame,
    label_col: str = "relations",
    labels: Sequence[str] = tuple(LABELS),
) -> DataFrame:
    """Confident-learning label issues from out-of-fold pred_probs.

    Per-class threshold t_c = mean over rows GIVEN class c of p[c] (the
    confident-joint thresholds of Northcutt et al., what cleanlab's Datalab
    computes for `is_label_issue`). A row is flagged when some OTHER class j
    reaches p[j] >= t_j — the out-of-fold model confidently asserts a
    different label. label_score = p[given label] (self-confidence),
    ascending = worst first (cross_cleaner.py:514's sort)."""
    probs = oof.select(
        "r_id", label_col, "prediction", "scores",
        *[F.col("scores")[i].alias(f"_p_{lab}") for i, lab in enumerate(labels)],
    )
    thr_row = probs.groupBy().agg(
        *[
            F.avg(F.when(F.col(label_col) == lab, F.col(f"_p_{lab}"))).alias(lab)
            for lab in labels
        ]
    ).collect()[0]
    confident_other = F.lit(False)
    for lab in labels:
        t = thr_row[lab] if thr_row[lab] is not None else 2.0  # class unattained
        confident_other = confident_other | (
            (F.col(label_col) != lab) & (F.col(f"_p_{lab}") >= F.lit(t))
        )
    self_conf = F.lit(0.0)
    for lab in labels:
        self_conf = F.when(F.col(label_col) == lab, F.col(f"_p_{lab}")).otherwise(
            self_conf
        )
    return (
        probs.withColumn("is_label_issue", confident_other)
        .withColumn("label_score", F.round(self_conf, 4))
        .select("r_id", label_col, "prediction", "is_label_issue", "label_score")
        .orderBy("label_score")
    )


def vote_agreement(
    predictions: DataFrame,
    model_cols: Sequence[str],
    score_cols: Sequence[str],
) -> DataFrame:
    """search_candidates' agreement pass (cross_cleaner.py:469-496):
    agreed_label when every model emits the same label (else null), plus the
    score-weighted vote winner (higher_confident) and its mean confidence
    (max_conf) — rows sort ascending by max_conf for review, worst first."""
    from pyspark.sql import Window

    all_agree = F.lit(True)
    for c in model_cols[1:]:
        all_agree = all_agree & (F.col(c) == F.col(model_cols[0]))
    out = predictions.withColumn(
        "agreed_label", F.when(all_agree, F.col(model_cols[0]))
    )
    votes = out.withColumn(
        "_v",
        F.explode(
            F.array(
                *[
                    F.struct(F.col(m).alias("lab"), F.col(s).alias("sc"))
                    for m, s in zip(model_cols, score_cols)
                ]
            )
        ),
    )
    per_label = votes.groupBy(*out.columns, F.col("_v.lab").alias("_lab")).agg(
        F.sum("_v.sc").alias("_total")
    )
    w = Window.partitionBy(*out.columns).orderBy(
        F.col("_total").desc(), F.col("_lab").asc()
    )
    return (
        per_label.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *out.columns,
            F.col("_lab").alias("higher_confident"),
            F.round(F.col("_total") / len(model_cols), 4).alias("max_conf"),
        )
    )
