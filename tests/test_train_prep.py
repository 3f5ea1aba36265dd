"""Stratified split / inverse augmentation / balancing (§2.7 train-side ops)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from finance_sc_relations_spark.plans.train_prep import (
    balance_relations,
    inverse_augment,
    stratified_split,
)


@pytest.fixture(scope="module")
def labeled(spark):
    rows = []
    for idx in range(200):
        label = ["supplier", "customer", "other"][idx % 3]
        stratum = "A" if idx % 2 == 0 else "B"
        for pos in range(2):  # two position-rows per sentence id
            rows.append((idx, f"[E1] x{idx} [/E1] sup [E2] y{idx} [/E2] p{pos}",
                         label, stratum))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["idx", "sents", "relations", "stratum"])
    )


def test_stratified_split_disjoint_and_proportional(spark, labeled):
    train, valid = stratified_split(labeled, "idx", ["stratum", "relations"], 0.25)
    ti = {r["idx"] for r in train.select("idx").distinct().collect()}
    vi = {r["idx"] for r in valid.select("idx").distinct().collect()}
    assert ti.isdisjoint(vi)  # data_split.py:60 invariant
    assert len(ti) + len(vi) == 200
    # group integrity: both position rows travel together
    assert train.count() == 2 * len(ti)
    # proportional per stratum (+-1 by rounding)
    frac = len(vi) / 200
    assert 0.18 <= frac <= 0.32


def test_stratified_split_deterministic(spark, labeled):
    t1, v1 = stratified_split(labeled, "idx", ["stratum"], 0.2, seed=7)
    t2, v2 = stratified_split(labeled, "idx", ["stratum"], 0.2, seed=7)
    assert sorted(r["idx"] for r in v1.select("idx").distinct().collect()) == sorted(
        r["idx"] for r in v2.select("idx").distinct().collect()
    )


def test_inverse_augment_swaps_tags_and_labels(spark, labeled):
    out = inverse_augment(labeled)
    assert out.count() == 2 * labeled.count()
    sup = labeled.filter(F.col("relations") == "supplier").count()
    cus_aug = out.filter(F.col("relations") == "customer").count()
    cus_orig = labeled.filter(F.col("relations") == "customer").count()
    assert cus_aug == cus_orig + sup  # every supplier row gains a customer twin
    swapped = out.exceptAll(labeled).limit(1).collect()[0]["sents"]
    assert "[E2] x" in swapped and "[E1] y" in swapped


def test_balance_relations_downsamples(spark):
    rows = [(i, "s", "supplier") for i in range(300)] + [
        (i + 1000, "s", "other") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "idx long, sents string, relations string")
    balanced = balance_relations(df, seed=3)
    counts = {r["relations"]: r["count"]
              for r in balanced.groupBy("relations").count().collect()}
    assert counts["other"] == 60
    assert counts["supplier"] <= 90  # sampled toward the minority size


def test_split_distribution_report_matches_pandas(spark):
    import pandas as pd

    from finance_sc_relations_spark.plans.train_prep import (
        split_distribution_report,
        stratified_split,
    )

    pdf = pd.DataFrame(
        {
            "idx": range(200),
            "relations": ["supplier", "customer", "other", "supplier"] * 50,
        }
    )
    df = spark.createDataFrame(pdf)
    train, valid = stratified_split(df, "idx", ["relations"], val_size=0.25)
    report, md = split_distribution_report(train, valid, ["relations"])
    got = report.toPandas()
    tr = train.toPandas()
    expected_tr = tr["relations"].value_counts()
    for label, cnt in expected_tr.items():
        row = got[(got.split == "train") & (got.value == label)]
        assert int(row["count"].iloc[0]) == cnt
        assert abs(float(row["fraction"].iloc[0]) - cnt / len(tr)) < 1e-3
    assert md.startswith("| split |") and "supplier" in md
