"""G9 cross-cleaner: stratified folds, out-of-fold scoring, confident-learning
label issues, multi-model vote agreement."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from finance_sc_relations_spark.fixtures import generate_eval_pairs
from finance_sc_relations_spark.plans.cross_clean import (
    assign_folds,
    label_issues,
    out_of_fold_scores,
    vote_agreement,
)
from finance_sc_relations_spark.plans.evaluate import tag_eval_pairs


def test_assign_folds_stratified_and_deterministic(spark):
    pdf = pd.DataFrame(
        {"idx": range(400), "label": (["supplier"] * 3 + ["other"]) * 100}
    )
    df = spark.createDataFrame(pdf)
    folded = assign_folds(df, "idx", "label", n_folds=4).toPandas()
    assert set(folded["fold"]) == {0, 1, 2, 3}
    # stratification: each fold keeps ~75/25 label mix
    for f in range(4):
        part = folded[folded.fold == f]
        frac = (part.label == "supplier").mean()
        assert 0.65 <= frac <= 0.85
    # determinism
    again = assign_folds(df, "idx", "label", n_folds=4).toPandas()
    assert folded.sort_values("idx").fold.tolist() == again.sort_values("idx").fold.tolist()


@pytest.fixture(scope="module")
def oof_with_flips(spark):
    gold_pdf = generate_eval_pairs(120)
    gold = spark.createDataFrame(gold_pdf)
    tagged = tag_eval_pairs(gold)
    # given labels = the true relationship per r_id; flip every 10th to the
    # inverse (planted label errors)
    from finance_sc_relations_spark.plans.evaluate import _eval_rid

    gold_pdf = gold_pdf.copy()
    gold_pdf["r_id"] = [
        _eval_rid(s, f, c)
        for s, f, c in zip(gold_pdf.Sentence, gold_pdf.Filer, gold_pdf.Company)
    ]
    gold_pdf = gold_pdf.drop_duplicates(subset=["r_id"]).reset_index(drop=True)
    inv = {"supplier": "customer", "customer": "supplier", "other": "other"}
    flipped = set()
    rels = []
    for i, row in gold_pdf.iterrows():
        if i % 10 == 0 and row.Relationship != "other":
            rels.append(inv[row.Relationship])
            flipped.add(row.r_id)
        else:
            rels.append(row.Relationship)
    labels = spark.createDataFrame(
        pd.DataFrame({"r_id": gold_pdf.r_id, "relations": rels})
    )
    tagged_lab = tagged.join(labels, "r_id", "inner")
    folded = assign_folds(tagged_lab, "r_id", "relations", n_folds=3)
    oof = out_of_fold_scores(folded)
    return oof, flipped


def test_label_issues_flag_planted_flips(spark, oof_with_flips):
    oof, flipped = oof_with_flips
    issues = label_issues(oof).toPandas()
    orig = issues[~issues.r_id.str.endswith("_inv")]
    flagged = set(orig[orig.is_label_issue].r_id)
    # every planted flip is confidently contradicted out-of-fold
    hit = len(flagged & flipped) / max(len(flipped), 1)
    assert hit >= 0.9, (hit, len(flipped))
    # false-positive rate on clean rows stays low
    clean = set(orig.r_id) - flipped
    fp = len(flagged - flipped) / max(len(clean), 1)
    assert fp <= 0.1, fp
    # worst rows sort first
    assert issues.label_score.is_monotonic_increasing


def test_vote_agreement(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "m0": ["supplier", "supplier", "other"],
            "m1": ["supplier", "customer", "other"],
            "m2": ["supplier", "customer", "other"],
            "m0_s": [0.9, 0.4, 0.8],
            "m1_s": [0.8, 0.6, 0.7],
            "m2_s": [0.7, 0.5, 0.9],
        }
    )
    out = vote_agreement(
        spark.createDataFrame(pdf),
        model_cols=["m0", "m1", "m2"],
        score_cols=["m0_s", "m1_s", "m2_s"],
    ).toPandas().set_index("id")
    assert out.loc[1, "agreed_label"] == "supplier"
    assert pd.isna(out.loc[2, "agreed_label"])
    assert out.loc[2, "higher_confident"] == "customer"  # 1.1 vs 0.4
    assert out.loc[3, "agreed_label"] == "other"
    assert abs(out.loc[1, "max_conf"] - 0.8) < 1e-6


def test_empty_inputs_no_crash(spark):
    from finance_sc_relations_spark.operators.graph import pagerank
    from finance_sc_relations_spark.schemas import PAIRS

    empty_edges = spark.createDataFrame([], "subj_id string, obj_id string")
    assert pagerank(empty_edges, iterations=2).count() == 0
    empty_tagged = spark.createDataFrame(
        [], "fold int, url string, sentence_id string, r_id string, "
            "sents string, entity1 string, entity2 string, "
            "org_groups map<string,int>, relations string"
    )
    assert out_of_fold_scores(empty_tagged).count() == 0
