"""Gold-eval harness: P/R >= 0.95 on the fixture gold set (BASELINE.md target;
reference operating point: 0.914 acc @ 0.95 gate, stages.ipynb cell 47)."""

import pytest

from finance_sc_relations_spark.fixtures import generate_eval_pairs
from finance_sc_relations_spark.plans.evaluate import evaluate_re


@pytest.fixture(scope="module")
def report(spark):
    gold = spark.createDataFrame(generate_eval_pairs(400))
    return evaluate_re(gold)


def test_overall_accuracy(report):
    assert report["overall"]["n"] >= 380  # every pair got scored
    assert report["overall"]["accuracy"] >= 0.95


def test_main_class_precision_recall(report):
    for label in ("supplier", "customer"):
        per = report["overall"]["per_class"][label]
        assert per["precision"] >= 0.95, (label, per)
        assert per["recall"] >= 0.95, (label, per)


def test_threshold_gate_monotonic(report):
    """Gated accuracy should not degrade as the threshold rises
    (misc.py:115-136 sweep semantics)."""
    sweep = report["threshold_sweep"]
    accs = [sweep[k]["accuracy"] for k in ("0.5", "0.9") if sweep[k]["n"] > 0]
    assert accs == sorted(accs) or accs[0] >= 0.95
