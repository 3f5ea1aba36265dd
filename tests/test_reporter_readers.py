"""Doc-level reporter aggregation (L7-L10) and suffix-dispatched reader (S1)."""

import pandas as pd
import pytest

from finance_sc_relations_spark.operators.reporter import aggregate_doc_relations
from finance_sc_relations_spark.sources.readers import read_frame


@pytest.fixture()
def doc_triples(spark):
    # page hosted at quantrix.example.com mentions itself + two partners
    triples = spark.createDataFrame(
        [
            ("https://quantrix.example.com/a", "s0", "Quantrix Semiconductors", "supplies_to",
             "Borealis Logistics Group", "Quantrix Semiconductors", "Borealis Logistics Group", 0.97),
            ("https://quantrix.example.com/a", "s1", "Cobaltec Materials Inc", "supplies_to",
             "Quantrix Semiconductors", "Cobaltec Materials Inc", "Quantrix Semiconductors", 0.96),
            ("https://quantrix.example.com/a", "s2", "Quantrix Semiconductors", "supplies_to",
             "Borealis Logistics Group", "Quantrix Semiconductors", "Borealis Logistics Group", 0.95),
        ],
        "url string, sentence_id string, subj_id string, pred string, obj_id string, "
        "subj_surface string, obj_surface string, score double",
    )
    mentions = spark.createDataFrame(
        [("https://quantrix.example.com/a", [])],
        "url string, aliases array<struct<target:string,alias:string>>",
    )
    return triples, mentions


def test_reporter_removed_other_company_holds_relation(spark, doc_triples):
    triples, mentions = doc_triples
    out = aggregate_doc_relations(triples, mentions).toPandas()
    companies = set(out["company"])
    # the reporter (Quantrix, host match) never appears as a relation holder
    assert not any("Quantrix" in c for c in companies)
    by_co = out.set_index("company")
    # Borealis is on the receiving side of the reporter's supply -> customer
    assert by_co.loc["Borealis Logistics Group", "relationship"] == "customer"
    assert by_co.loc["Borealis Logistics Group", "n_evidence"] == 2
    assert by_co.loc["Borealis Logistics Group", "score"] == pytest.approx(1.92)
    # Cobaltec supplies the reporter -> supplier
    assert by_co.loc["Cobaltec Materials Inc", "relationship"] == "supplier"


def test_log_sum_top_n_scoring_variant(spark, doc_triples):
    triples, mentions = doc_triples
    out = aggregate_doc_relations(triples, mentions, scoring="log_sum_top_n").toPandas()
    b = out.set_index("company").loc["Borealis Logistics Group"]
    # avg(0.97,0.95) * (1 + log(1.92)) = 0.96 * 1.652...
    assert b["score"] == pytest.approx(0.96 * (1 + __import__("math").log(1.92)), abs=1e-3)


def test_read_frame_dispatch(spark, tmp_path):
    pdf = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    csv = tmp_path / "t.csv"
    pdf.to_csv(csv, index=False)
    tsv = tmp_path / "t.tsv"
    pdf.to_csv(tsv, sep="\t", index=False)
    jsonl = tmp_path / "t.jsonl"
    pdf.to_json(jsonl, orient="records", lines=True)
    pq = tmp_path / "t.parquet"
    pdf.to_parquet(pq, index=False)
    for p in (csv, tsv, jsonl, pq):
        df = read_frame(spark, str(p))
        assert df.count() == 2
        assert set(df.columns) == {"a", "b"}
    with pytest.raises(ValueError):
        read_frame(spark, "file.unsupported")  # xlsx is handled now (test_readers.py)
