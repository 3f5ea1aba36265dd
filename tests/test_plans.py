"""Physical-plan assertions: the optimizations we claim must be visible in
the plans Catalyst actually produces (predicate pushdown, column pruning,
broadcast joins, whole-stage codegen)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.filter(F.col("l_shipdate") < "1996-01-01").select("l_quantity")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reads_only_projection(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.select("l_returnflag", "l_quantity")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_returnflag" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema  # unused column not scanned


def test_supply_edges_uses_broadcast_joins(spark):
    import __spark_entry__ as E

    df = E.queries()["supply_edges"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims are broadcast, no shuffle join


def test_isin_pushdown(spark):
    import __spark_entry__ as E

    df = E.queries()["filtered_scan_isin"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "In(o_orderpriority" in plan


def test_anti_join_planned_as_anti(spark):
    import __spark_entry__ as E

    df = E.queries()["anti_join_incremental"](spark, SF)
    plan = _plan(df)
    assert "LeftAnti" in plan


def test_pricing_summary_map_side_combine(spark):
    """One shuffle, partial aggregation before it (map-side combine); the
    formatted plan under AQE shows codegen only post-execution, so assert
    the structural properties instead."""
    import __spark_entry__ as E

    df = E.queries()["pricing_summary"](spark, SF)
    plan = _plan(df)
    assert "partial_sum" in plan  # map-side combine
    assert plan.count("+- Exchange") == 1  # single shuffle in the plan tree
    assert "PushedFilters" in plan and "LessThan(l_shipdate" in plan


def test_clean_text_is_jvm_side(spark):
    """The byte-identical clean must not drop to Python (no BatchEvalPython /
    ArrowEvalPython node in the plan)."""
    import __spark_entry__ as E

    df = E.queries()["clean_text"](spark, SF)
    plan = _plan(df)
    assert "EvalPython" not in plan
    assert "regexp_replace" in plan or "WholeStageCodegen" in plan


def test_salted_agg_is_two_phase(spark):
    import __spark_entry__ as E

    df = E.queries()["skewed_user_agg"](spark, SF)
    plan = _plan(df)
    # two HashAggregate pairs: (partial+final) x two groupBys
    assert plan.count("HashAggregate") >= 4


def test_duplicate_spans_shuffles_fingerprints_not_strings(spark):
    """The duplicate-substring plan must never shuffle gram STRINGS: the
    window rows reaching the exchanges carry only (doc_id, pos, h1, h2) —
    the 128-bit fingerprint pair — and the gaps-and-islands merge adds
    exactly one more shuffle (on doc_id)."""
    from finance_sc_relations_spark.operators.dedup import duplicate_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(duplicate_spans(docs, n=13))
    # every Exchange's projection is fingerprint/positional columns only
    for chunk in plan.split("Exchange ")[1:]:
        head = chunk[:160]
        assert "gram" not in head, head
    # no cartesian/broadcast-nested-loop anywhere
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_stats_ride_a_broadcast(spark):
    """bm25's N/avgdl 1-row frame must join as a broadcast (no shuffle of
    the tf table against a single-row side), and tf/df/dl aggregates are
    two-phase (map-side partial before the exchange)."""
    from finance_sc_relations_spark.operators.text_stats import bm25_top_terms

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(bm25_top_terms(docs, k=5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final per aggregate


def test_query_registry_cap():
    """The driver records only the FIRST 50 queries() entries
    (CORRECTNESS_r04 truncated 52 -> 50, silently dropping the multimodal
    rows that had been green since r1). Guard the contract: exactly 50
    driver-facing entries, oracle keys in 1:1 correspondence, extras parked
    in extra_queries() with their own oracles, and the once-dropped
    multimodal queries pinned to the first half of the registry."""
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    eq, eo = E.extra_queries(), E.extra_oracle_sql()
    assert len(q) == 50, f"driver registry must stay at 50, got {len(q)}"
    assert set(q) == set(o)
    assert set(eq) == set(eo)
    assert not set(eq) & set(q)
    order = list(q)
    for name in ("multimodal_features", "multimodal_frames", "linked_mentions"):
        assert order.index(name) < 25, f"{name} must sit in the first half"


def test_extra_queries_match_duckdb_oracles(spark):
    """The three registry-overflow queries (see test_query_registry_cap)
    keep full value-level oracle evidence here: same rows, columns, dtypes
    and values as their DuckDB oracle at sf0.01."""
    import duckdb
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = E.extra_oracle_sql()
    for name, fn in E.extra_queries().items():
        a = fn(spark, SF).toPandas()
        b = con.execute(oracles[name]).df()
        a = a[sorted(a.columns)].sort_values(by=list(sorted(a.columns)), kind="mergesort").reset_index(drop=True)
        b = b[sorted(b.columns)].sort_values(by=list(sorted(b.columns)), kind="mergesort").reset_index(drop=True)
        assert list(a.columns) == list(b.columns), name
        assert len(a) == len(b), name
        for c in a.columns:
            assert str(a[c].dtype) == str(b[c].dtype), (name, c, a[c].dtype, b[c].dtype)
            assert (a[c].values == b[c].values).all(), (name, c)
