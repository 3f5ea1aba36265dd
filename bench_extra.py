#!/usr/bin/env python
"""Supplementary benchmark harness (round 6) — NOT the driver's bench.

`bench.py` is frozen for measurement; this file exists for the guide §1
workflow: time individual queries with the noop sink (forces every column
of every row, so projection-final queries are not column-pruned the way
`.count()` allows — guide §1.4), label jobs, and dump formatted plans.

Usage:
  python bench_extra.py [--sf DIR] [--queries a,b,c] [--mode noop|count]
                        [--repeats K] [--plans OUTDIR] [--suffix before]

Calls mirror bench.py exactly (same functions, same parameters) so numbers
are comparable; only the forcing action differs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_thunks(spark, sf_dir: str):
    """name -> () -> DataFrame, mirroring bench.py's calls parameter-for-
    parameter (the dedup tiers use bench.py's n/threshold/max_hamming, not
    the oracle-query variants)."""
    from finance_sc_relations_spark.operators import dedup as D
    from finance_sc_relations_spark.operators import simsearch as S
    from pyspark.sql import functions as F
    import __spark_entry__ as E

    qs = {**E.queries(), **E.extra_queries()}
    thunks = {
        name: (lambda n=name: qs[n](spark, sf_dir))
        for name in [
            "supply_edges", "pricing_summary", "region_revenue", "topk_window",
            "argmax_per_group", "events_daily", "skewed_user_agg",
            "token_stats", "fingerprint", "exact_dedup", "ann_brute_topk",
            "corpus_report", "token_budget_sample", "repetition_stats",
            "asof_join_events", "cube_rollup", "rolling_revenue",
            "sessionize", "triangle_count", "token_cooccurrence",
            "duplicate_spans", "bm25_top_terms", "percentile_profile",
            "cut_duplicate_spans", "kg_negatives", "corpus_curation",
        ]
    }

    def _docs():
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    thunks["ngram3_jaccard_pairs"] = lambda: D.ngram_jaccard_pairs(
        _docs(), n=3, threshold=0.5
    )
    thunks["minhash_lsh_pairs"] = lambda: D.minhash_lsh_pairs(
        _docs(), num_perm=64, bands=16, threshold=0.5
    )
    thunks["simhash_pairs"] = lambda: D.simhash_near_pairs(_docs(), max_hamming=2)

    def _ann_lsh():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q10 = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return S.lsh_topk(emb, q10, dim=64, k=5, bands=16, bits_per_band=4)

    thunks["ann_lsh_topk"] = _ann_lsh
    # graph family runs at sf0.01 in bench.py
    graph_dir = os.environ.get("SPARK_GRAFT_GRAPH_SF_DIR", "/root/testdata/sf0.01")
    for name in ["khop_2", "pagerank", "dedup_clusters"]:
        thunks[name] = lambda n=name: qs[n](spark, graph_dir)
    return thunks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--mode", default="noop", choices=["noop", "count"])
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    if (
        os.environ.get("SPARK_GRAFT_BENCH_PINNED") != "1"
        and os.path.exists("/usr/bin/taskset")
    ):
        env = dict(os.environ, SPARK_GRAFT_BENCH_PINNED="1")
        cmd = ["taskset", "-c", f"0-{CPUS - 1}", sys.executable] + sys.argv
        os.execvpe(cmd[0], cmd, env)

    from finance_sc_relations_spark.session import build_session

    spark = build_session(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    thunks = build_thunks(spark, args.sf)
    names = [q for q in args.queries.split(",") if q] or list(thunks)

    def force(df):
        if args.mode == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    if args.plans:
        outdir = Path(args.plans)
        outdir.mkdir(parents=True, exist_ok=True)
        for name in names:
            df = thunks[name]()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (outdir / f"{name}_{args.suffix}.txt").write_text(plan)
            spark.catalog.clearCache()
        print(f"wrote {len(names)} plans to {outdir}")

    results = {}
    if not args.no_warmup:
        force(thunks[names[0]]())
        spark.catalog.clearCache()
    for name in names:
        best = None
        for _ in range(max(1, args.repeats)):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            force(thunks[name]())
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
            spark.sparkContext.setJobDescription(None)
        results[name] = round(best, 3)
        print(f"  {name}: {results[name]}s", file=sys.stderr)
    print(json.dumps({
        "metric": "bench_extra", "mode": args.mode, "sf_dir": args.sf,
        "value": round(sum(results.values()), 3), "unit": "sec",
        "queries": results, "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
