#!/usr/bin/env python
"""spark-submit entry point for the KG-construction job.

Cluster usage (the north-rule shipping form):

    python scripts/make_dist.py   # -> dist/finance_sc_relations_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/finance_sc_relations_spark.zip \
        scripts/run_job.py \
        --pages s3://bucket/pages/ --company-dict s3://bucket/dict/ \
        --output s3://bucket/kg/ --checkpoint s3://bucket/ckpt/

Local smoke:

    spark-submit --master local[8] \
        --py-files dist/finance_sc_relations_spark.zip \
        scripts/run_job.py --pages <dir>/pages.parquet \
        --company-dict <dir>/company_dict.parquet --output /tmp/kg_out

With --checkpoint the job runs the resumable pipeline (stage tables +
_lineage; rerunning after a kill resumes). Without it, the in-memory DAG.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pages", required=True)
    parser.add_argument("--company-dict", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--lang", default="en")
    parser.add_argument("--score-threshold", type=float, default=0.5)
    parser.add_argument("--no-sc-gate", action="store_true")
    parser.add_argument("--salt-buckets", type=int, default=32)
    args = parser.parse_args()

    # Import AFTER spark-submit has added --py-files to sys.path.
    from pyspark.sql import SparkSession

    from finance_sc_relations_spark.plans.pipeline import PipelineConfig, run_pipeline
    from finance_sc_relations_spark.plans.checkpoint import run_pipeline_checkpointed
    from finance_sc_relations_spark.operators.graph import build_edges_global, build_vertices

    spark = SparkSession.builder.appName("fsr-kg-construct").getOrCreate()
    cfg = PipelineConfig(
        lang=args.lang,
        use_sc_gate=not args.no_sc_gate,
        score_threshold=args.score_threshold,
        salt_buckets=args.salt_buckets,
    )
    t0 = time.perf_counter()
    if args.checkpoint:
        out = run_pipeline_checkpointed(
            spark, args.pages, args.company_dict, args.checkpoint, cfg
        )
        linked = out["linked_triples"]
        edges = out["edges"]
        s2e = linked.select("subj_surface", "subj_id").withColumnRenamed(
            "subj_surface", "surface"
        ).withColumnRenamed("subj_id", "entity_id").unionByName(
            linked.select("obj_surface", "obj_id").withColumnRenamed(
                "obj_surface", "surface"
            ).withColumnRenamed("obj_id", "entity_id")
        ).distinct()
        vertices = build_vertices(linked, s2e)
    else:
        pages = spark.read.parquet(args.pages)
        company_dict = spark.read.parquet(args.company_dict)
        out = run_pipeline(spark, pages, company_dict, cfg)
        linked, edges, vertices = (
            out["linked_triples"], out["edges"], out["vertices"]
        )

    linked.write.mode("overwrite").parquet(f"{args.output}/triples")
    edges.write.mode("overwrite").parquet(f"{args.output}/edges")
    build_edges_global(linked, salt_buckets=args.salt_buckets).write.mode(
        "overwrite"
    ).parquet(f"{args.output}/edges_global")
    vertices.write.mode("overwrite").parquet(f"{args.output}/vertices")
    n_triples = spark.read.parquet(f"{args.output}/triples").count()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "n_triples": n_triples,
                "wall_sec": round(wall, 2),
                "triples_per_sec": round(n_triples / max(wall, 1e-9), 2),
                "output": args.output,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
