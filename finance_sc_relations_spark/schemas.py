"""Canonical StructType schemas for every stage table.

Nested values are real Spark types (ARRAY/STRUCT/MAP) — never JSON-string
smuggling as the reference's Glue tables do (src/sagemaker/re_inference.py:91-102,
src/glue/glue_etl.py:100-133).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# F1: primary input (BASELINE.json input_hint)
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# F7: sentences — cleaned text, byte-identical to rm_special_char per url
SENTENCES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("sentence_id", StringType(), False),
        StructField("sent_index", IntegerType(), False),
        StructField("sentence", StringType(), False),
        StructField("lang", StringType(), True),
    ]
)

# NER span struct per src/language_model/spacy_loader.py:85-97
SPAN = StructType(
    [
        StructField("text", StringType(), False),
        StructField("label", StringType(), False),
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("token_start", IntegerType(), False),
        StructField("token_end", IntegerType(), False),
    ]
)

ALIAS_PAIR = StructType(
    [
        StructField("target", StringType(), False),
        StructField("alias", StringType(), False),
    ]
)

# F7: mentions
MENTIONS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("sentence_id", StringType(), False),
        StructField("sentence", StringType(), False),
        StructField("spans", ArrayType(SPAN), False),
        StructField("org_groups", MapType(StringType(), IntegerType()), False),
        StructField("aliases", ArrayType(ALIAS_PAIR), False),
        StructField("num_orgs", IntegerType(), False),
    ]
)

# F7: pairs — one row per tagged position (reference IR #1, infer.py:252-288)
PAIRS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("sentence_id", StringType(), False),
        StructField("r_id", StringType(), False),
        StructField("sents", StringType(), False),  # tagged sentence
        StructField("orig_sents", StringType(), False),
        StructField("entity1", StringType(), False),
        StructField("entity2", StringType(), False),
        StructField("org_groups", MapType(StringType(), IntegerType()), False),
    ]
)

# F7: scored pairs after position-mean + reverse-ensemble
SCORED_PAIRS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("sentence_id", StringType(), False),
        StructField("r_id", StringType(), False),
        StructField("entity1", StringType(), False),
        StructField("entity2", StringType(), False),
        StructField("scores", ArrayType(FloatType()), False),
        StructField("relation", StringType(), False),
        StructField("score", FloatType(), False),
    ]
)

# Final edge/vertex tables (F3 + FIXTURES.md F7 'edges')
EDGES = StructType(
    [
        StructField("subj_id", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj_id", StringType(), False),
        StructField("subj_surface", StringType(), False),
        StructField("obj_surface", StringType(), False),
        StructField("url", StringType(), False),
        StructField("sentence_ids", ArrayType(StringType()), False),
        StructField("score", DoubleType(), False),
    ]
)

VERTICES = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("canonical_name", StringType(), False),
        StructField("aliases", ArrayType(StringType()), True),
        StructField("first_seen_ts", TimestampType(), True),
    ]
)

# F4: broadcast alias dictionary
COMPANY_DICT = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("canonical_name", StringType(), False),
        StructField("prefix2", StringType(), False),
        StructField("aliases", ArrayType(StringType()), True),
    ]
)

# F3: gold triples oracle
GOLD_TRIPLES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("sentence_id", StringType(), False),
        StructField("subj_id", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj_id", StringType(), False),
        StructField("subj_surface", StringType(), False),
        StructField("obj_surface", StringType(), False),
    ]
)

# Lineage / checkpoint (F7 `_lineage`; Spark form of the reference's
# success/failed job-state sets, src/glue/glue_etl.py:376-444)
LINEAGE = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("input_rows", LongType(), False),
        StructField("output_rows", LongType(), False),
        StructField("dropped_invalid", LongType(), False),
        StructField("wall_ms", LongType(), False),
    ]
)
