"""End-to-end KG-construction pipeline (the Spark form of the reference's
three entry points, SURVEY.md §3).

pages -> clean+segment -> mentions -> [SC gate] -> pairs -> RE scores
      -> triples -> link -> edges/vertices

Each stage is a pure DataFrame -> DataFrame function; this module wires them
and (optionally) persists every stage through the checkpoint manager so a
killed run resumes from the last completed stage (the Spark form of
block_job_files/add_results, src/glue/glue_etl.py:313-444).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..operators.segment import segment_sentences
from ..operators.ner import detect_mentions, gate_multi_org
from ..operators.sc_classifier import sc_classify, sc_gate
from ..operators.pairs import generate_tagged_pairs
from ..operators.re_classifier import classify_pairs
from ..operators.graph import (
    build_alias_edges,
    build_edges,
    build_edges_global,
    build_vertices,
    emit_triples,
    link_triples,
)
from ..operators.linking import canonicalize_unmatched, link_surfaces


@dataclass
class PipelineConfig:
    lang: str = "en"
    use_sc_gate: bool = True
    sc_threshold: float = 0.95
    mutate: bool = True
    reverse: bool = True
    num_positions: float = float("inf")
    score_threshold: float = 0.5
    match_thresh: float = 0.95
    cand_thresh: float = 0.8
    model_partitions: int | None = None
    salt_buckets: int = 32
    extra: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    company_dict: DataFrame,
    config: PipelineConfig | None = None,
) -> dict[str, DataFrame]:
    """Run the full extraction DAG; returns every stage DataFrame keyed by
    stage name (callers persist what they need)."""
    cfg = config or PipelineConfig()

    sentences = segment_sentences(pages, lang=cfg.lang)
    mentions = detect_mentions(sentences, company_dict)
    multi_org = gate_multi_org(mentions)
    if cfg.use_sc_gate:
        gated = sc_gate(sc_classify(multi_org), threshold=cfg.sc_threshold)
    else:
        gated = multi_org
    pairs = generate_tagged_pairs(gated, num_positions=cfg.num_positions)
    classified = classify_pairs(
        pairs,
        mutate=cfg.mutate,
        reverse=cfg.reverse,
        model_partitions=cfg.model_partitions,
    )
    triples = emit_triples(classified, score_threshold=cfg.score_threshold)

    surfaces = (
        triples.select(triples.subj_surface.alias("surface"))
        .unionByName(triples.select(triples.obj_surface.alias("surface")))
        .distinct()
    )
    linked_surfaces = link_surfaces(
        surfaces, company_dict,
        cand_thresh=cfg.cand_thresh, match_thresh=cfg.match_thresh,
    )
    alias_edges = build_alias_edges(mentions)
    surface_to_entity = canonicalize_unmatched(
        linked_surfaces,
        alias_edges.select("target", "alias"),
    )
    linked = link_triples(triples, surface_to_entity.select("surface", "entity_id"))
    edges = build_edges(linked)
    edges_global = build_edges_global(linked, salt_buckets=cfg.salt_buckets)
    vertices = build_vertices(linked, surface_to_entity)

    return dict(
        sentences=sentences,
        mentions=mentions,
        multi_org=multi_org,
        gated=gated,
        pairs=pairs,
        classified=classified,
        triples=triples,
        surface_to_entity=surface_to_entity,
        alias_edges=alias_edges,
        linked_triples=linked,
        edges=edges,
        edges_global=edges_global,
        vertices=vertices,
    )
