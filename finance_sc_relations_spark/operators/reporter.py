"""Per-document relation aggregation with reporter-mention handling.

Port of process_relations/agg_relations (src/relation_extraction/
reporter.py:12-73, 240-385) to an applyInPandas grouped stage:

- per document (url), cluster org surface forms at cosine 0.96 merged with
  the document's alias pairs (doc-level clustering, reporter.py:283-311);
- identify the document's *reporter* (our web analog: the page host's
  company, or an explicit reporter column) including its aliases and
  high-similarity variants (reporter.py:313-321);
- for each per-sentence relation, drop the reporter side — the OTHER company
  becomes the relation holder (reporter.py:323-346);
- aggregate per company: sum scores per relation type, argmax wins, evidence
  sentence ids collected (agg_relations, reporter.py:59-69);
- optional log_sum_top_n scoring variant (L10,
  DemoNotebooks/re_with_glue.ipynb cell 26): avg * (1 + log(sum(top_n))).

Grouped by url, groups are page-sized — applyInPandas is the right tool
(small per-group pandas work, Arrow-batched)."""

from __future__ import annotations

import math
from collections import defaultdict
from typing import List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.similarity import HashEmbedder

DOC_RELATIONS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("company", StringType(), False),          # representative name
        StructField("relationship", StringType(), False),     # argmax relation
        StructField("score", DoubleType(), False),            # summed score
        StructField("n_evidence", LongType(), False),
        StructField("sentence_ids", ArrayType(StringType()), False),
    ]
)


def _cluster_doc_orgs(
    orgs: List[str], alias_pairs: List[tuple], embedder: HashEmbedder,
    threshold: float = 0.96,
) -> dict:
    """Doc-level greedy clustering (reporter.py:283-311): names above the
    cosine threshold or connected via alias pairs share a cluster;
    representative = longest name."""
    alias2name = defaultdict(list)
    name2alias = defaultdict(list)
    for t, a in alias_pairs:
        name2alias[t].append(a)
        alias2name[a].append(t)
    org2id: dict = {}
    id2org: dict = {}
    ids_c = 0
    if not orgs:
        return {}
    vecs = embedder.encode(orgs)
    for i, c in enumerate(orgs):
        if c in org2id:
            continue
        sims = vecs @ vecs[i]
        matches = [orgs[j] for j in np.where(sims > threshold)[0]]
        matches += [x for m in matches for x in alias2name.get(m, [])]
        matches += [x for m in matches for x in name2alias.get(m, [])]
        for name in matches:
            if name not in org2id:
                org2id[name] = ids_c
        id2org[ids_c] = sorted(
            {m for m in matches if m}, key=len, reverse=True
        )
        ids_c += 1
    return {name: id2org[cid][0] for name, cid in org2id.items()}


def aggregate_doc_relations(
    linked_triples: DataFrame,
    mentions: DataFrame,
    reporter_col: str | None = None,
    scoring: str = "sum",
    cluster_threshold: float = 0.96,
    linked: DataFrame | None = None,
) -> DataFrame:
    """linked_triples (url, sentence_id, subj_surface, obj_surface, score,
    pred) x mentions (for alias pairs) -> one row per (url, company) with the
    argmax relationship, reporter mentions removed.

    The reporter is the page host's registrable token (url netloc) matched
    against company names — the web analog of reporter_name/reporter_cik
    (reporter.py:313-321). `scoring='log_sum_top_n'` applies the L10 variant:
    avg * (1 + log(sum(top_5)))."""
    alias_edges = (
        mentions.select("url", F.explode("aliases").alias("p"))
        .select("url", F.col("p.target").alias("target"), F.col("p.alias").alias("alias"))
        .distinct()
        .groupBy("url")
        .agg(F.collect_list(F.struct("target", "alias")).alias("alias_pairs"))
    )
    trip = linked_triples.join(alias_edges, "url", "left")

    def _agg(pdf: pd.DataFrame) -> pd.DataFrame:
        embedder = HashEmbedder()
        url = pdf["url"].iloc[0]
        host = url.split("//")[-1].split("/")[0].split(".")[0].lower()
        alias_pairs = []
        ap = pdf["alias_pairs"].iloc[0]
        if ap is not None and not (isinstance(ap, float) and math.isnan(ap)):
            alias_pairs = [(d["target"], d["alias"]) for d in ap]
        orgs = sorted(
            set(pdf["subj_surface"]) | set(pdf["obj_surface"]), key=len, reverse=True
        )
        rep_map = _cluster_doc_orgs(orgs, alias_pairs, embedder, cluster_threshold)
        reporter_reps = {
            rep_map.get(o, o) for o in orgs if host and host in o.lower()
        }
        # per-company relation records: subj supplies_to obj means subj is a
        # supplier (role) and obj a customer; when one side is the reporter,
        # the other company holds the relation (reporter.py:323-346)
        records = defaultdict(list)
        for rec in pdf.itertuples(index=False):
            subj_rep = rep_map.get(rec.subj_surface, rec.subj_surface)
            obj_rep = rep_map.get(rec.obj_surface, rec.obj_surface)
            if subj_rep in reporter_reps and obj_rep not in reporter_reps:
                records[obj_rep].append(("customer", rec.score, rec.sentence_id))
            elif obj_rep in reporter_reps and subj_rep not in reporter_reps:
                records[subj_rep].append(("supplier", rec.score, rec.sentence_id))
            else:
                # no reporter side: both companies keep their roles
                records[subj_rep].append(("supplier", rec.score, rec.sentence_id))
                records[obj_rep].append(("customer", rec.score, rec.sentence_id))
        rows = []
        for company, rels in records.items():
            scores = {"supplier": 0.0, "customer": 0.0, "other": 0.0}
            per_label = defaultdict(list)
            sents = []
            for rel, score, sid in rels:
                per_label[rel].append(score)
                sents.append(sid)
            for label, vals in per_label.items():
                if scoring == "log_sum_top_n":
                    top = sorted(vals, reverse=True)[:5]
                    scores[label] = float(
                        np.mean(vals) * (1 + math.log(max(sum(top), 1e-9)))
                    )
                else:
                    scores[label] = float(sum(vals))
            label, score = sorted(scores.items(), key=lambda x: -x[1])[0]
            rows.append(
                dict(
                    url=url, company=company, relationship=label,
                    score=round(score, 4), n_evidence=len(rels),
                    sentence_ids=sorted(set(sents)),
                )
            )
        return pd.DataFrame(
            rows, columns=[f.name for f in DOC_RELATIONS_SCHEMA.fields]
        )

    out = trip.groupBy("url").applyInPandas(_agg, schema=DOC_RELATIONS_SCHEMA)
    if linked is not None:
        # the reference's per-item extractedNameId / extractedNameCandidateIds
        # (reporter.py:43-52): attach the dictionary match + top-k candidate
        # ids of the representative surface. Plain equi-join — the distinct
        # surface table is ~10^7 rows at corpus scale, too big to broadcast.
        link_cols = linked.select(
            F.col("surface").alias("company"),
            F.col("entity_id").alias("company_entity_id"),
            F.transform("candidates", lambda c: c["entity_id"]).alias(
                "candidate_ids"
            ),
        )
        out = out.join(link_cols, "company", "left")
    return out
