"""RE evaluation harness — the Spark form of the reference's evaluate stage
(src/stages/evaluate.py:27-200, src/relation_extraction/misc.py:55-160).

Consumes a gold-pair table shaped like data/raw/gold_eval_ensemble.json
(params.yaml:28-37; FIXTURES.md F5: Sentence, Filer, Company, Relationship,
org_groups), tags each pair (entity_2 = Company is the [E2] role holder,
create_re_dataset column semantics, data_aggregation.py:124-130), scores with
the RE stage, and reports accuracy/per-class P/R/F1 plus the thresholded
operating points the reference sweeps (0.90/0.95/0.99, misc.py:115-136) and
the direction-consistency check (evaluate.py:132-160).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..functions.relations import LABELS
from ..functions.tagging import entity_annotation
from ..operators.re_classifier import aggregate_positions, score_pairs
from ..schemas import PAIRS


def _eval_rid(sentence: str, filer: str, company: str) -> str:
    """Collision-safe eval join key: hash of the FULL (sentence, filer,
    company) tuple — a 40-char sentence prefix collides for boilerplate gold
    rows and a set_index join would then cross-multiply, corrupting counts."""
    import hashlib

    return hashlib.blake2b(
        f"{sentence}\x00{filer}\x00{company}".encode(), digest_size=12
    ).hexdigest()


def tag_eval_pairs(gold: DataFrame, num_positions: float = float("inf")) -> DataFrame:
    """gold(Sentence, Filer, Company, Relationship, org_groups) -> PAIRS rows.

    entity1 = Filer ([E1]), entity2 = Company ([E2]); the gold label is the
    role of entity2, matching predict-path semantics."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for i, rec in enumerate(batch.itertuples(index=False)):
                org_groups = dict(rec.org_groups)
                tagged = entity_annotation(
                    rec.Sentence, rec.Filer, rec.Company, org_groups, num_positions
                )
                rid = _eval_rid(rec.Sentence, rec.Filer, rec.Company)
                for sent in tagged:
                    rows.append(
                        dict(
                            url="eval",
                            sentence_id=rid,
                            r_id=rid,
                            sents=sent,
                            orig_sents=rec.Sentence,
                            entity1=rec.Filer,
                            entity2=rec.Company,
                            org_groups=org_groups,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in PAIRS.fields])

    return gold.mapInPandas(_map, schema=PAIRS)


def evaluate_re(
    gold: DataFrame,
    mutate: bool = True,
    reverse: bool = True,
    thresholds=(0.5, 0.9, 0.95, 0.99),
) -> dict:
    """Returns the evaluation report dict (accuracy, per-class F1, threshold
    sweep with abstain rates)."""
    pairs = tag_eval_pairs(gold)
    scored = aggregate_positions(score_pairs(pairs, mutate=mutate, reverse=reverse))
    pred = scored.select("r_id", "relation", "score").toPandas().set_index("r_id")

    gold_pdf = gold.toPandas()
    gold_pdf["r_id"] = [
        _eval_rid(s, f, c)
        for s, f, c in zip(gold_pdf.Sentence, gold_pdf.Filer, gold_pdf.Company)
    ]
    # A repeated (Sentence, Filer, Company) with CONFLICTING labels is a
    # corrupt gold set — dropping an arbitrary row would silently skew P/R,
    # so fail loudly. Identical full-row duplicates are deduplicated.
    conflicts = gold_pdf.groupby("r_id")["Relationship"].nunique()
    conflicts = conflicts[conflicts > 1]
    if len(conflicts):
        raise ValueError(
            f"{len(conflicts)} gold (Sentence, Filer, Company) keys carry "
            "conflicting Relationship labels; fix the gold set"
        )
    gold_pdf = gold_pdf.drop_duplicates(subset=["r_id"])
    if not (gold_pdf["r_id"].is_unique and pred.index.is_unique):
        raise ValueError(
            "eval join keys must be unique or the join cross-multiplies rows"
        )
    merged = gold_pdf.set_index("r_id").join(pred, how="inner")

    y_true = merged["Relationship"].to_numpy()
    y_pred = merged["relation"].to_numpy()
    y_score = merged["score"].to_numpy()

    def _report(mask) -> dict:
        t, p = y_true[mask], y_pred[mask]
        if len(t) == 0:
            return {"n": 0}
        acc = float((t == p).mean())
        per_class = {}
        f1s = []
        for label in LABELS:
            tp = int(((p == label) & (t == label)).sum())
            fp = int(((p == label) & (t != label)).sum())
            fn = int(((p != label) & (t == label)).sum())
            prec = tp / (tp + fp) if tp + fp else 0.0
            rec = tp / (tp + fn) if tp + fn else 0.0
            f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
            per_class[label] = {
                "precision": round(prec, 4), "recall": round(rec, 4),
                "f1": round(f1, 4), "support": int((t == label).sum()),
            }
            f1s.append(f1)
        return {
            "n": int(len(t)),
            "accuracy": round(acc, 4),
            "macro_f1": round(float(np.mean(f1s)), 4),
            "per_class": per_class,
        }

    report = {"overall": _report(np.ones(len(y_true), dtype=bool))}
    sweep = {}
    for th in thresholds:
        mask = y_score > th
        r = _report(mask)
        r["abstain_rate"] = round(1 - mask.mean(), 4)
        sweep[str(th)] = r
    report["threshold_sweep"] = sweep
    return report
