"""Stage 3: pair generation + [E1]/[E2] position tagging (mapInPandas).

Port of the pair-enumeration loop in infer_from_trained.tag_sentences
(src/relation_extraction/infer.py:252-288):
- one unordered pair per distinct org-group pair;
- pair representative = longest surface form in the group (infer.py:266-268);
- every non-overlapping position combination tagged via entity_annotation
  (src/utils/preprocess.py:109-220), capped at num_positions;
- r_id = "{sentence_id}_{pair_index}" (infer.py:282).

Scale notes:
- The fan-out is C(num_groups, 2) x positions per sentence — this stage is
  the row multiplier, so it runs AFTER the num_orgs>1 gate and (optionally)
  the SC gate, mirroring the reference's cheap->expensive ordering.
- Pure string surgery inside Arrow batches; output is immediately
  repartition-able for the model stage.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Iterator, List

import pandas as pd

from pyspark.sql import DataFrame

from ..functions.tagging import entity_annotation
from ..schemas import PAIRS


def enumerate_pairs(org_groups: dict) -> List[tuple]:
    """Group-representative pair enumeration (infer.py:259-268)."""
    id2org = defaultdict(list)
    for k, v in org_groups.items():
        id2org[v].append(k)
    group_ids = sorted(id2org.keys())
    num_groups = len(group_ids)
    pairs = []
    for idx in range(num_groups):
        rep_a = sorted(id2org[group_ids[idx]], key=len, reverse=True)[0]
        for n in range(idx + 1, num_groups):
            rep_b = sorted(id2org[group_ids[n]], key=len, reverse=True)[0]
            pairs.append((rep_a, rep_b))
    return pairs


def generate_tagged_pairs(
    mentions: DataFrame, num_positions: float = math.inf
) -> DataFrame:
    """mentions -> PAIRS rows (one per tagged position)."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rec in batch.itertuples(index=False):
                org_groups = dict(rec.org_groups)
                pairs = enumerate_pairs(org_groups)
                for i, (ent1, ent2) in enumerate(pairs):
                    tagged = entity_annotation(
                        rec.sentence, ent1, ent2, org_groups, num_positions
                    )
                    for sent in tagged:
                        rows.append(
                            dict(
                                url=rec.url,
                                sentence_id=rec.sentence_id,
                                r_id=f"{rec.sentence_id}_{i}",
                                sents=sent,
                                orig_sents=rec.sentence,
                                entity1=ent1,
                                entity2=ent2,
                                org_groups=org_groups,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in PAIRS.fields],
            )

    return mentions.mapInPandas(_map, schema=PAIRS)
