"""Relation-label algebra: the {supplier, customer, other} label space.

Reference semantics:
- ``inverse_dict`` defined identically at src/relation_extraction/infer.py:24,
  preprocessing_funcs.py:24, misc.py:22, trainer.py:23.
- A predicted label is the role of the [E2]-tagged entity; ``assign_relation``
  (src/relation_extraction/infer.py:446-459) emits
  ``{e2: relation, e1: inverse(relation)}``.
- ``resort_relation`` (src/labels_generator/agg_utils.py:105-110) normalizes
  triple direction: (c1, customer, c2) -> (c2, supplier, c1). We adopt the
  normalized predicate name ``supplies_to``: (subj, supplies_to, obj) means
  subj is a supplier of obj.
"""

from __future__ import annotations

from itertools import chain
from typing import Iterable, List, Sequence, Tuple

INVERSE_DICT = {"supplier": "customer", "customer": "supplier", "other": "other"}
MAIN_RELATIONS = ["supplier", "customer"]

# Fixed label order for score vectors everywhere in this engine.
LABELS = ["supplier", "customer", "other"]
LABEL2ID = {l: i for i, l in enumerate(LABELS)}
ID2LABEL = {i: l for i, l in enumerate(LABELS)}

PRED_SUPPLIES_TO = "supplies_to"


def assign_relation(sent: str, relation: str, score: float) -> dict:
    """Port of assign_relation (src/relation_extraction/infer.py:446-459).

    Extracts the [E1]/[E2] surface forms back out of a tagged sentence and
    returns ``{e2: relation, e1: inverse(relation), 'score': round(score,4)}``.
    """
    e1_start, e1_end = "[E1] ", " [/E1]"
    e2_start, e2_end = "[E2] ", " [/E2]"
    e1 = sent[sent.find(e1_start) + len(e1_start) : sent.rfind(e1_end)]
    e2 = sent[sent.find(e2_start) + len(e2_start) : sent.rfind(e2_end)]
    return {e2: relation, e1: INVERSE_DICT.get(relation, "other"), "score": round(score, 4)}


def triple_from_pair(entity1: str, entity2: str, relation: str) -> tuple | None:
    """Normalize a scored pair into a (subj, supplies_to, obj) triple.

    The predicted ``relation`` is the role of entity2 (assign_relation
    semantics, infer.py:446-459) and direction is normalized per
    resort_relation (agg_utils.py:105-110):
      relation == supplier  -> entity2 supplies entity1
      relation == customer  -> entity1 supplies entity2
      other                 -> no edge
    """
    if relation == "supplier":
        return (entity2, PRED_SUPPLIES_TO, entity1)
    if relation == "customer":
        return (entity1, PRED_SUPPLIES_TO, entity2)
    return None


def resort_relation(relation_tuple: Tuple[str, str, str], relations_map: dict | None = None) -> list:
    """Port of resort_relation (src/labels_generator/agg_utils.py:105-110).

    With the default map {'customer': 'supplier'}, (c1, customer, c2) becomes
    [c2, supplier, c1]; other relations pass through unchanged.
    """
    if relations_map is None:
        relations_map = {"customer": "supplier"}
    c1, relation, c2 = relation_tuple
    if not relations_map.get(relation):
        return [c1, relation, c2]
    return [c2, relations_map[relation], c1]


def return_possible_pairs(ids_set: Sequence) -> List[tuple]:
    """Port of return_possible_pairs (src/labels_generator/agg_utils.py:29-34):
    all ordered-by-index unordered pairs of a sequence."""
    ids_set = list(ids_set)
    n = len(ids_set)
    return list(
        zip(
            list(chain(*[[ids_set[x]] * (n - 1 - x) for x in range(n)])),
            list(chain(*[[ids_set[i] for i in range(x + 1, n)] for x in range(n)])),
        )
    )


def check_relation_tuples(relations: List[Iterable]) -> bool:
    """Port of check_relation_tuples (src/labels_generator/agg_utils.py:21-27)."""
    try:
        return all(
            hasattr(relation, "__iter__") and len(list(relation)) == 3
            for relation in relations
        )
    except TypeError:
        return False


def sc_label_from_relations(relation_tuples, main_relations=MAIN_RELATIONS) -> int:
    """Port of sc_label_from_relations (src/labels_generator/agg_utils.py:9-19)."""
    if not relation_tuples:
        return 0
    for relation_tuple in relation_tuples:
        if len(relation_tuple) != 3:
            continue
        if relation_tuple[1] in main_relations:
            return 1
    return 0


def get_other_relations(ids2org: dict) -> List[tuple]:
    """Port of get_other_relations (src/labels_generator/agg_utils.py:37-58)."""
    comp_keys = sorted(ids2org.keys())
    other_ids = set(return_possible_pairs(comp_keys))
    return [(ids2org[pair[0]][0], "other", ids2org[pair[1]][0]) for pair in other_ids]
