"""LLM-assisted relabel verification (SURVEY.md §2.8, G1-G8).

Reference: src/labels_generator/ — an OpenAI-backed annotator
(llm_annotator.py:35-105) whose triples are aligned back to each sentence's
org_groups (extract_relations_from_llm, data_aggregation.py:140-253) and
checked for directional agreement (relation_search, utils.py:262-355).

This engine keeps the exact alignment/agreement semantics and replaces the
network LLM with a deterministic rule-based annotator behind the same
interface (SURVEY.md G1: "for this sandbox: a deterministic stub 'LLM'
(rule-based relabeler) behind the same interface"). The Spark stage runs the
whole verification per sentence inside one applyInPandas/mapInPandas pass.
"""

from __future__ import annotations

import hashlib
import random
import re
from collections import defaultdict
from itertools import chain
from typing import Dict, Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from ..functions.relations import check_relation_tuples, return_possible_pairs
from ..functions.similarity import HashEmbedder
from .models import _DIRECTIONAL_PATTERNS  # shared cue lexicon


# ---------------------------------------------------------------------------
# G2: mask/demask (llm_annotator.py:193-205)
# ---------------------------------------------------------------------------

def mask_terms(sentence: str, orgs: List[str]) -> Tuple[str, Dict[str, str]]:
    """Mask org names as Company<i> longest-first; returns (masked, mapping)."""
    mapping = {}
    for i, org in enumerate(sorted(set(orgs), key=len, reverse=True)):
        token = f"Company{i}"
        if org in sentence:
            sentence = sentence.replace(org, token)
            mapping[token] = org
    return sentence, mapping


def demask_terms(text: str, mapping: Dict[str, str]) -> str:
    for token in sorted(mapping, key=len, reverse=True):
        text = text.replace(token, mapping[token])
    return text


# ---------------------------------------------------------------------------
# G1: deterministic rule-LLM behind the LLMAnnotator interface
# ---------------------------------------------------------------------------

class RuleLLMAnnotator:
    """Deterministic stand-in for LLMAnnotator (llm_annotator.py:35-105):
    annotate(sentence, orgs) -> list of (c1, relation, c2) triples, where the
    triple means c1 is `relation` of c2. Masks orgs before 'prompting' and
    demasks after, mirroring mask_terms (llm_annotator.py:193-205)."""

    @staticmethod
    def _swap(text: str, token: str, repl: str) -> str:
        # boundary-aware: replacing 'Company1' must not corrupt 'Company10'
        return re.sub(re.escape(token) + r"(?!\d)", repl, text)

    def annotate(self, sentence: str, orgs: List[str]) -> List[List[str]]:
        masked, mapping = mask_terms(sentence, orgs)
        triples: List[List[str]] = []
        # scan every ordered token pair against the directional cue lexicon
        tokens = list(mapping.keys())
        for a in tokens:
            for b in tokens:
                if a == b:
                    continue
                test = self._swap(self._swap(masked, a, "E1X"), b, "E2X")
                for pat in _DIRECTIONAL_PATTERNS:
                    m = pat.search(test)
                    if not m:
                        continue
                    sup = mapping[a] if m.group("sup") == "E1X" else mapping[b]
                    cus = mapping[b] if m.group("sup") == "E1X" else mapping[a]
                    t = [sup, "supplier", cus]
                    if t not in triples:
                        triples.append(t)
                    break
        return triples


# ---------------------------------------------------------------------------
# G1 (production shape): HTTP chat-completion client behind the same
# annotator interface (llm_annotator.py:92-105 get_completion)
# ---------------------------------------------------------------------------

_TRIPLE_LINE = re.compile(
    r"(Company\d+)\s+(supplier|customer)\s+(?:of\s+)?(Company\d+)",
    re.IGNORECASE,
)


class HttpLLMAnnotator:
    """Chat-completion-backed annotator with the SAME annotate() interface
    as RuleLLMAnnotator. Client behavior mirrors the reference's
    get_completion (src/labels_generator/llm_annotator.py:92-105): one
    user-role message per prompt, model + temperature from the card, and
    retry-with-sleep on ANY transport/parse failure — bounded here by
    max_retries because an executor task cannot afford the reference
    notebook's unbounded `while not response` against a dead endpoint.

    Pure stdlib urllib against any OpenAI-style /v1/chat/completions
    endpoint (zero new dependencies). Org names are MASKED to CompanyN
    before prompting and triples demasked after (llm_annotator.py:193-205),
    so real company names never leave the cluster. The completion contract
    is one triple per line over masked tokens — `Company0 supplier of
    Company1` — parsed case-insensitively; lines naming unknown masks are
    dropped.

    Spark usage: construct on the driver, let the instance ride the
    mapInPandas closure (it holds only strings), one annotator per
    executor; calls run inside the verification pass exactly where
    RuleLLMAnnotator runs."""

    PROMPT = (
        "List every supplier/customer relation between the masked companies"
        " in the sentence, one per line, as 'CompanyX supplier of CompanyY'"
        " (meaning CompanyX supplies CompanyY) or 'CompanyX customer of"
        " CompanyY'. Answer 'none' if there is no relation.\n"
        "Sentence: {sentence}"
    )

    def __init__(
        self,
        endpoint: str,
        model: str = "gpt-3.5-turbo",
        temperature: float = 0.0,
        api_key: str | None = None,
        max_retries: int = 5,
        backoff_s: float = 0.2,
        timeout_s: float = 30.0,
    ):
        self.endpoint = endpoint
        self.model = model
        self.temperature = temperature
        self.api_key = api_key
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.timeout_s = timeout_s
        self.n_requests = 0  # telemetry: includes retries

    def _completion(self, prompt: str) -> str:
        import json as _json
        import time
        import urllib.error
        import urllib.request

        body = _json.dumps(
            {
                "model": self.model,
                "messages": [{"role": "user", "content": prompt}],
                "temperature": self.temperature,
            }
        ).encode()
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        last_err: Exception | None = None
        for attempt in range(self.max_retries):
            self.n_requests += 1
            try:
                req = urllib.request.Request(
                    self.endpoint, data=body, headers=headers, method="POST"
                )
                with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                    payload = _json.loads(r.read().decode("utf-8"))
                return payload["choices"][0]["message"]["content"]
            except Exception as e:  # transport, HTTP status, or parse shape
                last_err = e
                if attempt + 1 < self.max_retries:
                    time.sleep(self.backoff_s)
        raise RuntimeError(
            f"chat completion failed after {self.max_retries} attempts"
        ) from last_err

    def annotate(self, sentence: str, orgs: List[str]) -> List[List[str]]:
        masked, mapping = mask_terms(sentence, orgs)
        content = self._completion(self.PROMPT.format(sentence=masked))
        triples: List[List[str]] = []
        for m in _TRIPLE_LINE.finditer(content):
            # the regex is case-insensitive, so canonicalize the captured
            # mask casing ('company0' -> 'Company0') before the mapping
            # lookup — LLM casing drift must not drop real relations
            a = "Company" + m.group(1)[7:]
            b = "Company" + m.group(3)[7:]
            rel = m.group(2).lower()
            if a not in mapping or b not in mapping or a == b:
                continue
            if rel == "customer":  # normalize to supplier-directed triples
                a, b = b, a
            t = [mapping[a], "supplier", mapping[b]]
            if t not in triples:
                triples.append(t)
        return triples


# ---------------------------------------------------------------------------
# G3: extract_relations_from_llm (data_aggregation.py:140-253)
# ---------------------------------------------------------------------------

def _stable_sample(items: List, k: int, seed_key: str) -> List:
    """Deterministic replacement for random.sample(other_relations, k)
    (data_aggregation.py:251): seeded by a stable key."""
    if k >= len(items):
        return list(items)
    h = int.from_bytes(
        hashlib.blake2b(seed_key.encode(), digest_size=8).digest(), "big"
    )
    return random.Random(h).sample(items, k)


def extract_relations_from_llm(
    datapoint: dict,
    matcher: HashEmbedder,
    threshold: float = 0.9,
    only_filer: bool = False,
    max_others: int = 3,
    relations_key: str = "relations",
    text_col: str = "sentence",
    filer_names: tuple = ("filer", "reporter_name", "Filer"),
) -> Tuple[List[tuple], List[tuple]]:
    """Align LLM triples to the sentence's org_groups; port of
    data_aggregation.py:140-253 with the SimCSE matcher swapped for the
    HashEmbedder and the unseeded random.sample made deterministic."""
    group2id = dict(datapoint["org_groups"])
    id2group = defaultdict(list)
    for k, v in group2id.items():
        id2group[v].append(k)

    relations = datapoint[relations_key]
    if not check_relation_tuples(relations):
        raise ValueError(
            "Invalid relations list on the datapoint, must be List[Tuple[Text, Text, Text]]"
        )

    llms_companies: List[str] = []
    if isinstance(relations, list):
        llms_companies = list(set(chain(*[[x[0], x[2]] for x in relations])))

    corpus = list(group2id.keys())
    matches = (
        matcher.search(llms_companies, corpus, threshold=threshold, top_k=2)
        if llms_companies and corpus
        else [[] for _ in llms_companies]
    )

    llms_ids: Dict[str, int] = {}
    for co_match, llm_company in zip(matches, llms_companies):
        if len(co_match) > 0:
            llms_ids[llm_company] = group2id[co_match[0][0]]
        elif llm_company in datapoint[text_col]:
            new_id = max(id2group.keys()) + 1 if id2group else 1
            group2id[llm_company] = new_id
            id2group[new_id] = [llm_company]
            llms_ids[llm_company] = new_id

    llms_names = {k: id2group[v][0] for k, v in llms_ids.items()}
    available_relations = return_possible_pairs(sorted(set(llms_ids.values())))

    exist_relations, llms_relations = [], []
    if isinstance(relations, list):
        for relation in relations:
            c1, c2 = relation[0], relation[2]
            c1_id, c2_id = llms_ids.get(c1), llms_ids.get(c2)
            if None in (c1_id, c2_id):
                continue
            llms_relations.append((llms_names[c1], relation[1], llms_names[c2]))
            exist_relations.append(tuple(sorted([c1_id, c2_id])))

    other_ids = list(set(available_relations) ^ set(exist_relations))
    other_relations = [
        (id2group[p[0]][0], "other", id2group[p[1]][0]) for p in other_ids
    ]
    if not llms_relations and not other_relations:
        comp_keys = sorted(id2group.keys())
        other_ids = set(return_possible_pairs(comp_keys))
        other_relations = [
            (id2group[p[0]][0], "other", id2group[p[1]][0]) for p in other_ids
        ]

    if only_filer:
        filer_column = next((c for c in filer_names if c in datapoint), None)
        given_filer = datapoint.get(filer_column) if filer_column else None
        filer_name = None
        if given_filer:
            if group2id.get(given_filer) is not None:
                filer_name = given_filer
            elif group2id:
                scope = list(group2id.keys())
                sims = matcher.similarity(given_filer, scope)
                if sims.max() > threshold:
                    filer_name = scope[int(sims.argmax())]
        if filer_name:
            llms_relations = [x for x in llms_relations if filer_name in (x[0], x[2])]
            other_relations = [x for x in other_relations if filer_name in (x[0], x[2])]

    other_relations = _stable_sample(
        sorted(other_relations),
        min(len(other_relations), max_others),
        seed_key=str(datapoint.get(text_col, "")),
    )
    return llms_relations, other_relations


# ---------------------------------------------------------------------------
# G4: relation_search (labels_generator/utils.py:262-355)
# ---------------------------------------------------------------------------

def relation_search(
    query_relation: Tuple[str, str, str],
    relations_tuples: List[Tuple[str, str, str]],
    matcher: HashEmbedder,
    threshold: float = 0.85,
    main_relations: List[str] = ("supplier",),
) -> bool:
    """Directional agreement of one triple against a triple set — exact port
    of utils.py:262-355."""
    source_orgs = defaultdict(list)
    dist_orgs = defaultdict(list)
    if relations_tuples:
        for relation_tuple in relations_tuples:
            if isinstance(relation_tuple, str):
                continue
            if relation_tuple[1] in main_relations:
                source_orgs[relation_tuple[0]].append(relation_tuple[2])
                dist_orgs[relation_tuple[2]].append(relation_tuple[0])
    source_list = list(source_orgs.keys())
    dist_list = list(dist_orgs.keys())

    s2d = False
    d2s = False
    if source_orgs:
        source_sim = matcher.similarity(query_relation[0], source_list)
        max_idx, max_score = int(source_sim.argmax()), float(source_sim.max())
        source_match = max_score > threshold or any(
            query_relation[0].lower() in x.lower() for x in source_list
        )
        if source_match:
            targets = source_orgs[source_list[max_idx]]
            dist_match = (
                float(matcher.similarity(query_relation[2], targets).max(initial=0.0))
                > threshold
                or any(query_relation[2].lower() in x.lower() for x in targets)
            )
            s2d = source_match and dist_match
    if query_relation[1] in main_relations:
        return s2d
    if dist_orgs:
        dist_sim = matcher.similarity(query_relation[0], dist_list)
        max_idx, max_score = int(dist_sim.argmax()), float(dist_sim.max())
        dist_match = max_score > threshold or any(
            query_relation[0].lower() in x.lower() for x in dist_list
        )
        if dist_match:
            sources = dist_orgs[dist_list[max_idx]]
            source_match = (
                float(matcher.similarity(query_relation[2], sources).max(initial=0.0))
                > threshold
                or any(query_relation[2].lower() in x.lower() for x in sources)
            )
            d2s = dist_match and source_match
    return not (s2d or d2s)


# ---------------------------------------------------------------------------
# Spark stage: verify emitted triples against the rule-LLM per sentence
# ---------------------------------------------------------------------------

VERIFY_SCHEMA = StructType(
    [
        StructField("sentence_id", StringType(), False),
        StructField("r_id", StringType(), False),
        StructField("llm_aligned", BooleanType(), False),
        StructField("llm_relations", ArrayType(ArrayType(StringType())), False),
    ]
)


def verify_relations(
    scored_pairs_with_sentence: DataFrame, annotator_factory=None
) -> DataFrame:
    """For each classified pair (needs columns sentence_id, r_id, sentence,
    org_groups, entity1, entity2, relation): annotate the sentence with the
    configured annotator and flag directional agreement (G3+G4 composed).

    annotator_factory: zero-arg callable built ON THE EXECUTOR (one
    annotator per task) returning any object with
    annotate(sentence, orgs) -> triples. Default: the deterministic
    RuleLLMAnnotator. Pass e.g.
    `lambda: HttpLLMAnnotator(endpoint, api_key=...)` to run the
    verification stage against a real chat-completion service — the
    factory closure ships tiny config strings, never sockets.

    The emitted `llm_aligned` flag is the conflict-report analog of
    src/stages/evaluate.py:156-160."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        annotator = (
            annotator_factory() if annotator_factory else RuleLLMAnnotator()
        )
        matcher = HashEmbedder()
        for batch in batches:
            out = []
            for rec in batch.itertuples(index=False):
                orgs = list(dict(rec.org_groups).keys())
                llm_triples = annotator.annotate(rec.sentence, orgs)
                # The predicted relation is the role of entity2 =>
                # (entity2, relation, entity1); customer-direction queries are
                # resorted to supplier direction first (agg_utils.py:105-110)
                # because relation_search's main_relations is {'supplier'}.
                if rec.relation == "customer":
                    query = (rec.entity1, "supplier", rec.entity2)
                else:
                    query = (rec.entity2, rec.relation, rec.entity1)
                aligned = relation_search(
                    query, [tuple(t) for t in llm_triples], matcher
                )
                out.append((rec.sentence_id, rec.r_id, bool(aligned), llm_triples))
            yield pd.DataFrame(
                out, columns=["sentence_id", "r_id", "llm_aligned", "llm_relations"]
            )

    return scored_pairs_with_sentence.mapInPandas(_map, schema=VERIFY_SCHEMA)
