"""Ports of the reference's LLM-alignment and conflict-finder test families
(test/test_re_dataset_creation.py:19-155, test/test_conflict_finder.py:29-71),
adapted to the deterministic HashEmbedder matcher.
"""

import pytest

from finance_sc_relations_spark.functions.similarity import HashEmbedder
from finance_sc_relations_spark.operators.llm_verify import (
    RuleLLMAnnotator,
    extract_relations_from_llm,
    mask_terms,
    demask_terms,
    relation_search,
)


@pytest.fixture(scope="module")
def matcher():
    return HashEmbedder()


@pytest.fixture
def datapoint():
    # test/test_re_dataset_creation.py:19-28
    return {
        "filer": "ADVANCED MICRO DEVICES INC corp",
        "sentence": (
            "In addition, five customers, including Sony and Microsoft, "
            "accounted for approximately 95% of the net revenue attributable "
            "to ADVANCED MICRO DEVICES Inc Enterprise, Embedded and Semi "
            "Custom segment"
        ),
        "relations": [
            ["ADVANCED MICRO DEVICES Inc", "supplier", "Sony"],
            ["ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft"],
        ],
        "org_groups": {"ADVANCED MICRO DEVICES Inc": 0, "Microsoft": 1, "Sony": 2},
    }


def test_only_filer(datapoint, matcher):
    llms, others = extract_relations_from_llm(
        datapoint, matcher, threshold=0.9, only_filer=True, max_others=1
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft"),
    ]
    assert others == []


def test_onlyfiler_false_max_other1(datapoint, matcher):
    llms, others = extract_relations_from_llm(
        datapoint, matcher, threshold=0.9, only_filer=False, max_others=1
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft"),
    ]
    assert others == [("Microsoft", "other", "Sony")]


def test_changing_names_slightly(datapoint, matcher):
    datapoint["relations"] = [
        ["ADVANCED MICRO DEVICES Inc", "supplier", "Sony Inc"],
        ["ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft inc"],
    ]
    llms, others = extract_relations_from_llm(
        datapoint, matcher, threshold=0.9, only_filer=False, max_others=1
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft"),
    ]
    assert others == [("Microsoft", "other", "Sony")]


def test_when_all_others(datapoint, matcher):
    datapoint["relations"] = [
        ["ADVANCED MICRO DEVICES Inc", "other", "Sony Inc"],
        ["ADVANCED MICRO DEVICES Inc", "other", "Microsoft inc"],
    ]
    llms, others = extract_relations_from_llm(
        datapoint, matcher, threshold=0.9, only_filer=False, max_others=1
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "other", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "other", "Microsoft"),
    ]
    assert others == [("Microsoft", "other", "Sony")]


def test_when_all_other_only_filer(datapoint, matcher):
    datapoint["relations"] = [
        ["ADVANCED MICRO DEVICES Inc", "other", "Sony Inc"],
        ["ADVANCED MICRO DEVICES Inc", "other", "Microsoft inc"],
    ]
    llms, others = extract_relations_from_llm(
        datapoint, matcher, threshold=0.9, only_filer=True, max_others=0
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "other", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "other", "Microsoft"),
    ]
    assert others == []


def test_adding_llm_relation_nonexact(datapoint, matcher):
    datapoint["relations"] = [
        ["ADVANCED MICRO DEVICES Inc", "supplier", "Sony Inc"],
        ["ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft inc"],
        ["MISTAKE", "supplier", "WRONG NAME"],
    ]
    llms, others = extract_relations_from_llm(
        datapoint, matcher, threshold=0.9, only_filer=False, max_others=1
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft"),
    ]
    assert others == [("Microsoft", "other", "Sony")]


def test_adding_llm_nonexist_max_other_2(datapoint, matcher):
    datapoint["sentence"] = (
        "MISTAKE is supplier WRONG NAME of " + datapoint["sentence"]
    )
    datapoint["relations"] = [
        ["ADVANCED MICRO DEVICES Inc", "supplier", "Sony Inc"],
        ["ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft inc"],
        ["MISTAKE", "supplier", "WRONG NAME"],
    ]
    llms, others = extract_relations_from_llm(
        datapoint, matcher, threshold=0.9, only_filer=False, max_others=2
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft"),
        ("MISTAKE", "supplier", "WRONG NAME"),
    ]
    assert len(others) == 2


def test_having_no_llm_relations(datapoint, matcher):
    datapoint["sentence"] = (
        "MISTAKE is supplier WRONG NAME of " + datapoint["sentence"]
    )
    datapoint["relations"] = []
    llms, others = extract_relations_from_llm(
        datapoint, matcher, threshold=0.9, only_filer=False, max_others=2
    )
    assert llms == []
    assert len(others) == 2


# ---------------------------------------------------------------------------
# relation_search agreement table (test/test_conflict_finder.py:36-71)
# ---------------------------------------------------------------------------

ORBCOMM_RELATIONS = [
    ["ORBCOMM Inc", "nothing", "Systems Inc"],
    ["ORBCOMM Inc", "nothing", "inthinc Technology Solutions Inc"],
    ["ORBCOMM Inc", "nothing", "Value added Solutions Providers"],
    ["Onixsat", "supplier", "ORBCOMM Inc"],
    ["Satlink", "supplier", "ORBCOMM Inc"],
    ["Sascar", "supplier", "ORBCOMM Inc"],
    ["Carrier Transicold", "supplier", "ORBCOMM Inc"],
    ["Thermo King", "supplier", "ORBCOMM Inc"],
    ["CS Wholesale", "supplier", "ORBCOMM Inc"],
    ["Canadian National Railways", "supplier", "ORBCOMM Inc"],
    ["CR England", "supplier", "ORBCOMM Inc"],
    ["Hub Group Inc", "supplier", "ORBCOMM Inc"],
    ["KLLM Transport Services", "supplier", "ORBCOMM Inc"],
    ["Marten Transport", "supplier", "ORBCOMM Inc"],
]

CASES = [
    (("ORBCOMM Inc", "nothing", "inthinc Technology Solutions Inc"), True),
    (("Satlink", "nothing", "inthinc Technology Solutions Inc"), True),
    (("Onixsat", "supplier", "ORBCOMM"), True),
    (("ORBCOMM Inc", "supplier", "Systems Inc"), False),
    (("Onixsat", "nothing", "ORBCOMM Inc"), False),
    (("ORBCOMM Inc", "nothing", "Onixsat"), False),
    (("ORBCOMM Inc", "supplier", "Onixsat"), False),
    (("Random1", "nothing", "Random2"), True),
    (("Hub Group", "supplier", "ORBCOMM Inc"), True),
    (("Sascar", "supplier", "Onixsat"), False),
    (("Sascar", "nothing", "Onixsat"), True),
]


@pytest.mark.parametrize("query,expected", CASES)
def test_relation_search_table(matcher, query, expected):
    got = relation_search(
        query_relation=query,
        relations_tuples=[tuple(t) for t in ORBCOMM_RELATIONS],
        matcher=matcher,
        threshold=0.85,
        main_relations=["supplier"],
    )
    assert got == expected, query


# ---------------------------------------------------------------------------
# Rule-LLM annotator + masking
# ---------------------------------------------------------------------------

def test_mask_demask_roundtrip():
    sent = "Acme Corp supplies Beta Inc."
    masked, mapping = mask_terms(sent, ["Acme Corp", "Beta Inc"])
    assert "Acme" not in masked and "Beta" not in masked
    assert demask_terms(masked, mapping) == sent


def test_rule_llm_annotator_direction():
    ann = RuleLLMAnnotator()
    triples = ann.annotate(
        "Acme Corp supplies components to Beta Inc.", ["Acme Corp", "Beta Inc"]
    )
    assert ["Acme Corp", "supplier", "Beta Inc"] in triples
    triples2 = ann.annotate(
        "Beta Inc purchases modules from Acme Corp.", ["Acme Corp", "Beta Inc"]
    )
    assert ["Acme Corp", "supplier", "Beta Inc"] in triples2


def test_rule_llm_annotator_many_orgs_token_boundary():
    """With 11+ orgs, masking token 'Company1' must not corrupt 'Company10':
    relations involving the higher-numbered org must still be found."""
    fillers = [f"Filler{i} Gmbh" for i in range(10)]
    sent = (
        " ".join(f"{f} is mentioned." for f in fillers)
        + " Alpha Corp supplies components to Omega Inc."
    )
    # longest-first masking puts the two real orgs at high token numbers
    orgs = sorted(fillers + ["Alpha Corp", "Omega Inc"], key=len)
    ann = RuleLLMAnnotator()
    triples = ann.annotate(sent, orgs)
    assert ["Alpha Corp", "supplier", "Omega Inc"] in triples


class _StubChatServer:
    """Local OpenAI-style /v1/chat/completions stub: fails the first
    `fail_first` requests with HTTP 500, then returns the canned completion.
    Records every request body for assertions."""

    def __init__(self, completion: str, fail_first: int = 0):
        import http.server
        import json
        import threading

        server = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 (stdlib handler name)
                n = int(self.headers.get("Content-Length", 0))
                server.requests.append(json.loads(self.rfile.read(n)))
                if len(server.requests) <= server.fail_first:
                    self.send_response(500)
                    self.end_headers()
                    return
                body = json.dumps(
                    {
                        "choices": [
                            {"message": {"role": "assistant",
                                         "content": server.completion}}
                        ]
                    }
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence test output
                pass

        self.completion = completion
        self.fail_first = fail_first
        self.requests: list = []
        self._httpd = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self._httpd.server_port}/v1/chat/completions"
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()


def test_http_annotator_masks_retries_and_demasks():
    """The HTTP path end to end against a local chat-completion stub: org
    names are masked in the outbound prompt, HTTP 500s are retried with the
    reference's sleep-and-retry shape, and the returned triples are
    demasked back to real names."""
    from finance_sc_relations_spark.operators.llm_verify import HttpLLMAnnotator

    # mask ids assign longest-first: Company0 = "Zenith Holdings",
    # Company1 = "Acme Corp"
    server = _StubChatServer(
        "Company1 supplier of Company0\nCompany0 customer of Company1\nnone",
        fail_first=2,
    )
    try:
        ann = HttpLLMAnnotator(server.url, max_retries=5, backoff_s=0.01)
        triples = ann.annotate(
            "Acme Corp supplies widgets to Zenith Holdings.",
            ["Acme Corp", "Zenith Holdings"],
        )
        # both lines describe the same supplier-directed relation -> deduped
        assert triples == [["Acme Corp", "supplier", "Zenith Holdings"]]
        assert len(server.requests) == 3  # two 500s + one success
        assert ann.n_requests == 3
        sent = server.requests[-1]["messages"][0]["content"]
        assert "Acme Corp" not in sent and "Zenith Holdings" not in sent
        assert "Company0" in sent and "Company1" in sent
        assert server.requests[-1]["model"] == "gpt-3.5-turbo"
    finally:
        server.close()


def test_http_annotator_bounded_retry_raises():
    """A dead endpoint must fail after max_retries, not hang the executor
    like the reference's unbounded while-loop would."""
    import pytest

    from finance_sc_relations_spark.operators.llm_verify import HttpLLMAnnotator

    server = _StubChatServer("unused", fail_first=10**6)
    try:
        ann = HttpLLMAnnotator(server.url, max_retries=3, backoff_s=0.01)
        with pytest.raises(RuntimeError, match="after 3 attempts"):
            ann.annotate("Acme supplies Zenith.", ["Acme", "Zenith"])
        assert len(server.requests) == 3
    finally:
        server.close()


def test_http_annotator_ignores_unknown_masks_and_garbage():
    from finance_sc_relations_spark.operators.llm_verify import HttpLLMAnnotator

    # longest-first masks: Company0 = "Ax", Company1 = "B"
    server = _StubChatServer(
        "Company7 supplier of Company0\nCompany0 supplier of Company0\n"
        "utter nonsense line\nCompany1 SUPPLIER Company0"
    )
    try:
        ann = HttpLLMAnnotator(server.url, backoff_s=0.01)
        triples = ann.annotate("B buys from Ax.", ["Ax", "B"])
        # only the last line survives: known masks, distinct, case-folded
        assert triples == [["B", "supplier", "Ax"]]
    finally:
        server.close()


def test_http_annotator_canonicalizes_mask_casing():
    """LLM casing drift ('company0') must not drop relations: captured mask
    tokens are canonicalized before the mapping lookup."""
    from finance_sc_relations_spark.operators.llm_verify import HttpLLMAnnotator

    server = _StubChatServer("company1 supplier of COMPANY0")
    try:
        ann = HttpLLMAnnotator(server.url, backoff_s=0.01)
        triples = ann.annotate("B buys from Ax.", ["Ax", "B"])
        assert triples == [["B", "supplier", "Ax"]]
    finally:
        server.close()


def test_verify_relations_stage_rule_and_http(spark):
    """The Spark verification stage end to end: mapInPandas over classified
    pairs, default rule annotator AND the HTTP factory against the local
    stub — llm_aligned flags directional agreement either way."""
    from finance_sc_relations_spark.operators.llm_verify import (
        HttpLLMAnnotator,
        verify_relations,
    )

    pairs = spark.createDataFrame(
        [
            # sentence asserts Acme supplies Zenith; prediction says
            # entity2=Acme is the supplier of entity1=Zenith -> aligned
            ("s1", "s1_0", "Acme Corp supplies components to Zenith Holdings.",
             {"Acme Corp": 0, "Zenith Holdings": 1}, "Zenith Holdings",
             "Acme Corp", "supplier"),
            # prediction claims the reverse direction -> conflict
            ("s2", "s2_0", "Acme Corp supplies components to Zenith Holdings.",
             {"Acme Corp": 0, "Zenith Holdings": 1}, "Acme Corp",
             "Zenith Holdings", "supplier"),
        ],
        "sentence_id string, r_id string, sentence string,"
        " org_groups map<string,int>, entity1 string, entity2 string,"
        " relation string",
    )
    rule_rows = {
        r["r_id"]: r["llm_aligned"] for r in verify_relations(pairs).collect()
    }
    assert rule_rows == {"s1_0": True, "s2_0": False}

    # HTTP path: mask ids are longest-first (Company0 = Zenith Holdings);
    # the canned completion asserts Acme (Company1) supplies Zenith
    server = _StubChatServer("Company1 supplier of Company0")
    try:
        url = server.url
        http_rows = {
            r["r_id"]: r["llm_aligned"]
            for r in verify_relations(
                pairs,
                annotator_factory=lambda: HttpLLMAnnotator(url, backoff_s=0.01),
            ).collect()
        }
        assert http_rows == {"s1_0": True, "s2_0": False}
        assert len(server.requests) >= 1  # the stage really hit the wire
    finally:
        server.close()
