"""Property-based invariants of the tagging surgery (hypothesis).

Whatever the sentence and entity names, every emitted tagged variant must be
well-formed: exactly one [E1]..[/E1] and one [E2]..[/E2] region, tags
non-overlapping, and stripping tags recovers a sentence containing both
entity surface forms.
"""

import re

from hypothesis import given, settings, strategies as st

from finance_sc_relations_spark.functions.tagging import (
    entity_annotation,
    extract_tagged_names,
    inverse_relations,
)

_name = st.text(
    alphabet=st.characters(categories=("Lu", "Ll"), max_codepoint=0x24F),
    min_size=2,
    max_size=12,
).map(lambda s: s.capitalize())

_filler = st.text(
    alphabet=st.characters(
        categories=("Ll", "Zs"), max_codepoint=0x7E
    ),
    max_size=30,
)


@settings(max_examples=120, deadline=None)
@given(a=_name, b=_name, pre=_filler, mid=_filler, post=_filler)
def test_tagged_variants_well_formed(a, b, pre, mid, post):
    if a.lower() in b.lower() or b.lower() in a.lower():
        return  # overlapping surface forms legitimately tag zero positions
    sent = f"{pre} {a} {mid} {b} {post}"
    out = entity_annotation(sent, a, b, {a: 0, b: 1})
    for tagged in out:
        assert tagged.count("[E1]") == 1 and tagged.count("[/E1]") == 1
        assert tagged.count("[E2]") == 1 and tagged.count("[/E2]") == 1
        # regions properly ordered and non-overlapping
        s1, e1 = tagged.find("[E1]"), tagged.find("[/E1]")
        s2, e2 = tagged.find("[E2]"), tagged.find("[/E2]")
        assert s1 < e1 and s2 < e2
        assert e1 < s2 or e2 < s1
        names = extract_tagged_names(tagged)
        assert names["entity_1"] == a
        assert names["entity_2"] == b
        # inverse is an involution and swaps the extracted roles
        inv = inverse_relations(tagged)
        inv_names = extract_tagged_names(inv)
        assert inv_names["entity_1"] == b
        assert inv_names["entity_2"] == a
        assert inverse_relations(inv) == tagged


@settings(max_examples=60, deadline=None)
@given(a=_name, b=_name)
def test_positions_cap_respected(a, b):
    if a.lower() in b.lower() or b.lower() in a.lower():
        return
    sent = f"{a} x {b} y {a} z {b}"
    capped = entity_annotation(sent, a, b, {a: 0, b: 1}, num_positions=1)
    full = entity_annotation(sent, a, b, {a: 0, b: 1})
    assert len(capped) <= 1
    assert len(capped) <= len(full)
