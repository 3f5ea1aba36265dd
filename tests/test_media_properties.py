"""Property-based invariants of the media metadata walks and the token-ID
collate (hypothesis): every generated valid stream round-trips exactly;
arbitrary byte noise either parses or raises ValueError-family errors the
fallback tier catches — never anything else."""

from hypothesis import given, settings, strategies as st

from finance_sc_relations_spark.functions.wordpiece import pad_batch
from finance_sc_relations_spark.operators.multimodal import (
    _parse_jpeg,
    _parse_mp4,
    make_jpeg_shell,
    make_mp4,
)

_FALLBACK_ERRORS = (ValueError, IndexError)  # what the stub tier catches


@settings(max_examples=60, deadline=None)
@given(
    duration_ms=st.integers(min_value=1, max_value=10**7),
    timescale=st.sampled_from([1, 600, 1000, 90000, 48000]),
    n_tracks=st.integers(min_value=0, max_value=5),
    mdat_bytes=st.integers(min_value=0, max_value=2048),
)
def test_mp4_walk_roundtrip_property(duration_ms, timescale, n_tracks, mdat_bytes):
    p = make_mp4(
        "prop", duration_ms=duration_ms, timescale=timescale,
        n_tracks=n_tracks, mdat_bytes=mdat_bytes,
    )
    info = _parse_mp4(p)
    assert info["timescale"] == timescale
    assert info["duration"] == duration_ms * timescale // 1000
    assert info["duration_ms"] == info["duration"] * 1000 // timescale
    assert info["n_tracks"] == n_tracks
    assert info["mdat_len"] == mdat_bytes
    assert p[info["mdat_off"] : info["mdat_off"] + info["mdat_len"]] == p[-mdat_bytes or len(p):]


@settings(max_examples=60, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=0xFFFF),
    height=st.integers(min_value=1, max_value=0xFFFF),
    entropy=st.integers(min_value=0, max_value=1024),
)
def test_jpeg_walk_roundtrip_property(width, height, entropy):
    p = make_jpeg_shell("prop", width=width, height=height, entropy_bytes=entropy)
    info = _parse_jpeg(p)
    assert (info["width"], info["height"]) == (width, height)
    assert info["n_components"] == 3
    assert info["entropy_len"] == entropy


@settings(max_examples=120, deadline=None)
@given(blob=st.binary(min_size=0, max_size=256))
def test_parsers_never_raise_outside_fallback_family(blob):
    """Arbitrary bytes (including ones starting with the magic prefixes)
    must either parse or raise an error the digest-stub fallback catches."""
    for prefix in (b"", b"\xff\xd8", b"\x00\x00\x00\x10ftyp"):
        payload = prefix + blob
        for parser in (_parse_jpeg, _parse_mp4):
            try:
                parser(payload)
            except _FALLBACK_ERRORS:
                pass


@settings(max_examples=60, deadline=None)
@given(
    lists=st.lists(
        st.lists(st.integers(min_value=0, max_value=30000), min_size=1, max_size=40),
        min_size=1,
        max_size=12,
    ),
    pad_id=st.integers(min_value=0, max_value=10),
)
def test_pad_batch_property(lists, pad_id):
    ids, mask = pad_batch(lists, pad_id)
    width = max(len(x) for x in lists)
    assert ids.shape == (len(lists), width) == mask.shape
    for i, row in enumerate(lists):
        assert list(ids[i, : len(row)]) == row
        assert (ids[i, len(row):] == pad_id).all()
        assert mask[i].sum() == len(row)
        assert mask[i, : len(row)].all() and not mask[i, len(row):].any()
