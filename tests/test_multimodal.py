"""Multimodal binary-column plumbing (decode kernels stubbed; schema,
batching, determinism real)."""

from finance_sc_relations_spark.operators.multimodal import (
    extract_media_features,
    make_synthetic_media,
    sample_frames,
)


def test_feature_extraction_deterministic(spark):
    media = make_synthetic_media(spark, n=12)
    a = extract_media_features(media).toPandas().sort_values("media_id")
    b = extract_media_features(media).toPandas().sort_values("media_id")
    assert list(a["content_sha"]) == list(b["content_sha"])
    assert all(len(f) == 8 for f in a["features"])
    assert (a["n_bytes"] == 64).all()


def test_frame_sampling_offsets(spark):
    media = make_synthetic_media(spark, n=9)
    frames = sample_frames(media, every_ms=1000).toPandas()
    # only audio/video rows (duration 5000ms) produce frames: 5 frames each
    vids = frames.groupby("media_id").size()
    assert set(vids.values) == {5}
    assert sorted(frames[frames.media_id == 2]["offset_ms"]) == [
        0, 1000, 2000, 3000, 4000,
    ]
    # frame payloads deterministic and distinct per offset
    p = frames[frames.media_id == 2].sort_values("offset_ms")["frame_payload"]
    assert len({bytes(x) for x in p}) == 5
