"""Multimodal plumbing: schema contract, Arrow batch dataflow, frame-
sampling math — with the stubbed decoder clearly gated."""

import numpy as np
import pytest

from cuvs_lucene_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    fake_decode,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    rng = np.random.default_rng(5)
    for i in range(20):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=500 + 37 * i, dtype=np.uint8))
        meta = {
            "width": 64, "height": 48, "sample_rate": 16000,
            "duration_s": 4.0, "fps": 8.0, "codec": "fake",
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_raises_without_decoder(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|no media decoder"):
        decode_media(media).collect()


def test_fake_decode_deterministic(spark, media):
    out = decode_media(media, fake=True).collect()
    assert len(out) == 20
    assert all(len(r["decoded"]) == 256 for r in out)
    again = decode_media(media, fake=True).collect()
    assert [r["decoded"] for r in sorted(out, key=lambda r: r["ext_id"])] == [
        r["decoded"] for r in sorted(again, key=lambda r: r["ext_id"])
    ]


def test_extract_features_feeds_ann(spark, media):
    from cuvs_lucene_spark.config import IndexConfig
    from cuvs_lucene_spark.operators.ann import ann_topk, build_ann

    feats = extract_features(media)
    rows = feats.collect()
    assert all(len(r["features"]) == 64 for r in rows)
    assert all(abs(sum(r["features"]) - 1.0) < 1e-5 for r in rows)
    # plumbing is real: the feature output builds an ANN index directly
    cat = build_ann(
        spark, feats, str(spark.conf.get("spark.local.dir", "/tmp")) + "/mm_ann_test",
        IndexConfig(), id_col="ext_id", vector_col="features", rows_per_segment=8,
    )
    q = rows[0]["features"]
    top = ann_topk(spark, cat, q, k=3, metric="cosine", mode="exact").collect()
    assert top[0]["ext_id"] == rows[0]["ext_id"]


def test_sample_frames_math(spark, media):
    out = sample_frames(media, every_s=1.0, max_frames=16).collect()
    # only video rows; 4s at 8fps sampled 1/s → 4 frames each
    vids = {r["ext_id"] for r in out}
    assert all(i % 3 == 2 for i in vids)
    per = {}
    for r in out:
        per.setdefault(r["ext_id"], []).append((r["frame_idx"], r["ts_s"]))
    for frames in per.values():
        assert [f for f, _ in sorted(frames)] == [0, 8, 16, 24]
        assert [t for _, t in sorted(frames)] == [0.0, 1.0, 2.0, 3.0]
    assert all(len(r["frame_payload"]) > 0 for r in out)
