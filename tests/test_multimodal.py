"""Multimodal plumbing: schema contract, Arrow batch dataflow, frame-
sampling math, REAL PNG/WAV decode (pure-python decoders — no fake)."""

import struct
import zlib

import numpy as np
import pytest

from cuvs_lucene_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    PNG_MAGIC,
    decode_media,
    decode_png,
    decode_wav,
    extract_features,
    fake_decode,
    sample_frames,
)


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal PNG encoder (test-side forward transform): 8-bit gray or
    RGB, per-scanline filter types chosen by ``filters`` so the decoder's
    five unfilter paths are all exercised."""
    if img.ndim == 2:
        h, w, c, colortype = img.shape[0], img.shape[1], 1, 0
        flat = img.reshape(h, w)
    else:
        h, w, c = img.shape
        colortype = {1: 0, 3: 2, 4: 6}[c]
        flat = img.reshape(h, w * c)
    stride, bpp = w * c, c
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ft = filters[y]
        line = flat[y].astype(np.int32)
        f = np.empty(stride, np.int32)
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            cc = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                p = 0
            elif ft == 1:
                p = a
            elif ft == 2:
                p = b
            elif ft == 3:
                p = (a + b) // 2
            else:
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                p = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            f[i] = (line[i] - p) & 0xFF
        raw.append(ft)
        raw.extend(f.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_png_roundtrip_all_filters():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    data = encode_png(img, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), img)
    rgb = rng.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    data = encode_png(rgb, filters=[4, 3, 1, 2])
    assert np.array_equal(decode_png(data), rgb)


def test_wav_roundtrip():
    t = np.arange(800) / 16000.0
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    samples, rate = decode_wav(encode_wav(wave))
    assert rate == 16000
    assert samples.size == 800
    assert np.abs(samples - wave).max() < 1e-4  # 1 LSB truncation + scale


def test_decode_media_real_png_wav(spark):
    """The decode path with NO fake flag: real PNG and WAV payloads decode
    through the engine's own pure-python decoders."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(6, 6), dtype=np.uint8)
    wave = (0.25 * np.sin(np.arange(400) / 10.0)).astype(np.float32)
    rows = [
        (0, "image", encode_png(img, filters=[0, 1, 2, 3, 4, 1]), None),
        (1, "audio", encode_wav(wave), None),
    ]
    out = {r["ext_id"]: r for r in decode_media(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}
    got_img = np.array(out[0]["decoded"], dtype=np.float32)
    assert np.allclose(got_img, img.ravel() / 255.0, atol=1e-6)
    got_wave = np.array(out[1]["decoded"], dtype=np.float32)
    assert got_wave.size == 400
    assert np.abs(got_wave - wave).max() < 1e-4


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


def test_resize_images_real_png(spark):
    """Nearest-neighbor resize over REAL decoded PNGs: hand-verifiable
    index math (src = floor(dst*in/out)), channel preservation, upscale
    and downscale, [0,1] normalization."""
    from cuvs_lucene_spark.operators.multimodal import resize_images

    img = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16  # gray gradient
    rgb = np.random.default_rng(3).integers(0, 255, (6, 5, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, "image", encode_png(img), None),
         (1, "image", encode_png(rgb), None),
         (2, "audio", b"RIFFxxxxWAVE", None)],  # non-image: filtered out
        "ext_id long, kind string, payload binary, meta map<string,double>",
    )
    out = {r["ext_id"]: r for r in resize_images(df, 2, 2).collect()}
    assert set(out) == {0, 1}  # audio row excluded
    # 4x4 -> 2x2 nearest with floor indexing picks rows/cols {0, 2}
    got = np.array(out[0]["pixels"]).reshape(2, 2)
    exp = (img[[0, 2]][:, [0, 2]].astype(np.float32) / 255.0)
    assert np.allclose(got, exp)
    assert (out[0]["h"], out[0]["w"], out[0]["c"]) == (2, 2, 1)
    # RGB keeps 3 channels; values subset of the source pixels
    assert out[1]["c"] == 3
    assert len(out[1]["pixels"]) == 2 * 2 * 3
    # upscale: every output pixel is an exact source pixel
    up = {r["ext_id"]: r for r in resize_images(df, 8, 8).collect()}
    gu = np.array(up[0]["pixels"]).reshape(8, 8)
    assert set(np.round(np.unique(gu) * 255.0).astype(int)) <= set(img.ravel().tolist())


def test_features_feed_ann_pipeline(spark, tmp_path):
    """End-to-end composition: media payloads → byte-histogram features →
    ANN sidecar build → cosine top-k. The extract_features output feeds
    build_ann unchanged (the multimodal embedding-pipeline shape)."""
    from cuvs_lucene_spark.operators.ann import ann_topk, build_ann
    from cuvs_lucene_spark.operators.multimodal import extract_features

    rng = np.random.default_rng(8)
    rows = [(i, "image", rng.bytes(400), None) for i in range(40)]
    df = spark.createDataFrame(
        rows, "ext_id long, kind string, payload binary, meta map<string,double>"
    )
    feats = extract_features(df, n_bins=32)
    cat = build_ann(
        spark, feats, str(tmp_path / "mmann"), id_col="ext_id",
        vector_col="features", rows_per_segment=20,
    )
    qrow = feats.filter("ext_id = 5").collect()[0]["features"]
    got = [r["ext_id"] for r in
           ann_topk(spark, cat, qrow, k=3, metric="cosine", mode="exact").collect()]
    assert got[0] == 5  # self-similarity wins
    assert len(got) == 3
