"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media travel as opaque ``binary`` payloads with a typed metadata struct —
the Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec decode is STUBBED because
image/audio libraries are not in this container:

- ``decode_media``      → raises NotImplementedError unless a decoder is
  importable (gated import), or uses the deterministic fake when
  ``fake=True``.
- ``extract_features``  → REAL vectorized computation over payload bytes
  (normalized 64-bin byte histogram via numpy) — a stand-in feature
  extractor with the exact dataflow shape of an embedding model batch.
- ``sample_frames``     → real frame-offset math over (duration, fps),
  payload slicing per sampled frame.

All heavy paths are ``mapInPandas`` (Arrow batches, no per-row Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("ext_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("fps", T.DoubleType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _try_import_decoder(kind: str):
    try:  # gated: none of these exist in this container
        if kind == "image":
            import PIL.Image  # noqa: F401

            return PIL.Image
        if kind == "audio":
            import soundfile  # noqa: F401

            return soundfile
    except ImportError:
        return None
    return None


def fake_decode(payload: bytes, n: int = 256) -> np.ndarray:
    """Deterministic fake decoder: payload bytes → pseudo-pixels.
    Stands in for PIL/ffmpeg so the pipeline shape is testable here."""
    a = np.frombuffer(payload or b"\0", dtype=np.uint8)
    reps = int(np.ceil(n / max(a.size, 1)))
    return np.tile(a, reps)[:n].astype(np.float32) / 255.0


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """payload → decoded sample vector. Real decoders are import-gated;
    ``fake=True`` uses the deterministic stand-in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                dec = _try_import_decoder(pdf["kind"].iloc[0] if len(pdf) else "image")
                if dec is None:
                    raise NotImplementedError(
                        "no media decoder available in this environment; "
                        "pass fake=True or install PIL/soundfile"
                    )
            out = pdf[["ext_id", "kind"]].copy()
            out["decoded"] = [fake_decode(p).tolist() for p in pdf["payload"]]
            yield out

    return df.mapInPandas(run, "ext_id long, kind string, decoded array<float>")


def extract_features(df: DataFrame, n_bins: int = 64) -> DataFrame:
    """Opaque payload → normalized byte-histogram feature vector.

    Real numpy batch computation with the dataflow of an embedding-model
    stage: Arrow batch in → (n, n_bins) float matrix out. The output feeds
    the ANN sidecar (operators.ann.build_ann) unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                a = np.frombuffer(p or b"\0", dtype=np.uint8)
                h = np.bincount(a >> 2, minlength=n_bins)[:n_bins].astype(np.float64)
                s = h.sum()
                feats.append((h / s if s else h).astype(np.float32).tolist())
            yield pd.DataFrame({"ext_id": pdf["ext_id"], "features": feats})

    return df.mapInPandas(run, "ext_id long, features array<float>")


def sample_frames(df: DataFrame, every_s: float = 1.0, max_frames: int = 16) -> DataFrame:
    """Video rows → one row per sampled frame with byte-range offsets.

    Frame offsets are real math over (duration_s, fps); the per-frame
    payload slice is a deterministic placeholder for a real demuxer.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                meta = r.meta or {}
                dur = float(meta.get("duration_s") or 0.0)
                fps = float(meta.get("fps") or 0.0)
                if dur <= 0 or fps <= 0:
                    continue
                n_frames = int(dur * fps)
                stride = max(1, int(round(every_s * fps)))
                payload = r.payload or b""
                per_frame = max(1, len(payload) // max(n_frames, 1))
                for i, f_idx in enumerate(range(0, n_frames, stride)):
                    if i >= max_frames:
                        break
                    off = f_idx * per_frame
                    rows.append(
                        (r.ext_id, f_idx, round(f_idx / fps, 6),
                         payload[off : off + per_frame])
                    )
            yield pd.DataFrame(
                rows, columns=["ext_id", "frame_idx", "ts_s", "frame_payload"]
            )

    return df.filter(F.col("kind") == "video").mapInPandas(
        run, "ext_id long, frame_idx int, ts_s double, frame_payload binary"
    )
