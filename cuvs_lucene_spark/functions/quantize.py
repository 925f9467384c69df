"""Vector quantization kernels (SURVEY.md B9-B11), numpy-vectorized.

Formulas replicate the reference exactly:
- binary: per-dim mean centroid, bit = value > centroid, packed 8 dims/byte
  (``AcceleratedHNSWUtils.quantizeFloatVectorsToBinary:409-443``)
- scalar: per-SEGMENT per-dim min/max → normalize → 7-bit signed [-64, 63]
  (``AcceleratedHNSWUtils.quantizeFloatVectorsToScalar:451-488``); the
  min/max statistics are computed over the flushed batch (the segment),
  not globally (``FieldWriter.getByteVectors`` delegation)
- signed→unsigned widening for device-style consumption
  (``LuceneAcceleratedHNSWScalarQuantizedVectorsWriter.java:149-159``)
"""

from __future__ import annotations

import numpy as np


def binary_quantize(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, d) float32 → ((n, ceil(d/8)) uint8 packed bits, (d,) centroid).

    The centroid is accumulated in float64 so the bit decision
    ``value > mean`` is reproducible by any engine computing the mean in
    double precision (the DuckDB oracle does exactly that)."""
    centroid = x.astype(np.float64).mean(axis=0)
    bits = x > centroid
    return np.packbits(bits, axis=1), centroid


def scalar_quantize(x: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(n, d) float32 → ((n, d) int8 in [-64, 63], per-dim mins, maxs)."""
    mins = x.min(axis=0)
    maxs = x.max(axis=0)
    span = maxs - mins
    span[span == 0] = 1.0
    q = np.round((x - mins) / span * 127.0) - 64.0
    return np.clip(q, -64, 63).astype(np.int8), mins, maxs


def scalar_dequantize(q: np.ndarray, mins: np.ndarray, maxs: np.ndarray) -> np.ndarray:
    span = (maxs - mins).copy()
    span[span == 0] = 1.0
    return (q.astype(np.float32) + 64.0) / 127.0 * span + mins


def widen_unsigned(q: np.ndarray) -> np.ndarray:
    """7-bit signed → unsigned byte (B11): shift into [0, 127]."""
    return (q.astype(np.int16) + 64).astype(np.uint8)
