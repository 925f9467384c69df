"""Vectorized LEB128 varint codec over numpy arrays.

This is the posting-list compression recipe the reference uses for its
HNSW graph serialization — sorted ids → dedupe → delta → VInt blocks with
a monotonic offset directory (``AcceleratedHNSWUtils.writeGraph:239-289``,
``writeMeta:350-366`` — SURVEY.md B14/B15/O8) — transplanted onto posting
lists, encoded/decoded entirely with numpy array ops (no per-row Python,
per BASELINE.json ``input_hint``).

Values must be uint32-range (doc-id deltas and term frequencies always are:
segment-local doc ids are dense ints < 2^31).
"""

from __future__ import annotations

import numpy as np

_T1 = 1 << 7
_T2 = 1 << 14
_T3 = 1 << 21
_T4 = 1 << 28


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint32-range integer array. Fully vectorized.

    Each value occupies 1-5 bytes; low 7 bits first, MSB = continuation.
    """
    a = np.asarray(values)
    if a.size == 0:
        return b""
    nb = varint_byte_lengths(a)  # validates the uint32 range
    a = a.astype(np.uint64)
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    # start offset of each value's first byte
    starts = np.zeros(a.size, dtype=np.int64)
    np.cumsum(nb[:-1], out=starts[1:])
    # write byte j of every value that has >= j+1 bytes
    for j in range(5):
        mask = nb > j
        if not mask.any():
            break
        chunk = ((a[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[mask] > j + 1).astype(np.uint8) << 7
        out[starts[mask] + j] = chunk | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode an LEB128 byte string into an int64 numpy array. Vectorized.

    Groups bytes by value using the continuation bit, then combines each
    group with ``np.bitwise_or.reduceat`` — no Python-level loop over values.
    """
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    cont = (b & 0x80) != 0
    # a byte starts a new value iff the previous byte had no continuation bit
    is_start = np.empty(b.size, dtype=bool)
    is_start[0] = True
    is_start[1:] = ~cont[:-1]
    starts = np.flatnonzero(is_start)
    # position of each byte within its value
    value_idx = np.cumsum(is_start) - 1
    pos = np.arange(b.size, dtype=np.int64) - starts[value_idx]
    if pos.max() > 4:
        raise ValueError("varint_decode: value exceeds 5 bytes (uint32 range)")
    parts = (b & 0x7F).astype(np.uint64) << (7 * pos).astype(np.uint64)
    vals = np.bitwise_or.reduceat(parts, starts)
    return vals.astype(np.int64)


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """sorted doc ids → first id + deltas → varint bytes (B14 recipe)."""
    ids = np.asarray(sorted_ids, dtype=np.int64)
    if ids.size == 0:
        return b""
    deltas = np.empty(ids.size, dtype=np.int64)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    if deltas.size > 1 and deltas[1:].min() <= 0:
        raise ValueError("delta_encode: ids must be strictly increasing")
    return varint_encode(deltas)


def delta_decode(buf: bytes) -> np.ndarray:
    """varint bytes → cumulative-summed doc ids."""
    deltas = varint_decode(buf)
    return np.cumsum(deltas, dtype=np.int64)


def varint_byte_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value LEB128 byte count (1-5) — lets a caller slice a single
    concatenated ``varint_encode`` blob at arbitrary value boundaries
    (the positions writer encodes one blob per segment and byte-slices it
    per term instead of re-encoding vocabulary-many small arrays)."""
    a = np.asarray(values)
    if a.size == 0:
        return np.empty(0, dtype=np.int64)
    if a.min() < 0 or a.max() >= (1 << 32):
        raise ValueError("varint: values must be in [0, 2^32)")
    a = a.astype(np.uint64)
    return 1 + (a >= _T1).astype(np.int64) + (a >= _T2) + (a >= _T3) + (a >= _T4)
