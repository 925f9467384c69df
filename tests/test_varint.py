import numpy as np
import pytest

from cuvs_lucene_spark.functions.varint import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


def test_roundtrip_edges():
    vals = np.array(
        [0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 268435455, 268435456, 2**32 - 1],
        dtype=np.int64,
    )
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_roundtrip_random():
    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(1, 5000))
        vals = rng.integers(0, 2**32, size=n, dtype=np.int64)
        assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_empty():
    assert varint_encode(np.array([], dtype=np.int64)) == b""
    assert varint_decode(b"").size == 0


def test_rejects_out_of_range():
    with pytest.raises(ValueError):
        varint_encode(np.array([-1]))
    with pytest.raises(ValueError):
        varint_encode(np.array([2**32]))


def test_single_byte_values_compact():
    vals = np.arange(128, dtype=np.int64)
    assert len(varint_encode(vals)) == 128


def test_delta_roundtrip():
    rng = np.random.default_rng(7)
    ids = np.unique(rng.integers(0, 10**9, size=3000))
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 3, 9]))
