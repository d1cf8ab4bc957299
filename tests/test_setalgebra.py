"""Set-algebra popcount parity tests (reference: libalgebra.h STORM_*_count)."""
import numpy as np
import pytest

from libflagstats_tpu.ops.setalgebra import (
    diff_count,
    intersect_count,
    popcnt,
    union_count,
)


def _total_bits(x) -> int:
    """Shared reference popcount: np.bitwise_count when available
    (NumPy >= 2), pure-Python fallback otherwise — one definition so no
    test errors with AttributeError on the environments the fallback
    exists for."""
    if hasattr(np, "bitwise_count"):
        return int(np.bitwise_count(x).sum())
    return sum(bin(int(v)).count("1") for v in x)


@pytest.mark.parametrize("n", [0, 4, 1000, 65536])
def test_popcnt(n):
    rng = np.random.default_rng(n)
    a = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    assert popcnt(a) == _total_bits(a)


def test_set_ops():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**32, size=4096, dtype=np.uint32)
    b = rng.integers(0, 2**32, size=4096, dtype=np.uint32)

    assert intersect_count(a, b) == _total_bits(a & b)
    assert union_count(a, b) == _total_bits(a | b)
    assert diff_count(a, b) == _total_bits(a & ~b)


def test_dtype_flexibility():
    a = np.array([0xFF, 0x0F], dtype=np.uint16).repeat(2)
    assert popcnt(a) == 2 * (8 + 4)


def test_errors():
    with pytest.raises(ValueError):
        popcnt(np.zeros(3, dtype=np.uint8))  # not multiple of 4 bytes
    with pytest.raises(ValueError):
        intersect_count(np.zeros(4, np.uint32), np.zeros(8, np.uint32))


def test_chunked_reduction_matches_unchunked(monkeypatch):
    """Counts must stay exact past the int32 reduce ceiling: the device
    reduce is int32 (x64 off), so bitmaps are reduced in capped chunks
    accumulated in Python ints. Shrink the cap to force multi-chunk
    paths (with ragged zero-padded tails) and compare to numpy."""
    from libflagstats_tpu.ops import setalgebra as S

    monkeypatch.setattr(S, "_CHUNK_LANES", 1000)
    rng = np.random.default_rng(5)
    a = rng.integers(0, 1 << 32, size=3777, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=3777, dtype=np.uint64).astype(np.uint32)
    assert S.popcnt(a) == _total_bits(a)
    assert S.intersect_count(a, b) == _total_bits(a & b)
    assert S.union_count(a, b) == _total_bits(a | b)
    assert S.diff_count(a, b) == _total_bits(a & ~b)
