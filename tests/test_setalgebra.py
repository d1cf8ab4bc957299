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


def test_native_setalgebra_matches_xla():
    """Host-native POPCNT path vs the chunked device reduce and numpy
    bit_count, including non-multiple-of-8 byte tails."""
    import pytest

    from libflagstats_tpu.ops import setalgebra as S

    if not S._native_available():
        pytest.skip("native host library unavailable")
    rng = np.random.default_rng(5)
    for n_u32 in (1, 3, 1000, 100_001):
        a = rng.integers(0, 1 << 32, size=n_u32, dtype=np.uint32)
        b = rng.integers(0, 1 << 32, size=n_u32, dtype=np.uint32)
        ref_p = int(np.bitwise_count(a.astype(np.uint64)).sum())
        assert S.popcnt(a, impl="native") == ref_p
        assert S.popcnt(a, impl="native") == S.popcnt(a, impl="xla")
        for fn, op in ((S.intersect_count, np.bitwise_and),
                       (S.union_count, np.bitwise_or),
                       (S.diff_count, lambda x, y: x & ~y)):
            ref = int(np.bitwise_count(op(a, b).astype(np.uint64)).sum())
            assert fn(a, b, impl="native") == ref
