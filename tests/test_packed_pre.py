"""Packed pre-transposed plane layout (round 5).

The flagstat transform never reads the planes of FLAG bits 12-15, so
the pre-mode layout ships only the consumed rows — 24/32 full, 20/32
report — cutting device HBM traffic 25% / 37.5% (hardware A/B:
tools/packed_probe.py, pack24/full32 = 0.758). These tests pin
bit-exactness of the packed path end to end: host packed transpose
(native AND NumPy fallback) -> packed kernel -> counters.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import libflagstats_tpu.flags as F
from libflagstats_tpu.oracle import flagstat_numpy, generate_flags
from libflagstats_tpu.ops import bitslice as B
from libflagstats_tpu.ops import pallas_kernels as PK

from conftest import assert_counters_equal


@pytest.fixture(scope="module")
def data():
    n = 8 * PK.GROUP_WORDS - 4321     # tail exercises zero-pad neutrality
    x = generate_flags(n, seed=77, full_range=True)
    return n, x, flagstat_numpy(x).astype(np.int64)


def test_packed_rows_sets():
    assert len(PK.PACKED_ROWS_FULL) == 24
    assert len(PK.PACKED_ROWS_REPORT) == 20
    assert set(PK.PACKED_ROWS_FULL) == set(B.NEEDED_ROWS)
    assert set(PK.PACKED_ROWS_REPORT) == set(B.REPORT_NEEDED_ROWS)
    assert PK.packed_rows_for(False) == PK.PACKED_ROWS_FULL
    assert PK.packed_rows_for(True) == PK.PACKED_ROWS_REPORT


def test_packed_full_bit_exact(data):
    n, x, ref = data
    planes = B.pretranspose_host_packed(x, PK.PACKED_ROWS_FULL)
    assert planes.shape[1:] == (24, 8, 128)
    got = np.asarray(PK.flagstat_pallas_pre(
        jnp.asarray(planes), n=n, interpret=True, packed=True),
        dtype=np.int64)
    assert_counters_equal(ref, got)


def test_packed_report_bit_exact(data):
    n, x, ref = data
    planes = B.pretranspose_host_packed(x, PK.PACKED_ROWS_REPORT)
    assert planes.shape[1:] == (20, 8, 128)
    got = np.asarray(PK.flagstat_pallas_pre(
        jnp.asarray(planes), n=n, interpret=True, packed=True, report=True),
        dtype=np.int64)
    idx = list(F.REPORT_COUNTERS)
    np.testing.assert_array_equal(got[idx], ref[idx])


def test_native_packed_matches_numpy_fallback(data):
    """The AVX2 packed store and the NumPy row-slice fallback must be
    byte-identical (the fallback defines the layout contract)."""
    from libflagstats_tpu.io import native_lib

    if native_lib.load() is None:
        pytest.skip("native lib unavailable")
    _, x, _ = data
    pad = np.concatenate(
        [x, np.zeros((-x.size) % (32 * 16 * 128), np.uint16)])
    full = B.pretranspose_host_np(pad)
    for rows in (PK.PACKED_ROWS_FULL, PK.PACKED_ROWS_REPORT):
        native = B.pretranspose_host_packed(x, rows)
        np.testing.assert_array_equal(native, full[:, list(rows)])


def test_packed_shape_validation(data):
    _, x, _ = data
    full_planes = B.pretranspose_host(x)    # 32-row tiles
    with pytest.raises(ValueError, match="plane tiles"):
        PK.stream_sums_pallas_pre(jnp.asarray(full_planes), packed=True)
    packed = B.pretranspose_host_packed(x, PK.PACKED_ROWS_FULL)
    with pytest.raises(ValueError, match="plane tiles"):
        PK.stream_sums_pallas_pre(jnp.asarray(packed), packed=False)


def test_packed_rejected_for_raw_mode(data):
    _, x, _ = data
    with pytest.raises(ValueError, match="packed_rows unsupported"):
        PK._run_kernel(jnp.zeros((8, 24, 8, 128), jnp.uint32), 8,
                       "flagstat_raw", True, pre=True,
                       packed_rows=PK.PACKED_ROWS_FULL)


def test_native_packed_bad_rows():
    from libflagstats_tpu.io import native_lib

    lib = native_lib.load()
    if lib is None:
        pytest.skip("native lib unavailable")
    import ctypes

    x = np.zeros(32 * 16 * 128, dtype=np.uint16)
    out = np.empty((1, 2, 8, 128), dtype=np.uint32)
    bad = np.asarray([3, 3], dtype=np.int32)       # duplicate row
    rc = lib.lfs_bit_transpose_packed(
        x.ctypes.data_as(ctypes.c_void_p), x.size,
        out.ctypes.data_as(ctypes.c_void_p),
        bad.ctypes.data_as(ctypes.c_void_p), 2, 1)
    assert rc == -2
    bad2 = np.asarray([40], dtype=np.int32)        # out of range
    rc = lib.lfs_bit_transpose_packed(
        x.ctypes.data_as(ctypes.c_void_p), x.size,
        out.ctypes.data_as(ctypes.c_void_p),
        bad2.ctypes.data_as(ctypes.c_void_p), 1, 1)
    assert rc == -2
