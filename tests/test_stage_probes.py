"""Stage-decomposition probe kernels (round 5, VERDICT r04 #2).

The probes exist to MEASURE the in-VMEM kernel's stage costs on
hardware (tools/stage_decomposition.py); these tests pin their
semantics in interpret mode so a probe can never drift from the real
kernel's stages and silently measure something else.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from libflagstats_tpu.ops import bitslice as B
from libflagstats_tpu.ops import pallas_kernels as PK
from libflagstats_tpu.oracle import generate_flags

from conftest import pospopcnt_ref


@pytest.fixture(scope="module")
def words():
    return generate_flags(8 * PK.GROUP_WORDS, seed=21, full_range=True)


def test_raw_streams_count_positional_popcounts(words):
    """Count-only probe: C-stream k and F-stream k both equal plane k's
    positional popcount — the exact flagstat CSA schedule with the
    transform deleted, so T(pre) - T(raw) isolates the transform."""
    planes = jnp.asarray(B.pretranspose_host(words))
    sums = np.asarray(PK.stream_sums_pallas_raw(planes, interpret=True))
    ref = pospopcnt_ref(words)
    np.testing.assert_array_equal(sums[:15], ref[:15])          # C streams
    f_expected = [ref[k] for k in B.F_STREAMS]
    np.testing.assert_array_equal(sums[15:29], f_expected)      # F streams
    assert (sums[29:] == 0).all()


def test_raw_streams_requires_pre():
    with pytest.raises(ValueError, match="pre=True"):
        PK._make_kernel(8, "flagstat_raw", pre=False)


def test_raw_streams_shape_and_empty():
    with pytest.raises(ValueError, match="plane tiles"):
        PK.stream_sums_pallas_raw(jnp.zeros((4, 2, 8, 128), jnp.uint32))
    out = PK.stream_sums_pallas_raw(
        jnp.zeros((0, 32, 8, 128), jnp.uint32), interpret=True)
    assert (np.asarray(out) == 0).all()


def test_transpose_probe_digest_matches_host(words):
    """Transpose-only probe: its xor digest equals the host-computed
    fold of the same NEEDED_ROWS planes, proving the pruned transpose
    inside the probe is the real kernel's (not dead code a compiler
    could have elided)."""
    got = np.asarray(PK.transpose_xor_pallas(jnp.asarray(words),
                                             interpret=True))
    planes = B.pretranspose_host(words)          # (G, 32, 8, 128) uint32
    fold = np.zeros((8, 128), dtype=np.uint32)
    for r in sorted(B.NEEDED_ROWS):
        fold ^= np.bitwise_xor.reduce(planes[:, r], axis=0)
    expected = np.bitwise_xor.reduce(fold.ravel())
    assert got.shape == (1,)
    assert got[0] == expected


def test_transpose_probe_empty():
    out = PK.transpose_xor_pallas(jnp.zeros(0, jnp.uint16), interpret=True)
    assert np.asarray(out)[0] == 0


def test_raw_streams_repeat_scales_counts(words):
    """repeat-chained count probe: counts scale exactly by repeat (the
    accumulators chain, so the schedule really ran twice)."""
    planes = jnp.asarray(B.pretranspose_host(words))
    s1 = np.asarray(PK.stream_sums_pallas_raw(planes, interpret=True))
    s2 = np.asarray(PK.stream_sums_pallas_raw(planes, interpret=True,
                                              repeat=2))
    np.testing.assert_array_equal(s2, 2 * s1)


def test_transpose_probe_repeat_chains(words):
    """repeat=2 transposes the transpose's output (chained): digest
    equals the host twin of the SAME chain — pruned network applied
    twice from the kernel's sublane-paired registers (the pruned rep-1
    passthrough rows feed rep 2, so the twin must chain the pruned
    network, not start from the full host transpose)."""
    got = np.asarray(PK.transpose_xor_pallas(jnp.asarray(words),
                                             interpret=True, repeat=2))
    t = words.reshape(-1, 32, 16, 128)
    regs = (t[:, :, 0::2, :].astype(np.uint32)
            | (t[:, :, 1::2, :].astype(np.uint32) << 16))
    fold = np.zeros((8, 128), dtype=np.uint32)
    for g in range(regs.shape[0]):
        A = [regs[g, k] for k in range(32)]
        for _rep in range(2):
            A = B.transpose32_np(A, prune=True)
        for r in sorted(B.NEEDED_ROWS):
            fold ^= A[r]
    assert got[0] == np.bitwise_xor.reduce(fold.ravel())


def test_transform_probe_digest_matches_host(words):
    """Transform-only probe: digest equals the host-computed fold of
    the 29 transformed stream planes (both halves, F AND included)."""
    import libflagstats_tpu.flags as F

    planes = B.pretranspose_host(words)
    got = np.asarray(PK.transform_xor_pallas_pre(jnp.asarray(planes),
                                                 interpret=True))
    fold = np.zeros((8, 128), dtype=np.uint32)
    for g in range(planes.shape[0]):
        rows = [planes[g, k] for k in range(32)]
        for half_of in (B.first_half_row, B.second_half_row):
            p = [rows[half_of(j)] for j in range(12)]
            t = B.transform_planes(p)
            q = t[F.FQCFAIL_OFF]
            for k in B.C_STREAMS:
                fold ^= t[k]
            for k in B.F_STREAMS:
                fold ^= t[k] & q
    assert got.shape == (1,)
    assert got[0] == np.bitwise_xor.reduce(fold.ravel())


def test_transform_probe_empty_and_shape():
    with pytest.raises(ValueError, match="plane tiles"):
        PK.transform_xor_pallas_pre(jnp.zeros((1, 32, 4, 128), jnp.uint32))
    out = PK.transform_xor_pallas_pre(
        jnp.zeros((0, 32, 8, 128), jnp.uint32), interpret=True)
    assert np.asarray(out)[0] == 0
