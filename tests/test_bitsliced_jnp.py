"""Differential test of the full bit-sliced device algorithm (the jnp
twin of the Pallas kernel: identical traced math, no pallas_call)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libflagstats_tpu.oracle import flagstat_numpy, generate_flags
from libflagstats_tpu.ops.pallas_kernels import (
    GROUP_WORDS,
    flagstat_bitsliced_jnp,
    pospopcnt_bitsliced_jnp,
)

from conftest import assert_counters_equal, pospopcnt_ref


@pytest.fixture(scope="module")
def jitted():
    return (
        jax.jit(flagstat_bitsliced_jnp, static_argnames=("n", "nblk", "report")),
        jax.jit(pospopcnt_bitsliced_jnp, static_argnames=("nblk",)),
    )


def test_flagstat_bitsliced_one_step(jitted, full_range):
    fn, _ = jitted
    n = 8 * GROUP_WORDS  # exactly one Harley-Seal body / grid step
    x = generate_flags(n, seed=1, full_range=full_range)
    got = np.asarray(fn(jnp.asarray(x), n=n), dtype=np.int64)
    assert_counters_equal(flagstat_numpy(x).astype(np.int64), got)


def test_flagstat_bitsliced_with_tail(jitted):
    fn, _ = jitted
    # pads up to the same 8-group shape as the one-step test (shared
    # compile) while exercising zero-padding neutrality
    n = 8 * GROUP_WORDS - 12345
    x = generate_flags(n, seed=2, full_range=True)
    got = np.asarray(fn(jnp.asarray(x), n=n), dtype=np.int64)
    assert_counters_equal(flagstat_numpy(x).astype(np.int64), got)


def test_pospopcnt_bitsliced(jitted):
    _, fn = jitted
    n = 8 * GROUP_WORDS
    x = generate_flags(n, seed=3, full_range=True)
    ref = pospopcnt_ref(x)
    got = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_flagstat_bitsliced_report_mode(jitted):
    """Report mode (21 streams) is bit-exact on every reported counter
    and zero on the masked-positional ones (improved3/4 analogue)."""
    import libflagstats_tpu.flags as F

    fn, _ = jitted
    n = 8 * GROUP_WORDS - 333
    x = generate_flags(n, seed=8, full_range=True)
    got = np.asarray(fn(jnp.asarray(x), n=n, report=True), dtype=np.int64)
    ref = flagstat_numpy(x).astype(np.int64)
    idx = list(F.REPORT_COUNTERS)
    np.testing.assert_array_equal(got[idx], ref[idx])
    zeros = [1, 3, 4, 5, 17, 19, 20, 21]
    assert (got[zeros] == 0).all()


def test_adversarial_saturated_planes(jitted):
    """All-ones FLAG words saturate every CSA plane (maximal carries at
    every tree level) — the worst case for the staged-counter discipline
    (SURVEY.md §4 implication (f))."""
    fn, _ = jitted
    n = 8 * GROUP_WORDS
    x = np.full(n, 0x0FFF, dtype=np.uint16)
    got = np.asarray(fn(jnp.asarray(x), n=n), dtype=np.int64)
    assert_counters_equal(flagstat_numpy(x).astype(np.int64), got)
    # sanity: every word is QC-fail + secondary here
    assert got[16 + 8] == n and got[25] == n and got[9] == 0


def test_pretransposed_ingest(jitted):
    """Host bit transpose (native AVX2 or NumPy) + pre-mode counting is
    bit-exact; the native and NumPy transposes agree byte-for-byte."""
    from libflagstats_tpu.ops import pallas_kernels as PK
    from libflagstats_tpu.ops.bitslice import pretranspose_host, pretranspose_host_np
    from libflagstats_tpu.ops.xla_ops import assemble_counters

    n = 3 * GROUP_WORDS + 777
    x = generate_flags(n, seed=45, full_range=True)
    planes = pretranspose_host(x)
    np.testing.assert_array_equal(planes, pretranspose_host_np(x))

    g = planes.shape[0]
    pad = (-g) % 8
    if pad:
        planes = np.concatenate(
            [planes, np.zeros((pad, 32, 8, 128), np.uint32)]
        )
    sums = jax.jit(
        PK._stream_sums_jnp_body, static_argnames=("mode", "pre")
    )(jnp.asarray(planes), "flagstat", pre=True)
    total, fail = PK._sums_to_streams(sums, False)
    got = np.asarray(assemble_counters(total, fail, jnp.int32(n)), dtype=np.int64)
    assert_counters_equal(flagstat_numpy(x).astype(np.int64), got)


def test_words_kernel_chunk_loop(monkeypatch):
    """flagstat_pallas_words chunks calls at the packed-half accumulator
    capacity (_WORDS_MAX_STEPS); exercise the chunk-accumulate loop by
    shrinking the cap to 2 grid steps and counting 5 steps (chunks of
    2 + 2 + 1) through the real kernel in interpret mode (round-1
    verdict test hole: the >_WORDS_MAX_STEPS path was never executed)."""
    from libflagstats_tpu.ops import pallas_kernels as PK

    monkeypatch.setattr(PK, "_WORDS_MAX_STEPS", 2)
    n = 4 * PK.WORDS_STEP + 31   # pads to 5 steps, uneven tail
    x = generate_flags(n, seed=14, full_range=True)
    got = np.asarray(
        PK.flagstat_pallas_words(jnp.asarray(x), n=n, interpret=True),
        dtype=np.int64,
    )
    assert_counters_equal(flagstat_numpy(x), got)


def test_read_xor_pallas_digest():
    """The bench roofline's streaming-read kernel must actually read
    every word: its uint32 xor digest, folded low^high, equals the xor
    of all input words regardless of how the tiling pairs them."""
    from libflagstats_tpu.ops.pallas_kernels import read_xor_pallas

    n = 16 * GROUP_WORDS  # two grid steps: exercises the step-0 init
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 16, size=n, dtype=np.uint16)
    got = int(np.asarray(read_xor_pallas(jnp.asarray(x), interpret=True))[0])
    folded = (got & 0xFFFF) ^ (got >> 16)
    want = int(np.bitwise_xor.reduce(x))
    assert folded == want


def test_read_xor_pallas_empty():
    """0-step grid guard: an empty stream must yield digest 0, not an
    uninitialized output buffer."""
    from libflagstats_tpu.ops.pallas_kernels import read_xor_pallas

    got = np.asarray(read_xor_pallas(jnp.zeros(0, jnp.uint16), interpret=True))
    assert got.shape == (1,) and got[0] == 0


def test_empty_input_all_pallas_entries_interpret():
    """A 0-step Pallas grid never runs the step-0 init, so on hardware
    the output buffer would be uninitialized garbage (and interpret mode
    raised a slice error). Every kernel entry must short-circuit empty
    inputs to exact zeros (round-2 review)."""
    import jax.numpy as jnp

    from libflagstats_tpu.ops import pallas_kernels as PK

    empty = jnp.zeros(0, jnp.uint16)
    c = np.asarray(PK.flagstat_pallas(empty, interpret=True))
    assert c.shape == (32,) and (c == 0).all()
    t, f = PK.stream_sums_pallas(empty, interpret=True)
    assert (np.asarray(t) == 0).all() and (np.asarray(f) == 0).all()
    pp = np.asarray(PK.pospopcnt_u16_pallas(empty, interpret=True))
    assert pp.shape == (16,) and (pp == 0).all()
    planes = jnp.zeros((0, 32, 8, 128), jnp.uint32)
    cp = np.asarray(PK.flagstat_pallas_pre(planes, n=0, interpret=True))
    assert (cp == 0).all()
    t, f = PK.stream_sums_words(empty, interpret=True)
    assert (np.asarray(t) == 0).all() and (np.asarray(f) == 0).all()
