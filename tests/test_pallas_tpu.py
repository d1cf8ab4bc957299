"""Real-hardware Pallas kernel tests (skipped unless RUN_TPU_TESTS=1).

The kernel's math is covered on CPU by test_bitsliced_jnp.py (identical
traced code); these validate the Pallas plumbing itself — grid
accumulation, VMEM scratch carry, sublane bitcast — on a TPU."""
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

if not os.environ.get("RUN_TPU_TESTS"):
    pytest.skip("set RUN_TPU_TESTS=1 to run on TPU hardware",
                allow_module_level=True)
if jax.default_backend() != "tpu":
    pytest.skip("no TPU backend", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from libflagstats_tpu.oracle import flagstat_numpy, generate_flags  # noqa: E402
from libflagstats_tpu.ops.pallas_kernels import (  # noqa: E402
    GROUP_WORDS,
    flagstat_pallas,
    pospopcnt_u16_pallas,
)

from conftest import assert_counters_equal, pospopcnt_ref  # noqa: E402


@pytest.mark.parametrize("steps,extra", [(1, 0), (2, -12345), (3, 0), (4, -1)])
def test_flagstat_pallas_tpu(steps, extra):
    # negative extra: a tail that zero-pads up to the same grid shape.
    # steps 1-4 cover every parity of the second-level CSA state machine
    # (pending sixteens/32s planes live vs consumed at the final flush).
    n = steps * 8 * GROUP_WORDS + extra
    x = generate_flags(n, seed=n, full_range=True)
    got = np.asarray(flagstat_pallas(jnp.asarray(x), n=n), dtype=np.int64)
    assert_counters_equal(flagstat_numpy(x), got)


@pytest.mark.parametrize("steps", [1, 2, 3])
def test_flagstat_pallas_nblk16_tpu(steps):
    """nblk=16 variant, every nsteps parity (round-3 default schedule:
    per-body native-popcount peel, no second-level tree)."""
    n = steps * 16 * GROUP_WORDS - 99
    x = generate_flags(n, seed=n & 0xFFFF, full_range=True)
    got = np.asarray(flagstat_pallas(jnp.asarray(x), n=n, nblk=16),
                     dtype=np.int64)
    assert_counters_equal(flagstat_numpy(x), got)


@pytest.mark.parametrize("nblk,steps", [(8, 3), (16, 2), (32, 1)])
def test_flagstat_pallas_two_level_tpu(nblk, steps):
    """The opt-in two-level CSA schedules (cross-step pending planes at
    nblk=8/16, fully in-step at nblk=32) stay bit-exact — they are the
    fallback if a future kernel change re-raises the peel cost."""
    from libflagstats_tpu.ops.pallas_kernels import stream_sums_pallas
    from libflagstats_tpu.ops.xla_ops import assemble_counters

    n = steps * nblk * GROUP_WORDS - 777
    x = generate_flags(n, seed=nblk + steps, full_range=True)
    xp = np.concatenate([x, np.zeros((-n) % (nblk * GROUP_WORDS),
                                     np.uint16)])
    t, f = stream_sums_pallas(jnp.asarray(xp), nblk=nblk, two_level=True)
    got = np.asarray(assemble_counters(t, f, jnp.int32(n)), dtype=np.int64)
    assert_counters_equal(flagstat_numpy(x), got)


def test_stream_sums_scan_negative_result_tier_tpu():
    """The scan-based bit-sliced XLA formulation (the Pallas algorithm
    without Mosaic — kept as a benchmarked negative result, see its
    module comment) stays bit-exact on hardware."""
    from libflagstats_tpu.ops.pallas_kernels import flagstat_xla_scan

    n = 8 * GROUP_WORDS - 4321
    x = generate_flags(n, seed=11, full_range=True)
    xp = np.concatenate([x, np.zeros((-n) % (8 * GROUP_WORDS), np.uint16)])
    got = np.asarray(flagstat_xla_scan(jnp.asarray(xp), n=n), dtype=np.int64)
    assert_counters_equal(flagstat_numpy(x), got)


def test_pospopcnt_pallas_tpu():
    n = 8 * GROUP_WORDS
    x = generate_flags(n, seed=3, full_range=True)
    ref = pospopcnt_ref(x)
    got = np.asarray(pospopcnt_u16_pallas(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_sharded_pallas_composition():
    """shard_map + psum wrapping the Pallas kernel on a 1-device mesh:
    validates the production sharded path end-to-end on hardware."""
    from libflagstats_tpu.parallel.sharded import flagstat_sharded

    n = 8 * GROUP_WORDS
    x = generate_flags(n, seed=99, full_range=True)
    got = flagstat_sharded(x, impl="pallas")
    assert_counters_equal(flagstat_numpy(x), got)


def test_every_flagstat_impl_string_via_dispatch():
    """Every registry string drives the public entry on hardware
    (round-1 verdict item 7; tools/stress.py soaks the same surface at
    randomized sizes). Uses a PALLAS_MIN-bucket size so the executables
    are shared with the soak/sweep cache."""
    from libflagstats_tpu import flags as F
    from libflagstats_tpu.ops.dispatch import FLAGSTAT_IMPLS, flagstats_u16

    n = 1_000_000  # bucket-pads to PALLAS_MIN (1Mi)
    x = generate_flags(n, seed=7, full_range=True)
    ref = flagstat_numpy(x).astype(np.int64)
    for impl in FLAGSTAT_IMPLS:
        got = np.asarray(flagstats_u16(x, impl=impl), dtype=np.int64)
        idx = (list(F.REPORT_COUNTERS) if impl == "pallas_report"
               else list(range(32)))
        assert (got[idx] == ref[idx]).all(), impl


def test_pretransposed_kernel_tpu():
    """Pre-mode kernel (no in-VMEM transpose) over host-AVX2-transposed
    plane tiles — bit-exact vs the oracle."""
    from libflagstats_tpu.ops.bitslice import pretranspose_host
    from libflagstats_tpu.ops.pallas_kernels import flagstat_pallas_pre

    n = 8 * GROUP_WORDS - 555
    x = generate_flags(n, seed=50, full_range=True)
    planes = pretranspose_host(x)
    got = np.asarray(flagstat_pallas_pre(jnp.asarray(planes), n=n), dtype=np.int64)
    assert_counters_equal(flagstat_numpy(x), got)


def test_read_xor_pallas_tpu():
    """Streaming-read roofline kernel on hardware: pairing-invariant
    xor digest over 2 grid steps."""
    from libflagstats_tpu.ops.pallas_kernels import read_xor_pallas

    n = 16 * GROUP_WORDS
    rng = np.random.default_rng(11)
    x = rng.integers(0, 1 << 16, size=n, dtype=np.uint16)
    got = int(np.asarray(read_xor_pallas(jnp.asarray(x)))[0])
    folded = (got & 0xFFFF) ^ (got >> 16)
    assert folded == int(np.bitwise_xor.reduce(x))


def test_stream_pallas_pre_tpu(tmp_path):
    """The shipped device tier end-to-end on hardware (round 4): framed
    stream -> decode pool -> host transpose stage -> transpose-free
    kernel accumulate; bit-exact vs the oracle incl. a padded tail."""
    from libflagstats_tpu.io import codec as C
    from libflagstats_tpu.io.stream import flagstat_stream

    n = 2 * 8 * GROUP_WORDS + 12_345    # two chunks + tail
    x = generate_flags(n, seed=51, full_range=True)
    path = tmp_path / "pre_tpu.lz4"
    C.write_framed(path, x, codec="lz4", level=1)
    got = flagstat_stream(path, codec="lz4", impl="pallas_pre")
    assert_counters_equal(flagstat_numpy(x), got)


def test_packed_pre_kernel_tpu():
    """Round-5 PACKED plane tiles (24 full / 20 report rows — 25%/37.5%
    less HBM) on real hardware: both modes bit-exact vs the oracle,
    incl. a padded tail."""
    from libflagstats_tpu.ops.bitslice import pretranspose_host_packed
    from libflagstats_tpu.ops.pallas_kernels import (
        PACKED_ROWS_FULL,
        PACKED_ROWS_REPORT,
        flagstat_pallas_pre,
    )

    from libflagstats_tpu import flags as F

    n = 8 * GROUP_WORDS - 777
    x = generate_flags(n, seed=52, full_range=True)
    ref = flagstat_numpy(x).astype(np.int64)
    pf = pretranspose_host_packed(x, PACKED_ROWS_FULL)
    got = np.asarray(flagstat_pallas_pre(jnp.asarray(pf), n=n, packed=True),
                     dtype=np.int64)
    assert_counters_equal(ref, got)
    pr = pretranspose_host_packed(x, PACKED_ROWS_REPORT)
    got_r = np.asarray(
        flagstat_pallas_pre(jnp.asarray(pr), n=n, packed=True, report=True),
        dtype=np.int64)
    idx = list(F.REPORT_COUNTERS)
    np.testing.assert_array_equal(got_r[idx], ref[idx])
