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


def test_dryrun_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(8, len(jax.devices())))
