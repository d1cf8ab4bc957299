"""Multi-host API degenerate-path and scaling-sweep tests (virtual mesh)."""
import jax
import numpy as np
import pytest

from libflagstats_tpu.oracle import flagstat_numpy, generate_flags
from libflagstats_tpu.parallel.multihost import flagstat_multihost, scaling_sweep

from conftest import assert_counters_equal


def test_multihost_single_process():
    x = generate_flags(200_000, seed=31, full_range=True)
    got = flagstat_multihost(x, impl="xla")
    assert_counters_equal(flagstat_numpy(x), got)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_scaling_sweep_shape():
    res = scaling_sweep(n_words=1 << 18, impl="xla",
                        device_counts=[1, 2, len(jax.devices())], iters=1)
    assert [r["devices"] for r in res] == [1, 2, len(jax.devices())]
    for r in res:
        assert r["words_per_s"] > 0
        assert 0 < r["scaling_efficiency"]


def test_multihost_file_single_process(tmp_path):
    from libflagstats_tpu.io import codec as C
    from libflagstats_tpu.parallel.multihost import flagstat_multihost_file

    x = generate_flags(1_200_000, seed=41, full_range=True)
    path = tmp_path / "mh.lz4"
    C.write_framed(path, x, codec="lz4", level=1)
    got = flagstat_multihost_file(path, codec="lz4", impl="xla")
    assert_counters_equal(flagstat_numpy(x), got)
