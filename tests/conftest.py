"""Test harness config.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(mesh + psum) are exercised without TPU hardware; set RUN_TPU_TESTS=1 to
run against the real backend instead.

Note: this environment's sitecustomize force-registers the axon TPU
plugin and overrides jax_platforms, so we override it back *before* any
backend initializes (jax.config.update works post-registration).
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

if not os.environ.get("RUN_TPU_TESTS"):
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
    if m is None:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    elif m.group(1) != "8":
        # a foreign count left in the shell (e.g. =1 from debugging)
        # would silently stop the mesh/psum tests exercising 8 devices
        os.environ["XLA_FLAGS"] = flags.replace(
            m.group(0), "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the bit-sliced twin takes minutes to compile
# cold; cached it is instant on re-runs
from libflagstats_tpu.config import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from libflagstats_tpu.oracle import generate_flags  # noqa: E402


@pytest.fixture(params=[False, True], ids=["flags<4096", "full16bit"])
def full_range(request):
    return request.param


@pytest.fixture
def make_flags():
    def _make(n, seed=0, full_range=False):
        return generate_flags(n, seed=seed, full_range=full_range)

    return _make


def pospopcnt_ref(x) -> np.ndarray:
    """Shared positional-popcount reference (was copy-pasted in six test
    files — one definition so a width/dtype fix lands everywhere)."""
    x32 = np.asarray(x).astype(np.uint32)
    return np.array(
        [int(np.count_nonzero((x32 >> k) & 1)) for k in range(16)],
        dtype=np.int64,
    )


def assert_counters_equal(expected, actual, counters=None, msg=""):
    expected = np.asarray(expected).astype(np.int64)
    actual = np.asarray(actual).astype(np.int64)
    if counters is not None:
        expected = expected[list(counters)]
        actual = actual[list(counters)]
    np.testing.assert_array_equal(actual, expected, err_msg=msg)
