"""NA12878 conformance: the synthetic reconstruction must reproduce the
published flagstat report exactly (reference: README.md:177-196), and
our engine must match it bit-exactly (BASELINE.md exact-match targets)."""
import numpy as np

from libflagstats_tpu import flags as F
from libflagstats_tpu.datasets import (
    NA12878_PUBLISHED,
    na12878_report_values,
    synth_na12878,
)
from libflagstats_tpu.oracle import flagstat_numpy
from libflagstats_tpu.report import counters_to_report


def test_full_scale_construction_matches_published():
    """At scale 1, the category construction reproduces every published
    line exactly (pure arithmetic; no array materialization)."""
    vals = na12878_report_values(scale_divisor=1)
    for key, expected in NA12878_PUBLISHED.items():
        assert vals[key] == expected, key


def test_engine_matches_synthetic_na12878():
    arr, _ = synth_na12878(scale_divisor=1000, seed=0)
    expected = na12878_report_values(scale_divisor=1000)
    counters = flagstat_numpy(arr)
    rep = counters_to_report(counters)

    assert rep.total == (expected["total"], 0)
    assert rep.secondary == (0, 0)
    assert rep.supplementary == (expected["supplementary"], 0)
    assert rep.duplicates == (0, 0)
    assert rep.mapped == (expected["mapped"], 0)
    assert rep.paired_in_sequencing == (expected["paired_in_sequencing"], 0)
    assert rep.read1 == (expected["read1"], 0)
    assert rep.read2 == (expected["read2"], 0)
    assert rep.properly_paired == (expected["properly_paired"], 0)
    assert rep.both_mapped == (expected["both_mapped"], 0)
    assert rep.singletons == (expected["singletons"], 0)


def test_synthetic_expected_counters_vs_oracle():
    """The construction-derived counter expectation agrees with the
    oracle on the deterministic counters."""
    arr, expected = synth_na12878(scale_divisor=5000, seed=1)
    got = flagstat_numpy(arr)
    deterministic = [k for k in range(32)
                     if k % 16 not in (F.FREVERSE_OFF, F.FMREVERSE_OFF)]
    np.testing.assert_array_equal(
        got.astype(np.int64)[deterministic],
        expected.astype(np.int64)[deterministic],
    )
