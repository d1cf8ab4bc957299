"""Differential tests of the host oracles (the reference test strategy:
inmemory.cpp diffs every variant against the scalar loop, SURVEY.md §4)."""
import numpy as np
import pytest

from libflagstats_tpu import flags as F
from libflagstats_tpu.oracle import (
    flagstat_loop,
    flagstat_numpy,
    generate_flags,
    transform_words,
)
from libflagstats_tpu.ops.bitslice import flagstat_bitsliced_np

from conftest import assert_counters_equal

# edge sizes around tile/dispatch thresholds plus non-multiples of widths
EDGE_SIZES = [0, 1, 2, 63, 64, 65, 255, 256, 511, 512, 1023, 1024, 4097]


@pytest.mark.parametrize("n", EDGE_SIZES)
def test_numpy_matches_loop(n, full_range):
    x = generate_flags(n, seed=n, full_range=full_range)
    assert_counters_equal(
        flagstat_loop(x), flagstat_numpy(x), counters=F.TESTED_COUNTERS
    )


@pytest.mark.parametrize("n", EDGE_SIZES)
def test_bitsliced_matches_numpy(n, full_range):
    x = generate_flags(n, seed=n + 1, full_range=full_range)
    assert_counters_equal(flagstat_numpy(x), flagstat_bitsliced_np(x))


def test_large_random(full_range):
    x = generate_flags(100_000, seed=7, full_range=full_range)
    assert_counters_equal(
        flagstat_loop(x), flagstat_numpy(x), counters=F.TESTED_COUNTERS
    )
    assert_counters_equal(flagstat_numpy(x), flagstat_bitsliced_np(x))


def test_accumulation_across_blocks():
    """Block streaming must accumulate into one counter vector
    (reference: benchmark/flagstats.cpp:304-329)."""
    x = generate_flags(10_000, seed=3)
    whole = flagstat_numpy(x)
    acc = np.zeros(F.N_COUNTERS, dtype=np.uint64)
    for block in np.array_split(x, 7):
        flagstat_numpy(block, out=acc)
    assert_counters_equal(whole, acc)


def test_every_single_word():
    """Exhaustive: every possible 12-bit FLAG word, one at a time
    (genuinely all 4096 — a stride would silently skip the exact bit
    combination a transform bug hides in)."""
    for val in range(4096):
        x = np.array([val], dtype=np.uint16)
        assert_counters_equal(
            flagstat_loop(x), flagstat_numpy(x), counters=F.TESTED_COUNTERS,
            msg=f"word {val:#06x}",
        )


def test_transform_truth_table():
    """The word transform against first-principles samtools semantics."""
    x = np.arange(4096, dtype=np.uint16)
    t = transform_words(x)
    for val in range(4096):
        sec = bool(val & F.FSECONDARY)
        sup = bool(val & F.FSUPPLEMENTARY)
        paired = bool(val & F.FPAIRED)
        unmap = bool(val & F.FUNMAP)
        munmap = bool(val & F.FMUNMAP)
        inpair = paired and not sec and not sup
        expected = val & F.KEEP_ALWAYS
        if inpair:
            expected |= val & F.PAIR_BRANCH_MASK
            if not unmap and (val & F.FPROPER_PAIR):
                expected |= F.BIT12
            if not unmap and munmap:
                expected |= F.BIT13
            if not unmap and not munmap:
                expected |= F.BIT14
        if sup and not sec:
            expected |= F.FSUPPLEMENTARY
        assert t[val] == expected, f"word {val:#06x}"


def test_scalar_semantics_no_derive():
    """derive_pass_total=False reproduces the reference scalar path
    (flags[9] untouched, reference: libflagstats.h:118-142)."""
    x = generate_flags(1000, seed=11)
    c = flagstat_loop(x, derive_pass_total=False)
    n_fail = int(c[F.FQCFAIL_OFF + 16])
    assert c[F.FQCFAIL_OFF] == 0
    c2 = flagstat_loop(x)
    assert int(c2[F.FQCFAIL_OFF]) == len(x) - n_fail


def test_flagstat_loop_count_paired_matches_kernel_semantics():
    """Counter 0 (paired in sequencing): the reference scalar leaves it
    0 (libflagstats.h:131 commented out) and flagstat_loop mirrors that
    by default; count_paired=True must fill it exactly like the vector
    kernels (FPAIRED outside sec/supp) so reports built from the loop
    print real paired counts and percentages."""
    x = generate_flags(50_000, seed=11, full_range=True)
    default = flagstat_loop(x)
    assert default[0] == 0 and default[16] == 0   # scalar-path fidelity
    withp = flagstat_loop(x, count_paired=True)
    ref = flagstat_numpy(x)
    assert withp[0] == ref[0] and withp[16] == ref[16]
    # everything else identical between the two loop modes
    others = [k for k in range(32) if k not in (0, 16)]
    assert (default[others] == withp[others]).all()
