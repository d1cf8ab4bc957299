"""Report/dict mapping tests (reference: benchmark/flagstats.cpp:578-590,
python/libflagstats.pyx:24-36)."""
import numpy as np

import libflagstats_tpu as lfs
from libflagstats_tpu import flags as F
from libflagstats_tpu.oracle import flagstat_numpy, generate_flags
from libflagstats_tpu.report import counters_to_report


def test_report_consistency():
    x = generate_flags(50_000, seed=5)
    c = flagstat_numpy(x)
    rep = counters_to_report(c)
    # total = pass + fail reads
    assert rep.total[0] + rep.total[1] == len(x)
    # mapped = total - unmapped per stratum
    assert rep.mapped[0] == rep.total[0] - int(c[F.FUNMAP_OFF])
    assert rep.mapped[1] == rep.total[1] - int(c[F.FUNMAP_OFF + 16])
    # singletons + both-mapped <= paired in sequencing
    assert rep.singletons[0] + rep.both_mapped[0] <= rep.paired_in_sequencing[0]
    text = rep.text()
    assert "in total (QC-passed reads + QC-failed reads)" in text
    assert "properly paired" in text


def test_report_text_matches_samtools_na12878():
    """Exact report text — including percentage columns — against the
    published `samtools flagstat` output for NA12878 (reference
    README.md:179-191). samtools and the reference printer
    (benchmark/flagstats.cpp percent(n_pair_good, n_pair_all)) use
    paired-in-sequencing as the denominator for the properly-paired and
    singletons columns, and the stratum total for the mapped column."""
    c = np.zeros(32, dtype=np.uint64)
    c[F.FQCFAIL_OFF] = 824541892           # pass-total
    c[F.FUNMAP_OFF] = 824541892 - 805383403
    c[F.FSUPPLEMENTARY_OFF] = 5393628
    c[F.FPAIRED_OFF] = 819148264
    c[F.FREAD1_OFF] = 409574132
    c[F.FREAD2_OFF] = 409574132
    c[F.BIT12_OFF] = 781085884
    c[F.BIT13_OFF] = 2038885
    c[F.BIT14_OFF] = 797950890
    lines = counters_to_report(c).lines()
    assert lines[0] == "824541892 + 0 in total (QC-passed reads + QC-failed reads)"
    assert lines[1] == "0 + 0 secondary"
    assert lines[2] == "5393628 + 0 supplementary"
    assert lines[3] == "0 + 0 duplicates"
    assert lines[4] == "805383403 + 0 mapped (97.68% : N/A)"
    assert lines[5] == "819148264 + 0 paired in sequencing"
    assert lines[6] == "409574132 + 0 read1"
    assert lines[7] == "409574132 + 0 read2"
    assert lines[8] == "781085884 + 0 properly paired (95.35% : N/A)"
    assert lines[9] == "797950890 + 0 with itself and mate mapped"
    assert lines[10] == "2038885 + 0 singletons (0.25% : N/A)"


def test_binding_dict_shape():
    x = generate_flags(10_000, seed=2)
    d = lfs.flagstats(x, impl="numpy")
    assert d["n_values"] == len(x)
    assert set(d["passed"]) == set(F.SAM_FLAG_NAMES) | {"mapped", "paired_in_seq"}
    assert set(d["failed"]) == set(F.SAM_FLAG_NAMES)
    # derived fields per the reference binding
    assert d["passed"]["mapped"] == len(x) - d["passed"]["FUNMAP"] - d["failed"]["FUNMAP"]
    assert d["passed"]["paired_in_seq"] == d["passed"]["FREAD1"] + d["passed"]["FREAD2"]


def test_binding_validation():
    import pytest

    with pytest.raises(ValueError):
        lfs.flagstats([1, 2, 3])
    with pytest.raises(ValueError):
        lfs.flagstats(np.zeros(4, dtype=np.uint32))
    # non-1-D rejected like the reference's uint16_t[::1] memoryview —
    # accepting would mix len() (first axis) into n_values while the
    # counters cover .size words
    with pytest.raises(ValueError, match="1-D"):
        lfs.flagstats(np.zeros((4, 100), dtype=np.uint16))


def test_dispatch_input_validation():
    import pytest

    from libflagstats_tpu.ops.dispatch import flagstats_u16

    # lossless integer input is accepted
    c1 = flagstats_u16(np.array([73, 147], dtype=np.int64))
    c2 = flagstats_u16(np.array([73, 147], dtype=np.uint16))
    np.testing.assert_array_equal(c1, c2)
    # value-mangling casts are rejected
    with pytest.raises(ValueError):
        flagstats_u16(np.array([1.5, 2.5]))
    with pytest.raises(ValueError):
        flagstats_u16(np.array([70000], dtype=np.int64))
    with pytest.raises(ValueError):
        flagstats_u16(np.array([-1], dtype=np.int32))


def test_bucket_pad_shapes():
    from libflagstats_tpu.ops.dispatch import _bucket_pad

    a = np.zeros(5, dtype=np.uint16)
    assert _bucket_pad(a, 16).size == 16          # minimum wins
    a = np.zeros(1 << 20, dtype=np.uint16)
    assert _bucket_pad(a, 16).size == 1 << 20     # exact pow2 unchanged
    a = np.zeros((1 << 20) + 1, dtype=np.uint16)
    assert _bucket_pad(a, 16).size == 1 << 21     # rounds up
    assert _bucket_pad(np.zeros(0, dtype=np.uint16), 16).size == 16
