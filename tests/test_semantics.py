"""First-principles semantic tests: every reported counter recomputed
directly from FLAG-bit boolean expressions (independent of any transform
code path), diffed against the oracle. This is the defense against a
shared bug in the transform formulations."""
import numpy as np

from libflagstats_tpu import flags as F
from libflagstats_tpu.oracle import flagstat_numpy, generate_flags


def _bits(x):
    b = {}
    for name, off in [
        ("pair", F.FPAIRED_OFF), ("proper", F.FPROPER_PAIR_OFF),
        ("unmap", F.FUNMAP_OFF), ("munmap", F.FMUNMAP_OFF),
        ("read1", F.FREAD1_OFF), ("read2", F.FREAD2_OFF),
        ("sec", F.FSECONDARY_OFF), ("qc", F.FQCFAIL_OFF),
        ("dup", F.FDUP_OFF), ("sup", F.FSUPPLEMENTARY_OFF),
    ]:
        b[name] = ((x >> off) & 1).astype(bool)
    return b


def test_counters_from_first_principles():
    x = generate_flags(200_000, seed=77, full_range=True)
    c = flagstat_numpy(x).astype(np.int64)
    b = _bits(x.astype(np.uint32))

    inpair = b["pair"] & ~b["sec"] & ~b["sup"]
    mapped = ~b["unmap"]
    for stratum, mask in ((0, ~b["qc"]), (16, b["qc"])):
        def n(cond):
            return int(np.count_nonzero(cond & mask))

        assert c[stratum + F.FSECONDARY_OFF] == n(b["sec"])
        assert c[stratum + F.FSUPPLEMENTARY_OFF] == n(b["sup"] & ~b["sec"])
        assert c[stratum + F.FUNMAP_OFF] == n(b["unmap"])
        assert c[stratum + F.FDUP_OFF] == n(b["dup"])
        assert c[stratum + F.FPAIRED_OFF] == n(inpair)
        assert c[stratum + F.FREAD1_OFF] == n(inpair & b["read1"])
        assert c[stratum + F.FREAD2_OFF] == n(inpair & b["read2"])
        assert c[stratum + F.BIT12_OFF] == n(inpair & b["proper"] & mapped)
        assert c[stratum + F.BIT13_OFF] == n(inpair & b["munmap"] & mapped)
        assert c[stratum + F.BIT14_OFF] == n(inpair & ~b["munmap"] & mapped)
    # totals
    assert c[F.FQCFAIL_OFF] == int(np.count_nonzero(~b["qc"]))
    assert c[16 + F.FQCFAIL_OFF] == int(np.count_nonzero(b["qc"]))


def test_block_structure_mix():
    """Accumulation over a randomly-sized block partition equals the
    whole-array count (any split, any order of block sizes)."""
    rng = np.random.default_rng(5)
    x = generate_flags(250_000, seed=6, full_range=True)
    whole = flagstat_numpy(x)
    cuts = np.sort(rng.choice(np.arange(1, x.size), size=17, replace=False))
    acc = np.zeros(F.N_COUNTERS, np.uint64)
    for part in np.split(x, cuts):
        flagstat_numpy(part, out=acc)
    np.testing.assert_array_equal(acc, whole)
