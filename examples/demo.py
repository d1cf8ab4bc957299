#!/usr/bin/env python3
"""pyflagstats-style demo (reference: python/pyflagstats.ipynb).

Generates a random FLAG column, computes flagstat three ways (binding
dict, counter vector + report, streaming blocks), and prints them.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import libflagstats_tpu as lfs  # noqa: E402
from libflagstats_tpu import flags as F
from libflagstats_tpu.report import counters_to_report

# the notebook uses np.random.randint(0, 8192, 1e8); keep the demo fast
flags = np.random.randint(0, 8192, 1_000_000).astype(np.uint16)

# 1. binding-compatible dict
stats = lfs.flagstats(flags)
print("n_values:", stats["n_values"])
print("passed.mapped:", stats["passed"]["mapped"])

# 2. counter vector + samtools-style report
counters = lfs.flagstats_u16(flags)
print()
print(counters_to_report(counters).text())

# 3. streaming accumulation across blocks (one counter vector)
acc = np.zeros(F.N_COUNTERS, dtype=np.uint64)
for block in np.array_split(flags, 10):
    lfs.flagstats_u16(block, out=acc)
assert (acc == counters).all()
print("\nstreaming accumulation matches:", True)

# 4. raw positional popcount
print("pospopcnt:", lfs.pospopcnt_u16(flags))

# 5. container ingest: the same counters straight from .bam / .sam /
#    .sam.gz files (beyond the reference, which needs samtools +
#    `cut -f2` upstream) — one sniffing reader for every format
import tempfile  # noqa: E402

from libflagstats_tpu.io import bamio, read_flags_auto, samio  # noqa: E402

with tempfile.TemporaryDirectory() as td:
    bam = Path(td) / "demo.bam"
    sam = Path(td) / "demo.sam"
    bamio.write_bam(bam, flags)
    samio.write_sam(sam, flags)
    for path in (bam, sam):
        assert (read_flags_auto(path) == flags).all()
    assert (bamio.flagstat_bam(bam) == counters).all()
    assert (samio.flagstat_sam(sam) == counters).all()
    print("container ingest (.bam/.sam) matches:", True)
