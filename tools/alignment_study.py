#!/usr/bin/env python3
"""Host buffer-alignment experiment for the native kernels.

The reference treats 64-byte-aligned vs unaligned allocations as a
measured question, shipping a dedicated -DALIGN build variant
(reference: Makefile:66-67, linux/instrumented_benchmark.cpp:23-28).
The native tier here uses unaligned loads (loadu) throughout, so the
expectation is ~no effect on modern x86 — but the reference measures it,
so this measures it: the same kernels over the same data placed at a
64B-aligned base vs deliberately offset bases (+2, +6, +62 bytes),
min-of-iters, fresh data per iteration.

Usage: python tools/alignment_study.py [--n 16777216] [--iters 9]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from libflagstats_tpu.ops import native_host
from libflagstats_tpu.oracle import generate_flags


def _place(words: np.ndarray, offset_bytes: int) -> np.ndarray:
    """A uint16 view of ``words`` whose data pointer sits at a 64B
    boundary plus ``offset_bytes`` (offset must be even: uint16 views
    need 2-byte alignment)."""
    assert offset_bytes % 2 == 0
    raw = np.zeros(2 * words.size + 128, dtype=np.uint8)
    base = raw.ctypes.data
    skew = (-base) % 64 + offset_bytes
    view = raw[skew:skew + 2 * words.size].view(np.uint16)
    assert view.ctypes.data % 64 == offset_bytes % 64
    view[:] = words
    return view


def run(n_words: int, iters: int, threads: int = 1) -> list[dict]:
    kernels = {
        "lfs_flagstat_u16": lambda a: native_host.flagstat_native(
            a, threads=threads),
        "lfs_pospopcnt_u16": lambda a: native_host.pospopcnt_native(
            a, threads=threads),
    }
    rows = []
    for name, fn in kernels.items():
        for off in (0, 2, 6, 62):
            best = float("inf")
            for it in range(iters + 1):   # first = warmup
                x = _place(generate_flags(n_words, seed=it,
                                          full_range=True), off)
                t0 = time.perf_counter()
                fn(x)
                dt = time.perf_counter() - t0
                if it:
                    best = min(best, dt)
            rows.append({"kernel": name, "offset_bytes": off,
                         "min_s": best,
                         "gwords_per_s": n_words / best / 1e9})
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 24)
    ap.add_argument("--iters", type=int, default=9)
    ap.add_argument("--threads", type=int, default=1)
    args = ap.parse_args()
    if not native_host.available():
        print("native host library unavailable")
        return 1
    rows = run(args.n, args.iters, args.threads)
    print("kernel\toffset_B\tmin_ms\tGwords/s\tvs_aligned")
    base = {}
    for r in rows:
        if r["offset_bytes"] == 0:
            base[r["kernel"]] = r["min_s"]
        rel = base[r["kernel"]] / r["min_s"]
        print(f"{r['kernel']}\t{r['offset_bytes']}\t"
              f"{r['min_s']*1e3:.3f}\t{r['gwords_per_s']:.3f}\t{rel:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
