#!/usr/bin/env python3
"""TPU-backend device-pipeline balance: does decode/H2D overlap compute?

Round-2 verdict next #5: the device streaming path claims decode
overlaps device compute, but the recorded SectionTimer breakdown was
CPU-backend. This tool measures the REAL backend three ways over the
same framed stream:

  overlapped  — the production pipeline (async dispatch; h2d timed
                apart from the step dispatch since round 3)
  serial      — identical pipeline but each chunk's result is fetched
                to host before the next chunk (no overlap possible):
                the no-overlap baseline the overlap claim is judged
                against
  native      — the host fused pipeline for scale

If overlapped ~= serial, the tunnel serializes H2D and the overlap is a
no-op HERE (a co-located TPU would differ); if overlapped << serial the
async pipeline genuinely hides decode+H2D behind compute. Either answer
goes in docs/BENCHMARKS.md with the timer table.

Usage: python tools/pipeline_balance.py [--n-words 103067736] [--level 1]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _run(path, impl, timer, serial=False):
    import libflagstats_tpu.io.stream as S

    orig = S._jit_chunk_sums
    if serial:
        def serial_cache(i, cw, report=False, nblk=8):
            fn = orig(i, cw, report, nblk)

            def wrapped(chunk, total, fail):
                t, f = fn(chunk, total, fail)
                np.asarray(t)   # force completion: forbid any overlap
                return t, f
            return wrapped
        S._jit_chunk_sums = serial_cache
    try:
        t0 = time.perf_counter()
        counters = S.flagstat_stream(path, codec="lz4", impl=impl,
                                     timer=timer)
        wall = time.perf_counter() - t0
    finally:
        S._jit_chunk_sums = orig
    return counters, wall


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-words", type=int, default=103_067_736,
                    help="1/8 of NA12878 by default (full scale is "
                    "tunnel-H2D-bound for tens of minutes)")
    ap.add_argument("--level", type=int, default=1)
    ap.add_argument("--skip-native", action="store_true")
    args = ap.parse_args()

    import jax

    from libflagstats_tpu.bench.profiling import SectionTimer
    from libflagstats_tpu.config import enable_compilation_cache
    from libflagstats_tpu.io import codec as C
    from libflagstats_tpu.oracle import flagstat_numpy, generate_flags

    enable_compilation_cache()
    backend = jax.default_backend()
    impl = "pallas" if backend == "tpu" else "xla"
    print(f"backend={backend} impl={impl} n_words={args.n_words}")

    import tempfile

    x = generate_flags(args.n_words, seed=0, full_range=True)
    ref = flagstat_numpy(x).astype(np.int64)
    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "balance.lz4"
        C.write_framed(path, x, codec="lz4", level=args.level)
        print(f"framed stream: {path.stat().st_size/1e6:.1f} MB")

        rows = {}
        legs = [("overlapped", impl, False), ("serial", impl, True)]
        if backend == "tpu":
            # round 4: the shipped device tier — host transpose stage +
            # transpose-free kernel; same bytes over the wire, so any
            # wall delta vs the plain legs is kernel/pipeline-side
            legs += [("overlapped_pre", "pallas_pre", False),
                     ("serial_pre", "pallas_pre", True)]
        if not args.skip_native:
            legs.append(("native", "native", False))
        for name, leg_impl, serial in legs:
            timer = SectionTimer()
            counters, wall = _run(path, leg_impl, timer, serial=serial)
            ok = (counters.astype(np.int64) == ref).all()
            rows[name] = wall
            print(f"\n== {name}: wall {wall:.2f}s "
                  f"({args.n_words/wall/1e6:.1f} Mwords/s) "
                  f"check={'ok' if ok else 'FAIL'}")
            print(timer.report())

        for ov_name, se_name in (("overlapped", "serial"),
                                 ("overlapped_pre", "serial_pre")):
            if ov_name in rows and se_name in rows:
                ov, se = rows[ov_name], rows[se_name]
                print(f"\noverlap benefit [{ov_name}]: serial {se:.2f}s / "
                      f"overlapped {ov:.2f}s = {se/ov:.2f}x "
                      f"({'real overlap' if se/ov > 1.15 else 'no-op: the '
                         'backend serializes the pipeline'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
