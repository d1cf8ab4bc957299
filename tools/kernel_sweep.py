#!/usr/bin/env python3
"""Kernel micro-parameter sweep on real hardware.

Times the bit-sliced kernel across tuning knobs (nblk = grid-step depth)
and both stream modes, dispatch-latency-free. Used to pick defaults;
results land in docs/BENCHMARKS.md.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from libflagstats_tpu.config import enable_compilation_cache

    enable_compilation_cache()
    from libflagstats_tpu.bench.harness import (
        defended_roofline,
        gated_kernel_time_fit,
    )
    from libflagstats_tpu.bench.refcache import oracle_counters
    from libflagstats_tpu.oracle import generate_flags
    from libflagstats_tpu.ops import pallas_kernels as PK
    from libflagstats_tpu.ops.xla_ops import assemble_counters

    n = 64 * 1024 * 1024
    x_host = generate_flags(n, seed=0, full_range=True)
    x = jnp.asarray(x_host)
    # disk-cached (20-150 s of host time per run otherwise)
    ref = oracle_counters(x_host, n, seed=0, full_range=True)

    roof = defended_roofline(2 * n)
    if roof != roof:  # NaN: no sample passed the gates — None disables
        roof = None   # the throughput gate EXPLICITLY (NaN comparisons
        #               are silently False, which would accept artifacts)
    print("roofline (agreed): "
          + (f"{roof/1e9:.1f} GB/s" if roof else "n/a — no gate-passing "
             "sample; reject-above-roofline gate disabled"), flush=True)

    def timed(body, arg=None, n_bytes=None):
        """Defended sample: retry until the gates accept (see bench.py).
        ``n_bytes`` = the kernel's OWN HBM traffic (packed tiles read
        1.5 B/word; gating them against a 2 B/word read would reject
        every honest sample as above-roofline)."""
        return gated_kernel_time_fit(body, x if arg is None else arg,
                                     roof_bytes_per_s=roof,
                                     n_bytes=n_bytes or 2 * n).slope_s

    from libflagstats_tpu import flags as FL

    ok_all = True
    for report in (True, False):
        for nblk in (8, 16, 32):
            def body(a, nblk=nblk, report=report):
                t, f = PK.stream_sums_pallas(a, nblk=nblk, report=report)
                return jnp.concatenate([t, f])

            # correctness first; report mode validates exactly the
            # counter set CLAUDE.md prescribes (flags.REPORT_COUNTERS),
            # not a hand-expanded copy that could drift
            t_, f_ = PK.stream_sums_pallas(x, nblk=nblk, report=report)
            got = np.asarray(
                assemble_counters(t_, f_, jnp.int32(n)), dtype=np.int64
            )
            idx = list(FL.REPORT_COUNTERS) if report else list(range(32))
            ok = (got[idx] == ref[idx]).all()
            ok_all &= bool(ok)
            t = timed(body)
            gbs = 2.0 * n / t / 1e9
            vs = f"{gbs*1e9/roof:.3f}x roofline" if roof else "n/a roofline"
            print(f"mode={'report' if report else 'full'} nblk={nblk}: "
                  f"{t*1e3:.3f} ms, {gbs:.1f} GB/s, {vs}, "
                  f"{'OK' if ok else 'MISMATCH'}", flush=True)
    # round 4: the pre-transposed production tier across the same knobs
    # (same total bytes on HBM; kernel sheds the in-VMEM transpose)
    from libflagstats_tpu.ops.bitslice import pretranspose_host

    planes = jnp.asarray(pretranspose_host(x_host))
    for report in (True, False):
        for nblk in (8, 16, 32):
            def body(p, nblk=nblk, report=report):
                t, f = PK.stream_sums_pallas_pre(p, nblk=nblk,
                                                 report=report)
                return jnp.concatenate([t, f])

            t_, f_ = PK.stream_sums_pallas_pre(planes, nblk=nblk,
                                               report=report)
            got = np.asarray(
                assemble_counters(t_, f_, jnp.int32(n)), dtype=np.int64
            )
            idx = list(FL.REPORT_COUNTERS) if report else list(range(32))
            ok = (got[idx] == ref[idx]).all()
            ok_all &= bool(ok)
            t = timed(body, planes)
            gbs = 2.0 * n / t / 1e9
            vs = f"{gbs*1e9/roof:.3f}x roofline" if roof else "n/a roofline"
            print(f"mode=pre_{'report' if report else 'full'} nblk={nblk}: "
                  f"{t*1e3:.3f} ms, {gbs:.1f} GB/s, {vs}, "
                  f"{'OK' if ok else 'MISMATCH'}", flush=True)

    # round 5: the PACKED pre tier (the shipped layout — 24/20 rows,
    # 1.5/1.25 B/word of HBM); ratios are vs the roofline on the bytes
    # the kernel actually reads, and a words-equivalent rate is printed
    # so the layout win is visible next to the rows above
    from libflagstats_tpu.ops.bitslice import pretranspose_host_packed

    for report in (True, False):
        rows = PK.packed_rows_for(report)
        pplanes = jnp.asarray(pretranspose_host_packed(x_host, rows))
        pbytes = pplanes.size * 4
        for nblk in (8, 16, 32):
            def body(p, nblk=nblk, report=report):
                t, f = PK.stream_sums_pallas_pre(p, nblk=nblk,
                                                 report=report, packed=True)
                return jnp.concatenate([t, f])

            t_, f_ = PK.stream_sums_pallas_pre(pplanes, nblk=nblk,
                                               report=report, packed=True)
            got = np.asarray(
                assemble_counters(t_, f_, jnp.int32(n)), dtype=np.int64
            )
            idx = list(FL.REPORT_COUNTERS) if report else list(range(32))
            ok = (got[idx] == ref[idx]).all()
            ok_all &= bool(ok)
            t = timed(body, pplanes, n_bytes=pbytes)
            gbs = pbytes / t / 1e9
            vs = f"{gbs*1e9/roof:.3f}x roofline" if roof else "n/a roofline"
            print(f"mode=pre_packed_{'report' if report else 'full'} "
                  f"nblk={nblk}: {t*1e3:.3f} ms, {gbs:.1f} GB/s own-bytes "
                  f"({2.0*n/t/1e9:.0f} GB/s words-equiv), {vs}, "
                  f"{'OK' if ok else 'MISMATCH'}", flush=True)

    # a bit-exactness violation must fail the exit code, not just print
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
