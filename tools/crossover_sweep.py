#!/usr/bin/env python3
"""Measure the dispatch size-tier crossovers on the current backend.

The reference encodes *measured* crossovers in its size-tiered
dispatchers (STORM_pospopcnt_u16, libalgebra.h:3519-3543;
FLAGSTATS_u16, libflagstats.h:2999-3021). This sweep produces the
equivalent measurements for this stack:

  * host: flagstat_numpy wall time per size;
  * device wall: one full dispatch (what a single flagstats_u16 call
    pays — on this environment that includes the ~40-70 ms tunnel RTT);
  * device kernel: dispatch-free in-jit repetition time (what a
    streaming/pipelined caller pays per chunk).

Prints a TSV plus suggested XLA_MIN / PALLAS_MIN values for both
decision regimes. Run on TPU (idle) — results are recorded in
docs/BENCHMARKS.md and encoded in ops/dispatch.py.

``--write`` additionally records the measured crossovers (with
provenance: date, backend, device kind, dispatch RTT) in
calibration.json, which ops/dispatch.py reads at import — the
deployment-portable path (VERDICT r04 #4; reference analogue:
runtime-probed cached dispatch, libflagstats.h:2977-3022). A
deployment move (e.g. tunnel -> co-located TPU) is then one sweep run,
not a source edit.

``--pospopcnt`` sweeps the pure positional-popcount tiers instead
(the STORM_pospopcnt_u16 analogue): host per-bit count vs fused-XLA
shift-mask-reduce vs bit-sliced Pallas. pospopcnt shares flagstat's
dispatch thresholds (ops/dispatch.auto_impl) — this mode exists to
verify that sharing is justified by measurement, not assumption.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time

import numpy as np


def _provenance(backend: str, rtt_ms: float | None) -> dict:
    import datetime

    import jax

    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = "unknown"
    prov = {
        "date": datetime.date.today().isoformat(),
        "backend": backend,
        "device_kind": kind,
        "tool": "crossover_sweep",
    }
    if rtt_ms is not None and rtt_ms == rtt_ms:
        prov["dispatch_rtt_ms"] = round(rtt_ms, 1)
    return prov


def _write_calibration(thresholds: dict, backend: str,
                       rtt_ms: float | None) -> None:
    from libflagstats_tpu.calibration import write_thresholds

    thresholds = {k: v for k, v in thresholds.items() if v is not None}
    if not thresholds:
        print("# --write: no crossover measured in this size range; "
              "calibration.json left untouched")
        return
    path = write_thresholds(thresholds, _provenance(backend, rtt_ms))
    print(f"# wrote {sorted(thresholds)} to {path} "
          "(ops/dispatch.py applies it at import)")


def _rtt_ms(rows, wall_col: int, kern_col: int) -> float:
    """Median wall-minus-kernel gap over the device-measured rows — the
    per-call dispatch round trip the single-call crossovers price in."""
    gaps = sorted((r[wall_col] - r[kern_col]) * 1e3 for r in rows
                  if r[wall_col] == r[wall_col] and r[kern_col] == r[kern_col])
    return gaps[len(gaps) // 2] if gaps else float("nan")


def pospopcnt_sweep(sizes, write: bool = False) -> int:
    import jax
    import jax.numpy as jnp

    from libflagstats_tpu.bench.harness import gated_kernel_time_fit, wall_time_min
    from libflagstats_tpu.config import enable_compilation_cache
    from libflagstats_tpu.ops import pallas_kernels as PK
    from libflagstats_tpu.ops.xla_ops import pospopcnt_u16_matmul, pospopcnt_u16_xla
    from libflagstats_tpu.oracle import generate_flags

    from libflagstats_tpu.ops import native_host

    enable_compilation_cache()
    backend = jax.default_backend()
    pallas_min_words = 8 * PK.GROUP_WORDS

    print(f"# backend={backend} mode=pospopcnt")
    print("words\tnumpy_ms\tnative_ms\txla_wall_ms\txla_kern_ms\t"
          "matmul_kern_ms\tpallas_wall_ms\tpallas_kern_ms")
    rows = []
    for n in sizes:
        x = generate_flags(n, seed=n & 0xFFFF, full_range=True)

        t_numpy = float("inf")
        for _ in range(2):
            # the astype belongs INSIDE the timed region: the real numpy
            # tier (dispatch.pospopcnt_u16) pays it on every call, and
            # excluding it biased the suggested device crossover upward
            t0 = time.perf_counter()
            x32 = x.astype(np.uint32)
            np.array([int(np.count_nonzero((x32 >> k) & 1))
                      for k in range(16)])
            t_numpy = min(t_numpy, time.perf_counter() - t0)

        t_native = float("nan")
        if native_host.available():
            t_native = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                native_host.pospopcnt_native(x)
                t_native = min(t_native, time.perf_counter() - t0)

        xj = jax.block_until_ready(jnp.asarray(x))
        ks = (2, 8, 24) if n >= (1 << 22) else (4, 32, 96)

        t_xla_wall = wall_time_min(jax.jit(pospopcnt_u16_xla), xj,
                                   iters=5, warmup=2)
        t_xla_kern = gated_kernel_time_fit(pospopcnt_u16_xla, xj,
                                           ks=ks, iters=3, attempts=3).slope_s
        t_mm_kern = gated_kernel_time_fit(pospopcnt_u16_matmul, xj,
                                          ks=ks, iters=3, attempts=3).slope_s

        t_p_wall = t_p_kern = float("nan")
        if backend == "tpu" and n >= pallas_min_words:
            p_body = PK.pospopcnt_u16_pallas
            t_p_wall = wall_time_min(jax.jit(p_body), xj, iters=5, warmup=2)
            t_p_kern = gated_kernel_time_fit(p_body, xj, ks=ks, iters=3,
                                           attempts=3).slope_s

        rows.append((n, t_numpy, t_native, t_xla_wall, t_xla_kern,
                     t_p_wall, t_p_kern))
        print(f"{n}\t{t_numpy*1e3:.3f}\t{t_native*1e3:.3f}\t"
              f"{t_xla_wall*1e3:.3f}\t"
              f"{t_xla_kern*1e3:.4f}\t{t_mm_kern*1e3:.4f}\t"
              f"{t_p_wall*1e3:.3f}\t{t_p_kern*1e3:.4f}")

    dev_min = next((r[0] for r in rows if min(r[3], r[5]) < r[1]), None)
    print(f"# suggested pospopcnt device_min (single-call wall): {dev_min}")
    nat_dev_min = next(
        (r[0] for r in rows if r[2] == r[2] and min(r[3], r[5]) < r[2]), None)
    print("# suggested pospopcnt NATIVE device_min (device wall beats "
          f"native host): {nat_dev_min}")
    print("# compare against flagstat sweep: dispatch shares one "
          "device_min for both entry points")
    if write:
        native_measured = any(r[2] == r[2] for r in rows)
        # None = no crossover in the swept range -> host wins everywhere
        # tested: write the disabled sentinel so stale entries from a
        # faster previous deployment cannot linger (same rule for every
        # threshold this sweep owns)
        if backend == "tpu":
            th = {"POSPOPCNT_DEVICE_MIN_TPU":
                  dev_min if dev_min is not None else 1 << 62}
            if native_measured:
                th["POSPOPCNT_NATIVE_DEVICE_MIN_TPU"] = (
                    nat_dev_min if nat_dev_min is not None else 1 << 62)
        else:
            th = {"POSPOPCNT_XLA_MIN_CPU":
                  dev_min if dev_min is not None else 1 << 62}
        _write_calibration(th, backend, _rtt_ms(rows, 3, 4))
    return 0


def main() -> int:
    import jax
    import jax.numpy as jnp

    from libflagstats_tpu.bench.harness import gated_kernel_time_fit, wall_time_min
    from libflagstats_tpu.config import enable_compilation_cache
    from libflagstats_tpu.ops import pallas_kernels as PK
    from libflagstats_tpu.ops.xla_ops import stream_sums_xla
    from libflagstats_tpu.oracle import flagstat_numpy, generate_flags

    enable_compilation_cache()
    backend = jax.default_backend()
    # 4x-stepped grid bounds the remote-compile count (each size is a
    # fresh executable per body per K); fine-grained refinement around a
    # crossover can be a follow-up run with an explicit list
    argv = [a for a in sys.argv[1:] if a not in ("--pospopcnt", "--write")]
    write = "--write" in sys.argv[1:]
    sizes = ([int(s) for s in argv] if argv
             else [1 << k for k in range(10, 27, 2)])  # 1Ki..64Mi, 4x steps
    if "--pospopcnt" in sys.argv[1:]:
        return pospopcnt_sweep(sizes, write=write)
    pallas_min_words = 8 * PK.GROUP_WORDS

    from libflagstats_tpu.ops import native_host

    print(f"# backend={backend}")
    print("words\tnumpy_ms\tnative_ms\txla_wall_ms\txla_kern_ms\t"
          "pallas_wall_ms\tpallas_kern_ms")
    rows = []
    for n in sizes:
        x = generate_flags(n, seed=n & 0xFFFF, full_range=True)

        t0 = time.perf_counter()
        flagstat_numpy(x)
        t_numpy = time.perf_counter() - t0
        t0 = time.perf_counter()
        flagstat_numpy(x)
        t_numpy = min(t_numpy, time.perf_counter() - t0)

        t_native = float("nan")
        if native_host.available():
            t_native = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                native_host.flagstat_native(x)
                t_native = min(t_native, time.perf_counter() - t0)

        xj = jax.block_until_ready(jnp.asarray(x))

        def xla_body(a):
            t, f = stream_sums_xla(a)
            return jnp.concatenate([t, f])

        jit_xla = jax.jit(xla_body)
        t_xla_wall = wall_time_min(jit_xla, xj, iters=5, warmup=2)
        t_xla_kern = gated_kernel_time_fit(
            xla_body, xj, ks=(2, 8, 24) if n >= (1 << 22) else (4, 32, 96),
            iters=3, attempts=3).slope_s

        t_p_wall = t_p_kern = float("nan")
        if backend == "tpu" and n >= pallas_min_words:
            def p_body(a):
                t, f = PK.stream_sums_pallas(a)
                return jnp.concatenate([t, f])

            jit_p = jax.jit(p_body)
            t_p_wall = wall_time_min(jit_p, xj, iters=5, warmup=2)
            t_p_kern = gated_kernel_time_fit(
                p_body, xj, ks=(2, 8, 24) if n >= (1 << 22) else (4, 32, 96),
                iters=3, attempts=3).slope_s

        rows.append((n, t_numpy, t_native, t_xla_wall, t_xla_kern,
                     t_p_wall, t_p_kern))
        print(f"{n}\t{t_numpy*1e3:.3f}\t{t_native*1e3:.3f}\t"
              f"{t_xla_wall*1e3:.3f}\t"
              f"{t_xla_kern*1e3:.4f}\t{t_p_wall*1e3:.3f}\t{t_p_kern*1e3:.4f}")

    def first_size(pred):
        for r in rows:
            if pred(r):
                return r[0]
        return None

    xla_min_wall = first_size(lambda r: r[3] < r[1])
    pallas_min_wall = first_size(
        lambda r: r[5] == r[5] and r[5] < min(r[1], r[3]))
    pallas_min_kern = first_size(
        lambda r: r[6] == r[6] and r[6] < r[4])
    native_dev_min = first_size(
        lambda r: r[2] == r[2] and min(r[3], r[5]) < r[2])
    print(f"# suggested XLA_MIN (single-call wall): {xla_min_wall}")
    print(f"# suggested PALLAS_MIN (single-call wall): {pallas_min_wall}")
    print(f"# suggested PALLAS_MIN (dispatch-free kernel): {pallas_min_kern}")
    print("# suggested NATIVE_DEVICE_MIN (device wall beats native host): "
          f"{native_dev_min}")
    if write:
        device_min = first_size(lambda r: min(r[3], r[5]) == min(r[3], r[5])
                                and min(r[3], r[5]) < r[1])
        native_measured = any(r[2] == r[2] for r in rows)
        if backend == "tpu":
            # None = no crossover in the swept range -> the host tier won
            # everywhere tested: record the disabled sentinel so a STALE
            # entry from a faster previous deployment cannot linger (the
            # same refresh rule as the NATIVE_* thresholds; a sentinel is
            # conservative — it routes to the measured-fastest tier)
            th = {"DEVICE_MIN_TPU": (device_min if device_min is not None
                                     else 1 << 62)}
            if native_measured:
                th["NATIVE_DEVICE_MIN_TPU"] = (
                    native_dev_min if native_dev_min is not None else 1 << 62)
        else:
            th = {"XLA_MIN_CPU": (xla_min_wall if xla_min_wall is not None
                                  else 1 << 62)}
        _write_calibration(th, backend, _rtt_ms(rows, 3, 4))
    return 0


if __name__ == "__main__":
    sys.exit(main())
