#!/usr/bin/env python3
"""Headline benchmark: flagstat throughput on one TPU chip vs HBM roofline.

Workload: 64M uniform-random 16-bit FLAG words (BASELINE.json config #2/#3),
bit-exact counters validated against the host oracle before timing (the
reference validates every benchmark iteration against FLAGSTAT_scalar,
linux/instrumented_benchmark.cpp:181-208). Kernel time is measured with
in-jit repetition to cancel this environment's remote-dispatch latency
(see libflagstats_tpu/bench/harness.py).

Prints ONE JSON line:
  {"metric": "flagstat_words_per_sec", "value": ..., "unit": "words/s",
   "vs_baseline": <fraction of measured HBM read roofline>}
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from libflagstats_tpu.bench.harness import kernel_time, roofline_bytes_per_s
from libflagstats_tpu.config import enable_compilation_cache
from libflagstats_tpu.oracle import flagstat_numpy, generate_flags

N_WORDS = 64 * 1024 * 1024


def main() -> int:
    enable_compilation_cache()
    backend = jax.default_backend()
    x_host = generate_flags(N_WORDS, seed=0, full_range=True)

    from libflagstats_tpu import flags as FL

    if backend == "tpu":
        from libflagstats_tpu.ops.pallas_kernels import (
            flagstat_pallas,
            stream_sums_pallas,
        )

        # headline: the 21-stream report-mode kernel — the exact
        # `samtools flagstat` workload (the reference's improved3/4
        # kernels make the same masked-positional trade)
        full = jax.jit(lambda a: flagstat_pallas(a, n=N_WORDS, report=True))
        full_parity = jax.jit(lambda a: flagstat_pallas(a, n=N_WORDS))
        check_idx = list(FL.REPORT_COUNTERS)

        def body(a):
            total, fail = stream_sums_pallas(a, report=True)
            return jnp.concatenate([total, fail])
    else:  # CPU fallback so the bench is runnable anywhere
        from libflagstats_tpu.ops.xla_ops import flagstat_xla, stream_sums_xla

        full = jax.jit(lambda a: flagstat_xla(a, n=N_WORDS))
        full_parity = None
        check_idx = list(range(32))

        def body(a):
            total, fail = stream_sums_xla(a)
            return jnp.concatenate([total, fail])

    x = jax.block_until_ready(jnp.asarray(x_host))

    # correctness gate: bit-exact vs host oracle
    ref = flagstat_numpy(x_host).astype(np.int64)
    got = np.asarray(full(x), dtype=np.int64)
    ok = (got[check_idx] == ref[check_idx]).all()
    if ok and full_parity is not None:
        got_full = np.asarray(full_parity(x), dtype=np.int64)
        ok = (got_full == ref).all()
    if not ok:
        print(json.dumps({"metric": "flagstat_words_per_sec", "value": 0.0,
                          "unit": "words/s", "vs_baseline": 0.0,
                          "error": "counter mismatch vs oracle"}))
        print(f"expected {ref}\ngot      {got}", file=sys.stderr)
        return 1

    t_kernel = kernel_time(body, x)
    roofs = roofline_bytes_per_s(2 * N_WORDS)
    roof = max(roofs.values()) if roofs else float("nan")
    words_per_s = N_WORDS / t_kernel
    bytes_per_s = 2.0 * N_WORDS / t_kernel

    print(json.dumps({
        "metric": "flagstat_words_per_sec",
        "value": round(words_per_s, 1),
        "unit": "words/s",
        "vs_baseline": round(bytes_per_s / roof, 4) if roof == roof else None,
    }))
    print(
        f"[bench] backend={backend} n={N_WORDS} kernel={t_kernel*1e3:.3f}ms "
        f"-> {bytes_per_s/1e9:.1f} GB/s; roofline candidates: "
        + ", ".join(f"{k}={v/1e9:.1f}GB/s" for k, v in roofs.items()),
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
