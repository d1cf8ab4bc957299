#!/usr/bin/env python3
"""Measured stage decomposition of the in-VMEM-transpose flagstat kernel
(round 5, VERDICT r04 #2: replace the paper op-count audit with a
measurement).

The full kernel overlaps compute with the grid DMA, so a single stage's
cost hides under the read wall (the r04 finding: the pre-mode kernel is
indistinguishable from a bare read). Two measurement regimes:

1. SHADOW CHECK (repeat=1): read / transpose-only / count-only /
   transform-only / pre / full, all over the same 128 MiB. Any stage
   subset measuring at the read wall is DMA-bound; only subsets whose
   compute exceeds the DMA time show an overhang.

2. COMPUTE EXTRACTION (repeat-chained probes): each probe re-runs its
   stage r times per grid step with chained data dependences (no rep is
   CSE-foldable — ops/pallas_kernels.py probe docstrings). With r1, r2
   both compute-bound, (T(r2) - T(r1)) / (r2 - r1) is the stage's pure
   ALU time per pass, DMA overlap cancelled — the same differencing
   discipline the dispatch-free timing harness uses for the tunnel RTT.

Compare each stage's extracted ALU time against the op-count model
(docs/BENCHMARKS.md: transpose 5.25 / transform 0.94 / CSA+peel 5.45
lane-ops per word): consistent implied lane-op rates across stages
confirm the model (the ALU floor becomes a measurement); an outlier
stage is the gap to hunt. Reference discipline: memcpy speed-of-light
bracketing, /root/reference/linux/instrumented_benchmark.cpp:456-544.

Run on TPU. First run compiles ~30 probe executables remotely (use
run-in-background; warm runs take ~2-4 min). Results recorded in
docs/BENCHMARKS.md.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_WORDS = 64 * 1024 * 1024
#: op-count model (int32 VPU lane-ops per 16-bit word), the full 4-stage
#: column of the docs/BENCHMARKS.md audit table
MODEL_OPS = {"transpose": 5.25, "transform": 0.94, "count": 5.45}
#: starting repeat per stage for the adaptive compute extraction (the
#: per-op rates differ wildly between stages — the CSA probe carries
#: ~475 KB of live accumulator state whose VMEM spills dominate its
#: per-rep cost, while the pure-bitwise stages pipeline much faster —
#: so the r1 that clears the DMA shadow is found by doubling, not
#: assumed; first run found transform@16 still fully shadowed)
R_START = {"transpose": 8, "count": 4, "transform": 16}
R_CAP = 64            # trace-size bound (compile time) for the doubling
R_CAP_COUNT = 8       # the count probe's int32 stream accumulators hold
#                       <= 2^31-1: at 64Mi words that caps repeat at 31
#                       (stream_sums_pallas_raw enforces it), so r2 =
#                       2*r1 must stay <= 16 — the stage emerges from
#                       the DMA shadow by r=4 anyway
EMERGE = 1.5          # T(r) must exceed this x read wall to count as
#                       compute-bound before differencing


def _fit(body, x, ks, roof=None, n_bytes=None):
    from libflagstats_tpu.bench.harness import gated_kernel_time_fit

    return gated_kernel_time_fit(body, x, roof_bytes_per_s=roof,
                                 n_bytes=n_bytes, ks=ks, iters=4, attempts=4)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from libflagstats_tpu.bench.harness import defended_roofline
    from libflagstats_tpu.config import enable_compilation_cache, nblk_for
    from libflagstats_tpu.ops import bitslice as B
    from libflagstats_tpu.ops import pallas_kernels as PK
    from libflagstats_tpu.ops.bitslice import pretranspose_host
    from libflagstats_tpu.oracle import generate_flags

    enable_compilation_cache()
    if jax.default_backend() != "tpu":
        print("stage_decomposition measures the TPU kernels; backend is "
              f"{jax.default_backend()}", file=sys.stderr)
        return 1

    n = N_WORDS
    n_bytes = 2 * n
    nblk = nblk_for(report=False)
    x_host = generate_flags(n, seed=0, full_range=True)
    x = jax.block_until_ready(jnp.asarray(x_host))
    planes = jax.block_until_ready(jnp.asarray(pretranspose_host(x_host)))
    ks_fast = (4, 64, 260)      # read-wall-speed kernels
    ks_slow = (4, 16, 48)       # repeat-chained (2-4x slower) kernels

    # correctness gates: every probe oracle-checked before any timing
    got = np.asarray(PK.stream_sums_pallas_raw(planes, nblk=nblk))
    x32 = x_host.astype(np.uint32)
    pos = np.array([int(np.count_nonzero((x32 >> k) & 1)) for k in range(16)])
    assert (got[:15] == pos[:15]).all(), "raw probe failed oracle gate"
    d1 = int(np.asarray(PK.transpose_xor_pallas(x))[0])
    fold = np.bitwise_xor.reduce(
        np.asarray(planes)[:, sorted(B.NEEDED_ROWS)], axis=(0, 1))
    assert d1 == np.bitwise_xor.reduce(fold.ravel()), \
        "transpose probe failed digest gate"
    print("# probes oracle-gated OK", file=sys.stderr)

    def body_read(a):
        return PK.read_xor_pallas(a).astype(jnp.int32)

    def body_full(a):
        t, f = PK.stream_sums_pallas(a, nblk=nblk)
        return jnp.concatenate([t, f])

    def body_pre(p):
        t, f = PK.stream_sums_pallas_pre(p, nblk=nblk)
        return jnp.concatenate([t, f])

    def probe_body(stage, r):
        if stage == "transpose":
            return (lambda a: PK.transpose_xor_pallas(
                a, repeat=r).astype(jnp.int32)), x
        if stage == "count":
            return (lambda p: PK.stream_sums_pallas_raw(
                p, nblk=nblk, repeat=r)), planes
        return (lambda p: PK.transform_xor_pallas_pre(
            p, repeat=r).astype(jnp.int32)), planes

    roof, roof_kind = defended_roofline(n_bytes, ks=ks_fast, with_kind=True)
    print(f"# defended roofline {roof/1e9:.1f} GB/s ({roof_kind})",
          file=sys.stderr)

    out = {"n_words": n, "nblk": nblk, "roofline_gbs": roof / 1e9,
           "roofline_kind": roof_kind, "model_ops": MODEL_OPS}

    # -- shadow check: every variant at repeat=1, same bytes ------------
    print("stage\tms\tGB/s\tvs_roof\tdisp\tgate")
    shadow = {}
    rows = [("read", body_read, x), ("full", body_full, x),
            ("pre", body_pre, planes)]
    for stage in ("transpose", "count", "transform"):
        b, inp = probe_body(stage, 1)
        rows.append((f"{stage}@1", b, inp))
    for name, body, inp in rows:
        fit = _fit(body, inp, ks_fast, roof=roof, n_bytes=n_bytes)
        t_ms = fit.slope_s * 1e3
        shadow[name] = {"ms": t_ms, "gbs": n_bytes / fit.slope_s / 1e9,
                        "dispersion": fit.dispersion,
                        "gate_passed": bool(fit.gate_passed)}
        print(f"{name}\t{t_ms:.4f}\t{n_bytes/fit.slope_s/1e9:.1f}\t"
              f"{n_bytes/fit.slope_s/roof:.3f}\t{fit.dispersion:.3f}\t"
              f"{fit.gate_passed}")
    out["shadow"] = shadow

    # -- compute extraction: repeat-chained differencing ----------------
    # adaptive: double r until T(r) clearly exceeds the read wall (both
    # differencing points must be compute-bound or the slope measures
    # DMA shadow, not ALU — first run caught transform@16 shadowed);
    # retry a pair whose slope comes out negative (congestion drift
    # between the two fits — observed live on the transpose pair).
    t_read_s = shadow["read"]["ms"] / 1e3
    print("stage\tr1\tr2\tT(r1)ms\tT(r2)ms\talu_ms/pass\t"
          "implied_Glaneops/s\tmodel_ops/word")
    compute = {}
    for stage in ("transpose", "count", "transform"):
        r1 = R_START[stage]
        r_cap = R_CAP_COUNT if stage == "count" else R_CAP
        f1 = None
        while True:
            b1, inp = probe_body(stage, r1)
            f1 = _fit(b1, inp, ks_slow)
            if f1.slope_s > EMERGE * t_read_s or r1 >= r_cap:
                break
            print(f"# {stage}@{r1} still DMA-shadowed "
                  f"({f1.slope_s*1e3:.4f} ms vs wall "
                  f"{t_read_s*1e3:.4f}); doubling r", file=sys.stderr)
            r1 *= 2
        r2 = min(2 * r1, 2 * r_cap)
        b2, inp = probe_body(stage, r2)
        alu_s = None
        for attempt in range(3):
            f2 = _fit(b2, inp, ks_slow)
            slope = (f2.slope_s - f1.slope_s) / (r2 - r1)
            if slope > 0 and f1.gate_passed and f2.gate_passed:
                alu_s = slope
                break
            print(f"# {stage} pair rejected (slope {slope*1e3:.5f} ms, "
                  f"gates {f1.gate_passed}/{f2.gate_passed}); refitting",
                  file=sys.stderr)
            b1, _ = probe_body(stage, r1)
            f1 = _fit(b1, inp, ks_slow)
        shadowed = f1.slope_s <= EMERGE * t_read_s
        ops = MODEL_OPS[stage]
        # lane-ops: ops/word are int32-lane ops covering 2 words each
        rate = (ops * n / 2 / alu_s) if alu_s else float("nan")
        compute[stage] = {
            "r": [r1, r2], "t_r1_ms": f1.slope_s * 1e3,
            "t_r2_ms": f2.slope_s * 1e3,
            "alu_ms": alu_s * 1e3 if alu_s else None,
            "implied_glaneops": rate / 1e9,
            "dispersion": max(f1.dispersion, f2.dispersion),
            "gates": [bool(f1.gate_passed), bool(f2.gate_passed)],
            "r1_still_shadowed": bool(shadowed),
        }
        alu_str = f"{alu_s*1e3:.4f}" if alu_s else "REJECTED"
        print(f"{stage}\t{r1}\t{r2}\t{f1.slope_s*1e3:.4f}\t"
              f"{f2.slope_s*1e3:.4f}\t{alu_str}\t{rate/1e9:.0f}\t{ops}")
    out["compute"] = compute

    c_total_ms = sum(c["alu_ms"] or 0.0 for c in compute.values())
    t_read = shadow["read"]["ms"]
    t_full = shadow["full"]["ms"]
    out["summary"] = {
        "alu_total_ms": c_total_ms,
        "t_read_ms": t_read,
        "t_full_ms": t_full,
        "full_overhang_ms": t_full - t_read,
        "full_predicted_ms": max(t_read, c_total_ms),
    }
    print(f"# ALU total {c_total_ms:.4f} ms vs read wall {t_read:.4f} ms "
          f"-> predicted full max(...)={max(t_read, c_total_ms):.4f} ms, "
          f"measured full {t_full:.4f} ms", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
