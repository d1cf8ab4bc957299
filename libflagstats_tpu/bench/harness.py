"""Benchmark harness: dispatch-latency-free kernel timing + HBM roofline.

Methodology (reference counterpart: linux/instrumented_benchmark.cpp):
* report the minimum over iterations (":107-142");
* results validated against the scalar oracle by callers (":181-208");
* memory-bandwidth speed-of-light baseline — the reference uses memcpy
  (":456-544"); here the fastest of several trivially memory-bound device
  kernels over the same bytes, measured the same way.

This environment dispatches device work through a tunnel with ~tens of
milliseconds round-trip latency, so single-dispatch wall-clock timing
measures the tunnel, not the kernel. `kernel_time` therefore runs the
kernel K times *inside one jitted call* — each repetition data-chained
through `lax.optimization_barrier` so XLA cannot hoist the loop-invariant
computation — and differences two repetition counts to cancel the fixed
dispatch + loop overhead:

    t_kernel = (t[K_big] - t[K_small]) / (K_big - K_small)
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class BenchResult:
    name: str
    n_words: int
    iters: int
    min_s: float
    avg_s: float

    @property
    def words_per_s(self) -> float:
        return self.n_words / self.min_s

    @property
    def bytes_per_s(self) -> float:
        return 2.0 * self.n_words / self.min_s


def _repeated(body_fn, k: int):
    """jit((x, salt) -> sum of k data-chained body_fn(x) evaluations).

    ``salt`` is folded into the initial accumulator so every timed call
    has distinct arguments — the remote runtime has been observed to
    satisfy repeated identical executions from cache, which would
    otherwise fake sub-roofline times."""

    def run(x, salt):
        out_shape = jax.eval_shape(body_fn, x)
        init = jnp.zeros(out_shape.shape, out_shape.dtype) + salt.astype(
            out_shape.dtype
        )

        def body(_, c):
            xb = jax.lax.optimization_barrier((x, c))[0]
            return c + body_fn(xb)

        return jax.lax.fori_loop(0, k, body, init)

    return jax.jit(run)


def _sync(result):
    """Force completion. On this experimental remote backend,
    block_until_ready does NOT await execution — only a device->host
    read does — so completion is forced by materializing the (tiny)
    result on the host."""
    return np.asarray(jax.block_until_ready(result))


def _time_min(fn, x, iters: int) -> float:
    _sync(fn(x, jnp.int32(0)))  # compile + warmup
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        _sync(fn(x, jnp.int32(i + 1)))
        best = min(best, time.perf_counter() - t0)
    return best


def kernel_time(body_fn, x, k_small: int = 4, k_big: int = 260,
                iters: int = 5) -> float:
    """Per-invocation device time of body_fn(x), net of dispatch latency."""
    t_small = _time_min(_repeated(body_fn, k_small), x, iters)
    t_big = _time_min(_repeated(body_fn, k_big), x, iters)
    return max((t_big - t_small) / (k_big - k_small), 1e-9)


# ---------------------------------------------------------------------------
# Self-defending measurement (round-2): the round-1 driver capture was a
# caching artifact (physically impossible 7.5x-roofline throughput), so
# the headline path now (a) gives every timed call a FRESH input buffer
# (a jitted xor-mutation producing a new device allocation, so a runtime
# execution cache keyed on (executable, buffers) can never hit), (b) fits
# a line over >= 3 repetition counts instead of differencing two (slope =
# kernel time, intercept = dispatch), (c) uses the per-K median with a
# median-vs-min dispersion gate (a cache hit would poison a min), and
# (d) reports fit residuals so callers can reject non-linear samples.
# Callers additionally reject any slope faster than the same-process
# roofline and require cross-process reproduction (see bench.py).
# ---------------------------------------------------------------------------


#: acceptance-gate thresholds shared by every consumer (bench.py worker
#: loop, gated_kernel_time_fit, the kernel roster) — one definition so
#: the gates cannot drift between the headline and the roster
DISPERSION_MAX = 0.30     # reject fits whose median-vs-min spread exceeds this
ROOF_MARGIN = 1.05        # reject samples implying > margin x roofline reads


@dataclass
class FitResult:
    slope_s: float          # per-invocation kernel time (clamped > 0)
    intercept_s: float      # fixed dispatch + loop overhead per call
    points: list            # (k, median_s, min_s)
    rel_residual: float     # max |t - fit| / fit over the points
    dispersion: float       # max (median - min) / median over the points
    raw_slope_s: float | None = None  # unclamped LSQ slope — negative when
    #                                   caching makes time FALL with K
    gate_passed: bool | None = None   # set by gated_kernel_time_fit: did
    #                                   this sample pass every acceptance
    #                                   gate (None = gates never applied)

    @property
    def ok(self) -> bool:
        # gate on the RAW slope: slope_s is clamped to 1e-12 for safe
        # division, so testing it would let a negative-slope (cache-
        # poisoned) fit through as "ok" with an absurd implied throughput
        slope = self.slope_s if self.raw_slope_s is None else self.raw_slope_s
        return slope > 0 and self.rel_residual < 0.15


@jax.jit
def _xor_salt(a, s):
    return jax.lax.bitwise_xor(a, jnp.broadcast_to(s.astype(a.dtype), a.shape))


def _fresh_input(x, salt: int):
    """A new device buffer with contents x ^ salt (same dtype/shape;
    jit caches the mutation per shape/dtype automatically).

    Completion is forced with a tiny tail fetch, so the buffer exists
    before the timed region starts."""
    y = _xor_salt(x, jnp.uint32(salt & 0xFFFF))
    np.asarray(y.ravel()[-1])   # tiny sync fetch — awaits execution
    return y


def kernel_time_fit(body_fn, x, ks=(4, 64, 260), iters: int = 4,
                    fresh: bool = True, salt_base: int | None = None) -> FitResult:
    """Per-invocation device time via a linear fit of total time over
    repetition count, every timed call on a fresh salted input buffer."""
    if salt_base is None:
        salt_base = time.time_ns() & 0x3FFF
    points = []
    call = 0
    for k in ks:
        fn = _repeated(body_fn, k)
        xw = _fresh_input(x, salt_base) if fresh else x
        _sync(fn(xw, jnp.int32(0)))           # compile + warmup
        times = []
        for i in range(iters):
            call += 1
            salt = salt_base + 7919 * call
            xt = _fresh_input(x, salt) if fresh else x
            t0 = time.perf_counter()
            _sync(fn(xt, jnp.int32(salt)))
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2] if len(times) % 2 else (
            0.5 * (times[len(times) // 2 - 1] + times[len(times) // 2]))
        points.append((k, med, times[0]))

    karr = np.array([p[0] for p in points], dtype=np.float64)
    tarr = np.array([p[1] for p in points], dtype=np.float64)
    km, tm = karr.mean(), tarr.mean()
    var = float(((karr - km) ** 2).sum())
    slope = float(((karr - km) * (tarr - tm)).sum()) / var
    intercept = tm - slope * km
    fit = intercept + slope * karr
    rel_res = float(np.max(np.abs(tarr - fit) / np.maximum(fit, 1e-12)))
    disp = max((p[1] - p[2]) / p[1] if p[1] > 0 else 0.0 for p in points)
    return FitResult(slope_s=max(slope, 1e-12), intercept_s=intercept,
                     points=points, rel_residual=rel_res, dispersion=disp,
                     raw_slope_s=slope)


def gated_kernel_time_fit(body_fn, x, roof_bytes_per_s: float | None = None,
                          n_bytes: int | None = None, ks=(4, 64, 260),
                          iters: int = 4, attempts: int = 5) -> FitResult:
    """kernel_time_fit with the headline benchmark's acceptance gates:
    retry until the fit is ok, dispersion < 0.30, and — when a roofline
    and byte count are given — the implied read throughput does not
    exceed 1.05x the roofline (a kernel that must read the bytes cannot
    beat a bare read). Returns the accepted FitResult, or the last
    attempt when the gates were never satisfied (callers can inspect
    .ok / .dispersion to flag the row)."""
    fit = None
    for _ in range(attempts):
        fit = kernel_time_fit(body_fn, x, ks=ks, iters=iters,
                              salt_base=(time.time_ns() >> 10) & 0x3FFF)
        if not fit.ok or fit.dispersion >= DISPERSION_MAX:
            continue
        if (roof_bytes_per_s and n_bytes
                and n_bytes / fit.slope_s > roof_bytes_per_s * ROOF_MARGIN):
            continue
        fit.gate_passed = True
        return fit
    if fit is not None:
        fit.gate_passed = False
    return fit


def wall_time_min(fn, x, iters: int = 5, warmup: int = 2) -> float:
    """Min single-dispatch WALL time of fn(x) — includes the dispatch
    round trip (what a one-shot caller pays). Every call, warmups
    included, runs on a fresh salted buffer so the remote execution
    cache cannot serve repeats and fake the minimum."""
    base = time.time_ns() & 0x3FFF
    for i in range(warmup):
        _sync(fn(_fresh_input(x, base + 7919 * (i + 1))))
    best = float("inf")
    for i in range(iters):
        xt = _fresh_input(x, base + 104729 * (i + 1))
        t0 = time.perf_counter()
        _sync(fn(xt))
        best = min(best, time.perf_counter() - t0)
    return best


def measure_min(fn, args, iters: int = 7, warmup: int = 2, name: str = "") -> BenchResult:
    """Plain wall-clock timing (includes dispatch latency — use for
    end-to-end pipeline numbers, not kernel numbers)."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    n_words = int(np.prod(args[0].shape)) if hasattr(args[0], "shape") else 0
    return BenchResult(name=name, n_words=n_words, iters=iters,
                       min_s=min(times), avg_s=sum(times) / len(times))


#: HBM speed-of-light candidate kernels (pure read traffic), shared by
#: every roofline measurement path
ROOF_CANDIDATES = {
    "read_sum": lambda a: jnp.sum(a)[None],
    "read_xor": lambda a: jax.lax.reduce(
        a, jnp.int32(0), jax.lax.bitwise_xor, (0,))[None],
}


#: single-size cache of roofline input buffers, shared across candidates
#: and across the up-to-5 roofline_fit attempts one defended_roofline
#: makes — each rebuild is untimed but costs a 128 MiB device write plus
#: a tunnel round trip. Keyed by size and EVICTED on size change so a
#: crossover sweep over many sizes cannot accumulate buffers in HBM.
_ROOF_INPUTS: dict = {"n32": None}


def _roof_input(n32: int, layout: str, build):
    if _ROOF_INPUTS["n32"] != n32:
        _ROOF_INPUTS.clear()
        _ROOF_INPUTS["n32"] = n32
    if layout not in _ROOF_INPUTS:
        _ROOF_INPUTS[layout] = jax.block_until_ready(build())
    return _ROOF_INPUTS[layout]


def _roof_candidates(n32: int) -> dict:
    """name -> (make_input, body_fn) roofline candidates over 4*n32 bytes.

    ROOF_CANDIDATES (XLA reduces over int32) plus, on TPU at compatible
    sizes, the Pallas streaming-read kernel (hand-tiled grid DMA over the
    flagstat kernels' own uint16 tiling) — XLA's reduces have been
    measured streaming ~11% below it (697-736 vs ~786 GB/s in the same
    window), which understated the roofline enough to make honest kernel
    samples look >1.0x. Each candidate builds its own input in the
    layout it streams, OUTSIDE the timed region: feeding the uint16
    kernel from a bitcast int32 buffer was measured at 34.8 GB/s — the
    per-call 16-bit relayout copy, not the read."""

    def i32_input():
        return _roof_input(n32, "i32",
                           lambda: jnp.arange(n32, dtype=jnp.int32))

    cands = {name: (i32_input, fn) for name, fn in ROOF_CANDIDATES.items()}
    try:
        if jax.default_backend() == "tpu":
            from ..ops.pallas_kernels import GROUP_WORDS, read_xor_pallas

            if (2 * n32) % (8 * GROUP_WORDS) == 0 and n32 > 0:

                def u16_input():
                    return _roof_input(
                        n32, "u16",
                        lambda: jnp.arange(2 * n32, dtype=jnp.uint16))

                cands["read_xor_pallas"] = (
                    u16_input,
                    lambda a: read_xor_pallas(a).astype(jnp.int32),
                )
    except Exception as exc:
        # losing this candidate silently would revert the roofline to
        # the understated XLA reduces and resurrect >1.0x headlines
        import sys
        print(f"[roofline] read_xor_pallas candidate unavailable: {exc!r}",
              file=sys.stderr)
    return cands


def agreeing_pair(samples: list, pct: float, key=lambda s: s):
    """First (a, b) index pair whose key values agree within pct, else
    None — the shared cross-sample reproduction rule."""
    for a in range(len(samples)):
        for b in range(a + 1, len(samples)):
            va, vb = key(samples[a]), key(samples[b])
            if va + vb > 0 and 200.0 * abs(va - vb) / (va + vb) <= pct:
                return a, b
    return None


def roofline_bytes_per_s(n_bytes: int, iters: int = 5) -> dict[str, float]:
    """Measured HBM speed-of-light candidates over n_bytes of device data,
    timed with the same dispatch-free method as the kernels."""
    n32 = n_bytes // 4
    out = {}
    for name, (make_x, fn) in _roof_candidates(n32).items():
        try:
            t = kernel_time(fn, make_x(), iters=iters)
        except Exception:
            continue
        out[name] = n_bytes / t
    return out


def roofline_fit(n_bytes: int, ks=(4, 64, 260), iters: int = 4) -> dict:
    """HBM read speed-of-light, measured with the same defended multi-K
    fit + fresh-buffer method as the kernels (so kernel and roofline
    numbers share failure modes and the ratio stays meaningful)."""
    n32 = n_bytes // 4
    out = {}
    for name, (make_x, fn) in _roof_candidates(n32).items():
        try:
            r = kernel_time_fit(fn, make_x(), ks=ks, iters=iters)
        except Exception:
            continue
        out[name] = {"bytes_per_s": n_bytes / r.slope_s, "fit": r}
    return out


#: nominal HBM bandwidth per device kind (bytes/s) — the physical cap a
#: measured READ roofline cannot exceed; used to discard caching
#: artifacts that reproduce consistently enough to pass agreement
#: (observed: two 'agreeing' 1078 GB/s samples on an 819 GB/s part)
HBM_NOMINAL = {
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5": 1228e9,       # v5p
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,  # v6e / Trillium
}


def hbm_nominal_bytes_per_s() -> float | None:
    try:
        return HBM_NOMINAL.get(jax.devices()[0].device_kind)
    except Exception:
        return None


def defended_roofline(n_bytes: int, ks=(4, 64, 260),
                      attempts: int = 5, agree_pct: float = 5.0,
                      with_kind: bool = False):
    """Roofline with its own agreement protocol.

    A single roofline sample can itself be a caching artifact (observed:
    a 1112 GB/s 'read roofline' on an 819 GB/s-HBM part, which then
    disables the kernel-side reject-above-roofline gate). Collect
    fit-gated samples until two agree within ``agree_pct`` and return
    the mean of the agreeing pair; fall back to the MEDIAN of whatever
    was collected (never the max). Samples above the device's nominal
    HBM bandwidth (physically impossible for a read kernel) are
    discarded outright — artifacts have been observed to reproduce
    consistently enough to 'agree' with each other.

    With ``with_kind=True`` returns (bytes_per_s, kind) where kind names
    the winning candidate(s) — e.g. "read_xor_pallas" or
    "read_sum+read_xor_pallas" when the agreeing pair came from two
    different candidates."""
    spec = hbm_nominal_bytes_per_s()
    cap = spec * 1.02 if spec else None
    samples: list[tuple[float, str]] = []

    def done(value: float, names):
        kind = "+".join(sorted(set(names))) if names else "none"
        return (value, kind) if with_kind else value

    for _ in range(attempts):
        roofs = roofline_fit(n_bytes, ks=ks)
        good = [(v["bytes_per_s"], name) for name, v in roofs.items()
                if v["fit"].ok and v["fit"].dispersion < DISPERSION_MAX
                and (cap is None or v["bytes_per_s"] <= cap)]
        if not good:
            continue
        samples.append(max(good))
        pair = agreeing_pair(samples, agree_pct, key=lambda s: s[0])
        if pair is not None:
            a, b = samples[pair[0]], samples[pair[1]]
            return done(0.5 * (a[0] + b[0]), [a[1], b[1]])
    if not samples:
        return done(float("nan"), [])
    samples.sort(key=lambda s: s[0])
    # LOWER median: with an even count (e.g. exactly 2 disagreeing
    # samples) the upper median IS the max, and an inflated roofline
    # relaxes the caller's reject-above-roofline gate — prefer the
    # conservative side, matching bench.assemble_final's degraded pick
    med = samples[(len(samples) - 1) // 2]
    return done(med[0], [med[1]])
