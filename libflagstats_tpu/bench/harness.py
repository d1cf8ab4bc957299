"""Benchmark harness: min-of-iterations timing + HBM roofline baseline.

TPU port of the reference's measurement methodology
(linux/instrumented_benchmark.cpp): report the *minimum* over iterations
(":107-142"), validate results against the scalar oracle every run
(":181-208"), and compare against a memory-bandwidth speed-of-light
baseline — the reference uses memcpy (":456-544"); here the baseline is
the fastest of several trivially memory-bound device kernels over the
same bytes (read-reduce and copy), i.e. the HBM roofline.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

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
    times: list[float] = field(default_factory=list)

    @property
    def words_per_s(self) -> float:
        return self.n_words / self.min_s

    @property
    def bytes_per_s(self) -> float:
        return 2.0 * self.n_words / self.min_s


def measure_min(fn, args, iters: int = 7, warmup: int = 2, name: str = "") -> BenchResult:
    """Time fn(*args) with block_until_ready, min + avg over iterations."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    n_words = int(np.prod(args[0].shape)) if hasattr(args[0], "shape") else 0
    return BenchResult(
        name=name, n_words=n_words, iters=iters,
        min_s=min(times), avg_s=sum(times) / len(times), times=times,
    )


def roofline_bytes_per_s(n_bytes: int, iters: int = 7) -> dict[str, float]:
    """Measured HBM speed-of-light candidates over n_bytes of device data.

    - read_sum: one-pass int32 sum-reduce (pure read traffic)
    - read_xor: one-pass int32 xor-reduce
    - copy: elementwise copy (counts read+write, reported as 2x bytes/s)
    """
    n32 = n_bytes // 4
    x = jnp.arange(n32, dtype=jnp.int32)
    x = jax.block_until_ready(x)

    sum_fn = jax.jit(lambda a: jnp.sum(a))
    xor_fn = jax.jit(lambda a: jax.lax.reduce(a, jnp.int32(0), jax.lax.bitwise_xor, (0,)))
    copy_fn = jax.jit(lambda a: a + jnp.int32(1))

    out = {}
    for name, fn, mult in (("read_sum", sum_fn, 1.0), ("read_xor", xor_fn, 1.0), ("copy", copy_fn, 2.0)):
        try:
            r = measure_min(fn, (x,), iters=iters, name=name)
        except Exception:
            continue
        out[name] = mult * n_bytes / r.min_s
    return out
