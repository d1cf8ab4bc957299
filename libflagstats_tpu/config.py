"""Framework configuration (SURVEY.md §5: the reference's three config
tiers — compile-time feature macros, runtime CPUID dispatch, CLI flags —
collapse here into one dataclass + backend capability probing + env vars).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path


@dataclass
class Config:
    """Live tuning knobs — every field is READ at its point of use
    (dispatch thresholds in ops/dispatch.py, block size in io/codec.py,
    thread pool + nblk in io/stream.py / parallel/multihost.py), so
    editing CONFIG at runtime takes effect on the next call."""

    # Pallas kernel geometry
    nblk: int = 8                      # register-groups per grid step (1 HS body)
    # dispatch thresholds (words): xla_min is the shape-bucketing floor
    # for device calls; pallas_min the bit-sliced kernel's minimum
    # (floored at one legal grid step by dispatch)
    xla_min: int = 1 << 14
    pallas_min: int = 1 << 20
    # io
    block_bytes: int = 1_024_000       # framed codec block (flagstats.cpp:136)
    decode_threads: int = 0            # 0 = hardware_concurrency
    # jit ergonomics
    compilation_cache: str | None = os.environ.get(
        "LIBFLAGSTATS_JAX_CACHE",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )


CONFIG = Config()
_cache_enabled = False


def enable_compilation_cache() -> None:
    """Persist XLA/Mosaic compilations across processes. On this stack a
    cold kernel compile goes through a remote compile service and takes
    minutes; the persistent cache makes that a one-time cost."""
    global _cache_enabled
    if _cache_enabled or not CONFIG.compilation_cache:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", CONFIG.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception as exc:
        # the cache is load-bearing on this stack (remote compiles take
        # minutes) — losing it silently would make every process start
        # pay that cost with nothing to diagnose
        import sys

        print(f"[libflagstats_tpu] WARNING: persistent compile cache "
              f"disabled ({type(exc).__name__}: {exc}); cold compiles "
              f"will repeat every process", file=sys.stderr)
