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

    # Pallas kernel geometry: register-groups per grid step (8 = one
    # Harley-Seal body). Measured A/B (docs/BENCHMARKS.md kernel roster):
    # with the round-2 SWAR peel, full-parity mode preferred nblk=16
    # (~5%); with the round-3 native-popcount peel (one VPU op instead
    # of ~16) the balance flipped and nblk=8 is fastest in BOTH modes
    # (2026-08-19 sweep: full 0.169 ms @8 vs 0.189 @16/@32) — the
    # smaller VMEM working set wins once the peel is ~free. The two
    # modes keep separate knobs and dispatch reads the one matching the
    # mode it runs (nblk_for below); re-run tools/kernel_sweep.py after
    # any kernel change.
    nblk: int = 8                      # report-mode / general default
    nblk_full: int = 8                 # full-parity (29-stream) mode
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


def nblk_for(report: bool = False) -> int:
    """The measured-best grid-step depth for the bit-sliced kernel mode
    (see the Config.nblk citation): full parity -> CONFIG.nblk_full,
    report mode -> CONFIG.nblk. Read at the point of use so editing
    CONFIG takes effect on the next call."""
    return CONFIG.nblk if report else CONFIG.nblk_full


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
