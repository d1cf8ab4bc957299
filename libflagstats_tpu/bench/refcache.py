"""Disk cache for benchmark reference counters.

The benchmark inputs are pure functions of (n_words, seed, full_range),
so the host-oracle counters they gate on are too — recomputing them
costs 20-150 s of host time per run at 64Mi words on this shared 4-core
box (the reference pays the same oracle cost per iteration by design,
linux/instrumented_benchmark.cpp:181-208; we keep the bit-exact gate but
amortize it). The cache key includes a hash of the oracle + flag-model
SOURCE: without it, any edit to generate_flags/flagstat_numpy would
leave stale counters on disk and fail every future run's correctness
gate with no hint why (and CLAUDE.md tells operators never to delete
.jax_cache, where these live alongside the compile cache).
"""
from __future__ import annotations

import hashlib
import inspect
import os
import sys

import numpy as np

from .. import flags as _flags_mod
from .. import oracle as _oracle_mod
from ..oracle import flagstat_numpy

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def _source_tag() -> str:
    # include THIS module too: the pospop reference is computed inline
    # below, so an edit here must invalidate cached counters as well
    return hashlib.sha256(
        (inspect.getsource(_oracle_mod) + inspect.getsource(_flags_mod)
         + inspect.getsource(sys.modules[__name__])).encode()
    ).hexdigest()[:10]


def _data_tag(x: np.ndarray) -> str:
    """Content digest of the input array — binds the cache key to the
    DATA, not just the (n_words, seed, full_range) metadata, so a caller
    passing a mismatched array cannot poison the shared cache entry.
    ~0.4 s for 128 MiB vs the 20-150 s oracle it amortizes."""
    buf = x if x.flags["C_CONTIGUOUS"] else np.ascontiguousarray(x)
    return hashlib.sha256(buf).hexdigest()[:12]


def _load(path: str, shape: tuple) -> np.ndarray | None:
    try:
        ref = np.load(path)
        return ref if ref.shape == shape else None
    except Exception:
        return None


def _store(path: str, ref: np.ndarray) -> None:
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, ref)
    except OSError:
        pass


def oracle_counters(x_host: np.ndarray, n_words: int, seed: int = 0,
                    full_range: bool = True, cache_dir: str | None = None
                    ) -> np.ndarray:
    """int64[32] flagstat counters for ``x_host``, disk-cached. The
    (n_words, seed, full_range) metadata makes the filename readable;
    the content digest makes it correct."""
    path = os.path.join(
        cache_dir or _CACHE_DIR,
        f"bench_oracle_{n_words}_s{seed}_fr{int(full_range)}"
        f"_{_source_tag()}_{_data_tag(x_host)}.npy",
    )
    ref = _load(path, (32,))
    if ref is None:
        ref = flagstat_numpy(x_host).astype(np.int64)
        _store(path, ref)
    return ref


def pospopcnt_counters(x_host: np.ndarray, n_words: int, seed: int = 0,
                       full_range: bool = True, cache_dir: str | None = None
                       ) -> np.ndarray:
    """int64[16] positional popcounts for the same input, disk-cached."""
    path = os.path.join(
        cache_dir or _CACHE_DIR,
        f"bench_pospop_{n_words}_s{seed}_fr{int(full_range)}"
        f"_{_source_tag()}_{_data_tag(x_host)}.npy",
    )
    ref = _load(path, (16,))
    if ref is None:
        ref = np.array(
            [np.count_nonzero((x_host.astype(np.uint32) >> k) & 1)
             for k in range(16)],
            dtype=np.int64,
        )
        _store(path, ref)
    return ref
