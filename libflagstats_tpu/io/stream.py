"""Streaming host->device flagstat pipeline.

The reference pipeline is strictly sequential: read block, decompress,
kernel, repeat — and ~80% of its time is retrieval (README.md:27-29).
Here the host side decodes framed blocks on a thread pool *ahead* of the
device, and device work is dispatched asynchronously (JAX dispatch
returns before the TPU finishes), so decode(i+1) overlaps compute(i).
Counters accumulate on-device as the tiny (C[k], F[k]) stream-sum pair;
only the final 32-counter vector is pulled to host
(reference counterpart: the per-block accumulate loop,
benchmark/flagstats.cpp:311-332).
"""
from __future__ import annotations

import concurrent.futures as cf
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import flags as F
from ..ops import pallas_kernels as PK
from ..ops.xla_ops import assemble_counters, stream_sums_xla
from . import codec as C


@functools.cache
def _jit_chunk_sums(impl: str, chunk_words: int, report: bool = False):
    if impl == "pallas":
        def fn(chunk, total, fail):
            t, f = PK.stream_sums_pallas(chunk, report=report)
            return total + t, fail + f
    else:
        def fn(chunk, total, fail):
            t, f = stream_sums_xla(chunk)
            return total + t, fail + f
    return jax.jit(fn)


@functools.cache
def _jit_assemble():
    return jax.jit(assemble_counters)


def flagstat_stream(path, codec: str | int = "lz4", impl: str | None = None,
                    chunk_words: int | None = None, threads: int = 0,
                    checkpoint=None, report: bool = False) -> np.ndarray:
    """Framed stream -> 32-counter vector, decode/compute overlapped.

    ``checkpoint``: optional StreamCheckpoint to resume from / update
    (persists (block_index, partial sums) — the block-accumulative
    contract makes partial results trivially checkpointable).
    ``report=True`` uses the faster 21-stream kernel (masked-positional
    counters left at zero)."""
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if chunk_words is None:
        chunk_words = 8 * PK.GROUP_WORDS if impl == "pallas" else 1 << 20

    step = _jit_chunk_sums(impl, chunk_words, report and impl == "pallas")
    total = jnp.zeros(F.N_BITS, jnp.int32)
    fail = jnp.zeros(F.N_BITS, jnp.int32)
    n_words = 0
    start_block = 0
    if checkpoint is not None and checkpoint.block_index > 0:
        total = jnp.asarray(checkpoint.total)
        fail = jnp.asarray(checkpoint.fail)
        n_words = checkpoint.n_words
        start_block = checkpoint.block_index

    pending = np.zeros(0, dtype=np.uint16)
    n_threads = threads or 8

    def blocks():
        # bounded decode-ahead window: up to 4*n_threads blocks in flight
        # so memory stays O(window), not O(file)
        from collections import deque

        window = 4 * n_threads
        frames = C.iter_framed(path)
        for _ in range(start_block):
            next(frames, None)
        with cf.ThreadPoolExecutor(n_threads) as pool:
            futs: deque = deque()
            for raw_len, payload in frames:
                futs.append(pool.submit(C.decompress_block, payload, raw_len, codec))
                if len(futs) >= window:
                    yield np.frombuffer(futs.popleft().result(), dtype=np.uint16)
            while futs:
                yield np.frombuffer(futs.popleft().result(), dtype=np.uint16)

    block_index = start_block
    for block in blocks():
        n_words += block.size
        pending = np.concatenate([pending, block]) if pending.size else block
        while pending.size >= chunk_words:
            chunk, pending = pending[:chunk_words], pending[chunk_words:]
            total, fail = step(jnp.asarray(chunk), total, fail)
        block_index += 1
        # a checkpoint is only valid when no words are waiting in the
        # partial-chunk buffer (its words are counted in n_words but not
        # yet in the sums)
        if checkpoint is not None and pending.size == 0:
            checkpoint.maybe_save(block_index, total, fail, n_words)

    if pending.size:
        tail = np.zeros(chunk_words, dtype=np.uint16)
        tail[: pending.size] = pending
        total, fail = step(jnp.asarray(tail), total, fail)

    counters = _jit_assemble()(total, fail, jnp.int32(n_words))
    return np.asarray(counters, dtype=np.int64).astype(np.uint64)


class StreamCheckpoint:
    """Persist (block_index, partial stream sums) so an interrupted run
    resumes without recounting (SURVEY.md §5: the block-accumulative
    counter contract is the natural checkpoint unit)."""

    def __init__(self, path, every_blocks: int = 64):
        self.path = str(path)
        self.every_blocks = every_blocks
        self.block_index = 0
        self.n_words = 0
        self.total = np.zeros(F.N_BITS, np.int32)
        self.fail = np.zeros(F.N_BITS, np.int32)
        self._load()

    def _load(self):
        try:
            with np.load(self.path) as z:
                self.block_index = int(z["block_index"])
                self.n_words = int(z["n_words"])
                self.total = z["total"]
                self.fail = z["fail"]
        except (FileNotFoundError, OSError, KeyError):
            pass

    def maybe_save(self, block_index, total, fail, n_words, force=False):
        if not force and block_index % self.every_blocks:
            return
        self.block_index = block_index
        self.n_words = n_words
        self.total = np.asarray(total)
        self.fail = np.asarray(fail)
        np.savez(self.path, block_index=block_index, n_words=n_words,
                 total=self.total, fail=self.fail)
