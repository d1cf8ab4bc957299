"""Set-algebra population counts over bitmaps.

Parity with the libalgebra layer the reference vendors
(STORM_intersect_count / STORM_union_count / STORM_diff_count and plain
popcount, reference: python/libalgebra.h:500-3398). On TPU these are
trivially memory-bound fused reduce kernels: `lax.population_count` on
int32 lanes + sum, which XLA fuses into a single pass; a Harley-Seal
tree buys nothing when the hardware has a native per-lane popcount.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _as_u32(x) -> np.ndarray:
    """View any integer bitmap array as a flat uint32 buffer."""
    arr = np.ascontiguousarray(np.asarray(x))
    if arr.dtype.kind not in "ui":
        raise ValueError(f"bitmap array must be integer-typed, got {arr.dtype}")
    if arr.nbytes % 4:
        raise ValueError("bitmap byte size must be a multiple of 4")
    return arr.view(np.uint32).ravel()


@functools.cache
def _jit_unary():
    return jax.jit(
        lambda a: jnp.sum(jax.lax.population_count(a).astype(jnp.int32))
    )


@functools.cache
def _jit_binary(op: str):
    ops = {
        "intersect": jnp.bitwise_and,
        "union": jnp.bitwise_or,
        "diff": lambda a, b: jnp.bitwise_and(a, jnp.bitwise_not(b)),
    }
    f = ops[op]
    return jax.jit(
        lambda a, b: jnp.sum(jax.lax.population_count(f(a, b)).astype(jnp.int32))
    )


def popcnt(bitmap) -> int:
    """Total set bits (reference: STORM_popcnt, libalgebra.h)."""
    a = _as_u32(bitmap)
    if a.size == 0:
        return 0
    return int(_jit_unary()(jnp.asarray(a)))


def _binary_count(a, b, op: str) -> int:
    av, bv = _as_u32(a), _as_u32(b)
    if av.size != bv.size:
        raise ValueError("bitmaps must have equal size")
    if av.size == 0:
        return 0
    return int(_jit_binary(op)(jnp.asarray(av), jnp.asarray(bv)))


def intersect_count(a, b) -> int:
    """popcount(a & b) (reference: STORM_intersect_count)."""
    return _binary_count(a, b, "intersect")


def union_count(a, b) -> int:
    """popcount(a | b) (reference: STORM_union_count)."""
    return _binary_count(a, b, "union")


def diff_count(a, b) -> int:
    """popcount(a & ~b) (reference: STORM_diff_count)."""
    return _binary_count(a, b, "diff")
