#!/usr/bin/env python3
"""Packed-plane-layout hypothesis probe (round 5).

The pre-transposed flagstat kernel reads only the 24 NEEDED_ROWS of
each 32-row plane tile (FLAG bits 12-15's planes are dead to the
transform) yet ships all 32 rows through HBM. Three read kernels answer
whether a packed 24-row layout buys the implied 25% traffic cut:

  full32   xor-fold all 32 rows of (G, 32, 8, 128)   (128 MiB)
  sub24    xor-fold only NEEDED_ROWS of the same blocks
           (does Mosaic prune unread sublane ranges of a block copy?)
  pack24   xor-fold all of (G, 24, 8, 128)            (96 MiB)

If pack24 ~= 0.75 x full32, a packed pre-mode layout beats the current
"read wall" by 1.33x in words/s. Run on TPU.
"""
from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_WORDS = 64 * 1024 * 1024


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from libflagstats_tpu.bench.harness import gated_kernel_time_fit
    from libflagstats_tpu.config import enable_compilation_cache
    from libflagstats_tpu.ops import bitslice as B
    from libflagstats_tpu.ops.pallas_kernels import LANE, SUB

    enable_compilation_cache()
    if jax.default_backend() != "tpu":
        print("TPU only", file=sys.stderr)
        return 1

    nblk = 8
    groups = N_WORDS // (32 * 16 * 128)
    rng = np.random.default_rng(7)
    planes32 = jnp.asarray(rng.integers(0, 1 << 32,
                                        size=(groups, 32, SUB, LANE),
                                        dtype=np.uint64).astype(np.uint32))
    rows_needed = sorted(B.NEEDED_ROWS)
    planes24 = planes32[:, rows_needed]
    planes32, planes24 = jax.block_until_ready((planes32, planes24))

    def make_fold(nrows, rows):
        def kernel(x_ref, out_ref):
            step = pl.program_id(0)

            @pl.when(step == 0)
            def _init():
                out_ref[...] = jnp.zeros_like(out_ref)

            acc = None
            for g in range(nblk):
                for k in rows:
                    v = x_ref[g, k]
                    acc = v if acc is None else acc ^ v
            out_ref[...] = out_ref[...] ^ acc

        @functools.partial(jax.jit)
        def fold(p):
            out = pl.pallas_call(
                kernel,
                grid=(p.shape[0] // nblk,),
                in_specs=[pl.BlockSpec((nblk, nrows, SUB, LANE),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((SUB, LANE), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.uint32),
                )(p)
            return jax.lax.reduce(out.ravel(), jnp.uint32(0),
                                  jax.lax.bitwise_xor, (0,)).astype(
                                      jnp.int32)[None]

        return fold

    cases = [
        ("full32", make_fold(32, range(32)), planes32, 32),
        ("sub24", make_fold(32, rows_needed), planes32, 32),
        ("pack24", make_fold(24, range(24)), planes24, 24),
    ]
    ks = (4, 64, 260)
    print("case\tms\tGB/s(own bytes)\tGB/s(128MiB-equiv)")
    results = {}
    for name, fn, inp, nrows in cases:
        n_bytes = inp.size * 4
        fit = gated_kernel_time_fit(fn, inp, ks=ks, iters=4, attempts=4)
        t = fit.slope_s
        results[name] = t
        print(f"{name}\t{t*1e3:.4f}\t{n_bytes/t/1e9:.1f}\t"
              f"{2*N_WORDS/t/1e9:.1f}\tdisp={fit.dispersion:.3f} "
              f"gate={fit.gate_passed}")
    print(f"# pack24/full32 = {results['pack24']/results['full32']:.3f} "
          f"(0.75 = perfect traffic cut)")
    print(f"# sub24/full32  = {results['sub24']/results['full32']:.3f} "
          f"(<1.0 would mean Mosaic prunes unread rows already)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
