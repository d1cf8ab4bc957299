"""Pallas TPU kernels: bit-sliced flagstat and positional popcount.

The hot path of the framework. Design (see ops/bitslice.py for the
executable NumPy spec):

* the uint16 FLAG stream is reshaped to (groups, 32, 16, 128) tiles; a
  free sublane bitcast pairs words into 32 uint32 "registers" per group,
  i.e. 1024 independent 32x32 bit matrices (one per (sublane, lane));
* a masked-swap network bit-transposes each group into plane rows — the
  TPU-native replacement for the reference's pshufb/vpermw lookups
  (reference: libflagstats.h:281-290, 1850-2075). The classic j=16 stage
  is elided: it only permutes words, and counting is order-free
  (see ops/bitslice.py);
* the samtools flagstat logic runs in plane space at one VPU op per 32
  words (reference semantics: libflagstats.h:118-142);
* each counted plane feeds a Harley-Seal CSA tree (v1/v2/v4/v8 carried in
  VMEM scratch across sequential grid steps, "sixteens" peeled via the
  VPU's native popcount into int32 accumulators) — the discipline of
  STORM_pospopcnt_csa_avx512 (libalgebra.h:2311-2319) on XOR/AND/OR VPU ops.
  An opt-in two-level schedule (two_level=True) runs a second CSA tree
  over the sixteens planes; it paid when the peel was a ~16-op SWAR
  sequence (round 2) and costs more than it saves with the native
  popcount (round-3 A/B in docs/BENCHMARKS.md).

Zero padding is exactly neutral (a zero FLAG word counts nothing), so the
kernels take zero-padded streams and no scalar tail loop is needed
(unlike the reference's tail, libflagstats.h:187-189).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import flags as F
from . import bitslice as B
from .xla_ops import assemble_counters

SUB = 8            # sublanes per register tile
LANE = 128         # lanes per register tile
REGS = 32          # int32 registers per transpose group
SUB16 = 2 * SUB    # sublanes of the uint16 input tile backing one register
GROUP_WORDS = REGS * SUB * LANE * 2   # uint16 words per register-group (65536)

_U32 = jnp.uint32


def _u32(c: int) -> jax.Array:
    return jnp.uint32(c & 0xFFFFFFFF)


def _transpose32(A: list[jax.Array], stages: dict[int, list[int]]) -> list[jax.Array]:
    """Masked-swap bit transpose of 32 uint32 tiles (4-stage elided
    network: bit j lands at rows 15-j and 31-j; see bitslice.py)."""
    A = list(A)
    for j, mask in B.TRANSPOSE_STAGES:
        m = _u32(mask)
        for k in stages[j]:
            t = (A[k] ^ (A[k + j] >> j)) & m
            A[k] = A[k] ^ t
            A[k + j] = A[k + j] ^ (t << j)
    return A


def _popcount32(x: jax.Array) -> jax.Array:
    """Per-element popcount of uint32 tiles (the CSA-plane 'peel').

    lax.population_count lowers to the VPU's native popcount on TPU
    (verified on hardware, round 3) — one op where the round-1/2 SWAR
    sequence spent ~16; it also traces identically on CPU, so the jnp
    twin stays bit-exact."""
    return jax.lax.population_count(x)


def _csa(v: jax.Array, a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Carry-save full adder: returns (sum, carry) of v+a+b per bit.

    The reference's VPTERNLOG 0x96/0xE8 pair (libalgebra.h:2311-2319)
    maps to plain XOR3 / majority, which XLA/Mosaic fuses on the VPU.
    """
    va = v ^ a
    return va ^ b, (v & a) | (b & va)


def _stream_inputs_flagstat(rows: list[jax.Array], report: bool = False) -> list[jax.Array]:
    """Transposed rows -> the counted plane streams (C then F);
    29 streams in full-positional mode, 21 in report mode."""
    c_streams = B.REPORT_C_STREAMS if report else B.C_STREAMS
    f_streams = B.REPORT_F_STREAMS if report else B.F_STREAMS
    streams = []
    for row_of in (B.first_half_row, B.second_half_row):
        p = [None if (report and j in (4, 5)) else rows[row_of(j)]
             for j in range(12)]
        t = B.transform_planes(p, report=report)
        q = t[F.FQCFAIL_OFF]
        half = [t[k] for k in c_streams] + [t[k] & q for k in f_streams]
        streams.append(half)
    # pair the two word-half planes per stream: list of (h1, h2) tuples
    return list(zip(streams[0], streams[1]))


def _stream_inputs_pospopcnt(rows: list[jax.Array]) -> list[jax.Array]:
    """Transposed rows -> 16 raw positional bit streams."""
    h1 = [rows[B.first_half_row(j)] for j in range(16)]
    h2 = [rows[B.second_half_row(j)] for j in range(16)]
    return list(zip(h1, h2))


def _stream_inputs_raw(rows: list[jax.Array]) -> list[jax.Array]:
    """Transposed rows -> 29 RAW plane streams (count-only probe).

    The flagstat stream COUNT and CSA schedule with the mask-select
    transform deleted: C-stream k and F-stream k both count raw plane k
    directly. Exists for the measured stage decomposition (round 5,
    VERDICT r04 #2): T(pre) - T(raw) isolates the transform's device
    cost, the way the reference brackets kernels between memcpy and the
    full variant (linux/instrumented_benchmark.cpp:456-544). Counts are
    well-defined (positional popcounts, duplicated across strata), so
    the probe kernel is itself oracle-checkable."""
    c = [(rows[B.first_half_row(k)], rows[B.second_half_row(k)])
         for k in B.C_STREAMS]
    f = [(rows[B.first_half_row(k)], rows[B.second_half_row(k)])
         for k in B.F_STREAMS]
    return c + f


#: packed pre-mode row order (round 5): the flagstat transform never
#: reads the planes of FLAG bits 12-15, so the pre-transposed layout
#: can ship only the rows the kernel consumes — 24 of 32 in full mode,
#: 20 in report mode — cutting device HBM traffic 25% / 37.5% below
#: the 16-bit read wall (measured: tools/packed_probe.py). Order is
#: sorted original row index; the kernel maps original -> packed at
#: trace time.
PACKED_ROWS_FULL = tuple(sorted(B.NEEDED_ROWS))        # 24 rows
PACKED_ROWS_REPORT = tuple(sorted(B.REPORT_NEEDED_ROWS))  # 20 rows


def packed_rows_for(report: bool = False) -> tuple[int, ...]:
    return PACKED_ROWS_REPORT if report else PACKED_ROWS_FULL


def _make_kernel(nblk: int, mode: str, pre: bool = False,
                 two_level: bool | None = None,
                 packed_rows: tuple | None = None):
    """Build the Pallas kernel body for `mode` in
    {"flagstat", "flagstat_report", "pospopcnt"}; ``pre=True`` consumes
    host-pretransposed plane tiles and skips the in-VMEM transpose;
    ``packed_rows`` (pre only) says the input tiles carry only those
    original rows, in that order (PACKED_ROWS_FULL/_REPORT).

    Returns (kernel, n_streams, two_level). With nblk == 8 (one
    Harley-Seal body per grid step) a SECOND Harley-Seal tree runs over
    the sixteens planes across grid steps (v16/v32 carried in VMEM
    scratch), so the popcount peel runs every 4th step instead of
    every step — the same "fewer tree flushes" economy as the
    reference's improved3/4 single-tree variants (libflagstats.h:
    2325-2428), applied one level up. nblk == 16 pairs the level-16
    planes in-step and carries only the 32s across steps; nblk == 32
    (round 3) runs the whole second level IN-step — four sixteens pair
    to one peeled 64s plane with no cross-step pending machinery and
    half the per-step scratch round-trips of nblk=16."""
    repeat = 1
    if mode.startswith("flagstat_raw@"):
        # repeat-chained count probe (stage decomposition): the whole
        # nblk-group CSA consumption runs `repeat` times per grid step
        # with the accumulators CHAINED across repetitions (v changes
        # every rep, so no two _csa calls are common subexpressions a
        # compiler could fold). Counts come out exactly repeat x the
        # rep-1 counts — still oracle-checkable. Differencing two
        # compute-bound repeat counts isolates the CSA+peel ALU time
        # from the DMA shadow (tools/stage_decomposition.py).
        repeat = int(mode.split("@", 1)[1])
        mode = "flagstat_raw"
    if mode == "flagstat":
        n_streams = B.N_STREAMS
        stages = B.pruned_pairs()
        make_streams = _stream_inputs_flagstat
    elif mode == "flagstat_report":
        n_streams = B.N_REPORT_STREAMS
        stages = B.pruned_pairs(B.REPORT_NEEDED_ROWS)
        make_streams = functools.partial(_stream_inputs_flagstat, report=True)
    elif mode == "flagstat_raw":
        # count-only decomposition probe: full stream count, no transform
        if not pre:
            # the pruned transpose only materializes NEEDED_ROWS (planes
            # 0-11); raw streams read planes 0-14, so this mode is
            # defined over host-pretransposed tiles only
            raise ValueError("flagstat_raw requires pre=True plane tiles")
        n_streams = B.N_STREAMS
        stages = None
        make_streams = _stream_inputs_raw
    else:
        n_streams = 16
        stages = {j: B.swap_pairs(j) for j, _ in B.TRANSPOSE_STAGES}
        make_streams = _stream_inputs_pospopcnt

    if two_level is None:
        # Round-3 default: OFF. The second-level tree existed to amortize
        # the ~16-op SWAR peel; with the native-popcount peel (1 op) the
        # cross-step state machine costs more than it saves (alternating
        # A/B 2026-08-19, docs/BENCHMARKS.md round-3 section). The flag
        # stays so the two-level schedule remains buildable/testable.
        two_level = False
    if two_level and nblk not in (8, 16, 32):
        raise ValueError("two_level schedules exist for nblk in (8,16,32)")
    if repeat > 1 and two_level:
        raise ValueError("repeat-chained probes have no two_level schedule")

    def kernel(x_ref, out_ref, v1_ref, v2_ref, v4_ref, v8_ref, *extra):
        step = pl.program_id(0)
        nsteps = pl.num_programs(0)
        if two_level and nblk == 32:
            v16_ref, v32_ref = extra
        elif two_level:
            v16_ref, v32_ref, s16p_ref, t32p_ref = extra

        @pl.when(step == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)
            for ref in (v1_ref, v2_ref, v4_ref, v8_ref) + tuple(extra):
                ref[...] = jnp.zeros_like(ref)

        v1 = [v1_ref[s] for s in range(n_streams)]
        v2 = [v2_ref[s] for s in range(n_streams)]
        v4 = [v4_ref[s] for s in range(n_streams)]
        v8 = [v8_ref[s] for s in range(n_streams)]
        acc = [None] * n_streams
        s16 = [[] for _ in range(n_streams)]  # this step's sixteens (two_level)

        # Harley-Seal over nblk register-groups: each group contributes an
        # (even, odd) input pair per stream; nblk=8 is one 16-input body.
        # The rep loop only unrolls >1 for the repeat-chained count probe
        # (stage decomposition; accumulators chain across reps, so no rep
        # is CSE-foldable and counts scale exactly by `repeat`).
        for _rep in range(repeat):
            twosA = [None] * n_streams
            foursA = [None] * n_streams
            eightsA = [None] * n_streams
            for g in range(nblk):
                if pre and packed_rows is not None:
                    # packed tiles: only the consumed rows ship (24 full /
                    # 20 report) — map original row index -> packed slot;
                    # unshipped rows stay None and are never touched
                    # (the stream builders skip them by construction)
                    slot = {orig: i for i, orig in enumerate(packed_rows)}
                    rows = [x_ref[g, slot[k]] if k in slot else None
                            for k in range(REGS)]
                elif pre:
                    rows = [x_ref[g, k] for k in range(REGS)]
                else:
                    # free sublane reinterpretation: (16,128) uint16 ->
                    # (8,128) uint32, each word landing intact in one
                    # 16-bit field (any pairing is count-neutral)
                    regs = [pltpu.bitcast(x_ref[g, k], _U32)
                            for k in range(REGS)]
                    rows = _transpose32(regs, stages)
                pairs = make_streams(rows)
                for s, (d0, d1) in enumerate(pairs):
                    v1[s], twos = _csa(v1[s], d0, d1)
                    if g % 2 == 0:
                        twosA[s] = twos
                        continue
                    v2[s], fours = _csa(v2[s], twosA[s], twos)
                    if g % 4 == 1:
                        foursA[s] = fours
                        continue
                    v4[s], eights = _csa(v4[s], foursA[s], fours)
                    if g % 8 == 3:
                        eightsA[s] = eights
                        continue
                    v8[s], sixteens = _csa(v8[s], eightsA[s], eights)
                    if two_level:
                        s16[s].append(sixteens)
                    else:
                        pc = _popcount32(sixteens) << 4  # bit = 16 words
                        acc[s] = pc if acc[s] is None else acc[s] + pc

        for s in range(n_streams):
            v1_ref[s] = v1[s]
            v2_ref[s] = v2[s]
            v4_ref[s] = v4[s]
            v8_ref[s] = v8[s]
            if acc[s] is not None:
                out_ref[s] += acc[s].astype(jnp.int32)

        if two_level and nblk == 8:
            # level-16/32 state machine keyed on the step index (one
            # sixteens per step): stash on even steps, combine on odd,
            # peel a 64s plane every 4th step.
            @pl.when(step % 2 == 0)
            def _stash16():
                for s in range(n_streams):
                    s16p_ref[s] = s16[s][0]

            @pl.when(step % 2 == 1)
            def _combine16():
                t32 = [None] * n_streams
                for s in range(n_streams):
                    v16_ref[s], t32[s] = _csa(v16_ref[s], s16p_ref[s],
                                              s16[s][0])

                @pl.when(step % 4 == 1)
                def _stash32():
                    for s in range(n_streams):
                        t32p_ref[s] = t32[s]

                @pl.when(step % 4 == 3)
                def _peel64():
                    for s in range(n_streams):
                        v32_ref[s], t64 = _csa(v32_ref[s], t32p_ref[s], t32[s])
                        out_ref[s] += (_popcount32(t64) << 6).astype(jnp.int32)
        elif two_level and nblk == 32:
            # the whole second level runs in-step: four sixteens -> two
            # 32s -> one peeled 64s plane, nothing pending across steps
            for s in range(n_streams):
                v16_ref[s], t32a = _csa(v16_ref[s], s16[s][0], s16[s][1])
                v16_ref[s], t32b = _csa(v16_ref[s], s16[s][2], s16[s][3])
                v32_ref[s], t64 = _csa(v32_ref[s], t32a, t32b)
                out_ref[s] += (_popcount32(t64) << 6).astype(jnp.int32)
        elif two_level:
            # nblk == 16: two sixteens per step pair IN-step at level 16;
            # only the 32s plane needs the cross-step pending machinery.
            t32 = [None] * n_streams
            for s in range(n_streams):
                v16_ref[s], t32[s] = _csa(v16_ref[s], s16[s][0], s16[s][1])

            @pl.when(step % 2 == 0)
            def _stash32():
                for s in range(n_streams):
                    t32p_ref[s] = t32[s]

            @pl.when(step % 2 == 1)
            def _peel64():
                for s in range(n_streams):
                    v32_ref[s], t64 = _csa(v32_ref[s], t32p_ref[s], t32[s])
                    out_ref[s] += (_popcount32(t64) << 6).astype(jnp.int32)

        # Final flush of CSA residuals (reference: the weighted v1/v2/v4/v8
        # reduction, libflagstats.h:1790-1840).
        @pl.when(step == nsteps - 1)
        def _flush():
            for s in range(n_streams):
                res = (
                    _popcount32(v1_ref[s])
                    + (_popcount32(v2_ref[s]) << 1)
                    + (_popcount32(v4_ref[s]) << 2)
                    + (_popcount32(v8_ref[s]) << 3)
                )
                if two_level:
                    res += (_popcount32(v16_ref[s]) << 4) + (
                        _popcount32(v32_ref[s]) << 5)
                out_ref[s] += res.astype(jnp.int32)
            if two_level and nblk != 32:
                # pending planes are live only for these step-count
                # parities (consumed otherwise); nblk=32 has no pending
                if nblk == 8:
                    @pl.when(nsteps % 2 == 1)
                    def _pending16():
                        for s in range(n_streams):
                            out_ref[s] += (
                                _popcount32(s16p_ref[s]) << 4
                            ).astype(jnp.int32)

                live32 = ((nsteps % 4 == 2) | (nsteps % 4 == 3)
                          if nblk == 8 else nsteps % 2 == 1)

                @pl.when(live32)
                def _pending32():
                    for s in range(n_streams):
                        out_ref[s] += (
                            _popcount32(t32p_ref[s]) << 5).astype(jnp.int32)

    return kernel, n_streams, two_level


@functools.partial(jax.jit, static_argnames=("nblk", "mode", "interpret", "pre",
                                              "two_level", "packed_rows"))
def _run_kernel(xg: jax.Array, nblk: int, mode: str, interpret: bool,
                pre: bool = False, two_level: bool | None = None,
                packed_rows: tuple | None = None) -> jax.Array:
    """xg: (groups, 32, 16, 128) uint16 — or, with pre=True,
    (groups, 32, 8, 128) uint32 host-pretransposed plane tiles (with
    packed_rows: (groups, len(packed_rows), 8, 128));
    groups % nblk == 0."""
    if packed_rows is not None and mode not in ("flagstat",
                                                "flagstat_report"):
        # raw/pospopcnt streams read planes outside the packed row set
        raise ValueError(f"packed_rows unsupported for mode {mode!r}")
    kernel, n_streams, two_level = _make_kernel(nblk, mode, pre=pre,
                                                two_level=two_level,
                                                packed_rows=packed_rows)
    groups = xg.shape[0]
    out_rows = 16 if mode == "pospopcnt" else 32
    n_in_rows = REGS if packed_rows is None else len(packed_rows)
    in_block = (nblk, n_in_rows, SUB, LANE) if pre \
        else (nblk, REGS, SUB16, LANE)
    # + v16/v32 (+ s16-pending/t32-pending below nblk=32)
    n_scratch = 4 if not two_level else (6 if nblk == 32 else 8)
    out = pl.pallas_call(
        kernel,
        grid=(groups // nblk,),
        in_specs=[
            pl.BlockSpec(
                in_block,
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (out_rows, SUB, LANE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows, SUB, LANE), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_streams, SUB, LANE), jnp.uint32)
            for _ in range(n_scratch)
        ],
        interpret=interpret,
    )(xg)
    return jnp.sum(out, axis=(1, 2))  # (out_rows,) per-stream totals


def _pack_stream(x: jax.Array, nblk: int) -> jax.Array:
    """uint16 stream -> zero-padded (groups, 32, 16, 128) uint16 view.

    A pure reshape: the uint16->uint32 register pairing happens inside
    the kernel via a sublane bitcast, so the stream is read from HBM
    exactly once with no layout-padding blowup."""
    if x.dtype != jnp.uint16:
        raise ValueError(f"expected uint16, got {x.dtype}")
    if nblk % 8 != 0:
        raise ValueError("nblk must be a multiple of 8 (one Harley-Seal body)")
    step_words = nblk * GROUP_WORDS
    n = x.size
    padded = ((n + step_words - 1) // step_words) * step_words
    if padded != n:
        x = jnp.pad(x.ravel(), (0, padded - n))
    return x.reshape(-1, REGS, SUB16, LANE)


def stream_sums_pallas(
    x: jax.Array, nblk: int = 8, interpret: bool = False, report: bool = False,
    two_level: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Raw stratified stream sums (C[k], F[k]) each (16,) int32, psum-mergeable.

    ``x`` must already be zero-padded to a multiple of nblk*GROUP_WORDS
    when called under shard_map (use _pack_stream/pad_length outside).
    ``report=True`` runs the faster 21-stream kernel that skips the four
    masked-positional counters the flagstat report never reads."""
    if x.size == 0:
        # a 0-step grid never runs the step-0 init, leaving the output
        # buffer uninitialized on hardware (same guard as read_xor_pallas)
        return jnp.zeros(F.N_BITS, jnp.int32), jnp.zeros(F.N_BITS, jnp.int32)
    mode = "flagstat_report" if report else "flagstat"
    sums = _run_kernel(_pack_stream(x, nblk), nblk, mode, interpret,
                       two_level=two_level)
    return _sums_to_streams(sums, report)


def _sums_to_streams(sums: jax.Array, report: bool) -> tuple[jax.Array, jax.Array]:
    """Per-stream kernel totals -> (C[k], F[k]) scatter into 16-bin vectors."""
    c_idx = np.array(B.REPORT_C_STREAMS if report else B.C_STREAMS)
    f_idx = np.array(B.REPORT_F_STREAMS if report else B.F_STREAMS)
    total = jnp.zeros(F.N_BITS, jnp.int32).at[c_idx].set(sums[: len(c_idx)])
    fail = jnp.zeros(F.N_BITS, jnp.int32).at[f_idx].set(
        sums[len(c_idx):len(c_idx) + len(f_idx)]
    )
    return total, fail


def flagstat_pallas(x: jax.Array, n=None, nblk: int = 8, interpret: bool = False,
                    report: bool = False) -> jax.Array:
    """Flagstat counters for a uint16 FLAG batch -> (32,) int32.

    The flagship kernel: fused transpose + mask-select + stratified
    pospopcnt. `n` is the true (pre-padding) length for the derived
    pass-total (reference: libflagstats.h:429). ``report=True`` trades
    the four masked-positional counters (left at 0) for ~15% more
    throughput (reference analogue: FLAGSTAT_avx512_improved3/4).
    """
    if n is None:
        n = x.size
    total, fail = stream_sums_pallas(x, nblk=nblk, interpret=interpret,
                                     report=report)
    return assemble_counters(total, fail, n)


def stream_sums_pallas_pre(
    planes: jax.Array, nblk: int = 8, interpret: bool = False,
    report: bool = False, packed: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Raw stratified stream sums (C[k], F[k]) over host-pretransposed
    plane tiles (bitslice.pretranspose_host / native lfs_bit_transpose):
    the kernel skips its in-VMEM transpose, so on-device it is pure
    transform + CSA over DMA'd planes — measured at the HBM read wall in
    every congestion window (docs/BENCHMARKS.md), which is why the
    streaming pipeline's device tier feeds this shape (round-4).
    ``planes``: (groups, 32, 8, 128) uint32; accumulate/psum-mergeable
    like stream_sums_pallas.

    ``packed=True`` (round 5): the tiles carry only the rows the
    transform consumes (bitslice.pretranspose_host_packed) —
    (groups, 24, 8, 128) full / (groups, 20, 8, 128) report — cutting
    device HBM traffic 25% / 37.5% below the 16-bit read wall
    (measured 0.758x the full-tile time, tools/packed_probe.py; the
    reference has no analogue — it must read every uint16)."""
    rows = packed_rows_for(report) if packed else None
    n_rows = len(rows) if packed else REGS
    if planes.ndim != 4 or planes.shape[1:] != (n_rows, SUB, LANE):
        raise ValueError(
            f"expected (G, {n_rows}, 8, 128) plane tiles, got {planes.shape}")
    if nblk % 8 != 0:
        # same contract as _pack_stream: the kernel schedule is built
        # from whole 8-block Harley-Seal bodies — a smaller nblk would
        # return silently wrong counters, not error
        raise ValueError("nblk must be a multiple of 8 (one Harley-Seal body)")
    if planes.shape[0] == 0:  # 0-step grid: output would stay uninitialized
        return jnp.zeros(F.N_BITS, jnp.int32), jnp.zeros(F.N_BITS, jnp.int32)
    groups = planes.shape[0]
    if groups % nblk:
        pad = nblk - groups % nblk
        planes = jnp.concatenate(
            [planes, jnp.zeros((pad, n_rows, SUB, LANE), planes.dtype)]
        )
    mode = "flagstat_report" if report else "flagstat"
    sums = _run_kernel(planes, nblk, mode, interpret, pre=True,
                       packed_rows=rows)
    return _sums_to_streams(sums, report)


def flagstat_pallas_pre(planes: jax.Array, n: int, nblk: int = 8,
                        interpret: bool = False, report: bool = False,
                        packed: bool = False) -> jax.Array:
    """Flagstat over host-pretransposed plane tiles (see
    stream_sums_pallas_pre). ``planes``: (groups, 32, 8, 128) uint32
    (packed=True: only the consumed rows, see stream_sums_pallas_pre);
    ``n`` is the true (pre-padding) word count for the derived
    pass-total (reference: libflagstats.h:429)."""
    total, fail = stream_sums_pallas_pre(planes, nblk=nblk,
                                         interpret=interpret, report=report,
                                         packed=packed)
    return assemble_counters(total, fail, n)


def pospopcnt_u16_pallas(x: jax.Array, nblk: int = 8, interpret: bool = False) -> jax.Array:
    """Raw positional popcount of a uint16 stream -> (16,) int32.

    TPU analogue of STORM_pospopcnt_u16_avx512bw_harvey_seal
    (libalgebra.h:2383)."""
    if x.size == 0:  # 0-step grid: output would stay uninitialized
        return jnp.zeros(F.N_BITS, jnp.int32)
    return _run_kernel(_pack_stream(x, nblk), nblk, "pospopcnt", interpret)


# ---------------------------------------------------------------------------
# Streaming-read roofline kernel: xor-fold the whole stream with one VPU
# op per 2048 words. This is the Pallas "how fast can this chip actually
# READ the bytes" candidate for the bench roofline — XLA's reduce
# (read_sum/read_xor in bench/harness.ROOF_CANDIDATES) has been measured
# streaming below what the hand-tiled grid DMA sustains (equal in quiet
# windows, ~11% under in one measured window: 697-736 vs ~786 GB/s),
# which understated the roofline enough to make an honest kernel sample
# look 1.03x "above roofline". The reference's counterpart is the
# memcpy speed-of-light baseline
# (linux/instrumented_benchmark.cpp:456-544).
# ---------------------------------------------------------------------------


def _make_roof_kernel(nblk: int):
    def kernel(x_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        acc = pltpu.bitcast(x_ref[0, 0], _U32)
        for g in range(nblk):
            for k in range(REGS):
                if g or k:
                    acc = acc ^ pltpu.bitcast(x_ref[g, k], _U32)
        out_ref[...] = out_ref[...] ^ acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def read_xor_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Xor-fold of a uint16 stream -> uint32[1] (order-free digest).

    Pure streaming read over the same (groups, 32, 16, 128) tiling the
    flagstat kernels use; the only compute is one xor per register tile,
    so its measured time IS the achievable HBM read time for that
    layout."""
    if x.size == 0:
        # a 0-step grid would never run the step-0 init, leaving the
        # output buffer uninitialized
        return jnp.zeros((1,), _U32)
    nblk = 8
    xg = _pack_stream(x, nblk)
    out = pl.pallas_call(
        _make_roof_kernel(nblk),
        grid=(xg.shape[0] // nblk,),
        in_specs=[
            pl.BlockSpec((nblk, REGS, SUB16, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((SUB, LANE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), _U32),
        interpret=interpret,
    )(xg)
    return jax.lax.reduce(out.ravel(), _u32(0), jax.lax.bitwise_xor, (0,))[None]


# ---------------------------------------------------------------------------
# Stage-decomposition probe kernels (round 5, VERDICT r04 #2): measure
# each stage of the in-VMEM-transpose kernel instead of asserting its op
# model on paper. Over the SAME 128 MiB of HBM traffic:
#
#   T_read       read_xor_pallas               (pure read + xor fold)
#   T_transpose  transpose_xor_pallas          (read + bitcast + pruned
#                                               transpose + xor fold)
#   T_raw        stream_sums_pallas_raw        (read pre-planes + 29-stream
#                                               CSA count, NO transform)
#   T_pre        stream_sums_pallas_pre        (read pre-planes + transform
#                                               + CSA count)
#   T_full       stream_sums_pallas            (everything in-VMEM)
#
# transpose share = T_transpose - T_read; transform share = T_pre - T_raw;
# count share = T_raw - T_read; additivity check: T_full ≈ T_transpose +
# T_pre - T_read. Driven by tools/stage_decomposition.py with the
# defended fit + bracketing method; results in docs/BENCHMARKS.md.
# Reference discipline: the memcpy speed-of-light bracketing of
# linux/instrumented_benchmark.cpp:456-544.
# ---------------------------------------------------------------------------


def stream_sums_pallas_raw(planes: jax.Array, nblk: int = 8,
                           interpret: bool = False,
                           repeat: int = 1) -> jax.Array:
    """Count-only probe: the flagstat kernel's exact stream count and
    CSA schedule over host-pretransposed plane tiles with the transform
    deleted (see _stream_inputs_raw). Returns the (32,) per-stream
    totals: entry s < 15 and entry 15 + s both hold the positional
    popcount of plane s (strata duplicated), so callers can verify
    against pospopcnt. ``repeat`` chains the whole CSA consumption that
    many times per grid step (counts scale exactly by repeat) —
    differencing two compute-bound repeat counts isolates the CSA+peel
    ALU time from the DMA shadow."""
    if planes.ndim != 4 or planes.shape[1:] != (REGS, SUB, LANE):
        raise ValueError(
            f"expected (G, 32, 8, 128) plane tiles, got {planes.shape}")
    if planes.shape[0] == 0:
        return jnp.zeros(32, jnp.int32)
    groups = planes.shape[0]
    # int32 accumulator bound: a stream's total is <= words x repeat;
    # past 2^31-1 the counts silently wrap and the "exactly repeat x
    # the rep-1 counts" contract would be false — refuse, don't wrap
    max_repeat = max((2 ** 31 - 1) // (groups * GROUP_WORDS), 1)
    if repeat > max_repeat:
        raise ValueError(
            f"repeat={repeat} would overflow the int32 stream "
            f"accumulators at this size (max {max_repeat} for "
            f"{groups} groups)")
    if groups % nblk:
        pad = nblk - groups % nblk
        planes = jnp.concatenate(
            [planes, jnp.zeros((pad, REGS, SUB, LANE), planes.dtype)])
    mode = "flagstat_raw" if repeat == 1 else f"flagstat_raw@{repeat}"
    return _run_kernel(planes, nblk, mode, interpret, pre=True)


def _make_transpose_roof_kernel(nblk: int, stages, fold_rows, repeat: int):
    def kernel(x_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        acc = None
        for g in range(nblk):
            rows = [pltpu.bitcast(x_ref[g, k], _U32) for k in range(REGS)]
            # chained repetitions: each rep transposes the PREVIOUS
            # rep's output (a true data dependence — the network is
            # GF(2)-linear, so an input-tweak scheme could be hoisted
            # by a constant-folding compiler; a chain cannot)
            for _rep in range(repeat):
                rows = _transpose32(rows, stages)
            for r in fold_rows:
                acc = rows[r] if acc is None else acc ^ rows[r]
        out_ref[...] = out_ref[...] ^ acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "repeat"))
def transpose_xor_pallas(x: jax.Array, interpret: bool = False,
                         repeat: int = 1) -> jax.Array:
    """Transpose-only probe: read + bitcast + the flagstat kernel's own
    pruned masked-swap transpose, consumed by an xor fold of the
    NEEDED_ROWS planes (the cheapest use that keeps every transpose op
    live — the fold's ~23 xors/group are within noise of
    read_xor_pallas's 31, so T(this) - T(read_xor) isolates the
    transpose's device cost). Returns uint32[1]; at repeat=1 the digest
    equals the xor-fold of the same planes computed on host (tested in
    interpret mode), so the probe is itself correctness-checkable.
    ``repeat`` chains the transpose onto its own output that many times
    per group; differencing two compute-bound repeat counts isolates
    the transpose ALU time from the DMA shadow. (Reps 2+ transpose
    plane-space data — op count is identical, which is all the timing
    needs; only the pruned network's passthrough rows differ in
    content.)"""
    if x.size == 0:
        return jnp.zeros((1,), _U32)
    nblk = 8
    xg = _pack_stream(x, nblk)
    out = pl.pallas_call(
        _make_transpose_roof_kernel(nblk, B.pruned_pairs(),
                                    sorted(B.NEEDED_ROWS), repeat),
        grid=(xg.shape[0] // nblk,),
        in_specs=[
            pl.BlockSpec((nblk, REGS, SUB16, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((SUB, LANE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), _U32),
        interpret=interpret,
    )(xg)
    return jax.lax.reduce(out.ravel(), _u32(0), jax.lax.bitwise_xor, (0,))[None]


def _make_transform_roof_kernel(nblk: int, repeat: int):
    def kernel(x_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        acc = None
        for g in range(nblk):
            rows = [x_ref[g, k] for k in range(REGS)]
            for half_of in (B.first_half_row, B.second_half_row):
                p = [rows[half_of(j)] for j in range(12)]
                # chained repetitions: each rep transforms the previous
                # rep's output planes (t[:12] is shape-compatible with
                # the 12 input planes), so no rep is CSE-foldable
                for _rep in range(repeat):
                    t = B.transform_planes(p)
                    p = t[:12]
                q = t[F.FQCFAIL_OFF]
                for k in B.C_STREAMS:
                    acc = t[k] if acc is None else acc ^ t[k]
                for k in B.F_STREAMS:
                    acc = acc ^ (t[k] & q)
        out_ref[...] = out_ref[...] ^ acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "repeat"))
def transform_xor_pallas_pre(planes: jax.Array, interpret: bool = False,
                             repeat: int = 1) -> jax.Array:
    """Transform-only probe over host-pretransposed plane tiles: read +
    the full flagstat plane transform (both word halves, including the
    F-stratum AND) consumed by an xor fold of all 29 stream planes.
    ``repeat`` chains the transform onto its own output planes;
    differencing two compute-bound repeat counts isolates the
    transform's ALU time (model: ~0.94 ops/word incl. the F AND,
    docs/BENCHMARKS.md op table) from the DMA shadow. Returns
    uint32[1] (digest checked against the host fold at repeat=1)."""
    if planes.ndim != 4 or planes.shape[1:] != (REGS, SUB, LANE):
        raise ValueError(
            f"expected (G, 32, 8, 128) plane tiles, got {planes.shape}")
    if planes.shape[0] == 0:
        return jnp.zeros((1,), _U32)
    nblk = 8
    groups = planes.shape[0]
    if groups % nblk:
        pad = nblk - groups % nblk
        planes = jnp.concatenate(
            [planes, jnp.zeros((pad, REGS, SUB, LANE), planes.dtype)])
    out = pl.pallas_call(
        _make_transform_roof_kernel(nblk, repeat),
        grid=(planes.shape[0] // nblk,),
        in_specs=[
            pl.BlockSpec((nblk, REGS, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((SUB, LANE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), _U32),
        interpret=interpret,
    )(planes)
    return jax.lax.reduce(out.ravel(), _u32(0), jax.lax.bitwise_xor, (0,))[None]


# ---------------------------------------------------------------------------
# Word-space kernel variant ("flagstat_words"): no bit transpose — the
# mask-select transform runs on packed words (SWAR on two 16-bit fields
# per int32 lane) and two Harley-Seal trees (pass/fail strata) count the
# word planes directly, peeling each bit with shift+mask into packed
# 16-bit half accumulators. ~2x the VPU work of the bit-sliced kernel
# (the transform costs ~17 ops/word in word space vs ~0.7 bit-sliced)
# but a ~10x smaller trace -> fast Mosaic compiles. Reference analogue:
# FLAGSTAT_avx512 base vs the improved3/4 variants (libflagstats.h).
# ---------------------------------------------------------------------------

_ONE16 = 0x00010001


def _transform_words_packed(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Packed-SWAR word transform + QC split.

    ``x``: uint32 lanes holding two independent FLAG words. Returns
    (pass_words, fail_words) with the transformed bit layout of
    oracle.transform_words. All ops stay within 16-bit fields."""
    one = _u32(_ONE16)
    x = x & _u32(0x0FFF0FFF)              # drop input bits 12-15 per field
    sec = (x >> 8) & one
    sup = (x >> 11) & one
    pair = x & one
    inpair = pair & (sec ^ one) & (sup ^ one)
    supc = sup & (sec ^ one)
    im = inpair & ((x >> 2) & one ^ one)  # inpair & mapped
    b12 = im & (x >> 1) & one
    b13 = im & (x >> 3) & one
    b14 = im ^ b13

    pair_mask = (inpair << 8) - inpair     # 0x00FF per field when inpair
    keep = pair_mask | _u32(F.KEEP_ALWAYS * 0x00010001)
    t = (x & keep) | (supc << 11) | (b12 << 12) | (b13 << 13) | (b14 << 14)

    q = (x >> F.FQCFAIL_OFF) & one
    mq = (q << 16) - q                     # 0xFFFF per field when QC-fail
    tf = t & mq
    return t ^ tf, tf


def _make_words_kernel():
    """Pallas kernel body for the word-space variant.

    in tile: (512, 128) uint16 (65,536 words). out: (32, 8, 128) int32 of
    *packed 16-bit half* accumulators — rows 0-14 pass-stratum bits,
    16-30 fail-stratum bits; each int32 lane holds two per-field
    subcounts, split and merged in the final jnp reduction. Peels add up
    to 16 per half per HS body, so the halves stay below 2^16 for up to
    ~2048 grid steps (128M words per call) — enforced by the runner."""

    def kernel(x_ref, out_ref, vp_ref, vf_ref):
        step = pl.program_id(0)
        nsteps = pl.num_programs(0)
        one = _u32(_ONE16)  # created inside the kernel: no captured consts

        @pl.when(step == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)
            vp_ref[...] = jnp.zeros_like(vp_ref)
            vf_ref[...] = jnp.zeros_like(vf_ref)

        x32 = pltpu.bitcast(x_ref[0], _U32)         # (256, 128)
        vp = [vp_ref[i] for i in range(4)]          # v1,v2,v4,v8 (pass tree)
        vf = [vf_ref[i] for i in range(4)]

        def peel(plane, base, weight_log2):
            for k in range(15):                     # bit 15 is always 0
                sub = ((plane >> k) & one) << weight_log2
                out_ref[base + k] += sub.astype(jnp.int32)

        # transform each row once, feeding both strata trees
        tps, tfs = [], []
        for i in range(32):
            tp, tf = _transform_words_packed(x32[i * 8:(i + 1) * 8])
            tps.append(tp)
            tfs.append(tf)

        # two HS-16 bodies per tree (reference: the dual v/vU trees of
        # FLAGSTAT_avx512, libflagstats.h:1706-1754)
        for ds, v, base in ((tps, vp, 0), (tfs, vf, 16)):
            for body in range(2):
                d = ds[body * 16:(body + 1) * 16]
                v[0], twosA = _csa(v[0], d[0], d[1])
                v[0], twosB = _csa(v[0], d[2], d[3])
                v[1], foursA = _csa(v[1], twosA, twosB)
                v[0], twosA = _csa(v[0], d[4], d[5])
                v[0], twosB = _csa(v[0], d[6], d[7])
                v[1], foursB = _csa(v[1], twosA, twosB)
                v[2], eightsA = _csa(v[2], foursA, foursB)
                v[0], twosA = _csa(v[0], d[8], d[9])
                v[0], twosB = _csa(v[0], d[10], d[11])
                v[1], foursA = _csa(v[1], twosA, twosB)
                v[0], twosA = _csa(v[0], d[12], d[13])
                v[0], twosB = _csa(v[0], d[14], d[15])
                v[1], foursB = _csa(v[1], twosA, twosB)
                v[2], eightsB = _csa(v[2], foursA, foursB)
                v[3], sixteens = _csa(v[3], eightsA, eightsB)
                peel(sixteens, base, 4)

        for i in range(4):
            vp_ref[i] = vp[i]
            vf_ref[i] = vf[i]

        @pl.when(step == nsteps - 1)
        def _flush():
            for i in range(4):
                peel(vp_ref[i], 0, i)
                peel(vf_ref[i], 16, i)

    return kernel


WORDS_STEP = 512 * 128                    # uint16 words per grid step
_WORDS_MAX_STEPS = 1536                   # packed-half overflow headroom


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_words_kernel(xt: jax.Array, interpret: bool) -> tuple[jax.Array, jax.Array]:
    """xt: (steps, 512, 128) uint16 -> (P[k], F[k]) each (16,) int32."""
    steps = xt.shape[0]
    assert steps <= _WORDS_MAX_STEPS, "words-kernel call too large; chunk it"
    out = pl.pallas_call(
        _make_words_kernel(),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, 512, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((32, SUB, LANE), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, SUB, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((4, SUB, LANE), jnp.uint32) for _ in range(2)],
        interpret=interpret,
    )(xt)
    u = jax.lax.bitcast_convert_type(out, jnp.uint32)
    low = u & jnp.uint32(0xFFFF)
    high = u >> 16
    sums = jnp.sum((low + high).astype(jnp.int32), axis=(1, 2))  # (32,)
    p = jnp.concatenate([sums[0:15], jnp.zeros(1, jnp.int32)])
    f = jnp.concatenate([sums[16:31], jnp.zeros(1, jnp.int32)])
    return p + f, f


def stream_sums_words(x: jax.Array, interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """(C[k], F[k]) stream sums via the word-space kernel; pads to the
    grid step and chunks calls at the packed-half accumulator capacity
    (~100M words per pallas_call)."""
    padded = ((x.size + WORDS_STEP - 1) // WORDS_STEP) * WORDS_STEP
    if padded != x.size:
        x = jnp.pad(x.ravel(), (0, padded - x.size))
    xt = x.reshape(-1, 512, LANE)
    total = jnp.zeros(F.N_BITS, jnp.int32)
    fail = jnp.zeros(F.N_BITS, jnp.int32)
    for start in range(0, xt.shape[0], _WORDS_MAX_STEPS):
        t, f = _run_words_kernel(xt[start:start + _WORDS_MAX_STEPS], interpret)
        total = total + t
        fail = fail + f
    return total, fail


def flagstat_pallas_words(x: jax.Array, n=None, interpret: bool = False) -> jax.Array:
    """Word-space Pallas flagstat (small-trace variant; reference
    analogue: the base FLAGSTAT_avx512 dual-tree kernel)."""
    if n is None:
        n = x.size
    total, fail = stream_sums_words(x, interpret)
    return assemble_counters(total, fail, n)


# ---------------------------------------------------------------------------
# Plain-jnp twin of the bit-sliced kernel body. Runs the *identical*
# traced code (_transpose32, transform, CSA, peel) outside pallas_call so
# the whole algorithm is differentially testable on CPU, where
# interpret-mode compilation of the full grid is impractically slow. Only
# the Pallas plumbing (refs, grid, scratch carry) is left to on-TPU tests.
# ---------------------------------------------------------------------------

def _stream_sums_jnp_body(xg: jax.Array, mode: str, pre: bool = False,
                          two_level: bool = False) -> jax.Array:
    if mode == "flagstat":
        stages = B.pruned_pairs()
        make_streams = _stream_inputs_flagstat
        n_streams = B.N_STREAMS
    elif mode == "flagstat_report":
        stages = B.pruned_pairs(B.REPORT_NEEDED_ROWS)
        make_streams = functools.partial(_stream_inputs_flagstat, report=True)
        n_streams = B.N_REPORT_STREAMS
    else:
        stages = {j: B.swap_pairs(j) for j, _ in B.TRANSPOSE_STAGES}
        make_streams = _stream_inputs_pospopcnt
        n_streams = 16

    groups = xg.shape[0]
    assert groups % 8 == 0
    acc = [jnp.zeros((SUB, LANE), jnp.int32) for _ in range(n_streams)]
    v1 = [jnp.zeros((SUB, LANE), _U32) for _ in range(n_streams)]
    v2, v4, v8, v16, v32 = (list(v) for v in (v1, v1, v1, v1, v1))
    twosA = [None] * n_streams
    foursA = [None] * n_streams
    eightsA = [None] * n_streams
    s16p = [None] * n_streams     # pending sixteens (level-16 tree)
    t32p = [None] * n_streams     # pending 32s (level-32 tree)
    for g in range(groups):
        if pre:
            rows = [xg[g, k] for k in range(REGS)]
        else:
            # jnp-level equivalent of the kernel's sublane bitcast: pair
            # adjacent uint16 sublanes into uint32 registers (the exact
            # pairing is count-neutral)
            regs = [
                xg[g, k, 0::2, :].astype(_U32)
                | (xg[g, k, 1::2, :].astype(_U32) << 16)
                for k in range(REGS)
            ]
            rows = _transpose32(regs, stages)
        body = g // 8   # == grid-step index of the nblk=8 kernel
        for s, (d0, d1) in enumerate(make_streams(rows)):
            v1[s], twos = _csa(v1[s], d0, d1)
            if g % 2 == 0:
                twosA[s] = twos
                continue
            v2[s], fours = _csa(v2[s], twosA[s], twos)
            if g % 4 == 1:
                foursA[s] = fours
                continue
            v4[s], eights = _csa(v4[s], foursA[s], fours)
            if g % 8 == 3:
                eightsA[s] = eights
                continue
            v8[s], sixteens = _csa(v8[s], eightsA[s], eights)
            if not two_level:
                # default schedule (matches the kernel's round-3
                # default): peel each sixteens plane immediately
                acc[s] = acc[s] + (_popcount32(sixteens) << 4).astype(
                    jnp.int32)
                continue
            # second-level Harley-Seal over sixteens planes (identical
            # state machine to the two_level kernel, keyed on body index)
            if body % 2 == 0:
                s16p[s] = sixteens
                continue
            v16[s], t32 = _csa(v16[s], s16p[s], sixteens)
            if body % 4 == 1:
                t32p[s] = t32
                continue
            v32[s], t64 = _csa(v32[s], t32p[s], t32)
            acc[s] = acc[s] + (_popcount32(t64) << 6).astype(jnp.int32)
    nbodies = groups // 8
    for s in range(n_streams):
        res = (
            _popcount32(v1[s])
            + (_popcount32(v2[s]) << 1)
            + (_popcount32(v4[s]) << 2)
            + (_popcount32(v8[s]) << 3)
        )
        if two_level:
            res = res + (_popcount32(v16[s]) << 4) + (
                _popcount32(v32[s]) << 5)
            if nbodies % 2 == 1:
                res = res + (_popcount32(s16p[s]) << 4)
            if nbodies % 4 in (2, 3):
                res = res + (_popcount32(t32p[s]) << 5)
        acc[s] = acc[s] + res.astype(jnp.int32)
    return jnp.stack([a.sum() for a in acc])


# ---------------------------------------------------------------------------
# Scan-based bit-sliced formulation in PLAIN XLA (no pallas_call): the
# same transpose + transform + Harley-Seal body as the Pallas kernel,
# wrapped in a lax.scan over 8-group bodies so the HLO stays one traced
# body regardless of stream length (the jnp twin above unrolls every
# group — fine for tests, catastrophic to compile at scale).
#
# KEPT AS A BENCHMARKED NEGATIVE RESULT (round 3; same class as
# pospopcnt_u16_matmul): measured 2026-08-19 at 64Mi words, this runs at
# 5.0 GB/s on TPU vs 65.7 for the packed-SWAR xla tier and 748 for the
# Pallas kernel — without Pallas's explicit VMEM residency, the scan
# carry (4 CSA levels x 29 streams of (8,128) planes) round-trips HBM
# every body and XLA materializes the intermediates. On the CPU backend
# it is likewise ~4x slower than packed-SWAR with minutes-long compiles.
# This is direct evidence for WHY the hot path is a Pallas kernel rather
# than "let XLA fuse it": the algorithm is identical, the residency is
# not. Not registered as a dispatch tier; exercised by a TPU-gated test.
# ---------------------------------------------------------------------------


def _scan_mode_setup(mode: str):
    if mode == "flagstat":
        return (B.pruned_pairs(), _stream_inputs_flagstat, B.N_STREAMS)
    if mode == "flagstat_report":
        return (B.pruned_pairs(B.REPORT_NEEDED_ROWS),
                functools.partial(_stream_inputs_flagstat, report=True),
                B.N_REPORT_STREAMS)
    return ({j: B.swap_pairs(j) for j, _ in B.TRANSPOSE_STAGES},
            _stream_inputs_pospopcnt, 16)


def _stream_sums_scan_body(mode: str):
    stages, make_streams, n_streams = _scan_mode_setup(mode)

    def body(carry, x8):
        vs, acc = carry                       # vs: (4, S, 8, 128) uint32
        v = [[vs[lvl, s] for s in range(n_streams)] for lvl in range(4)]
        v1, v2, v4, v8 = v
        twosA = [None] * n_streams
        foursA = [None] * n_streams
        eightsA = [None] * n_streams
        peel = [None] * n_streams
        for g in range(8):
            regs = [
                x8[g, k, 0::2, :].astype(_U32)
                | (x8[g, k, 1::2, :].astype(_U32) << 16)
                for k in range(REGS)
            ]
            rows = _transpose32(regs, stages)
            for s, (d0, d1) in enumerate(make_streams(rows)):
                v1[s], twos = _csa(v1[s], d0, d1)
                if g % 2 == 0:
                    twosA[s] = twos
                    continue
                v2[s], fours = _csa(v2[s], twosA[s], twos)
                if g % 4 == 1:
                    foursA[s] = fours
                    continue
                v4[s], eights = _csa(v4[s], foursA[s], fours)
                if g % 8 == 3:
                    eightsA[s] = eights
                    continue
                v8[s], sixteens = _csa(v8[s], eightsA[s], eights)
                peel[s] = (_popcount32(sixteens) << 4).astype(jnp.int32)
        acc = acc + jnp.stack(peel)
        vs = jnp.stack([jnp.stack(lvl) for lvl in (v1, v2, v4, v8)])
        return (vs, acc), None

    return body, n_streams


@functools.partial(jax.jit, static_argnames=("mode",))
def _stream_sums_scan(xg: jax.Array, mode: str) -> jax.Array:
    """xg: (groups, 32, 16, 128) uint16, groups % 8 == 0 -> (S,) int32."""
    body, n_streams = _stream_sums_scan_body(mode)
    xb = xg.reshape(-1, 8, REGS, SUB16, LANE)
    vs0 = jnp.zeros((4, n_streams, SUB, LANE), _U32)
    acc0 = jnp.zeros((n_streams, SUB, LANE), jnp.int32)
    (vs, acc), _ = jax.lax.scan(body, (vs0, acc0), xb)
    for lvl in range(4):
        acc = acc + (_popcount32(vs[lvl]) << lvl).astype(jnp.int32)
    return jnp.sum(acc, axis=(1, 2))


def stream_sums_scan(x: jax.Array, report: bool = False
                     ) -> tuple[jax.Array, jax.Array]:
    """(C[k], F[k]) stream sums via the scan-based bit-sliced XLA
    formulation (portable: no Pallas). Pads to whole 8-group bodies."""
    if x.size == 0:
        return jnp.zeros(F.N_BITS, jnp.int32), jnp.zeros(F.N_BITS, jnp.int32)
    mode = "flagstat_report" if report else "flagstat"
    sums = _stream_sums_scan(_pack_stream(x, 8), mode)
    return _sums_to_streams(sums, report)


def flagstat_xla_scan(x: jax.Array, n=None, report: bool = False) -> jax.Array:
    """Flagstat via the scan-based bit-sliced XLA tier -> (32,) int32."""
    if n is None:
        n = x.size
    total, fail = stream_sums_scan(x, report=report)
    return assemble_counters(total, fail, n)


def flagstat_bitsliced_jnp(x: jax.Array, n=None, nblk: int = 8,
                           report: bool = False,
                           two_level: bool = False) -> jax.Array:
    """CPU-testable twin of flagstat_pallas (same math, no pallas_call)."""
    if n is None:
        n = x.size
    mode = "flagstat_report" if report else "flagstat"
    sums = _stream_sums_jnp_body(_pack_stream(x, nblk), mode,
                                 two_level=two_level)
    total, fail = _sums_to_streams(sums, report)
    return assemble_counters(total, fail, n)


def pospopcnt_bitsliced_jnp(x: jax.Array, nblk: int = 8) -> jax.Array:
    """CPU-testable twin of pospopcnt_u16_pallas."""
    return _stream_sums_jnp_body(_pack_stream(x, nblk), "pospopcnt")
