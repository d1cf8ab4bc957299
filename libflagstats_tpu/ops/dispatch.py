"""Size-tiered dispatch: the one-call entry points.

TPU equivalent of FLAGSTATS_get_function / FLAGSTATS_u16
(reference: libflagstats.h:2977-3070) and of the size-tiered
STORM_pospopcnt_u16 (libalgebra.h:3497-3551): the CPUID/XCR0 probe
becomes a backend capability check, and the ISA tiers become (measured
crossovers — see the citation blocks at DEVICE_MIN_TPU and
NATIVE_DEVICE_MIN_TPU below)

  native lib present -> host AVX-512/AVX2 kernel below the (much
                        higher) device crossover
  n <  device_min()  -> host NumPy oracle (one dispatch RTT costs more)
  else, TPU          -> bit-sliced Pallas kernel (fastest at every
                        legal size; device_min == pallas_min there)
  else               -> plain-XLA fused formulation
"""
from __future__ import annotations

import functools

import jax
import numpy as np

from .. import flags as F
from ..oracle import flagstat_numpy
from . import native_host, pallas_kernels
from .xla_ops import flagstat_xla, pospopcnt_u16_matmul, pospopcnt_u16_xla

#: implementation registry (reference counterpart: the kernel tables in
#: benchmark/inmemory.cpp:61-104 / instrumented_benchmark.cpp)
FLAGSTAT_IMPLS = {
    "numpy": "host vectorized mask-select oracle (FLAGSTAT_scalar tier)",
    "native": "host AVX2 Harley-Seal CSA kernel (C++, the FLAGSTATS_u16 "
              "tier itself; requires the native lib)",
    "xla": "fused jnp transform + positional reduce (SSE4/AVX2 tier)",
    "pallas": "bit-sliced transpose + Harley-Seal CSA VMEM kernel (AVX512 tier)",
    "pallas_words": "word-space packed-SWAR dual-tree kernel (AVX512-base analogue)",
    "pallas_report": "21-stream bit-sliced kernel, report counters only "
                     "(improved3/4 analogue; masked-positional counters are 0)",
    "pallas_pre": "host AVX2 bit transpose + transpose-free kernel "
                  "(fully memory-bound on device; costs host cycles)",
}
POSPOPCNT_IMPLS = {
    "numpy": "host per-bit count",
    "native": "host AVX2 Harley-Seal CSA kernel (C++)",
    "xla": "fused jnp shift-mask-reduce",
    "xla_matmul": "MXU int8 ones-matmul reduction",
    "pallas": "bit-sliced transpose + Harley-Seal CSA VMEM kernel",
}

# Measured dispatch crossovers — the constants below are this
# environment's DEFAULTS; a deployment re-derives them with
# `python tools/crossover_sweep.py --write` (plus `--pospopcnt --write`),
# which records the measurements in calibration.json with provenance,
# and _apply_calibration() below overrides the constants at import
# (reference analogue: runtime-probed cached dispatch,
# libflagstats.h:2977-3022). Measured here 2026-08-17;
# reference analogue: the measured size tiers of STORM_pospopcnt_u16,
# libalgebra.h:3519-3543, and FLAGSTATS_u16, libflagstats.h:2999-3021).
#
# TPU (via this environment's tunnel, ~60-80 ms dispatch RTT — wall
# clock of ONE call, which is what dispatch decides over):
#   words    numpy_ms  xla_wall  pallas_wall   [pallas kern @64Mi 0.14ms]
#   262144     32.9      82.1       -
#   1048576   297.4      71.6      64.1   <- device wins from here
# Dispatch-free device kernel time: pallas beats the fused-XLA tier at
# every size where it is legal (>= 1 grid step; 3.6-14x at 1-64Mi), so
# on TPU the auto path goes straight numpy -> pallas. On a co-located
# TPU (no tunnel) the crossover would sit far lower; re-run the sweep
# tool to re-derive.
#
# CPU backend (same host, forced-cpu jit):
#   words    numpy_ms  xla_wall
#   16384      0.56      0.59
#   32768      1.26      0.61   <- XLA wins from here
DEVICE_MIN_TPU = 1 << 20     # measured single-call crossover via tunnel
XLA_MIN_CPU = 1 << 15        # measured numpy -> CPU-XLA crossover
# pospopcnt's host path skips the mask-select transform, so it is far
# cheaper than flagstat's and its device-wins threshold sits HIGHER.
# Measured (tools/crossover_sweep.py --pospopcnt, 2026-08-17):
#   TPU via tunnel: numpy 17.8ms @1Mi / 61.5ms @4Mi vs ~62ms device
#     wall -> crossover ~4Mi
#   CPU backend: numpy 0.53ms @64Ki (wins) vs XLA wall 1.31ms @256Ki
#     (loses) -> crossover ~128Ki
POSPOPCNT_DEVICE_MIN_TPU = 1 << 22
POSPOPCNT_XLA_MIN_CPU = 1 << 17
# Native host-kernel tiers (io/native/flagstats_host.cpp, AVX2
# Harley-Seal). Measured on this 4-core host (2026-08-18): flagstat
# 1.08 Gwords/s 1T / 2.31 Gwords/s 4T; pospopcnt 3.7 / 8.2 Gwords/s —
# i.e. 64Mi words in 29 ms (flagstat) / 8 ms (pospopcnt) vs the
# measured ~62-70 ms single-call device WALL through this tunnel
# (table above). Round-2 extrapolated a FLAT device wall and set the
# crossover at 2^28; a round-3 direct measurement falsified that:
# an 824M-word single call took ~60 s on the device path (the tunnel's
# H2D bandwidth binds, ~26 MB/s of uint16 in that window) vs 0.35 s
# native — through a remote tunnel the host tier wins at EVERY size
# (and, unlike the device paths, counts in uint64 with no cap), so the
# crossover is effectively disabled here. On a co-located TPU run
# `python tools/crossover_sweep.py --write` once: it measures the real
# crossover (there the device should win from ~1Mi words) and writes it
# to calibration.json, which overrides these constants at import — no
# source edit needed.
NATIVE_DEVICE_MIN_TPU = 1 << 62
POSPOPCNT_NATIVE_DEVICE_MIN_TPU = 1 << 62


def _apply_calibration() -> list[str]:
    """Override the measured-crossover constants from calibration.json
    (written by tools/crossover_sweep.py --write; schema + rationale in
    calibration.py). Returns the names applied, for logging/tests.
    Runs at import; call again after editing the file at runtime."""
    from ..calibration import load_thresholds

    applied = []
    for name, value in load_thresholds().items():
        globals()[name] = value
        applied.append(name)
    return applied


_CALIBRATED = _apply_calibration()


def pallas_min(nblk: int = 8) -> int:
    """Minimum words for the bit-sliced Pallas tier: CONFIG.pallas_min,
    floored at one legal grid step (nblk * GROUP_WORDS). Measured:
    pallas is the fastest device tier from its very first legal size;
    the measured default (2 * 8 * GROUP_WORDS = 1,048,576) is
    CONFIG.pallas_min's default."""
    from ..config import CONFIG

    return max(CONFIG.pallas_min, nblk * pallas_kernels.GROUP_WORDS)


def xla_min() -> int:
    """Shape-bucketing floor for device calls (bounds the compile set;
    not a performance crossover). CONFIG.xla_min."""
    from ..config import CONFIG

    return CONFIG.xla_min


def device_min() -> int:
    """Single-call words threshold below which the host oracle wins
    wall-clock (includes the dispatch round trip)."""
    return DEVICE_MIN_TPU if backend() == "tpu" else XLA_MIN_CPU


@functools.cache
def backend() -> str:
    from ..config import enable_compilation_cache

    enable_compilation_cache()
    return jax.default_backend()


@functools.cache
def _jit_flagstat_xla():
    # n is a TRACED scalar: it only feeds the derived pass-total
    # arithmetic (assemble_counters), so two streams sharing a padded
    # bucket but differing in true length share ONE executable — a
    # static n would recompile per distinct length (minutes each on the
    # remote compile service) and defeat _bucket_pad's purpose
    return jax.jit(lambda x, n: flagstat_xla(x, n))


#: above this size the power-of-two bucket ladder switches to a 1.25x
#: geometric ladder: pow2 bucketing on an 824Mi-word call would pad to
#: 1Gi (+~400 MB of zeros through H2D), while below 64Mi the absolute
#: waste is small and pow2 keeps the compile set minimal (round-2
#: verdict weak #3; reference tiering analogue: libalgebra.h:3519-3543)
BUCKET_LADDER_MIN = 64 << 20
BUCKET_LADDER_RATIO = 1.25


def bucket_target(n: int, minimum: int, granule: int = 8) -> int:
    """Padded length for an n-word device call: next power of two
    (>= minimum) up to BUCKET_LADDER_MIN, then the next rung of a
    deterministic 1.25x geometric ladder — max padding overhead ~25% at
    any size — rounded up to a multiple of ``granule`` (the kernel's
    grid-step quantum, so the kernel never re-pads internally)."""
    target = max(minimum, 1 << (max(n - 1, 0)).bit_length())
    if n > BUCKET_LADDER_MIN:
        target = BUCKET_LADDER_MIN
        while target < n:
            target = int(target * BUCKET_LADDER_RATIO)
    return -(-target // granule) * granule


def _bucket_pad(arr: np.ndarray, minimum: int, granule: int = 8) -> np.ndarray:
    """Zero-pad to the bucket_target length.

    Zero words are count-neutral (the true length flows separately into
    the derived pass-total), and bucketing bounds the set of shapes the
    backend ever compiles — compiles are minutes on this stack."""
    target = bucket_target(arr.size, minimum, granule)
    if target == arr.size:
        return arr
    return np.concatenate([arr, np.zeros(target - arr.size, dtype=arr.dtype)])


def auto_impl(n_len: int) -> str:
    """The measured-fastest tier for a single call of ``n_len`` words
    (the size-tier selection of FLAGSTATS_u16, libflagstats.h:3047-3069,
    with the crossovers measured above)."""
    if native_host.available():
        # the native host tier replaces numpy and pushes the device
        # crossover up ~256x (NATIVE_DEVICE_MIN_TPU citation above);
        # on the CPU backend it beats the XLA tier at every size.
        # Size checked FIRST: below the crossover the backend is
        # irrelevant, and probing it initializes JAX (~5 s through this
        # environment's tunnel) — a pure-host call must not pay that
        if n_len < NATIVE_DEVICE_MIN_TPU or backend() != "tpu":
            return "native"
    elif n_len < device_min():
        return "numpy"
    if n_len >= pallas_min() and backend() == "tpu":
        return "pallas"
    return "xla"


def pospopcnt_auto_impl(n_len: int) -> str:
    """Measured-fastest tier for one pospopcnt_u16 call of ``n_len``
    words (the size-tier selection of STORM_pospopcnt_u16,
    libalgebra.h:3519-3543, re-measured for this stack — see the
    POSPOPCNT_* threshold citations above)."""
    if native_host.available():
        # size first: see auto_impl (a host-sized call must not pay
        # backend init)
        if n_len < POSPOPCNT_NATIVE_DEVICE_MIN_TPU or backend() != "tpu":
            return "native"
    if backend() == "tpu":
        # two tiers, not three: the device crossover (4Mi) sits above
        # any pallas_min, and the pallas path bucket-pads to legality
        # anyway, so an xla middle tier would be dead code here
        return "numpy" if n_len < POSPOPCNT_DEVICE_MIN_TPU else "pallas"
    return "numpy" if n_len < POSPOPCNT_XLA_MIN_CPU else "xla"


def get_function(n_len: int, impl: str | None = None):
    """Return a callable (np.uint16 array) -> (32,) np.ndarray of counts
    for streams of length ``n_len`` (reference: FLAGSTATS_get_function,
    libflagstats.h:2977)."""
    if impl is None:
        impl = auto_impl(n_len)

    if impl == "numpy":
        return lambda arr: flagstat_numpy(arr)
    if impl == "native":
        return lambda arr: native_host.flagstat_native(arr)
    if impl == "xla":
        fn = _jit_flagstat_xla()
        return lambda arr: np.asarray(
            fn(jax.numpy.asarray(_bucket_pad(arr, xla_min())),
               jax.numpy.int32(arr.size))
        )
    if impl == "pallas":
        # full-parity mode runs the measured-best grid depth
        # (CONFIG.nblk_full; A/B citation at Config.nblk)
        from ..config import nblk_for

        nblk = nblk_for(report=False)
        granule = nblk * pallas_kernels.GROUP_WORDS
        interpret = backend() != "tpu"
        return lambda arr: np.asarray(
            pallas_kernels.flagstat_pallas(
                jax.numpy.asarray(_bucket_pad(arr, pallas_min(nblk), granule)),
                n=int(arr.size), interpret=interpret, nblk=nblk,
            )
        )
    if impl == "pallas_report":
        from ..config import nblk_for

        nblk = nblk_for(report=True)
        granule = nblk * pallas_kernels.GROUP_WORDS
        interpret = backend() != "tpu"
        return lambda arr: np.asarray(
            pallas_kernels.flagstat_pallas(
                jax.numpy.asarray(_bucket_pad(arr, pallas_min(nblk), granule)),
                n=int(arr.size), interpret=interpret, report=True, nblk=nblk,
            )
        )
    if impl == "pallas_pre":
        from .bitslice import pretranspose_host_packed

        interpret = backend() != "tpu"
        rows = pallas_kernels.packed_rows_for(report=False)

        def run_pre(arr):
            # packed tiles (round 5): 25% less device HBM traffic
            planes = pretranspose_host_packed(
                _bucket_pad(arr, pallas_min()), rows)
            return np.asarray(
                pallas_kernels.flagstat_pallas_pre(
                    jax.numpy.asarray(planes), n=int(arr.size),
                    interpret=interpret, packed=True,
                )
            )

        return run_pre
    if impl == "pallas_words":
        interpret = backend() != "tpu"
        return lambda arr: np.asarray(
            pallas_kernels.flagstat_pallas_words(
                jax.numpy.asarray(_bucket_pad(arr, xla_min())),
                n=int(arr.size), interpret=interpret,
            )
        )
    raise ValueError(f"unknown impl {impl!r}")


#: the derived pass-total and on-device accumulators are int32 by design
#: (the psum payload stays 128 bytes), capping one device-path
#: accumulation at 2^31-1 words. The entry points CHUNK past it — the
#: block-accumulative contract (reference: the per-block accumulate loop,
#: benchmark/flagstats.cpp:311-332) makes splitting into accumulating
#: sub-calls exact: counter 9 is derived per chunk as
#: chunk_len - chunk_fail, and those sum to total_len - total_fail.
#: Module-level (not a Config field) so tests can monkeypatch it tiny and
#: exercise the chunking without 2^31-word inputs. The host tiers
#: (numpy, native) count in uint64 and never chunk.
DEVICE_WORD_CAP = 0x7FFFFFFF


def _device_chunks(arr: np.ndarray, impl: str, granule: int = 8):
    """Yield granule-aligned views of ``arr``, each within the device
    cap (one view = the whole array whenever it fits or the impl is a
    host tier)."""
    if impl in ("numpy", "native") or arr.size <= DEVICE_WORD_CAP:
        yield arr
        return
    step = max(DEVICE_WORD_CAP // granule, 1) * granule
    for start in range(0, arr.size, step):
        yield arr[start:start + step]


def _impl_granule(impl: str) -> int:
    """The chunk-boundary quantum per impl (full grid steps keep every
    chunk but the tail on one compiled shape)."""
    if impl.startswith("pallas"):
        from ..config import nblk_for

        return nblk_for(report=impl == "pallas_report") * \
            pallas_kernels.GROUP_WORDS
    return 8


def _validate_u16(array) -> np.ndarray:
    arr = np.asarray(array)
    if arr.dtype != np.uint16:
        # allow lossless integer input; reject anything that would be a
        # silent value-mangling cast
        if arr.dtype.kind not in "ui" or (arr.size and
                                          (arr.min() < 0 or arr.max() > 0xFFFF)):
            raise ValueError(
                f"FLAG array must be uint16 (or losslessly convertible), "
                f"got {arr.dtype}"
            )
        arr = arr.astype(np.uint16)
    return np.ascontiguousarray(arr).ravel()


def flagstats_u16(array, out=None, impl: str | None = None) -> np.ndarray:
    """Count flagstat statistics of a uint16 FLAG array.

    Accumulates into ``out`` when given (the reference's streaming
    contract: one counter vector across many blocks,
    reference: FLAGSTATS_u16, libflagstats.h:3025 and
    benchmark/flagstats.cpp:304-329). Streams past the int32 device cap
    (DEVICE_WORD_CAP) are split into accumulating sub-calls
    automatically — bit-exact by the same contract."""
    arr = _validate_u16(array)
    if impl is None:
        impl = auto_impl(arr.size)
    acc = np.zeros(F.N_COUNTERS, dtype=np.uint64) if out is None else out
    for chunk in _device_chunks(arr, impl, _impl_granule(impl)):
        acc += np.asarray(get_function(chunk.size, impl)(chunk),
                          dtype=np.uint64)
    return acc


def pospopcnt_u16(array, impl: str | None = None) -> np.ndarray:
    """Positional popcount of a uint16 array -> (16,) counts
    (reference: STORM_pospopcnt_u16, libalgebra.h:3497).

    Uses its own measured size tiers (``POSPOPCNT_*`` above), not
    flagstat's: the host pospopcnt skips the mask-select transform and
    is ~17x cheaper than the flagstat oracle, so numpy stays the
    fastest single-call tier up to ~4Mi words via the tunnel (~128Ki
    on the CPU backend). Measured by
    ``tools/crossover_sweep.py --pospopcnt``; table in
    docs/BENCHMARKS.md."""
    arr = _validate_u16(array)
    if impl is None:
        impl = pospopcnt_auto_impl(arr.size)
    if impl not in ("numpy", "native", "xla", "xla_matmul", "pallas"):
        raise ValueError(f"unknown impl {impl!r}")
    # past the int32 device cap, accumulate sub-calls (raw positional
    # counts sum exactly; same contract as flagstats_u16)
    acc = np.zeros(F.N_BITS, dtype=np.uint64)
    granule = (8 * pallas_kernels.GROUP_WORDS if impl == "pallas" else 8)
    for chunk in _device_chunks(arr, impl, granule):
        acc += np.asarray(_pospopcnt_once(chunk, impl), dtype=np.uint64)
    return acc


def _pospopcnt_once(arr: np.ndarray, impl: str) -> np.ndarray:
    if impl == "numpy":
        x = arr.astype(np.uint32)
        return np.array(
            [int(np.count_nonzero((x >> k) & 1)) for k in range(F.N_BITS)],
            dtype=np.uint64,
        )
    if impl == "native":
        return native_host.pospopcnt_native(arr)
    if impl == "xla":
        return np.asarray(
            _jit_pospopcnt_xla()(jax.numpy.asarray(_bucket_pad(arr, xla_min())))
        )
    if impl == "xla_matmul":
        return np.asarray(
            _jit_pospopcnt_matmul()(jax.numpy.asarray(_bucket_pad(arr, xla_min())))
        )
    interpret = backend() != "tpu"
    return np.asarray(
        pallas_kernels.pospopcnt_u16_pallas(
            jax.numpy.asarray(_bucket_pad(arr, pallas_min())),
            interpret=interpret
        )
    )


@functools.cache
def _jit_pospopcnt_xla():
    return jax.jit(pospopcnt_u16_xla)


@functools.cache
def _jit_pospopcnt_matmul():
    return jax.jit(pospopcnt_u16_matmul)
