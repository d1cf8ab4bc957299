"""SAM-text ingest and synthetic generation.

TPU-framework equivalents of the reference's tiny drivers:
* utility: text FLAG integers -> little-endian uint16 binary
  (reference: benchmark/utility.cpp:10-20; usage
  `samtools view | cut -f 2 | utility > flags.bin`, README.md:56)
* generate: uniform-random FLAG words in [0, 4096)
  (reference: benchmark/generate.cpp:7-18)
"""
from __future__ import annotations

import sys

import numpy as np


def text_to_binary(text_in, binary_out, chunk_chars: int = 1 << 24) -> int:
    """Parse whitespace-separated FLAG integers -> uint16 binary stream.

    Reads in bounded chunks: the reference path is GB-scale
    (``samtools view | cut -f2 | utility``, README.md:56), so
    materializing the whole stream as Python strings would cost tens of
    GB at NA12878 scale. A token split across a chunk boundary is
    carried into the next chunk. Returns the number of words written."""
    total = 0
    pending = ""

    def flush(text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        vals = np.array(toks, dtype=np.uint16)
        binary_out.write(vals.astype("<u2").tobytes())
        return int(vals.size)

    while True:
        data = text_in.read(chunk_chars)
        if isinstance(data, bytes):
            data = data.decode()
        if not data:
            break
        data = pending + data
        if data[-1].isspace():
            pending = ""
        else:
            # hold the possibly-incomplete trailing token
            cut = max(data.rfind(c) for c in " \t\r\n")
            if cut == -1:
                pending = data
                continue
            pending = data[cut + 1:]
            data = data[:cut + 1]
        total += flush(data)
    total += flush(pending)
    return total


def generate_text(n: int, out=None, seed: int | None = None,
                  full_range: bool = False) -> None:
    """n uniform-random FLAG values as text lines — [0, 4096) by default
    (byte-compatible with the reference generator's output shape),
    [0, 65536) with ``full_range``."""
    out = out or sys.stdout
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 0x10000 if full_range else 4096, size=n,
                        dtype=np.uint16)
    out.write("\n".join(map(str, vals.tolist())))
    if n:
        out.write("\n")


def generate_binary(n: int, path, seed: int | None = None,
                    full_range: bool = False) -> np.ndarray:
    """Write n synthetic FLAG words; the draw recipe is
    oracle.generate_flags (one definition — file-based and in-memory
    test paths must stay bit-identical for the same seed)."""
    from ..oracle import generate_flags

    vals = generate_flags(n, seed=seed, full_range=full_range)
    with open(path, "wb") as f:
        f.write(vals.astype("<u2").tobytes())
    return vals


def read_binary(path, mmap: bool = True) -> np.ndarray:
    """Raw little-endian uint16 FLAG column (the reference's `-R` input).

    Memory-mapped by default (read-only view): kernels read straight
    from the page cache with no GB-scale buffer allocation — this host
    shows episodic 65 µs/page first-touch storms on fresh allocations,
    and the copy is pure waste for a read-once count. Pass
    ``mmap=False`` for an owned, writable array."""
    if mmap:
        try:
            return np.memmap(path, dtype="<u2", mode="r")
        except (OSError, ValueError):  # e.g. empty file -> owned path
            pass
    return np.fromfile(path, dtype="<u2").astype(np.uint16, copy=False)
