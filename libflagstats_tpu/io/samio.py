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


def text_to_binary(text_in, binary_out) -> int:
    """Parse whitespace-separated FLAG integers -> uint16 binary stream.

    Returns the number of words written."""
    data = text_in.read()
    if isinstance(data, bytes):
        data = data.decode()
    vals = np.array(data.split(), dtype=np.uint16) if data.split() else \
        np.zeros(0, dtype=np.uint16)
    binary_out.write(vals.astype("<u2").tobytes())
    return int(vals.size)


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
    rng = np.random.default_rng(seed)
    hi = 0x10000 if full_range else 0x1000
    vals = rng.integers(0, hi, size=n, dtype=np.uint16)
    with open(path, "wb") as f:
        f.write(vals.astype("<u2").tobytes())
    return vals


def read_binary(path) -> np.ndarray:
    """Raw little-endian uint16 FLAG column (the reference's `-R` input)."""
    return np.fromfile(path, dtype="<u2").astype(np.uint16, copy=False)
