"""CRAM 3.0 subset ingest (round 5, beyond reference — the reference
has no container support; samtools flagstat on CRAM is its published
4m50s comparison, /root/reference/README.md:34).

Same conformance pattern as the BAM/SAM suites: the spec-conform
writer is the oracle, hostile mutations of its output drive the
reader's error paths (every data byte is CRC-covered; the reader must
error or return the exact truth, never miscount or crash).
"""
import numpy as np
import pytest

import libflagstats_tpu as lfs
from libflagstats_tpu.io import cramio, sniff_format
from libflagstats_tpu.oracle import flagstat_numpy, generate_flags

from conftest import assert_counters_equal


def test_itf8_roundtrip_edges():
    vals = np.array([0, 1, 127, 128, 0x3FFF, 0x4000, 0x1FFFFF, 0x200000,
                     0xFFFFFFF, 0x10000000, 0x7FFFFFFF, -1, -(2 ** 31)],
                    dtype=np.int64)
    enc = b"".join(cramio.itf8_encode(int(v)) for v in vals)
    assert enc == cramio.itf8_encode_stream(vals)  # vectorized == scalar
    dec = cramio.itf8_decode_stream(enc, len(vals))
    np.testing.assert_array_equal(dec.astype(np.int64),
                                  vals.astype(np.int32).astype(np.int64))


def test_itf8_python_fallback_matches_native(monkeypatch):
    from libflagstats_tpu.io import native_lib

    vals = np.array([5, 200, 70000, 2 ** 24, -3], dtype=np.int64)
    enc = cramio.itf8_encode_stream(vals)
    native = cramio.itf8_decode_stream(enc, len(vals))
    monkeypatch.setattr(native_lib, "load", lambda: None)
    pure = cramio.itf8_decode_stream(enc, len(vals))
    np.testing.assert_array_equal(native, pure)


def test_ltf8_roundtrip():
    for v in (0, 1, 127, 128, 1 << 13, 1 << 20, 1 << 34, 1 << 50,
              (1 << 63) - 1):
        e = cramio.ltf8_encode(v)
        got, off = cramio.ltf8_decode(e, 0)
        assert (got, off) == (v, len(e)), (v, got, e.hex())


def test_eof_container_is_structurally_valid():
    """The canonical 38-byte EOF constant must parse as a zero-record
    container with a valid header CRC and one CRC-valid block — i.e.
    our own parser validates the published constant."""
    hdr, off = cramio._parse_container_header(
        memoryview(cramio.EOF_CONTAINER), 0)
    assert hdr["n_records"] == 0 and hdr["n_blocks"] == 1
    blk, _ = cramio._read_block(
        memoryview(cramio.EOF_CONTAINER)[hdr["body"][0]:hdr["body"][1]], 0)
    assert blk["ctype"] == cramio.CT_COMPRESSION_HEADER
    assert off == len(cramio.EOF_CONTAINER)


@pytest.mark.parametrize("method", [cramio.GZIP, cramio.RAW])
def test_roundtrip(tmp_path, method, full_range):
    x = generate_flags(123_457, seed=4, full_range=full_range)
    p = tmp_path / "t.cram"
    n = cramio.write_cram(p, x, records_per_container=50_000,
                          method=method)
    assert n == x.size
    np.testing.assert_array_equal(cramio.read_cram_flags(p), x)


def test_roundtrip_edge_sizes(tmp_path):
    for arr in (np.zeros(0, np.uint16), np.array([0xFFFF], np.uint16),
                np.arange(4096, dtype=np.uint16)):
        p = tmp_path / "e.cram"
        cramio.write_cram(p, arr)
        np.testing.assert_array_equal(cramio.read_cram_flags(p), arr)


def test_sniff_and_flagstat_file(tmp_path):
    x = generate_flags(60_000, seed=6, full_range=True)
    p = tmp_path / "t.cram"
    cramio.write_cram(p, x)
    assert sniff_format(p) == "cram"
    got = np.asarray(lfs.flagstat_file(p), dtype=np.int64)
    assert_counters_equal(flagstat_numpy(x).astype(np.int64), got)


def test_cli_flagstat_cram(tmp_path, capsys):
    from libflagstats_tpu.cli import main

    x = generate_flags(20_000, seed=8, full_range=True)
    p = tmp_path / "t.cram"
    cramio.write_cram(p, x)
    assert main(["flagstat", str(p)]) == 0
    out = capsys.readouterr().out
    from libflagstats_tpu.report import counters_to_report

    assert out.strip() == counters_to_report(flagstat_numpy(x)).text()


def test_bad_magic_and_version(tmp_path):
    p = tmp_path / "x.cram"
    p.write_bytes(b"CRAX" + b"\x00" * 30)
    with pytest.raises(ValueError, match="not a CRAM"):
        cramio.read_cram_flags(p)
    p.write_bytes(b"CRAM\x02\x01" + b"\x00" * 30)
    with pytest.raises(ValueError, match="unsupported"):
        cramio.read_cram_flags(p)


def test_unsupported_series_codec(tmp_path):
    """A BF series with a non-EXTERNAL encoding must error clearly,
    not guess."""
    x = generate_flags(100, seed=1)
    p = tmp_path / "t.cram"
    cramio.write_cram(p, x, method=cramio.RAW)
    raw = bytearray(p.read_bytes())
    # rebuild with a HUFFMAN(3) encoding id for BF by patching the
    # writer instead of byte-surgery: swap the encoding map builder
    orig = cramio._compression_header_block

    def bad_header(method):
        pres = cramio._write_map([(b"RN", b"\x01")])
        ds = cramio._write_map([
            (b"BF", cramio.itf8_encode(3) + cramio.itf8_encode(0)),
            (b"CF", cramio.itf8_encode(cramio.ENC_EXTERNAL)
             + cramio.itf8_encode(1) + cramio.itf8_encode(cramio.ID_CF)),
        ])
        return cramio._write_block(cramio.RAW,
                                   cramio.CT_COMPRESSION_HEADER, 0,
                                   pres + ds + cramio._write_map([]))

    cramio._compression_header_block = bad_header
    try:
        cramio.write_cram(p, x, method=cramio.RAW)
    finally:
        cramio._compression_header_block = orig
    with pytest.raises(ValueError, match="EXTERNAL"):
        cramio.read_cram_flags(p)


def test_mate_downstream_refused(tmp_path):
    """Within-slice mate linking (CF 0x4, not detached) cannot be
    FLAG-reconstructed without full record decode — must refuse."""
    x = np.array([0x43, 0x83], dtype=np.uint16)
    p = tmp_path / "t.cram"
    orig = cramio.CF_DETACHED
    try:
        cramio.CF_DETACHED = cramio.CF_MATE_DOWNSTREAM  # writer emits 0x4
        cramio.write_cram(p, x, method=cramio.RAW)
    finally:
        cramio.CF_DETACHED = orig
    with pytest.raises(ValueError, match="mate linking"):
        cramio.read_cram_flags(p)


def test_truncation_never_miscounts(tmp_path):
    """Every prefix of a valid CRAM either errors or (at container
    boundaries) returns exactly the records of the complete containers
    it holds — never garbage."""
    x = generate_flags(3_000, seed=3, full_range=True)
    p = tmp_path / "t.cram"
    cramio.write_cram(p, x, records_per_container=1_000)
    blob = p.read_bytes()
    q = tmp_path / "trunc.cram"
    rng = np.random.default_rng(0)
    cuts = sorted(set(rng.integers(1, len(blob), 200).tolist())
                  | {1, 25, 26, 27, len(blob) - 1, len(blob) - 39})
    ok_prefix = 0
    for cut in cuts:
        q.write_bytes(blob[:cut])
        try:
            got = cramio.read_cram_flags(q)
        except ValueError:
            continue
        # clean-container-boundary prefix: must be an exact prefix
        assert got.size in (0, 1000, 2000, 3000)
        np.testing.assert_array_equal(got, x[:got.size])
        ok_prefix += 1
    assert ok_prefix < len(cuts)   # truncations do get caught


def test_mutation_never_miscounts(tmp_path):
    """Single-byte corruptions: every read must either raise ValueError
    or return the exact original column (e.g. flips inside the ignored
    20-byte file id) — CRCs cover all structural/data bytes."""
    x = generate_flags(2_000, seed=5, full_range=True)
    p = tmp_path / "t.cram"
    cramio.write_cram(p, x)
    blob = bytearray(p.read_bytes())
    q = tmp_path / "mut.cram"
    rng = np.random.default_rng(1)
    for pos in rng.integers(0, len(blob), 250).tolist():
        mut = bytearray(blob)
        mut[pos] ^= 1 << int(rng.integers(0, 8))
        q.write_bytes(bytes(mut))
        try:
            got = cramio.read_cram_flags(q)
        except (ValueError, OverflowError):
            continue
        np.testing.assert_array_equal(got, x)


def test_record_count_mismatch_caught(tmp_path):
    """Container vs slice record-count disagreement is an error (the
    walk refuses to pick one silently)."""
    x = generate_flags(64, seed=7)
    p = tmp_path / "t.cram"
    orig = cramio._parse_slice_header
    cramio.write_cram(p, x, method=cramio.RAW)

    # corrupt via writer: slice claims one fewer record
    orig_slice = cramio._slice_blocks

    def bad_slice(flags, counter, method):
        blocks = orig_slice(flags, counter, method)
        # rewrite the slice header with n-1 records
        head = (cramio.itf8_encode(-1) + cramio.itf8_encode(0)
                + cramio.itf8_encode(0)
                + cramio.itf8_encode(max(flags.size - 1, 0))
                + cramio.ltf8_encode(counter) + cramio.itf8_encode(4)
                + cramio.itf8_encode(3)
                + b"".join(cramio.itf8_encode(c) for c in (1, 2, 3))
                + cramio.itf8_encode(-1) + b"\x00" * 16)
        blocks[0] = cramio._write_block(cramio.RAW,
                                        cramio.CT_SLICE_HEADER, 0, head)
        return blocks

    cramio._slice_blocks = bad_slice
    try:
        cramio.write_cram(p, x, method=cramio.RAW)
    finally:
        cramio._slice_blocks = orig_slice
    assert cramio._parse_slice_header is orig
    with pytest.raises(ValueError, match="count mismatch"):
        cramio.read_cram_flags(p)


# ---------------------------------------------------------------------------
# rANS-4x8 order-0 codec (CRAM 3.0 §13; io/native/rans4x8.cpp + the
# pure-Python differential decoder)
# ---------------------------------------------------------------------------


def _native_rans_available():
    from libflagstats_tpu.io import native_lib

    lib = native_lib.load()
    return lib is not None and hasattr(lib, "lfs_rans4x8_compress")


@pytest.mark.skipif(not _native_rans_available(),
                    reason="native lib unavailable")
def test_rans_roundtrip_and_differential():
    rng = np.random.default_rng(0)
    cases = [b"", b"x", b"x" * 9999,
             rng.integers(0, 256, 40000, dtype=np.uint8).tobytes(),
             rng.integers(0, 3, 80000, dtype=np.uint8).tobytes(),
             bytes(range(256)) * 64]
    for data in cases:
        comp = cramio._rans_compress(data)
        assert cramio._rans_decompress(comp, len(data)) == data
        # the Python decoder is the executable spec — must agree
        assert cramio._rans_decompress_py(comp) == data


@pytest.mark.skipif(not _native_rans_available(),
                    reason="native lib unavailable")
def test_cram_rans_blocks_roundtrip(tmp_path):
    x = generate_flags(70_000, seed=12, full_range=True)
    p = tmp_path / "t.cram"
    cramio.write_cram(p, x, method=cramio.RANS)
    np.testing.assert_array_equal(cramio.read_cram_flags(p), x)
    # and the pure-Python decode path reads the same file
    from libflagstats_tpu.io import native_lib

    lib = native_lib.load
    try:
        native_lib.load = lambda: None
        np.testing.assert_array_equal(cramio.read_cram_flags(p), x)
    finally:
        native_lib.load = lib


@pytest.mark.skipif(not _native_rans_available(),
                    reason="native lib unavailable")
def test_rans_order1_refused_and_corruption_caught():
    data = b"hello rans" * 50
    comp = bytearray(cramio._rans_compress(data))
    comp[0] = 1                       # claim order-1
    with pytest.raises(ValueError, match="order-1"):
        cramio._rans_decompress(bytes(comp), len(data))
    with pytest.raises(ValueError, match="order-1"):
        cramio._rans_decompress_py(bytes(comp))
    comp[0] = 0
    # truncations and flips: error or exact, never garbage
    rng = np.random.default_rng(2)
    good = bytes(comp)
    for _ in range(150):
        mut = bytearray(good)
        if rng.integers(0, 2):
            mut = mut[:int(rng.integers(1, len(good)))]
        else:
            mut[int(rng.integers(0, len(good)))] ^= 1 << int(
                rng.integers(0, 8))
        for dec in (lambda b: cramio._rans_decompress(bytes(b), len(data)),
                    lambda b: cramio._rans_decompress_py(bytes(b))):
            try:
                got = dec(mut)
            except ValueError:
                continue
            # a surviving decode must still be size-consistent
            assert len(got) == len(data)


def test_columnar_io_skips_unneeded_blocks(tmp_path):
    """Full-payload simulation: a container carrying a large extra
    external block (stand-in for seq/qual) whose payload is NOT even
    valid for its declared compression method. The seek-walk must
    never read/decompress it — flags come back exact; a reader that
    touched the block would raise on its bogus gzip stream."""
    x = generate_flags(5_000, seed=17, full_range=True)
    p = tmp_path / "heavy.cram"
    orig = cramio._slice_blocks

    def heavy_slice(flags, counter, method):
        blocks = orig(flags, counter, method)
        bogus = b"\x00" * 200_000               # not a gzip stream
        body = (bytes([cramio.GZIP, cramio.CT_EXTERNAL])
                + cramio.itf8_encode(99)        # id no series references
                + cramio.itf8_encode(len(bogus))
                + cramio.itf8_encode(1 << 20)   # declared raw size: 1 MiB
                + bogus)
        import struct as _struct
        import zlib as _zlib

        blocks.append(body + _struct.pack("<I", _zlib.crc32(body)))
        return blocks

    cramio._slice_blocks = heavy_slice
    try:
        cramio.write_cram(p, x)
    finally:
        cramio._slice_blocks = orig
    np.testing.assert_array_equal(cramio.read_cram_flags(p), x)
    np.testing.assert_array_equal(cramio.read_cram_flags(p, threads=1), x)


def test_container_range_counting(tmp_path):
    """The multihost shard primitive: container-range counters sum to
    the whole-file truth across an uneven split, and the header-only
    container count walks without reading block data."""
    x = generate_flags(250_000, seed=23, full_range=True)
    p = tmp_path / "t.cram"
    cramio.write_cram(p, x, records_per_container=60_000)   # 5 containers
    assert cramio.data_container_count(p) == 5
    whole = flagstat_numpy(x).astype(np.uint64)
    a = cramio.flagstat_cram_range(p, 0, 3)
    b = cramio.flagstat_cram_range(p, 3, 5)
    np.testing.assert_array_equal(a + b, whole)
    # empty range contributes zeros
    assert (cramio.flagstat_cram_range(p, 5, 5) == 0).all()


# ---------------------------------------------------------------------------
# Native fused walker (io/native/cram_reader.cpp) — the Python reader
# is its differential oracle; both must error-or-agree on everything
# ---------------------------------------------------------------------------


def _native_cram_available():
    from libflagstats_tpu.io import native_lib

    lib = native_lib.load()
    return lib is not None and hasattr(lib, "lfs_cram_flagstat")


@pytest.mark.skipif(not _native_cram_available(),
                    reason="native lib unavailable")
def test_native_fused_matches_python_all_methods(tmp_path):
    x = generate_flags(200_000, seed=33, full_range=True)
    ref = flagstat_numpy(x).astype(np.uint64)
    for method in (cramio.GZIP, cramio.RANS, cramio.RAW):
        p = tmp_path / "t.cram"
        cramio.write_cram(p, x, records_per_container=70_000, method=method)
        for threads in (1, 4):
            got = np.asarray(cramio.flagstat_cram(p, threads=threads))
            np.testing.assert_array_equal(got, ref)


@pytest.mark.skipif(not _native_cram_available(),
                    reason="native lib unavailable")
def test_native_fused_refusals(tmp_path):
    """Unsupported-subset files must raise through the native path too
    (rc=-3 -> ValueError), exactly like the Python reader."""
    x = np.array([0x43, 0x83], dtype=np.uint16)
    p = tmp_path / "t.cram"
    orig = cramio.CF_DETACHED
    try:
        cramio.CF_DETACHED = cramio.CF_MATE_DOWNSTREAM
        cramio.write_cram(p, x, method=cramio.RAW)
    finally:
        cramio.CF_DETACHED = orig
    with pytest.raises(ValueError, match="lfs_cram_flagstat"):
        cramio.flagstat_cram(p)
    # order-1 rANS block: patch a written rans file's order byte is
    # fiddly (CRCs); instead force the writer to emit order-1 via the
    # codec itself being absent is not possible — covered by the rANS
    # unit refusal tests; here: truncation
    cramio.write_cram(p, generate_flags(5000, seed=1))
    blob = p.read_bytes()
    p.write_bytes(blob[:len(blob) // 2])
    with pytest.raises(ValueError):
        cramio.flagstat_cram(p)


@pytest.mark.skipif(not _native_cram_available(),
                    reason="native lib unavailable")
def test_native_mutation_never_miscounts(tmp_path):
    """Single-byte corruptions through the NATIVE fused walker: error
    or the exact original counters, never garbage (the Python twin of
    this test runs above; the ASan harness covers wild inputs)."""
    x = generate_flags(2_000, seed=5, full_range=True)
    ref = flagstat_numpy(x).astype(np.uint64)
    p = tmp_path / "t.cram"
    cramio.write_cram(p, x)
    blob = bytearray(p.read_bytes())
    q = tmp_path / "mut.cram"
    rng = np.random.default_rng(3)
    for pos in rng.integers(0, len(blob), 250).tolist():
        mut = bytearray(blob)
        mut[pos] ^= 1 << int(rng.integers(0, 8))
        q.write_bytes(bytes(mut))
        try:
            got = np.asarray(cramio.flagstat_cram(q, threads=2))
        except (ValueError, OverflowError):
            continue
        np.testing.assert_array_equal(got, ref)


@pytest.mark.skipif(not _native_cram_available(),
                    reason="native lib unavailable")
def test_native_columnar_skips_unneeded_blocks(tmp_path):
    """The native walker's skip contract matches the Python seek-walk:
    a large extra external block with a payload invalid for its
    declared codec is never touched."""
    x = generate_flags(5_000, seed=17, full_range=True)
    p = tmp_path / "heavy.cram"
    orig = cramio._slice_blocks

    def heavy_slice(flags, counter, method):
        blocks = orig(flags, counter, method)
        bogus = b"\x00" * 200_000
        body = (bytes([cramio.GZIP, cramio.CT_EXTERNAL])
                + cramio.itf8_encode(99)
                + cramio.itf8_encode(len(bogus))
                + cramio.itf8_encode(1 << 20)
                + bogus)
        import struct as _struct
        import zlib as _zlib

        blocks.append(body + _struct.pack("<I", _zlib.crc32(body)))
        return blocks

    cramio._slice_blocks = heavy_slice
    try:
        cramio.write_cram(p, x)
    finally:
        cramio._slice_blocks = orig
    got = np.asarray(cramio.flagstat_cram(p, threads=2))
    np.testing.assert_array_equal(got, flagstat_numpy(x).astype(np.uint64))


def test_container_range_native_matches_python_fallback(tmp_path):
    """flagstat_cram_range: the native range walker and the Python
    decode fallback must agree (and both sum to the whole)."""
    from libflagstats_tpu.io import native_lib

    x = generate_flags(200_000, seed=24, full_range=True)
    p = tmp_path / "t.cram"
    cramio.write_cram(p, x, records_per_container=60_000)
    whole = flagstat_numpy(x).astype(np.uint64)
    a_n = cramio.flagstat_cram_range(p, 0, 2)
    b_n = cramio.flagstat_cram_range(p, 2, 10)
    np.testing.assert_array_equal(a_n + b_n, whole)
    orig = native_lib.load
    try:
        native_lib.load = lambda: None
        a_p = cramio.flagstat_cram_range(p, 0, 2)
        b_p = cramio.flagstat_cram_range(p, 2, 10)
    finally:
        native_lib.load = orig
    np.testing.assert_array_equal(a_n, a_p)
    np.testing.assert_array_equal(b_n, b_p)
