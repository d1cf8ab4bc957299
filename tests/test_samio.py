"""SAM-text ingest (io/samio.py read_sam_flags + io/native/sam_reader.cpp).

Beyond-reference surface: the reference consumes SAM text only after
`samtools view | cut -f2` reduces it to a bare column (reference
README.md:56); this framework parses the FLAG field out of .sam /
.sam.gz directly. Differential discipline mirrors test_bamio.py: the
pure-Python reader is the correctness reference for the threaded native
parser, and both are checked against the flags that were written.
"""
import gzip

import numpy as np
import pytest

from libflagstats_tpu.io import bamio, read_flags_auto, samio
from libflagstats_tpu.ops import native_host
from libflagstats_tpu.oracle import flagstat_numpy, generate_flags

from conftest import assert_counters_equal

NATIVE = native_host.available()


def _both_readers(path):
    got_py = samio.read_sam_flags_py(path)
    got = samio.read_sam_flags(path)
    np.testing.assert_array_equal(got, got_py)
    return got


@pytest.mark.parametrize("n", [0, 1, 1000, 123_457])
def test_sam_roundtrip(tmp_path, n):
    x = generate_flags(n, seed=n + 1, full_range=True)
    p = tmp_path / "t.sam"
    assert samio.write_sam(p, x) == n
    np.testing.assert_array_equal(_both_readers(p), x)


def test_sam_gzip_roundtrip(tmp_path):
    """Plain-gzip .sam.gz: the native path stream-inflates in chunks
    with partial-line carry; size chosen so several 8 MiB chunks split
    mid-line."""
    x = generate_flags(400_003, seed=5, full_range=True)
    plain = tmp_path / "t.sam"
    samio.write_sam(plain, x)
    gz = tmp_path / "t.sam.gz"
    with open(plain, "rb") as src, gzip.open(gz, "wb", compresslevel=1) as dst:
        while True:
            b = src.read(1 << 20)
            if not b:
                break
            dst.write(b)
    np.testing.assert_array_equal(_both_readers(gz), x)


def test_sam_bgzf_roundtrip(tmp_path):
    """BGZF-compressed SAM (bgzip-style concatenated members) — the
    shape a real `bgzip file.sam` produces."""
    x = generate_flags(50_000, seed=7, full_range=True)
    plain = tmp_path / "t.sam"
    samio.write_sam(plain, x)
    data = plain.read_bytes()
    gz = tmp_path / "t.sam.gz"
    with open(gz, "wb") as fh:
        for off in range(0, len(data), 60000):
            fh.write(bamio._bgzf_member(data[off:off + 60000]))
        fh.write(bamio.BGZF_EOF)
    np.testing.assert_array_equal(_both_readers(gz), x)


@pytest.mark.skipif(not NATIVE, reason="native host library unavailable")
def test_bgzf_takes_the_walker_plain_gz_falls_back(tmp_path):
    """Routing pin: BGZF .sam.gz must go through the parallel-inflate
    walker (lfs_bgzf_sam_flags); plain gzip must make it return None so
    the generic stream path runs."""
    from libflagstats_tpu.io import native_lib

    lib = native_lib.load()
    x = generate_flags(30_000, seed=31, full_range=True)
    plain = tmp_path / "t.sam"
    samio.write_sam(plain, x)
    data = plain.read_bytes()

    bgz = tmp_path / "b.sam.gz"
    with open(bgz, "wb") as fh:
        for off in range(0, len(data), 60000):
            fh.write(bamio._bgzf_member(data[off:off + 60000]))
        fh.write(bamio.BGZF_EOF)
    got = samio._read_bgzf_sam_native(lib, bgz, 0)
    assert got is not None
    np.testing.assert_array_equal(got, x)

    gz = tmp_path / "p.sam.gz"
    with gzip.open(gz, "wb") as fh:
        fh.write(data)
    assert samio._read_bgzf_sam_native(lib, gz, 0) is None
    np.testing.assert_array_equal(samio.read_sam_flags(gz), x)


def test_bare_column_text(tmp_path):
    """A tabless FLAG-per-line file (the `cut -f2` shape the reference's
    utility consumes) parses through the same reader."""
    x = generate_flags(10_000, seed=9, full_range=True)
    p = tmp_path / "col.txt"
    p.write_text("\n".join(str(v) for v in x.tolist()) + "\n")
    np.testing.assert_array_equal(_both_readers(p), x)


def test_sam_edge_shapes(tmp_path):
    """Header-only, empty, no trailing newline, \\r\\n endings, empty
    lines, FLAG at the uint16 boundary."""
    p = tmp_path / "e.sam"

    p.write_text("@HD\tVN:1.6\n@SQ\tSN:c\tLN:5\n")
    assert _both_readers(p).size == 0

    p.write_text("")
    assert _both_readers(p).size == 0

    p.write_text("r1\t77\t*\t0\t0\t*\t*\t0\t0\t*\t*")  # no trailing \n
    np.testing.assert_array_equal(_both_readers(p), [77])

    p.write_bytes(b"r1\t65535\t*\r\nr2\t0\t*\r\n\r\n")
    np.testing.assert_array_equal(_both_readers(p), [65535, 0])


def test_sam_malformed_is_rejected(tmp_path):
    """A count must never be built from a misparsed stream: non-numeric
    FLAG, out-of-range FLAG, and missing column 2 all raise in BOTH
    readers."""
    p = tmp_path / "bad.sam"
    for body in [
        "r1\tx77\t*\n",           # non-numeric
        "r1\t65536\t*\n",         # > uint16
        "r1\t7 7\t*\n",           # junk after digits
        "r1\t\t*\n",              # empty FLAG field
        "readname_no_tab_not_a_number\n",
    ]:
        p.write_text(body)
        with pytest.raises(ValueError):
            samio.read_sam_flags_py(p)
        with pytest.raises(ValueError):
            samio.read_sam_flags(p)


@pytest.mark.skipif(not NATIVE, reason="native host library unavailable")
def test_native_threaded_range_split(tmp_path):
    """Force the multi-range native path (>= 4 MiB per range) and check
    record order is preserved across range boundaries."""
    n = 300_000
    x = generate_flags(n, seed=11, full_range=True)
    p = tmp_path / "big.sam"
    # pad QNAMEs so the file comfortably exceeds one 4 MiB range
    with open(p, "w") as fh:
        pad = "q" * 40
        fh.write("".join(f"{pad}{i}\t{v}\t*\t0\t0\t*\t*\t0\t0\t*\t*\n"
                         for i, v in enumerate(x.tolist())))
    assert p.stat().st_size > (1 << 22)
    got = samio.read_sam_flags(p, threads=4)
    np.testing.assert_array_equal(got, x)


@pytest.mark.skipif(not NATIVE, reason="native host library unavailable")
def test_differential_fuzz_py_vs_native(tmp_path):
    """Seeded adversarial text through BOTH readers: they must agree on
    accept/reject and on every accepted FLAG sequence (the native parser
    and the Python reference implement one contract, not two)."""
    rng = np.random.default_rng(20260820)
    alphabet = np.frombuffer(b"0123456789\t\n\r@rxyz \xff", np.uint8)
    p = tmp_path / "fz.sam"
    for trial in range(800):
        n = int(rng.integers(0, 200))
        p.write_bytes(bytes(rng.choice(alphabet, n)))
        try:
            ra = ("ok", samio.read_sam_flags_py(p).tolist())
        except ValueError:
            ra = ("err",)
        try:
            rb = ("ok", samio.read_sam_flags(p).tolist())
        except ValueError:
            rb = ("err",)
        assert ra == rb, (trial, p.read_bytes(), ra, rb)


@pytest.mark.skipif(not NATIVE, reason="native host library unavailable")
def test_bgzf_sam_member_range_sharding(tmp_path):
    """Member-range sharding: for ANY partition of the member chain,
    per-range counters must sum to the whole-file counters — lines
    crossing range boundaries (60000-byte members never line-align)
    count exactly once. Includes single-member ranges and a giant
    header-less line spanning several whole members."""
    from libflagstats_tpu.io.samio import (bgzf_member_count,
                                           flagstat_sam_range)

    x = generate_flags(120_000, seed=41, full_range=True)
    plain = tmp_path / "t.sam"
    samio.write_sam(plain, x)
    data = plain.read_bytes()
    gz = tmp_path / "t.sam.gz"
    with open(gz, "wb") as fh:
        for off in range(0, len(data), 60000):
            fh.write(bamio._bgzf_member(data[off:off + 60000]))
        fh.write(bamio.BGZF_EOF)

    ref = flagstat_numpy(x)
    n_members = bgzf_member_count(gz)
    assert n_members > 10

    rng = np.random.default_rng(1)
    partitions = [
        [0, n_members],                                   # whole file
        [0, 1, n_members],                                # tiny head shard
        [0, n_members - 1, n_members],                    # tiny tail shard
        list(range(n_members + 1)),                       # every member alone
        sorted({0, n_members,
                *map(int, rng.integers(1, n_members, size=5))}),
    ]
    for cuts in partitions:
        total = np.zeros_like(ref)
        for a, b in zip(cuts, cuts[1:]):
            total += flagstat_sam_range(gz, a, b, threads=2)
        assert_counters_equal(ref, total), cuts

    # a giant line spanning multiple members entirely: the shard owning
    # its start extends through; intermediate shards own nothing
    giant = (b"@HD\tVN:1.6\n"
             + b"q" + b"Q" * 150_000 + b"\t77\t*\n"
             + b"r2\t99\t*\n")
    gz2 = tmp_path / "g.sam.gz"
    with open(gz2, "wb") as fh:
        for off in range(0, len(giant), 60000):
            fh.write(bamio._bgzf_member(giant[off:off + 60000]))
        fh.write(bamio.BGZF_EOF)
    ref2 = flagstat_numpy(np.array([77, 99], dtype=np.uint16))
    m2 = bgzf_member_count(gz2)
    assert m2 >= 3
    total = np.zeros_like(ref2)
    for a in range(m2):
        total += flagstat_sam_range(gz2, a, a + 1)
    assert_counters_equal(ref2, total)


@pytest.mark.skipif(not NATIVE, reason="native host library unavailable")
def test_multihost_bgzf_sam_single_process(tmp_path):
    """flagstat_multihost_bgzf_sam is the identity composition at
    process_count()==1 and matches the oracle."""
    from libflagstats_tpu.parallel.multihost import flagstat_multihost_bgzf_sam

    x = generate_flags(50_000, seed=43, full_range=True)
    plain = tmp_path / "t.sam"
    samio.write_sam(plain, x)
    data = plain.read_bytes()
    gz = tmp_path / "t.sam.gz"
    with open(gz, "wb") as fh:
        for off in range(0, len(data), 60000):
            fh.write(bamio._bgzf_member(data[off:off + 60000]))
        fh.write(bamio.BGZF_EOF)
    assert_counters_equal(flagstat_numpy(x),
                          flagstat_multihost_bgzf_sam(gz, n_threads=2))


def test_flagstat_sam_end_to_end(tmp_path):
    x = generate_flags(200_000, seed=13, full_range=True)
    p = tmp_path / "t.sam"
    samio.write_sam(p, x)
    assert_counters_equal(flagstat_numpy(x), samio.flagstat_sam(p))


def test_read_flags_auto_routing(tmp_path):
    """The sniffing reader must route BAM-in-gzip to the BAM walker,
    other gzip to the SAM parser, .sam to the SAM parser, and default
    to raw binary."""
    x = generate_flags(5_000, seed=17, full_range=True)

    b = tmp_path / "t.bam"
    bamio.write_bam(b, x)
    np.testing.assert_array_equal(read_flags_auto(b), x)

    s = tmp_path / "t.sam"
    samio.write_sam(s, x)
    np.testing.assert_array_equal(read_flags_auto(s), x)

    gz = tmp_path / "t.sam.gz"
    with gzip.open(gz, "wb") as fh:
        fh.write(s.read_bytes())
    np.testing.assert_array_equal(read_flags_auto(gz), x)

    raw = tmp_path / "t.bin"
    x.astype("<u2").tofile(raw)
    np.testing.assert_array_equal(read_flags_auto(raw), x)

    # framed compressed columns (the reference's own container format)
    from libflagstats_tpu.io import codec

    for codec_name, ext in (("lz4", ".lz4"), ("zstd", ".zst")):
        framed = tmp_path / f"t{ext}"
        codec.write_framed(framed, x, codec=codec_name)
        np.testing.assert_array_equal(read_flags_auto(framed), x)


def test_cli_flagstat_sam(tmp_path, capsys):
    from libflagstats_tpu.cli import main

    x = generate_flags(30_000, seed=19, full_range=True)
    p = tmp_path / "t.sam"
    samio.write_sam(p, x)
    assert main(["flagstat", str(p)]) == 0
    out = capsys.readouterr().out
    ref = flagstat_numpy(x)
    assert f"{int(ref[9])} + {int(ref[25])} in total" in out

    gz = tmp_path / "t.sam.gz"
    with gzip.open(gz, "wb") as fh:
        fh.write(p.read_bytes())
    assert main(["flagstat", str(gz)]) == 0
    out = capsys.readouterr().out
    assert f"{int(ref[9])} + {int(ref[25])} in total" in out

    # sam -> binary column via the (now format-agnostic) bam2flags
    dest = tmp_path / "col.bin"
    assert main(["bam2flags", str(p), "-o", str(dest)]) == 0
    np.testing.assert_array_equal(np.fromfile(dest, dtype=np.uint16), x)


def test_flagstat_file_top_level(tmp_path):
    """lfs.flagstat_file: one call, any container — and the fused
    native walk+count paths (BAM, BGZF-SAM) agree bit-exactly with the
    read-then-count fallback (impl='numpy' forces it)."""
    import libflagstats_tpu as lfs

    x = generate_flags(20_000, seed=29, full_range=True)
    ref = flagstat_numpy(x)
    b = tmp_path / "t.bam"
    bamio.write_bam(b, x)
    s = tmp_path / "t.sam"
    samio.write_sam(s, x)
    data = s.read_bytes()
    bgz = tmp_path / "t.sam.gz"
    with open(bgz, "wb") as fh:
        for off in range(0, len(data), 60000):
            fh.write(bamio._bgzf_member(data[off:off + 60000]))
        fh.write(bamio.BGZF_EOF)
    for p in (b, s, bgz):
        assert_counters_equal(ref, lfs.flagstat_file(p))           # fused
        assert_counters_equal(ref, lfs.flagstat_file(p, impl="numpy"))

    # framed streams route through the streaming pipeline
    from libflagstats_tpu.io import codec

    for codec_name, ext in (("lz4", ".lz4"), ("zstd", ".zst")):
        framed = tmp_path / f"t{ext}"
        codec.write_framed(framed, x, codec=codec_name)
        assert_counters_equal(ref, lfs.flagstat_file(framed))

    raw = tmp_path / "t.bin"
    x.astype("<u2").tofile(raw)
    assert_counters_equal(ref, lfs.flagstat_file(raw))


@pytest.mark.skipif(not NATIVE, reason="native host library unavailable")
def test_fused_container_counting_matches_column_path(tmp_path):
    """The fused walkers (lfs_bam_flagstat / lfs_bgzf_sam_flagstat)
    must produce the exact counters of walk-then-count. A forced tiny
    chunk (1009 flags) drives hundreds of flushes, pinning the
    per-chunk derived pass-total summation (counter 9 is += n_chunk -
    fail_chunk per flush; exact under summation by the
    block-accumulate contract)."""
    import ctypes

    from libflagstats_tpu import flags as F
    from libflagstats_tpu.io import native_lib

    lib = native_lib.load()
    x = generate_flags(300_007, seed=37, full_range=True)
    ref = flagstat_numpy(x)
    b = tmp_path / "t.bam"
    bamio.write_bam(b, x)
    assert_counters_equal(ref, bamio.flagstat_bam(b))   # default chunk

    s = tmp_path / "t.sam"
    samio.write_sam(s, x)
    data = s.read_bytes()
    bgz = tmp_path / "t.sam.gz"
    with open(bgz, "wb") as fh:
        for off in range(0, len(data), 60000):
            fh.write(bamio._bgzf_member(data[off:off + 60000]))
        fh.write(bamio.BGZF_EOF)
    assert_counters_equal(ref, samio.flagstat_sam(bgz))  # default chunk

    # plain-text fused path (range-parallel, per-thread counters)
    assert_counters_equal(ref, samio.flagstat_sam(s))

    # forced tiny chunk: hundreds of flushes, same counters bit-exact
    for path, fn in ((b, lib.lfs_bam_flagstat),
                     (bgz, lib.lfs_bgzf_sam_flagstat),
                     (s, lib.lfs_sam_flagstat)):
        mm = np.memmap(path, dtype=np.uint8, mode="r")
        counters = np.zeros(F.N_COUNTERS, dtype=np.uint64)
        got = fn(mm.ctypes.data, mm.size,
                 counters.ctypes.data_as(ctypes.c_void_p), 2, 1009)
        assert got == x.size
        assert_counters_equal(ref, counters)

    # plain gzip still routes through the stream fallback
    gz = tmp_path / "p.sam.gz"
    with gzip.open(gz, "wb") as fh:
        fh.write(data)
    assert_counters_equal(ref, samio.flagstat_sam(gz))


def test_cli_compress_from_container(tmp_path, capsys):
    """`compress x.bam` builds the reference's framed benchmark format
    straight from a container (no intermediate binary column)."""
    from libflagstats_tpu.cli import main
    from libflagstats_tpu.io import codec

    x = generate_flags(40_000, seed=23, full_range=True)
    b = tmp_path / "t.bam"
    bamio.write_bam(b, x)
    out = tmp_path / "t.lz4"
    assert main(["compress", str(b), "--codec", "lz4", "-o", str(out)]) == 0
    np.testing.assert_array_equal(codec.read_framed(out, "lz4"), x)


def test_cli_input_errors_are_clean(tmp_path, capsys):
    """Bad input exits rc=1 with a one-line error (the reference's
    run_screaming pattern), never a report and never a traceback —
    including corrupt/truncated gzip (zlib.error / EOFError paths)."""
    from libflagstats_tpu.cli import main

    bad = tmp_path / "bad.sam"
    bad.write_text("r1\tnotanumber\t*\n")
    assert main(["flagstat", str(bad)]) == 1
    captured = capsys.readouterr()
    assert "in total" not in captured.out
    assert "error:" in captured.err

    assert main(["flagstat", str(tmp_path / "missing.bin")]) == 1
    assert "error:" in capsys.readouterr().err

    garbled = tmp_path / "garbled.sam.gz"
    garbled.write_bytes(b"\x1f\x8b" + b"\x99" * 64)
    assert main(["flagstat", str(garbled)]) == 1
    assert "error:" in capsys.readouterr().err

    truncated = tmp_path / "trunc.sam.gz"
    with gzip.open(tmp_path / "whole.sam.gz", "wb") as fh:
        fh.write(b"r1\t77\t*\n" * 1000)
    truncated.write_bytes((tmp_path / "whole.sam.gz").read_bytes()[:40])
    assert main(["flagstat", str(truncated)]) == 1
    assert "error:" in capsys.readouterr().err


def test_raw_binary_with_gzip_magic_word(tmp_path):
    """A legal raw FLAG column whose first word is 0x8b1f (bytes 1f 8b)
    must still route as binary, not die in a gzip decoder."""
    x = np.array([0x8B1F, 77, 99, 4095], dtype=np.uint16)
    p = tmp_path / "t.bin"
    x.astype("<u2").tofile(p)
    np.testing.assert_array_equal(read_flags_auto(p), x)


def test_setop_rows_skip_shapes():
    """Odd word counts and >2^25-lane inputs must yield well-formed
    6-column skip rows for BOTH setop kernels, never crash the roster."""
    from libflagstats_tpu.bench import kernels

    for n in (65537, 1 << 27):
        rows = kernels._setop_rows(None, n, None, iters=1, check=False)
        assert [r.split("\t")[0] for r in rows] == [
            "setop_popcnt", "setop_intersect"]
        for r in rows:
            cols = r.split("\t")
            assert len(cols) == 6 and cols[2].startswith("skipped:")


def test_realistic_sam_payload_roundtrip(tmp_path):
    """Realistic SAM lines (round 4): fixed-width 151bp records with
    zero-padded FLAG field — both parsers must read the column back."""
    from libflagstats_tpu.io.samio import (
        read_sam_flags,
        read_sam_flags_py,
        write_sam,
    )
    from libflagstats_tpu.oracle import generate_flags

    x = generate_flags(30_000, seed=13, full_range=True)
    p = tmp_path / "real.sam"
    write_sam(p, x, payload="realistic", seed=5)
    np.testing.assert_array_equal(read_sam_flags(p), x)
    np.testing.assert_array_equal(read_sam_flags_py(p), x)
    # ~10x the minimal line weight
    p2 = tmp_path / "min.sam"
    write_sam(p2, x)
    assert p.stat().st_size > 8 * p2.stat().st_size


def test_bgzf_sam_range_parallel_path(tmp_path):
    """The in-process member-range-parallel BGZF-SAM path (round 4) must
    engage on multi-member files and match the oracle exactly; tiny
    files must fall back (returns None) rather than pay the split."""
    from libflagstats_tpu.io import bamio
    from libflagstats_tpu.io.samio import (
        _flagstat_bgzf_sam_parallel,
        bgzf_member_count,
        write_sam,
    )
    from libflagstats_tpu.oracle import flagstat_numpy, generate_flags

    x = generate_flags(150_000, seed=17, full_range=True)
    sam = tmp_path / "p.sam"
    write_sam(sam, x, payload="realistic")
    gz = tmp_path / "p.sam.gz"
    data = np.memmap(sam, dtype=np.uint8, mode="r")
    with open(gz, "wb") as fh:
        for off in range(0, len(data), 60000):
            fh.write(bamio._bgzf_member(data[off:off + 60000].tobytes(),
                                        level=1))
        fh.write(bamio.BGZF_EOF)
    assert bgzf_member_count(gz) >= 64     # enough members to split
    got = _flagstat_bgzf_sam_parallel(gz, threads=4)
    assert got is not None, "parallel path must engage on this size"
    np.testing.assert_array_equal(got.astype(np.int64),
                                  flagstat_numpy(x))
    # tiny file: same writer, one member -> fallback
    small = tmp_path / "s.sam.gz"
    write_sam(sam, x[:50])
    data = np.memmap(sam, dtype=np.uint8, mode="r")
    with open(small, "wb") as fh:
        fh.write(bamio._bgzf_member(data[:].tobytes(), level=1))
        fh.write(bamio.BGZF_EOF)
    assert _flagstat_bgzf_sam_parallel(small, threads=4) is None


def test_streaming_sam_gz_writer_matches_readers(tmp_path):
    """tools/na12878_run._write_sam_gz_streaming (round 5: O(chunk)
    disk — the old whole-file intermediate needed ~160 GB at scale-2
    realistic) must produce a BGZF-SAM both readers parse to the exact
    column, for both payloads, across chunk boundaries."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "na12878_run",
        Path(__file__).resolve().parent.parent / "tools" / "na12878_run.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from libflagstats_tpu.io import read_flags_auto
    from libflagstats_tpu.oracle import generate_flags

    x = generate_flags(130_000, seed=41, full_range=True)
    for payload in ("minimal", "realistic"):
        p = tmp_path / f"s_{payload}.sam.gz"
        mod._write_sam_gz_streaming(p, x, payload, chunk_records=50_000)
        np.testing.assert_array_equal(read_flags_auto(p, threads=2), x)
        np.testing.assert_array_equal(
            samio.read_sam_flags_py(p), x)
