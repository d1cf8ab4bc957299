"""BAM/BGZF ingest (io/bamio.py + io/native/bam_reader.cpp).

Beyond-reference surface: the reference needs samtools to extract the
FLAG column from a BAM (reference README.md:56); this framework reads
the container directly. Differential discipline: the pure-Python reader
is the correctness reference for the native threaded walker, and both
are checked against the flags that were written.
"""
import struct

import numpy as np
import pytest

from libflagstats_tpu.io import bamio
from libflagstats_tpu.ops import native_host
from libflagstats_tpu.oracle import flagstat_numpy, generate_flags

from conftest import assert_counters_equal


@pytest.mark.parametrize("n", [0, 1, 1000, 123_457])
def test_bam_roundtrip_python(tmp_path, n):
    x = generate_flags(n, seed=n + 1, full_range=True)
    p = tmp_path / "t.bam"
    assert bamio.write_bam(p, x) == n
    got = bamio.read_bam_flags_py(p)
    np.testing.assert_array_equal(got, x)


@pytest.mark.skipif(not native_host.available(),
                    reason="native host library unavailable")
@pytest.mark.parametrize("n", [0, 1, 1000, 500_003])
def test_bam_native_matches_python(tmp_path, n):
    """The threaded native walker must agree with the Python reference,
    including sizes that exercise cross-block record carry (records are
    38 bytes; 60,000-byte BGZF payloads never align)."""
    x = generate_flags(n, seed=n + 7, full_range=True)
    p = tmp_path / "t.bam"
    bamio.write_bam(p, x)
    got = bamio.read_bam_flags(p)
    np.testing.assert_array_equal(got, x)
    np.testing.assert_array_equal(got, bamio.read_bam_flags_py(p))


def test_bam_long_read_names_and_refs(tmp_path):
    """Headers with reference entries and long read names (variable
    record sizes) exercise every parser state."""
    x = generate_flags(10_000, seed=3, full_range=True)
    p = tmp_path / "t.bam"
    bamio.write_bam(p, x, read_name=b"read_with_a_much_longer_name_000")
    np.testing.assert_array_equal(bamio.read_bam_flags_py(p), x)
    if native_host.available():
        np.testing.assert_array_equal(bamio.read_bam_flags(p), x)


def test_flagstat_bam_end_to_end(tmp_path):
    x = generate_flags(300_000, seed=11, full_range=True)
    p = tmp_path / "t.bam"
    bamio.write_bam(p, x)
    got = bamio.flagstat_bam(p)
    assert_counters_equal(flagstat_numpy(x), got)


def test_bam_corruption_is_rejected(tmp_path):
    """Truncated and corrupted containers must raise, never return
    plausible-looking partial counts silently."""
    x = generate_flags(100_000, seed=13, full_range=True)
    p = tmp_path / "t.bam"
    bamio.write_bam(p, x)
    data = p.read_bytes()

    trunc = tmp_path / "trunc.bam"
    trunc.write_bytes(data[: len(data) // 2])
    with pytest.raises((ValueError, EOFError)):
        bamio.read_bam_flags(trunc)
    with pytest.raises((ValueError, EOFError)):
        bamio.read_bam_flags_py(trunc)

    notbam = tmp_path / "not.bam"
    notbam.write_bytes(b"\x00" * 1000)
    with pytest.raises((ValueError, OSError)):
        bamio.read_bam_flags(notbam)

    # valid BGZF whose payload is not BAM
    gz = tmp_path / "gz.bam"
    gz.write_bytes(bamio._bgzf_member(b"nope" * 10) + bamio.BGZF_EOF)
    with pytest.raises(ValueError):
        bamio.read_bam_flags(gz)
    with pytest.raises(ValueError):
        bamio.read_bam_flags_py(gz)


def test_cli_flagstat_bam_and_bam2flags(tmp_path, capsys):
    from libflagstats_tpu.cli import main

    x = generate_flags(50_000, seed=17, full_range=True)
    p = tmp_path / "t.bam"
    bamio.write_bam(p, x)
    assert main(["flagstat", str(p)]) == 0
    out = capsys.readouterr().out
    ref = flagstat_numpy(x)
    n_pass, n_fail = int(ref[9]), int(ref[25])
    assert f"{n_pass} + {n_fail} in total" in out

    dest = tmp_path / "col.bin"
    assert main(["bam2flags", str(p), "-o", str(dest)]) == 0
    np.testing.assert_array_equal(np.fromfile(dest, dtype=np.uint16), x)


def test_bgzf_members_are_spec_conform(tmp_path):
    """Every member must carry the BC/BSIZE subfield and a correct CRC —
    i.e. be readable by any external BGZF implementation (stock gzip
    validates CRCs on read)."""
    import gzip
    import zlib

    x = generate_flags(20_000, seed=19)
    p = tmp_path / "t.bam"
    bamio.write_bam(p, x)
    data = p.read_bytes()
    # walk members by BSIZE and re-validate each independently
    off = 0
    members = 0
    while off < len(data):
        assert data[off:off + 2] == b"\x1f\x8b"
        xlen = struct.unpack_from("<H", data, off + 10)[0]
        assert data[off + 12:off + 14] == b"BC"
        bsize = struct.unpack_from("<H", data, off + 16)[0] + 1
        comp = data[off + 12 + xlen: off + bsize - 8]
        crc, isize = struct.unpack_from("<II", data, off + bsize - 8)
        raw = zlib.decompress(comp, -15)
        assert len(raw) == isize and zlib.crc32(raw) == crc
        off += bsize
        members += 1
    assert members >= 2          # payload member(s) + EOF
    assert data.endswith(bamio.BGZF_EOF)
    with gzip.open(p, "rb") as fh:   # stock-gzip readability incl. CRCs
        assert fh.read(4) == b"BAM\x01"


def test_realistic_payload_roundtrip(tmp_path):
    """Round-4 realistic-payload records (151bp HiSeqX weight, VERDICT
    r03 #3): ~10x the inflate bytes of a flags-only record, identical
    FLAG column through both walkers, deterministic for a seed."""
    from libflagstats_tpu.oracle import generate_flags

    x = generate_flags(40_000, seed=11, full_range=True)
    p = tmp_path / "real.bam"
    n = bamio.write_bam(p, x, level=1, payload="realistic", seed=3)
    assert n == x.size
    # single-sourced from the template arithmetic (ADVICE r04 #3);
    # _realistic_chunk asserts the built template matches it exactly
    raw_per_rec = bamio.REALISTIC_REC_LEN
    assert raw_per_rec == 333  # 4 + 32 fixed + 44 name + 76 seq + 151 qual + 26 aux
    np.testing.assert_array_equal(bamio.read_bam_flags(p), x)
    np.testing.assert_array_equal(
        bamio.read_bam_flags_py(p, max_records=2000), x[:2000])
    # record weight really is ~10x the minimal writer's
    p2 = tmp_path / "min.bam"
    bamio.write_bam(p2, x, level=1)
    import gzip as _gz

    with _gz.open(p, "rb") as fh:
        real_raw = len(fh.read())
    with _gz.open(p2, "rb") as fh:
        min_raw = len(fh.read())
    assert real_raw > 8 * min_raw
    assert abs(real_raw - (x.size * raw_per_rec + 12)) < raw_per_rec
    # determinism: same seed -> same bytes
    p3 = tmp_path / "real2.bam"
    bamio.write_bam(p3, x, level=1, payload="realistic", seed=3)
    assert p.read_bytes() == p3.read_bytes()


def test_bam_flagstat_parallel_matches_sequential(tmp_path):
    """Round-4 range-parallel fused walk: resync + arrival-exact
    verification must reproduce the sequential walker bit-exactly on a
    container large enough to engage multiple shards."""
    from libflagstats_tpu.io import native_lib
    from libflagstats_tpu.oracle import flagstat_numpy, generate_flags

    if native_lib.load() is None:
        import pytest

        pytest.skip("native lib unavailable")
    x = generate_flags(300_000, seed=23, full_range=True)
    p = tmp_path / "par.bam"
    bamio.write_bam(p, x, level=1, payload="realistic")   # ~100 MB raw span
    seq = native_lib.fused_flagstat("lfs_bam_flagstat", p, 0)
    par = native_lib.fused_flagstat("lfs_bam_flagstat_parallel", p, 0)
    ref = flagstat_numpy(x)
    np.testing.assert_array_equal(seq.astype(np.int64), ref)
    np.testing.assert_array_equal(par.astype(np.int64), ref)


def test_bam_byte_range_inside_header_is_empty_not_error(tmp_path):
    """Review r1: a shard range that ends inside the BAM header must be
    an EMPTY shard with both endpoints at the record start (so the
    cross-shard chain still stitches), never a ValueError — multihost
    runs on small files / many ranks hit this."""
    from libflagstats_tpu.io import native_lib
    from libflagstats_tpu.oracle import flagstat_numpy, generate_flags

    if native_lib.load() is None:
        import pytest

        pytest.skip("native lib unavailable")
    x = generate_flags(50_000, seed=31, full_range=True)
    p = tmp_path / "hdr.bam"
    bamio.write_bam(p, x, level=1)
    total = bamio.bam_raw_size(p)
    r0 = bamio.flagstat_bam_byte_range(p, 0, 4)      # ends inside header
    assert r0 is not None
    c0, n0, s0, e0 = r0
    assert n0 == 0 and s0 == e0
    r1 = bamio.flagstat_bam_byte_range(p, 4, total)  # rest of the file
    c1, n1, s1, e1 = r1
    assert s1 == e0 and e1 == total and n0 + n1 == x.size
    np.testing.assert_array_equal((c0 + c1).astype(np.int64),
                                  flagstat_numpy(x))
