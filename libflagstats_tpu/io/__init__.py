from .codec import (  # noqa: F401
    BLOCK_BYTES,
    codec_filename,
    compress_block,
    decompress_block,
    iter_framed,
    iter_framed_blocks,
    read_framed,
    write_framed,
)
from .samio import (  # noqa: F401
    generate_binary,
    generate_text,
    read_binary,
    read_sam_flags,
    read_sam_flags_py,
    text_to_binary,
    write_sam,
)


def read_flags_auto(path, threads: int = 0):
    """FLAG column from any supported container, by content sniff:

    * gzip/BGZF whose payload starts ``BAM\\x01`` -> BAM walker
      (io/bamio.py);
    * any other gzip -> SAM text / bare FLAG column, stream-inflated
      (samio.read_sam_flags);
    * plain ``.sam`` / ``.txt`` -> SAM text / bare FLAG column;
    * ``.lz4`` / ``.zst`` -> framed compressed column (the reference's
      own container, flagstats.cpp:136-138), threaded decode;
    * anything else -> raw little-endian uint16 binary column
      (the reference's only input format, reference README.md:56).
    """
    from . import samio

    name = str(path)
    if samio.is_gzip(path):
        import zlib

        with open(path, "rb") as fh:
            d = zlib.decompressobj(31)
            peek = b""
            while len(peek) < 4:
                raw = fh.read(1 << 16)
                if not raw:
                    break
                peek += d.decompress(raw, 4 - len(peek))
        if peek[:4] == b"BAM\x01":
            from .bamio import read_bam_flags

            return read_bam_flags(path, threads=threads)
        return samio.read_sam_flags(path, threads=threads)
    if name.endswith(".bam"):
        # a non-gzip .bam is corrupt; the walker raises the right error
        from .bamio import read_bam_flags

        return read_bam_flags(path, threads=threads)
    if name.endswith((".sam", ".txt")):
        return samio.read_sam_flags(path, threads=threads)
    if name.endswith((".lz4", ".zst")):
        from .codec import read_framed

        codec = "lz4" if name.endswith(".lz4") else "zstd"
        return read_framed(path, codec, n_threads=threads)
    return samio.read_binary(path)
