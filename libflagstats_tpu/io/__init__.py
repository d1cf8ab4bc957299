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
        import gzip
        import zlib

        try:
            with gzip.open(path, "rb") as fh:
                peek = fh.read(4)
        except (OSError, EOFError, zlib.error):
            # gzip magic but not a decodable gzip stream. A raw binary
            # FLAG column can legally start with the word 0x8b1f (bytes
            # 1f 8b) — route it as binary unless the name insists on
            # gzip, in which case fail cleanly.
            if name.endswith(".gz"):
                raise ValueError(
                    f"{name}: gzip magic but undecodable stream — "
                    "corrupt or truncated gzip") from None
            return samio.read_binary(path)
        if peek == b"BAM\x01":
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
