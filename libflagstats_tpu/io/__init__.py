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
from .samio import generate_binary, generate_text, read_binary, text_to_binary  # noqa: F401
