// BGZF container helpers shared by the BAM walker (bam_reader.cpp) and
// the BGZF-SAM fast path (sam_reader.cpp): member-chain scan off the
// mmapped file (no inflate needed — each gzip member carries its total
// size in the 'BC' extra subfield and its raw size in the ISIZE
// footer) and single-member raw-DEFLATE inflate.
//
// SAM/BAM spec v1.6 layout facts are documented in io/bamio.py.
// Internal linkage (static): each TU carries its own copy; no ABI.
#ifndef LFS_BGZF_H_
#define LFS_BGZF_H_

#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

// libdeflate, when present, decodes whole-buffer DEFLATE 2.5x faster
// than zlib on this host (measured on realistic-payload BGZF members:
// 885 vs 352 MB/s/core — BGZF members are <= 64 KiB whole-buffer
// payloads with the exact raw size known from ISIZE, libdeflate's
// ideal case). The build adds -ldeflate when the header exists; zlib
// remains the portable fallback.
#if defined(__has_include) && !defined(LFS_NO_LIBDEFLATE)
#if __has_include(<libdeflate.h>)
#include <libdeflate.h>
#define LFS_HAVE_LIBDEFLATE 1
#endif
#endif

namespace lfs_bgzf {

struct Member {
    int64_t comp_off;   // offset of the DEFLATE payload in the file
    int64_t comp_len;
    int64_t raw_len;    // ISIZE (uncompressed payload size)
};

// Scan the BGZF member chain. Returns 0, or a negative error
// (-2 truncated, -3 not BGZF / malformed).
inline int scan_members(const uint8_t* d, int64_t n,
                        std::vector<Member>& out) {
    int64_t off = 0;
    while (off < n) {
        if (n - off < 18) return -2;                   // truncated header
        if (d[off] != 0x1F || d[off + 1] != 0x8B || d[off + 2] != 8 ||
            !(d[off + 3] & 4))
            return -3;                                 // not BGZF
        uint16_t xlen;
        std::memcpy(&xlen, d + off + 10, 2);
        if (n - off < 12 + xlen + 8) return -2;
        // find the BC subfield inside the extra area
        int64_t x = off + 12, xend = x + xlen;
        int64_t bsize = -1;
        while (x + 4 <= xend) {
            uint16_t slen;
            std::memcpy(&slen, d + x + 2, 2);
            if (d[x] == 'B' && d[x + 1] == 'C' && slen == 2) {
                uint16_t bs;
                std::memcpy(&bs, d + x + 4, 2);
                bsize = (int64_t)bs + 1;
                break;
            }
            x += 4 + slen;
        }
        if (bsize < 12 + xlen + 8) return -3;          // no/invalid BC
        if (off + bsize > n) return -2;                // truncated member
        uint32_t isize;
        std::memcpy(&isize, d + off + bsize - 4, 4);
        if (isize > 65536u) return -3;                 // spec cap
        Member m;
        m.comp_off = off + 12 + xlen;
        m.comp_len = bsize - 12 - xlen - 8;
        m.raw_len = isize;
        out.push_back(m);
        off += bsize;
    }
    return 0;
}

// Inflate one member's raw-DEFLATE payload. Returns 0 or -4.
inline int inflate_member(const uint8_t* src, int64_t comp_len,
                          uint8_t* dst, int64_t raw_len) {
#ifdef LFS_HAVE_LIBDEFLATE
    // one decompressor per thread, reused across members and FREED at
    // thread exit via RAII — the walkers spawn fresh pool threads per
    // call, so a bare thread_local pointer leaks one ~11 KB
    // decompressor per walker thread (ASan-caught: 144 MB across the
    // fuzz corpus)
    struct LdHolder {
        libdeflate_decompressor* d = libdeflate_alloc_decompressor();
        ~LdHolder() {
            if (d) libdeflate_free_decompressor(d);
        }
    };
    static thread_local LdHolder ld;
    if (ld.d != nullptr) {
        size_t actual = 0;
        libdeflate_result rc = libdeflate_deflate_decompress(
            ld.d, src, (size_t)comp_len, dst, (size_t)raw_len, &actual);
        if (rc != LIBDEFLATE_SUCCESS || (int64_t)actual != raw_len)
            return -4;
        return 0;
    }
    // allocation failure: fall through to zlib
#endif
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) return -4;
    zs.next_in = const_cast<Bytef*>(src);
    zs.avail_in = (uInt)comp_len;
    zs.next_out = dst;
    zs.avail_out = (uInt)raw_len;
    int rc = inflate(&zs, Z_FINISH);
    int64_t got = (int64_t)zs.total_out;
    inflateEnd(&zs);
    if (rc != Z_STREAM_END || got != raw_len) return -4;
    return 0;
}

}  // namespace lfs_bgzf

#endif  // LFS_BGZF_H_
