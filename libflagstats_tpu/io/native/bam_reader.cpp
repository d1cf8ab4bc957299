// BAM/BGZF FLAG-column walker (native fast path of io/bamio.py).
//
// Beyond-reference capability: the reference consumes a pre-extracted
// FLAG column and leans on samtools for the BAM itself (reference
// README.md:56); this walker reads the BAM container directly so the
// framework's `flagstat file.bam` is self-sufficient. Design:
//
//   phase A  scan BGZF member headers off the mmapped file (no inflate:
//            each gzip member carries its total size in the 'BC' extra
//            subfield and its uncompressed size in the ISIZE footer) —
//            this yields an independent work list;
//   phase B  inflate members in PARALLEL (raw DEFLATE, bounded window
//            of in-flight buffers) — BGZF blocks are independent, which
//            is the same block-parallelism samtools itself uses;
//   phase C  a sequential incremental parser walks the decompressed
//            byte stream in member order (records are variable-length,
//            so record discovery is inherently sequential — but it is
//            ~2 loads + a bounds check per record, GB/s-class) and
//            extracts the uint16 FLAG at offset 14 of each record body.
//
// SAM/BAM spec v1.6 layout facts are documented in io/bamio.py.

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

#include "bgzf.h"

extern "C" int64_t lfs_flagstat_u16(const uint16_t* data, int64_t n,
                                    uint64_t* flags, int n_threads);

namespace {

using lfs_bgzf::Member;
using lfs_bgzf::inflate_member;
using lfs_bgzf::scan_members;

constexpr int64_t kMinRecord = 37;  // block_size(4) + fixed(32) + name(>=1)

// Incremental BAM parser over an in-order sequence of byte chunks.
struct Parser {
    enum State {
        MAGIC,      // need 8: "BAM\1" + l_text
        SKIP_TEXT,
        NREF,       // need 4
        LNAME,      // need 4 (per ref)
        SKIP_NAME,  // l_name + 4 (l_ref)
        REC_SIZE,   // need 4
        REC_HEAD,   // need 16 of the record body (flag at 14..15)
        SKIP_REC,   // rest of the record
        FAILED,
    };
    State state = MAGIC;
    uint8_t pend[16];
    int pend_len = 0;
    int64_t skip = 0;
    int64_t nref_left = 0;
    int64_t rec_body = 0;
    uint16_t* out;
    int64_t cap;
    int64_t count = 0;
    int err = 0;
    // Fused-counting hook: when out fills, consume out[0..count) and
    // reset count (return 0) — lets a bounded chunk buffer stand in for
    // the whole column (lfs_bam_flagstat). Absent -> cap is hard (-5).
    std::function<int()> on_full;

    void fail(int e) { state = FAILED; err = e; }

    // true iff a slot is free after (possibly) draining via on_full
    bool make_room() {
        if (count < cap) return true;
        if (!on_full) { fail(-5); return false; }
        int rc = on_full();
        if (rc) { fail(rc); return false; }
        if (count >= cap) { fail(-5); return false; }
        return true;
    }

    // gather `need` bytes into pend across chunk boundaries; returns
    // true when pend holds `need` bytes (and resets pend_len)
    bool gather(const uint8_t*& p, const uint8_t* end, int need) {
        int take = (int)((end - p) < (need - pend_len) ? (end - p)
                                                       : (need - pend_len));
        std::memcpy(pend + pend_len, p, take);
        pend_len += take;
        p += take;
        if (pend_len < need) return false;
        pend_len = 0;
        return true;
    }

    void feed(const uint8_t* p, int64_t len) {
        const uint8_t* end = p + len;
        while (p < end && state != FAILED) {
            switch (state) {
            case MAGIC: {
                if (!gather(p, end, 8)) return;
                if (std::memcmp(pend, "BAM\x01", 4) != 0) return fail(-3);
                int32_t l_text;
                std::memcpy(&l_text, pend + 4, 4);
                if (l_text < 0) return fail(-3);
                skip = l_text;
                state = SKIP_TEXT;
                break;
            }
            case SKIP_TEXT: {
                int64_t take = end - p < skip ? end - p : skip;
                p += take;
                skip -= take;
                if (skip == 0) state = NREF;
                break;
            }
            case NREF: {
                if (!gather(p, end, 4)) return;
                int32_t n_ref;
                std::memcpy(&n_ref, pend, 4);
                if (n_ref < 0) return fail(-3);
                nref_left = n_ref;
                state = nref_left ? LNAME : REC_SIZE;
                break;
            }
            case LNAME: {
                if (!gather(p, end, 4)) return;
                int32_t l_name;
                std::memcpy(&l_name, pend, 4);
                if (l_name < 0) return fail(-3);
                skip = (int64_t)l_name + 4;
                state = SKIP_NAME;
                break;
            }
            case SKIP_NAME: {
                int64_t take = end - p < skip ? end - p : skip;
                p += take;
                skip -= take;
                if (skip == 0) state = --nref_left ? LNAME : REC_SIZE;
                break;
            }
            case REC_SIZE: {
                // fast path: whole records inside this chunk walk in a
                // tight loop (~2 loads + a jump per record) — the state
                // machine below only handles chunk-boundary crossings
                if (pend_len == 0) {
                    while (end - p >= 20) {
                        int32_t bs;
                        std::memcpy(&bs, p, 4);
                        if (bs < 33) return fail(-3);
                        if (end - p < 4 + (int64_t)bs) break;
                        if (!make_room()) return;
                        uint16_t flag;
                        std::memcpy(&flag, p + 4 + 14, 2);
                        out[count++] = flag;
                        p += 4 + (int64_t)bs;
                    }
                    if (p >= end) return;
                }
                if (!gather(p, end, 4)) return;
                int32_t bs;
                std::memcpy(&bs, pend, 4);
                if (bs < 33) return fail(-3);  // fixed 32 + name >= 1
                rec_body = bs;
                state = REC_HEAD;
                break;
            }
            case REC_HEAD: {
                if (!gather(p, end, 16)) return;
                if (!make_room()) return;
                uint16_t flag;
                std::memcpy(&flag, pend + 14, 2);
                out[count++] = flag;
                skip = rec_body - 16;
                state = SKIP_REC;
                break;
            }
            case SKIP_REC: {
                int64_t take = end - p < skip ? end - p : skip;
                p += take;
                skip -= take;
                if (skip == 0) state = REC_SIZE;
                break;
            }
            case FAILED:
                return;
            }
        }
    }

    // true iff the stream may legally end here (no partial anything)
    bool clean_end() const {
        return state == REC_SIZE && pend_len == 0 && err == 0;
    }
};

// Shared walk driver: scan the member chain, then stream the members
// through lfs_bgzf::ring_walk (persistent inflate pool + in-order
// consume; see bgzf.h for the round-4 rationale and measurements).
// Returns 0 or a negative error (inflate failures, the parser's own
// error, truncated EOF).
int walk_bam(const uint8_t* data, int64_t n_bytes, Parser& parser,
             int32_t threads) {
    std::vector<Member> members;
    int rc = scan_members(data, n_bytes, members);
    if (rc != 0) return rc;
    int err = lfs_bgzf::ring_walk(
        data, members, 0, (int64_t)members.size(), threads,
        [&](const uint8_t* p, int64_t len) {
            if (len > 0) parser.feed(p, len);
            return parser.err;
        });
    if (err) return err;
    if (parser.err) return parser.err;
    if (!parser.clean_end()) return -2;  // mid-record EOF: truncated
    return 0;
}

}  // namespace

extern "C" {

// Upper bound on the number of records (for output allocation): scans
// only the BGZF headers. Returns the bound, or a negative error.
int64_t lfs_bam_bound(const uint8_t* data, int64_t n_bytes) {
    std::vector<Member> members;
    int rc = scan_members(data, n_bytes, members);
    if (rc != 0) return rc;
    int64_t raw = 0;
    for (const Member& m : members) raw += m.raw_len;
    return raw / kMinRecord + 1;
}

// Extract the FLAG column. Returns the number of flags written, or a
// negative error (-2 truncated, -3 malformed, -4 inflate failure,
// -5 output capacity exceeded).
int64_t lfs_bam_flags(const uint8_t* data, int64_t n_bytes, uint16_t* out,
                      int64_t cap, int32_t threads) {
    Parser parser;
    parser.out = out;
    parser.cap = cap;
    int rc = walk_bam(data, n_bytes, parser, threads);
    if (rc != 0) return rc;
    return parser.count;
}

// Fused walk+count: the FLAG column never materializes — records drain
// through a bounded chunk buffer into the accumulating host counting
// kernel (flagstats_host.cpp lfs_flagstat_u16; the derived pass-total
// is += n_chunk - fail_chunk per flush, exact under summation by the
// block-accumulate contract, reference: flagstats.cpp:311-332). Memory
// stays O(inflate window + chunk) at any BAM size. Returns the record
// count, or a negative error (-7: counting kernel failure).
int64_t lfs_bam_flagstat(const uint8_t* data, int64_t n_bytes,
                         uint64_t* counters, int32_t threads,
                         int64_t chunk_flags) {
    if (chunk_flags <= 0) chunk_flags = 1 << 22;   // 4Mi flags = 8 MB
    std::vector<uint16_t> chunk((size_t)chunk_flags);
    Parser parser;
    parser.out = chunk.data();
    parser.cap = (int64_t)chunk.size();
    int64_t total = 0;
    parser.on_full = [&]() {
        if (lfs_flagstat_u16(parser.out, parser.count, counters, 1))
            return -7;
        total += parser.count;
        parser.count = 0;
        return 0;
    };
    int rc = walk_bam(data, n_bytes, parser, threads);
    if (rc != 0) return rc;
    if (parser.count) {
        if (lfs_flagstat_u16(parser.out, parser.count, counters, 1))
            return -7;
        total += parser.count;
    }
    return total;
}

}  // extern "C"
