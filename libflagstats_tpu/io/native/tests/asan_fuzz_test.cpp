// ASan/UBSan fuzz of the LZ4 block decoder against corrupted inputs.
// The decoder parses untrusted compressed payloads; it must reject (or
// produce bounded output for) any byte-flipped / truncated stream
// without touching memory out of bounds.
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

extern "C" {
int64_t lfs_lz4_compress(const uint8_t*, int64_t, uint8_t*, int64_t, int);
int64_t lfs_lz4_bound(int64_t);
int64_t lfs_lz4_decompress(const uint8_t*, int64_t, uint8_t*, int64_t);
int64_t lfs_lz4_decompress_own(const uint8_t*, int64_t, uint8_t*, int64_t);
int64_t lfs_decode_stream(const uint8_t*, int64_t, uint8_t*, int64_t,
                          int codec, int n_threads);
int64_t lfs_flagstat_framed(const uint8_t*, int64_t, int codec,
                            int n_threads, uint64_t* flags,
                            int64_t* n_words_out);
int64_t lfs_flagstat_u16(const uint16_t*, int64_t, uint64_t*, int);
int64_t lfs_zstd_compress(const uint8_t*, int64_t, uint8_t*, int64_t, int);
int64_t lfs_zstd_bound(int64_t);
}

static void put32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back(x & 0xFF); v.push_back((x >> 8) & 0xFF);
    v.push_back((x >> 16) & 0xFF); v.push_back((x >> 24) & 0xFF);
}

int main() {
    std::mt19937 rng(1234);
    int rounds = 0;

    // Regression (advisor round 1): large valid-looking payload decoded
    // into a tiny dst (crafted frame header declaring raw_len < 16 while
    // the payload is >= 33 bytes). The old wild-copy guard compared
    // op <= oend_fast where oend_fast had been clamped to dst, so the
    // first sequence wrote 16 wild bytes into dst regardless of dst_cap.
    {
        std::vector<uint8_t> raw(4096);
        for (auto& b : raw) b = rng() & 0xFF;  // incompressible
        std::vector<uint8_t> comp(lfs_lz4_bound(raw.size()));
        const int64_t c = lfs_lz4_compress(raw.data(), raw.size(),
                                           comp.data(), comp.size(), 0);
        if (c < 33) { printf("setup fail: payload too small\n"); return 1; }
        for (int64_t cap = 0; cap < 32; ++cap) {
            std::vector<uint8_t> tiny(cap ? cap : 1);
            const int64_t r = lfs_lz4_decompress_own(comp.data(), c,
                                                 tiny.data(), cap);
            if (r > cap) { printf("tiny-dst overrun report\n"); return 1; }
        }
        // literal-only stream (one token, 20 literals) into tiny dst
        std::vector<uint8_t> lits;
        lits.push_back(15 << 4);
        lits.push_back(5);  // 15 + 5 = 20 literals
        for (int i = 0; i < 40; ++i) lits.push_back(0x5A);
        for (int64_t cap = 0; cap < 20; ++cap) {
            std::vector<uint8_t> tiny(cap ? cap : 1);
            const int64_t r = lfs_lz4_decompress_own(lits.data(), lits.size(),
                                                 tiny.data(), cap);
            if (r >= 0) { printf("tiny-dst literal accept\n"); return 1; }
        }
    }
    for (int trial = 0; trial < 400; ++trial) {
        const int64_t n = 1 + rng() % 60000;
        std::vector<uint8_t> raw(n);
        switch (trial % 3) {
            case 0: for (auto& b : raw) b = rng() & 0xFF; break;
            case 1: for (auto& b : raw) b = rng() & 0x07; break;
            case 2: {
                const int p = 1 + rng() % 6;
                for (int64_t i = 0; i < n; ++i) raw[i] = (i % p) * 37;
                break;
            }
        }
        std::vector<uint8_t> comp(lfs_lz4_bound(n));
        const int64_t c = lfs_lz4_compress(raw.data(), n, comp.data(),
                                           comp.size(), trial % 5);
        if (c < 0) { printf("compress fail\n"); return 1; }
        comp.resize(c);

        std::vector<uint8_t> out(n);  // exact capacity: ASan sees any overrun
        // valid stream must round-trip
        int64_t r = lfs_lz4_decompress_own(comp.data(), c, out.data(), n);
        if (r != n || memcmp(out.data(), raw.data(), n)) {
            printf("roundtrip fail trial %d\n", trial);
            return 1;
        }
        // corrupted variants: random byte flips and truncations must not
        // crash or overflow (return value may be anything <= capacity)
        for (int k = 0; k < 20; ++k) {
            std::vector<uint8_t> bad(comp);
            if (k % 2 == 0 && !bad.empty()) {
                bad[rng() % bad.size()] ^= 1 << (rng() % 8);
            } else {
                bad.resize(rng() % (bad.size() + 1));
            }
            std::fill(out.begin(), out.end(), 0);
            (void)lfs_lz4_decompress_own(bad.data(), bad.size(), out.data(), n);
            (void)lfs_lz4_decompress(bad.data(), bad.size(), out.data(), n);
            ++rounds;
        }
    }
    // Frame-stream level: lfs_decode_stream parses untrusted
    // [u32 raw_len][u32 comp_len][payload]* headers (the format of
    // benchmark/flagstats.cpp:136-138). Valid multi-block streams must
    // round-trip on the thread pool; header-corrupted / truncated
    // variants must error or stay inside the exact-capacity output.
    int frame_rounds = 0;
    for (int trial = 0; trial < 90; ++trial) {
        const int n_blocks = 1 + rng() % 5;
        const int codec = trial % 3;  // 0 = stored, 1 = lz4, 2 = zstd
        std::vector<uint8_t> raw, stream;
        for (int b = 0; b < n_blocks; ++b) {
            const int64_t n = 1 + rng() % 8000;
            std::vector<uint8_t> blk(n);
            for (auto& x : blk) x = rng() & 0x0F;
            raw.insert(raw.end(), blk.begin(), blk.end());
            std::vector<uint8_t> comp;
            if (codec == 0) {
                comp = blk;
            } else if (codec == 1) {
                comp.resize(lfs_lz4_bound(n));
                const int64_t c = lfs_lz4_compress(blk.data(), n, comp.data(),
                                                   comp.size(), 0);
                if (c < 0) { printf("frame compress fail\n"); return 1; }
                comp.resize(c);
            } else {
                comp.resize(lfs_zstd_bound(n));
                const int64_t c = lfs_zstd_compress(blk.data(), n, comp.data(),
                                                    comp.size(), 1);
                if (c < 0) { printf("frame zstd compress fail\n"); return 1; }
                comp.resize(c);
            }
            put32(stream, static_cast<uint32_t>(n));
            put32(stream, static_cast<uint32_t>(comp.size()));
            stream.insert(stream.end(), comp.begin(), comp.end());
        }
        std::vector<uint8_t> out(raw.size());
        const int64_t r = lfs_decode_stream(stream.data(), stream.size(),
                                            out.data(), out.size(),
                                            codec, 1 + trial % 4);
        if (r != static_cast<int64_t>(raw.size()) ||
            memcmp(out.data(), raw.data(), raw.size())) {
            printf("frame roundtrip fail trial %d\n", trial);
            return 1;
        }
        for (int k = 0; k < 30; ++k) {
            std::vector<uint8_t> bad(stream);
            switch (k % 3) {
                case 0:  // header field flips (raw_len/comp_len lies)
                    bad[rng() % (bad.size() < 8 ? bad.size() : 8)] ^=
                        1 << (rng() % 8);
                    break;
                case 1:  // any-byte flip
                    bad[rng() % bad.size()] ^= 1 << (rng() % 8);
                    break;
                case 2:  // truncation (mid-header / mid-payload)
                    bad.resize(rng() % (bad.size() + 1));
                    break;
            }
            std::fill(out.begin(), out.end(), 0);
            const int64_t rr = lfs_decode_stream(bad.data(), bad.size(),
                                                 out.data(), out.size(),
                                                 codec, 1 + k % 4);
            if (rr > static_cast<int64_t>(out.size())) {
                printf("frame overrun report trial %d\n", trial);
                return 1;
            }
            // the fused decode+count entry parses the same untrusted
            // headers with NO caller-provided output bound — it must
            // reject or count within its own buffers (rc 0 or -1; odd
            // raw_len streams are always rejected)
            uint64_t fl[32] = {0};
            int64_t nw = -1;
            const int64_t fr = lfs_flagstat_framed(bad.data(), bad.size(),
                                                   codec, 1 + k % 4, fl, &nw);
            if (fr != 0 && fr != -1) {
                printf("framed flagstat bad rc trial %d\n", trial);
                return 1;
            }
            ++frame_rounds;
        }
    }
    // deterministic negative-int32 headers: raw_len/comp_len with the
    // top bit set must be rejected by BOTH C entries exactly like the
    // Python parsers' signed `<i` reads (a 0x80000000 raw_len once
    // reached buf.resize(2 GiB) in each fused worker — code-review
    // finding, 2026-08-18)
    for (uint32_t lie : {0x80000000u, 0xFFFFFFFEu}) {
        std::vector<uint8_t> s;
        put32(s, lie);          // raw_len lies
        put32(s, 4u);
        s.insert(s.end(), {1, 2, 3, 4});
        uint64_t fl[32] = {0};
        int64_t nw = 0;
        uint8_t tiny[8];
        if (lfs_flagstat_framed(s.data(), s.size(), 1, 2, fl, &nw) != -1 ||
            lfs_decode_stream(s.data(), s.size(), tiny, sizeof tiny, 1, 2)
                != -1) {
            printf("negative-int32 header accepted\n");
            return 1;
        }
        std::vector<uint8_t> s2;
        put32(s2, 4u);
        put32(s2, lie);         // comp_len lies
        s2.insert(s2.end(), {1, 2, 3, 4});
        if (lfs_flagstat_framed(s2.data(), s2.size(), 1, 2, fl, &nw) != -1 ||
            lfs_decode_stream(s2.data(), s2.size(), tiny, sizeof tiny, 1, 2)
                != -1) {
            printf("negative-int32 comp_len accepted\n");
            return 1;
        }
    }
    // fused decode+count round-trip on well-formed word streams (even
    // raw_len): counters must match a direct count of the raw words
    for (int trial = 0; trial < 12; ++trial) {
        const int codec = trial % 3;
        const int64_t n_words = 1 + rng() % 40000;
        std::vector<uint8_t> raw(2 * n_words), stream;
        for (auto& x : raw) x = rng() & 0xFF;
        for (int64_t o = 0; o < (int64_t)raw.size();) {
            const int64_t blk = std::min<int64_t>(raw.size() - o,
                                                  2 * (1 + rng() % 9000));
            std::vector<uint8_t> comp;
            if (codec == 0) {
                comp.assign(raw.begin() + o, raw.begin() + o + blk);
            } else if (codec == 1) {
                comp.resize(lfs_lz4_bound(blk));
                comp.resize(lfs_lz4_compress(raw.data() + o, blk, comp.data(),
                                             comp.size(), 0));
            } else {
                comp.resize(lfs_zstd_bound(blk));
                comp.resize(lfs_zstd_compress(raw.data() + o, blk, comp.data(),
                                              comp.size(), 1));
            }
            put32(stream, static_cast<uint32_t>(blk));
            put32(stream, static_cast<uint32_t>(comp.size()));
            stream.insert(stream.end(), comp.begin(), comp.end());
            o += blk;
        }
        uint64_t fl[32] = {0}, ref[32] = {0};
        int64_t nw = 0;
        if (lfs_flagstat_framed(stream.data(), stream.size(), codec,
                                1 + trial % 4, fl, &nw) != 0 ||
            nw != n_words) {
            printf("framed flagstat roundtrip fail trial %d\n", trial);
            return 1;
        }
        lfs_flagstat_u16(reinterpret_cast<const uint16_t*>(raw.data()),
                         n_words, ref, 1);
        for (int j = 0; j < 32; ++j)
            if (fl[j] != ref[j]) {
                printf("framed flagstat count mismatch trial %d\n", trial);
                return 1;
            }
    }
    printf("ASan fuzz OK: %d corrupted decodes, %d corrupted frame streams\n",
           rounds, frame_rounds);
    return 0;
}
