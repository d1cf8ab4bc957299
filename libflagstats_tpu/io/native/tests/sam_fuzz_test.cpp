// ASan/UBSan fuzz of the SAM-text FLAG parser (sam_reader.cpp) —
// the parser walks untrusted text (tab/newline placement, digit runs,
// binary garbage all attacker-controlled), so every malformed shape
// must return -3/-5, never read past the buffer or write past the
// output. Same discipline as the BAM walker fuzz (bam_fuzz_test.cpp).
//
// Build/run: `make asan`.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

#include <zlib.h>

extern "C" {
int64_t lfs_sam_bound(const uint8_t* data, int64_t n_bytes);
int64_t lfs_sam_flags(const uint8_t* data, int64_t n_bytes, uint16_t* out,
                      int64_t cap, int32_t threads);
int64_t lfs_sam_flagstat(const uint8_t* data, int64_t n_bytes,
                         uint64_t* counters, int32_t threads,
                         int64_t chunk_flags);
int64_t lfs_bgzf_raw_size(const uint8_t* data, int64_t n_bytes);
int64_t lfs_bgzf_sam_flags(const uint8_t* data, int64_t n_bytes,
                           uint16_t* out, int64_t cap, int32_t threads);
int64_t lfs_bgzf_sam_flagstat(const uint8_t* data, int64_t n_bytes,
                              uint64_t* counters, int32_t threads,
                              int64_t chunk_flags);
int64_t lfs_bgzf_members(const uint8_t* data, int64_t n_bytes);
int64_t lfs_bgzf_sam_flagstat_range(const uint8_t* data, int64_t n_bytes,
                                    int64_t m_start, int64_t m_stop,
                                    uint64_t* counters, int32_t threads,
                                    int64_t chunk_flags);
}

namespace {

std::mt19937_64 rng(54321);

std::string make_sam(int n_records, std::vector<uint16_t>& flags) {
    std::string s = "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000\n";
    flags.clear();
    char line[128];
    for (int i = 0; i < n_records; i++) {
        uint16_t f = (uint16_t)(rng() & 0xFFFF);
        flags.push_back(f);
        std::snprintf(line, sizeof(line),
                      "read%d\t%u\t*\t0\t0\t*\t*\t0\t0\t*\t*\n", i, f);
        s += line;
    }
    return s;
}

int64_t parse(const std::string& s, std::vector<uint16_t>& out,
              int32_t threads = 3) {
    // exact-length heap buffer so ASan sees any 1-byte overread
    std::vector<uint8_t> buf(s.begin(), s.end());
    int64_t bound = lfs_sam_bound(buf.data(), (int64_t)buf.size());
    if (bound < 0) return bound;
    out.assign((size_t)bound, 0);
    return lfs_sam_flags(buf.data(), (int64_t)buf.size(), out.data(), bound,
                         threads);
}

// One BGZF member around payload (mirrors bam_fuzz_test.cpp).
std::vector<uint8_t> bgzf_member(const uint8_t* payload, size_t len) {
    uLongf cap = compressBound((uLong)len) + 64;
    std::vector<uint8_t> comp(cap);
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    deflateInit2(&zs, 6, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY);
    zs.next_in = const_cast<Bytef*>(payload);
    zs.avail_in = (uInt)len;
    zs.next_out = comp.data();
    zs.avail_out = (uInt)cap;
    deflate(&zs, Z_FINISH);
    comp.resize(zs.total_out);
    deflateEnd(&zs);

    std::vector<uint8_t> m;
    uint16_t bsize = (uint16_t)(12 + 6 + comp.size() + 8 - 1);
    const uint8_t head[12] = {0x1F, 0x8B, 8, 4, 0, 0, 0, 0, 0, 0xFF, 6, 0};
    m.insert(m.end(), head, head + 12);
    m.push_back('B');
    m.push_back('C');
    m.push_back(2);
    m.push_back(0);
    m.push_back((uint8_t)(bsize & 0xFF));
    m.push_back((uint8_t)(bsize >> 8));
    m.insert(m.end(), comp.begin(), comp.end());
    uint32_t crc = (uint32_t)crc32(0, payload, (uInt)len);
    for (int i = 0; i < 4; i++) m.push_back((uint8_t)(crc >> (8 * i)));
    for (int i = 0; i < 4; i++) m.push_back((uint8_t)(len >> (8 * i)));
    return m;
}

std::vector<uint8_t> bgzf_compress(const std::string& text,
                                   size_t block = 50000) {
    std::vector<uint8_t> f;
    for (size_t off = 0; off < text.size(); off += block) {
        size_t take = std::min(block, text.size() - off);
        auto m = bgzf_member((const uint8_t*)text.data() + off, take);
        f.insert(f.end(), m.begin(), m.end());
    }
    return f;
}

int64_t parse_bgzf(const std::vector<uint8_t>& f, std::vector<uint16_t>& out,
                   int32_t threads = 3) {
    int64_t raw = lfs_bgzf_raw_size(f.data(), (int64_t)f.size());
    if (raw < 0) return raw;
    out.assign((size_t)(raw / 2 + 1), 0);
    return lfs_bgzf_sam_flags(f.data(), (int64_t)f.size(), out.data(),
                              (int64_t)out.size(), threads);
}

}  // namespace

int main() {
    // 1) clean text parses exactly (threads > 1 exercises range splits)
    std::vector<uint16_t> want;
    auto good = make_sam(30000, want);
    std::vector<uint16_t> out;
    int64_t n = parse(good, out);
    if (n != (int64_t)want.size() ||
        std::memcmp(out.data(), want.data(), want.size() * 2) != 0) {
        std::fprintf(stderr, "clean parse returned %lld\n", (long long)n);
        return 1;
    }

    // 1b) fused plain-text flagstat (tiny chunk -> many flushes) agrees
    //      on the record count; corrupted text must error, never crash
    {
        std::vector<uint8_t> buf(good.begin(), good.end());
        uint64_t counters[32] = {0};
        int64_t fn = lfs_sam_flagstat(buf.data(), (int64_t)buf.size(),
                                      counters, 3, 997);
        if (fn != (int64_t)want.size()) {
            std::fprintf(stderr, "fused sam count returned %lld\n",
                         (long long)fn);
            return 1;
        }
        for (int i = 0; i < 1500; i++) {
            auto c = good;
            c[rng() % c.size()] = (char)(rng() & 0xFF);
            std::vector<uint8_t> cb(c.begin(),
                                    c.begin() + 1 + rng() % c.size());
            uint64_t cnt[32] = {0};
            lfs_sam_flagstat(cb.data(), (int64_t)cb.size(), cnt, 2, 997);
        }
    }

    // 2) truncations at every granularity
    for (int i = 0; i < 3000; i++) {
        std::string t = good.substr(0, rng() % good.size());
        parse(t, out);
    }

    // 3) random byte corruptions (tabs, digits, newlines, binary junk)
    for (int i = 0; i < 6000; i++) {
        auto c = good;
        int hits = 1 + (int)(rng() % 8);
        for (int h = 0; h < hits; h++)
            c[rng() % c.size()] = (char)(rng() & 0xFF);
        parse(c, out);
    }

    // 4) hostile hand-built lines (sizeof-based lengths: embedded NULs
    //    must reach the parser, not truncate the std::string)
    {
#define CASE(lit) std::string(lit, sizeof(lit) - 1)
        const std::string cases[] = {
            CASE(""),                          // empty
            CASE("\n\n\n"),                    // only newlines
            CASE("\t\t\t\n"),                  // only tabs
            CASE("q\t99999999999999999999\n"), // digit run far past uint16
            CASE("q\t65536\n"),                // one past the cap
            CASE("q\t65535\n"),                // at the cap
            CASE("q\t\n"),                     // empty FLAG field
            CASE("q\t5"),                      // no trailing newline
            CASE("q\t5\r"),                    // bare CR end
            CASE("@only\theader\tlines\n@x\n"),
            CASE("\xff\xfe\x00\x01binary\tgarbage"),  // interior NUL + tab
            CASE("q\x00x\t7\n"),               // NUL inside QNAME
            CASE("q\t7\x00\n"),                // NUL after digits
        };
#undef CASE
        for (const std::string& c : cases) parse(c, out);
        // a single giant line with no newline at all (range-split probe
        // finds no '\n')
        std::string giant(5 << 20, 'A');
        giant[100] = '\t';
        parse(giant, out);
    }

    // 5) output-capacity enforcement
    {
        std::vector<uint8_t> buf(good.begin(), good.end());
        std::vector<uint16_t> tiny(16);
        int64_t rc = lfs_sam_flags(buf.data(), (int64_t)buf.size(),
                                   tiny.data(), (int64_t)tiny.size(), 3);
        if (rc != -5) {
            std::fprintf(stderr, "cap overflow not detected (rc=%lld)\n",
                         (long long)rc);
            return 1;
        }
    }

    // 6) BGZF-SAM walker: clean parse exact (members split lines), then
    //    fuzzed containers and the capacity path
    {
        auto gz = bgzf_compress(good);
        std::vector<uint16_t> bout;
        int64_t bn = parse_bgzf(gz, bout);
        if (bn != (int64_t)want.size() ||
            std::memcmp(bout.data(), want.data(), want.size() * 2) != 0) {
            std::fprintf(stderr, "clean bgzf parse returned %lld\n",
                         (long long)bn);
            return 1;
        }
        for (int i = 0; i < 2000; i++) {
            std::vector<uint8_t> t(gz.begin(),
                                   gz.begin() + rng() % gz.size());
            parse_bgzf(t, bout);
        }
        for (int i = 0; i < 4000; i++) {
            auto c = gz;
            int hits = 1 + (int)(rng() % 8);
            for (int h = 0; h < hits; h++)
                c[rng() % c.size()] ^= (uint8_t)(1 + (rng() % 255));
            parse_bgzf(c, bout);
        }
        // fused walk+count (tiny chunk -> many flushes) on clean and
        // corrupted containers
        uint64_t counters[32] = {0};
        int64_t fn = lfs_bgzf_sam_flagstat(gz.data(), (int64_t)gz.size(),
                                           counters, 3, 997);
        if (fn != (int64_t)want.size()) {
            std::fprintf(stderr, "fused bgzf count returned %lld\n",
                         (long long)fn);
            return 1;
        }
        for (int i = 0; i < 1500; i++) {
            auto c = gz;
            c[rng() % c.size()] ^= (uint8_t)(1 + (rng() % 255));
            c.resize(1 + rng() % c.size());
            uint64_t cnt[32] = {0};
            lfs_bgzf_sam_flagstat(c.data(), (int64_t)c.size(), cnt, 2, 997);
        }
        std::vector<uint16_t> tiny(16);
        int64_t rc = lfs_bgzf_sam_flags(gz.data(), (int64_t)gz.size(),
                                        tiny.data(), 16, 3);
        if (rc != -5) {
            std::fprintf(stderr, "bgzf cap overflow not detected "
                         "(rc=%lld)\n", (long long)rc);
            return 1;
        }
        // member-range entry: partition invariance on the clean
        // container + random (possibly invalid) ranges on corrupted ones
        int64_t nm = lfs_bgzf_members(gz.data(), (int64_t)gz.size());
        if (nm <= 1) { std::fprintf(stderr, "bad member count\n"); return 1; }
        int64_t cut = 1 + (int64_t)(rng() % (uint64_t)(nm - 1));
        uint64_t ca[32] = {0}, cb[32] = {0}, cw[32] = {0};
        int64_t na = lfs_bgzf_sam_flagstat_range(
            gz.data(), (int64_t)gz.size(), 0, cut, ca, 2, 997);
        int64_t nb = lfs_bgzf_sam_flagstat_range(
            gz.data(), (int64_t)gz.size(), cut, nm, cb, 2, 997);
        int64_t nw = lfs_bgzf_sam_flagstat(gz.data(), (int64_t)gz.size(),
                                           cw, 2, 997);
        bool same = na >= 0 && nb >= 0 && na + nb == nw;
        for (int k = 0; k < 32 && same; k++)
            same = ca[k] + cb[k] == cw[k];
        if (!same) {
            std::fprintf(stderr, "range partition mismatch at cut %lld\n",
                         (long long)cut);
            return 1;
        }
        for (int i = 0; i < 1500; i++) {
            auto c = gz;
            c[rng() % c.size()] ^= (uint8_t)(1 + (rng() % 255));
            if (rng() & 1) c.resize(1 + rng() % c.size());
            int64_t a = (int64_t)(rng() % (uint64_t)(nm + 2)) - 1;
            int64_t b = (int64_t)(rng() % (uint64_t)(nm + 2)) - 1;
            uint64_t cnt[32] = {0};
            lfs_bgzf_sam_flagstat_range(c.data(), (int64_t)c.size(), a, b,
                                        cnt, 2, 997);
        }
    }

    std::printf("sam fuzz OK: 1 clean + 9000 text + 6000 BGZF "
                "corrupted/truncated + hostile lines, no sanitizer "
                "findings\n");
    return 0;
}
