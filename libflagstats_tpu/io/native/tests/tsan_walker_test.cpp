// TSAN stress for the container walkers' threading: the BAM walker and
// the BGZF-SAM walker run a producer thread (next window's parallel
// inflate pool) concurrently with the main-thread record/line walk and
// the fused counting flushes; the plain-text SAM parser runs
// range-parallel threads into per-range vectors. Any missed
// synchronization between the double-buffered window slots, the
// work-stealing atomics, or the fused flush path shows up here.
//
// Build/run: `make tsan`.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <vector>

#include <zlib.h>

extern "C" {
int64_t lfs_bam_bound(const uint8_t*, int64_t);
int64_t lfs_bam_flags(const uint8_t*, int64_t, uint16_t*, int64_t, int32_t);
int64_t lfs_bam_flagstat(const uint8_t*, int64_t, uint64_t*, int32_t,
                         int64_t);
int64_t lfs_bam_flagstat_parallel(const uint8_t*, int64_t, uint64_t*,
                                  int32_t, int64_t);
int64_t lfs_sam_flags(const uint8_t*, int64_t, uint16_t*, int64_t, int32_t);
int64_t lfs_sam_flagstat(const uint8_t*, int64_t, uint64_t*, int32_t,
                         int64_t);
int64_t lfs_bgzf_sam_flags(const uint8_t*, int64_t, uint16_t*, int64_t,
                           int32_t);
int64_t lfs_bgzf_sam_flagstat(const uint8_t*, int64_t, uint64_t*, int32_t,
                              int64_t);
}

namespace {

std::mt19937_64 rng(7);

std::vector<uint8_t> bgzf_member(const uint8_t* payload, size_t len) {
    uLongf cap = compressBound((uLong)len) + 64;
    std::vector<uint8_t> comp(cap);
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    deflateInit2(&zs, 1, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY);
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

std::vector<uint8_t> bgzf_wrap(const std::vector<uint8_t>& raw) {
    std::vector<uint8_t> f;
    for (size_t off = 0; off < raw.size(); off += 50000) {
        size_t take = std::min<size_t>(50000, raw.size() - off);
        auto m = bgzf_member(raw.data() + off, take);
        f.insert(f.end(), m.begin(), m.end());
    }
    return f;
}

}  // namespace

int main() {
    // big enough that the plain-text parser's 4 MiB-per-range floor
    // still yields multiple parallel ranges (~10 MB of SAM text)
    const int n_records = 600000;
    std::vector<uint16_t> want(n_records);
    for (auto& w : want) w = (uint16_t)(rng() & 0xFFFF);

    // BAM container
    std::vector<uint8_t> raw;
    auto put32 = [&](int32_t v) {
        for (int i = 0; i < 4; i++) raw.push_back((uint8_t)(v >> (8 * i)));
    };
    raw.insert(raw.end(), {'B', 'A', 'M', 1});
    put32(0);
    put32(0);
    for (int r = 0; r < n_records; r++) {
        put32(34);
        put32(-1);
        put32(-1);
        raw.push_back(2);
        raw.push_back(0);
        raw.push_back(0x48);
        raw.push_back(0x12);
        raw.push_back(0);
        raw.push_back(0);
        raw.push_back((uint8_t)(want[r] & 0xFF));
        raw.push_back((uint8_t)(want[r] >> 8));
        put32(0);
        put32(-1);
        put32(-1);
        put32(0);
        raw.push_back('r');
        raw.push_back(0);
    }
    auto bam = bgzf_wrap(raw);

    // SAM text + BGZF-SAM container
    std::string sam = "@HD\tVN:1.6\n";
    char line[64];
    for (int r = 0; r < n_records; r++) {
        std::snprintf(line, sizeof(line), "q%d\t%u\t*\n", r, want[r]);
        sam += line;
    }
    std::vector<uint8_t> sam_raw(sam.begin(), sam.end());
    auto sgz = bgzf_wrap(sam_raw);

    std::vector<uint16_t> out(n_records + 1);
    for (int iter = 0; iter < 4; iter++) {
        int64_t n = lfs_bam_flags(bam.data(), (int64_t)bam.size(),
                                  out.data(), (int64_t)out.size(), 4);
        if (n != n_records) { std::printf("bam walk %lld\n", (long long)n);
                              return 1; }
        uint64_t c1[32] = {0};
        if (lfs_bam_flagstat(bam.data(), (int64_t)bam.size(), c1, 4,
                             5003) != n_records) return 1;
        // round-4 range-parallel walker: shard workers + per-shard
        // cursors under TSan; counters must equal the sequential walk
        uint64_t cp[32] = {0};
        if (lfs_bam_flagstat_parallel(bam.data(), (int64_t)bam.size(), cp,
                                      4, 5003) != n_records) return 1;
        if (std::memcmp(c1, cp, sizeof(c1)) != 0) {
            std::printf("parallel bam counters disagree\n");
            return 1;
        }
        n = lfs_sam_flags(sam_raw.data(), (int64_t)sam_raw.size(),
                          out.data(), (int64_t)out.size(), 4);
        if (n != n_records) { std::printf("sam parse %lld\n", (long long)n);
                              return 1; }
        uint64_t c3[32] = {0};
        if (lfs_sam_flagstat(sam_raw.data(), (int64_t)sam_raw.size(), c3, 4,
                             5003) != n_records) return 1;
        n = lfs_bgzf_sam_flags(sgz.data(), (int64_t)sgz.size(), out.data(),
                               (int64_t)out.size(), 4);
        if (n != n_records) return 1;
        uint64_t c2[32] = {0};
        if (lfs_bgzf_sam_flagstat(sgz.data(), (int64_t)sgz.size(), c2, 4,
                                  5003) != n_records) return 1;
        if (std::memcmp(c1, c2, sizeof(c1)) != 0) {
            std::printf("bam/sam fused counters disagree\n");
            return 1;
        }
        // ring_walk ABORT path under TSan (review r2: the shutdown
        // walked-bump releases every slot's backpressure at once, so
        // workers must re-check stop before writing a slot): corrupt a
        // mid-file DEFLATE payload so the walk errors partway with the
        // pool still in flight; any rc is fine, racing is not
        auto bad = bam;
        bad[bad.size() / 2] ^= 0x5A;
        uint64_t cbad[32] = {0};
        (void)lfs_bam_flagstat(bad.data(), (int64_t)bad.size(), cbad, 4,
                               5003);
        uint64_t cbad2[32] = {0};
        (void)lfs_bam_flagstat_parallel(bad.data(), (int64_t)bad.size(),
                                        cbad2, 4, 5003);
    }
    std::printf("walker tsan OK: bam walk/fused + sam parse + bgzf-sam "
                "walk/fused x4 iterations, 4 threads, no races\n");
    return 0;
}
