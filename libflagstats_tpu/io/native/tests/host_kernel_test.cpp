// ASan/UBSan exercise of the native host flagstat/pospopcnt kernels:
// random sizes (including sub-body tails, slab and flush boundaries)
// at exact buffer lengths, counts diffed against an independent branchy
// per-word reference (the samtools update semantics,
// reference: FLAGSTAT_scalar_update, libflagstats.h:118-142).
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

extern "C" {
int64_t lfs_flagstat_u16(const uint16_t*, int64_t, uint64_t*, int);
int64_t lfs_pospopcnt_u16(const uint16_t*, int64_t, uint64_t*, int);
}

// Branchy reference, written from the samtools per-record semantics —
// independent of the kernel's transform formulation.
static void ref_flagstat(const uint16_t* d, int64_t n, uint64_t* f) {
    for (int64_t i = 0; i < n; ++i) {
        const uint32_t v = d[i] & 0x0FFF;
        uint64_t* c = f + ((v >> 9) & 1 ? 16 : 0);
        if ((v >> 9) & 1) c[9] += 1;
        if (v & 0x100) {                       // secondary
            c[8] += 1;
        } else if (v & 0x800) {                // supplementary
            c[11] += 1;
        } else if (v & 1) {                    // paired branch
            c[0] += 1;
            if ((v & 2) && !(v & 4)) c[12] += 1;
            if (v & 0x40) c[6] += 1;
            if (v & 0x80) c[7] += 1;
            if ((v & 8) && !(v & 4)) c[13] += 1;
            if (!(v & 4) && !(v & 8)) c[14] += 1;
            // positional bits the transform also keeps in-pair
            if (v & 2) c[1] += 1;
            if (v & 8) c[3] += 1;
            if (v & 0x10) c[4] += 1;
            if (v & 0x20) c[5] += 1;
        }
        if (v & 4) c[2] += 1;
        if (v & 0x400) c[10] += 1;
    }
    uint64_t fail = 0;
    for (int64_t i = 0; i < n; ++i) fail += (d[i] >> 9) & 1;
    f[9] += (uint64_t)n - fail;
}

int main() {
    std::mt19937 rng(99);
    // sizes straddling: the 256-word HS body, the 4096-body flush
    // (1,048,576 words), the 2^21-word thread slab, plus random odds
    std::vector<int64_t> sizes = {0,    1,       17,      255,     256,
                                  257,  4095,    65537,   1048575, 1048576,
                                  1048577, (1 << 21) + 3, (1 << 22) + 9};
    for (int r = 0; r < 6; ++r)
        sizes.push_back((int64_t)(rng() % 3000000));

    // exhaustive: every possible 16-bit word exactly once — covers all
    // 64 transform-table entries and every input-bit combination
    {
        std::vector<uint16_t> all(65536);
        for (uint32_t w = 0; w < 65536; ++w) all[w] = (uint16_t)w;
        uint64_t ref[32] = {0}, got[32] = {0};
        ref_flagstat(all.data(), 65536, ref);
        if (lfs_flagstat_u16(all.data(), 65536, got, 1) != 0) return 1;
        for (int k = 0; k < 32; ++k)
            if (got[k] != ref[k]) {
                std::fprintf(stderr, "exhaustive mismatch k=%d\n", k);
                return 1;
            }
    }

    int checks = 0;
    for (int64_t n : sizes) {
        // EXACT-length heap buffer: one word past the end is a redzone
        std::vector<uint16_t> data((size_t)n);
        for (auto& w : data) w = (uint16_t)(rng() & 0xFFFF);
        const uint16_t* p = data.empty() ? (const uint16_t*)8 : data.data();

        uint64_t ref[32] = {0}, got1[32] = {0}, got4[32] = {0};
        ref_flagstat(p, n, ref);
        if (lfs_flagstat_u16(p, n, got1, 1) != 0) return 1;
        if (lfs_flagstat_u16(p, n, got4, 4) != 0) return 1;
        for (int k = 0; k < 32; ++k) {
            // the kernel counts positional bits 1/3/4/5 identically
            // in-pair; all defined counters must match the branchy ref
            if (got1[k] != ref[k] || got4[k] != ref[k]) {
                std::fprintf(stderr, "flagstat mismatch n=%lld k=%d "
                             "ref=%llu got1=%llu got4=%llu\n",
                             (long long)n, k, (unsigned long long)ref[k],
                             (unsigned long long)got1[k],
                             (unsigned long long)got4[k]);
                return 1;
            }
        }

        uint64_t pref[16] = {0}, pgot[16] = {0};
        for (int64_t i = 0; i < n; ++i)
            for (int k = 0; k < 16; ++k) pref[k] += (data[(size_t)i] >> k) & 1;
        if (lfs_pospopcnt_u16(p, n, pgot, 2) != 0) return 1;
        for (int k = 0; k < 16; ++k)
            if (pgot[k] != pref[k]) {
                std::fprintf(stderr, "pospopcnt mismatch n=%lld k=%d\n",
                             (long long)n, k);
                return 1;
            }
        ++checks;
    }
    std::printf("host_kernel_test OK (%d sizes, 1T/4T, exact buffers)\n",
                checks);
    return 0;
}
