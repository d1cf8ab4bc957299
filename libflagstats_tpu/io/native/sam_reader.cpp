// SAM-text FLAG-column parser (native fast path of io/samio.py).
//
// Completes the ingest matrix: the reference's documented workflow is
// `samtools view <bam> | cut -f2 | utility` (reference README.md:56) —
// i.e. it consumes SAM text only after two external tools reduce it to
// a bare FLAG column. Here `flagstat file.sam[.gz]` parses the FLAG
// field (column 2) straight out of SAM lines, so the framework covers
// .sam/.sam.gz alongside .bam (bam_reader.cpp) and raw/framed columns.
//
// Parse contract (strict on what it counts, lenient on what it skips):
//   * lines starting with '@' are headers (SAM QNAME cannot start with
//     '@': spec regex [!-?A-~] excludes 0x40), skipped;
//   * empty lines are skipped;
//   * otherwise column 2 must be 1+ ASCII digits valued <= 65535,
//     delimited by tabs (or line end) -> one FLAG word;
//   * a line with NO tab must itself be a bare FLAG integer — this is
//     the `samtools view | cut -f2` single-column shape the reference's
//     `utility` consumes (reference README.md:56), so one text parser
//     covers both SAM and extracted-column input;
//   * '\r\n' line endings tolerated; a final line without '\n' too.
// Any other shape is a hard error (-3): a count must never be built
// from a misparsed stream.
//
// Parallelism: byte ranges aligned to line starts parse independently
// into thread-local vectors (order preserved by range order), then one
// ordered concatenation into the caller's buffer. Record discovery in
// text is just memchr, so unlike BAM (variable-length binary records,
// bam_reader.cpp phase C) the walk itself parallelizes.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Parse [p, end) (starting at a line boundary) into out.
// Returns 0 or -3 (malformed).
int parse_range(const uint8_t* p, const uint8_t* end,
                std::vector<uint16_t>& out) {
    while (p < end) {
        const uint8_t* nl =
            (const uint8_t*)memchr(p, '\n', (size_t)(end - p));
        const uint8_t* le = nl ? nl : end;
        if (le > p && le[-1] == '\r') --le;           // \r\n
        if (le == p || *p == '@') {                   // empty / header
            p = nl ? nl + 1 : end;
            continue;
        }
        const uint8_t* t =
            (const uint8_t*)memchr(p, '\t', (size_t)(le - p));
        t = t ? t + 1 : p;        // tabless line: bare FLAG integer
        uint32_t v = 0;
        const uint8_t* s = t;
        while (t < le && *t >= '0' && *t <= '9') {
            v = v * 10 + (uint32_t)(*t - '0');
            if (v > 65535u) return -3;                // FLAG is uint16
            ++t;
        }
        if (t == s) return -3;                        // empty/non-numeric
        if (t < le && *t != '\t') return -3;          // junk after digits
        out.push_back((uint16_t)v);
        p = nl ? nl + 1 : end;
    }
    return 0;
}

}  // namespace

extern "C" {

// Upper bound on the number of records (for output allocation): the
// number of lines. One memchr-speed pass; headers only over-reserve.
int64_t lfs_sam_bound(const uint8_t* data, int64_t n_bytes) {
    int64_t lines = 0, off = 0;
    while (off < n_bytes) {
        const uint8_t* nl = (const uint8_t*)memchr(
            data + off, '\n', (size_t)(n_bytes - off));
        if (!nl) { ++lines; break; }                  // final unterminated
        ++lines;
        off = (nl - data) + 1;
    }
    return lines;
}

// Extract the FLAG column from SAM text. Returns the number of flags
// written, or a negative error (-3 malformed, -5 capacity exceeded).
int64_t lfs_sam_flags(const uint8_t* data, int64_t n_bytes, uint16_t* out,
                      int64_t cap, int32_t threads) {
    if (n_bytes == 0) return 0;
    if (threads <= 0) {
        unsigned hw = std::thread::hardware_concurrency();
        threads = hw ? (int32_t)hw : 1;
    }
    // >=4 MiB of text per range; tiny inputs parse on one thread
    int64_t nt = std::min<int64_t>(threads,
                                   std::max<int64_t>(1, n_bytes >> 22));
    std::vector<int64_t> start((size_t)nt + 1);
    start[0] = 0;
    start[(size_t)nt] = n_bytes;
    for (int64_t r = 1; r < nt; ++r) {
        int64_t pos = r * (n_bytes / nt);
        if (pos < start[(size_t)r - 1]) pos = start[(size_t)r - 1];
        const uint8_t* nl = (const uint8_t*)memchr(
            data + pos, '\n', (size_t)(n_bytes - pos));
        start[(size_t)r] = nl ? (nl - data) + 1 : n_bytes;
    }

    std::vector<std::vector<uint16_t>> parts((size_t)nt);
    std::vector<int> rcs((size_t)nt, 0);
    std::atomic<int64_t> next(0);
    auto work = [&]() {
        for (;;) {
            int64_t r = next.fetch_add(1);
            if (r >= nt) return;
            rcs[(size_t)r] = parse_range(data + start[(size_t)r],
                                         data + start[(size_t)r + 1],
                                         parts[(size_t)r]);
        }
    };
    std::vector<std::thread> pool;
    for (int64_t t = 1; t < nt; ++t) pool.emplace_back(work);
    work();
    for (auto& th : pool) th.join();

    int64_t count = 0;
    for (int64_t r = 0; r < nt; ++r) {
        if (rcs[(size_t)r] != 0) return rcs[(size_t)r];
        const auto& v = parts[(size_t)r];
        if (count + (int64_t)v.size() > cap) return -5;
        if (!v.empty())
            std::memcpy(out + count, v.data(), v.size() * sizeof(uint16_t));
        count += (int64_t)v.size();
    }
    return count;
}

}  // extern "C"
