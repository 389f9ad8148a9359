// Out-of-core Sorted Mer List construction (the dmSML replacement).
//
// Native-code equivalent of the reference's dmSML C sub-library
// (dmSML/dmsort.c: two-pass distribution sort — pass 1 bins records by
// key prefix across scratch files, pass 2 sorts each bin in memory and
// concatenates) and of FileSML::dmCreate (FileSML.cpp:278-314), rebuilt
// for the libmems_tpu SML layout:
//
//   * canonical spaced-seed keys use the right-aligned representation
//     key = (content << 1) | strand_bit, identical to
//     libmems_tpu/ops/mers.py (bit-parity asserted by tests);
//   * the output file is the libmems_tpu "SMLT0001" format (magic +
//     u64 header quad + position-order keys u64 + key-sorted positions
//     i32), loadable by SortedMerList.load();
//   * compute/I-O overlap uses std::thread double buffering instead of
//     the reference's platform AIO backends (asyncio.c / alinuxaio.c /
//     aPOSIXaio.c / awin32aio.c): one thread rolls the seed window and
//     bins keys while another drains full bin buffers to disk, and in
//     pass 2 the next bin is prefetched while the current one sorts.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread dmsml.cpp -o libdmsml.so

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Rec {
    uint64_t key;
    uint32_t pos;
};

inline bool rec_less(const Rec& a, const Rec& b) {
    return a.key != b.key ? a.key < b.key : a.pos < b.pos;
}

struct SeedSpec {
    int length = 0;
    int weight = 0;
    int offsets[64];
};

SeedSpec parse_seed(uint64_t seed) {
    SeedSpec s;
    if (seed == 0) return s;
    int hi = 63;
    while (!((seed >> hi) & 1)) --hi;
    int lo = 0;
    while (!((seed >> lo) & 1)) ++lo;
    s.length = hi - lo + 1;
    // offsets follow seeds.seed_offsets: bit (length-1) of the
    // normalized pattern is window offset 0
    uint64_t norm = seed >> lo;
    for (int b = s.length - 1; b >= 0; --b)
        if ((norm >> b) & 1) s.offsets[s.weight++] = s.length - 1 - b;
    return s;
}

// canonical key for the window starting at codes[i]
inline uint64_t window_key(const uint8_t* codes, const SeedSpec& s,
                           uint64_t i) {
    uint64_t fwd = 0, rc = 0;
    for (int j = 0; j < s.weight; ++j) {
        uint64_t ch = codes[i + s.offsets[j]];
        fwd |= ch << (2 * (s.weight - 1 - j));
        rc |= (3ull - ch) << (2 * j);
    }
    uint64_t fk = fwd << 1;
    uint64_t rk = (rc << 1) | 1ull;
    return fk < rk ? fk : rk;
}

// -------- double-buffered bin writer (the asyncio.c analog) --------------

class BinWriter {
  public:
    BinWriter(std::vector<FILE*>& files, size_t buf_records)
        : files_(files), cap_(buf_records), bufs_(files.size()),
          done_(false), worker_(&BinWriter::run, this) {
        for (auto& b : bufs_) b.reserve(cap_);
    }

    void add(uint32_t bin, const Rec& r) {
        auto& b = bufs_[bin];
        b.push_back(r);
        if (b.size() >= cap_) flush(bin);
    }

    void flush(uint32_t bin) {
        std::vector<Rec> full;
        full.swap(bufs_[bin]);
        bufs_[bin].reserve(cap_);
        {
            std::unique_lock<std::mutex> lk(mu_);
            space_.wait(lk, [&] { return queue_.size() < 8; });
            queue_.emplace(bin, std::move(full));
        }
        ready_.notify_one();
    }

    void finish() {
        for (uint32_t b = 0; b < bufs_.size(); ++b)
            if (!bufs_[b].empty()) flush(b);
        {
            std::lock_guard<std::mutex> lk(mu_);
            done_ = true;
        }
        ready_.notify_one();
        worker_.join();
    }

  private:
    void run() {
        for (;;) {
            std::pair<uint32_t, std::vector<Rec>> job;
            {
                std::unique_lock<std::mutex> lk(mu_);
                ready_.wait(lk, [&] { return !queue_.empty() || done_; });
                if (queue_.empty()) return;
                job = std::move(queue_.front());
                queue_.pop();
            }
            space_.notify_one();
            fwrite(job.second.data(), sizeof(Rec), job.second.size(),
                   files_[job.first]);
        }
    }

    std::vector<FILE*>& files_;
    size_t cap_;
    std::vector<std::vector<Rec>> bufs_;
    std::queue<std::pair<uint32_t, std::vector<Rec>>> queue_;
    std::mutex mu_;
    std::condition_variable ready_, space_;
    bool done_;
    std::thread worker_;
};

}  // namespace

extern "C" {

// In-memory canonical key extraction (bit-parity oracle for the
// JAX/numpy implementations; also the pass-1 inner loop).
void dmsml_keys(const uint8_t* codes, uint64_t n, uint64_t seed,
                uint64_t* out_keys) {
    SeedSpec s = parse_seed(seed);
    if (s.length == 0 || n < (uint64_t)s.length) return;
    uint64_t windows = n - s.length + 1;
    // code bytes > 3 mark ambiguous bases (N etc.); every window
    // overlapping one carries the all-ones sentinel key (maskNNNNN
    // equivalent, libMems/FileSML.h:135).  Rolling last-bad tracker:
    // O(1) per window.
    int64_t last_bad = -1;
    for (int j = 0; j + 1 < s.length; ++j)
        if (codes[j] > 3) last_bad = j;
    for (uint64_t i = 0; i < windows; ++i) {
        uint64_t j = i + s.length - 1;
        if (codes[j] > 3) last_bad = (int64_t)j;
        out_keys[i] = (last_bad >= (int64_t)i) ? ~0ull
                                               : window_key(codes, s, i);
    }
}

// Out-of-core SML build.  codes: path to a raw byte file of 2-bit codes
// (one byte per base, values 0..3).  Writes the SMLT0001 file to
// out_path, using scratch_dir for bin files.  mem_limit bounds pass-2
// per-bin memory (bytes).  Returns 0 on success.
int dmsml_create(const char* codes_path, const char* out_path,
                 const char* scratch_dir, uint64_t seed,
                 uint64_t mem_limit, int circular) {
    SeedSpec s = parse_seed(seed);
    if (s.length == 0) return 1;

    FILE* cf = fopen(codes_path, "rb");
    if (!cf) return 2;
    fseek(cf, 0, SEEK_END);
    uint64_t length = (uint64_t)ftell(cf);
    fseek(cf, 0, SEEK_SET);
    std::vector<uint8_t> codes(length + (circular ? s.length - 1 : 0));
    if (fread(codes.data(), 1, length, cf) != length) {
        fclose(cf);
        return 2;
    }
    fclose(cf);
    if (circular)
        memcpy(codes.data() + length, codes.data(), s.length - 1);
    uint64_t ext_len = codes.size();
    if (ext_len < (uint64_t)s.length) return 3;
    uint64_t windows = ext_len - s.length + 1;

    if (mem_limit == 0) mem_limit = 256ull << 20;
    uint64_t total_bytes = windows * sizeof(Rec);
    uint32_t n_bins = 1;
    while (n_bins * (mem_limit / 2) < total_bytes && n_bins < 4096)
        n_bins <<= 1;
    int key_bits = 2 * s.weight + 1;
    int bin_shift = key_bits - __builtin_ctz(n_bins);
    if (bin_shift < 0) bin_shift = 0;

    // open the output and lay down header + position-order keys as we
    // stream (single pass over the genome)
    FILE* out = fopen(out_path, "wb");
    if (!out) return 4;
    fwrite("SMLT0001", 1, 8, out);
    uint64_t header[4] = {seed, length, (uint64_t)(circular != 0), windows};
    fwrite(header, sizeof(uint64_t), 4, out);

    std::vector<FILE*> bin_files(n_bins);
    std::vector<std::string> bin_paths(n_bins);
    for (uint32_t b = 0; b < n_bins; ++b) {
        bin_paths[b] = std::string(scratch_dir) + "/dmsml_bin_" +
                       std::to_string(b) + ".tmp";
        bin_files[b] = fopen(bin_paths[b].c_str(), "wb+");
        if (!bin_files[b]) return 5;
    }

    {
        BinWriter writer(bin_files, 1 << 16);
        const size_t KBUF = 1 << 16;
        std::vector<uint64_t> keybuf(KBUF);
        size_t kn = 0;
        int64_t last_bad = -1;
        for (int j = 0; j + 1 < s.length; ++j)
            if (codes[j] > 3) last_bad = j;
        for (uint64_t i = 0; i < windows; ++i) {
            uint64_t jw = i + s.length - 1;
            if (codes[jw] > 3) last_bad = (int64_t)jw;
            uint64_t k = (last_bad >= (int64_t)i)
                             ? ~0ull
                             : window_key(codes.data(), s, i);
            keybuf[kn++] = k;
            if (kn == KBUF) {
                fwrite(keybuf.data(), sizeof(uint64_t), kn, out);
                kn = 0;
            }
            writer.add((uint32_t)(k >> bin_shift) & (n_bins - 1),
                       Rec{k, (uint32_t)i});
        }
        if (kn) fwrite(keybuf.data(), sizeof(uint64_t), kn, out);
        writer.finish();
    }

    // pass 2: sort bins in key-prefix order, prefetching the next bin
    // while the current one sorts (compute/IO overlap)
    auto load_bin = [&](uint32_t b, std::vector<Rec>& dst) {
        FILE* f = bin_files[b];
        fseek(f, 0, SEEK_END);
        uint64_t bytes = (uint64_t)ftell(f);
        fseek(f, 0, SEEK_SET);
        dst.resize(bytes / sizeof(Rec));
        if (bytes && fread(dst.data(), 1, bytes, f) != bytes) dst.clear();
    };

    std::vector<Rec> cur, next;
    load_bin(0, cur);
    std::vector<int32_t> posbuf;
    for (uint32_t b = 0; b < n_bins; ++b) {
        std::thread prefetch;
        if (b + 1 < n_bins)
            prefetch = std::thread([&, b] { load_bin(b + 1, next); });
        std::sort(cur.begin(), cur.end(), rec_less);
        posbuf.resize(cur.size());
        for (size_t i = 0; i < cur.size(); ++i)
            posbuf[i] = (int32_t)cur[i].pos;
        fwrite(posbuf.data(), sizeof(int32_t), posbuf.size(), out);
        if (prefetch.joinable()) prefetch.join();
        cur.swap(next);
        fclose(bin_files[b]);
        remove(bin_paths[b].c_str());
    }
    fclose(out);
    return 0;
}

}  // extern "C"
