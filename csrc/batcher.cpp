// Native host-side batch assembly (SURVEY C6 — the reference's analog is
// torch DataLoader's C++ fork workers; here the corpus is a packed int16
// memmap and "loading" a batch is a strided row gather into one contiguous
// staging buffer that device_put ships to the chip).
//
// The gather is threaded over contiguous output ranges; each row is a
// single memcpy of store_len*2 bytes from the memmap (page-faulting cold
// pages in) into the staging buffer. Determinism is untouched: the caller
// computes the (seed, step)-pure index stream in numpy and passes it in,
// so the native tier is byte-identical to the numpy fancy-index fallback
// (pinned by tests/data/test_native.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Bump when the signatures below change incompatibly.
int32_t ag_batcher_abi_version() { return 1; }

// out[i, :] = clips[idx[i], :] for i in [0, n_idx); both int16 rows of
// store_len samples. Returns n_idx, or -1 on null/invalid arguments
// (including any out-of-range index — checked up front so a bad index can
// never fault mid-copy).
int64_t ag_gather_rows(const int16_t* clips, int64_t n_clips,
                       int64_t store_len, const int64_t* idx, int64_t n_idx,
                       int16_t* out, int32_t n_threads) {
  if (clips == nullptr || idx == nullptr || out == nullptr || n_clips <= 0 ||
      store_len <= 0 || n_idx < 0) {
    return -1;
  }
  for (int64_t i = 0; i < n_idx; ++i) {
    if (idx[i] < 0 || idx[i] >= n_clips) return -1;
  }
  const size_t row_bytes = static_cast<size_t>(store_len) * sizeof(int16_t);
  auto copy_range = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(out + i * store_len, clips + idx[i] * store_len, row_bytes);
    }
  };
  int64_t want = n_threads > 0
                     ? n_threads
                     : static_cast<int64_t>(std::max(
                           1u, std::thread::hardware_concurrency()));
  int64_t workers = std::max<int64_t>(1, std::min(want, n_idx));
  if (workers == 1) {
    copy_range(0, n_idx);
    return n_idx;
  }
  std::vector<std::thread> pool;
  pool.reserve(workers);
  int64_t chunk = (n_idx + workers - 1) / workers;
  for (int64_t w = 0; w < workers; ++w) {
    int64_t lo = w * chunk;
    int64_t hi = std::min(n_idx, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(copy_range, lo, hi);
  }
  for (auto& t : pool) t.join();
  return n_idx;
}

}  // extern "C"
