// Native host data-plane for vit2spn-tpu.
//
// The reference's host-side data path is torchvision/PIL transforms in 4
// Python dataloader-worker processes (ssp_vit2spn_tiny.py:101-107). In this
// framework all per-sample math runs on the TPU; what remains on the host is
// pure data movement — gathering shuffled uint8 sample rows into a contiguous
// batch buffer before the device upload. For folder datasets at 256x256 that
// is ~134 MB per effective batch, worth doing with threads + memcpy instead
// of numpy fancy indexing (which is single-threaded and allocates).
//
// Exposed as a tiny C ABI consumed via ctypes (vit2spn_tpu/data/native.py);
// no pybind11 dependency. Build: native/build.sh (g++ -O3 -shared).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather rows: dst[i, :] = src[idx[i], :], parallelized over i.
void vit2spn_gather_u8(const uint8_t* src, const int64_t* idx, uint8_t* dst,
                       int64_t n_idx, int64_t row_bytes, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int64_t> next(0);
  const int64_t chunk = 64;
  auto worker = [&]() {
    for (;;) {
      int64_t start = next.fetch_add(chunk);
      if (start >= n_idx) return;
      int64_t end = start + chunk < n_idx ? start + chunk : n_idx;
      for (int64_t i = start; i < end; ++i) {
        std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes, row_bytes);
      }
    }
  };
  if (n_threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// splitmix64 — deterministic, seedable, no libc rand state.
static inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

// Fisher-Yates shuffled permutation of [0, n).
void vit2spn_shuffled_indices(int64_t n, uint64_t seed, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = i;
  uint64_t s = seed ^ 0xda3e39cb94b95bdbULL;
  for (int64_t i = n - 1; i > 0; --i) {
    uint64_t j = splitmix64(s) % static_cast<uint64_t>(i + 1);
    int64_t tmp = out[i];
    out[i] = out[j];
    out[j] = tmp;
  }
}

// Per-class counts (stratification support): counts[labels[i]] += 1.
void vit2spn_bincount(const int64_t* labels, int64_t n, int64_t num_classes,
                      int64_t* counts) {
  std::memset(counts, 0, sizeof(int64_t) * num_classes);
  for (int64_t i = 0; i < n; ++i) {
    int64_t l = labels[i];
    if (l >= 0 && l < num_classes) counts[l] += 1;
  }
}

}  // extern "C"
