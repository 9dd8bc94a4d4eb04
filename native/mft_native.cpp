// Native data-path for the TPU FL framework.
//
// The reference is pure Python (SURVEY.md §2: no native code anywhere), so
// there is no file to port; this library instead accelerates the real
// host-side hot spots of THIS framework's setup path:
//   - gather_pad: client-major stacking of dataset rows into padded
//     [C, N_max, row] buffers (multithreaded memcpy; the 7 GB CUB-200
//     stacking is memory-bandwidth-bound in numpy's single thread)
//   - dirichlet_partition: per-class Dirichlet(alpha) client assignment
//     with exact-count residual fix (same semantics as
//     data/partition.py::_dirichlet)
//   - read_idx: MNIST IDX file parser
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).
// Build: make -C native   ->  libmft_native.so

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <random>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// gather_pad: out[c, j, :] = src[indices[offsets[c] + j], :] for j < counts[c],
// zeros elsewhere. row_bytes covers all trailing dims. Multithreaded over
// clients (and over rows within a client for skewed shards).
// ---------------------------------------------------------------------------
void gather_pad(const uint8_t* src, int64_t row_bytes,
                const int64_t* indices, const int64_t* offsets,
                const int64_t* counts, int32_t num_clients, int64_t n_max,
                uint8_t* out, int32_t num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  // Zero the padding tail of every client in parallel with the copies:
  // simpler to zero the whole buffer region per client then overwrite.
  std::vector<std::thread> workers;
  std::atomic<int32_t> cursor(0);
  auto work = [&]() {
    for (;;) {
      int32_t c = cursor.fetch_add(1);
      if (c >= num_clients) return;
      uint8_t* dst = out + static_cast<int64_t>(c) * n_max * row_bytes;
      int64_t cnt = counts[c];
      const int64_t* idx = indices + offsets[c];
      for (int64_t j = 0; j < cnt; ++j) {
        std::memcpy(dst + j * row_bytes, src + idx[j] * row_bytes, row_bytes);
      }
      if (cnt < n_max) {
        std::memset(dst + cnt * row_bytes, 0, (n_max - cnt) * row_bytes);
      }
    }
  };
  int32_t nt = std::min<int32_t>(num_threads, num_clients);
  workers.reserve(nt);
  for (int32_t t = 0; t < nt; ++t) workers.emplace_back(work);
  for (auto& w : workers) w.join();
}

// ---------------------------------------------------------------------------
// dirichlet_partition: writes a client id per sample into out_assign.
// Per-class proportions ~ Dirichlet(alpha) (gamma draws normalized), exact
// counts via floor + largest-remainder, contiguous slices of the shuffled
// class index list — the same scheme as data/partition.py::_dirichlet.
// ---------------------------------------------------------------------------
void dirichlet_partition(const int32_t* labels, int64_t n,
                         int32_t num_classes, int32_t num_clients,
                         double alpha, uint64_t seed, int32_t* out_assign) {
  std::mt19937_64 rng(seed);
  std::gamma_distribution<double> gamma(alpha, 1.0);

  std::vector<std::vector<int64_t>> by_class(num_classes);
  for (int64_t i = 0; i < n; ++i) by_class[labels[i]].push_back(i);

  for (int32_t c = 0; c < num_classes; ++c) {
    auto& idx = by_class[c];
    std::shuffle(idx.begin(), idx.end(), rng);
    std::vector<double> props(num_clients);
    double total = 0.0;
    for (auto& p : props) { p = gamma(rng); total += p; }
    if (total <= 0) total = 1.0;

    int64_t m = static_cast<int64_t>(idx.size());
    std::vector<int64_t> cnt(num_clients);
    std::vector<double> frac(num_clients);
    int64_t assigned = 0;
    for (int32_t k = 0; k < num_clients; ++k) {
      double raw = props[k] / total * m;
      cnt[k] = static_cast<int64_t>(raw);
      frac[k] = raw - cnt[k];
      assigned += cnt[k];
    }
    // Largest-remainder residual fix.
    std::vector<int32_t> order(num_clients);
    std::iota(order.begin(), order.end(), 0);
    std::sort(order.begin(), order.end(),
              [&](int32_t a, int32_t b) { return frac[a] > frac[b]; });
    for (int64_t r = 0; r < m - assigned; ++r) cnt[order[r % num_clients]]++;

    int64_t pos = 0;
    for (int32_t k = 0; k < num_clients; ++k) {
      for (int64_t j = 0; j < cnt[k] && pos < m; ++j, ++pos) {
        out_assign[idx[pos]] = k;
      }
    }
    // Any rounding leftovers go to the last client.
    for (; pos < m; ++pos) out_assign[idx[pos]] = num_clients - 1;
  }
}

// ---------------------------------------------------------------------------
// read_idx: parse an IDX file (MNIST format). Returns 0 on success; fills
// ndim, dims (max 4), and copies payload into out (caller-sized). Call with
// out == nullptr to query sizes.
// ---------------------------------------------------------------------------
int32_t read_idx(const char* path, int32_t* ndim, int64_t* dims,
                 uint8_t* out, int64_t out_capacity) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint8_t header[4];
  if (std::fread(header, 1, 4, f) != 4) { std::fclose(f); return -2; }
  int32_t nd = header[3];
  if (nd < 1 || nd > 4) { std::fclose(f); return -3; }
  int64_t total = 1;
  for (int32_t d = 0; d < nd; ++d) {
    uint8_t b[4];
    if (std::fread(b, 1, 4, f) != 4) { std::fclose(f); return -4; }
    dims[d] = (int64_t(b[0]) << 24) | (int64_t(b[1]) << 16) |
              (int64_t(b[2]) << 8) | int64_t(b[3]);
    total *= dims[d];
  }
  *ndim = nd;
  if (out == nullptr) { std::fclose(f); return 0; }
  if (out_capacity < total) { std::fclose(f); return -5; }
  int64_t got = static_cast<int64_t>(std::fread(out, 1, total, f));
  std::fclose(f);
  return got == total ? 0 : -6;
}

int32_t mft_native_version() { return 1; }

}  // extern "C"
