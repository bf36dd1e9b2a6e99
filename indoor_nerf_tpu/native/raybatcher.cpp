// Native host data pipeline: threaded, double-buffered ray-batch assembly.
//
// The TPU step consumes one [n_rand, 9] float32 batch (ro | rd | rgb) per
// iteration at hundreds of steps/sec. Assembling batches on the Python side
// costs a row-gather + conversion in the GIL; this C++ worker keeps a ring
// of pre-gathered batches ready so the host thread only ever memcpy's.
// Semantics mirror data/pipeline.py::BatchedRaySampler (reference:
// PocketNeRF/run_nerf.py:899-920, 962-973): a shuffled index permutation
// over the global ray pool, consumed in n_rand slices, reshuffled each
// epoch with the epoch counter folded into the seed.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
// Build: see native/build.py (g++ -O3 -shared -fPIC).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct RayBatcher {
  const float* pool;  // [n_rays, row_dim], borrowed from the caller
  int64_t n_rays;
  int64_t row_dim;
  int64_t n_rand;
  uint64_t seed;

  std::vector<int64_t> perm;
  int64_t cursor = 0;
  uint64_t epoch = 0;

  // Ring of prefetched batches.
  static constexpr int kDepth = 4;
  std::vector<std::vector<float>> ring;
  std::queue<int> ready;   // slots with data
  std::queue<int> free_;   // slots to fill
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::atomic<bool> stop{false};
  std::thread worker;

  RayBatcher(const float* pool_, int64_t n_rays_, int64_t row_dim_,
             int64_t n_rand_, uint64_t seed_)
      : pool(pool_), n_rays(n_rays_), row_dim(row_dim_), n_rand(n_rand_),
        seed(seed_) {
    perm.resize(n_rays);
    for (int64_t i = 0; i < n_rays; ++i) perm[i] = i;
    reshuffle();
    ring.resize(kDepth);
    for (int i = 0; i < kDepth; ++i) {
      ring[i].resize(static_cast<size_t>(n_rand) * row_dim);
      free_.push(i);
    }
    worker = std::thread([this] { run(); });
  }

  ~RayBatcher() {
    stop.store(true);
    cv_free.notify_all();
    cv_ready.notify_all();
    if (worker.joinable()) worker.join();
  }

  void reshuffle() {
    std::mt19937_64 rng(seed + 0x9e3779b97f4a7c15ULL * (epoch + 1));
    for (int64_t i = n_rays - 1; i > 0; --i) {
      std::uniform_int_distribution<int64_t> dist(0, i);
      std::swap(perm[i], perm[dist(rng)]);
    }
    cursor = 0;
    ++epoch;
  }

  void fill(std::vector<float>& buf) {
    for (int64_t k = 0; k < n_rand; ++k) {
      if (cursor >= n_rays) reshuffle();
      const float* src = pool + perm[cursor] * row_dim;
      std::memcpy(buf.data() + k * row_dim, src,
                  sizeof(float) * static_cast<size_t>(row_dim));
      ++cursor;
    }
  }

  void run() {
    while (!stop.load()) {
      int slot;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [this] { return stop.load() || !free_.empty(); });
        if (stop.load()) return;
        slot = free_.front();
        free_.pop();
      }
      fill(ring[slot]);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.push(slot);
      }
      cv_ready.notify_one();
    }
  }

  void next(float* out) {
    int slot;
    {
      std::unique_lock<std::mutex> lk(mu);
      cv_ready.wait(lk, [this] { return stop.load() || !ready.empty(); });
      if (stop.load()) return;
      slot = ready.front();
      ready.pop();
    }
    std::memcpy(out, ring[slot].data(),
                sizeof(float) * static_cast<size_t>(n_rand) * row_dim);
    {
      std::lock_guard<std::mutex> lk(mu);
      free_.push(slot);
    }
    cv_free.notify_one();
  }
};

}  // namespace

extern "C" {

void* raybatcher_create(const float* pool, int64_t n_rays, int64_t row_dim,
                        int64_t n_rand, uint64_t seed) {
  return new RayBatcher(pool, n_rays, row_dim, n_rand, seed);
}

void raybatcher_next(void* handle, float* out) {
  static_cast<RayBatcher*>(handle)->next(out);
}

uint64_t raybatcher_epoch(void* handle) {
  return static_cast<RayBatcher*>(handle)->epoch;
}

void raybatcher_destroy(void* handle) {
  delete static_cast<RayBatcher*>(handle);
}

}  // extern "C"
