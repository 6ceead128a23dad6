// Native batch submap loader.
//
// Reference equivalent: the reference's data plane is pure-Python
// loading_pointclouds.py reading .bin files on the main thread between
// sess.run calls [LINEAGE; SURVEY.md §3.1 hot loop (c)]. Its *native* layer
// (tf_ops CUDA) maps to Pallas on TPU; the runtime-side native gap is the
// loader: Python threads serialize on the GIL when thousands of float64
// .bin files must be read and converted for the mining sweep / eval embed.
//
// Design: a PERSISTENT thread pool (created once, woken per batch — no
// pthread_create cost per call), pread into thread-local reusable buffers
// (see load_one for why not mmap), and a plain C ABI for ctypes (no
// pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// Read one file of n_points float64 xyz triples; convert into out (float32).
// Plain pread into a reusable THREAD-LOCAL buffer: submap files are ~100 KB,
// so per-file mmap/munmap would cost a TLB-shootdown IPI storm across the
// pool — buffered reads out of the page cache are far cheaper at this size.
int load_one(const char* path, int64_t n_points, float* __restrict__ out) {
  const int fd = ::open(path, O_RDONLY);
  if (fd < 0) return 1;
  const int64_t n_vals = n_points * 3;
  const size_t bytes = static_cast<size_t>(n_vals) * sizeof(double);
  thread_local std::vector<double> buf;
  if (buf.size() < static_cast<size_t>(n_vals)) buf.resize(n_vals);
  size_t off = 0;
  while (off < bytes) {
    const ssize_t got = ::pread(
        fd, reinterpret_cast<char*>(buf.data()) + off, bytes - off, off);
    if (got <= 0) {
      ::close(fd);
      return 2;
    }
    off += static_cast<size_t>(got);
  }
  ::close(fd);
  const double* __restrict__ src = buf.data();
  for (int64_t i = 0; i < n_vals; ++i) out[i] = static_cast<float>(src[i]);
  return 0;
}

class Pool {
 public:
  explicit Pool(int n_threads) : stop_(false), batch_id_(0), pending_(0) {
    for (int t = 0; t < n_threads; ++t)
      threads_.emplace_back([this]() { this->run(); });
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_work_.notify_all();
    for (auto& th : threads_) th.join();
  }

  // Blocks until the whole batch is done. Returns 0 or first-fail index + 1.
  int64_t load_batch(const char** paths, int64_t n_files, int64_t n_points,
                     float* out) {
    std::unique_lock<std::mutex> lk(mu_);
    paths_ = paths;
    n_files_ = n_files;
    n_points_ = n_points;
    out_ = out;
    next_.store(0);
    failed_.store(0);
    pending_ = n_files;
    ++batch_id_;
    cv_work_.notify_all();
    cv_done_.wait(lk, [this]() { return pending_ == 0; });
    return failed_.load();
  }

 private:
  void run() {
    uint64_t seen_batch = 0;
    for (;;) {
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_work_.wait(lk, [&]() { return stop_ || batch_id_ != seen_batch; });
        if (stop_) return;
        seen_batch = batch_id_;
      }
      int64_t done_here = 0;
      for (;;) {
        const int64_t i = next_.fetch_add(1);
        if (i >= n_files_) break;
        if (load_one(paths_[i], n_points_, out_ + i * n_points_ * 3) != 0) {
          int64_t expect = 0;
          failed_.compare_exchange_strong(expect, i + 1);
        }
        ++done_here;
      }
      if (done_here) {
        std::lock_guard<std::mutex> lk(mu_);
        pending_ -= done_here;
        if (pending_ == 0) cv_done_.notify_all();
      } else {
        // Raced past the batch: account nothing, but re-check completion.
        std::lock_guard<std::mutex> lk(mu_);
        if (pending_ == 0) cv_done_.notify_all();
      }
    }
  }

  std::vector<std::thread> threads_;
  std::mutex mu_;
  std::condition_variable cv_work_, cv_done_;
  bool stop_;
  uint64_t batch_id_;
  int64_t pending_;
  const char** paths_ = nullptr;
  int64_t n_files_ = 0, n_points_ = 0;
  float* out_ = nullptr;
  std::atomic<int64_t> next_{0}, failed_{0};
};

std::mutex g_pool_mu;
Pool* g_pool = nullptr;
int g_pool_threads = 0;

}  // namespace

extern "C" {

// Load `n_files` submaps into `out` [n_files, n_points, 3] float32 using a
// persistent pool of `n_threads` workers (pool is (re)built if the size
// changes). Returns 0 on success; else the index of the first failure + 1.
int64_t epcnet_load_batch(const char** paths, int64_t n_files,
                          int64_t n_points, float* out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (g_pool == nullptr || g_pool_threads != n_threads) {
    delete g_pool;
    g_pool = new Pool(n_threads);
    g_pool_threads = n_threads;
  }
  return g_pool->load_batch(paths, n_files, n_points, out);
}

// Single-file variant (same contract; no pool).
int64_t epcnet_load_file(const char* path, int64_t n_points, float* out) {
  return load_one(path, n_points, out);
}

}  // extern "C"
