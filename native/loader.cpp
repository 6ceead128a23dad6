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
#include <deque>
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

// Per-call completion latch: each in-flight batch owns one, so any number
// of caller threads (loader workers, mining sweep, eval embed) can submit
// CONCURRENTLY and the worker pool interleaves their files — no
// batch-granular serialization.
struct Batch {
  std::atomic<int64_t> remaining;
  std::atomic<int64_t> failed{0};  // first-fail file index + 1
  std::mutex mu;
  std::condition_variable cv;
  explicit Batch(int64_t n) : remaining(n) {}
};

struct Task {
  const char* path;
  int64_t n_points;
  float* out;
  int64_t index;  // within its batch (failure reporting)
  Batch* batch;
};

class Pool {
 public:
  explicit Pool(int n_threads) : stop_(false) {
    grow(n_threads);
  }

  // Grow-only resize: adding workers to the shared queue is always safe
  // (they just start pulling tasks); shrinking is never needed. Caller
  // holds g_pool_mu.
  void grow(int n_threads) {
    while (static_cast<int>(threads_.size()) < n_threads)
      threads_.emplace_back([this]() { this->run(); });
  }

  int size() const { return static_cast<int>(threads_.size()); }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_work_.notify_all();
    for (auto& th : threads_) th.join();
  }

  // Blocks until this batch is done. Returns 0 or first-fail index + 1.
  // Thread-safe: concurrent calls share the worker pool task queue.
  int64_t load_batch(const char** paths, int64_t n_files, int64_t n_points,
                     float* out) {
    if (n_files <= 0) return 0;
    Batch batch(n_files);
    {
      std::lock_guard<std::mutex> lk(mu_);
      for (int64_t i = 0; i < n_files; ++i)
        queue_.push_back(Task{paths[i], n_points, out + i * n_points * 3, i,
                              &batch});
    }
    cv_work_.notify_all();
    std::unique_lock<std::mutex> lk(batch.mu);
    batch.cv.wait(lk, [&]() { return batch.remaining.load() == 0; });
    return batch.failed.load();
  }

 private:
  void run() {
    for (;;) {
      Task task;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_work_.wait(lk, [&]() { return stop_ || !queue_.empty(); });
        if (stop_) return;
        task = queue_.front();
        queue_.pop_front();
      }
      if (load_one(task.path, task.n_points, task.out) != 0) {
        int64_t expect = 0;
        task.batch->failed.compare_exchange_strong(expect, task.index + 1);
      }
      {
        // Decrement UNDER the batch mutex: the waiter's predicate check
        // also runs under it, so it cannot observe remaining==0 (and
        // destroy the stack-allocated Batch) while this worker still
        // holds a reference — a spurious wakeup would otherwise race a
        // fetch_sub-then-lock sequence into use-after-free.
        std::lock_guard<std::mutex> lk(task.batch->mu);
        if (task.batch->remaining.fetch_sub(1) == 1)
          task.batch->cv.notify_all();
      }
    }
  }

  std::vector<std::thread> threads_;
  std::mutex mu_;
  std::condition_variable cv_work_;
  bool stop_;
  std::deque<Task> queue_;
};

std::mutex g_pool_mu;
Pool* g_pool = nullptr;  // created once, process-lifetime (intentional leak)
int g_pool_threads = 0;

}  // namespace

extern "C" {

// Load `n_files` submaps into `out` [n_files, n_points, 3] float32 using a
// persistent worker pool shared by all callers (concurrent batches
// interleave on one task queue). The pool GROWS to the largest `n_threads`
// ever requested and never shrinks — a small first caller cannot pin the
// process at degraded parallelism. Returns 0 on success; else the index of
// the first failure + 1.
int64_t epcnet_load_batch(const char** paths, int64_t n_files,
                          int64_t n_points, float* out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  {
    std::lock_guard<std::mutex> lk(g_pool_mu);
    if (g_pool == nullptr) g_pool = new Pool(n_threads);
    else if (g_pool->size() < n_threads) g_pool->grow(n_threads);
    g_pool_threads = g_pool->size();
  }
  return g_pool->load_batch(paths, n_files, n_points, out);
}

// Single-file variant (same contract; no pool).
int64_t epcnet_load_file(const char* path, int64_t n_points, float* out) {
  return load_one(path, n_points, out);
}

}  // extern "C"
