// xpic_tpu native runtime components.
//
// 1. Reference-equivalent RNG: std::mt19937 + libstdc++ distributions,
//    matching the bit stream of the reference's RandomGenerator
//    (reference: src/utils/random_generator.h — default-seeded mt19937
//    behind uniform_real_distribution<double>(0,1)).  Exposed as batch
//    fills over ctypes so particle loading can reproduce the
//    reference's exact initial conditions.
//
// 2. Async double-buffered binary writer: the TPU-side equivalent of
//    the reference's MPI-IO float32 dump path
//    (src/utils/mpi_binary_file.{h,cpp}) — a background thread drains
//    write requests so device->host->disk streaming overlaps stepping.
//
// Build: make -C native   (g++ -O2 -shared -fPIC, no external deps)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- RNG

struct XpicRng {
  std::mt19937 gen;
  std::uniform_real_distribution<double> uniform01{0.0, 1.0};
};

void* xpic_rng_create(uint32_t seed, int use_default_seed) {
  auto* r = new XpicRng;
  if (!use_default_seed)
    r->gen.seed(seed);
  return r;
}

void xpic_rng_destroy(void* h) { delete static_cast<XpicRng*>(h); }

// Fill `out[n]` with uniform(0,1) doubles from the shared stream.
void xpic_rng_uniform(void* h, double* out, int64_t n) {
  auto* r = static_cast<XpicRng*>(h);
  for (int64_t i = 0; i < n; ++i)
    out[i] = r->uniform01(r->gen);
}

// Raw 32-bit draws (for cross-checking the generator state).
void xpic_rng_raw(void* h, uint32_t* out, int64_t n) {
  auto* r = static_cast<XpicRng*>(h);
  for (int64_t i = 0; i < n; ++i)
    out[i] = r->gen();
}

// ------------------------------------------------------- async writer

struct WriteJob {
  std::string path;
  std::vector<char> data;
};

struct AsyncWriter {
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<WriteJob> queue;
  std::atomic<bool> stop{false};
  std::atomic<int64_t> pending{0};
  std::atomic<int64_t> errors{0};

  void run() {
    for (;;) {
      WriteJob job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop.load() || !queue.empty(); });
        if (queue.empty()) {
          if (stop.load())
            return;
          continue;
        }
        job = std::move(queue.front());
        queue.pop_front();
      }
      FILE* f = std::fopen(job.path.c_str(), "wb");
      if (!f) {
        errors.fetch_add(1);
      } else {
        if (std::fwrite(job.data.data(), 1, job.data.size(), f) !=
            job.data.size())
          errors.fetch_add(1);
        std::fclose(f);
      }
      pending.fetch_sub(1);
      cv.notify_all();
    }
  }
};

void* xpic_writer_create() {
  auto* w = new AsyncWriter;
  w->worker = std::thread([w] { w->run(); });
  return w;
}

void xpic_writer_submit(void* h, const char* path, const void* data,
                        int64_t nbytes) {
  auto* w = static_cast<AsyncWriter*>(h);
  WriteJob job;
  job.path = path;
  job.data.assign(static_cast<const char*>(data),
                  static_cast<const char*>(data) + nbytes);
  {
    std::lock_guard<std::mutex> lk(w->mu);
    w->queue.push_back(std::move(job));
    w->pending.fetch_add(1);
  }
  w->cv.notify_all();
}

// Block until all submitted writes hit the filesystem; returns the
// cumulative error count.
int64_t xpic_writer_flush(void* h) {
  auto* w = static_cast<AsyncWriter*>(h);
  std::unique_lock<std::mutex> lk(w->mu);
  w->cv.wait(lk, [&] { return w->pending.load() == 0; });
  return w->errors.load();
}

void xpic_writer_destroy(void* h) {
  auto* w = static_cast<AsyncWriter*>(h);
  xpic_writer_flush(h);
  w->stop.store(true);
  w->cv.notify_all();
  w->worker.join();
  delete w;
}

}  // extern "C"
