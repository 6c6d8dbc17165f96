// Native IQ stream loader: a reusable buffer pool fed by a reader thread.
//
// This is the framework's native runtime equivalent of the reference's
// Datastore buffer pool + producer read loop (datastore.{h,cxx},
// acquisition.cxx:276-332) — re-designed as a standalone C++ component
// so the byte-moving path (file descriptors, sockets, pipes) never touches
// Python: the Python/JAX side only acquires filled buffers (zero-copy via
// numpy frombuffer on the returned pointer) and releases them after the
// device DMA has consumed them.
//
// Parity features:
//  * bounded pool with backpressure (reader blocks when no buffer is free);
//  * queue-depth histogram sampled at every reader grab — the reference's
//    "first number nonzero => consumer too slow" diagnostic
//    (acquisition.cxx:279, doc/rtl_power_fftw.1.md:136-148);
//  * optional byte-rate pacing to emulate a real-time SDR source;
//  * optional looping over a finite stream (recorded-file benchmarking).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC loader.cpp -o librpf_loader.so -lpthread

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#include <unistd.h>

namespace {

using Clock = std::chrono::steady_clock;

struct Slot {
  std::vector<uint8_t> data;
  size_t filled = 0;
};

struct Loader {
  std::vector<Slot> slots;
  std::deque<int> free_q;     // slots available for the reader
  std::deque<int> filled_q;   // slots ready for the consumer
  std::vector<long> histogram;  // histogram[n_free] counts, size n_slots+1

  std::mutex mu;
  std::condition_variable cv;
  std::thread reader;
  std::atomic<bool> stop_flag{false};
  bool eof = false;           // reader finished (end of stream or error)
  long bytes_read = 0;

  int fd = -1;
  bool loop = false;
  off_t file_start = 0;
  double pace_bytes_per_s = 0.0;

  ~Loader() { join(); }

  void join() {
    stop_flag.store(true);
    cv.notify_all();
    if (reader.joinable()) reader.join();
  }

  void reader_main() {
    const auto t0 = Clock::now();
    long paced_bytes = 0;
    for (;;) {
      int slot_idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        size_t free_n = free_q.size();
        if (free_n >= histogram.size()) free_n = histogram.size() - 1;
        histogram[free_n]++;
        cv.wait(lk, [&] { return stop_flag.load() || !free_q.empty(); });
        if (stop_flag.load()) return;
        slot_idx = free_q.front();
        free_q.pop_front();
      }

      Slot& slot = slots[slot_idx];
      size_t want = slot.data.size();
      size_t got = 0;
      bool ended = false;
      while (got < want) {
        ssize_t n = ::read(fd, slot.data.data() + got, want - got);
        if (n > 0) {
          got += static_cast<size_t>(n);
        } else if (n == 0) {
          if (loop) {
            if (::lseek(fd, file_start, SEEK_SET) < 0) { ended = true; break; }
          } else {
            ended = true;
            break;
          }
        } else {
          ended = true;  // read error: treat as end of stream
          break;
        }
        if (stop_flag.load()) { ended = true; break; }
      }

      if (pace_bytes_per_s > 0.0 && got > 0) {
        // Sleep so cumulative delivery tracks the requested byte rate.
        paced_bytes += static_cast<long>(got);
        auto due = t0 + std::chrono::duration_cast<Clock::duration>(
            std::chrono::duration<double>(paced_bytes / pace_bytes_per_s));
        std::this_thread::sleep_until(due);
      }

      {
        std::lock_guard<std::mutex> lk(mu);
        slot.filled = got;
        bytes_read += static_cast<long>(got);
        if (got > 0) {
          filled_q.push_back(slot_idx);
        } else {
          free_q.push_back(slot_idx);
        }
        if (ended) eof = true;
        cv.notify_all();
      }
      if (ended) return;
    }
  }
};

}  // namespace

extern "C" {

Loader* rpf_loader_create(size_t buf_bytes, int n_buffers) {
  if (buf_bytes == 0 || n_buffers <= 0) return nullptr;
  auto* L = new Loader();
  L->slots.resize(static_cast<size_t>(n_buffers));
  for (int i = 0; i < n_buffers; i++) {
    L->slots[static_cast<size_t>(i)].data.resize(buf_bytes);
    L->free_q.push_back(i);
  }
  L->histogram.assign(static_cast<size_t>(n_buffers) + 1, 0);
  return L;
}

// Start streaming from a file descriptor. `loop` restarts at the current
// offset on EOF; `pace_bytes_per_s` throttles delivery (0 = full speed).
int rpf_loader_start_fd(Loader* L, int fd, int loop, double pace_bytes_per_s) {
  if (!L || fd < 0 || L->reader.joinable()) return -1;
  L->fd = fd;
  L->loop = loop != 0;
  L->file_start = ::lseek(fd, 0, SEEK_CUR);
  if (L->file_start < 0) L->file_start = 0;  // non-seekable: loop disabled
  L->pace_bytes_per_s = pace_bytes_per_s;
  L->stop_flag.store(false);
  L->eof = false;
  L->reader = std::thread(&Loader::reader_main, L);
  return 0;
}

// Acquire the next filled buffer. Returns the slot index (>= 0), -1 on
// timeout, or -2 on end-of-stream with nothing left to deliver.
int rpf_loader_acquire(Loader* L, uint8_t** data, size_t* len, int timeout_ms) {
  if (!L) return -1;
  std::unique_lock<std::mutex> lk(L->mu);
  auto pred = [&] { return !L->filled_q.empty() || L->eof || L->stop_flag.load(); };
  if (timeout_ms < 0) {
    L->cv.wait(lk, pred);
  } else if (!L->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms), pred)) {
    return -1;
  }
  if (L->filled_q.empty()) return L->eof ? -2 : -1;
  int idx = L->filled_q.front();
  L->filled_q.pop_front();
  if (data) *data = L->slots[static_cast<size_t>(idx)].data.data();
  if (len) *len = L->slots[static_cast<size_t>(idx)].filled;
  return idx;
}

void rpf_loader_release(Loader* L, int slot) {
  if (!L || slot < 0 || static_cast<size_t>(slot) >= L->slots.size()) return;
  std::lock_guard<std::mutex> lk(L->mu);
  L->free_q.push_back(slot);
  L->cv.notify_all();
}

void rpf_loader_histogram(Loader* L, long* out, int n) {
  if (!L || !out) return;
  std::lock_guard<std::mutex> lk(L->mu);
  for (int i = 0; i < n && static_cast<size_t>(i) < L->histogram.size(); i++)
    out[i] = L->histogram[static_cast<size_t>(i)];
}

long rpf_loader_bytes_read(Loader* L) {
  if (!L) return 0;
  std::lock_guard<std::mutex> lk(L->mu);
  return L->bytes_read;
}

int rpf_loader_at_eof(Loader* L) {
  if (!L) return 1;
  std::lock_guard<std::mutex> lk(L->mu);
  return (L->eof && L->filled_q.empty()) ? 1 : 0;
}

void rpf_loader_stop(Loader* L) {
  if (L) L->join();
}

void rpf_loader_destroy(Loader* L) {
  delete L;
}

}  // extern "C"
