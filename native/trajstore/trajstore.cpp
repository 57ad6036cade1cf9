// trajstore — sharded binary trajectory sink/source for rollout data.
//
// The native runtime piece of the framework's data path: the env engine
// produces rollout batches on-device; a learner or offline-RL pipeline wants
// them durably on disk without ever blocking the device loop.  The reference
// library has no data pipeline at all (its only native component is the
// consumed MuJoCo engine); this store is the framework-side equivalent of a
// background data-loader/writer runtime.
//
// Design:
//   * writer: frames are enqueued (memcpy once) onto a bounded ring consumed
//     by a background thread that appends to size-rotated shard files and an
//     index (shard id, offset, length per frame).  Close() drains.
//   * reader: mmap-free positional reads driven by the index; random access
//     by frame id for shuffled batch assembly.
//   * file format: shards "shard_%06d.bin" of [u32 magic][u64 len][payload],
//     index "index.bin" of {u32 shard, u64 offset, u64 len} records, both
//     little-endian, append-only, crash-tolerant (index written after data).
//
// C ABI only — consumed from Python via ctypes (no pybind11 dependency).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x54524a31;  // "TRJ1"

struct Frame {
  std::vector<uint8_t> data;
};

struct IndexRecord {
  uint32_t shard;
  uint64_t offset;
  uint64_t length;
} __attribute__((packed));

struct Writer {
  std::string dir;
  uint64_t shard_bytes;
  uint64_t max_queue_bytes;

  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::deque<Frame> queue;
  uint64_t queued_bytes = 0;
  bool closing = false;

  std::thread worker;
  FILE* shard_file = nullptr;
  FILE* index_file = nullptr;
  uint32_t shard_id = 0;
  uint64_t shard_used = 0;
  std::atomic<uint64_t> frames_written{0};
  std::atomic<int> error{0};

  void open_shard(bool fresh = false) {
    if (shard_file) fclose(shard_file);
    char name[64];
    snprintf(name, sizeof(name), "/shard_%06u.bin", shard_id);
    shard_file = fopen((dir + name).c_str(), "ab");
    if (fresh) shard_used = 0;
    if (!shard_file) error.store(1);
  }

  void restore_from_index() {
    // Reopening an existing store must resume exactly where it left off:
    // shard files are opened in append mode, so shard_id/shard_used have to
    // reflect the last indexed frame or new index offsets point at the wrong
    // file positions (silent corruption).
    FILE* f = fopen((dir + "/index.bin").c_str(), "rb");
    if (!f) return;
    IndexRecord rec;
    uint64_t n = 0;
    while (fread(&rec, sizeof(rec), 1, f) == 1) {
      shard_id = rec.shard;
      shard_used = rec.offset + 12 + rec.length;
      ++n;
    }
    fclose(f);
    frames_written.store(n);
  }

  void run() {
    restore_from_index();
    open_shard();
    index_file = fopen((dir + "/index.bin").c_str(), "ab");
    if (!index_file) error.store(1);
    for (;;) {
      Frame f;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_pop.wait(lk, [&] { return !queue.empty() || closing; });
        if (queue.empty() && closing) break;
        f = std::move(queue.front());
        queue.pop_front();
        queued_bytes -= f.data.size();
        cv_push.notify_all();
      }
      if (error.load()) continue;
      if (shard_used > 0 && shard_used + f.data.size() > shard_bytes) {
        ++shard_id;
        open_shard(/*fresh=*/true);
      }
      uint64_t off = shard_used;
      uint64_t len = f.data.size();
      if (fwrite(&kMagic, 4, 1, shard_file) != 1 ||
          fwrite(&len, 8, 1, shard_file) != 1 ||
          (len && fwrite(f.data.data(), 1, len, shard_file) != len)) {
        error.store(2);
        continue;
      }
      fflush(shard_file);
      IndexRecord rec{shard_id, off, len};
      if (fwrite(&rec, sizeof(rec), 1, index_file) != 1) {
        error.store(3);
        continue;
      }
      fflush(index_file);
      shard_used += 12 + len;
      frames_written.fetch_add(1);
    }
    if (shard_file) fclose(shard_file);
    if (index_file) fclose(index_file);
    shard_file = nullptr;
    index_file = nullptr;
  }
};

struct Reader {
  std::string dir;
  std::vector<IndexRecord> index;
};

}  // namespace

extern "C" {

void* ts_writer_open(const char* dir, uint64_t shard_bytes, uint64_t max_queue_bytes) {
  auto* w = new Writer();
  w->dir = dir;
  w->shard_bytes = shard_bytes ? shard_bytes : (64ull << 20);
  w->max_queue_bytes = max_queue_bytes ? max_queue_bytes : (256ull << 20);
  w->worker = std::thread([w] { w->run(); });
  return w;
}

// Enqueue one frame; blocks only if the background queue is full.
// Returns 0 on success, a nonzero error code if the writer has failed.
int ts_writer_append(void* handle, const uint8_t* data, uint64_t nbytes) {
  auto* w = static_cast<Writer*>(handle);
  if (w->error.load()) return w->error.load();
  Frame f;
  f.data.assign(data, data + nbytes);
  {
    std::unique_lock<std::mutex> lk(w->mu);
    w->cv_push.wait(lk, [&] { return w->queued_bytes + nbytes <= w->max_queue_bytes || w->closing; });
    if (w->closing) return -1;
    w->queued_bytes += nbytes;
    w->queue.push_back(std::move(f));
  }
  w->cv_pop.notify_one();
  return 0;
}

uint64_t ts_writer_frames_written(void* handle) {
  return static_cast<Writer*>(handle)->frames_written.load();
}

uint64_t ts_writer_queue_bytes(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  std::lock_guard<std::mutex> lk(w->mu);
  return w->queued_bytes;
}

// Drain the queue, close files, join the worker. Returns the error code (0 ok).
int ts_writer_close(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  {
    std::lock_guard<std::mutex> lk(w->mu);
    w->closing = true;
  }
  w->cv_pop.notify_all();
  w->cv_push.notify_all();
  if (w->worker.joinable()) w->worker.join();
  int err = w->error.load();
  delete w;
  return err;
}

void* ts_reader_open(const char* dir) {
  auto* r = new Reader();
  r->dir = dir;
  FILE* f = fopen((r->dir + "/index.bin").c_str(), "rb");
  if (f) {
    IndexRecord rec;
    while (fread(&rec, sizeof(rec), 1, f) == 1) r->index.push_back(rec);
    fclose(f);
  }
  return r;
}

uint64_t ts_reader_count(void* handle) {
  return static_cast<Reader*>(handle)->index.size();
}

// Length of frame i (for buffer allocation); 0 if out of range.
uint64_t ts_reader_length(void* handle, uint64_t i) {
  auto* r = static_cast<Reader*>(handle);
  if (i >= r->index.size()) return 0;
  return r->index[i].length;
}

// Copy frame i into out (cap bytes). Returns bytes copied, or -1 on error.
int64_t ts_reader_get(void* handle, uint64_t i, uint8_t* out, uint64_t cap) {
  auto* r = static_cast<Reader*>(handle);
  if (i >= r->index.size()) return -1;
  const IndexRecord& rec = r->index[i];
  if (rec.length > cap) return -1;
  char name[64];
  snprintf(name, sizeof(name), "/shard_%06u.bin", rec.shard);
  FILE* f = fopen((r->dir + name).c_str(), "rb");
  if (!f) return -1;
  int64_t n = -1;
  uint32_t magic = 0;
  uint64_t len = 0;
  if (fseek(f, (long)rec.offset, SEEK_SET) == 0 &&
      fread(&magic, 4, 1, f) == 1 && magic == kMagic &&
      fread(&len, 8, 1, f) == 1 && len == rec.length &&
      fread(out, 1, len, f) == len) {
    n = (int64_t)len;
  }
  fclose(f);
  return n;
}

void ts_reader_close(void* handle) { delete static_cast<Reader*>(handle); }

}  // extern "C"
