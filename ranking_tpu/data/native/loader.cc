// Native streaming data loader: files -> shuffled, decoded, padded batches.
//
// The runtime-executor counterpart of the reference's tf.data input
// pipeline (tensorflow_ranking/python/data.py:914-1017, which delegates
// threading to TensorFlow's C++ runtime — reader_num_threads /
// num_parser_threads AUTOTUNE at data.py:924-1011). One reader thread owns
// file walking, TFRecord scanning, the shuffle buffer, and record-batch
// assembly (so shuffle order is a pure function of the seed); N decode
// workers parse ELWC protos into padded feature buffers (decoder.cc); a
// sequence-ordered reorder buffer hands batches to the consumer in
// assembly order, making the output stream bit-identical for every
// num_threads. Exposed via a C ABI consumed with ctypes
// (ranking_tpu/data/native).
//
// Build (one .so with the decoder):
//   g++ -O3 -shared -fPIC -std=c++17 -pthread -o libranking_data.so \
//       decoder.cc loader.cc

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

// From decoder.cc.
struct FeatureSpec {
  const char* name;
  int32_t kind;
  int32_t size;
  int64_t buckets;
  float* fout;
  int32_t* iout;
  float default_value;
  int64_t* lout;
  int32_t* present;
  const void* vocab;  // kind 4: rt_vocab_create handle
};

extern "C" int rt_decode_elwc_batch(const uint8_t** recs, const int64_t* lens,
                                    int n, int list_size,
                                    FeatureSpec* ctx_specs, int n_ctx,
                                    FeatureSpec* ex_specs, int n_ex,
                                    int32_t* sizes_out);
extern "C" int rt_decode_seq_batch(const uint8_t** recs, const int64_t* lens,
                                   int n, int list_size,
                                   FeatureSpec* ctx_specs, int n_ctx,
                                   FeatureSpec* ex_specs, int n_ex,
                                   int32_t* sizes_out);
extern "C" int64_t rt_scan_tfrecord(const uint8_t* data, int64_t size,
                                    int64_t* offsets, int64_t* lengths,
                                    int64_t max_records);

namespace {

struct OwnedSpec {
  std::string name;
  int32_t kind;
  int32_t size;
  int64_t buckets;
  float default_value;
  const void* vocab;
};

// Consumer-owned output buffers for ONE batch (numpy memory registered
// via rt_loader_submit). Decode workers write feature values, presence
// counts, and sizes straight into these — the loader holds no
// intermediate buffers and the consumer thread copies nothing. The
// decoder's own prefill covers defaults for the n decoded rows; rows
// beyond n are left as-is and sliced away by the binding.
struct OutPtr {
  float* f = nullptr;
  int32_t* i = nullptr;
  int64_t* l = nullptr;
  int32_t* present = nullptr;
};
struct BufferSet {
  std::vector<OutPtr> ctx, ex;  // parallel to the loader's spec lists
  int32_t* sizes = nullptr;
};

// One mapped (or read) input file, shared by every in-flight record view
// that points into it; unmapped when the last view drops.
struct FileBuf {
  const uint8_t* data = nullptr;
  size_t size = 0;
  bool mapped = false;
  std::string owned;  // fallback when mmap is unavailable
  ~FileBuf() {
    if (mapped && data)
      munmap(const_cast<uint8_t*>(data), size);
  }
};

// Zero-copy record view: the reader never copies record payloads; the
// shuffle buffer and batches hold 24-byte refs into the file mapping.
struct RecordRef {
  std::shared_ptr<FileBuf> owner;
  const uint8_t* p = nullptr;
  int64_t len = 0;
};

// Opens `path` for zero-copy reading. nullptr = hard error (unreadable,
// fstat failure, short read): the caller must surface it — silently
// skipping would train on a partial corpus with no signal. `*skip` is set
// instead for non-regular files (FIFOs/sockets), which are skipped by
// design.
std::shared_ptr<FileBuf> open_file(const std::string& path, bool* skip) {
  *skip = false;
  auto buf = std::make_shared<FileBuf>();
  int fd = ::open(path.c_str(), O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 0) {
    ::close(fd);
    return nullptr;
  }
  if (!S_ISREG(st.st_mode)) {
    ::close(fd);
    *skip = true;
    return nullptr;
  }
  buf->size = static_cast<size_t>(st.st_size);
  if (buf->size > 0) {
    void* m = mmap(nullptr, buf->size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (m != MAP_FAILED) {
      buf->data = static_cast<const uint8_t*>(m);
      buf->mapped = true;
      madvise(m, buf->size, MADV_SEQUENTIAL);
    } else {
      buf->owned.resize(buf->size);
      size_t got = 0;
      while (got < buf->size) {
        ssize_t r = ::read(fd, buf->owned.data() + got, buf->size - got);
        if (r <= 0) break;
        got += static_cast<size_t>(r);
      }
      if (got != buf->size) {
        ::close(fd);
        return nullptr;
      }
      buf->data = reinterpret_cast<const uint8_t*>(buf->owned.data());
    }
  }
  ::close(fd);
  return buf;
}

struct Work {
  int64_t seq;
  std::vector<RecordRef> records;
};

struct Loader {
  std::vector<std::string> paths;
  std::vector<OwnedSpec> ctx_specs, ex_specs;
  int batch_size, list_size, shuffle_buffer, epochs, ring_capacity;
  int format;  // 0 = ELWC, 1 = SequenceExample
  int num_threads;
  bool shuffle, drop_remainder;
  uint64_t seed;
  // Decode-free fast-forward (deterministic data resume): the reader
  // assembles and DROPS this many leading record batches — the shuffle
  // RNG advances identically, no decode work is dispatched, so the
  // stream after the skip is bitwise-equal to batches[skip:] of an
  // unskipped run at mmap-scan speed (~2M rec/s) instead of decode
  // speed. Reader-thread-only field (no locking).
  int64_t skip_batches = 0;

  // Reader -> decoders (bounded; also bounds total in-flight batches).
  std::deque<Work> work_q;
  // Consumer-submitted output buffer sets awaiting a decoder, and
  // finished sequence numbers (seq -> decoded row count), both keyed by
  // assembly sequence number so the output order never depends on
  // decode-thread scheduling. A worker holding work seq s waits for
  // bufs[s]; the consumer submits sets in order, so the oldest pending
  // work always has (or is about to get) its buffers — deadlock-free.
  std::map<int64_t, BufferSet> bufs;
  std::map<int64_t, int> done;
  int64_t next_seq = 0;     // next sequence number the reader will assign
  int64_t next_submit = 0;  // next sequence number a submit will bind to
  int64_t next_out = 0;     // next sequence number the consumer will take
  std::mutex mu;
  std::condition_variable cv_work, cv_space, cv_out, cv_bufs;
  bool reader_done = false;
  int live_decoders = 0;
  std::atomic<bool> stop{false}, error{false};
  std::vector<std::thread> threads;

  ~Loader() {
    {
      // The lock orders this store against a thread that has evaluated
      // its wait predicate but not yet blocked — without it that thread
      // misses the notify and join() deadlocks.
      std::lock_guard<std::mutex> lock(mu);
      stop = true;
    }
    cv_work.notify_all();
    cv_space.notify_all();
    cv_out.notify_all();
    cv_bufs.notify_all();
    for (auto& t : threads)
      if (t.joinable()) t.join();
  }
};

// Decodes one record batch DIRECTLY into the consumer's registered
// buffers (no intermediate copy; rt_decode_*_batch's own prefill covers
// defaults and presence for the n decoded rows).
bool decode_into(Loader* L, std::vector<RecordRef>& records,
                 BufferSet& set) {
  int n = static_cast<int>(records.size());
  std::vector<FeatureSpec> ctx(L->ctx_specs.size());
  std::vector<FeatureSpec> ex(L->ex_specs.size());
  auto build = [&](const std::vector<OwnedSpec>& specs,
                   const std::vector<OutPtr>& ptrs,
                   std::vector<FeatureSpec>& c_specs) {
    for (size_t s = 0; s < specs.size(); ++s) {
      c_specs[s].name = specs[s].name.c_str();
      c_specs[s].kind = specs[s].kind;
      c_specs[s].size = specs[s].size;
      c_specs[s].buckets = specs[s].buckets;
      c_specs[s].default_value = specs[s].default_value;
      c_specs[s].vocab = specs[s].vocab;
      c_specs[s].fout = ptrs[s].f;
      c_specs[s].iout = ptrs[s].i;
      c_specs[s].lout = ptrs[s].l;
      c_specs[s].present = ptrs[s].present;
    }
  };
  build(L->ctx_specs, set.ctx, ctx);
  build(L->ex_specs, set.ex, ex);

  std::vector<const uint8_t*> recs(n);
  std::vector<int64_t> lens(n);
  for (int i = 0; i < n; ++i) {
    recs[i] = records[i].p;
    lens[i] = records[i].len;
  }
  auto decode = L->format == 1 ? rt_decode_seq_batch : rt_decode_elwc_batch;
  return decode(recs.data(), lens.data(), n, L->list_size,
                ctx.data(), static_cast<int>(ctx.size()),
                ex.data(), static_cast<int>(ex.size()),
                set.sizes) == 0;
}

// Reader-thread side: enqueue one assembled record batch for decoding.
void push_work(Loader* L, std::vector<RecordRef>&& records) {
  std::unique_lock<std::mutex> lock(L->mu);
  L->cv_space.wait(lock, [&] {
    return L->stop ||
           static_cast<int>(L->work_q.size()) < L->ring_capacity;
  });
  if (L->stop) return;
  L->work_q.push_back(Work{L->next_seq++, std::move(records)});
  L->cv_work.notify_one();
}

void decode_loop(Loader* L) {
  // Backpressure is the consumer's buffer ring: a worker cannot start a
  // decode until the consumer has registered output buffers for that
  // sequence number (the consumer keeps K sets outstanding), so at most
  // K batches are ever in flight past the work queue. Deadlock-free:
  // work is popped in sequence order and buffers are submitted in
  // sequence order, so the oldest pending work always has its buffers.
  for (;;) {
    Work w;
    BufferSet set;
    {
      std::unique_lock<std::mutex> lock(L->mu);
      L->cv_work.wait(lock, [&] {
        return L->stop || (L->work_q.empty() && L->reader_done) ||
               !L->work_q.empty();
      });
      if (L->stop || (L->work_q.empty() && L->reader_done)) break;
      w = std::move(L->work_q.front());
      L->work_q.pop_front();
    }
    L->cv_space.notify_one();
    {
      std::unique_lock<std::mutex> lock(L->mu);
      L->cv_bufs.wait(lock, [&] {
        return L->stop || L->bufs.count(w.seq) != 0;
      });
      if (L->stop) break;
      auto it = L->bufs.find(w.seq);
      set = std::move(it->second);
      L->bufs.erase(it);
    }
    bool ok = decode_into(L, w.records, set);
    {
      std::lock_guard<std::mutex> lock(L->mu);
      if (!ok) {
        // Data corruption: surface it to the consumer (rt_loader_wait
        // returns -1 -> Python raises) — the one-shot decode path raises
        // for the same input, and the two paths must match in strictness.
        L->error = true;
        L->stop = true;
      } else {
        L->done.emplace(w.seq, static_cast<int>(w.records.size()));
      }
    }
    if (!ok) {
      L->cv_out.notify_all();
      L->cv_work.notify_all();
      L->cv_space.notify_all();
      L->cv_bufs.notify_all();
      break;
    }
    L->cv_out.notify_all();
  }
  {
    std::lock_guard<std::mutex> lock(L->mu);
    --L->live_decoders;
  }
  L->cv_out.notify_all();
}

void read_loop(Loader* L) {
  std::mt19937_64 rng(L->seed);
  std::vector<RecordRef> shuffle_buf;
  shuffle_buf.reserve(L->shuffle_buffer);
  std::vector<RecordRef> pending;

  auto emit = [&](RecordRef&& rec) {
    pending.push_back(std::move(rec));
    if (static_cast<int>(pending.size()) == L->batch_size) {
      if (L->skip_batches > 0) {
        --L->skip_batches;  // fast-forward: drop without dispatching decode
        pending.clear();
      } else {
        push_work(L, std::move(pending));
        pending = {};
      }
      pending.reserve(L->batch_size);
    }
  };

  auto offer = [&](RecordRef&& rec) {
    if (!L->shuffle || L->shuffle_buffer <= 1) {
      emit(std::move(rec));
      return;
    }
    if (static_cast<int>(shuffle_buf.size()) < L->shuffle_buffer) {
      shuffle_buf.push_back(std::move(rec));
      return;
    }
    size_t k = rng() % shuffle_buf.size();
    std::swap(shuffle_buf[k], rec);
    emit(std::move(rec));
  };

  for (int epoch = 0; (L->epochs <= 0 || epoch < L->epochs) && !L->stop;
       ++epoch) {
    std::vector<std::string> order = L->paths;
    if (L->shuffle)
      std::shuffle(order.begin(), order.end(), rng);
    for (const auto& path : order) {
      if (L->stop) break;
      // mmap (fallback: full read) — records are zero-copy views into the
      // mapping, kept alive by the shared FileBuf until the last in-flight
      // record from this file drains. Non-regular files (FIFOs) skip;
      // unreadable/short-read files are a loader error (rt_loader_next
      // returns -1), matching decode-failure strictness.
      bool skip = false;
      std::shared_ptr<FileBuf> buf = open_file(path, &skip);
      if (!buf) {
        if (skip) continue;
        {
          std::lock_guard<std::mutex> lock(L->mu);
          L->error = true;
          L->stop = true;
        }
        L->cv_out.notify_all();
        L->cv_work.notify_all();
        L->cv_space.notify_all();
        break;
      }
      if (buf->size == 0) continue;
      int64_t size = static_cast<int64_t>(buf->size);
      int64_t max_records = size / 16 + 16;
      std::vector<int64_t> offs(max_records), lens(max_records);
      int64_t n = rt_scan_tfrecord(buf->data, size, offs.data(),
                                   lens.data(), max_records);
      for (int64_t i = 0; i < n && !L->stop; ++i)
        offer(RecordRef{buf, buf->data + offs[i], lens[i]});
    }
  }
  if (!L->stop) {
    if (L->shuffle) {
      std::shuffle(shuffle_buf.begin(), shuffle_buf.end(), rng);
      for (auto& rec : shuffle_buf) emit(std::move(rec));
    }
    if (!pending.empty() && !L->drop_remainder) {
      if (L->skip_batches > 0)
        --L->skip_batches;  // the final partial batch counts too
      else
        push_work(L, std::move(pending));
    }
  }
  {
    std::lock_guard<std::mutex> lock(L->mu);
    L->reader_done = true;
  }
  L->cv_work.notify_all();
  L->cv_out.notify_all();
}

}  // namespace

extern "C" {

void* rt_loader_create(const char** paths, int n_paths,
                       FeatureSpec* ctx_specs, int n_ctx,
                       FeatureSpec* ex_specs, int n_ex, int batch_size,
                       int list_size, int shuffle, int shuffle_buffer,
                       int epochs, int drop_remainder, uint64_t seed,
                       int ring_capacity, int format, int num_threads,
                       int64_t skip_batches) {
  auto* L = new Loader();
  for (int i = 0; i < n_paths; ++i) L->paths.emplace_back(paths[i]);
  auto copy = [](FeatureSpec* specs, int n, std::vector<OwnedSpec>* out) {
    for (int i = 0; i < n; ++i)
      out->push_back({specs[i].name, specs[i].kind, specs[i].size,
                      specs[i].buckets, specs[i].default_value,
                      specs[i].vocab});
  };
  copy(ctx_specs, n_ctx, &L->ctx_specs);
  copy(ex_specs, n_ex, &L->ex_specs);
  L->batch_size = batch_size;
  L->list_size = list_size;
  L->shuffle = shuffle != 0;
  L->shuffle_buffer = shuffle_buffer;
  L->epochs = epochs;
  L->drop_remainder = drop_remainder != 0;
  L->seed = seed;
  L->num_threads = num_threads > 0 ? num_threads : 1;
  // The work queue bound also bounds in-flight decoded batches: at most
  // ring_capacity queued + num_threads decoding + that many finished in
  // the reorder buffer awaiting the consumer.
  L->ring_capacity = ring_capacity > 0 ? ring_capacity : 4;
  L->format = format;
  L->skip_batches = skip_batches > 0 ? skip_batches : 0;
  L->live_decoders = L->num_threads;
  L->threads.reserve(L->num_threads + 1);
  for (int i = 0; i < L->num_threads; ++i)
    L->threads.emplace_back(decode_loop, L);
  L->threads.emplace_back(read_loop, L);
  return L;
}

// Pops the next batch (in assembly order) into caller buffers
// (FeatureSpec.fout/iout point at numpy arrays sized for a full batch).
// Returns the number of real rows (0 = end of stream, -1 = a record
// failed to decode).
// Registers one set of consumer-owned output buffers (numpy memory) for
// the next unbound sequence number. The caller must keep the buffers
// alive until rt_loader_wait has returned for that sequence number (or
// the loader is destroyed). Pointer fields (fout/iout/lout/present) are
// copied out of the spec structs immediately; the structs themselves may
// be reused for the next submit.
int rt_loader_submit(void* handle, FeatureSpec* ctx_specs, int n_ctx,
                     FeatureSpec* ex_specs, int n_ex, int32_t* sizes_out) {
  auto* L = static_cast<Loader*>(handle);
  BufferSet set;
  set.ctx.resize(n_ctx);
  for (int s = 0; s < n_ctx; ++s)
    set.ctx[s] = OutPtr{ctx_specs[s].fout, ctx_specs[s].iout,
                        ctx_specs[s].lout, ctx_specs[s].present};
  set.ex.resize(n_ex);
  for (int s = 0; s < n_ex; ++s)
    set.ex[s] = OutPtr{ex_specs[s].fout, ex_specs[s].iout,
                       ex_specs[s].lout, ex_specs[s].present};
  set.sizes = sizes_out;
  {
    std::lock_guard<std::mutex> lock(L->mu);
    L->bufs.emplace(L->next_submit++, std::move(set));
  }
  L->cv_bufs.notify_all();
  return 0;
}

// Blocks until the oldest submitted buffer set is filled; returns its
// decoded row count (0 = end of stream, -1 = stream error). Fill order
// is the submit order (the reorder map keys decode completion by
// sequence number), so the caller pops its oldest outstanding set.
int rt_loader_wait(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lock(L->mu);
  L->cv_out.wait(lock, [&] {
    return L->stop || L->done.count(L->next_out) ||
           (L->reader_done && L->work_q.empty() && L->live_decoders == 0);
  });
  auto it = L->done.find(L->next_out);
  if (it == L->done.end()) return L->error ? -1 : 0;
  int n = it->second;
  L->done.erase(it);
  ++L->next_out;
  return n;
}

void rt_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

}  // extern "C"
