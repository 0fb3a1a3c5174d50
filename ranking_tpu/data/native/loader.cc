// Native streaming data loader: files -> shuffled, decoded, padded batches.
//
// The runtime-executor counterpart of the reference's tf.data input
// pipeline (tensorflow_ranking/python/data.py:914-1017, which delegates all
// threading to TensorFlow's C++ runtime): a producer thread walks TFRecord
// files epoch-by-epoch through a shuffle buffer and assembles record
// batches; decode workers parse ELWC protos into padded feature buffers
// (decoder.cc); a bounded ring hands finished batches to the consumer.
// Exposed via a C ABI consumed with ctypes (ranking_tpu/data/native).
//
// Build (one .so with the decoder):
//   g++ -O3 -shared -fPIC -std=c++17 -o libranking_data.so decoder.cc loader.cc

#include <algorithm>
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
};

struct Batch {
  // Parallel to the loader's ctx/ex spec lists: one buffer per feature.
  std::vector<std::vector<float>> ctx_f, ex_f;
  std::vector<std::vector<int32_t>> ctx_i, ex_i;
  std::vector<std::vector<int64_t>> ctx_l, ex_l;
  std::vector<std::vector<int32_t>> ctx_p, ex_p;  // presence counts
  std::vector<int32_t> sizes;
  int n_rows = 0;
};

struct Loader {
  std::vector<std::string> paths;
  std::vector<OwnedSpec> ctx_specs, ex_specs;
  int batch_size, list_size, shuffle_buffer, epochs, ring_capacity;
  int format;  // 0 = ELWC, 1 = SequenceExample
  bool shuffle, drop_remainder;
  uint64_t seed;

  std::deque<Batch> ring;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::atomic<bool> done{false}, stop{false}, error{false};
  std::thread producer;

  ~Loader() {
    {
      // The lock orders this store against a producer that has evaluated
      // its wait predicate but not yet blocked — without it that producer
      // misses the notify and join() deadlocks.
      std::lock_guard<std::mutex> lock(mu);
      stop = true;
    }
    cv_push.notify_all();
    cv_pop.notify_all();
    if (producer.joinable()) producer.join();
  }
};

// Decodes one record batch into a Batch via rt_decode_elwc_batch.
bool decode_batch(Loader* L, std::vector<std::string>& records, Batch* out) {
  int n = static_cast<int>(records.size());
  out->n_rows = n;
  out->sizes.assign(n, 0);
  std::vector<FeatureSpec> ctx(L->ctx_specs.size());
  std::vector<FeatureSpec> ex(L->ex_specs.size());
  out->ctx_f.resize(L->ctx_specs.size());
  out->ctx_i.resize(L->ctx_specs.size());
  out->ctx_l.resize(L->ctx_specs.size());
  out->ctx_p.resize(L->ctx_specs.size());
  out->ex_f.resize(L->ex_specs.size());
  out->ex_i.resize(L->ex_specs.size());
  out->ex_l.resize(L->ex_specs.size());
  out->ex_p.resize(L->ex_specs.size());

  auto fill = [&](const std::vector<OwnedSpec>& specs,
                  std::vector<FeatureSpec>& c_specs,
                  std::vector<std::vector<float>>& fbufs,
                  std::vector<std::vector<int32_t>>& ibufs,
                  std::vector<std::vector<int64_t>>& lbufs,
                  std::vector<std::vector<int32_t>>& pbufs, size_t rows) {
    for (size_t s = 0; s < specs.size(); ++s) {
      c_specs[s].name = specs[s].name.c_str();
      c_specs[s].kind = specs[s].kind;
      c_specs[s].size = specs[s].size;
      c_specs[s].buckets = specs[s].buckets;
      c_specs[s].default_value = specs[s].default_value;
      c_specs[s].fout = nullptr;
      c_specs[s].iout = nullptr;
      c_specs[s].lout = nullptr;
      if (specs[s].kind == 0) {
        fbufs[s].assign(rows * specs[s].size, 0.0f);
        c_specs[s].fout = fbufs[s].data();
      } else if (specs[s].kind <= 2) {
        lbufs[s].assign(rows * specs[s].size, 0);
        c_specs[s].lout = lbufs[s].data();
      } else {
        ibufs[s].assign(rows * specs[s].size, -1);
        c_specs[s].iout = ibufs[s].data();
      }
      pbufs[s].assign(rows, 0);
      c_specs[s].present = pbufs[s].data();
    }
  };
  fill(L->ctx_specs, ctx, out->ctx_f, out->ctx_i, out->ctx_l, out->ctx_p, n);
  fill(L->ex_specs, ex, out->ex_f, out->ex_i, out->ex_l, out->ex_p,
       static_cast<size_t>(n) * L->list_size);

  std::vector<const uint8_t*> recs(n);
  std::vector<int64_t> lens(n);
  for (int i = 0; i < n; ++i) {
    recs[i] = reinterpret_cast<const uint8_t*>(records[i].data());
    lens[i] = static_cast<int64_t>(records[i].size());
  }
  auto decode = L->format == 1 ? rt_decode_seq_batch : rt_decode_elwc_batch;
  return decode(recs.data(), lens.data(), n, L->list_size,
                ctx.data(), static_cast<int>(ctx.size()),
                ex.data(), static_cast<int>(ex.size()),
                out->sizes.data()) == 0;
}

void push_batch(Loader* L, Batch&& b) {
  std::unique_lock<std::mutex> lock(L->mu);
  L->cv_push.wait(lock, [&] {
    return L->stop || static_cast<int>(L->ring.size()) < L->ring_capacity;
  });
  if (L->stop) return;
  L->ring.push_back(std::move(b));
  L->cv_pop.notify_one();
}

void produce(Loader* L) {
  std::mt19937_64 rng(L->seed);
  std::vector<std::string> shuffle_buf;
  shuffle_buf.reserve(L->shuffle_buffer);
  std::vector<std::string> pending;

  // A decode failure is data corruption: surface it to the consumer
  // (rt_loader_next returns -1 -> Python raises) instead of silently
  // dropping the batch — the one-shot decode path raises for the same
  // input, and the two paths must not differ in strictness.
  auto emit_or_fail = [&](Batch&& b, bool ok) {
    if (ok) {
      push_batch(L, std::move(b));
      return;
    }
    {
      std::lock_guard<std::mutex> lock(L->mu);
      L->error = true;
      L->stop = true;
    }
    L->cv_pop.notify_all();
    L->cv_push.notify_all();
  };

  auto emit = [&](std::string&& rec) {
    pending.push_back(std::move(rec));
    if (static_cast<int>(pending.size()) == L->batch_size) {
      Batch b;
      bool ok = decode_batch(L, pending, &b);
      emit_or_fail(std::move(b), ok);
      pending.clear();
    }
  };

  auto offer = [&](std::string&& rec) {
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
      FILE* f = std::fopen(path.c_str(), "rb");
      if (!f) continue;
      // Unseekable inputs (FIFOs, some /proc files) make ftell return -1;
      // feeding that to std::string would throw out of this thread and
      // std::terminate the process. Skip such paths.
      long size = -1;
      if (std::fseek(f, 0, SEEK_END) == 0) size = std::ftell(f);
      if (size < 0 || std::fseek(f, 0, SEEK_SET) != 0) {
        std::fclose(f);
        continue;
      }
      std::string data(static_cast<size_t>(size), '\0');
      if (std::fread(data.data(), 1, data.size(), f) != data.size()) {
        std::fclose(f);
        continue;
      }
      std::fclose(f);
      int64_t max_records = size / 16 + 16;
      std::vector<int64_t> offs(max_records), lens(max_records);
      int64_t n = rt_scan_tfrecord(
          reinterpret_cast<const uint8_t*>(data.data()), size, offs.data(),
          lens.data(), max_records);
      for (int64_t i = 0; i < n && !L->stop; ++i)
        offer(data.substr(static_cast<size_t>(offs[i]),
                          static_cast<size_t>(lens[i])));
    }
  }
  if (!L->stop) {
    if (L->shuffle) {
      std::shuffle(shuffle_buf.begin(), shuffle_buf.end(), rng);
      for (auto& rec : shuffle_buf) emit(std::move(rec));
    }
    if (!pending.empty() && !L->drop_remainder) {
      Batch b;
      bool ok = decode_batch(L, pending, &b);
      emit_or_fail(std::move(b), ok);
    }
  }
  {
    std::lock_guard<std::mutex> lock(L->mu);
    L->done = true;
  }
  L->cv_pop.notify_all();
}

}  // namespace

extern "C" {

void* rt_loader_create(const char** paths, int n_paths,
                       FeatureSpec* ctx_specs, int n_ctx,
                       FeatureSpec* ex_specs, int n_ex, int batch_size,
                       int list_size, int shuffle, int shuffle_buffer,
                       int epochs, int drop_remainder, uint64_t seed,
                       int ring_capacity, int format) {
  auto* L = new Loader();
  for (int i = 0; i < n_paths; ++i) L->paths.emplace_back(paths[i]);
  auto copy = [](FeatureSpec* specs, int n, std::vector<OwnedSpec>* out) {
    for (int i = 0; i < n; ++i)
      out->push_back({specs[i].name, specs[i].kind, specs[i].size,
                      specs[i].buckets, specs[i].default_value});
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
  L->ring_capacity = ring_capacity > 0 ? ring_capacity : 4;
  L->format = format;
  L->producer = std::thread(produce, L);
  return L;
}

// Pops the next batch into caller buffers (FeatureSpec.fout/iout point at
// numpy arrays sized for a full batch). Returns the number of real rows
// (0 = end of stream, -1 = a record failed to decode).
int rt_loader_next(void* handle, FeatureSpec* ctx_specs, int n_ctx,
                   FeatureSpec* ex_specs, int n_ex, int32_t* sizes_out) {
  auto* L = static_cast<Loader*>(handle);
  Batch b;
  {
    std::unique_lock<std::mutex> lock(L->mu);
    L->cv_pop.wait(lock, [&] {
      return L->stop || L->done || !L->ring.empty();
    });
    if (L->ring.empty()) return L->error ? -1 : 0;
    b = std::move(L->ring.front());
    L->ring.pop_front();
  }
  L->cv_push.notify_one();

  auto emitout = [&](FeatureSpec* specs, int n,
                     std::vector<std::vector<float>>& fbufs,
                     std::vector<std::vector<int32_t>>& ibufs,
                     std::vector<std::vector<int64_t>>& lbufs,
                     std::vector<std::vector<int32_t>>& pbufs) {
    for (int s = 0; s < n; ++s) {
      if (specs[s].fout && s < static_cast<int>(fbufs.size()) &&
          !fbufs[s].empty())
        std::memcpy(specs[s].fout, fbufs[s].data(),
                    fbufs[s].size() * sizeof(float));
      if (specs[s].iout && s < static_cast<int>(ibufs.size()) &&
          !ibufs[s].empty())
        std::memcpy(specs[s].iout, ibufs[s].data(),
                    ibufs[s].size() * sizeof(int32_t));
      if (specs[s].lout && s < static_cast<int>(lbufs.size()) &&
          !lbufs[s].empty())
        std::memcpy(specs[s].lout, lbufs[s].data(),
                    lbufs[s].size() * sizeof(int64_t));
      if (specs[s].present && s < static_cast<int>(pbufs.size()) &&
          !pbufs[s].empty())
        std::memcpy(specs[s].present, pbufs[s].data(),
                    pbufs[s].size() * sizeof(int32_t));
    }
  };
  emitout(ctx_specs, n_ctx, b.ctx_f, b.ctx_i, b.ctx_l, b.ctx_p);
  emitout(ex_specs, n_ex, b.ex_f, b.ex_i, b.ex_l, b.ex_p);
  std::memcpy(sizes_out, b.sizes.data(), b.sizes.size() * sizeof(int32_t));
  return b.n_rows;
}

void rt_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

}  // extern "C"
