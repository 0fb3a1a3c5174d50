// Native batch decoder for ranking data: ELWC / tf.Example wire format ->
// padded numpy buffers.
//
// TPU-native replacement for the proto-decode hot path the reference
// delegates to TensorFlow's C++ kernels (tf.io.decode_proto /
// parse_example, tensorflow_ranking/python/data.py:83-96,142). One call
// decodes a batch of serialized ExampleListWithContext records directly
// into caller-allocated padded arrays ([B, L, F] floats, [B, L, T] token
// ids with -1 padding, hashed strings) with zero Python-object overhead.
// Exposed via a C ABI consumed with ctypes (ranking_tpu/data/native.py).
//
// Wire contract (field numbers):
//   ExampleListWithContext: examples = repeated bytes 1, context = bytes 2
//   Example.features = 1; Features.feature = map<string, Feature> 1
//   map entry: key = 1, value = 2
//   Feature: bytes_list = 1, float_list = 2, int64_list = 3; *.value = 1
//   (float packed or unpacked, int64 varint packed or unpacked)
//
// Build: g++ -O3 -shared -fPIC -o libranking_data.so decoder.cc

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Slice {
  const uint8_t* p;
  size_t n;
};

// --- varint / wire primitives ---------------------------------------------

inline bool read_varint(const uint8_t*& p, const uint8_t* end, uint64_t* out) {
  uint64_t v = 0;
  int shift = 0;
  while (p < end && shift < 64) {
    uint8_t b = *p++;
    v |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *out = v;
      return true;
    }
    shift += 7;
  }
  return false;
}

// Skips a field with the given wire type. Returns false on malformed input.
inline bool skip_field(const uint8_t*& p, const uint8_t* end, uint32_t wt) {
  uint64_t tmp;
  switch (wt) {
    case 0:
      return read_varint(p, end, &tmp);
    case 1:
      if (end - p < 8) return false;
      p += 8;
      return true;
    case 2:
      if (!read_varint(p, end, &tmp) || tmp > static_cast<uint64_t>(end - p))
        return false;
      p += tmp;
      return true;
    case 5:
      if (end - p < 4) return false;
      p += 4;
      return true;
    default:
      return false;
  }
}

inline bool read_len_delim(const uint8_t*& p, const uint8_t* end, Slice* out) {
  uint64_t len;
  if (!read_varint(p, end, &len) || len > static_cast<uint64_t>(end - p))
    return false;
  out->p = p;
  out->n = static_cast<size_t>(len);
  p += len;
  return true;
}

// --- fnv1a hash (matches ranking_tpu/data/parsers.py) ----------------------

inline uint64_t fnv1a(const uint8_t* p, size_t n) {
  uint64_t h = 0xCBF29CE484222325ULL;
  for (size_t i = 0; i < n; ++i) {
    h ^= p[i];
    h *= 0x100000001B3ULL;
  }
  return h;
}

// --- vocabulary table (matches parsers.Vocabulary) --------------------------
//
// Read-only after rt_vocab_create, so decode threads share one handle with
// no synchronization. Token -> index + num_oov; miss -> fnv1a % num_oov —
// the exact semantics of parsers.Vocabulary.lookup (StringLookup analog,
// reference examples/keras/antique_ragged.py:100-160 and the canonical
// vocabulary-file sparse workload examples/tf_ranking_tfrecord.py:100-115).

struct VocabEntry {
  uint64_t hash;
  uint32_t off;
  uint32_t len;
  int32_t id;
};

struct Vocab {
  std::string arena;               // concatenated token bytes
  std::vector<VocabEntry> entries;
  std::vector<int32_t> slots;      // open addressing: entry index + 1, 0 = empty
  uint64_t mask = 0;
  int64_t num_oov = 1;
};

inline int32_t vocab_lookup(const Vocab* v, const uint8_t* p, size_t n) {
  uint64_t h = fnv1a(p, n);
  size_t slot = static_cast<size_t>(h & v->mask);
  for (;;) {
    int32_t e = v->slots[slot];
    if (e == 0) break;
    const VocabEntry& ent = v->entries[e - 1];
    if (ent.hash == h && ent.len == n &&
        std::memcmp(v->arena.data() + ent.off, p, n) == 0)
      return ent.id;
    slot = (slot + 1) & v->mask;
  }
  return static_cast<int32_t>(h % static_cast<uint64_t>(v->num_oov));
}

// --- feature spec ----------------------------------------------------------

// kind: 0 = fixed-len float, 1 = fixed-len int64,
//       2 = varlen int64 tokens, 3 = varlen hashed-string tokens,
//       4 = varlen vocabulary-file string tokens
struct FeatureSpec {
  const char* name;
  int32_t kind;
  int32_t size;      // fixed: values per example; varlen: max_len
  int64_t buckets;   // kind 3: hash bucket count
  float* fout;       // kind 0 output base
  int32_t* iout;     // kind 3/4 output base (int32 ids, -1 pad)
  float default_value;
  int64_t* lout;     // kind 1/2 output base (full-width int64, no narrowing)
  int32_t* present;  // optional per-row value count (required-feature and
                     // wrong-count checks happen in the Python binding)
  const void* vocab; // kind 4: rt_vocab_create handle
};

// Internal per-batch view of a FeatureSpec with the name length computed
// once — strlen per map entry per row was a measurable share of decode.
struct SpecView {
  const FeatureSpec* spec;
  uint32_t name_len;
};

inline std::vector<SpecView> make_views(const FeatureSpec* specs, int n) {
  std::vector<SpecView> views(n);
  for (int i = 0; i < n; ++i)
    views[i] = {&specs[i],
                static_cast<uint32_t>(std::strlen(specs[i].name))};
  return views;
}

// Decodes one Feature message into the output row for (spec, row_offset).
// `seen` counts every value of the matching list type (even past the write
// cap) so the binding can detect wrong-count required features the same way
// the Python parser does.
// `reset` re-initializes the row before writing — required when the same
// (spec, row) was already decoded in this record (duplicate feature keys /
// merged Features occurrences: proto map merge is last-wins, and a shorter
// later occurrence must leave no stale tail). First decodes skip it — the
// batch-level prefill already initialized the row.
inline void decode_feature_values(const Slice& feat, const FeatureSpec& spec,
                                  size_t out_index, bool reset) {
  const uint8_t* p = feat.p;
  const uint8_t* end = feat.p + feat.n;
  if (reset) {
    if (spec.kind == 0) {
      for (int i = 0; i < spec.size; ++i)
        spec.fout[out_index * spec.size + i] = spec.default_value;
    } else if (spec.kind == 1) {
      const int64_t d = static_cast<int64_t>(spec.default_value);
      for (int i = 0; i < spec.size; ++i)
        spec.lout[out_index * spec.size + i] = d;
    } else if (spec.kind == 2) {
      for (int i = 0; i < spec.size; ++i)
        spec.lout[out_index * spec.size + i] = -1;
    } else {
      for (int i = 0; i < spec.size; ++i)
        spec.iout[out_index * spec.size + i] = -1;
    }
  }
  int wrote = 0;
  int seen = 0;
  while (p < end) {
    uint64_t tag;
    if (!read_varint(p, end, &tag)) return;
    uint32_t field = static_cast<uint32_t>(tag >> 3);
    uint32_t wt = tag & 7;
    if (wt != 2) {
      if (!skip_field(p, end, wt)) return;
      continue;
    }
    Slice list;
    if (!read_len_delim(p, end, &list)) return;
    // list is BytesList/FloatList/Int64List; iterate its value field(s).
    const uint8_t* q = list.p;
    const uint8_t* qend = list.p + list.n;
    while (q < qend) {
      uint64_t vtag;
      if (!read_varint(q, qend, &vtag)) return;
      uint32_t vwt = vtag & 7;
      if ((vtag >> 3) != 1) {
        if (!skip_field(q, qend, vwt)) return;
        continue;
      }
      if (field == 2 && spec.kind == 0) {  // float_list
        if (vwt == 5) {  // single float
          if (qend - q < 4) return;
          float v;
          std::memcpy(&v, q, 4);
          q += 4;
          ++seen;
          if (wrote < spec.size) spec.fout[out_index * spec.size + wrote++] = v;
        } else if (vwt == 2) {  // packed floats
          Slice packed;
          if (!read_len_delim(q, qend, &packed)) return;
          size_t count = packed.n / 4;
          seen += static_cast<int>(count);
          // Bulk copy the dense-feature common case: wire floats are
          // already little-endian IEEE754, so the packed payload is the
          // output bytes (memcpy handles the unaligned source).
          if (wrote < spec.size) {
            size_t take = count;
            size_t room = static_cast<size_t>(spec.size - wrote);
            if (take > room) take = room;
            std::memcpy(spec.fout + out_index * spec.size + wrote,
                        packed.p, take * 4);
            wrote += static_cast<int>(take);
          }
        } else if (!skip_field(q, qend, vwt)) {
          return;
        }
      } else if (field == 3 && (spec.kind == 1 || spec.kind == 2)) {
        // int64_list, varint or packed
        if (vwt == 0) {
          uint64_t v;
          if (!read_varint(q, qend, &v)) return;
          ++seen;
          if (wrote < spec.size)
            spec.lout[out_index * spec.size + wrote++] =
                static_cast<int64_t>(v);
        } else if (vwt == 2) {
          Slice packed;
          if (!read_len_delim(q, qend, &packed)) return;
          const uint8_t* r = packed.p;
          const uint8_t* rend = packed.p + packed.n;
          uint64_t v;
          while (r < rend && read_varint(r, rend, &v)) {
            ++seen;
            if (wrote < spec.size)
              spec.lout[out_index * spec.size + wrote++] =
                  static_cast<int64_t>(v);
          }
        } else if (!skip_field(q, qend, vwt)) {
          return;
        }
      } else if (field == 1 && (spec.kind == 3 || spec.kind == 4)) {
        // bytes_list: hashed (kind 3) or vocabulary lookup (kind 4)
        if (vwt != 2) {
          if (!skip_field(q, qend, vwt)) return;
          continue;
        }
        Slice s;
        if (!read_len_delim(q, qend, &s)) return;
        ++seen;
        if (wrote < spec.size)
          spec.iout[out_index * spec.size + wrote++] =
              spec.kind == 3
                  ? static_cast<int32_t>(
                        fnv1a(s.p, s.n) %
                        static_cast<uint64_t>(spec.buckets))
                  : vocab_lookup(static_cast<const Vocab*>(spec.vocab),
                                 s.p, s.n);
      } else {
        if (!skip_field(q, qend, vwt)) return;
      }
    }
  }
  if (spec.present) spec.present[out_index] = seen;
}

// Walks a Features message's map entries; dispatches matching specs.
// `seen_mask` (nullable) tracks which spec indices were already decoded
// for this row — across repeated Features occurrences of one Example —
// so only re-decodes pay the row reset. Specs past bit 63 always reset.
inline void decode_features(const Slice& features,
                            const std::vector<SpecView>& specs,
                            size_t out_index,
                            uint64_t* seen_mask = nullptr) {
  const int n_specs = static_cast<int>(specs.size());
  const uint8_t* p = features.p;
  const uint8_t* end = features.p + features.n;
  while (p < end) {
    uint64_t tag;
    if (!read_varint(p, end, &tag)) return;
    if ((tag >> 3) != 1 || (tag & 7) != 2) {
      if (!skip_field(p, end, tag & 7)) return;
      continue;
    }
    Slice entry;
    if (!read_len_delim(p, end, &entry)) return;
    // Map entry: key = 1 (string), value = 2 (Feature).
    const uint8_t* q = entry.p;
    const uint8_t* qend = entry.p + entry.n;
    Slice key{nullptr, 0}, value{nullptr, 0};
    while (q < qend) {
      uint64_t etag;
      if (!read_varint(q, qend, &etag)) return;
      if ((etag >> 3) == 1 && (etag & 7) == 2) {
        if (!read_len_delim(q, qend, &key)) return;
      } else if ((etag >> 3) == 2 && (etag & 7) == 2) {
        if (!read_len_delim(q, qend, &value)) return;
      } else if (!skip_field(q, qend, etag & 7)) {
        return;
      }
    }
    if (!key.p || !value.p) continue;
    for (int s = 0; s < n_specs; ++s) {
      const FeatureSpec& spec = *specs[s].spec;
      if (specs[s].name_len == key.n &&
          std::memcmp(spec.name, key.p, key.n) == 0) {
        bool reset = true;
        if (seen_mask && s < 64) {
          const uint64_t bit = uint64_t{1} << s;
          reset = (*seen_mask & bit) != 0;
          *seen_mask |= bit;
        }
        decode_feature_values(value, spec, out_index, reset);
        break;
      }
    }
  }
}

// Unwraps Example.features (field 1) then walks the Features map. A
// repeated embedded-message field merges across occurrences (proto
// semantics, e.g. concatenated partial Examples), so every occurrence is
// decoded in order — per-key last-wins falls out of the row reset in
// decode_feature_values.
inline void decode_example(const Slice& example,
                           const std::vector<SpecView>& specs,
                           size_t out_index) {
  const uint8_t* p = example.p;
  const uint8_t* end = example.p + example.n;
  uint64_t seen_mask = 0;
  while (p < end) {
    uint64_t tag;
    if (!read_varint(p, end, &tag)) return;
    if ((tag >> 3) == 1 && (tag & 7) == 2) {
      Slice features{nullptr, 0};
      if (!read_len_delim(p, end, &features)) return;
      decode_features(features, specs, out_index, &seen_mask);
    } else if (!skip_field(p, end, tag & 7)) {
      return;
    }
  }
}

// Walks SequenceExample.feature_lists (FeatureLists.feature_list map):
// each matching spec's FeatureList holds one Feature per document frame.
// Returns the max frame count seen across matching lists.
inline int decode_feature_lists(const Slice& flists,
                                const std::vector<SpecView>& specs,
                                size_t base_index, int list_size,
                                uint64_t* seen_mask_in = nullptr) {
  const int n_specs = static_cast<int>(specs.size());
  const uint8_t* p = flists.p;
  const uint8_t* end = flists.p + flists.n;
  int max_frames = 0;
  // Spec indices already decoded (duplicate keys / repeated FeatureLists
  // occurrences); caller-owned when occurrences must share it.
  uint64_t local_mask = 0;
  uint64_t& seen_mask = seen_mask_in ? *seen_mask_in : local_mask;
  while (p < end) {
    uint64_t tag;
    if (!read_varint(p, end, &tag)) return max_frames;
    if ((tag >> 3) != 1 || (tag & 7) != 2) {
      if (!skip_field(p, end, tag & 7)) return max_frames;
      continue;
    }
    Slice entry;
    if (!read_len_delim(p, end, &entry)) return max_frames;
    const uint8_t* q = entry.p;
    const uint8_t* qend = entry.p + entry.n;
    Slice key{nullptr, 0}, value{nullptr, 0};
    while (q < qend) {
      uint64_t etag;
      if (!read_varint(q, qend, &etag)) return max_frames;
      if ((etag >> 3) == 1 && (etag & 7) == 2) {
        if (!read_len_delim(q, qend, &key)) return max_frames;
      } else if ((etag >> 3) == 2 && (etag & 7) == 2) {
        if (!read_len_delim(q, qend, &value)) return max_frames;
      } else if (!skip_field(q, qend, etag & 7)) {
        return max_frames;
      }
    }
    if (!key.p || !value.p) continue;
    for (int s = 0; s < n_specs; ++s) {
      const FeatureSpec& spec = *specs[s].spec;
      if (specs[s].name_len != key.n ||
          std::memcmp(spec.name, key.p, key.n) != 0)
        continue;
      // A duplicate feature_list key re-decodes frames: reset those rows
      // (map merge is last-wins). First decodes ride the batch prefill.
      const bool dup = s < 64 && (seen_mask & (uint64_t{1} << s)) != 0;
      if (s < 64) seen_mask |= uint64_t{1} << s;
      // value is a FeatureList: repeated Feature feature = 1.
      const uint8_t* r = value.p;
      const uint8_t* rend = value.p + value.n;
      int frame = 0;
      while (r < rend) {
        uint64_t ftag;
        if (!read_varint(r, rend, &ftag)) break;
        if ((ftag >> 3) != 1 || (ftag & 7) != 2) {
          if (!skip_field(r, rend, ftag & 7)) break;
          continue;
        }
        Slice feat;
        if (!read_len_delim(r, rend, &feat)) break;
        if (frame < list_size)
          decode_feature_values(feat, spec, base_index + frame,
                                dup || s >= 64);
        ++frame;
      }
      if (frame > max_frames) max_frames = frame;
      break;
    }
  }
  return max_frames;
}

inline void prefill(FeatureSpec* specs, int n_specs, size_t rows) {
  for (int s = 0; s < n_specs; ++s) {
    FeatureSpec& sp = specs[s];
    if (sp.kind == 0) {
      for (size_t i = 0; i < rows * sp.size; ++i) sp.fout[i] =
          sp.default_value;
    } else if (sp.kind == 1) {
      const int64_t d = static_cast<int64_t>(sp.default_value);
      for (size_t i = 0; i < rows * sp.size; ++i) sp.lout[i] = d;
    } else if (sp.kind == 2) {
      for (size_t i = 0; i < rows * sp.size; ++i) sp.lout[i] = -1;
    } else {
      for (size_t i = 0; i < rows * sp.size; ++i) sp.iout[i] = -1;
    }
    if (sp.present)
      for (size_t i = 0; i < rows; ++i) sp.present[i] = 0;
  }
}

}  // namespace

extern "C" {

// Decodes n serialized ELWC records. Context outputs are [n, size]; example
// outputs are [n, list_size, size] (row-major). sizes_out[i] = number of
// real documents in list i (pre-truncation clip to list_size).
int rt_decode_elwc_batch(const uint8_t** recs, const int64_t* lens, int n,
                         int list_size, FeatureSpec* ctx_specs, int n_ctx,
                         FeatureSpec* ex_specs, int n_ex,
                         int32_t* sizes_out) {
  prefill(ctx_specs, n_ctx, static_cast<size_t>(n));
  prefill(ex_specs, n_ex, static_cast<size_t>(n) * list_size);
  const auto ctx_views = make_views(ctx_specs, n_ctx);
  const auto ex_views = make_views(ex_specs, n_ex);
  for (int i = 0; i < n; ++i) {
    const uint8_t* p = recs[i];
    const uint8_t* end = recs[i] + lens[i];
    int doc = 0;
    while (p < end) {
      uint64_t tag;
      if (!read_varint(p, end, &tag)) return -1;
      uint32_t field = static_cast<uint32_t>(tag >> 3);
      uint32_t wt = tag & 7;
      if (wt != 2) {
        if (!skip_field(p, end, wt)) return -1;
        continue;
      }
      Slice msg;
      if (!read_len_delim(p, end, &msg)) return -1;
      if (field == 1) {  // one document Example
        if (doc < list_size)
          decode_example(msg, ex_views,
                         static_cast<size_t>(i) * list_size + doc);
        ++doc;
      } else if (field == 2) {  // context Example
        decode_example(msg, ctx_views, static_cast<size_t>(i));
      }
    }
    sizes_out[i] = doc < list_size ? doc : list_size;
  }
  return 0;
}

// Decodes n serialized plain tf.Example records pointwise: each record is
// one document (list_size rows padded), context features read from the
// same record (python/data.py:1348-1395 serving parity).
int rt_decode_example_batch(const uint8_t** recs, const int64_t* lens,
                            int n, int list_size, FeatureSpec* ctx_specs,
                            int n_ctx, FeatureSpec* ex_specs, int n_ex,
                            int32_t* sizes_out) {
  prefill(ctx_specs, n_ctx, static_cast<size_t>(n));
  prefill(ex_specs, n_ex, static_cast<size_t>(n) * list_size);
  const auto ctx_views = make_views(ctx_specs, n_ctx);
  const auto ex_views = make_views(ex_specs, n_ex);
  for (int i = 0; i < n; ++i) {
    Slice rec{recs[i], static_cast<size_t>(lens[i])};
    decode_example(rec, ctx_views, static_cast<size_t>(i));
    decode_example(rec, ex_views,
                   static_cast<size_t>(i) * list_size);
    sizes_out[i] = 1;
  }
  return 0;
}

// Decodes n serialized ExampleInExample records: an outer tf.Example
// holding 'serialized_context' (bytes) and 'serialized_examples'
// (repeated bytes) (tensorflow_ranking/python/data.py:133-208). Same
// output contract as rt_decode_elwc_batch.
int rt_decode_eie_batch(const uint8_t** recs, const int64_t* lens, int n,
                        int list_size, FeatureSpec* ctx_specs, int n_ctx,
                        FeatureSpec* ex_specs, int n_ex,
                        int32_t* sizes_out) {
  prefill(ctx_specs, n_ctx, static_cast<size_t>(n));
  prefill(ex_specs, n_ex, static_cast<size_t>(n) * list_size);
  static const char kCtx[] = "serialized_context";
  static const char kExs[] = "serialized_examples";
  const auto ctx_views = make_views(ctx_specs, n_ctx);
  const auto ex_views = make_views(ex_specs, n_ex);
  for (int i = 0; i < n; ++i) {
    // Outer Example -> Features map; find the two carrier features.
    const uint8_t* p = recs[i];
    const uint8_t* end = recs[i] + lens[i];
    Slice features{nullptr, 0};
    while (p < end) {
      uint64_t tag;
      if (!read_varint(p, end, &tag)) return -1;
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        if (!read_len_delim(p, end, &features)) return -1;
      } else if (!skip_field(p, end, tag & 7)) {
        return -1;
      }
    }
    int doc = 0;
    if (features.p) {
      p = features.p;
      end = features.p + features.n;
      while (p < end) {
        uint64_t tag;
        if (!read_varint(p, end, &tag)) return -1;
        if ((tag >> 3) != 1 || (tag & 7) != 2) {
          if (!skip_field(p, end, tag & 7)) return -1;
          continue;
        }
        Slice entry;
        if (!read_len_delim(p, end, &entry)) return -1;
        const uint8_t* q = entry.p;
        const uint8_t* qend = entry.p + entry.n;
        Slice key{nullptr, 0}, value{nullptr, 0};
        while (q < qend) {
          uint64_t etag;
          if (!read_varint(q, qend, &etag)) return -1;
          if ((etag >> 3) == 1 && (etag & 7) == 2) {
            if (!read_len_delim(q, qend, &key)) return -1;
          } else if ((etag >> 3) == 2 && (etag & 7) == 2) {
            if (!read_len_delim(q, qend, &value)) return -1;
          } else if (!skip_field(q, qend, etag & 7)) {
            return -1;
          }
        }
        if (!key.p || !value.p) continue;
        const bool is_ctx = key.n == sizeof(kCtx) - 1 &&
                            std::memcmp(key.p, kCtx, key.n) == 0;
        const bool is_exs = key.n == sizeof(kExs) - 1 &&
                            std::memcmp(key.p, kExs, key.n) == 0;
        if (!is_ctx && !is_exs) continue;
        // value is a Feature -> bytes_list (field 1) -> value (field 1).
        const uint8_t* r = value.p;
        const uint8_t* rend = value.p + value.n;
        while (r < rend) {
          uint64_t ftag;
          if (!read_varint(r, rend, &ftag)) break;
          if ((ftag >> 3) != 1 || (ftag & 7) != 2) {
            if (!skip_field(r, rend, ftag & 7)) break;
            continue;
          }
          Slice blist;
          if (!read_len_delim(r, rend, &blist)) break;
          const uint8_t* u = blist.p;
          const uint8_t* uend = blist.p + blist.n;
          while (u < uend) {
            uint64_t btag;
            if (!read_varint(u, uend, &btag)) break;
            if ((btag >> 3) != 1 || (btag & 7) != 2) {
              if (!skip_field(u, uend, btag & 7)) break;
              continue;
            }
            Slice ser;
            if (!read_len_delim(u, uend, &ser)) break;
            if (is_ctx) {
              decode_example(ser, ctx_views, static_cast<size_t>(i));
            } else {
              if (doc < list_size)
                decode_example(ser, ex_views,
                               static_cast<size_t>(i) * list_size + doc);
              ++doc;
            }
          }
        }
      }
    }
    sizes_out[i] = doc < list_size ? doc : list_size;
  }
  return 0;
}

// Decodes n serialized SequenceExample records (context Features +
// per-document FeatureLists). Same output contract as rt_decode_elwc_batch.
int rt_decode_seq_batch(const uint8_t** recs, const int64_t* lens, int n,
                        int list_size, FeatureSpec* ctx_specs, int n_ctx,
                        FeatureSpec* ex_specs, int n_ex,
                        int32_t* sizes_out) {
  prefill(ctx_specs, n_ctx, static_cast<size_t>(n));
  prefill(ex_specs, n_ex, static_cast<size_t>(n) * list_size);
  const auto ctx_views = make_views(ctx_specs, n_ctx);
  const auto ex_views = make_views(ex_specs, n_ex);
  for (int i = 0; i < n; ++i) {
    const uint8_t* p = recs[i];
    const uint8_t* end = recs[i] + lens[i];
    int frames = 0;
    uint64_t ctx_mask = 0, ex_mask = 0;  // shared across occurrences
    while (p < end) {
      uint64_t tag;
      if (!read_varint(p, end, &tag)) return -1;
      uint32_t field = static_cast<uint32_t>(tag >> 3);
      uint32_t wt = tag & 7;
      if (wt != 2) {
        if (!skip_field(p, end, wt)) return -1;
        continue;
      }
      Slice msg;
      if (!read_len_delim(p, end, &msg)) return -1;
      if (field == 1) {  // context Features
        decode_features(msg, ctx_views, static_cast<size_t>(i),
                        &ctx_mask);
      } else if (field == 2) {  // FeatureLists
        int f = decode_feature_lists(
            msg, ex_views, static_cast<size_t>(i) * list_size,
            list_size, &ex_mask);
        if (f > frames) frames = f;
      }
    }
    sizes_out[i] = frames < list_size ? frames : list_size;
  }
  return 0;
}

// Scans TFRecord framing: fills offsets/lengths for up to max_records
// payloads; returns the count (no checksum verification on the hot path).
int64_t rt_scan_tfrecord(const uint8_t* data, int64_t size, int64_t* offsets,
                         int64_t* lengths, int64_t max_records) {
  int64_t pos = 0, count = 0;
  while (pos + 12 <= size && count < max_records) {
    uint64_t len;
    std::memcpy(&len, data + pos, 8);
    pos += 12;  // length + length crc
    // Unsigned bound check first: a corrupt high-bit length must stop the
    // scan, not wrap negative through the signed arithmetic below.
    if (size - pos < 4 ||
        len > static_cast<uint64_t>(size - pos - 4))
      break;
    offsets[count] = pos;
    lengths[count] = static_cast<int64_t>(len);
    ++count;
    pos += static_cast<int64_t>(len) + 4;  // payload + payload crc
  }
  return count;
}

// Builds a vocabulary lookup table for kind-4 specs. `tokens`/`lens` give
// n token byte strings (lengths explicit — tokens may contain NULs); ids
// are index + num_oov, last occurrence wins for duplicates (matching
// parsers.Vocabulary's dict construction). The handle is immutable after
// creation and safe to share across decode threads.
void* rt_vocab_create(const char** tokens, const int64_t* lens, int64_t n,
                      int64_t num_oov) {
  auto* v = new Vocab();
  v->num_oov = num_oov > 0 ? num_oov : 1;
  size_t total = 0;
  for (int64_t i = 0; i < n; ++i) total += static_cast<size_t>(lens[i]);
  v->arena.reserve(total);
  v->entries.reserve(static_cast<size_t>(n));
  size_t cap = 16;
  while (cap < static_cast<size_t>(n) * 2 + 1) cap *= 2;
  v->slots.assign(cap, 0);
  v->mask = cap - 1;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = reinterpret_cast<const uint8_t*>(tokens[i]);
    const size_t len = static_cast<size_t>(lens[i]);
    const uint64_t h = fnv1a(p, len);
    const int32_t id = static_cast<int32_t>(i + v->num_oov);
    size_t slot = static_cast<size_t>(h & v->mask);
    for (;;) {
      int32_t e = v->slots[slot];
      if (e == 0) {
        v->entries.push_back({h, static_cast<uint32_t>(v->arena.size()),
                              static_cast<uint32_t>(len), id});
        v->arena.append(tokens[i], len);
        v->slots[slot] = static_cast<int32_t>(v->entries.size());
        break;
      }
      VocabEntry& ent = v->entries[e - 1];
      if (ent.hash == h && ent.len == len &&
          std::memcmp(v->arena.data() + ent.off, p, len) == 0) {
        ent.id = id;  // duplicate token: last occurrence wins
        break;
      }
      slot = (slot + 1) & v->mask;
    }
  }
  return v;
}

void rt_vocab_free(void* handle) {
  delete static_cast<Vocab*>(handle);
}

// Counts top-level ELWC `examples` entries (field 1, length-delimited) per
// record without decoding any features — the O(list_size) probe behind
// Predictor.predict(list_size=None)'s shape-bucket selection.
int rt_elwc_sizes(const uint8_t** recs, const int64_t* lens, int n,
                  int32_t* sizes_out) {
  for (int i = 0; i < n; ++i) {
    const uint8_t* p = recs[i];
    const uint8_t* end = recs[i] + lens[i];
    int32_t count = 0;
    while (p < end) {
      uint64_t tag;
      if (!read_varint(p, end, &tag)) return -1;
      uint32_t field = static_cast<uint32_t>(tag >> 3);
      uint32_t wt = tag & 7;
      if (field == 1 && wt == 2) ++count;
      if (!skip_field(p, end, wt)) return -1;
    }
    sizes_out[i] = count;
  }
  return 0;
}

}  // extern "C"

// --- LIBSVM ranking parser -------------------------------------------------
//
// Handle-based API: rt_libsvm_parse() does one pass over the text buffer
// grouping rows by qid (first-seen order, like the reference's host loop at
// examples/tf_ranking_libsvm.py:137-195); rt_libsvm_fill() writes padded
// [Q, list_size, F] / [Q, list_size] arrays; rt_libsvm_free() releases.

namespace {

struct LibsvmRow {
  float label;
  std::vector<std::pair<int32_t, float>> feats;
};

struct LibsvmData {
  std::vector<std::vector<LibsvmRow>> queries;  // first-seen qid order
  std::vector<std::string> qids;
  int64_t n_bad = 0;  // rows missing qid / with malformed feature tokens
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

}  // namespace

extern "C" {

void* rt_libsvm_parse(const char* buf, int64_t len) {
  auto* data = new LibsvmData();
  std::unordered_map<std::string, size_t> qid_index;
  const char* p = buf;
  const char* end = buf + len;
  std::string qid;
  while (p < end) {
    const char* line_end = p;
    while (line_end < end && *line_end != '\n') ++line_end;
    const char* q = skip_ws(p, line_end);
    // Strip comments.
    const char* hash = q;
    while (hash < line_end && *hash != '#') ++hash;
    const char* lend = hash;
    if (q < lend) {
      LibsvmRow row;
      char* next = nullptr;
      row.label = std::strtof(q, &next);
      q = next;
      qid.clear();
      bool ok = true;
      while (true) {
        q = skip_ws(q, lend);
        if (q >= lend) break;
        const char* colon = q;
        while (colon < lend && *colon != ':' && *colon != ' ') ++colon;
        if (colon >= lend || *colon != ':') break;
        if (colon - q == 3 && std::memcmp(q, "qid", 3) == 0) {
          const char* v = colon + 1;
          const char* vend = v;
          while (vend < lend && *vend != ' ' && *vend != '\t') ++vend;
          qid.assign(v, vend - v);
          q = vend;
        } else {
          int32_t idx = static_cast<int32_t>(std::strtol(q, &next, 10));
          if (next != colon) { ok = false; break; }
          float val = std::strtof(colon + 1, &next);
          row.feats.emplace_back(idx, val);
          q = next;
        }
      }
      if (ok && !qid.empty()) {
        auto it = qid_index.find(qid);
        size_t qi;
        if (it == qid_index.end()) {
          qi = data->queries.size();
          qid_index.emplace(qid, qi);
          data->queries.emplace_back();
          data->qids.push_back(qid);
        } else {
          qi = it->second;
        }
        data->queries[qi].push_back(std::move(row));
      } else {
        // Counted, not dropped silently: the Python loader raises for
        // these rows, and the fast path must not be laxer (the binding
        // raises when n_bad > 0).
        ++data->n_bad;
      }
    }
    p = line_end + 1;
  }
  return data;
}

int64_t rt_libsvm_num_queries(void* handle) {
  return static_cast<LibsvmData*>(handle)->queries.size();
}

int64_t rt_libsvm_num_bad(void* handle) {
  return static_cast<LibsvmData*>(handle)->n_bad;
}

// Fills features [Q, list_size, num_features] (zero default) and labels
// [Q, list_size] (padding_label default). 1-based feature indices.
void rt_libsvm_fill(void* handle, int list_size, int num_features,
                    float padding_label, float* features, float* labels) {
  auto* data = static_cast<LibsvmData*>(handle);
  const size_t nq = data->queries.size();
  const size_t lf = static_cast<size_t>(list_size) * num_features;
  for (size_t i = 0; i < nq * lf; ++i) features[i] = 0.0f;
  for (size_t i = 0; i < nq * list_size; ++i) labels[i] = padding_label;
  for (size_t qi = 0; qi < nq; ++qi) {
    const auto& rows = data->queries[qi];
    const size_t n = rows.size() < static_cast<size_t>(list_size)
                         ? rows.size() : static_cast<size_t>(list_size);
    for (size_t di = 0; di < n; ++di) {
      labels[qi * list_size + di] = rows[di].label;
      float* frow = features + qi * lf + di * num_features;
      for (const auto& kv : rows[di].feats) {
        if (kv.first >= 1 && kv.first <= num_features)
          frow[kv.first - 1] = kv.second;
      }
    }
  }
}

// Copies qid string i into buf (NUL-terminated, truncated to buflen).
int rt_libsvm_qid(void* handle, int64_t i, char* buf, int buflen) {
  auto* data = static_cast<LibsvmData*>(handle);
  if (i < 0 || i >= static_cast<int64_t>(data->qids.size()) || buflen < 1)
    return -1;
  const std::string& q = data->qids[i];
  int n = static_cast<int>(q.size()) < buflen - 1
              ? static_cast<int>(q.size()) : buflen - 1;
  std::memcpy(buf, q.data(), n);
  buf[n] = '\0';
  return n;
}

void rt_libsvm_free(void* handle) {
  delete static_cast<LibsvmData*>(handle);
}

}  // extern "C"
