"""Shared disk corpus for the end-to-end (disk -> host decode -> device)
benchmarks: a Web30K-shaped ELWC TFRecord corpus written with a fast
manual wire-format encoder (python protobuf is ~50x too slow to generate
GB-scale corpora inside a benchmark run).

The wire layout matches ranking_tpu/data/proto.py (and the reference's
ExampleListWithContext contract, tensorflow_ranking/python/data.py:66-77):
  Example.features = 1; Features.feature map entry key=1 value=2;
  Feature.float_list = 2 / int64_list = 3; *.value = 1 (packed).
  ELWC: examples = repeated 1, context = 2.
"""

import os

import numpy as np

# Flagship/Web30K shape (reference examples/tf_ranking_libsvm.py:90-91).
LIST_SIZE = 200
NUM_FEATURES = 136


def _varint(n: int) -> bytes:
  out = bytearray()
  while True:
    b = n & 0x7F
    n >>= 7
    if n:
      out.append(b | 0x80)
    else:
      out.append(b)
      return bytes(out)


def _len_delim(field: int, payload: bytes) -> bytes:
  return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def encode_example(float_features: np.ndarray = None,
                   int_features: dict = None,
                   float_name: str = 'float_features') -> bytes:
  """One tensorflow.Example with a packed float feature and int64 features."""
  entries = []
  if float_features is not None:
    packed = np.asarray(float_features, np.float32).tobytes()
    flist = _len_delim(1, packed)              # FloatList.value (packed)
    feat = _len_delim(2, flist)                # Feature.float_list
    entry = _len_delim(1, float_name.encode()) + _len_delim(2, feat)
    entries.append(_len_delim(1, entry))       # Features.feature map entry
  for name, values in (int_features or {}).items():
    packed = b''.join(_varint(int(v)) for v in values)
    ilist = _len_delim(1, packed)              # Int64List.value (packed)
    feat = _len_delim(3, ilist)                # Feature.int64_list
    entry = _len_delim(1, name.encode()) + _len_delim(2, feat)
    entries.append(_len_delim(1, entry))
  features = b''.join(entries)
  return _len_delim(1, features)               # Example.features


def encode_elwc(doc_features: np.ndarray, labels: np.ndarray) -> bytes:
  """One ELWC record: doc_features [L, F] float32, labels [L] int."""
  parts = []
  for d in range(doc_features.shape[0]):
    ex = encode_example(doc_features[d],
                        {'relevance': [int(labels[d])]})
    parts.append(_len_delim(1, ex))            # ELWC.examples
  return b''.join(parts)


def encode_elwc_batch_fixed(doc_features: np.ndarray,
                            labels: np.ndarray,
                            counts: np.ndarray = None) -> list:
  """Vectorized ELWC encoding for the fixed corpus shape.

  ``doc_features`` [N, L, F] float32, ``labels`` [N, L] ints in [0, 128)
  (single-byte varints). Every byte length in the record is constant, so
  one numpy template is tiled and only the float payload + label byte are
  filled per document — ~100x faster than per-doc byte assembly, byte-
  identical to :func:`encode_elwc`.

  ``counts`` (optional, [N] ints in [1, L]) emits variable-length records:
  record i keeps only its first counts[i] documents (a record is L
  concatenated fixed-size per-doc blocks, so truncation is a byte slice);
  labels/features past counts[i] are ignored.
  """
  n, l, f = doc_features.shape
  if counts is None:
    assert labels.min() >= 0 and labels.max() < 128
  else:
    keep = np.arange(l)[None, :] < np.asarray(counts)[:, None]
    labels = np.where(keep, labels, 0)
    assert labels.min() >= 0 and labels.max() < 128
  template = encode_elwc(np.zeros((1, f), np.float32),
                         np.zeros(1, np.int64))  # one-doc record
  t = len(template)
  block = np.frombuffer(template, np.uint8)
  # Locate the float payload and the label byte: encode a probe record
  # whose every float byte is nonzero and diff against the zero template.
  probe_vals = np.frombuffer(b'\x01\x02\x03\x04' * f, np.float32)
  probe = encode_elwc(probe_vals.reshape(1, f), np.ones(1, np.int64))
  diff = np.nonzero(np.frombuffer(probe, np.uint8) != block)[0]
  assert len(diff) == 4 * f + 1, 'template probe did not isolate payload'
  float_start, label_pos = int(diff[0]), int(diff[-1])
  assert label_pos - float_start >= 4 * f

  tiled = np.tile(block, (n * l, 1))
  flat = doc_features.reshape(n * l, f).astype('<f4', copy=False)
  tiled[:, float_start:float_start + 4 * f] = flat.view(np.uint8)
  tiled[:, label_pos] = labels.reshape(n * l).astype(np.uint8)
  records = tiled.reshape(n, l * t)
  if counts is None:
    return [records[i].tobytes() for i in range(n)]
  return [records[i, :int(counts[i]) * t].tobytes() for i in range(n)]


def write_corpus(directory: str, n_records: int, n_files: int = 4,
                 list_size: int = LIST_SIZE,
                 num_features: int = NUM_FEATURES,
                 seed: int = 7) -> list:
  """Writes (or reuses) a deterministic ELWC corpus; returns file paths.

  Labels are Web30K-like graded 0..4 with ~12% padding slack (lists of
  ``list_size`` real docs, so parse-time truncation never biases); features
  are standard normal. A marker file pins the generation parameters; any
  mismatch regenerates.
  """
  import sys
  sys.path.insert(0, os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))))
  from ranking_tpu.data import tfrecord

  os.makedirs(directory, exist_ok=True)
  marker = os.path.join(directory, 'MARKER.txt')
  stamp = f'v2 n={n_records} files={n_files} L={list_size} F={num_features} seed={seed}'
  paths = [os.path.join(directory, f'part-{i:03d}.tfrecord')
           for i in range(n_files)]
  if os.path.exists(marker) and open(marker).read() == stamp and all(
      os.path.exists(p) for p in paths):
    return paths

  rng = np.random.RandomState(seed)
  per_file = (n_records + n_files - 1) // n_files
  written = 0
  for path in paths:
    chunk = min(per_file, n_records - written)
    if chunk <= 0:  # n_records not divisible: trailing files get nothing
      tfrecord.write_records(path, [])
      continue
    feats = rng.randn(chunk, list_size, num_features).astype(np.float32)
    labels = rng.randint(0, 5, size=(chunk, list_size))
    tfrecord.write_records(path, encode_elwc_batch_fixed(feats, labels))
    written += chunk
  with open(marker, 'w') as f:
    f.write(stamp)
  return paths


def corpus_specs():
  """Feature specs matching write_corpus records."""
  import sys
  sys.path.insert(0, os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))))
  from ranking_tpu.data import FixedLenFeature
  return dict(
      context_feature_spec={},
      example_feature_spec={
          'float_features': FixedLenFeature(shape=(NUM_FEATURES,),
                                            dtype='float32',
                                            default_value=0.0),
          'relevance': FixedLenFeature(shape=(), dtype='int64',
                                       default_value=0),
      })
