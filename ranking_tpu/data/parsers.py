"""Proto -> padded-array parsers for ranking data formats.

Host-side replacement for the reference's parser family
(tensorflow_ranking/python/data.py:99-710): ExampleListWithContext,
ExampleInExample, SequenceExample, and plain tf.Example, all producing the
shared batch model — context ``[B, ...]``, examples ``[B, L, ...]`` with
fixed ``list_size`` (truncate/pad), label padding -1, and optional mask /
size features (python/data.py:41,207).

TPU-native stance: every output is a dense, statically-shaped numpy array.
Sparse/var-len token features become ``[.., T]`` int arrays padded with -1
(pooled embedding lookups mask ids < 0); strings become int64 ids via a
vocabulary or a stable FNV-1a hash — both resolved host-side so nothing
string-typed ever reaches the device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from ranking_tpu.data import proto

PADDING_LABEL = -1.0

_FNV64_OFFSET = 0xCBF29CE484222325
_FNV64_PRIME = 0x100000001B3


def fnv1a_64(data: bytes) -> int:
  """Stable 64-bit FNV-1a hash (string -> hash-bucket ids)."""
  h = _FNV64_OFFSET
  for b in data:
    h = ((h ^ b) * _FNV64_PRIME) & 0xFFFFFFFFFFFFFFFF
  return h


class Vocabulary:
  """String -> id lookup from a vocab file (StringLookup equivalent,
  examples/keras/antique_ragged.py:100-160). Unknown tokens map to
  ``oov_id`` (default 0 = reserved OOV bucket; ids shift by num_oov)."""

  def __init__(self, path_or_tokens, num_oov_buckets: int = 1):
    if isinstance(path_or_tokens, (list, tuple)):
      tokens = [t.encode() if isinstance(t, str) else t
                for t in path_or_tokens]
    else:
      with open(path_or_tokens, 'rb') as f:
        # rstrip \r too: a CRLF vocab file would otherwise store
        # b'token\r' and send every lookup to the OOV bucket.
        tokens = [line.rstrip(b'\r\n') for line in f if line.rstrip(b'\r\n')]
    self.num_oov_buckets = max(1, num_oov_buckets)
    self.tokens = tokens  # id order; the native decoder's C++ table is built from it
    self._map = {t: i + self.num_oov_buckets for i, t in enumerate(tokens)}
    self.size = len(tokens) + self.num_oov_buckets

  def lookup(self, token: bytes) -> int:
    idx = self._map.get(token)
    if idx is not None:
      return idx
    return fnv1a_64(token) % self.num_oov_buckets


@dataclasses.dataclass(frozen=True)
class FixedLenFeature:
  """Dense feature with a fixed per-example shape (tf.io.FixedLenFeature)."""
  shape: Tuple[int, ...] = ()
  dtype: str = 'float32'        # 'float32' | 'int64' | 'string'
  default_value: Optional[Union[float, int, str]] = None


@dataclasses.dataclass(frozen=True)
class VarLenFeature:
  """Variable-length feature, densified to ``[.., max_len]`` with padding.

  ``max_len`` fixes the static token axis (truncate/pad); None means use the
  batch max (dataset builders should set it for TPU shape stability).
  For 'string' dtype, tokens become int64 ids via ``vocab`` (a Vocabulary)
  or ``hash_buckets`` (FNV-1a mod buckets).
  """
  dtype: str = 'float32'
  max_len: Optional[int] = None
  pad_value: Union[float, int] = -1
  vocab: Optional[Vocabulary] = None
  hash_buckets: Optional[int] = None


FeatureSpec = Union[FixedLenFeature, VarLenFeature]


def _np_dtype(dtype: str):
  return {'float32': np.float32, 'int64': np.int64,
          'string': np.int64}[dtype]


def _feature_values(feature, dtype: str) -> List:
  if dtype == 'float32':
    return list(feature.float_list.value)
  if dtype == 'int64':
    return list(feature.int64_list.value)
  if dtype == 'string':
    return list(feature.bytes_list.value)
  raise ValueError(f'Unknown dtype {dtype!r}')


def _encode_strings(values: List[bytes], spec: VarLenFeature) -> List[int]:
  if spec.vocab is not None:
    return [spec.vocab.lookup(v) for v in values]
  if spec.hash_buckets:
    return [fnv1a_64(v) % spec.hash_buckets for v in values]
  raise ValueError('string VarLenFeature needs vocab or hash_buckets')


def _wrong_type(feature, dtype: str) -> bool:
  """True when the stored Feature holds values of a DIFFERENT list type
  than the spec asks for — a schema error, not an absent feature."""
  kinds = {'float32': feature.float_list.value,
           'int64': feature.int64_list.value,
           'string': feature.bytes_list.value}
  return any(len(v) > 0 for k, v in kinds.items() if k != dtype)


def _extract(features_msg, name: str, spec: FeatureSpec):
  """Feature proto -> python list of scalars for one example."""
  fmap = features_msg.feature
  present = name in fmap
  if isinstance(spec, FixedLenFeature):
    if spec.dtype == 'string':
      raise ValueError(
          f"FixedLenFeature dtype='string' is not supported ({name!r}); "
          'strings become int ids host-side — use VarLenFeature with '
          'vocab= or hash_buckets=')
    size = int(np.prod(spec.shape)) if spec.shape else 1
    if not present or not _feature_values(fmap[name], spec.dtype):
      if present and _wrong_type(fmap[name], spec.dtype):
        raise ValueError(
            f'Feature {name!r}: stored value type does not match spec '
            f'dtype {spec.dtype!r} (tf.io.parse_example raises here too)')
      if spec.default_value is None:
        raise ValueError(f'Missing required feature {name!r}')
      d = spec.default_value
      return [d] * size
    vals = _feature_values(fmap[name], spec.dtype)
    if len(vals) != size:
      raise ValueError(
          f'Feature {name!r}: got {len(vals)} values, expected {size}')
    return vals
  # VarLen
  vals = _feature_values(fmap[name], spec.dtype) if present else []
  if spec.dtype == 'string':
    vals = _encode_strings(vals, spec)
  return vals


def _stack_fixed(rows: List[List], spec: FixedLenFeature) -> np.ndarray:
  arr = np.asarray(rows, dtype=_np_dtype(spec.dtype))
  if spec.shape:
    arr = arr.reshape(arr.shape[0], *spec.shape)
  else:
    arr = arr.reshape(arr.shape[0])
  return arr


def _stack_varlen(rows: List[List], spec: VarLenFeature) -> np.ndarray:
  max_len = spec.max_len
  if max_len is None:
    max_len = max((len(r) for r in rows), default=1) or 1
  out = np.full((len(rows), max_len), spec.pad_value,
                dtype=_np_dtype(spec.dtype))
  for i, r in enumerate(rows):
    n = min(len(r), max_len)
    if n:
      out[i, :n] = r[:n]
  return out


def _stack(rows: List[List], spec: FeatureSpec) -> np.ndarray:
  if isinstance(spec, FixedLenFeature):
    return _stack_fixed(rows, spec)
  return _stack_varlen(rows, spec)


def _pad_value_row(spec: FeatureSpec) -> List:
  """A row of padding values for one absent (padded) document."""
  if isinstance(spec, FixedLenFeature):
    size = int(np.prod(spec.shape)) if spec.shape else 1
    d = spec.default_value
    if d is None:
      d = 0.0 if spec.dtype == 'float32' else (b'' if spec.dtype == 'string'
                                               else 0)
    elif spec.dtype == 'string' and isinstance(d, str):
      d = d.encode()
    return [d] * size
  return []


@dataclasses.dataclass
class ParsedLists:
  """Parser output before batch assembly."""
  context: Dict[str, np.ndarray]   # [B, ...]
  examples: Dict[str, np.ndarray]  # [B, L, ...]
  sizes: np.ndarray                # [B] int32 — #real docs per list
  mask: np.ndarray                 # [B, L] bool


def _assemble(
    context_rows: Dict[str, List[List]],
    example_rows: Dict[str, List[List[List]]],
    sizes: List[int],
    context_spec: Mapping[str, FeatureSpec],
    example_spec: Mapping[str, FeatureSpec],
    list_size: Optional[int],
) -> ParsedLists:
  batch = len(sizes)
  target = list_size or max(sizes, default=1) or 1
  clipped = np.minimum(np.asarray(sizes, np.int32), target)
  mask = np.arange(target)[None, :] < clipped[:, None]

  context = {name: _stack(rows, context_spec[name])
             for name, rows in context_rows.items()}
  examples = {}
  for name, lists in example_rows.items():
    spec = example_spec[name]
    flat: List[List] = []
    for row in lists:
      row = row[:target]
      row = row + [_pad_value_row(spec)] * (target - len(row))
      flat.extend(row)
    arr = _stack(flat, spec)
    examples[name] = arr.reshape(batch, target, *arr.shape[1:])
  return ParsedLists(context=context, examples=examples,
                     sizes=clipped, mask=mask)


def _maybe_shuffle(indices: List[int], shuffle: bool,
                   rng: Optional[np.random.RandomState]) -> List[int]:
  if shuffle:
    (rng or np.random).shuffle(indices)
  return indices


def _read_varint(buf: bytes, pos: int):
  result = shift = 0
  while True:
    b = buf[pos]
    pos += 1
    result |= (b & 0x7F) << shift
    if not b & 0x80:
      return result, pos
    shift += 7
    if shift > 63:
      raise ValueError('varint too long')


def bucket_list_size(longest: int) -> int:
  """Pads a list size up the half-step power-of-two ladder
  (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, ...): bounded distinct compile
  shapes with at most 33% padding overhead. Shared by the serving
  dynamic-shape path (pipeline/serving.py Predictor.predict) and
  training-side bucketed batches (dataset.build_ranking_dataset with
  ``list_size=None``)."""
  longest = max(1, int(longest))
  pow2 = 1 << (longest - 1).bit_length()
  half_step = (pow2 // 4) * 3
  return half_step if half_step >= longest else pow2


def elwc_list_sizes(serialized: Sequence[bytes]) -> np.ndarray:
  """[B] int32 list lengths from serialized ELWC protos.

  A top-level wire-format walk counting occurrences of the repeated
  ``examples`` field (field 1) — O(list_size) varint hops per record, no
  feature decoding. Lets ``Predictor.predict(list_size=None)`` pick its
  shape bucket without a full Python parse of every request
  (the serving dynamic-shape path, keras/saved_model.py:120-123).
  Runs in C++ (`rt_elwc_sizes`) when the native decoder is available."""
  try:
    from ranking_tpu.data import native
    if native.available():
      return native.elwc_sizes(serialized)
  except (ImportError, RuntimeError):
    pass
  return _elwc_list_sizes_py(serialized)


def _elwc_list_sizes_py(serialized: Sequence[bytes]) -> np.ndarray:
  """Pure-Python fallback for (and test oracle of) `elwc_list_sizes`."""
  sizes = []
  for rec in serialized:
    pos, n, count = 0, len(rec), 0
    while pos < n:
      tag, pos = _read_varint(rec, pos)
      field, wire = tag >> 3, tag & 7
      if wire == 2:        # length-delimited
        length, pos = _read_varint(rec, pos)
        if length > n - pos:
          raise ValueError('corrupt ELWC: length past end of record')
        if field == 1:     # ExampleListWithContext.examples
          count += 1
        pos += length
      elif wire == 0:      # varint
        _, pos = _read_varint(rec, pos)
      elif wire == 5:      # 32-bit
        pos += 4
      elif wire == 1:      # 64-bit
        pos += 8
      else:
        raise ValueError(f'unsupported wire type {wire}')
    sizes.append(count)
  return np.asarray(sizes, np.int32)


def parse_example_list(
    serialized: Sequence[bytes],
    context_spec: Mapping[str, FeatureSpec],
    example_spec: Mapping[str, FeatureSpec],
    list_size: Optional[int] = None,
    shuffle_examples: bool = False,
    rng: Optional[np.random.RandomState] = None,
) -> ParsedLists:
  """Parses serialized ELWC protos (python/data.py:391-539 equivalent)."""
  ctx_rows = {n: [] for n in context_spec}
  ex_rows = {n: [] for n in example_spec}
  sizes = []
  for rec in serialized:
    elwc = proto.ExampleListWithContext()
    elwc.ParseFromString(rec)
    for name, spec in context_spec.items():
      ctx_rows[name].append(_extract(elwc.context.features, name, spec))
    order = _maybe_shuffle(list(range(len(elwc.examples))), shuffle_examples,
                           rng)
    for name, spec in example_spec.items():
      ex_rows[name].append(
          [_extract(elwc.examples[i].features, name, spec) for i in order])
    sizes.append(len(elwc.examples))
  return _assemble(ctx_rows, ex_rows, sizes, context_spec, example_spec,
                   list_size)


def parse_example_in_example(
    serialized: Sequence[bytes],
    context_spec: Mapping[str, FeatureSpec],
    example_spec: Mapping[str, FeatureSpec],
    list_size: Optional[int] = None,
    shuffle_examples: bool = False,
    rng: Optional[np.random.RandomState] = None,
) -> ParsedLists:
  """Parses ExampleInExample records: an outer tf.Example holding
  'serialized_context' (1 bytes) and 'serialized_examples' (repeated bytes)
  (python/data.py:133-208, 211-380)."""
  ctx_rows = {n: [] for n in context_spec}
  ex_rows = {n: [] for n in example_spec}
  sizes = []
  for rec in serialized:
    outer = proto.Example()
    outer.ParseFromString(rec)
    fmap = outer.features.feature
    ctx_bytes = fmap['serialized_context'].bytes_list.value
    ex_bytes = list(fmap['serialized_examples'].bytes_list.value)
    ctx = proto.Example()
    if ctx_bytes:
      ctx.ParseFromString(ctx_bytes[0])
    inner = []
    for b in ex_bytes:
      e = proto.Example()
      e.ParseFromString(b)
      inner.append(e)
    for name, spec in context_spec.items():
      ctx_rows[name].append(_extract(ctx.features, name, spec))
    order = _maybe_shuffle(list(range(len(inner))), shuffle_examples, rng)
    for name, spec in example_spec.items():
      ex_rows[name].append(
          [_extract(inner[i].features, name, spec) for i in order])
    sizes.append(len(inner))
  return _assemble(ctx_rows, ex_rows, sizes, context_spec, example_spec,
                   list_size)


def parse_sequence_example(
    serialized: Sequence[bytes],
    context_spec: Mapping[str, FeatureSpec],
    example_spec: Mapping[str, FeatureSpec],
    list_size: Optional[int] = None,
) -> ParsedLists:
  """Parses SequenceExample records: context Features + per-document
  FeatureLists along the frame axis (python/data.py:572-710)."""
  ctx_rows = {n: [] for n in context_spec}
  ex_rows = {n: [] for n in example_spec}
  sizes = []
  for rec in serialized:
    seq = proto.SequenceExample()
    seq.ParseFromString(rec)
    for name, spec in context_spec.items():
      ctx_rows[name].append(_extract(seq.context, name, spec))
    flists = seq.feature_lists.feature_list
    n_frames = max((len(flists[n].feature) for n in example_spec
                    if n in flists), default=0)
    for name, spec in example_spec.items():
      feats = flists[name].feature if name in flists else []
      row = []
      for i in range(n_frames):
        if i < len(feats):
          holder = proto.Features()
          holder.feature[name].CopyFrom(feats[i])
          row.append(_extract(holder, name, spec))
        else:
          row.append(_pad_value_row(spec))
      ex_rows[name].append(row)
    sizes.append(n_frames)
  return _assemble(ctx_rows, ex_rows, sizes, context_spec, example_spec,
                   list_size)


def parse_tf_example(
    serialized: Sequence[bytes],
    context_spec: Mapping[str, FeatureSpec],
    example_spec: Mapping[str, FeatureSpec],
    list_size: int = 1,
) -> ParsedLists:
  """Pointwise serving parser: each record is one document, lists of size 1
  (python/data.py:1348-1395)."""
  ctx_rows = {n: [] for n in context_spec}
  ex_rows = {n: [] for n in example_spec}
  sizes = []
  for rec in serialized:
    ex = proto.Example()
    ex.ParseFromString(rec)
    for name, spec in context_spec.items():
      ctx_rows[name].append(_extract(ex.features, name, spec))
    for name, spec in example_spec.items():
      ex_rows[name].append([_extract(ex.features, name, spec)])
    sizes.append(1)
  return _assemble(ctx_rows, ex_rows, sizes, context_spec, example_spec,
                   list_size)


def parse_with_native_fallback(
    serialized: Sequence[bytes],
    context_spec: Mapping[str, FeatureSpec],
    example_spec: Mapping[str, FeatureSpec],
    list_size: int,
    data_format: str = 'example_list_with_context',
) -> ParsedLists:
  """One-shot parse: C++ decoder fast path, python parser fallback.

  The single implementation of the pattern every serving entry point
  needs (Predictor.predict/regress, ExportedPredictor._parse_elwc/
  regress — previously four hand-copies that had already drifted). The
  native decoder handles the spec kinds it supports; on a capability
  rejection (ValueError/RuntimeError) the strict python parser — the
  semantics reference — parses instead, so a genuinely corrupt record
  still raises, from there, with a better message; the double parse only
  costs on failures.
  """
  try:
    from ranking_tpu.data import native
    if native.available():
      return native.decode_elwc_batch(
          list(serialized), list_size, context_spec, example_spec,
          data_format=data_format)
  except (ValueError, RuntimeError):
    pass
  if data_format == 'tf_example':
    return parse_tf_example(serialized, context_spec, example_spec,
                            list_size=list_size)
  return parse_example_list(serialized, context_spec, example_spec,
                            list_size=list_size)
