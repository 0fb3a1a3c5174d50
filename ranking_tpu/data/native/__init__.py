"""ctypes bindings for the native batch decoder (decoder.cc).

Builds the shared library on first use (single-file g++ compile, no
dependencies) and caches it next to the source. All entry points degrade
gracefully: ``available()`` is False when no toolchain exists and callers
fall back to the pure-Python parsers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import weakref
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, 'decoder.cc'), os.path.join(_DIR, 'loader.cc')]
_LIB = os.path.join(_DIR, 'libranking_data.so')

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


class FeatureSpecStruct(ctypes.Structure):
  _fields_ = [
      ('name', ctypes.c_char_p),
      ('kind', ctypes.c_int32),
      ('size', ctypes.c_int32),
      ('buckets', ctypes.c_int64),
      ('fout', ctypes.POINTER(ctypes.c_float)),
      ('iout', ctypes.POINTER(ctypes.c_int32)),
      ('default_value', ctypes.c_float),
      # int64 values decode at full width (no float/int32 narrowing).
      ('lout', ctypes.POINTER(ctypes.c_int64)),
      # Per-row decoded-value counts; lets the binding enforce the Python
      # parser's required-feature / wrong-count errors on the fast path.
      ('present', ctypes.POINTER(ctypes.c_int32)),
      # Vocabulary-table handle (rt_vocab_create) for KIND_VARLEN_VOCAB.
      ('vocab', ctypes.c_void_p),
  ]


KIND_FIXED_FLOAT = 0
KIND_FIXED_INT64 = 1
KIND_VARLEN_INT64 = 2
KIND_VARLEN_HASHED = 3
KIND_VARLEN_VOCAB = 4


def _loader_format(data_format: str) -> int:
  """Loader wire-format code; rejects formats the streaming loader does
  not implement instead of silently decoding them as ELWC."""
  codes = {'example_list_with_context': 0, 'sequence_example': 1}
  if data_format not in codes:
    raise ValueError(
        f'NativeLoader supports example_list_with_context and '
        f'sequence_example; got {data_format!r}')
  return codes[data_format]


def _build() -> bool:
  # Compile to a private temp name and publish with an atomic rename, so a
  # concurrent process that passes the mtime check never dlopens a
  # half-written .so.
  tmp = f'{_LIB}.{os.getpid()}.tmp'
  try:
    subprocess.run(
        ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-pthread',
         '-o', tmp] + _SRCS,
        check=True, capture_output=True, timeout=180)
    os.replace(tmp, _LIB)
    return True
  except (subprocess.SubprocessError, FileNotFoundError, OSError):
    try:
      os.unlink(tmp)
    except OSError:
      pass
    return False


def _load() -> Optional[ctypes.CDLL]:
  global _lib, _build_failed
  with _lock:
    if _lib is not None:
      return _lib
    if _build_failed:
      return None
    if not os.path.exists(_LIB) or any(
        os.path.getmtime(_LIB) < os.path.getmtime(src) for src in _SRCS):
      if not _build():
        _build_failed = True
        return None
    try:
      lib = ctypes.CDLL(_LIB)
    except OSError:
      # Corrupt/incompatible cached library: rebuild once, else degrade.
      if not _build():
        _build_failed = True
        return None
      try:
        lib = ctypes.CDLL(_LIB)
      except OSError:
        _build_failed = True
        return None
    lib.rt_decode_elwc_batch.restype = ctypes.c_int
    lib.rt_decode_elwc_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(FeatureSpecStruct), ctypes.c_int,
        ctypes.POINTER(FeatureSpecStruct), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rt_decode_seq_batch.restype = ctypes.c_int
    lib.rt_decode_seq_batch.argtypes = lib.rt_decode_elwc_batch.argtypes
    lib.rt_decode_eie_batch.restype = ctypes.c_int
    lib.rt_decode_eie_batch.argtypes = lib.rt_decode_elwc_batch.argtypes
    lib.rt_decode_example_batch.restype = ctypes.c_int
    lib.rt_decode_example_batch.argtypes = lib.rt_decode_elwc_batch.argtypes
    lib.rt_scan_tfrecord.restype = ctypes.c_int64
    lib.rt_scan_tfrecord.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.rt_elwc_sizes.restype = ctypes.c_int
    lib.rt_elwc_sizes.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rt_libsvm_parse.restype = ctypes.c_void_p
    lib.rt_libsvm_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.rt_libsvm_num_queries.restype = ctypes.c_int64
    lib.rt_libsvm_num_queries.argtypes = [ctypes.c_void_p]
    lib.rt_libsvm_num_bad.restype = ctypes.c_int64
    lib.rt_libsvm_num_bad.argtypes = [ctypes.c_void_p]
    lib.rt_libsvm_fill.restype = None
    lib.rt_libsvm_fill.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.rt_libsvm_qid.restype = ctypes.c_int
    lib.rt_libsvm_qid.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int]
    lib.rt_libsvm_free.restype = None
    lib.rt_libsvm_free.argtypes = [ctypes.c_void_p]
    lib.rt_vocab_create.restype = ctypes.c_void_p
    lib.rt_vocab_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.rt_vocab_free.restype = None
    lib.rt_vocab_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _vocab_handle(lib, vocab) -> int:
  """Returns (building once) the C++ lookup-table handle for a
  parsers.Vocabulary. The handle is cached on the Vocabulary object and
  freed when the Vocabulary is garbage collected; it is immutable after
  creation, so decode threads share it freely. Callers must keep the
  Vocabulary alive while specs referencing the handle are in use (specs
  hold the Vocabulary, so this falls out naturally)."""
  handle = getattr(vocab, '_native_handle', None)
  if handle is not None:
    return handle
  tokens = vocab.tokens
  n = len(tokens)
  toks = (ctypes.c_char_p * max(1, n))(*tokens)
  lens = (ctypes.c_int64 * max(1, n))(*[len(t) for t in tokens])
  handle = lib.rt_vocab_create(
      ctypes.cast(toks, ctypes.POINTER(ctypes.c_char_p)),
      ctypes.cast(lens, ctypes.POINTER(ctypes.c_int64)),
      n, vocab.num_oov_buckets)
  vocab._native_handle = handle
  weakref.finalize(vocab, lib.rt_vocab_free, handle)
  return handle


def load_libsvm_lists(path: str, list_size: int, num_features: int,
                      padding_label: float = -1.0):
  """Native LIBSVM loader; same contract as data.libsvm.load_libsvm_lists."""
  import numpy as np
  lib = _load()
  if lib is None:
    raise RuntimeError('native decoder unavailable')
  with open(path, 'rb') as f:
    data = f.read()
  handle = lib.rt_libsvm_parse(data, len(data))
  try:
    n_bad = lib.rt_libsvm_num_bad(handle)
    if n_bad:
      # Same strictness as the Python loader, which raises per row.
      raise ValueError(
          f'{n_bad} malformed LIBSVM row(s) in {path} (missing qid or '
          f'bad feature token)')
    nq = lib.rt_libsvm_num_queries(handle)
    features = np.empty((nq, list_size, num_features), np.float32)
    labels = np.empty((nq, list_size), np.float32)
    lib.rt_libsvm_fill(
        handle, list_size, num_features, padding_label,
        features.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    buf = ctypes.create_string_buffer(256)
    qids = []
    for i in range(nq):
      lib.rt_libsvm_qid(handle, i, buf, 256)
      qids.append(buf.value.decode())
    return features, labels, np.asarray(qids)
  finally:
    lib.rt_libsvm_free(handle)


def available() -> bool:
  return _load() is not None


def loader_supported(context_spec, example_spec,
                     data_format: str = 'example_list_with_context',
                     list_size=None) -> bool:
  """True iff NativeLoader can serve these specs — the side-effect-free
  mirror of the validation in NativeLoader.__init__/specs_for (kept in
  lockstep: anything this accepts must construct, anything it rejects
  falls back to the Python parser). Lets the pipeline's 'auto' engine
  choose the C++ streaming loader without constructing one."""
  from ranking_tpu.data import parsers
  if not available() or list_size is None:
    return False
  try:
    _loader_format(data_format)
  except ValueError:
    return False
  for spec_map in (context_spec, example_spec):
    for spec in spec_map.values():
      if isinstance(spec, parsers.FixedLenFeature):
        if spec.dtype == 'string':
          return False
      elif isinstance(spec, parsers.VarLenFeature):
        if spec.max_len is None or spec.pad_value != -1:
          return False
        if spec.dtype == 'string':
          if spec.vocab is not None:
            if spec.vocab.size > 2**31 - 1:
              return False
          elif spec.hash_buckets:
            if spec.hash_buckets > 2**31 - 1:
              return False
          else:
            return False
        elif spec.dtype != 'int64':
          return False
      else:
        return False
  return True


def cache_file_for(cache_dir, paths, context_spec, example_spec,
                   list_size, data_format='example_list_with_context'):
  """Spill-file path for the decoded-once epoch cache (loader.cc Cache).

  The name folds in a CONTENT fingerprint of everything that shapes
  decoded payloads — the file list, every spec field, vocab token lists
  and OOV bucket counts, hash bucket counts, list_size, format — so a
  recipe change gets a fresh spill instead of colliding with a stale one.
  (The C++ side separately re-validates structure and per-file size/mtime
  on open and rebuilds in place when they drift.) Creates ``cache_dir``
  if needed and returns ``cache_dir/rtcache-<hex>.bin``.
  """
  import hashlib

  from ranking_tpu.data import parsers
  h = hashlib.sha256()
  h.update(f'{data_format}|{list_size}|'.encode())
  for p in paths:
    h.update(str(p).encode() + b'\x00')
  for tag, spec_map in (('ctx', context_spec), ('ex', example_spec)):
    for name in sorted(spec_map):
      spec = spec_map[name]
      h.update(f'|{tag}:{name}:'.encode())
      if isinstance(spec, parsers.FixedLenFeature):
        h.update(
            f'F{spec.shape}:{spec.dtype}:{spec.default_value!r}'.encode())
      else:
        h.update(f'V{spec.dtype}:{spec.max_len}:{spec.pad_value!r}:'
                 f'{spec.hash_buckets}'.encode())
        if spec.vocab is not None:
          h.update(str(spec.vocab.num_oov_buckets).encode())
          for t in spec.vocab.tokens:
            h.update(t + b'\x00')
  os.makedirs(cache_dir, exist_ok=True)
  return os.path.join(cache_dir, f'rtcache-{h.hexdigest()[:24]}.bin')


def check_presence(outputs, valid_rows) -> None:
  """Enforces the strict Python-parser semantics on the native fast path.

  ``outputs`` maps name -> (arr, spec, presence) where presence is a [rows]
  int32 decoded-value-count array (None for varlen specs); ``valid_rows`` is
  a bool [rows] mask of rows backed by real records/documents (None = all).
  Mirrors parsers._extract: a required FixedLenFeature (default_value None)
  absent from a real record raises, and a present feature with the wrong
  value count raises — exactly like the pure-Python parse path.
  """
  import numpy as np
  from ranking_tpu.data import parsers
  for name, (_arr, spec, presence) in outputs.items():
    if presence is None or not isinstance(spec, parsers.FixedLenFeature):
      continue
    size = int(np.prod(spec.shape)) if spec.shape else 1
    counts = presence if valid_rows is None else presence[valid_rows]
    if spec.default_value is None and (counts == 0).any():
      raise ValueError(f'Missing required feature {name!r}')
    bad = (counts != 0) & (counts != size)
    if bad.any():
      got = int(counts[bad][0])
      raise ValueError(
          f'Feature {name!r}: got {got} values, expected {size}')


def read_tfrecord_payloads(path: str):
  """Fast TFRecord payload scan; returns a list of bytes."""
  lib = _load()
  if lib is None:
    raise RuntimeError('native decoder unavailable')
  import numpy as np
  with open(path, 'rb') as f:
    data = f.read()
  max_records = max(16, len(data) // 16)
  offsets = np.zeros(max_records, np.int64)
  lengths = np.zeros(max_records, np.int64)
  n = lib.rt_scan_tfrecord(
      data, len(data),
      offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
      lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
      max_records)
  return [data[offsets[i]:offsets[i] + lengths[i]] for i in range(n)]


def decode_elwc_batch(records, list_size, context_spec, example_spec,
                      data_format='example_list_with_context'):
  """Decodes serialized ELWC or SequenceExample records natively.

  Specs are mappings name -> parsers.FeatureSpec restricted to the
  kernelized kinds: FixedLenFeature float32/int64 and VarLenFeature
  int64 / hashed string. Returns a parsers.ParsedLists.
  """
  import numpy as np

  from ranking_tpu.data import parsers

  lib = _load()
  if lib is None:
    raise RuntimeError('native decoder unavailable')
  n = len(records)

  def make_specs(spec_map, rows):
    structs = []
    outputs = {}
    for name in sorted(spec_map):
      spec = spec_map[name]
      st = FeatureSpecStruct()
      st.name = name.encode()
      presence = None
      if isinstance(spec, parsers.FixedLenFeature):
        size = int(np.prod(spec.shape)) if spec.shape else 1
        st.size = size
        if spec.dtype == 'string':
          raise ValueError('fixed-len string not supported natively')
        st.default_value = float(
            0.0 if spec.default_value is None else spec.default_value)
        if spec.dtype == 'float32':
          st.kind = KIND_FIXED_FLOAT
          arr = np.empty((rows, size), np.float32)
          st.fout = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        else:
          st.kind = KIND_FIXED_INT64
          arr = np.empty((rows, size), np.int64)
          st.lout = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        # Presence counts enforce the strict-parser semantics
        # (missing required / wrong value count raise, parsers._extract).
        presence = np.zeros(rows, np.int32)
        st.present = presence.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
      else:
        if spec.max_len is None:
          raise ValueError('native varlen decode requires max_len')
        if spec.pad_value != -1:
          raise ValueError(
              f'native varlen decode pads with -1; {name!r} asks for '
              f'pad_value={spec.pad_value!r} (Python parser honors it)')
        st.size = spec.max_len
        if spec.dtype == 'string':
          if spec.vocab is not None:
            if spec.vocab.size > 2**31 - 1:
              raise ValueError(
                  f'vocab size {spec.vocab.size} exceeds int32 ids '
                  f'({name!r}); the id arrays are int32 on every path')
            st.kind = KIND_VARLEN_VOCAB
            st.vocab = _vocab_handle(lib, spec.vocab)
          elif spec.hash_buckets:
            if spec.hash_buckets > 2**31 - 1:
              raise ValueError(
                  f'hash_buckets {spec.hash_buckets} exceeds int32 ids '
                  f'({name!r}); the id arrays are int32 on every path')
            st.kind = KIND_VARLEN_HASHED
            st.buckets = spec.hash_buckets
          else:
            raise ValueError(
                'native string decode requires vocab or hash_buckets')
          arr = np.empty((rows, spec.max_len), np.int32)
          st.iout = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        elif spec.dtype == 'int64':
          st.kind = KIND_VARLEN_INT64
          arr = np.empty((rows, spec.max_len), np.int64)
          st.lout = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        else:
          raise ValueError('native varlen float not supported')
      structs.append(st)
      outputs[name] = (arr, spec, presence)
    arr_type = FeatureSpecStruct * max(1, len(structs))
    c_arr = arr_type(*structs) if structs else arr_type()
    return c_arr, outputs

  recs = (ctypes.c_char_p * n)(*records)
  lens = (ctypes.c_int64 * n)(*[len(r) for r in records])
  ctx_structs, ctx_out = make_specs(context_spec, n)
  ex_structs, ex_out = make_specs(example_spec, n * list_size)
  sizes = np.zeros(n, np.int32)

  decoders = {'example_list_with_context': lib.rt_decode_elwc_batch,
              'sequence_example': lib.rt_decode_seq_batch,
              'example_in_example': lib.rt_decode_eie_batch,
              'tf_example': lib.rt_decode_example_batch}
  if data_format not in decoders:
    raise ValueError(f'Unknown data_format {data_format!r}; '
                     f'expected one of {sorted(decoders)}')
  decode = decoders[data_format]
  rc = decode(
      ctypes.cast(recs, ctypes.POINTER(ctypes.c_char_p)),
      ctypes.cast(lens, ctypes.POINTER(ctypes.c_int64)),
      n, list_size,
      ctypes.cast(ctx_structs, ctypes.POINTER(FeatureSpecStruct)),
      len(context_spec),
      ctypes.cast(ex_structs, ctypes.POINTER(FeatureSpecStruct)),
      len(example_spec),
      sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
  if rc != 0:
    raise ValueError('malformed ELWC record in native decode')

  mask = np.arange(list_size)[None, :] < sizes[:, None]
  check_presence(ctx_out, valid_rows=None)
  check_presence(ex_out, valid_rows=mask.reshape(-1))

  def finalize(outputs, rows, listwise):
    out = {}
    for name, (arr, spec, _presence) in outputs.items():
      if isinstance(spec, parsers.FixedLenFeature):
        a = arr
        if spec.shape:
          a = a.reshape((rows,) + tuple(spec.shape))
        else:
          a = a.reshape(rows)
      else:
        a = arr if arr.dtype == np.int64 else arr.astype(np.int64)
      if listwise:
        a = a.reshape((n, list_size) + a.shape[1:])
      out[name] = a
    return out

  return parsers.ParsedLists(
      context=finalize(ctx_out, n, False),
      examples=finalize(ex_out, n * list_size, True),
      sizes=sizes, mask=mask)


def elwc_sizes(records):
  """[B] int32 list lengths from serialized ELWC protos (C++ top-level
  scan, no feature decoding). Raises RuntimeError when the native library
  is unavailable and ValueError on malformed input."""
  import numpy as np

  lib = _load()
  if lib is None:
    raise RuntimeError('native decoder unavailable')
  n = len(records)
  records = [bytes(r) for r in records]
  recs = (ctypes.c_char_p * n)(*records)
  lens = (ctypes.c_int64 * n)(*[len(r) for r in records])
  sizes = np.zeros(n, np.int32)
  rc = lib.rt_elwc_sizes(
      ctypes.cast(recs, ctypes.POINTER(ctypes.c_char_p)),
      ctypes.cast(lens, ctypes.POINTER(ctypes.c_int64)),
      n, sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
  if rc != 0:
    raise ValueError('malformed ELWC record in native size scan')
  return sizes


def _register_loader_api(lib) -> None:
  if hasattr(lib, '_loader_registered'):
    return
  lib.rt_loader_create.restype = ctypes.c_void_p
  lib.rt_loader_create.argtypes = [
      ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
      ctypes.POINTER(FeatureSpecStruct), ctypes.c_int,
      ctypes.POINTER(FeatureSpecStruct), ctypes.c_int,
      ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
      ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
      ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_char_p,
  ]
  lib.rt_loader_cache_state.restype = ctypes.c_int
  lib.rt_loader_cache_state.argtypes = [ctypes.c_void_p]
  lib.rt_loader_submit.restype = ctypes.c_int
  lib.rt_loader_submit.argtypes = [
      ctypes.c_void_p,
      ctypes.POINTER(FeatureSpecStruct), ctypes.c_int,
      ctypes.POINTER(FeatureSpecStruct), ctypes.c_int,
      ctypes.POINTER(ctypes.c_int32),
  ]
  lib.rt_loader_wait.restype = ctypes.c_int
  lib.rt_loader_wait.argtypes = [ctypes.c_void_p]
  lib.rt_loader_destroy.restype = None
  lib.rt_loader_destroy.argtypes = [ctypes.c_void_p]
  lib._loader_registered = True


class NativeLoader:
  """Streaming native loader: C++ threads own read/shuffle/decode/batch.

  Iterates ``parsers.ParsedLists`` (same contract as the Python parse
  path); ``dataset.parsed_to_batch`` turns them into RankingBatches. The
  ring keeps decode ahead of the consumer (loader.cc).
  """

  def __init__(self, paths, context_spec, example_spec, batch_size,
               list_size, shuffle=True, shuffle_buffer=1000, epochs=1,
               drop_remainder=True, seed=0, ring_capacity=None,
               data_format='example_list_with_context', num_threads=None,
               skip_batches=0, cache_path=None):
    import numpy as np
    from ranking_tpu.data import parsers
    lib = _load()
    if lib is None:
      raise RuntimeError('native loader unavailable')
    _register_loader_api(lib)
    self._lib = lib
    self._np = np
    self._parsers = parsers
    self.batch_size = batch_size
    self.list_size = list_size
    self.context_spec = dict(context_spec)
    self.example_spec = dict(example_spec)

    def specs_for(spec_map):
      structs = []
      for name in sorted(spec_map):
        spec = spec_map[name]
        st = FeatureSpecStruct()
        st.name = name.encode()
        if isinstance(spec, parsers.FixedLenFeature):
          if spec.dtype == 'string':
            raise ValueError('fixed-len string not supported natively')
          st.kind = (KIND_FIXED_FLOAT if spec.dtype == 'float32'
                     else KIND_FIXED_INT64)
          st.size = int(np.prod(spec.shape)) if spec.shape else 1
          st.default_value = float(
              0.0 if spec.default_value is None else spec.default_value)
        else:
          if spec.max_len is None:
            raise ValueError('native loader requires max_len')
          if spec.pad_value != -1:
            raise ValueError(
                f'native loader pads varlen with -1; {name!r} asks for '
                f'pad_value={spec.pad_value!r} (use build_ranking_dataset '
                f'for the Python parser, which honors it)')
          st.size = spec.max_len
          if spec.dtype == 'string':
            if spec.vocab is not None:
              if spec.vocab.size > 2**31 - 1:
                raise ValueError(
                    f'vocab size {spec.vocab.size} exceeds int32 ids '
                    f'({name!r}); the id arrays are int32 on every path')
              st.kind = KIND_VARLEN_VOCAB
              st.vocab = _vocab_handle(lib, spec.vocab)
            elif spec.hash_buckets:
              if spec.hash_buckets > 2**31 - 1:
                raise ValueError(
                    f'hash_buckets {spec.hash_buckets} exceeds int32 ids '
                    f'({name!r}); the id arrays are int32 on every path')
              st.kind = KIND_VARLEN_HASHED
              st.buckets = spec.hash_buckets
            else:
              raise ValueError('native loader requires vocab or '
                               'hash_buckets for string features')
          elif spec.dtype == 'int64':
            st.kind = KIND_VARLEN_INT64
          else:
            raise ValueError('native varlen float not supported')
        structs.append(st)
      arr_type = FeatureSpecStruct * max(1, len(structs))
      return arr_type(*structs) if structs else arr_type()

    if num_threads is None:
      num_threads = min(8, os.cpu_count() or 1)
    self.num_threads = max(1, int(num_threads))
    if ring_capacity is None:
      # Enough queued work to keep every decoder busy across consumer
      # hiccups without unbounded buffering.
      ring_capacity = 2 * self.num_threads + 2
    self._ctx_structs = specs_for(self.context_spec)
    self._ex_structs = specs_for(self.example_spec)
    c_paths = (ctypes.c_char_p * len(paths))(
        *[str(p).encode() for p in paths])
    self._handle = lib.rt_loader_create(
        ctypes.cast(c_paths, ctypes.POINTER(ctypes.c_char_p)), len(paths),
        ctypes.cast(self._ctx_structs, ctypes.POINTER(FeatureSpecStruct)),
        len(self.context_spec),
        ctypes.cast(self._ex_structs, ctypes.POINTER(FeatureSpecStruct)),
        len(self.example_spec),
        batch_size, list_size, int(shuffle), shuffle_buffer,
        0 if epochs is None else epochs, int(drop_remainder), seed,
        ring_capacity, _loader_format(data_format), self.num_threads,
        # Decode-free fast-forward (deterministic data resume): the C++
        # reader drops this many leading record batches at mmap-scan
        # speed; the stream after the skip is bitwise-equal to
        # batches[skip:] of an unskipped run.
        int(skip_batches),
        # Decoded-once epoch cache spill file (loader.cc Cache): None =
        # off. The loader validates a structural fingerprint (specs,
        # list_size, format, per-file size+mtime); CONTENT identity of
        # vocab tables is the caller's job — derive the path with
        # `cache_file_for`, which folds vocab/hash content into the name.
        str(cache_path).encode() if cache_path else None)

    # Direct-write buffer ring: K freshly-allocated numpy buffer sets are
    # registered with the C++ side ahead of consumption; decode workers
    # write feature values (and page-fault the fresh pages) straight into
    # them in parallel, so the consumer thread copies nothing — it waits,
    # wraps the oldest finished set, and submits a replacement. The ring
    # also IS the loader's backpressure (a worker cannot decode batch k
    # until set k is submitted).
    import collections
    self._ring = collections.deque()
    self._ended = False
    for _ in range(self.num_threads + 2):
      self._submit_set()

  def _submit_set(self):
    ctx_out = self._alloc(self.context_spec, self._ctx_structs,
                          self.batch_size)
    ex_out = self._alloc(self.example_spec, self._ex_structs,
                         self.batch_size * self.list_size)
    sizes = self._np.zeros(self.batch_size, self._np.int32)
    self._lib.rt_loader_submit(
        self._handle,
        ctypes.cast(self._ctx_structs, ctypes.POINTER(FeatureSpecStruct)),
        len(self.context_spec),
        ctypes.cast(self._ex_structs, ctypes.POINTER(FeatureSpecStruct)),
        len(self.example_spec),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    self._ring.append((ctx_out, ex_out, sizes))

  def __iter__(self):
    return self

  @property
  def cache_state(self) -> str:
    """Epoch-cache engagement: 'off' (no cache requested, path unusable,
    or another loader holds the lock), 'build' (decoding + writing the
    spill), or 'read' (streaming a complete spill, proto files never
    opened). Settles once the reader thread has initialized — i.e. by the
    time the first batch arrives; earlier calls may transiently say
    'off'."""
    if not getattr(self, '_handle', None):
      return 'off'
    return {0: 'off', 1: 'build',
            2: 'read'}[self._lib.rt_loader_cache_state(self._handle)]

  def _alloc(self, spec_map, structs, rows):
    # np.empty is safe: the C++ decode worker prefills + writes every row
    # it returns (faulting the fresh pages off the consumer thread), and
    # finalize / check_presence only touch rows < n — the uninitialized
    # tail of a partial final batch is sliced away. The struct array is
    # reused across submits: rt_loader_submit copies the pointers out
    # synchronously.
    np = self._np
    outputs = {}
    for i, name in enumerate(sorted(spec_map)):
      spec = spec_map[name]
      st = structs[i]
      presence = None
      if st.kind == KIND_FIXED_FLOAT:
        arr = np.empty((rows, st.size), np.float32)
        st.fout = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
      elif st.kind in (KIND_FIXED_INT64, KIND_VARLEN_INT64):
        arr = np.empty((rows, st.size), np.int64)
        st.lout = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
      else:
        arr = np.empty((rows, st.size), np.int32)
        st.iout = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
      if st.kind in (KIND_FIXED_FLOAT, KIND_FIXED_INT64):
        presence = np.empty(rows, np.int32)
        st.present = presence.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32))
      outputs[name] = (arr, spec, presence)
    return outputs

  def __next__(self):
    np, parsers = self._np, self._parsers
    if self._ended:
      raise StopIteration
    n = self._lib.rt_loader_wait(self._handle)
    if n < 0:
      raise ValueError(
          'native loader stream error: a record failed to decode (the '
          'data is corrupt — the one-shot parser raises for the same '
          'input) or an input file became unreadable mid-stream '
          '(truncated read / fstat failure); training on the partial '
          'corpus would be silent data loss')
    if n == 0:
      self._ended = True
      raise StopIteration
    ctx_out, ex_out, sizes = self._ring.popleft()
    self._submit_set()  # keep the decode pipeline primed

    sizes = sizes[:n]
    mask = np.arange(self.list_size)[None, :] < sizes[:, None]
    full_mask = np.zeros(self.batch_size * self.list_size, bool)
    full_mask[:n * self.list_size] = mask.reshape(-1)
    ctx_valid = np.zeros(self.batch_size, bool)
    ctx_valid[:n] = True
    check_presence(ctx_out, valid_rows=ctx_valid)
    check_presence(ex_out, valid_rows=full_mask)

    def finalize(outputs, listwise):
      out = {}
      for name, (arr, spec, _presence) in outputs.items():
        a = arr[:n * self.list_size] if listwise else arr[:n]
        if isinstance(spec, parsers.FixedLenFeature):
          if spec.shape:
            a = a.reshape((a.shape[0],) + tuple(spec.shape))
          else:
            a = a.reshape(a.shape[0])
        else:
          a = a if a.dtype == np.int64 else a.astype(np.int64)
        if listwise:
          a = a.reshape((n, self.list_size) + a.shape[1:])
        out[name] = a
      return out
    return parsers.ParsedLists(
        context=finalize(ctx_out, False),
        examples=finalize(ex_out, True),
        sizes=sizes, mask=mask)

  def close(self):
    if getattr(self, '_handle', None):
      # Destroy first: it joins the worker threads, after which no C++
      # thread can touch the ring's numpy buffers.
      self._lib.rt_loader_destroy(self._handle)
      self._handle = None
      self._ring.clear()

  def __del__(self):
    try:
      self.close()
    except Exception:
      pass
