"""Streaming ranking dataset pipeline: files -> shuffled padded batches.

Host-side replacement for the reference's tf.data pipeline
(tensorflow_ranking/python/data.py:914-1017: list_files -> interleave ->
repeat -> shuffle -> batch -> parse batched -> prefetch): a record-level
reader with an epoch-aware shuffle buffer, batch-wise proto parsing on a
thread pool, and double-buffered host->device transfer with an explicit
``data``-axis sharding (the host side of the input feed the reference
delegated to ``tf.distribute``'s dataset iterators).
"""

from __future__ import annotations

import concurrent.futures
import glob as glob_lib
import queue
import threading
from typing import (Any, Callable, Dict, Iterable, Iterator, List, Mapping,
                    Optional, Union)

import jax
import numpy as np

from ranking_tpu.data import parsers, tfrecord
from ranking_tpu.data.batch import RankingBatch
from ranking_tpu.data.parsers import FeatureSpec, ParsedLists

PARSER_FNS = {
    'example_list_with_context': parsers.parse_example_list,
    'example_in_example': parsers.parse_example_in_example,
    'sequence_example': parsers.parse_sequence_example,
    'tf_example': parsers.parse_tf_example,
}


def _records_stream(paths: List[str], epochs: Optional[int],
                    shuffle_files: bool,
                    rng: np.random.RandomState,
                    interleave_files: int = 1) -> Iterator[bytes]:
  """File walk with optional cycle interleave: up to
  ``interleave_files`` readers are open at once and records round-robin
  across them (the tf.data list_files -> interleave analog,
  python/data.py:941-960)."""
  epoch = 0
  while epochs is None or epoch < epochs:
    order = list(paths)
    if shuffle_files:
      rng.shuffle(order)
    if interleave_files <= 1:
      for p in order:
        yield from tfrecord.read_records(p)
    else:
      pending = list(order)
      readers: List[Iterator[bytes]] = []
      while pending or readers:
        while pending and len(readers) < interleave_files:
          readers.append(tfrecord.read_records(pending.pop(0)))
        i = 0
        while i < len(readers):
          try:
            yield next(readers[i])
            i += 1
          except StopIteration:
            readers.pop(i)
            if pending:
              readers.append(tfrecord.read_records(pending.pop(0)))
    epoch += 1


def _shuffled(stream: Iterator[bytes], buffer_size: int,
              rng: np.random.RandomState) -> Iterator[bytes]:
  if buffer_size <= 1:
    yield from stream
    return
  buf: List[bytes] = []
  for rec in stream:
    buf.append(rec)
    if len(buf) >= buffer_size:
      i = rng.randint(len(buf))
      buf[i], buf[-1] = buf[-1], buf[i]
      yield buf.pop()
  rng.shuffle(buf)
  yield from buf


def _batched(stream: Iterator[bytes], batch_size: int,
             drop_remainder: bool) -> Iterator[List[bytes]]:
  batch: List[bytes] = []
  for rec in stream:
    batch.append(rec)
    if len(batch) == batch_size:
      yield batch
      batch = []
  if batch and not drop_remainder:
    yield batch


def parsed_to_batch(
    parsed: ParsedLists,
    label_feature_name: Union[str, Mapping[str, str]],
    convert_labels_to_binary: bool = False,
    mask_feature_name: Optional[str] = None,
    size_feature_name: Optional[str] = None,
    padded_batch_size: Optional[int] = None,
) -> RankingBatch:
  """ParsedLists -> RankingBatch: pops the label feature(s) out of the
  example features, squeezes each to [B, L], stamps -1 on padded slots
  (python/data.py:41), optionally binarizes (keras/pipeline.py:1026-1117
  SimpleDatasetBuilder), and exposes mask/size features on request
  (python/data.py:99-130).

  ``label_feature_name`` may be a dict mapping task names to label feature
  names, yielding dict labels for multi-task training — the
  MultiLabelDatasetBuilder path (keras/pipeline.py:1120-1221)."""
  examples = dict(parsed.examples)

  def _pop_label(name: str) -> np.ndarray:
    labels = examples.pop(name).astype(np.float32)
    labels = labels.reshape(labels.shape[0], labels.shape[1])
    if convert_labels_to_binary:
      labels = np.where(labels > 0, 1.0, np.where(labels >= 0, 0.0, labels))
    return np.where(parsed.mask, labels, parsers.PADDING_LABEL)

  if isinstance(label_feature_name, str):
    labels = _pop_label(label_feature_name)
  else:
    labels = {task: _pop_label(name)
              for task, name in label_feature_name.items()}

  context = dict(parsed.context)
  mask = parsed.mask
  if size_feature_name:
    context[size_feature_name] = parsed.sizes.astype(np.int32)
  if mask_feature_name:
    examples[mask_feature_name] = mask

  n_rows = (next(iter(labels.values())).shape[0]
            if isinstance(labels, dict) else labels.shape[0])
  if padded_batch_size and n_rows < padded_batch_size:
    pad = padded_batch_size - n_rows

    def _pad(a):
      widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
      return np.pad(a, widths)

    def _pad_labels(l):
      return np.concatenate(
          [l, np.full((pad, l.shape[1]), parsers.PADDING_LABEL, l.dtype)])

    context = {k: _pad(v) for k, v in context.items()}
    examples = {k: _pad(v) for k, v in examples.items()}
    labels = ({k: _pad_labels(v) for k, v in labels.items()}
              if isinstance(labels, dict) else _pad_labels(labels))
    mask = np.concatenate([mask, np.zeros((pad, mask.shape[1]), bool)])

  return RankingBatch(context=context, examples=examples, labels=labels,
                      mask=mask)


def _shard_paths(paths: List[str], shard_index: Optional[int],
                 num_shards: Optional[int], file_pattern: str) -> List[str]:
  """Multi-host input sharding: each process reads a disjoint file subset
  (the auto-shard analog of tf.distribute's dataset distribution).
  ``shard_index`` defaults to ``jax.process_index()``."""
  if not num_shards:
    return paths
  if shard_index is None:
    shard_index = jax.process_index()
  if not 0 <= shard_index < num_shards:
    raise ValueError(f'shard_index {shard_index} out of range for '
                     f'num_shards={num_shards}')
  paths = paths[shard_index::num_shards]
  if not paths:
    raise ValueError(
        f'shard {shard_index}/{num_shards} got no files; need at least '
        f'{num_shards} files matching {file_pattern!r}')
  return paths


def build_ranking_dataset(
    file_pattern: str,
    data_format: str,
    batch_size: int,
    context_feature_spec: Mapping[str, FeatureSpec],
    example_feature_spec: Mapping[str, FeatureSpec],
    label_feature_name: str = 'relevance',
    list_size: Optional[int] = None,
    convert_labels_to_binary: bool = False,
    epochs: Optional[int] = 1,
    shuffle: bool = True,
    shuffle_buffer_size: int = 1000,
    shuffle_examples: bool = False,
    drop_remainder: bool = True,
    pad_final_batch: bool = False,
    mask_feature_name: Optional[str] = None,
    size_feature_name: Optional[str] = None,
    seed: Optional[int] = None,
    num_parser_threads: int = 4,
    prefetch_batches: int = 4,
    shard_index: Optional[int] = None,
    num_shards: Optional[int] = None,
    interleave_files: int = 1,
    skip_batches: int = 0,
) -> Iterator[RankingBatch]:
  """Streams RankingBatches from TFRecord files of ranking protos.

  The parse stage runs on a thread pool with ``prefetch_batches`` batches in
  flight (protobuf upb parsing releases the GIL) — the AUTOTUNE-prefetch
  analog of python/data.py:1015.

  ``drop_remainder`` defaults to True at this level (static batch shapes
  are the TPU-friendly default); note the reference drops the final
  partial batch only on REPEATED streams (``drop_final_batch or
  num_epochs is None``, python/data.py:1008) — the pipeline's dataset
  builders apply that rule, so pass ``drop_remainder=False`` explicitly
  for a standalone finite eval pass that must score the full split.

  ``skip_batches``: parse-free fast-forward for deterministic data resume
  (pipeline ``resume_dataset``): the leading record batches are pulled
  through the (seed-deterministic) shuffle and dropped unparsed, so the
  stream continues bitwise-equal to ``batches[skip_batches:]`` of an
  unskipped run at record-scan speed.
  """
  if data_format not in PARSER_FNS:
    raise ValueError(f'Unknown data_format {data_format!r}; '
                     f'one of {sorted(PARSER_FNS)}')
  if list_size is None and data_format != 'example_list_with_context':
    # Dynamic bucketed lists need the cheap serialized-length probe,
    # which exists for ELWC only (parsers.elwc_list_sizes).
    raise ValueError(
        'list_size=None (bucketed dynamic list sizes) is supported for '
        "data_format='example_list_with_context' only; set an explicit "
        'list_size for other formats (static shapes on TPU)')
  paths = sorted(glob_lib.glob(file_pattern))
  if not paths:
    raise FileNotFoundError(f'No files match {file_pattern!r}')
  paths = _shard_paths(paths, shard_index, num_shards, file_pattern)
  if shuffle_examples and data_format not in (
      'example_list_with_context', 'example_in_example'):
    raise ValueError(
        f'shuffle_examples is not supported for {data_format!r} '
        '(the parser has no within-list shuffle); it would be a silent '
        'no-op')
  if pad_final_batch and drop_remainder:
    raise ValueError(
        'pad_final_batch=True with drop_remainder=True is contradictory: '
        'the partial batch would be dropped before padding could apply; '
        'pass drop_remainder=False')
  rng = np.random.RandomState(seed)
  parse_fn = PARSER_FNS[data_format]

  stream = _records_stream(paths, epochs, shuffle, rng,
                           interleave_files=interleave_files)
  if shuffle:
    stream = _shuffled(stream, shuffle_buffer_size, rng)
  batches = _batched(stream, batch_size, drop_remainder)
  # skip_batches is applied inside _fill, NOT by slicing `batches`: the
  # per-batch shuffle_examples seed draws must still occur for skipped
  # batches, or the shared rng stream shifts and the post-skip batches
  # diverge from batches[skip:] of an unskipped run.

  warned_fallback = [False]

  def _native_parse(records: List[bytes], batch_list_size):
    """C++ fast path for plain ELWC batches (data/native/decoder.cc);
    returns None when the config isn't natively decodable."""
    if (data_format not in ('example_list_with_context',
                            'sequence_example', 'example_in_example')
        or shuffle_examples or batch_list_size is None):
      return None
    try:
      from ranking_tpu.data import native
      if not native.available():
        return None
      return native.decode_elwc_batch(
          records, batch_list_size, context_feature_spec,
          example_feature_spec, data_format=data_format)
    except (ValueError, RuntimeError) as e:
      # Capability fallback to the (strict, authoritative) Python parser.
      # Warn once: a silent per-batch fallback would hide both strictness
      # divergence and a permanent ~10x input-pipeline slowdown.
      if not warned_fallback[0]:
        warned_fallback[0] = True
        import warnings
        warnings.warn(
            f'native decode fell back to the Python parser: {e!r} '
            f'(reported once; subsequent batches fall back silently)')
      return None

  def _parse(records: List[bytes],
             shuffle_seed: Optional[int] = None) -> RankingBatch:
    batch_list_size = list_size
    if batch_list_size is None:
      # Bucketed dynamic list sizes: pad each batch to its longest list
      # rounded up the half-step power-of-two ladder — bounded distinct
      # compile shapes (one jit cache entry per bucket), <= 33% padding,
      # vs. the reference's fully-dynamic per-batch shapes
      # (python/data.py:169-183), which would recompile per length.
      from ranking_tpu.data.parsers import (bucket_list_size,
                                            elwc_list_sizes)
      batch_list_size = bucket_list_size(elwc_list_sizes(records).max())
    parsed = _native_parse(records, batch_list_size)
    if parsed is None:
      kwargs = {}
      if data_format in ('example_list_with_context', 'example_in_example'):
        # The shuffle rng seed is drawn in the FILLER thread (submit
        # time), not here: parser-pool threads must never touch the
        # shared RandomState or seeded runs lose reproducibility.
        kwargs = dict(shuffle_examples=shuffle_examples,
                      rng=np.random.RandomState(shuffle_seed)
                      if shuffle_seed is not None else None)
      parsed = parse_fn(records, context_feature_spec, example_feature_spec,
                        list_size=batch_list_size, **kwargs)
    return parsed_to_batch(
        parsed, label_feature_name,
        convert_labels_to_binary=convert_labels_to_binary,
        mask_feature_name=mask_feature_name,
        size_feature_name=size_feature_name,
        padded_batch_size=batch_size if pad_final_batch else None)

  with concurrent.futures.ThreadPoolExecutor(num_parser_threads) as pool:
    # Bounded queue: the filler blocks once ``prefetch_batches`` parses are
    # in flight, so the raw-record stream is consumed lazily.
    pending: 'queue.Queue' = queue.Queue(maxsize=max(1, prefetch_batches))
    it = iter(batches)
    stop = threading.Event()  # consumer abandoned the generator

    def _offer(item) -> bool:
      # Blocks until queue space or the consumer is gone — a full queue is
      # the steady state of a healthy pipeline, so nothing (least of all
      # the end-of-stream sentinel) may ever be dropped on queue.Full.
      while not stop.is_set():
        try:
          pending.put(item, timeout=0.1)
          return True
        except queue.Full:
          continue
      return False

    def _fill():
      # Stream errors (corrupt TFRecord, IO failure) must surface in the
      # consumer, not turn into a clean end-of-stream that silently
      # truncates the dataset: enqueue the exception itself.
      sentinel = None
      try:
        for index, recs in enumerate(it):
          seed = (int(rng.randint((1 << 31) - 1))
                  if shuffle_examples else None)
          if index < skip_batches:
            continue  # parse-free fast-forward; rng draws stay aligned
          try:
            fut = pool.submit(_parse, recs, seed)
          except RuntimeError:
            return  # pool shut down: consumer abandoned the generator
          if not _offer(fut):
            return
      except BaseException as e:  # noqa: B036 — re-raised in the consumer
        sentinel = e
      finally:
        _offer(sentinel)

    filler = threading.Thread(target=_fill, daemon=True)
    filler.start()
    try:
      while True:
        item = pending.get()
        if item is None:
          return
        if isinstance(item, BaseException):
          raise item
        yield item.result()
    finally:
      stop.set()
      try:  # unblock a filler parked in put()
        while True:
          pending.get_nowait()
      except queue.Empty:
        pass


def native_ranking_dataset(
    file_pattern: str,
    batch_size: int,
    *,
    data_format: str = 'example_list_with_context',
    context_feature_spec: Mapping[str, FeatureSpec],
    example_feature_spec: Mapping[str, FeatureSpec],
    label_feature_name: str = 'relevance',
    list_size: Optional[int] = None,
    convert_labels_to_binary: bool = False,
    epochs: Optional[int] = 1,
    shuffle: bool = True,
    shuffle_buffer_size: int = 1000,
    drop_remainder: bool = True,
    mask_feature_name: Optional[str] = None,
    size_feature_name: Optional[str] = None,
    seed: Optional[int] = None,
    num_threads: Optional[int] = None,
    shard_index: Optional[int] = None,
    num_shards: Optional[int] = None,
    skip_batches: int = 0,
    cache_dir: Optional[str] = None,
) -> Iterator[RankingBatch]:
  """ELWC stream fully driven by the native loader (data/native/loader.cc):
  a C++ reader thread owns file reading, shuffling, and batch assembly;
  ``num_threads`` C++ decode workers parse protos in parallel (default
  min(8, cpus)); Python only wraps finished arrays. The record/batch
  stream is bit-identical for every ``num_threads`` — order is fixed by
  the reader's seeded shuffle, not by decode scheduling. Same batch
  contract as ``build_ranking_dataset``.

  ``skip_batches``: decode-free fast-forward (pipeline ``resume_dataset``)
  — the C++ reader drops the leading record batches at mmap-scan speed
  (~2M rec/s); the stream continues bitwise-equal to
  ``batches[skip_batches:]`` of an unskipped run.

  ``cache_dir``: decoded-once epoch cache (pipeline ``dataset_cache``) —
  the first pass decodes each record once into an mmap'd spill file under
  this directory (named by a content fingerprint of files + specs);
  epochs >= 2 (and later runs over the same corpus) stream decoded
  payloads at memory bandwidth with NO proto decode. The batch stream is
  bitwise-identical with the cache off, building, or complete — the C++
  reader's seeded shuffle draws depend only on file/record counts. The
  reference's tf.data pipeline (python/data.py:914-1017) re-parses every
  epoch and never caches.

  Validation (globbing, spec support, NativeLoader construction) happens
  EAGERLY at call time, not at first ``next()`` — the pipeline's 'auto'
  engine relies on catching ``ValueError`` here to fall back to the
  python stream if ``loader_supported`` ever drifts permissive."""
  from ranking_tpu.data import native
  paths = sorted(glob_lib.glob(file_pattern))
  if not paths:
    raise FileNotFoundError(f'No files match {file_pattern!r}')
  paths = _shard_paths(paths, shard_index, num_shards, file_pattern)
  if list_size is None:
    raise ValueError('native loader requires a fixed list_size')
  cache_path = None
  if cache_dir is not None:
    cache_path = native.cache_file_for(
        cache_dir, paths, context_feature_spec, example_feature_spec,
        list_size, data_format=data_format)
  loader = native.NativeLoader(
      paths, context_feature_spec, example_feature_spec,
      batch_size=batch_size, list_size=list_size, shuffle=shuffle,
      shuffle_buffer=shuffle_buffer_size, epochs=epochs,
      drop_remainder=drop_remainder, seed=seed or 0,
      data_format=data_format, num_threads=num_threads,
      skip_batches=skip_batches, cache_path=cache_path)

  def _gen():
    try:
      for parsed in loader:
        yield parsed_to_batch(
            parsed, label_feature_name,
            convert_labels_to_binary=convert_labels_to_binary,
            mask_feature_name=mask_feature_name,
            size_feature_name=size_feature_name)
    finally:
      loader.close()

  return _gen()


def in_memory_batches(
    features: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
    feature_name: str = 'float_features',
    epochs: Optional[int] = 1,
    shuffle: bool = True,
    seed: Optional[int] = None,
    drop_remainder: bool = True,
) -> Iterator[RankingBatch]:
  """Batches pre-loaded listwise arrays (the LIBSVM path:
  examples/tf_ranking_libsvm.py:197-224 used an in-memory feed the same way).
  """
  n = features.shape[0]
  rng = np.random.RandomState(seed)
  epoch = 0
  while epochs is None or epoch < epochs:
    order = rng.permutation(n) if shuffle else np.arange(n)
    for start in range(0, n, batch_size):
      idx = order[start:start + batch_size]
      if len(idx) < batch_size and drop_remainder:
        break
      lab = labels[idx]
      yield RankingBatch(
          context={},
          examples={feature_name: features[idx]},
          labels=lab,
          mask=lab >= 0)
    epoch += 1


def flatten_examples(batch: RankingBatch) -> RankingBatch:
  """Host-side flat device layout: ``[B, L, F...]`` -> ``[B*L, F...]``.

  The device half is ``train.steps.restore_flat_examples`` (applied
  automatically inside every train/eval step): feeding example features
  flattened lets XLA place the entry argument directly in the tiled
  layout the scorer matmuls consume. A ``[B, L, F]`` device entry can
  never be that layout — TPU tiling covers the two minormost dims, so
  every 3-D choice pads L up to the 128-lane tile (200 -> 256 at the
  flagship shape) and the step pays a physical re-tile copy, measured at
  7-8% of the flagship bf16 train step (round 5). The host reshape is a
  free numpy view; the in-step restore cancels against the scorer's own
  flatten. Only rank >= 3 example features flatten; labels, mask, and
  context are untouched, and L == 1 batches pass through (no ambiguity,
  no re-tile to remove).
  """
  b, l = batch.mask.shape
  if l <= 1:
    return batch
  examples = {
      k: (v.reshape((b * l,) + tuple(v.shape[2:]))
          if getattr(v, 'ndim', 0) >= 3 and v.shape[:2] == (b, l) else v)
      for k, v in batch.examples.items()}
  return batch.replace(examples=examples)


def prefetch_to_device(
    batches: Iterable[RankingBatch],
    sharding: Optional[jax.sharding.Sharding] = None,
    buffer_size: int = 2,
    flat_examples: bool = False,
) -> Iterator[RankingBatch]:
  """Double-buffered host->device feed (python/data.py:1015 prefetch analog).

  Dispatches ``jax.device_put`` for up to ``buffer_size`` batches ahead of
  the consumer so transfer overlaps step compute. ``flat_examples=True``
  applies :func:`flatten_examples` before the transfer (the train/eval
  steps restore the listwise view in-graph for free).
  """
  if flat_examples:
    batches = (flatten_examples(b) for b in batches)
  put = (lambda b: jax.device_put(b, sharding)) if sharding else jax.device_put
  it = iter(batches)
  buf: List[RankingBatch] = []
  try:
    for _ in range(buffer_size):
      buf.append(put(next(it)))
  except StopIteration:
    pass
  for nxt in it:
    out = buf.pop(0)
    buf.append(put(nxt))
    yield out
  yield from buf
