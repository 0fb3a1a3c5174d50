"""Host input-pipeline throughput: python parse vs native decode vs native
loader (thread-count sweep, hashed + vocabulary-file workloads), plus the
flagship Web30K-shaped scaling curve (reader-only ceiling + rec/s at
1/2/3/4 decode threads) — committed as DATA_BENCH.json so "scales with
cores" is a curve, not a sentence.

Reference bar: tf.data's reader_num_threads/num_parser_threads AUTOTUNE
pipeline (tensorflow_ranking/python/data.py:924-1011)."""

import ctypes
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The flagship train step's measured device appetite (bench.py, TPU v5e,
# B128xL200xF136 f32): used to extrapolate the decode-core count at which
# host ingestion feeds the chip.
DEVICE_LISTS_PER_S = 110_000


def web30k_curve():
  """Flagship-shape (L=200, F=136 ELWC) ingestion: reader-only ceiling
  and the end-to-end loader thread curve."""
  import numpy as np

  import e2e_common
  from ranking_tpu.data import native
  from ranking_tpu.data.dataset import native_ranking_dataset

  if not native.available():
    return None
  corpus_dir = os.path.join(tempfile.gettempdir(),
                            'ranking_tpu_e2e_corpus')
  paths = e2e_common.write_corpus(corpus_dir, 4096, n_files=4)
  total_bytes = sum(os.path.getsize(p) for p in paths)

  out = {'records': 4096, 'list_size': e2e_common.LIST_SIZE,
         'num_features': e2e_common.NUM_FEATURES,
         'corpus_mb': round(total_bytes / 1e6, 1)}

  # Reader-only ceiling: TFRecord framing scan over the raw bytes (the
  # loader's reader thread does exactly this over the mmap).
  lib = native._load()
  blobs = [open(p, 'rb').read() for p in paths]  # page cache warm either way
  n_total = 0
  t0 = time.perf_counter()
  for data in blobs:
    max_records = max(16, len(data) // 16)
    offs = np.zeros(max_records, np.int64)
    lens = np.zeros(max_records, np.int64)
    n_total += lib.rt_scan_tfrecord(
        data, len(data),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_records)
  dt = time.perf_counter() - t0
  out['reader_only_rec_per_s'] = round(n_total / dt)
  out['reader_only_gb_per_s'] = round(total_bytes / dt / 1e9, 2)

  specs = e2e_common.corpus_specs()
  for threads in (1, 2, 3, 4):
    best = 0.0
    for _ in range(2):  # best-of-2: this shared VM varies identical runs
      t0 = time.perf_counter()
      n = 0
      for b in native_ranking_dataset(
          os.path.join(corpus_dir, 'part-*.tfrecord'), batch_size=128,
          label_feature_name='relevance', list_size=e2e_common.LIST_SIZE,
          epochs=1, shuffle=True, drop_remainder=False,
          num_threads=threads, **specs):
        n += b.batch_size
      best = max(best, n / (time.perf_counter() - t0))
    out[f'loader_t{threads}_lists_per_s'] = round(best)

  # Serial consumer ceiling: drain batches the workers already decoded
  # into the direct-write ring. This is the per-stream upper bound no
  # decoder count can exceed — the round-4 direct-write redesign (decode
  # straight into the registered numpy buffers, no intermediate copy)
  # put the consumer's own work at wrap-and-slice cost only. Measured on
  # a FULLY-DECODED stream: the corpus slice is sized to fit inside the
  # ring (7 batches + the primed one), so after the prime + settle the
  # workers are idle at end-of-stream and the timed drain contains zero
  # decode work — the round-4 number (71.6k) undercounted because live
  # decodes raced the drain window on this 4-core host.
  from ranking_tpu.data import native as native_mod
  import glob as glob_mod
  ceiling_paths = sorted(glob_mod.glob(
      os.path.join(corpus_dir, 'part-*.tfrecord')))[:1]
  best = 0.0
  for _ in range(3):  # best-of-3: shared-VM noise swings 10x
    loader = native_mod.NativeLoader(
        ceiling_paths, specs['context_feature_spec'],
        specs['example_feature_spec'], batch_size=128,
        list_size=e2e_common.LIST_SIZE, shuffle=False, epochs=1,
        num_threads=6, ring_capacity=8)
    next(loader)
    time.sleep(1.5)  # all remaining batches land in the ring; workers idle
    n = 0
    t0 = time.perf_counter()
    for parsed in loader:
      n += parsed.sizes.shape[0]
    best = max(best, n / (time.perf_counter() - t0))
    loader.close()
  out['consumer_ceiling_lists_per_s'] = round(best)

  # Decoded-once epoch cache (loader.cc Cache): epochs >= 2 replay
  # decoded payloads from the mmap'd spill at memory bandwidth — no
  # proto decode at all. build = first-pass wall (decode + sequential
  # spill append; one-time); read = steady-state epochs. The reference's
  # tf.data pipeline re-parses every epoch (python/data.py:914-1017).
  cache_dir = os.path.join(corpus_dir, 'spill')
  pattern = os.path.join(corpus_dir, 'part-*.tfrecord')

  def cached_epoch(threads, cache):
    t0 = time.perf_counter()
    n = 0
    for b in native_ranking_dataset(
        pattern, batch_size=128, label_feature_name='relevance',
        list_size=e2e_common.LIST_SIZE, epochs=1, shuffle=True,
        drop_remainder=False, num_threads=threads, cache_dir=cache,
        **specs):
      n += b.batch_size
    return n / (time.perf_counter() - t0)

  import shutil
  shutil.rmtree(cache_dir, ignore_errors=True)
  # The build wall includes the crash-safety fsync of the whole spill at
  # stream close (this point opens/closes a 1-epoch stream); a multi-
  # epoch stream pays it once after its last epoch.
  build_rate = cached_epoch(4, cache_dir)
  out['cache_build_lists_per_s'] = round(build_rate)
  # Replay is one contiguous memcpy per feature per record (~stride
  # bytes, 112 KB at this shape): the rate is memory-bandwidth-bound,
  # not decode-bound — the thread curve tracks the host's bus, and the
  # decode-core extrapolation below no longer applies from epoch 2.
  for threads in (1, 2, 3, 4):
    best = 0.0
    for _ in range(2):
      best = max(best, cached_epoch(threads, cache_dir))
    out[f'cache_read_t{threads}_lists_per_s'] = round(best)
  shutil.rmtree(cache_dir, ignore_errors=True)

  # Extrapolated decode-core count to feed the chip. On a host with few
  # cores the curve flattens when decoders + the reader + the consumer
  # exhaust physical cores (core exhaustion, not scaling failure), so the
  # honest per-decoder rate is the single-decoder point, where the other
  # roles still have cores of their own.
  per_decoder = max(out[f'loader_t{t}_lists_per_s'] / t
                    for t in (1, 2, 3))
  out['device_lists_per_s'] = DEVICE_LISTS_PER_S
  out['per_decoder_lists_per_s'] = round(per_decoder)
  out['extrapolated_decode_cores_to_feed_device'] = round(
      DEVICE_LISTS_PER_S / per_decoder, 1)
  read_rates = [(t, out[f'cache_read_t{t}_lists_per_s'])
                for t in (1, 2, 3, 4)]
  feeding = [t for t, r in read_rates if r >= DEVICE_LISTS_PER_S]
  out['cache_cores_to_feed_device'] = (
      min(feeding) if feeding else f'>{read_rates[-1][0]}')
  out['note'] = (f'host has {os.cpu_count()} cores: the t3/t4 points are '
                 'core-exhausted (reader + consumer share them), so the '
                 'extrapolation uses max(rate_t / t) over the '
                 'uncontended points; the reader-only ceiling shows '
                 'record framing is never the bottleneck. '
                 'extrapolated_decode_cores_to_feed_device applies to '
                 'the FIRST pass over a corpus only: with dataset_cache '
                 'set, every later epoch/run replays the spill at '
                 'cache_read_* rates (memory bandwidth, no decode).')
  return out


def main():
  from ranking_tpu.data import (FixedLenFeature, VarLenFeature, native,
                                parsers, tfrecord)
  from ranking_tpu.data.dataset import native_ranking_dataset

  ref = '/root/reference/tensorflow_ranking/examples/data'
  # Big enough that a multi-threaded run takes whole seconds — the bundled
  # file is 10 records; 500 copies measured startup noise, not throughput.
  records = tfrecord.read_all_records(f'{ref}/train_elwc.tfrecord') * 20000
  vocab = parsers.Vocabulary(f'{ref}/vocab.txt')
  hashed_specs = dict(
      context_feature_spec={
          'query_tokens': VarLenFeature(dtype='string', max_len=8,
                                        hash_buckets=5000)},
      example_feature_spec={
          'document_tokens': VarLenFeature(dtype='string', max_len=30,
                                           hash_buckets=5000),
          'relevance': FixedLenFeature(shape=(), dtype='int64',
                                       default_value=0)})
  vocab_specs = dict(
      context_feature_spec={
          'query_tokens': VarLenFeature(dtype='string', max_len=8,
                                        vocab=vocab)},
      example_feature_spec={
          'document_tokens': VarLenFeature(dtype='string', max_len=30,
                                           vocab=vocab),
          'relevance': FixedLenFeature(shape=(), dtype='int64',
                                       default_value=0)})

  # Python parse is slow; time a slice and scale.
  py_n = 5000
  t0 = time.perf_counter()
  parsers.parse_example_list(records[:py_n],
                             hashed_specs['context_feature_spec'],
                             hashed_specs['example_feature_spec'],
                             list_size=6)
  py = py_n / (time.perf_counter() - t0)

  # Decode in realistic batch-size chunks (one 200k-record call measures
  # giant-array page faults, not decode).
  def chunked_decode(specs, n_records=40960):
    args = {k.replace('_feature_spec', '_spec'): v for k, v in specs.items()}
    native.decode_elwc_batch(records[:1024], 6, **args)  # warm
    t0 = time.perf_counter()
    for start in range(0, n_records, 1024):
      native.decode_elwc_batch(records[start:start + 1024], 6, **args)
    return n_records / (time.perf_counter() - t0)

  nat = nat_vocab = None
  if native.available():
    nat = chunked_decode(hashed_specs)
    nat_vocab = chunked_decode(vocab_specs)

  # End-to-end native loader stream (file IO + shuffle + decode + reorder
  # handoff + numpy materialization), swept over decode-thread counts.
  out = {
      'python_parse_rec_per_s': round(py),
      'native_decode_rec_per_s': round(nat) if nat else None,
      'native_decode_vocab_rec_per_s': round(nat_vocab) if nat_vocab
      else None,
  }
  with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, 'big.tfrecord')
    tfrecord.write_records(path, records)

    def run(specs, threads):
      t0 = time.perf_counter()
      n = 0
      for b in native_ranking_dataset(
          path, batch_size=1024, label_feature_name='relevance',
          list_size=6, epochs=1, shuffle=True, drop_remainder=False,
          num_threads=threads, **specs):
        n += b.batch_size
      return n / (time.perf_counter() - t0)

    out['cpu_count'] = os.cpu_count()
    for threads in (1, 2, 4, 8):
      out[f'native_loader_hashed_t{threads}_rec_per_s'] = round(
          run(hashed_specs, threads))
    for threads in (1, 4):
      out[f'native_loader_vocab_t{threads}_rec_per_s'] = round(
          run(vocab_specs, threads))

  curve = web30k_curve()
  if curve:
    out['web30k_shape'] = curve
  with open(os.path.join(REPO, 'DATA_BENCH.json'), 'w') as f:
    json.dump(out, f, indent=2)
  print(json.dumps(out))


if __name__ == '__main__':
  main()
