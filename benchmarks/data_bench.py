"""Host input-pipeline throughput: python parse vs native decode vs native
loader (thread-count sweep, hashed + vocabulary-file workloads). Run on any
machine; results are records/s of ELWC ingestion.

Reference bar: tf.data's reader_num_threads/num_parser_threads AUTOTUNE
pipeline (tensorflow_ranking/python/data.py:924-1011)."""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

  print(json.dumps(out))


if __name__ == '__main__':
  main()
