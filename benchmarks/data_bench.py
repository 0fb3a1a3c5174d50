"""Host input-pipeline throughput: python parse vs native decode vs native
loader. Run on any machine; results are records/s of ELWC ingestion."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  from ranking_tpu.data import (FixedLenFeature, VarLenFeature, native,
                                parsers, tfrecord)
  from ranking_tpu.data.dataset import native_ranking_dataset

  ref = '/root/reference/tensorflow_ranking/examples/data'
  records = tfrecord.read_all_records(f'{ref}/train_elwc.tfrecord') * 500
  ctx = {'query_tokens': VarLenFeature(dtype='string', max_len=8,
                                       hash_buckets=5000)}
  ex = {'document_tokens': VarLenFeature(dtype='string', max_len=30,
                                         hash_buckets=5000),
        'relevance': FixedLenFeature(shape=(), dtype='int64',
                                     default_value=0)}

  t0 = time.perf_counter()
  parsers.parse_example_list(records, ctx, ex, list_size=6)
  py = len(records) / (time.perf_counter() - t0)

  nat = None
  if native.available():
    t0 = time.perf_counter()
    native.decode_elwc_batch(records, 6, ctx, ex)
    nat = len(records) / (time.perf_counter() - t0)

  # End-to-end native loader stream (includes file IO + ring handoff).
  import tempfile, os
  with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, 'big.tfrecord')
    tfrecord.write_records(path, records)
    t0 = time.perf_counter()
    n = 0
    for b in native_ranking_dataset(
        path, batch_size=256, context_feature_spec=ctx,
        example_feature_spec=ex, label_feature_name='relevance',
        list_size=6, epochs=1, shuffle=True, drop_remainder=False):
      n += b.batch_size
    loader = n / (time.perf_counter() - t0)

  print(json.dumps({
      'python_parse_rec_per_s': round(py),
      'native_decode_rec_per_s': round(nat) if nat else None,
      'native_loader_stream_rec_per_s': round(loader),
  }))


if __name__ == '__main__':
  main()
