"""Batch inference from an exported model: ELWC records in, scores out.

The serving-side counterpart of the SavedModel predict signature
(/root/reference/tensorflow_ranking/python/keras/saved_model.py:107-124):
loads exported params, parses a TFRecord of ExampleListWithContext protos,
scores every list with the jitted apply fn, and writes a CSV of
(record_index, position, relevance, score) rows.

Usage (after examples/ranking_elwc_pipeline.py has exported a model):
  python examples/serve_predict.py \
    --export_path=/tmp/ranking_elwc/export/latest \
    --input=/root/reference/tensorflow_ranking/examples/data/eval_elwc.tfrecord \
    --output=/tmp/scores.csv
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import csv

import numpy as np


def parse_args():
  p = argparse.ArgumentParser()
  p.add_argument('--export_path', required=True)
  p.add_argument('--input', required=True, help='ELWC TFRecord file')
  p.add_argument('--output', default='/dev/stdout')
  p.add_argument('--artifact_path', default=None,
                 help='also write a self-contained StableHLO artifact here')
  p.add_argument('--quantize', default=None, choices=['int8'],
                 help='weight-only quantization for the artifact (~4x '
                      'smaller params; dequant baked into the graph)')
  p.add_argument('--batch_size', type=int, default=32)
  p.add_argument('--list_size', type=int, default=50)
  p.add_argument('--hash_buckets', type=int, default=10000)
  p.add_argument('--query_tokens', type=int, default=10)
  p.add_argument('--document_tokens', type=int, default=60)
  p.add_argument('--embedding_dim', type=int, default=20)
  p.add_argument('--hidden_layer_dims', default='64,32,16')
  args = p.parse_args()
  if args.quantize and not args.artifact_path:
    p.error('--quantize requires --artifact_path (it only affects the '
            'self-contained artifact)')
  return args


def main():
  args = parse_args()
  from ranking_tpu import models, pipeline
  from ranking_tpu.data import (FixedLenFeature, VarLenFeature, parsers,
                                tfrecord)

  context_spec = {
      'query_tokens': VarLenFeature(dtype='string',
                                    max_len=args.query_tokens,
                                    hash_buckets=args.hash_buckets)}
  example_spec = {
      'document_tokens': VarLenFeature(dtype='string',
                                       max_len=args.document_tokens,
                                       hash_buckets=args.hash_buckets),
      'relevance': FixedLenFeature(shape=(), dtype='int64',
                                   default_value=0)}

  model = models.RankingModel(
      scorer=models.EmbeddingDNNScorer(
          hidden_layer_dims=tuple(
              int(h) for h in args.hidden_layer_dims.split(',')),
          vocab_sizes={'query_tokens': args.hash_buckets,
                       'document_tokens': args.hash_buckets},
          embedding_dim=args.embedding_dim,
          dropout=0.0))
  predictor = pipeline.Predictor.from_export(
      model, args.export_path, context_spec, example_spec,
      list_size=args.list_size, label_feature_name='relevance')

  records = tfrecord.read_all_records(args.input)

  if args.artifact_path:
    # Self-contained StableHLO artifact: loadable by pipeline.export.
    # load_predictor in a process with no model code (keras
    # saved_model.py Signatures analog).
    from ranking_tpu.data.batch import RankingBatch
    from ranking_tpu.pipeline import export as export_lib
    sample = parsers.parse_example_list(
        records[:2], context_spec,
        {k: v for k, v in example_spec.items() if k != 'relevance'},
        list_size=args.list_size)
    export_lib.export_predictor(
        model, predictor.variables, context_spec, example_spec,
        args.artifact_path,
        sample_batch=RankingBatch(
            context=sample.context, examples=sample.examples,
            labels=np.where(sample.mask, 0.0, -1.0).astype('float32'),
            mask=sample.mask),
        list_size_buckets=(args.list_size,),
        label_feature_name='relevance', quantize=args.quantize)
    print(f'self-contained artifact -> {args.artifact_path}'
          + (f' (quantize={args.quantize})' if args.quantize else ''))
  with open(args.output, 'w', newline='') as f:
    writer = csv.writer(f)
    writer.writerow(['record', 'position', 'relevance', 'score'])
    for start in range(0, len(records), args.batch_size):
      chunk = records[start:start + args.batch_size]
      scores = predictor.predict(chunk)
      parsed = parsers.parse_example_list(
          chunk, {}, {'relevance': example_spec['relevance']},
          list_size=args.list_size)
      for i in range(len(chunk)):
        for pos in range(int(parsed.sizes[i])):
          writer.writerow([start + i, pos,
                           int(parsed.examples['relevance'][i, pos]),
                           float(scores[i, pos])])
  print(f'scored {len(records)} lists -> {args.output}')


if __name__ == '__main__':
  main()
