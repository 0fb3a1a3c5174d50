"""Multi-task ranking: one shared scorer body, per-task losses and metrics.

Counterpart of the reference's ``MultiTaskPipeline`` +
``MultiLabelDatasetBuilder`` (tensorflow_ranking/python/keras/
pipeline.py:733-830, 1120-1221): the dataset carries one label feature per
task; ``MultiLabelDatasetBuilder`` parses them into dict labels, and a
shared tower emits one logit head per task, each with its own loss
(weighted into the total) and metric suite.

The bundled reference data has a single ``relevance`` label, so this
example first materializes a two-label copy (adding a simulated binary
``click`` feature to every document) and then trains entirely through the
real dataset-builder path — no hand-synthesized batches.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import os


def parse_args():
  p = argparse.ArgumentParser()
  p.add_argument('--train_pattern', required=True)
  p.add_argument('--valid_pattern', required=True)
  p.add_argument('--model_dir', default='/tmp/ranking_multitask')
  p.add_argument('--batch_size', type=int, default=8)
  p.add_argument('--list_size', type=int, default=20)
  p.add_argument('--hash_buckets', type=int, default=10000)
  p.add_argument('--embedding_dim', type=int, default=8)
  p.add_argument('--hidden_layer_dims', default='64,32')
  p.add_argument('--learning_rate', type=float, default=0.05)
  p.add_argument('--num_epochs', type=int, default=3)
  p.add_argument('--steps_per_epoch', type=int, default=10)
  p.add_argument('--validation_steps', type=int, default=5)
  return p.parse_args()


def add_click_labels(src_pattern: str, out_path: str, seed: int = 11) -> str:
  """Copies ELWC records, adding a binary ``click`` feature per document:
  relevant documents are clicked w.p. 0.7, irrelevant never (the click
  simulation of the unbiased-LTR literature, kept deliberately simple)."""
  import numpy as np

  from ranking_tpu.data import proto, tfrecord

  rng = np.random.RandomState(seed)
  out = []
  for path in sorted(glob.glob(src_pattern)):
    for rec in tfrecord.read_records(path):
      elwc = proto.ExampleListWithContext()
      elwc.ParseFromString(rec)
      for ex in elwc.examples:
        # Guard the map read: a bare [] access on a protobuf map INSERTS
        # a present-but-kindless Feature, which would be serialized into
        # the rewritten records and can trip strict parsers.
        fmap = ex.features.feature
        rel = (fmap['relevance'].int64_list.value
               if 'relevance' in fmap else [])
        relevant = bool(rel) and rel[0] > 0
        click = int(relevant and rng.rand() < 0.7)
        ex.features.feature['click'].int64_list.value.append(click)
      out.append(elwc.SerializeToString())
  tfrecord.write_records(out_path, out)
  return out_path


def main():
  args = parse_args()
  from ranking_tpu import models, ops, pipeline
  from ranking_tpu.data import FixedLenFeature, VarLenFeature

  os.makedirs(args.model_dir, exist_ok=True)
  train_path = add_click_labels(
      args.train_pattern, os.path.join(args.model_dir, 'train_2label.tfrecord'))
  valid_path = add_click_labels(
      args.valid_pattern, os.path.join(args.model_dir, 'valid_2label.tfrecord'),
      seed=12)

  context_spec = {
      'query_tokens': VarLenFeature(dtype='string', max_len=10,
                                    hash_buckets=args.hash_buckets)}
  example_spec = {
      'document_tokens': VarLenFeature(dtype='string', max_len=60,
                                       hash_buckets=args.hash_buckets),
      'relevance': FixedLenFeature(shape=(), dtype='int64', default_value=0),
      'click': FixedLenFeature(shape=(), dtype='int64', default_value=0)}

  builder = pipeline.MultiLabelDatasetBuilder(
      context_spec, example_spec,
      label_spec={'relevance': 'relevance', 'click': 'click'},
      hparams=pipeline.DatasetHparams(
          train_input_pattern=train_path,
          valid_input_pattern=valid_path,
          train_batch_size=args.batch_size,
          valid_batch_size=args.batch_size,
          list_size=args.list_size))

  model = models.RankingModel(
      scorer=models.MultiTaskScorer(
          task_names=('relevance', 'click'),
          body=models.EmbeddingDNNScorer(
              hidden_layer_dims=tuple(
                  int(h) for h in args.hidden_layer_dims.split(',')),
              output_units=2,
              vocab_sizes={'query_tokens': args.hash_buckets,
                           'document_tokens': args.hash_buckets},
              embedding_dim=args.embedding_dim,
              dropout=0.3)))

  hparams = pipeline.PipelineHparams(
      model_dir=args.model_dir,
      num_epochs=args.num_epochs,
      steps_per_epoch=args.steps_per_epoch,
      validation_steps=args.validation_steps,
      learning_rate=args.learning_rate,
      loss={'relevance': ops.RankingLossKey.SOFTMAX_LOSS,
            'click': ops.RankingLossKey.SIGMOID_CROSS_ENTROPY_LOSS},
      loss_weights={'relevance': 1.0, 'click': 0.3})

  pipe = pipeline.MultiTaskPipeline(model, builder, hparams)
  history = pipe.train_and_validate(verbose=True)
  print('final:', {k: round(v, 4) for k, v in history.items()})


if __name__ == '__main__':
  main()
