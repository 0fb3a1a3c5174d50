"""Multi-task ranking: one shared scorer body, per-task losses and metrics.

Counterpart of the reference's ``MultiTaskPipeline``
(tensorflow_ranking/python/keras/pipeline.py:733-830): a shared tower emits
one logit head per task; each task gets its own loss (weighted into the
total) and metric suite. Here the second task's labels are derived from the
primary relevance (a click simulation) so the example runs on the bundled
reference data.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def parse_args():
  p = argparse.ArgumentParser()
  p.add_argument('--train_pattern', required=True)
  p.add_argument('--valid_pattern', required=True)
  p.add_argument('--model_dir', default='/tmp/ranking_multitask')
  p.add_argument('--batch_size', type=int, default=8)
  p.add_argument('--list_size', type=int, default=20)
  p.add_argument('--hash_buckets', type=int, default=10000)
  p.add_argument('--hidden_layer_dims', default='64,32')
  p.add_argument('--learning_rate', type=float, default=0.05)
  p.add_argument('--num_epochs', type=int, default=3)
  p.add_argument('--steps_per_epoch', type=int, default=10)
  p.add_argument('--validation_steps', type=int, default=5)
  return p.parse_args()


def main():
  args = parse_args()
  import numpy as np

  from ranking_tpu import models, ops, pipeline
  from ranking_tpu.data import FixedLenFeature, VarLenFeature
  from ranking_tpu.data.batch import RankingBatch

  context_spec = {
      'query_tokens': VarLenFeature(dtype='string', max_len=10,
                                    hash_buckets=args.hash_buckets)}
  example_spec = {
      'document_tokens': VarLenFeature(dtype='string', max_len=60,
                                       hash_buckets=args.hash_buckets),
      'relevance': FixedLenFeature(shape=(), dtype='int64',
                                   default_value=0)}

  class TwoTaskBuilder(pipeline.SimpleDatasetBuilder):
    """Relevance task + simulated binary click task."""

    def _batches(self, *a, **kw):
      rng = np.random.RandomState(11)
      for b in super()._batches(*a, **kw):
        clicks = np.where(
            b.labels > 0,
            (rng.rand(*b.labels.shape) < 0.7).astype(np.float32),
            np.where(b.labels >= 0, 0.0, b.labels))
        dense = {
            'tokens_f': np.asarray(
                b.examples['document_tokens'], np.float32)}
        yield RankingBatch(
            context={}, examples=dense,
            labels={'relevance': b.labels, 'click': clicks}, mask=b.mask)

  builder = TwoTaskBuilder(
      context_spec, example_spec,
      pipeline.DatasetHparams(
          train_input_pattern=args.train_pattern,
          valid_input_pattern=args.valid_pattern,
          train_batch_size=args.batch_size,
          valid_batch_size=args.batch_size,
          list_size=args.list_size))

  model = models.RankingModel(
      scorer=models.MultiTaskScorer(
          task_names=('relevance', 'click'),
          hidden_layer_dims=tuple(
              int(h) for h in args.hidden_layer_dims.split(',')),
          dropout=0.3))

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
