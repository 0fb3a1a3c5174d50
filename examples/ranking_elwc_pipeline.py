"""End-to-end ELWC pipeline example (keras_dnn_tfrecord.py counterpart).

Trains an embedding+DNN ranker on ExampleListWithContext TFRecords via
SimplePipeline — the modern main path of the reference
(/root/reference/tensorflow_ranking/examples/keras/keras_dnn_tfrecord.py),
re-based on the functional stack: flax scorer, streaming host pipeline,
jitted steps over a device mesh, Orbax checkpoints, params export.

Usage (runs on the reference's bundled ANTIQUE-style sample data):
  python examples/ranking_elwc_pipeline.py \
    --train_pattern=/root/reference/tensorflow_ranking/examples/data/train_elwc.tfrecord \
    --valid_pattern=/root/reference/tensorflow_ranking/examples/data/eval_elwc.tfrecord
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def parse_args():
  p = argparse.ArgumentParser()
  p.add_argument('--train_pattern', required=True)
  p.add_argument('--valid_pattern', required=True)
  p.add_argument('--vocab_file', default=None,
                 help='Optional token vocabulary; hashing is used if absent.')
  p.add_argument('--model_dir', default='/tmp/ranking_elwc')
  p.add_argument('--batch_size', type=int, default=8)
  p.add_argument('--list_size', type=int, default=50)
  p.add_argument('--query_tokens', type=int, default=10)
  p.add_argument('--document_tokens', type=int, default=60)
  p.add_argument('--hash_buckets', type=int, default=10000)
  p.add_argument('--embedding_dim', type=int, default=20)
  p.add_argument('--hidden_layer_dims', default='64,32,16')
  p.add_argument('--loss', default='approx_ndcg_loss')
  p.add_argument('--learning_rate', type=float, default=0.05)
  p.add_argument('--optimizer', default='adam',
                 help="adam|adagrad|sgd|adamw|lazy_adam|lazy_adagrad (sparse-row "
                      "embedding updates)")
  p.add_argument('--num_epochs', type=int, default=5)
  p.add_argument('--steps_per_epoch', type=int, default=10)
  p.add_argument('--validation_steps', type=int, default=10)
  p.add_argument('--mesh_model', type=int, default=1,
                 help='Devices on the model axis: >1 row-shards the '
                      'embedding tables with explicit-collective lookup '
                      '(the ParameterServer-partitioning analog).')
  p.add_argument('--weights_feature', default=None,
                 help='Example feature holding per-example weights (IPW '
                      'unbiased-LTR reweighting).')
  return p.parse_args()


def main():
  args = parse_args()
  from ranking_tpu import models, parallel, pipeline
  from ranking_tpu.data import FixedLenFeature, VarLenFeature, Vocabulary

  vocab = Vocabulary(args.vocab_file) if args.vocab_file else None
  tok = dict(vocab=vocab) if vocab else dict(hash_buckets=args.hash_buckets)
  vocab_size = vocab.size if vocab else args.hash_buckets

  context_spec = {
      'query_tokens': VarLenFeature(dtype='string',
                                    max_len=args.query_tokens, **tok)}
  example_spec = {
      'document_tokens': VarLenFeature(dtype='string',
                                       max_len=args.document_tokens, **tok),
      'relevance': FixedLenFeature(shape=(), dtype='int64', default_value=0)}
  if args.weights_feature:
    example_spec[args.weights_feature] = FixedLenFeature(
        shape=(), dtype='float32', default_value=1.0)

  mesh = None
  if args.mesh_model > 1:
    # Tables pad themselves to the model axis; any vocab size works.
    mesh = parallel.make_mesh(model=args.mesh_model)

  scorer = models.EmbeddingDNNScorer(
      hidden_layer_dims=tuple(
          int(h) for h in args.hidden_layer_dims.split(',')),
      vocab_sizes={'query_tokens': vocab_size,
                   'document_tokens': vocab_size},
      embedding_dim=args.embedding_dim,
      mesh=mesh,
      dropout=0.5)
  if args.weights_feature:
    # The IPW weight reaches ONLY the loss: feeding it to the scorer
    # would leak logged-position information into the relevance model
    # (defeating the unbiased-LTR point) and skew train vs serve.
    import flax.linen as nn

    class _DropWeightFeature(nn.Module):
      inner: models.scorers.nn.Module
      drop: str

      @nn.compact
      def __call__(self, context, examples, mask, training=False):
        examples = {k: v for k, v in examples.items() if k != self.drop}
        return self.inner(context, examples, mask, training=training)

    scorer = _DropWeightFeature(inner=scorer, drop=args.weights_feature)
  model = models.RankingModel(scorer=scorer)

  builder = pipeline.SimpleDatasetBuilder(
      context_spec, example_spec,
      pipeline.DatasetHparams(
          train_input_pattern=args.train_pattern,
          valid_input_pattern=args.valid_pattern,
          train_batch_size=args.batch_size,
          valid_batch_size=args.batch_size,
          list_size=args.list_size,
          shuffle_buffer_size=1000))

  hparams = pipeline.PipelineHparams(
      model_dir=args.model_dir,
      num_epochs=args.num_epochs,
      steps_per_epoch=args.steps_per_epoch,
      validation_steps=args.validation_steps,
      learning_rate=args.learning_rate,
      loss=args.loss,
      optimizer=args.optimizer,
      # mesh_model must reach the hparams too: it selects the sharded-
      # table-safe sparse update path (dma_scatter) for lazy_adam.
      mesh_model=args.mesh_model,
      weights_feature_name=args.weights_feature or None,
      export_best_model=True,
      best_exporter_metric='ndcg@5',
      best_exporter_metric_higher_better=True)

  pipe = pipeline.SimplePipeline(model, builder, hparams, mesh=mesh)
  history = pipe.train_and_validate(verbose=True)
  print('final:', {k: round(v, 4) for k, v in history.items()})


if __name__ == '__main__':
  main()
