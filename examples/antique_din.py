"""Document Interaction Network ranker on ANTIQUE-style ELWC data.

Counterpart of /root/reference/tensorflow_ranking/examples/keras/
antique_kpl_din.py: token embeddings + cross-document self-attention
(DocumentInteractionAttention) scorer, trained listwise. The same scorer
configured with the DASALC hyperparameters (4 attention layers x 2 heads x
100, hidden 512; /root/reference/tensorflow_ranking/research/dasalc.py:22-44)
reproduces the DASALC architecture — pass --dasalc.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def parse_args():
  p = argparse.ArgumentParser()
  p.add_argument('--train_pattern', required=True)
  p.add_argument('--valid_pattern', required=True)
  p.add_argument('--model_dir', default='/tmp/ranking_din')
  p.add_argument('--batch_size', type=int, default=8)
  p.add_argument('--list_size', type=int, default=50)
  p.add_argument('--hash_buckets', type=int, default=10000)
  p.add_argument('--embedding_dim', type=int, default=20)
  p.add_argument('--num_heads', type=int, default=2)
  p.add_argument('--head_size', type=int, default=100)
  p.add_argument('--num_attention_layers', type=int, default=1)
  p.add_argument('--hidden_layer_dims', default='64,32')
  p.add_argument('--loss', default='approx_ndcg_loss')
  p.add_argument('--learning_rate', type=float, default=0.05)
  p.add_argument('--num_epochs', type=int, default=5)
  p.add_argument('--steps_per_epoch', type=int, default=10)
  p.add_argument('--validation_steps', type=int, default=10)
  p.add_argument('--dasalc', action='store_true',
                 help='Use the DASALC paper configuration.')
  return p.parse_args()


def _din_with_embeddings(args, vocab_size):
  """Builds a RankingModel composing token embeddings with the DIN
  scorer (a plain factory — it returns a RankingModel)."""
  import flax.linen as nn

  from ranking_tpu import models
  from ranking_tpu.models import embeddings as emb

  if args.dasalc:
    num_layers, num_heads, head_size = 4, 2, 100
    hidden = (512, 256, 128)
  else:
    num_layers = args.num_attention_layers
    num_heads, head_size = args.num_heads, args.head_size
    hidden = tuple(int(h) for h in args.hidden_layer_dims.split(','))

  class Scorer(nn.Module):

    @nn.compact
    def __call__(self, context, examples, mask, training=False):
      ctx = {'q': emb.EmbeddingEncoder(
          vocab_size, args.embedding_dim, name='embed_q')(
              context['query_tokens'])}
      exs = {'d': emb.EmbeddingEncoder(
          vocab_size, args.embedding_dim, name='embed_d')(
              examples['document_tokens'])}
      return models.DINScorer(
          num_heads=num_heads, head_size=head_size,
          num_attention_layers=num_layers,
          hidden_layer_dims=hidden, dropout=0.5)(
              ctx, exs, mask, training=training)

  return models.RankingModel(scorer=Scorer())


def main():
  args = parse_args()
  from ranking_tpu import pipeline
  from ranking_tpu.data import FixedLenFeature, VarLenFeature

  context_spec = {
      'query_tokens': VarLenFeature(dtype='string', max_len=10,
                                    hash_buckets=args.hash_buckets)}
  example_spec = {
      'document_tokens': VarLenFeature(dtype='string', max_len=60,
                                       hash_buckets=args.hash_buckets),
      'relevance': FixedLenFeature(shape=(), dtype='int64', default_value=0)}

  model = _din_with_embeddings(args, args.hash_buckets)
  builder = pipeline.SimpleDatasetBuilder(
      context_spec, example_spec,
      pipeline.DatasetHparams(
          train_input_pattern=args.train_pattern,
          valid_input_pattern=args.valid_pattern,
          train_batch_size=args.batch_size,
          valid_batch_size=args.batch_size,
          list_size=args.list_size))
  hparams = pipeline.PipelineHparams(
      model_dir=args.model_dir,
      num_epochs=args.num_epochs,
      steps_per_epoch=args.steps_per_epoch,
      validation_steps=args.validation_steps,
      learning_rate=args.learning_rate,
      loss=args.loss)
  history = pipeline.SimplePipeline(model, builder,
                                    hparams).train_and_validate(verbose=True)
  print('final:', {k: round(v, 4) for k, v in history.items()})


if __name__ == '__main__':
  main()
