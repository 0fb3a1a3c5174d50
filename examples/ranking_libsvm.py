"""Train a listwise ranker on LIBSVM data (MSLR-WEB30K and friends).

TPU-native counterpart of the reference's flagship example
(/root/reference/tensorflow_ranking/examples/tf_ranking_libsvm.py): groups
LIBSVM rows by qid into padded lists, trains a univariate DNN (optionally
groupwise multi-item) scorer with any registered ranking loss, and reports
NDCG@k / MRR on the validation and test splits.

Usage:
  python examples/ranking_libsvm.py \
    --train_path=.../train.txt --vali_path=.../vali.txt \
    --test_path=.../test.txt --num_features=136 \
    --loss=pairwise_logistic_loss --num_train_steps=1000
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import jax
import numpy as np
import optax


def parse_args():
  p = argparse.ArgumentParser()
  p.add_argument('--train_path', required=True)
  p.add_argument('--vali_path', required=True)
  p.add_argument('--test_path', default=None)
  p.add_argument('--output_dir', default='/tmp/ranking_libsvm')
  p.add_argument('--num_features', type=int, default=136)
  p.add_argument('--list_size', type=int, default=100)
  p.add_argument('--batch_size', type=int, default=32)
  p.add_argument('--num_train_steps', type=int, default=100)
  p.add_argument('--learning_rate', type=float, default=0.01)
  p.add_argument('--loss', default='pairwise_logistic_loss')
  p.add_argument('--group_size', type=int, default=1)
  p.add_argument('--scorer', default='dnn', choices=['dnn', 'gam'],
                 help="'gam' = interpretable generalized additive scorer (canned GAM estimator counterpart).")
  p.add_argument('--hidden_layer_dims', default='256,128,64')
  p.add_argument('--dropout', type=float, default=0.5)
  p.add_argument('--lambda_ndcg', action='store_true',
                 help='Use an NDCG LambdaWeight (LambdaLoss/LambdaMART).')
  p.add_argument('--eval_every', type=int, default=100)
  return p.parse_args()


def build_model(args):
  import flax.linen as nn

  from ranking_tpu import models
  hidden = tuple(int(h) for h in args.hidden_layer_dims.split(','))
  if args.scorer == 'gam':
    # True GAM semantics: the packed [B, L, F] LIBSVM tensor splits into F
    # scalar features, each with its own tower (make_gam_ranking_estimator
    # counterpart). Sub-scores per feature are exposed via module sow.

    class SplitGAM(nn.Module):

      @nn.compact
      def __call__(self, context, examples, mask, training=False):
        x = examples['float_features']
        feats = {f'col_{i:03d}': x[..., i:i + 1]
                 for i in range(x.shape[-1])}
        return models.GAMScorer(
            example_hidden_layer_dims=hidden,
            dropout=args.dropout)(context, feats, mask, training=training)

    return models.RankingModel(scorer=SplitGAM(), transform_name='log1p')
  if args.group_size > 1:
    scorer = models.GroupwiseDNNScorer(
        group_size=args.group_size, hidden_layer_dims=hidden,
        dropout=args.dropout)
  else:
    # input_grad=False: the tower input is raw LIBSVM features (nothing
    # trainable upstream), so the fused-BN backward skips its largest
    # HBM write.
    scorer = models.DNNScorer(hidden_layer_dims=hidden,
                              dropout=args.dropout, input_grad=False)
  return models.RankingModel(scorer=scorer, transform_name='log1p')


def evaluate(eval_step, state, feats, labels, metric_fns, batch_size):
  from ranking_tpu import train
  from ranking_tpu.data.dataset import in_memory_batches
  states = train.init_metric_states(metric_fns)
  for batch in in_memory_batches(feats, labels, batch_size, epochs=1,
                                 shuffle=False, drop_remainder=False):
    states, _ = eval_step(state, batch, states)
  return {k: float(np.asarray(v))
          for k, v in train.metric_results(states).items()}


def main():
  args = parse_args()
  from ranking_tpu import ops, train
  from ranking_tpu.data import libsvm
  from ranking_tpu.data.dataset import in_memory_batches
  from ranking_tpu.ops import lambda_weights as lw
  from ranking_tpu.utils import fns

  print(f'Loading {args.train_path} ...')
  train_x, train_y, _ = libsvm.load_libsvm_lists(
      args.train_path, args.list_size, args.num_features)
  vali_x, vali_y, _ = libsvm.load_libsvm_lists(
      args.vali_path, args.list_size, args.num_features)
  print(f'train queries: {len(train_x)}, vali queries: {len(vali_x)}')

  if len(train_y) < args.batch_size:
    raise SystemExit(
        f'--batch_size {args.batch_size} exceeds the {len(train_y)} query '
        f'lists in {args.train_path}; lower --batch_size')
  model = build_model(args)
  sample = next(in_memory_batches(train_x, train_y, args.batch_size,
                                  epochs=1))
  state = train.create_train_state(
      model, optax.adagrad(args.learning_rate), jax.random.PRNGKey(0),
      sample.context, sample.examples, sample.mask)

  lambda_weight = None
  if args.lambda_ndcg:
    lambda_weight = lw.DCGLambdaWeightV2(
        gain_fn=fns.pow_minus_1, rank_discount_fn=fns.log2_inverse,
        normalized=True)
  loss_fn = ops.make_loss_fn(args.loss, lambda_weight=lambda_weight)
  train_step = jax.jit(train.make_train_step(loss_fn), donate_argnums=0)

  metric_fns = {
      **{f'ndcg@{k}': ops.make_ranking_metric_fn(ops.RankingMetricKey.NDCG,
                                                 topn=k)
         for k in (1, 5, 10)},
      'mrr': ops.make_ranking_metric_fn(ops.RankingMetricKey.MRR),
  }
  eval_step = jax.jit(train.make_eval_step(metric_fns))

  key = jax.random.PRNGKey(1)
  step = 0
  for batch in in_memory_batches(train_x, train_y, args.batch_size,
                                 epochs=None, seed=17):
    state, metrics = train_step(state, batch, key)
    step += 1
    if step % args.eval_every == 0 or step == args.num_train_steps:
      vali = evaluate(eval_step, state, vali_x, vali_y, metric_fns,
                      args.batch_size)
      print(f'step {step}: loss={float(metrics["loss"]):.4f} ' +
            ' '.join(f'{k}={v:.4f}' for k, v in sorted(vali.items())))
    if step >= args.num_train_steps:
      break

  if args.test_path:
    test_x, test_y, _ = libsvm.load_libsvm_lists(
        args.test_path, args.list_size, args.num_features)
    test = evaluate(eval_step, state, test_x, test_y, metric_fns,
                    args.batch_size)
    print('test: ' + ' '.join(f'{k}={v:.4f}' for k, v in sorted(test.items())))

  os.makedirs(args.output_dir, exist_ok=True)
  train.checkpoint.export_params(
      state, os.path.join(args.output_dir, 'export'))
  print(f'exported params to {args.output_dir}/export')


if __name__ == '__main__':
  main()
