"""Quality run: train on a synthetic Web30K-shaped dataset, report NDCG.

Generates graded-relevance lists (labels = noisy quintiles of a planted
nonlinear utility over 136 features), trains the flagship DNN scorer with a
choice of losses, and reports NDCG@5 / MRR on a held-out split — concrete
end-to-end evidence that the full stack (data -> loss -> grads -> metrics)
ranks, not just runs. CPU-friendly; pass --steps/--queries to scale.
"""

import argparse
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(num_queries, list_size, num_features, seed):
  import numpy as np
  rng = np.random.RandomState(seed)
  x = rng.randn(num_queries, list_size, num_features).astype(np.float32)
  w1 = rng.randn(num_features) / np.sqrt(num_features)
  w2 = rng.randn(num_features) / np.sqrt(num_features)
  utility = x @ w1 + 0.5 * np.tanh(x @ w2) + 0.3 * rng.randn(
      num_queries, list_size)
  order = np.argsort(np.argsort(utility, axis=1), axis=1)
  labels = (order * 5 // list_size).astype(np.float32)
  # Variable list lengths: pad tails.
  n_valid = rng.randint(list_size // 2, list_size + 1, size=num_queries)
  pad = np.arange(list_size)[None, :] >= n_valid[:, None]
  labels[pad] = -1.0
  return x, labels


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--queries', type=int, default=2000)
  p.add_argument('--list_size', type=int, default=50)
  p.add_argument('--num_features', type=int, default=136)
  p.add_argument('--batch_size', type=int, default=64)
  p.add_argument('--steps', type=int, default=300)
  p.add_argument('--loss', default='approx_ndcg_loss')
  p.add_argument('--scorer', default='dnn', choices=['dnn', 'din'])
  p.add_argument('--learning_rate', type=float, default=0.003)
  args = p.parse_args()

  import jax
  import numpy as np
  import optax

  from ranking_tpu import models, ops, train
  from ranking_tpu.data.dataset import in_memory_batches

  x, labels = make_dataset(args.queries, args.list_size, args.num_features,
                           seed=0)
  split = args.queries * 4 // 5
  train_x, train_y = x[:split], labels[:split]
  test_x, test_y = x[split:], labels[split:]

  if args.scorer == 'din':
    scorer = models.DINScorer(num_heads=2, head_size=32,
                              num_attention_layers=2,
                              hidden_layer_dims=(128, 64), dropout=0.0,
                              use_batch_norm=False)
  else:
    scorer = models.DNNScorer(hidden_layer_dims=(256, 128, 64),
                              dropout=0.0, use_batch_norm=False)
  model = models.RankingModel(scorer=scorer, transform_name='none')
  sample = next(in_memory_batches(train_x, train_y, args.batch_size))
  state = train.create_train_state(
      model, optax.adam(args.learning_rate), jax.random.PRNGKey(0),
      sample.context, sample.examples, sample.mask)
  step = jax.jit(train.make_train_step(ops.make_loss_fn(args.loss)),
                 donate_argnums=0)
  metric_fns = {
      'ndcg@5': ops.make_ranking_metric_fn(ops.RankingMetricKey.NDCG,
                                           topn=5),
      'mrr': ops.make_ranking_metric_fn(ops.RankingMetricKey.MRR),
  }
  eval_step = jax.jit(train.make_eval_step(metric_fns))

  def evaluate(state):
    states = train.init_metric_states(metric_fns)
    for b in in_memory_batches(test_x, test_y, args.batch_size, epochs=1,
                               shuffle=False, drop_remainder=False):
      states, _ = eval_step(state, b, states)
    return {k: round(float(np.asarray(v)), 4)
            for k, v in train.metric_results(states).items()}

  before = evaluate(state)
  t0 = time.perf_counter()
  n = 0
  key = jax.random.PRNGKey(1)
  for batch in in_memory_batches(train_x, train_y, args.batch_size,
                                 epochs=None, seed=2):
    state, metrics = step(state, batch, key)
    n += 1
    if n >= args.steps:
      break
  float(metrics['loss'])
  dt = time.perf_counter() - t0
  after = evaluate(state)

  print(json.dumps({
      'scorer': args.scorer,
      'loss': args.loss,
      'steps': args.steps,
      'before': before,
      'after': after,
      'train_lists_per_sec': round(args.batch_size * args.steps / dt, 1),
      'backend': jax.default_backend(),
  }))


if __name__ == '__main__':
  main()
