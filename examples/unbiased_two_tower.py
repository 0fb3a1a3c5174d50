"""Unbiased LTR from clicks: position-bias two-tower training.

The unbiased-LTR workload behind the reference's Bilinear layer and
ClickEM/IPW machinery (tensorflow_ranking/python/keras/layers.py:807-891,
losses_impl.py:1324): logged clicks conflate relevance with exposure
(position bias), so training a ranker on raw clicks learns the logging
policy. The standard position-based model factorizes
``P(click) = P(observe | position) * P(relevant | features)``; in logit
space that is a two-tower sum — a relevance tower over document features
plus an observation tower over the logged position — trained with sigmoid
CE on clicks. At serving time only the relevance tower scores.

This example synthesizes a click log with 1/rank^eta position bias, trains
(a) a naive click model and (b) the two-tower model, and reports NDCG@5 of
each relevance scorer against the *true* (hidden) labels: the two-tower
model debiases, the naive model does not.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json


def parse_args():
  p = argparse.ArgumentParser()
  p.add_argument('--queries', type=int, default=1500)
  p.add_argument('--list_size', type=int, default=20)
  p.add_argument('--num_features', type=int, default=16)
  p.add_argument('--eta', type=float, default=1.5,
                 help='Position-bias severity: P(obs) = (1/rank)^eta.')
  p.add_argument('--batch_size', type=int, default=64)
  p.add_argument('--steps', type=int, default=400)
  p.add_argument('--learning_rate', type=float, default=0.01)
  return p.parse_args()


def make_click_log(args, seed=0):
  """Synthesizes (features, clicks, positions, true_labels)."""
  import numpy as np
  rng = np.random.RandomState(seed)
  q, l, f = args.queries, args.list_size, args.num_features
  x = rng.randn(q, l, f).astype(np.float32)
  w = rng.randn(f).astype(np.float32) / np.sqrt(f)
  utility = x @ w
  order = np.argsort(np.argsort(utility, axis=1), axis=1)
  true_labels = (order * 5 // l).astype(np.float32)
  rel_prob = (true_labels / 4.0) * 0.9 + 0.05

  # Logging policy: ranks mostly by the first feature (a weak predictor
  # of utility) with exploration noise. Exposure correlates with
  # x[..., 0], so a naive click model inherits that bias (over-weighting
  # x0); the noise varies each document's position, which is what makes
  # the position/relevance decomposition identifiable (as in real logs
  # with result randomization).
  logged_scores = 1.5 * x[..., 0] + rng.randn(q, l)
  shown_rank = np.argsort(np.argsort(-logged_scores, axis=1), axis=1) + 1
  p_obs = (1.0 / shown_rank) ** args.eta
  clicks = (rng.rand(q, l) < p_obs * rel_prob).astype(np.float32)
  return x, clicks, shown_rank.astype(np.int32), true_labels


def main():
  args = parse_args()
  import flax.linen as nn
  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax

  from ranking_tpu import models, ops, train
  from ranking_tpu.data.batch import RankingBatch

  x, clicks, positions, true_labels = make_click_log(args)
  split = args.queries * 4 // 5

  class TwoTower(nn.Module):
    """Relevance tower + positional observation tower (PBM factorization);
    ``use_position`` False = the naive click model."""

    use_position: bool

    @nn.compact
    def __call__(self, context, examples, mask, training=False):
      rel = models.DNNScorer(hidden_layer_dims=(64, 32), dropout=0.0,
                             use_batch_norm=False, name='relevance')(
          {}, {'x': examples['x']}, mask, training=training)
      self.sow('intermediates', 'relevance_logits', rel)
      if not self.use_position:
        return rel
      pos_emb = nn.Embed(num_embeddings=args.list_size + 2, features=1,
                         name='position_bias')(examples['position'])
      return rel + pos_emb[..., 0]

  def train_model(use_position, seed):
    model = TwoTower(use_position=use_position)
    batch0 = RankingBatch(
        context={},
        examples={'x': jnp.asarray(x[:args.batch_size]),
                  'position': jnp.asarray(positions[:args.batch_size])},
        labels=jnp.asarray(clicks[:args.batch_size]),
        mask=jnp.ones((args.batch_size, args.list_size), bool))
    state = train.create_train_state(
        model, optax.adam(args.learning_rate), jax.random.PRNGKey(seed),
        batch0.context, batch0.examples, batch0.mask)
    loss_fn = ops.make_loss_fn(ops.RankingLossKey.SIGMOID_CROSS_ENTROPY_LOSS)
    step = jax.jit(train.make_train_step(loss_fn), donate_argnums=0)
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed + 1)
    for i in range(args.steps):
      idx = rng.randint(0, split, size=args.batch_size)
      batch = RankingBatch(
          context={},
          examples={'x': jnp.asarray(x[idx]),
                    'position': jnp.asarray(positions[idx])},
          labels=jnp.asarray(clicks[idx]),
          mask=jnp.ones((args.batch_size, args.list_size), bool))
      state, metrics = step(state, batch, key)
    return model, state

  def true_ndcg(model, state):
    # Score the held-out split with the relevance tower only: position set
    # to a constant so the observation tower contributes a constant offset
    # (rank-invariant), i.e. scores order by relevance alone.
    ex = {'x': jnp.asarray(x[split:]),
          'position': jnp.zeros_like(jnp.asarray(positions[split:]))}
    m = jnp.ones((args.queries - split, args.list_size), bool)
    scores = model.apply(state.variables, {}, ex, m, training=False)
    return float(ops.compute_mean(ops.RankingMetricKey.NDCG,
                                  true_labels[split:], np.asarray(scores),
                                  topn=5))

  naive_model, naive_state = train_model(use_position=False, seed=0)
  tt_model, tt_state = train_model(use_position=True, seed=0)
  naive = true_ndcg(naive_model, naive_state)
  debiased = true_ndcg(tt_model, tt_state)
  print(json.dumps({
      'eta': args.eta,
      'naive_click_model_true_ndcg@5': round(naive, 4),
      'two_tower_debiased_true_ndcg@5': round(debiased, 4),
  }))
  return naive, debiased


if __name__ == '__main__':
  main()
