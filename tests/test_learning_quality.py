"""Learning-quality tests: the full stack recovers a known ranking.

Synthetic data with a deterministic utility function (labels = bucketed
linear score of the features): a DNN scorer trained with each major loss
family must reach high NDCG@5 — end-to-end evidence that losses, gradients,
masking, and the training loop cooperate (the reference's example tests
only check that training *runs*; this checks that it *works*)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ranking_tpu import models, ops, train
from ranking_tpu.data.batch import batch_from_labels


def _dataset(n_lists=64, list_size=16, feat=8, seed=0):
  rng = np.random.RandomState(seed)
  x = rng.randn(n_lists, list_size, feat).astype(np.float32)
  w = rng.randn(feat).astype(np.float32)
  utility = x @ w
  # Graded labels 0..4 by within-list quintile.
  order = np.argsort(np.argsort(utility, axis=1), axis=1)
  labels = (order * 5 // list_size).astype(np.float32)
  # Pad some tails.
  labels[:, -2:] = np.where(rng.rand(n_lists, 2) < 0.3, -1.0,
                            labels[:, -2:])
  return x, labels


@pytest.mark.parametrize('loss_key', [
    ops.RankingLossKey.SOFTMAX_LOSS,
    ops.RankingLossKey.PAIRWISE_LOGISTIC_LOSS,
    ops.RankingLossKey.APPROX_NDCG_LOSS,
])
def test_recovers_synthetic_ranking(loss_key):
  x, labels = _dataset()
  batch = batch_from_labels(labels=jnp.asarray(labels),
                            examples={'x': jnp.asarray(x)})
  model = models.RankingModel(
      scorer=models.DNNScorer(hidden_layer_dims=(32, 16), dropout=0.0,
                              use_batch_norm=False))
  state = train.create_train_state(
      model, optax.adam(0.01), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask)
  step = jax.jit(train.make_train_step(ops.make_loss_fn(loss_key)),
                 donate_argnums=0)
  key = jax.random.PRNGKey(1)
  for _ in range(150):
    state, metrics = step(state, batch, key)

  metric_fns = {'ndcg@5': ops.make_ranking_metric_fn(
      ops.RankingMetricKey.NDCG, topn=5)}
  eval_step = jax.jit(train.make_eval_step(metric_fns))
  states, _ = eval_step(state, batch, train.init_metric_states(metric_fns))
  ndcg5 = float(train.metric_results(states)['ndcg@5'])
  assert ndcg5 > 0.85, f'{loss_key}: ndcg@5={ndcg5:.3f}'


def test_groupwise_scorer_also_learns():
  x, labels = _dataset(seed=3)
  batch = batch_from_labels(labels=jnp.asarray(labels),
                            examples={'x': jnp.asarray(x)})
  model = models.RankingModel(
      scorer=models.GroupwiseDNNScorer(group_size=2,
                                       hidden_layer_dims=(32, 16),
                                       dropout=0.0, use_batch_norm=False))
  state = train.create_train_state(
      model, optax.adam(0.01), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask)
  step = jax.jit(train.make_train_step(
      ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)), donate_argnums=0)
  for _ in range(150):
    state, _ = step(state, batch, jax.random.PRNGKey(1))
  metric_fns = {'ndcg@5': ops.make_ranking_metric_fn(
      ops.RankingMetricKey.NDCG, topn=5)}
  eval_step = jax.jit(train.make_eval_step(metric_fns))
  states, _ = eval_step(state, batch, train.init_metric_states(metric_fns))
  assert float(train.metric_results(states)['ndcg@5']) > 0.8
