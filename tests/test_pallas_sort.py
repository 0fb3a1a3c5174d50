"""Pallas sort kernel == list_ops sort on tie-free inputs."""

import jax.numpy as jnp
import numpy as np
import pytest

from ranking_tpu.ops.pallas import sort as psort
from ranking_tpu.utils import list_ops


@pytest.fixture(autouse=True)
def _interpret():
  psort._INTERPRET = True
  yield
  psort._INTERPRET = False


def _data(b=5, l=9, seed=0):
  rng = np.random.RandomState(seed)
  # Tie-free scores: random then + tiny index jitter.
  scores = rng.randn(b, l).astype(np.float32)
  scores += np.arange(l)[None, :] * 1e-4
  labels = rng.randint(0, 4, size=(b, l)).astype(np.float32)
  mask = rng.rand(b, l) > 0.25
  mask[:, 0] = True
  return jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(mask)


def test_sorted_values_match_reference():
  scores, labels, mask = _data()
  expected, = list_ops.sort_by_scores(scores, [labels], mask=mask)
  got, = psort.sort_by_scores(scores, [labels], mask=mask)
  # Compare only the valid prefix: tie behavior among pushed-to-the-end
  # invalid slots is unspecified.
  n_valid = np.asarray(mask).sum(axis=1)
  for b in range(scores.shape[0]):
    np.testing.assert_allclose(np.asarray(got)[b, :n_valid[b]],
                               np.asarray(expected)[b, :n_valid[b]],
                               rtol=1e-6)


def test_topn_cut():
  scores, labels, mask = _data(seed=1)
  expected, = list_ops.sort_by_scores(scores, [labels], topn=3, mask=mask)
  got, = psort.sort_by_scores(scores, [labels], topn=3, mask=mask)
  n_valid = np.minimum(np.asarray(mask).sum(axis=1), 3)
  for b in range(scores.shape[0]):
    np.testing.assert_allclose(np.asarray(got)[b, :n_valid[b]],
                               np.asarray(expected)[b, :n_valid[b]],
                               rtol=1e-6)


def test_multiple_feature_channels():
  scores, labels, mask = _data(seed=2)
  weights = jnp.asarray(np.random.RandomState(3).rand(*labels.shape)
                        .astype(np.float32))
  el, ew = list_ops.sort_by_scores(scores, [labels, weights], mask=mask)
  gl, gw = psort.sort_by_scores(scores, [labels, weights], mask=mask)
  n_valid = np.asarray(mask).sum(axis=1)
  for b in range(scores.shape[0]):
    np.testing.assert_allclose(np.asarray(gl)[b, :n_valid[b]],
                               np.asarray(el)[b, :n_valid[b]], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gw)[b, :n_valid[b]],
                               np.asarray(ew)[b, :n_valid[b]], rtol=1e-6)


def test_sorted_ranks_match_reference_no_mask():
  scores, _, _ = _data(seed=4)
  expected = list_ops.sorted_ranks(scores)
  got = psort.sorted_ranks(scores)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_ranks_put_invalid_last():
  scores = jnp.asarray([[5.0, 1.0, 3.0, 2.0]])
  mask = jnp.asarray([[True, True, False, True]])
  ranks = psort.sorted_ranks(scores, mask=mask)
  # Valid order: 5.0 (1), 2.0... scores: 5,1,2 valid -> ranks 1,3,?,2;
  # invalid item is last (4).
  np.testing.assert_array_equal(np.asarray(ranks), [[1, 3, 4, 2]])


def test_odd_batch_padding():
  scores, labels, mask = _data(b=3, l=5, seed=5)
  got, = psort.sort_by_scores(scores, [labels], mask=mask)
  assert got.shape == (3, 5)


def test_metric_path_with_pallas_sort_matches(monkeypatch):
  """Opt-in wiring: with ops.pallas.set_enabled(True), the metric suite
  routes its sorts through the fused kernel (interpret mode here) and
  reproduces the XLA-path values exactly."""
  import numpy as np

  from ranking_tpu import ops
  from ranking_tpu.ops.pallas import sort as pallas_sort

  rng = np.random.RandomState(3)
  b, l = 12, 40
  logits = rng.randn(b, l).astype(np.float32) * 2
  logits += np.arange(l)[None, :] * 1e-3  # tie-free
  labels = rng.randint(0, 4, size=(b, l)).astype(np.float32)
  labels[:, -7:] = -1.0
  weights = (rng.rand(b, l) + 0.2).astype(np.float32)

  keys = [ops.RankingMetricKey.NDCG, ops.RankingMetricKey.MRR,
          ops.RankingMetricKey.MAP, ops.RankingMetricKey.PRECISION]
  expected = {
      k: float(ops.compute_mean(k, labels, logits, weights=weights, topn=5))
      for k in keys}

  monkeypatch.setattr(pallas_sort, '_INTERPRET', True)
  ops.pallas.set_enabled(True)
  try:
    for k in keys:
      got = float(ops.compute_mean(k, labels, logits, weights=weights,
                                   topn=5))
      np.testing.assert_allclose(got, expected[k], rtol=1e-5, atol=1e-6,
                                 err_msg=str(k))
  finally:
    ops.pallas.set_enabled(None)


def test_neg_inf_valid_score_keeps_invalid_last():
  """A -inf VALID score (log-prob outputs) must still outrank padding:
  the all-invalid-row stand-in must never resurrect -inf row minima."""
  scores = jnp.asarray([[-1.0, -jnp.inf, -3.0, 0.5]])
  mask = jnp.asarray([[True, True, True, False]])
  labels = jnp.asarray([[1.0, 2.0, 3.0, 9.0]])[..., None]
  sorted_vals, _ = psort.sorted_values_and_ranks(scores, labels, mask=mask)
  sorted_labels = np.asarray(sorted_vals).reshape(-1)
  # Valid order by score: -1.0, -3.0, -inf; padding (label 9) last.
  np.testing.assert_array_equal(sorted_labels, [1.0, 3.0, 2.0, 9.0])
