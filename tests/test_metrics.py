"""Golden-value tests for ranking metrics, with loop-based oracles."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from ranking_tpu.ops import metrics
from ranking_tpu.ops.metric_registry import (
    MeanState,
    RankingMetricKey,
    build_metric,
    compute_mean,
    make_ranking_metric_fn,
)

LABELS = [[0.0, 0.0, 1.0], [0.0, 1.0, 2.0]]
PREDS = [[0.1, 0.9, 0.5], [0.3, 0.2, 0.1]]
PADDED_LABELS = [[0.0, 1.0, -1.0], [0.0, 1.0, 2.0]]


def weighted_mean(values, weights):
  values = np.asarray(values).reshape(-1)
  weights = np.asarray(weights).reshape(-1)
  return float((values * weights).sum() / weights.sum())


class TestMRR:

  def test_basic(self):
    # List 0: relevant item (label 1) ranked 2nd -> 1/2.
    # List 1: sorted by preds desc = items (0, 1, 2); first relevant is
    #   item1 at rank 2 -> 1/2.
    m = metrics.MRRMetric()
    values, weights = m(jnp.array(LABELS), jnp.array(PREDS))
    np.testing.assert_allclose(np.asarray(values), [[0.5], [0.5]])
    np.testing.assert_allclose(np.asarray(weights), [[1.0], [1.0]])

  def test_topn_cuts_off(self):
    m = metrics.MRRMetric(topn=1)
    values, _ = m(jnp.array(LABELS), jnp.array(PREDS))
    np.testing.assert_allclose(np.asarray(values), [[0.0], [0.0]])

  def test_padded(self):
    m = metrics.MRRMetric()
    values, weights = m(jnp.array(PADDED_LABELS), jnp.array(PREDS))
    # List 0: valid preds [0.1, 0.9]; label-1 item has highest pred -> 1.
    np.testing.assert_allclose(np.asarray(values), [[1.0], [0.5]])


class TestNDCG:

  def _dcg(self, labels_in_rank_order):
    return sum((2**l - 1) * math.log(2) / math.log1p(r + 1)
               for r, l in enumerate(labels_in_rank_order))

  def test_basic(self):
    m = metrics.NDCGMetric()
    values, weights = m(jnp.array(LABELS), jnp.array(PREDS))
    # List 0 sorted by preds: labels [0, 1, 0]; ideal [1, 0, 0].
    want0 = self._dcg([0, 1, 0]) / self._dcg([1, 0, 0])
    # List 1 sorted by preds: labels [0, 1, 2]; ideal [2, 1, 0].
    want1 = self._dcg([0, 1, 2]) / self._dcg([2, 1, 0])
    np.testing.assert_allclose(
        np.asarray(values), [[want0], [want1]], rtol=1e-5)

  def test_topn(self):
    m = metrics.NDCGMetric(topn=1)
    values, _ = m(jnp.array(LABELS), jnp.array(PREDS))
    want1 = self._dcg([0]) / self._dcg([2])
    np.testing.assert_allclose(np.asarray(values), [[0.0], [want1]],
                               rtol=1e-5)

  def test_weights_change_both_dcg_and_ideal(self):
    weights = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]
    m = metrics.NDCGMetric()
    values, per_list_weights = m(
        jnp.array(LABELS), jnp.array(PREDS), weights=jnp.array(weights))
    # List 0: sorted by preds -> item order (1, 2, 0), weighted gains
    # w*(2^l - 1) at sorted positions.
    def dcg(pairs):  # (weight, label) in rank order
      return sum(w * (2**l - 1) * math.log(2) / math.log1p(r + 1)
                 for r, (w, l) in enumerate(pairs))
    dcg0 = dcg([(2.0, 0.0), (3.0, 1.0), (1.0, 0.0)])
    # Ideal: sorted by weighted gains desc: item2 (3*1), others 0 gain.
    ideal0 = dcg([(3.0, 1.0), (1.0, 0.0), (2.0, 0.0)])
    np.testing.assert_allclose(float(values[0, 0]), dcg0 / ideal0, rtol=1e-5)
    # Per-list weight = sum(w * gain) / sum(gain) = 3.0 for list 0.
    np.testing.assert_allclose(float(per_list_weights[0, 0]), 3.0, rtol=1e-5)

  def test_zero_relevance_list_gets_avg_weight(self):
    labels = [[0.0, 0.0, 0.0], [0.0, 1.0, 2.0]]
    weights = [[1.0, 1.0, 1.0], [2.0, 2.0, 2.0]]
    m = metrics.NDCGMetric()
    _, per_list_weights = m(
        jnp.array(labels), jnp.array(PREDS), weights=jnp.array(weights))
    # List 1 weight = 2.0; list 0 has zero relevance -> gets the batch
    # average of nonzero-relevance list weights = 2.0.
    np.testing.assert_allclose(np.asarray(per_list_weights),
                               [[2.0], [2.0]], rtol=1e-5)


class TestDCG:

  def test_matches_manual(self):
    m = metrics.DCGMetric()
    values, weights = m(jnp.array(LABELS), jnp.array(PREDS))
    def dcg(labels_in_order):
      return sum((2**l - 1) * math.log(2) / math.log1p(r + 1)
                 for r, l in enumerate(labels_in_order))
    np.testing.assert_allclose(
        np.asarray(values), [[dcg([0, 1, 0])], [dcg([0, 1, 2])]], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(weights), [[1.0], [1.0]])


class TestPrecisionRecall:

  def test_precision(self):
    m = metrics.PrecisionMetric(topn=2)
    values, _ = m(jnp.array(LABELS), jnp.array(PREDS))
    np.testing.assert_allclose(np.asarray(values), [[0.5], [0.5]])

  def test_precision_valid_topn_clamp(self):
    labels = [[1.0, -1.0, -1.0]]
    preds = [[0.5, 0.4, 0.3]]
    m = metrics.PrecisionMetric(topn=2)
    values, _ = m(jnp.array(labels), jnp.array(preds))
    # Only 1 valid item; precision@2 divides by min(2, 1) = 1.
    np.testing.assert_allclose(np.asarray(values), [[1.0]])

  def test_recall(self):
    m = metrics.RecallMetric(topn=1)
    values, _ = m(jnp.array(LABELS), jnp.array(PREDS))
    # List 0: top-1 is item1 (label 0) -> 0/1. List 1: top-1 item0 -> 0/2.
    np.testing.assert_allclose(np.asarray(values), [[0.0], [0.0]])

  def test_recall_full(self):
    m = metrics.RecallMetric()
    values, _ = m(jnp.array(LABELS), jnp.array(PREDS))
    np.testing.assert_allclose(np.asarray(values), [[1.0], [1.0]])


class TestMAP:

  def test_basic(self):
    m = metrics.MeanAveragePrecisionMetric()
    values, _ = m(jnp.array(LABELS), jnp.array(PREDS))
    # List 0 sorted: rel [0, 1, 0] -> precisions at rel positions: 1/2.
    np.testing.assert_allclose(float(values[0, 0]), 0.5, rtol=1e-5)
    # List 1 sorted: rel [0, 1, 1] -> (1/2 + 2/3) / 2.
    np.testing.assert_allclose(float(values[1, 0]), (0.5 + 2 / 3) / 2,
                               rtol=1e-5)


class TestARP:

  def test_basic(self):
    m = metrics.ARPMetric()
    values, weights = m(jnp.array(LABELS), jnp.array(PREDS))
    # List 0: relevant label 1 at sorted position 2 -> ARP 2.
    np.testing.assert_allclose(float(values[0, 0]), 2.0, rtol=1e-5)
    # List 1: labels 1@rank2, 2@rank3 -> (1*2 + 2*3) / 3.
    np.testing.assert_allclose(float(values[1, 0]), 8 / 3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(weights), [[1.0], [3.0]])


class TestOPA:

  def test_basic(self):
    m = metrics.OPAMetric()
    values, weights = m(jnp.array(LABELS), jnp.array(PREDS))
    # List 0: pairs with l_i > l_j: (2,0), (2,1); pred diffs: 0.4 > 0 ok,
    # -0.4 < 0 wrong -> 1/2.
    np.testing.assert_allclose(float(values[0, 0]), 0.5)
    # List 1: pairs (1,0): -0.1 wrong; (2,0): -0.2 wrong; (2,1): -0.1 wrong.
    np.testing.assert_allclose(float(values[1, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(weights), [[2.0], [3.0]])


class TestHits:

  def test_basic(self):
    m = metrics.HitsMetric(topn=1)
    values, _ = m(jnp.array(LABELS), jnp.array(PREDS))
    np.testing.assert_allclose(np.asarray(values), [[0.0], [0.0]])
    m2 = metrics.HitsMetric(topn=2)
    values2, _ = m2(jnp.array(LABELS), jnp.array(PREDS))
    np.testing.assert_allclose(np.asarray(values2), [[1.0], [1.0]])


class TestBPref:

  def test_trec(self):
    labels = [[1.0, 0.0, 1.0, 0.0]]
    preds = [[0.9, 0.8, 0.7, 0.6]]
    # Sorted: rel [1, 0, 1, 0]. R = 2, N = 2.
    # First rel: 0 irrelevant above -> 1 - 0/2. Second rel: 1 above -> 1 - 1/2.
    want = (1.0 + 0.5) / 2
    m = metrics.BPrefMetric()
    values, _ = m(jnp.array(labels), jnp.array(preds))
    np.testing.assert_allclose(float(values[0, 0]), want, rtol=1e-5)


class TestPWA:

  def test_basic(self):
    labels = [[2.0, 1.0, 3.0]]
    preds = [[0.3, 0.2, 0.1]]
    m = metrics.PWAMetric(topn=2)
    values, weights = m(jnp.array(labels), jnp.array(preds))
    want = (2.0 / 1 + 1.0 / 2) / (1.0 + 0.5)
    np.testing.assert_allclose(float(values[0, 0]), want, rtol=1e-5)


class TestDiversityMetrics:

  def test_alpha_dcg(self):
    # 2 subtopics, 3 docs. Doc0 covers s0, doc1 covers both, doc2 covers s1.
    labels = [[[1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]]
    preds = [[0.9, 0.8, 0.7]]
    alpha = 0.5
    m = metrics.AlphaDCGMetric(alpha=alpha, topn=None)
    values, weights = m(jnp.array(labels), jnp.array(preds))
    # Rank order = doc0, doc1, doc2.
    # gains: doc0: s0 first coverage = 1. doc1: s0 second (0.5) + s1 first
    # (1) = 1.5. doc2: s1 second -> 0.5.
    def disc(r):
      return math.log(2) / math.log1p(r)
    want = 1.0 * disc(1) + 1.5 * disc(2) + 0.5 * disc(3)
    np.testing.assert_allclose(float(values[0, 0]), want, rtol=1e-5)

  def test_precision_ia(self):
    labels = [[[1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]]
    preds = [[0.9, 0.8, 0.7]]
    m = metrics.PrecisionIAMetric(topn=2)
    values, _ = m(jnp.array(labels), jnp.array(preds))
    # Top-2 docs cover 3 (doc0: 1, doc1: 2) over 2 subtopics * 2 ranks.
    np.testing.assert_allclose(float(values[0, 0]), 3 / 4, rtol=1e-5)


class TestWeightFallback:

  def test_per_example_weights_to_per_list_weights(self):
    weights = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    relevance = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    out = metrics.per_example_weights_to_per_list_weights(weights, relevance)
    # List 0: 2.0 (weight of its relevant item). List 1 has no relevance:
    # falls back to batch average of per-list weights = 2.0.
    np.testing.assert_allclose(np.asarray(out), [[2.0], [2.0]])

  def test_all_zero_relevance(self):
    weights = jnp.ones((2, 3))
    relevance = jnp.zeros((2, 3))
    out = metrics.per_example_weights_to_per_list_weights(weights, relevance)
    np.testing.assert_allclose(np.asarray(out), [[1.0], [1.0]])

  def test_zero_weights_list_excluded(self):
    weights = jnp.array([[0.0, 0.0], [1.0, 1.0]])
    relevance = jnp.array([[1.0, 0.0], [1.0, 0.0]])
    out = metrics.per_example_weights_to_per_list_weights(weights, relevance)
    np.testing.assert_allclose(np.asarray(out), [[0.0], [1.0]])


class TestRegistry:

  def test_all_keys_build(self):
    for key in RankingMetricKey.all_keys():
      assert build_metric(key, topn=5) is not None

  def test_make_ranking_metric_fn(self):
    fn = make_ranking_metric_fn(RankingMetricKey.NDCG, topn=5)
    values, weights = fn(jnp.array(LABELS), jnp.array(PREDS))
    assert values.shape == (2, 1)

  def test_compute_mean(self):
    got = compute_mean(RankingMetricKey.MRR, jnp.array(LABELS),
                       jnp.array(PREDS))
    np.testing.assert_allclose(float(got), 0.5, rtol=1e-6)

  def test_weights_feature(self):
    fn = make_ranking_metric_fn(
        RankingMetricKey.NDCG, weights_feature_name='w')
    values, weights = fn(jnp.array(LABELS), jnp.array(PREDS),
                         features={'w': jnp.ones((2, 3))})
    assert values.shape == (2, 1)


class TestMeanState:

  def test_streaming_matches_batch(self):
    m = metrics.NDCGMetric()
    state = MeanState.zero()
    for i in range(2):
      values, weights = m(jnp.array([LABELS[i]]), jnp.array([PREDS[i]]))
      state = state.update(values, weights)
    values, weights = m(jnp.array(LABELS), jnp.array(PREDS))
    np.testing.assert_allclose(
        float(state.result()), weighted_mean(values, weights), rtol=1e-6)

  def test_merge(self):
    a = MeanState(jnp.asarray(2.0), jnp.asarray(1.0))
    b = MeanState(jnp.asarray(4.0), jnp.asarray(3.0))
    np.testing.assert_allclose(float(a.merge(b).result()), 1.5)


class TestRaggedMetricFn:

  def test_ragged_equals_padded(self):
    import jax.numpy as jnp

    from ranking_tpu.ops.metric_registry import (RankingMetricKey,
                                                 make_ranking_metric_fn)
    ragged_labels = [[1.0, 0.0], [2.0, 1.0, 0.0]]
    ragged_preds = [[0.5, -0.2], [1.0, 0.3, -0.4]]
    fn = make_ranking_metric_fn(RankingMetricKey.NDCG, topn=5, ragged=True)
    rv, rw = fn(ragged_labels, ragged_preds)
    dense_labels = jnp.array([[1.0, 0.0, -1.0], [2.0, 1.0, 0.0]])
    dense_preds = jnp.array([[0.5, -0.2, -1e6], [1.0, 0.3, -0.4]])
    dfn = make_ranking_metric_fn(RankingMetricKey.NDCG, topn=5)
    dv, dw = dfn(dense_labels, dense_preds)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(dv), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rw), np.asarray(dw), rtol=1e-6)


class TestEvalMetric:
  """Standalone eval_metric (python/metrics.py:650-705 analog)."""

  def test_value_and_validation(self):
    import pytest

    from ranking_tpu import ops
    fn = ops.make_ranking_metric_fn(ops.RankingMetricKey.MRR)
    v = ops.eval_metric(metric_fn=fn, labels=[[0., 0., 1.], [0., 1., 2.]],
                        predictions=[[1., 3., 2.], [1., 2., 3.]])
    np.testing.assert_allclose(float(v), 0.75)  # ranks 2 and 1
    with pytest.raises(ValueError, match='requires argument'):
      ops.eval_metric(metric_fn=fn, predictions=[[1.]])
    with pytest.raises(ValueError, match='does not accept'):
      ops.eval_metric(metric_fn=fn, labels=[[0.]], predictions=[[1.]],
                      bogus=3)


def test_mean_state_rejects_mismatched_weight_count():
  from ranking_tpu.ops.metric_registry import MeanState
  import pytest as _pytest
  s = MeanState.zero()
  # [B, 1] values with [B] weights must pair elementwise, not broadcast
  # to [B, B] (which silently computed sum(v)*sum(w)).
  s2 = s.update(jnp.asarray([[1.0], [2.0], [3.0], [4.0]]),
                jnp.asarray([1.0, 0.0, 0.0, 0.0]))
  np.testing.assert_allclose(float(s2.result()), 1.0)
  with _pytest.raises(ValueError, match='values vs'):
    s.update(jnp.ones((4, 1)), jnp.ones((3,)))


def test_metric_factory_rejects_unknown_options():
  import pytest as _pytest
  from ranking_tpu.ops import metric_registry
  with _pytest.raises(ValueError, match='does not accept'):
    metric_registry.make_ranking_metric_fn('ndcg', top_n=2)  # typo
