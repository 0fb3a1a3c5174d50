"""Tests for ranking_tpu.utils.list_ops against hand-computed values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ranking_tpu.utils import list_ops


class TestIsLabelValid:

  def test_basic(self):
    labels = jnp.array([[1.0, 0.0, -1.0]])
    np.testing.assert_array_equal(
        np.asarray(list_ops.is_label_valid(labels)),
        [[True, True, False]])


class TestSortByScores:

  def test_sorts_descending(self):
    scores = jnp.array([[1.0, 3.5, 2.1]])
    feats = jnp.array([[10.0, 20.0, 30.0]])
    out, = list_ops.sort_by_scores(scores, [feats])
    np.testing.assert_allclose(np.asarray(out), [[20.0, 30.0, 10.0]])

  def test_topn(self):
    scores = jnp.array([[1.0, 3.5, 2.1]])
    feats = jnp.array([[10.0, 20.0, 30.0]])
    out, = list_ops.sort_by_scores(scores, [feats], topn=2)
    np.testing.assert_allclose(np.asarray(out), [[20.0, 30.0]])

  def test_mask_pushes_invalid_last(self):
    scores = jnp.array([[1.0, 9.0, 2.0]])
    mask = jnp.array([[True, False, True]])
    feats = jnp.array([[10.0, 20.0, 30.0]])
    out, = list_ops.sort_by_scores(scores, [feats], mask=mask)
    np.testing.assert_allclose(np.asarray(out), [[30.0, 10.0, 20.0]])

  def test_3d_features(self):
    scores = jnp.array([[1.0, 2.0]])
    feats = jnp.array([[[1.0, 1.0], [2.0, 2.0]]])
    out, = list_ops.sort_by_scores(scores, [feats])
    np.testing.assert_allclose(np.asarray(out), [[[2.0, 2.0], [1.0, 1.0]]])

  def test_tie_shuffle_deterministic_under_same_key(self):
    scores = jnp.array([[1.0, 1.0, 1.0, 1.0]])
    feats = jnp.array([[0.0, 1.0, 2.0, 3.0]])
    key = jax.random.PRNGKey(0)
    a, = list_ops.sort_by_scores(scores, [feats], key=key)
    b, = list_ops.sort_by_scores(scores, [feats], key=key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

  def test_tie_shuffle_covers_permutations(self):
    scores = jnp.array([[1.0, 1.0, 1.0]])
    feats = jnp.array([[0.0, 1.0, 2.0]])
    seen = set()
    for seed in range(20):
      out, = list_ops.sort_by_scores(
          scores, [feats], key=jax.random.PRNGKey(seed))
      seen.add(tuple(np.asarray(out[0]).tolist()))
    assert len(seen) > 1


class TestSortedRanks:

  def test_basic(self):
    scores = jnp.array([[1.0, 3.5, 2.1]])
    ranks = list_ops.sorted_ranks(scores)
    np.testing.assert_array_equal(np.asarray(ranks), [[3, 1, 2]])

  def test_batch(self):
    scores = jnp.array([[1.0, 3.5, 2.1], [5.0, 1.0, 3.0]])
    ranks = list_ops.sorted_ranks(scores)
    np.testing.assert_array_equal(np.asarray(ranks), [[3, 1, 2], [1, 3, 2]])


class TestPaddedGatherIndices:

  def test_circular_padding(self):
    is_valid = jnp.array([[True, True, False]])
    indices, mask = list_ops.padded_gather_indices(is_valid)
    np.testing.assert_array_equal(np.asarray(indices), [[0, 1, 0]])
    np.testing.assert_array_equal(np.asarray(mask), [[True, True, False]])

  def test_valid_in_middle(self):
    is_valid = jnp.array([[False, True, False, True]])
    indices, mask = list_ops.padded_gather_indices(is_valid)
    np.testing.assert_array_equal(np.asarray(indices), [[1, 3, 1, 3]])
    np.testing.assert_array_equal(
        np.asarray(mask), [[True, True, False, False]])

  def test_all_invalid(self):
    is_valid = jnp.array([[False, False]])
    indices, mask = list_ops.padded_gather_indices(is_valid)
    assert not np.asarray(mask).any()


class TestGatherPerRow:

  def test_2d(self):
    inputs = jnp.array([[1.0, 3.0, 2.0], [1.0, 2.0, 3.0]])
    indices = jnp.array([[1, 2], [2, 1]])
    out = list_ops.gather_per_row(inputs, indices)
    np.testing.assert_allclose(np.asarray(out), [[3.0, 2.0], [3.0, 2.0]])


class TestDeNoise:

  def test_simplex_output(self):
    counts = jnp.array([[5.0, 2.0, 1.0]])
    noise = jnp.array([[1.0, 1.0, 1.0]])
    out = np.asarray(list_ops.de_noise(counts, noise, ratio=0.5))
    assert out.min() >= -1e-6
    np.testing.assert_allclose(out.sum(axis=1), [1.0], rtol=1e-5)

  def test_all_noise_gives_zero_mass_on_low_counts(self):
    # When observed counts match noise exactly, the true distribution stays a
    # simplex (values remain finite and normalized).
    counts = jnp.array([[1.0, 1.0]])
    noise = jnp.array([[1.0, 1.0]])
    out = np.asarray(list_ops.de_noise(counts, noise, ratio=0.9))
    np.testing.assert_allclose(out.sum(axis=1), [1.0], rtol=1e-5)

  def test_invalid_ratio_raises(self):
    with pytest.raises(ValueError):
      list_ops.de_noise(jnp.ones((1, 2)), jnp.ones((1, 2)), ratio=1.5)


class TestParseKeysAndWeights:

  def test_single(self):
    assert list_ops.parse_keys_and_weights('softmax_loss') == {
        'softmax_loss': 1.0}

  def test_weighted(self):
    out = list_ops.parse_keys_and_weights(
        'softmax_loss:0.9, sigmoid_cross_entropy_loss:0.1')
    assert out == {'softmax_loss': 0.9, 'sigmoid_cross_entropy_loss': 0.1}


class TestRaggedToDense:

  def test_pads(self):
    labels, preds, weights, mask = list_ops.ragged_to_dense(
        [[1.0, 0.0], [2.0]], [[0.5, 0.2], [0.9]], [[1.0, 1.0], [2.0]])
    np.testing.assert_allclose(np.asarray(labels), [[1.0, 0.0], [2.0, -1.0]])
    np.testing.assert_allclose(np.asarray(preds), [[0.5, 0.2], [0.9, -1e6]])
    np.testing.assert_allclose(np.asarray(weights), [[1.0, 1.0], [2.0, 0.0]])
    np.testing.assert_array_equal(
        np.asarray(mask), [[True, True], [True, False]])


class TestSharedSortScope:

  def _data(self):
    rng = np.random.RandomState(3)
    scores = rng.randn(4, 12).astype(np.float32)
    scores[0, 3] = scores[0, 7]  # ties: stable order must be preserved
    scores[2, :] = 1.0           # an all-tied list
    labels = rng.randint(0, 4, size=(4, 12)).astype(np.float32)
    mask = rng.rand(4, 12) > 0.25
    mask[3, :2] = True
    return (jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(mask))

  def test_sorts_bitwise_equal_and_cached(self):
    scores, labels, mask = self._data()
    base = [list_ops.sort_by_scores(scores, [labels], topn=k, mask=mask)[0]
            for k in (1, 5, None)]
    with list_ops.shared_sort_scope():
      cached = [
          list_ops.sort_by_scores(scores, [labels], topn=k, mask=mask)[0]
          for k in (1, 5, None)]
      cache = list_ops.shared_sort_cache()
      # One full-sorted channel entry serves every topn.
      assert len(cache) == 1
    assert list_ops.shared_sort_cache() is None
    for a, b in zip(base, cached):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_distinct_scores_and_masks_not_conflated(self):
    scores, labels, mask = self._data()
    other = scores + 1.7 * jnp.sin(scores)
    with list_ops.shared_sort_scope():
      a = list_ops.sort_by_scores(scores, [labels], topn=4, mask=mask)[0]
      b = list_ops.sort_by_scores(other, [labels], topn=4, mask=mask)[0]
      c = list_ops.sort_by_scores(scores, [labels], topn=4, mask=None)[0]
    np.testing.assert_array_equal(
        np.asarray(a),
        np.asarray(list_ops.sort_by_scores(scores, [labels], topn=4,
                                           mask=mask)[0]))
    np.testing.assert_array_equal(
        np.asarray(b),
        np.asarray(list_ops.sort_by_scores(other, [labels], topn=4,
                                           mask=mask)[0]))
    np.testing.assert_array_equal(
        np.asarray(c),
        np.asarray(list_ops.sort_by_scores(scores, [labels], topn=4)[0]))

  def test_random_tie_break_bypasses_cache(self):
    scores, labels, mask = self._data()
    key = jax.random.PRNGKey(0)
    with list_ops.shared_sort_scope():
      a = list_ops.sort_by_scores(scores, [labels], topn=12, mask=mask,
                                  key=key)[0]
    b = list_ops.sort_by_scores(scores, [labels], topn=12, mask=mask,
                                key=key)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_eval_step_metrics_bitwise_equal_under_scope(self):
    """The jitted eval step (which enables the scope) must produce the
    same metric values as direct unscoped metric calls."""
    import optax
    from ranking_tpu import models, ops, train
    from ranking_tpu.data.batch import batch_from_labels

    rng = np.random.RandomState(7)
    labels = rng.randint(-1, 4, size=(6, 15)).astype(np.float32)
    labels[0] = 2.0  # fully tied relevance
    batch = batch_from_labels(
        labels=labels,
        examples={'x': rng.randn(6, 15, 4).astype(np.float32)})
    model = models.RankingModel(scorer=models.DNNScorer(
        hidden_layer_dims=(8,), dropout=0.0, use_batch_norm=False))
    state = train.create_train_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        batch.context, batch.examples, batch.mask)

    metric_fns = {
        'ndcg@1': ops.make_ranking_metric_fn(ops.RankingMetricKey.NDCG,
                                             topn=1),
        'ndcg@5': ops.make_ranking_metric_fn(ops.RankingMetricKey.NDCG,
                                             topn=5),
        'ndcg': ops.make_ranking_metric_fn(ops.RankingMetricKey.NDCG),
        'mrr': ops.make_ranking_metric_fn(ops.RankingMetricKey.MRR),
        'map': ops.make_ranking_metric_fn(ops.RankingMetricKey.MAP),
    }
    eval_fn = jax.jit(train.make_eval_step(metric_fns))
    states, logits = eval_fn(state, batch,
                             train.init_metric_states(metric_fns))

    # Scoped vs unscoped metric values, bitwise, inside one jit (so the
    # only difference is the shared sort).
    @jax.jit
    def both(labels, logits, features):
      plain = {n: fn(labels, logits, features=features)
               for n, fn in metric_fns.items()}
      with list_ops.shared_sort_scope():
        shared = {n: fn(labels, logits, features=features)
                  for n, fn in metric_fns.items()}
      return plain, shared

    plain, shared = both(batch.labels, logits, batch.features)
    for name in metric_fns:
      for a, b in zip(plain[name], shared[name]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
      values, weights = plain[name]
      expect = float(jnp.sum(values * weights) / jnp.sum(weights))
      got = float(states[name].result())
      assert abs(got - expect) < 1e-5, (name, got, expect)
