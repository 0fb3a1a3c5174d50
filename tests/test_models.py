"""Tests for scorers, layers, groupwise scoring, and embeddings."""

import jax
import jax.numpy as jnp
import numpy as np

from ranking_tpu.models import (
    DINScorer,
    EmbeddingDNNScorer,
    DNNScorer,
    GAMScorer,
    GroupwiseDNNScorer,
    MultiTaskScorer,
    RankingModel,
)
from ranking_tpu.models import embeddings, groupwise, layers

B, L, F = 2, 4, 3
MASK = jnp.array([[True, True, True, False],
                  [True, True, False, False]])


def make_features(key=0):
  k = jax.random.PRNGKey(key)
  k1, k2 = jax.random.split(k)
  context = {'query_len': jax.random.normal(k1, (B, 1))}
  examples = {'feat': jax.random.normal(k2, (B, L, F))}
  return context, examples


class TestFlattenRestore:

  def test_flatten_shapes(self):
    context, examples = make_features()
    flat_ctx, flat_ex = layers.flatten_list(context, examples, MASK)
    assert flat_ctx['query_len'].shape == (B * L, 1)
    assert flat_ex['feat'].shape == (B * L, F)

  def test_flatten_circular_padding_replaces_invalid(self):
    examples = {'feat': jnp.arange(8.0).reshape(1, 4, 2)}
    mask = jnp.array([[True, True, False, False]])
    _, flat_ex = layers.flatten_list({}, examples, mask)
    out = np.asarray(flat_ex['feat'])
    # Slots 2, 3 are circularly padded with items 0, 1.
    np.testing.assert_allclose(out[2], out[0])
    np.testing.assert_allclose(out[3], out[1])

  def test_restore_masks_invalid(self):
    flat = jnp.arange(8.0).reshape(8, 1)
    out = layers.restore_list(flat, MASK)
    assert out.shape == (B, L)
    np.testing.assert_allclose(np.asarray(out)[0, 3], np.log(1e-10), rtol=1e-6)

  def test_restore_by_scatter_averages(self):
    mask = jnp.array([[True, False]])
    # Circular padding repeats item 0 into slot 1; by_scatter averages both
    # scores back onto item 0.
    flat = jnp.array([[2.0], [4.0]])
    out = layers.restore_list(flat, mask, by_scatter=True)
    np.testing.assert_allclose(float(out[0, 0]), 3.0)


class TestConcatFeatures:

  def test_shapes_and_context_broadcast(self):
    context, examples = make_features()
    out = layers.concat_features(context, examples, MASK)
    assert out.shape == (B, L, 1 + F)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]), np.asarray(out[0, 1, 0]))


def _run_scorer(scorer, training=False, rngs_extra=()):
  context, examples = make_features()
  rngs = {'params': jax.random.PRNGKey(0)}
  for name in rngs_extra:
    rngs[name] = jax.random.PRNGKey(1)
  variables = scorer.init(rngs, context, examples, MASK, training=False)
  out = scorer.apply(variables, context, examples, MASK, training=False)
  return out, variables


class TestScorers:

  def test_dnn_scorer(self):
    logits, _ = _run_scorer(DNNScorer(hidden_layer_dims=(8, 4)))
    assert logits.shape == (B, L)
    np.testing.assert_allclose(float(logits[0, 3]), np.log(1e-10), rtol=1e-6)
    assert np.isfinite(np.asarray(logits)[MASK]).all()

  def test_gam_scorer(self):
    logits, _ = _run_scorer(GAMScorer(example_hidden_layer_dims=(8,),
                                      context_hidden_layer_dims=(4,)))
    assert logits.shape == (B, L)

  def test_din_scorer(self):
    logits, _ = _run_scorer(DINScorer(num_heads=2, head_size=8,
                                      hidden_layer_dims=(8,)))
    assert logits.shape == (B, L)

  def test_multi_task(self):
    out, _ = _run_scorer(MultiTaskScorer(
        task_names=('click', 'purchase'), hidden_layer_dims=(8,)))
    assert set(out) == {'click', 'purchase'}
    assert out['click'].shape == (B, L)

  def test_ranking_model_log1p_transform(self):
    model = RankingModel(
        scorer=DNNScorer(hidden_layer_dims=(4,)), transform_name='log1p')
    logits, _ = _run_scorer(model)
    assert logits.shape == (B, L)

  def test_dnn_scorer_invariant_to_padding_features(self):
    """Padded-slot features must not influence valid scores (eval mode)."""
    scorer = DNNScorer(hidden_layer_dims=(8,), use_batch_norm=False,
                       dropout=0.0)
    context, examples = make_features()
    variables = scorer.init(
        {'params': jax.random.PRNGKey(0)}, context, examples, MASK)
    logits_a = scorer.apply(variables, context, examples, MASK)
    poisoned = {'feat': examples['feat'].at[0, 3].set(1e9)}
    logits_b = scorer.apply(variables, context, poisoned, MASK)
    np.testing.assert_allclose(
        np.asarray(logits_a)[MASK], np.asarray(logits_b)[MASK], rtol=1e-6)


class TestGroupwise:

  def test_rolling_indices(self):
    mask = jnp.array([[True, True, True, False]])
    indices, group_mask = groupwise.rolling_group_indices(mask, 2)
    np.testing.assert_array_equal(
        np.asarray(group_mask), [[True, True, True, False]])
    idx = np.asarray(indices)[0]
    # Valid items are 0, 1, 2; windows circular over them.
    np.testing.assert_array_equal(idx[0], [0, 1])
    np.testing.assert_array_equal(idx[1], [1, 2])
    np.testing.assert_array_equal(idx[2], [2, 0])

  def test_scatter_mean(self):
    scores = jnp.array([[[1.0, 2.0], [3.0, 4.0]]])
    indices = jnp.array([[[0, 1], [1, 0]]])
    group_mask = jnp.array([[True, True]])
    out = groupwise.scatter_group_scores(scores, indices, group_mask, 2)
    np.testing.assert_allclose(np.asarray(out), [[2.5, 2.5]])

  def test_groupwise_scorer_shapes(self):
    logits, _ = _run_scorer(GroupwiseDNNScorer(
        group_size=2, hidden_layer_dims=(8,)))
    assert logits.shape == (B, L)
    np.testing.assert_allclose(float(logits[1, 2]), np.log(1e-10), rtol=1e-6)

  def test_group_size_1_matches_univariate_structure(self):
    logits, _ = _run_scorer(GroupwiseDNNScorer(
        group_size=1, hidden_layer_dims=(8,), use_batch_norm=False,
        dropout=0.0))
    assert np.isfinite(np.asarray(logits)[MASK]).all()


class TestEmbeddings:

  def test_pooled_lookup_masks_padding(self):
    table = jnp.array([[1.0, 1.0], [2.0, 2.0], [4.0, 4.0]])
    ids = jnp.array([[0, 2, -1]])
    out = embeddings.pooled_lookup(table, ids, 'mean')
    np.testing.assert_allclose(np.asarray(out), [[2.5, 2.5]])
    out_sum = embeddings.pooled_lookup(table, ids, 'sum')
    np.testing.assert_allclose(np.asarray(out_sum), [[5.0, 5.0]])

  def test_encoder_module(self):
    enc = embeddings.EmbeddingEncoder(vocab_size=10, embedding_dim=4)
    ids = jnp.array([[[1, 2, -1], [3, -1, -1]]])  # [1, 2, 3]
    variables = enc.init(jax.random.PRNGKey(0), ids)
    out = enc.apply(variables, ids)
    assert out.shape == (1, 2, 4)

  def test_hash_encoder(self):
    enc = embeddings.HashEmbeddingEncoder(num_buckets=8, embedding_dim=4)
    ids = jnp.array([[100, 5, -1]])
    variables = enc.init(jax.random.PRNGKey(0), ids)
    out = enc.apply(variables, ids)
    assert out.shape == (1, 4)
    assert np.isfinite(np.asarray(out)).all()


class TestTraining:

  def test_dropout_and_bn_under_training(self):
    scorer = DNNScorer(hidden_layer_dims=(8,), dropout=0.5)
    context, examples = make_features()
    variables = scorer.init(
        {'params': jax.random.PRNGKey(0)}, context, examples, MASK,
        training=False)
    out, mutated = scorer.apply(
        variables, context, examples, MASK, training=True,
        rngs={'dropout': jax.random.PRNGKey(2)},
        mutable=['batch_stats'])
    assert out.shape == (B, L)
    assert 'batch_stats' in mutated

  def test_grads_flow_through_dnn(self):
    scorer = DNNScorer(hidden_layer_dims=(8,), use_batch_norm=False,
                       dropout=0.0)
    context, examples = make_features()
    variables = scorer.init(
        {'params': jax.random.PRNGKey(0)}, context, examples, MASK)

    def loss_fn(params):
      logits = scorer.apply({'params': params}, context, examples, MASK)
      return jnp.sum(jnp.where(MASK, logits, 0.0) ** 2)

    grads = jax.grad(loss_fn)(variables['params'])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in flat)


class TestGroupwiseShuffles:

  def test_num_shuffles_zero_raises(self):
    import pytest as _pytest
    with _pytest.raises(ValueError, match='num_shuffles'):
      _run_scorer(GroupwiseDNNScorer(group_size=2, hidden_layer_dims=(8,),
                                     num_shuffles=0, dropout=0.0,
                                     use_batch_norm=False))

  def test_training_shuffles_even_at_one_shuffle(self):
    """Reference semantics (model.py:313-339): any non-predict pass with
    group_size > 1 shuffles valid items — num_shuffles=1 included."""
    context, examples = make_features()
    scorer = GroupwiseDNNScorer(group_size=2, hidden_layer_dims=(8,),
                                num_shuffles=1, dropout=0.0,
                                use_batch_norm=False)
    variables = scorer.init({'params': jax.random.PRNGKey(0),
                             'shuffle': jax.random.PRNGKey(1)},
                            context, examples, MASK, training=False)
    out = []
    for seed in (1, 2):
      out.append(np.asarray(scorer.apply(
          variables, context, examples, MASK, training=True,
          rngs={'shuffle': jax.random.PRNGKey(seed)})))
    # Different shuffle keys -> different group compositions -> logits.
    assert not np.allclose(out[0][MASK], out[1][MASK])
    # Predict stays deterministic (original order, no rng needed).
    p1 = np.asarray(scorer.apply(variables, context, examples, MASK,
                                 training=False))
    p2 = np.asarray(scorer.apply(variables, context, examples, MASK,
                                 training=False))
    np.testing.assert_array_equal(p1, p2)


def test_gam_layer_context_weights_broadcast_over_list():
  """Public GAMLayer API: [B, L, .] example features with [B, F_c]
  context features (the documented shapes) — per-query weights must
  broadcast over the list axis, not misalign batch with list."""
  from ranking_tpu.models import layers as layers_lib
  gam = layers_lib.GAMLayer(
      example_feature_num=2, example_hidden_layer_dims=(4,),
      context_feature_num=1, context_hidden_layer_dims=(4,),
      use_batch_norm=False, dropout=0.0)
  rng = np.random.RandomState(0)
  ex = [jnp.asarray(rng.randn(3, 5, 2).astype(np.float32))
        for _ in range(2)]
  ctx = [jnp.asarray(rng.randn(3, 2).astype(np.float32))]
  variables = gam.init(jax.random.PRNGKey(0), ex, ctx)
  scores, sub = gam.apply(variables, ex, ctx)
  assert scores.shape == (3, 5, 1)
  assert sub.shape == (3, 5, 2)


def test_multi_task_scorer_single_task():
  """A one-task list must build (the 1-unit body returns [B, L])."""
  scorer = MultiTaskScorer(task_names=('click',),
                                  hidden_layer_dims=(4,),
                                  dropout=0.0, use_batch_norm=False)
  logits, _ = _run_scorer(scorer)
  assert set(logits) == {'click'}
  assert logits['click'].shape == (B, L)


def test_ranking_model_log1p_skips_integer_features():
  """transform_name='log1p' must leave token-id features intact so
  embedding lookups still work (the web30k dense transform + sparse
  tokens combo)."""
  model = RankingModel(
      scorer=EmbeddingDNNScorer(
          hidden_layer_dims=(4,), vocab_sizes={'tok': 10},
          embedding_dim=2, dropout=0.0, use_batch_norm=False),
      transform_name='log1p')
  rng = np.random.RandomState(0)
  examples = {'tok': jnp.asarray(rng.randint(-1, 10, size=(2, 3, 4)),
                                 jnp.int32),
              'dense': jnp.asarray(rng.randn(2, 3, 2).astype(np.float32))}
  mask = jnp.ones((2, 3), bool)
  variables = model.init(jax.random.PRNGKey(0), {}, examples, mask)
  out = model.apply(variables, {}, examples, mask)
  assert out.shape == (2, 3) and np.isfinite(np.asarray(out)).all()


def test_embedding_scorer_shared_vocab_context_and_examples():
  """A vocab feature name in BOTH context and examples shares one table."""
  scorer = EmbeddingDNNScorer(
      hidden_layer_dims=(4,), vocab_sizes={'tok': 12}, embedding_dim=2,
      dropout=0.0, use_batch_norm=False)
  rng = np.random.RandomState(1)
  ctx = {'tok': jnp.asarray(rng.randint(0, 12, size=(2, 3)), jnp.int32)}
  ex = {'tok': jnp.asarray(rng.randint(0, 12, size=(2, 3, 4)), jnp.int32)}
  mask = jnp.ones((2, 3), bool)
  variables = scorer.init(jax.random.PRNGKey(0), ctx, ex, mask)
  tables = [p for p in jax.tree_util.tree_flatten_with_path(variables)[0]
            if 'embed_tok' in '/'.join(str(getattr(q, 'key', q))
                                       for q in p[0])]
  assert len(tables) == 1  # one shared table, not two submodules
  out = scorer.apply(variables, ctx, ex, mask)
  assert out.shape == (2, 3)


def test_dnn_scorer_eval_padding_independent():
  """Eval-mode BN uses running averages (row-independent), so the scorer
  skips the circular-padding gather there — valid-row logits must be
  unaffected by whatever sits in the padded slots."""
  scorer = DNNScorer(hidden_layer_dims=(8, 4), use_batch_norm=True,
                     dropout=0.0)
  rng = np.random.RandomState(5)
  x = rng.randn(2, 4, 3).astype(np.float32)
  mask = jnp.asarray([[True, True, False, False], [True, True, True, True]])

  def run(pad_value):
    xs = x.copy()
    xs[0, 2:, :] = pad_value
    examples = {'f': jnp.asarray(xs)}
    variables = scorer.init(jax.random.PRNGKey(0), {}, examples, mask,
                            training=False)
    # One train step so running stats are non-initial, then eval.
    _, updated = scorer.apply(variables, {}, examples, mask, training=True,
                              mutable=['batch_stats'])
    variables = {**variables, **updated}
    return np.asarray(scorer.apply(variables, {}, examples, mask,
                                   training=False))

  a, b = run(0.0), run(1000.0)
  np.testing.assert_array_equal(a[np.asarray(mask)], b[np.asarray(mask)])


def test_gam_scorer_bn_stats_ignore_padding():
  """Padded-slot features must not leak into GAM tower BN statistics."""
  scorer = GAMScorer(example_hidden_layer_dims=(4,),
                            use_batch_norm=True, dropout=0.0)
  rng = np.random.RandomState(2)
  x = rng.randn(2, 3, 2).astype(np.float32)
  mask = jnp.asarray([[True, True, False], [True, True, True]])

  def run(pad_value):
    xs = x.copy()
    xs[0, 2, :] = pad_value
    examples = {'f': jnp.asarray(xs)}
    variables = scorer.init(jax.random.PRNGKey(0), {}, examples, mask,
                            training=False)
    out, _ = scorer.apply(variables, {}, examples, mask, training=True,
                          mutable=['batch_stats'],
                          rngs={'dropout': jax.random.PRNGKey(1)})
    return np.asarray(out)

  a, b = run(0.0), run(1000.0)
  np.testing.assert_allclose(a[np.asarray(mask)], b[np.asarray(mask)],
                             rtol=1e-5, atol=1e-6)
