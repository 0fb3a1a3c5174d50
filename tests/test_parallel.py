"""Mesh/sharding and sharded-embedding tests over 8 virtual CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ranking_tpu import parallel
from ranking_tpu.models import embeddings


def test_make_mesh_default_is_pure_data_parallel():
  mesh = parallel.make_mesh()
  assert mesh.shape['data'] == 8
  assert mesh.shape['model'] == 1


def test_make_mesh_2d():
  mesh = parallel.make_mesh(model=4)
  assert mesh.shape['data'] == 2
  assert mesh.shape['model'] == 4


def test_shard_batch_splits_leading_axis():
  mesh = parallel.make_mesh()
  x = np.arange(32, dtype=np.float32).reshape(16, 2)
  out = parallel.shard_batch({'x': x}, mesh)
  assert out['x'].sharding.spec == P('data')
  np.testing.assert_array_equal(np.asarray(out['x']), x)


def test_param_shardings_rules_and_min_size():
  mesh = parallel.make_mesh(model=4)
  params = {
      'encoder': {'embedding': jnp.zeros((64, 8))},
      'tower': {'dense_0': {'kernel': jnp.zeros((8, 4))}},
      # vocab 6 not divisible by model=4 -> falls back to replication
      'small': {'embedding': jnp.zeros((6, 8))},
  }
  sh = parallel.param_shardings(params, mesh)
  assert sh['encoder']['embedding'].spec == P('model', None)
  assert sh['tower']['dense_0']['kernel'].spec == P()
  assert sh['small']['embedding'].spec == P()


@pytest.mark.parametrize('combiner', ['mean', 'sum', 'sqrtn'])
def test_sharded_lookup_matches_replicated(combiner):
  mesh = parallel.make_mesh(model=4)
  rng = np.random.RandomState(0)
  table = jnp.asarray(rng.randn(32, 5).astype(np.float32))
  ids = jnp.asarray(
      rng.randint(-1, 32, size=(8, 3, 4)))  # leading axis divisible by data=2
  expected = embeddings.pooled_lookup(table, ids, combiner)
  got = parallel.sharded_pooled_lookup(table, ids, mesh, combiner)
  np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                             rtol=1e-5, atol=1e-5)


def test_sharded_lookup_all_padding_row():
  mesh = parallel.make_mesh(model=2)
  table = jnp.ones((8, 4))
  ids = jnp.full((4, 3), -1)
  out = parallel.sharded_pooled_lookup(table, ids, mesh, 'mean')
  np.testing.assert_allclose(np.asarray(out), 0.0)


def test_sharded_lookup_out_of_range_ids_match_take_clip():
  """Ids >= vocab must reproduce pooled_lookup's jnp.take clip semantics
  (clamp to the last row, still counted by the combiner) — the explicit
  path used to drop them silently, diverging from the automatic path
  (review finding, round 4)."""
  mesh = parallel.make_mesh(model=4)
  rng = np.random.RandomState(1)
  table = jnp.asarray(rng.randn(30, 5).astype(np.float32))  # pads to 32
  ids = jnp.asarray(rng.randint(-1, 40, size=(8, 3, 4)))  # some >= vocab
  assert int((np.asarray(ids) >= 30).sum()) > 0
  for combiner in ('mean', 'sum'):
    expected = embeddings.pooled_lookup(table, ids, combiner)
    got = parallel.sharded_pooled_lookup(table, ids, mesh, combiner)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_sharded_encoder_module_grad_flows():
  mesh = parallel.make_mesh(model=2)
  enc = parallel.ShardedEmbeddingEncoder(
      vocab_size=16, embedding_dim=4, mesh=mesh)
  ids = jnp.asarray(np.random.RandomState(1).randint(0, 16, size=(8, 5)))
  variables = enc.init(jax.random.PRNGKey(0), ids)

  def loss(v):
    return jnp.sum(enc.apply(v, ids) ** 2)

  g = jax.grad(loss)(variables)
  table_grad = g['params']['embedding']
  assert table_grad.shape == (16, 4)
  assert float(jnp.sum(jnp.abs(table_grad))) > 0


def test_sharded_pairwise_loss_matches_single_device():
  import jax.numpy as jnp
  from ranking_tpu.ops import losses as jl
  from ranking_tpu.ops.reductions import Reduction
  from ranking_tpu.parallel import list_sharding

  mesh = parallel.make_mesh(model=4)
  rng = np.random.RandomState(0)
  b, l = 4, 16
  logits = jnp.asarray(rng.randn(b, l).astype(np.float32))
  labels = rng.randint(0, 4, size=(b, l)).astype(np.float32)
  labels[:, -3:] = -1.0
  labels = jnp.asarray(labels)
  weights = jnp.asarray(rng.rand(b, l).astype(np.float32) + 0.1)

  for kind, cls in [('logistic', jl.PairwiseLogisticLoss),
                    ('hinge', jl.PairwiseHingeLoss)]:
    for reduction in (Reduction.SUM, Reduction.MEAN,
                      Reduction.SUM_BY_NONZERO_WEIGHTS):
      expected = float(cls()(labels, logits, weights=weights,
                             reduction=reduction))
      got = float(list_sharding.sharded_pairwise_loss(
          labels, logits, mesh, axis='model', loss_kind=kind,
          weights=weights, reduction=reduction))
      np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6,
                                 err_msg=f'{kind}/{reduction}')


def test_sharded_pairwise_loss_grads_match():
  import jax.numpy as jnp
  from ranking_tpu.ops import losses as jl
  from ranking_tpu.parallel import list_sharding

  mesh = parallel.make_mesh(model=2)
  rng = np.random.RandomState(1)
  b, l = 3, 8
  logits = jnp.asarray(rng.randn(b, l).astype(np.float32))
  labels = jnp.asarray(rng.randint(0, 3, size=(b, l)).astype(np.float32))

  g_ref = jax.grad(lambda s: jl.PairwiseLogisticLoss()(labels, s))(logits)
  g_sh = jax.grad(lambda s: list_sharding.sharded_pairwise_loss(
      labels, s, mesh, axis='model'))(logits)
  np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                             rtol=1e-4, atol=1e-6)


def test_sharded_embedding_arbitrary_vocab():
  """Vocab sizes that don't divide the model axis are zero-padded to a
  shard multiple (MinSizePartitioner analog, strategy_utils.py:104-113)."""
  import jax
  import jax.numpy as jnp
  from ranking_tpu.models import embeddings as emb_lib
  from ranking_tpu.parallel import embedding as sharded_emb

  mesh = parallel.make_mesh(model=4)
  rng = np.random.RandomState(5)
  vocab, dim = 13, 6  # 13 % 4 != 0
  table = jnp.asarray(rng.randn(vocab, dim).astype(np.float32))
  ids = jnp.asarray(rng.randint(-1, vocab, size=(8, 5, 7)), jnp.int32)

  for combiner in ('mean', 'sum', 'sqrtn'):
    expected = emb_lib.pooled_lookup(table, ids, combiner=combiner)
    got = sharded_emb.sharded_pooled_lookup(table, ids, mesh,
                                            combiner=combiner)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-6, err_msg=combiner)

  # Encoder path: padded param rows exist but lookups reproduce the
  # unsharded encoder on the non-padded vocabulary.
  enc = sharded_emb.ShardedEmbeddingEncoder(
      vocab_size=vocab, embedding_dim=dim, mesh=mesh)
  variables = enc.init(jax.random.PRNGKey(0), ids)
  assert variables['params']['embedding'].shape == (16, dim)
  out = enc.apply(variables, ids)
  ref = emb_lib.pooled_lookup(
      variables['params']['embedding'][:16], ids, combiner='mean')
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=1e-5, atol=1e-6)


def test_sharded_pairwise_loss_data_axis():
  """2-D sharding: batch over 'data' AND list over 'model' simultaneously
  matches the single-device loss."""
  import jax.numpy as jnp
  from ranking_tpu.ops import losses as jl
  from ranking_tpu.ops.reductions import Reduction
  from ranking_tpu.parallel import list_sharding

  mesh = parallel.make_mesh(data=2, model=4)
  rng = np.random.RandomState(2)
  b, l = 4, 8
  logits = jnp.asarray(rng.randn(b, l).astype(np.float32))
  labels = rng.randint(0, 4, size=(b, l)).astype(np.float32)
  labels[:, -2:] = -1.0
  labels = jnp.asarray(labels)
  for reduction in (Reduction.SUM, Reduction.MEAN,
                    Reduction.SUM_BY_NONZERO_WEIGHTS):
    expected = float(jl.PairwiseLogisticLoss()(labels, logits,
                                               reduction=reduction))
    got = float(list_sharding.sharded_pairwise_loss(
        labels, logits, mesh, axis='model', data_axis='data',
        reduction=reduction))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6,
                               err_msg=str(reduction))


def test_encoder_tp_rules_specs():
  """ENCODER_TP_RULES shard attention heads / MLP Megatron-style."""
  import optax
  from ranking_tpu import models, train
  from ranking_tpu.data.batch import batch_from_labels
  from ranking_tpu.models import encoder as enc

  mesh = parallel.make_mesh(model=2)
  model = models.RankingModel(scorer=enc.EncoderScorer(
      encoder=enc.TransformerEncoder(vocab_size=48, hidden_dim=16,
                                     num_layers=1, num_heads=4, mlp_dim=32,
                                     max_len=8, dropout=0.0),
      dropout=0.0))
  rng = np.random.RandomState(0)
  batch = batch_from_labels(
      labels=rng.randint(0, 3, size=(8, 3)).astype(np.float32),
      examples={'input_ids': rng.randint(0, 48, size=(8, 3, 8))
                .astype(np.int32)})
  state = train.create_train_state(
      model, optax.adam(1e-2), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask)
  sh = parallel.param_shardings(state.params, mesh,
                                rules=parallel.ENCODER_TP_RULES)
  p = sh['scorer']['encoder']
  blk = p['block_0']['MultiHeadDotProductAttention_0']
  assert blk['query']['kernel'].spec == P(None, 'model', None)
  assert blk['query']['bias'].spec == P('model', None)
  assert blk['out']['kernel'].spec == P('model', None, None)
  assert p['block_0']['Dense_0']['kernel'].spec == P(None, 'model')
  assert p['block_0']['Dense_0']['bias'].spec == P('model')
  assert p['block_0']['Dense_1']['kernel'].spec == P('model', None)
  assert p['token_embed']['embedding'].spec == P('model', None)
  assert p['pooler']['kernel'].spec == P()


def test_encoder_tp_train_step_matches_replicated():
  """One TP+DP train step on the encoder scorer == single-device step."""
  import optax
  from ranking_tpu import models, ops, train
  from ranking_tpu.data.batch import batch_from_labels
  from ranking_tpu.models import encoder as enc

  def build():
    model = models.RankingModel(scorer=enc.EncoderScorer(
        encoder=enc.TransformerEncoder(vocab_size=48, hidden_dim=16,
                                       num_layers=2, num_heads=4,
                                       mlp_dim=32, max_len=8, dropout=0.0),
        dropout=0.0))
    return train.create_train_state(
        model, optax.adam(1e-2), jax.random.PRNGKey(0),
        batch.context, batch.examples, batch.mask)

  rng = np.random.RandomState(1)
  labels = rng.randint(0, 3, size=(8, 3)).astype(np.float32)
  labels[:, -1] = -1.0
  batch = batch_from_labels(
      labels=labels,
      examples={'input_ids': rng.randint(0, 48, size=(8, 3, 8))
                .astype(np.int32)})
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)
  step = jax.jit(train.make_train_step(loss_fn))
  key = jax.random.PRNGKey(2)

  ref_state, ref_metrics = step(build(), batch, key)

  mesh = parallel.make_mesh(model=2)  # 4-way data x 2-way tensor parallel
  state = build()
  state = state.replace(
      params=parallel.shard_params(state.params, mesh,
                                   rules=parallel.ENCODER_TP_RULES),
      opt_state=parallel.shard_params(state.opt_state, mesh,
                                      rules=parallel.ENCODER_TP_RULES))
  tp_state, tp_metrics = step(state, parallel.shard_batch(batch, mesh), key)

  np.testing.assert_allclose(float(tp_metrics['loss']),
                             float(ref_metrics['loss']),
                             rtol=1e-5, atol=1e-6)
  # Attention logits are invariant to the key-projection bias (softmax over
  # keys removes a per-query constant), so its true gradient is exactly 0
  # and Adam's g/(|g|+eps) amplifies reduction-order float noise into
  # arbitrary updates — skip that one degenerate leaf.
  ref_leaves = jax.tree_util.tree_flatten_with_path(ref_state.params)[0]
  tp_leaves = jax.tree_util.tree_flatten_with_path(tp_state.params)[0]
  for (path, a), (_, b) in zip(ref_leaves, tp_leaves):
    name = '/'.join(str(getattr(p, 'key', p)) for p in path)
    if name.endswith('key/bias'):
      continue
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-5, err_msg=name)
