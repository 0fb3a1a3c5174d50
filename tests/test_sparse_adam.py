"""LazyAdam (train/sparse.py): lazy-row semantics, Adam math parity, and
train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ranking_tpu import models, ops, train
from ranking_tpu.data.batch import batch_from_labels
from ranking_tpu.train import sparse as sparse_lib


def _reference_lazy_adam(g, p, m, v, t, lr=1e-3, b1=0.9, b2=0.999,
                         eps=1e-8):
  """Row-by-row numpy oracle: Adam on touched rows, frozen elsewhere."""
  p, m, v = p.copy(), m.copy(), v.copy()
  for r in range(p.shape[0]):
    if np.abs(g[r]).sum() > 0:
      m[r] = b1 * m[r] + (1 - b1) * g[r]
      v[r] = b2 * v[r] + (1 - b2) * g[r] ** 2
      mhat = m[r] / (1 - b1 ** t)
      vhat = v[r] / (1 - b2 ** t)
      p[r] = p[r] - lr * mhat / (np.sqrt(vhat) + eps)
  return p, m, v


def _run_spec_steps(spec, grads_per_step, p0):
  params = {'embedding': jnp.asarray(p0)}
  state = spec.init(params)
  for g in grads_per_step:
    new_params, state = jax.jit(spec.update)(
        {'embedding': jnp.asarray(g)}, state, params)
    params = new_params
  return (np.asarray(params['embedding']),
          np.asarray(state['embedding']['m']),
          np.asarray(state['embedding']['v']))


def test_lazy_adam_matches_rowwise_oracle_multistep():
  rng = np.random.RandomState(0)
  vocab, dim = 50, 8
  p0 = rng.randn(vocab, dim).astype(np.float32)
  grads = []
  for _ in range(4):
    g = np.zeros((vocab, dim), np.float32)
    touched = rng.choice(vocab, size=7, replace=False)
    g[touched] = rng.randn(7, dim)
    grads.append(g)

  spec = train.LazyAdam(learning_rate=1e-2, max_rows=16)
  p, m, v = _run_spec_steps(spec, grads, p0)

  ep, em, ev = p0.copy(), np.zeros_like(p0), np.zeros_like(p0)
  for t, g in enumerate(grads, start=1):
    ep, em, ev = _reference_lazy_adam(g, ep, em, ev, t, lr=1e-2)
  np.testing.assert_allclose(p, ep, rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(m, em, rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(v, ev, rtol=1e-5, atol=1e-7)


def test_untouched_rows_bitwise_frozen():
  rng = np.random.RandomState(1)
  p0 = rng.randn(30, 4).astype(np.float32)
  g = np.zeros((30, 4), np.float32)
  g[[3, 17]] = 1.0
  spec = train.LazyAdam(max_rows=8)
  p, m, v = _run_spec_steps(spec, [g], p0)
  untouched = [i for i in range(30) if i not in (3, 17)]
  np.testing.assert_array_equal(p[untouched], p0[untouched])
  np.testing.assert_array_equal(m[untouched], 0.0)
  np.testing.assert_array_equal(v[untouched], 0.0)
  assert not np.allclose(p[[3, 17]], p0[[3, 17]])


def test_overflow_drops_excess_rows_and_counts_them():
  rng = np.random.RandomState(2)
  vocab, dim = 40, 4
  p0 = rng.randn(vocab, dim).astype(np.float32)
  g = rng.randn(vocab, dim).astype(np.float32)  # every row touched
  g[5] = 0.0                                    # except one

  spec = train.LazyAdam(max_rows=4)  # bound too small: 39 touched rows
  params = {'embedding': jnp.asarray(p0)}
  state = spec.init(params)
  new_params, state = jax.jit(spec.update)(
      {'embedding': jnp.asarray(g)}, state, params)
  # First 4 touched rows (by row id) updated; the rest dropped + counted.
  p = np.asarray(new_params['embedding'])
  assert int(state['dropped']) == 35
  updated = [0, 1, 2, 3]
  assert not np.allclose(p[updated], p0[updated])
  np.testing.assert_array_equal(p[6:], p0[6:])
  np.testing.assert_array_equal(p[5], p0[5])

  # With a correct bound nothing is dropped.
  ok = train.LazyAdam(max_rows=vocab)
  state_ok = ok.init(params)
  _, state_ok = jax.jit(ok.update)(
      {'embedding': jnp.asarray(g)}, state_ok, params)
  assert int(state_ok['dropped']) == 0


def test_all_rows_touched_matches_optax_adam():
  rng = np.random.RandomState(3)
  vocab, dim = 12, 6
  p0 = rng.randn(vocab, dim).astype(np.float32)
  grads = [rng.randn(vocab, dim).astype(np.float32) for _ in range(3)]

  spec = train.LazyAdam(learning_rate=3e-3, max_rows=vocab)
  p, _, _ = _run_spec_steps(spec, grads, p0)

  tx = optax.adam(3e-3)
  op = {'w': jnp.asarray(p0)}
  ostate = tx.init(op)
  for g in grads:
    updates, ostate = tx.update({'w': jnp.asarray(g)}, ostate, op)
    op = optax.apply_updates(op, updates)
  np.testing.assert_allclose(p, np.asarray(op['w']), rtol=1e-5, atol=1e-6)


def test_schedule_learning_rate():
  p0 = np.ones((4, 2), np.float32)
  g = np.ones((4, 2), np.float32)
  # Schedules receive the 0-based pre-increment count (optax convention).
  spec = train.LazyAdam(learning_rate=lambda count: 0.1 / (count + 1),
                        max_rows=4)
  p, _, _ = _run_spec_steps(spec, [g, g], p0)
  # Step sizes ~0.1 then ~0.05 (Adam-normalized |update| = lr).
  assert p0[0, 0] - p[0, 0] == pytest.approx(0.15, rel=0.05)


def test_schedule_matches_optax_adam_trajectory():
  """One schedule shared between optax.adam and LazyAdam steps
  identically — schedules see the same (0-based) count on both sides."""
  rng = np.random.RandomState(7)
  vocab, dim = 6, 4
  p0 = rng.randn(vocab, dim).astype(np.float32)
  grads = [rng.randn(vocab, dim).astype(np.float32) for _ in range(3)]
  sched = lambda count: 0.05 / (1.0 + 0.5 * count)

  spec = train.LazyAdam(learning_rate=sched, max_rows=vocab)
  p, _, _ = _run_spec_steps(spec, grads, p0)

  tx = optax.adam(sched)
  op = {'w': jnp.asarray(p0)}
  ostate = tx.init(op)
  for g in grads:
    updates, ostate = tx.update({'w': jnp.asarray(g)}, ostate, op)
    op = optax.apply_updates(op, updates)
  np.testing.assert_allclose(p, np.asarray(op['w']), rtol=1e-5, atol=1e-6)


def test_partition_and_merge_roundtrip():
  params = {'scorer': {'embed_q': {'embedding': jnp.ones((5, 3))},
                       'tower': {'dense': {'kernel': jnp.zeros((3, 2))}}}}
  spec = train.LazyAdam()
  dense, sp = sparse_lib.partition(params, spec)
  assert list(sp) == ['scorer/embed_q/embedding']
  assert dense['scorer']['embed_q']['embedding'] is None
  rebuilt = sparse_lib.merge(params, dense, sp)
  assert jax.tree_util.tree_structure(rebuilt) == (
      jax.tree_util.tree_structure(params))


def _embedding_batch(rng, batch=4, lists=6, tokens=3):
  labels = rng.randint(0, 3, size=(batch, lists)).astype(np.float32)
  examples = {
      'document_tokens': rng.randint(
          0, 64, size=(batch, lists, tokens)).astype(np.int32)}
  context = {'query_tokens': rng.randint(
      0, 64, size=(batch, tokens)).astype(np.int32)}
  return batch_from_labels(labels=labels, examples=examples,
                           context=context)


def _embedding_model():
  return models.RankingModel(scorer=models.EmbeddingDNNScorer(
      hidden_layer_dims=(8,),
      vocab_sizes={'query_tokens': 64, 'document_tokens': 64},
      embedding_dim=4, dropout=0.0, use_batch_norm=False))


def test_train_step_with_lazy_adam_learns_and_freezes_untouched():
  rng = np.random.RandomState(0)
  batch = _embedding_batch(rng)
  model = _embedding_model()
  spec = train.LazyAdam(learning_rate=1e-2, max_rows=32)
  state = train.create_train_state(
      model, optax.adam(1e-2), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask, sparse_tx=spec)
  tables0 = {p: np.asarray(x) for p, x in sparse_lib.partition(
      state.params, spec)[1].items()}
  assert tables0, 'model should expose embedding tables to the sparse path'

  step = jax.jit(train.make_train_step(
      ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)))
  losses = []
  for i in range(10):
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    losses.append(float(metrics['loss']))
  assert losses[-1] < losses[0]

  # Ids never seen in the batch keep their init rows bitwise.
  seen = set(np.unique(batch.examples['document_tokens'])) | set(
      np.unique(batch.context['query_tokens']))
  unseen = [i for i in range(64) if i not in seen]
  assert unseen
  tables1 = sparse_lib.partition(state.params, spec)[1]
  for path, t0 in tables0.items():
    t1 = np.asarray(tables1[path])
    np.testing.assert_array_equal(t1[unseen], t0[unseen])
    assert not np.array_equal(t1, t0)


def test_train_step_lazy_vs_dense_tx_same_loss_trajectory_when_all_touched():
  # With every vocab row touched each step, LazyAdam == optax.adam, so the
  # two TrainStates must produce identical loss curves.
  rng = np.random.RandomState(4)
  batch = _embedding_batch(rng)
  # Make every id appear: tile the full vocab through the token features.
  all_ids = np.arange(64, dtype=np.int32)
  docs = np.resize(all_ids, batch.examples['document_tokens'].shape)
  batch = batch_from_labels(
      labels=np.asarray(batch.labels),
      examples={'document_tokens': docs},
      context={'query_tokens': np.resize(
          all_ids, batch.context['query_tokens'].shape)})
  model = _embedding_model()
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)

  lazy_state = train.create_train_state(
      model, optax.adam(1e-2), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask,
      sparse_tx=train.LazyAdam(learning_rate=1e-2, max_rows=64))
  dense_state = train.create_train_state(
      model, optax.adam(1e-2), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask)
  step = jax.jit(train.make_train_step(loss_fn))
  for i in range(5):
    lazy_state, lm = step(lazy_state, batch, jax.random.PRNGKey(2))
    dense_state, dm = step(dense_state, batch, jax.random.PRNGKey(2))
    assert float(lm['loss']) == pytest.approx(float(dm['loss']), rel=1e-4)


def test_checkpoint_roundtrip_with_sparse_state(tmp_path):
  rng = np.random.RandomState(5)
  batch = _embedding_batch(rng)
  model = _embedding_model()
  spec = train.LazyAdam(learning_rate=1e-2)
  state = train.create_train_state(
      model, optax.adam(1e-2), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask, sparse_tx=spec)
  step = jax.jit(train.make_train_step(
      ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)))
  state, _ = step(state, batch, jax.random.PRNGKey(1))

  mgr = train.CheckpointManager(str(tmp_path / 'ckpt'))
  mgr.save(state)
  mgr.wait()
  restored = mgr.restore(train.create_train_state(
      model, optax.adam(1e-2), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask, sparse_tx=spec))
  jax.tree.map(np.testing.assert_array_equal,
               jax.tree.leaves(state.params),
               jax.tree.leaves(restored.params))
  jax.tree.map(np.testing.assert_array_equal,
               jax.tree.leaves(state.sparse_opt_state),
               jax.tree.leaves(restored.sparse_opt_state))


def test_simple_pipeline_with_lazy_adam(tmp_path):
  """optimizer='lazy_adam' end to end: embedding model on bundled ELWC
  data, 8-virtual-device mesh, loss improves and tables move."""
  from ranking_tpu import pipeline
  from ranking_tpu.data import FixedLenFeature, VarLenFeature

  ref_data = '/root/reference/tensorflow_ranking/examples/data'
  context_spec = {'query_tokens': VarLenFeature(
      dtype='string', max_len=6, hash_buckets=100)}
  example_spec = {
      'document_tokens': VarLenFeature(dtype='string', max_len=20,
                                       hash_buckets=100),
      'relevance': FixedLenFeature(shape=(), dtype='int64',
                                   default_value=0)}
  model = models.RankingModel(scorer=models.EmbeddingDNNScorer(
      hidden_layer_dims=(16, 8),
      vocab_sizes={'query_tokens': 100, 'document_tokens': 100},
      embedding_dim=4, dropout=0.0, use_batch_norm=False))
  builder = pipeline.SimpleDatasetBuilder(
      context_spec, example_spec,
      pipeline.DatasetHparams(
          train_input_pattern=f'{ref_data}/train_elwc.tfrecord',
          valid_input_pattern=f'{ref_data}/eval_elwc.tfrecord',
          train_batch_size=4, valid_batch_size=4, list_size=5,
          shuffle_buffer_size=10))
  hp = pipeline.PipelineHparams(
      model_dir=str(tmp_path / 'model'), num_epochs=2, steps_per_epoch=3,
      validation_steps=2, learning_rate=0.05,
      loss=ops.RankingLossKey.SOFTMAX_LOSS, optimizer='lazy_adam')
  pipe = pipeline.SimplePipeline(model, builder, hp)
  pipe.train_and_validate()
  state = pipe.final_state
  assert state.sparse_tx is not None
  tables = sparse_lib.partition(state.params, state.sparse_tx)[1]
  assert len(tables) == 2
  assert int(state.step) == 6


def test_lazy_adam_rejects_reduce_lr(tmp_path):
  from ranking_tpu import pipeline
  hp = pipeline.PipelineHparams(
      model_dir=str(tmp_path), num_epochs=1, steps_per_epoch=1,
      validation_steps=1, learning_rate=0.05, loss='softmax_loss',
      optimizer='lazy_adam', automatic_reduce_lr=True)
  with pytest.raises(ValueError):
    pipeline.hparams_lib.sparse_optimizer_from_hparams(hp)


def test_lazy_adagrad_matches_optax_trajectory():
  """All rows touched: LazyAdagrad == optax.adagrad exactly."""
  rng = np.random.RandomState(11)
  vocab, dim = 10, 4
  p0 = rng.randn(vocab, dim).astype(np.float32)
  grads = [rng.randn(vocab, dim).astype(np.float32) for _ in range(3)]

  spec = train.LazyAdagrad(learning_rate=0.05, max_rows=vocab)
  p = {'embedding': jnp.asarray(p0)}
  state = spec.init(p)
  for g in grads:
    newp, state = jax.jit(spec.update)({'embedding': jnp.asarray(g)},
                                       state, p)
    p = newp

  tx = optax.adagrad(0.05)
  op = {'w': jnp.asarray(p0)}
  ostate = tx.init(op)
  for g in grads:
    updates, ostate = tx.update({'w': jnp.asarray(g)}, ostate, op)
    op = optax.apply_updates(op, updates)
  np.testing.assert_allclose(np.asarray(p['embedding']),
                             np.asarray(op['w']), rtol=1e-5, atol=1e-6)


def test_lazy_adagrad_untouched_rows_stay():
  spec = train.LazyAdagrad(learning_rate=0.1, max_rows=4)
  p0 = np.ones((6, 3), np.float32)
  g = np.zeros((6, 3), np.float32)
  g[2] = 1.0
  p = {'embedding': jnp.asarray(p0)}
  state = spec.init(p)
  newp, state = jax.jit(spec.update)({'embedding': jnp.asarray(g)}, state, p)
  out = np.asarray(newp['embedding'])
  np.testing.assert_array_equal(out[[0, 1, 3, 4, 5]], p0[[0, 1, 3, 4, 5]])
  assert (out[2] < 1.0).all()
  acc = np.asarray(state['embedding']['acc'])
  np.testing.assert_allclose(acc[2], 0.1 + 1.0)  # accumulator updated
  np.testing.assert_allclose(acc[0], 0.1)        # untouched keeps init


def test_lazy_adagrad_zero_accumulator_matches_optax():
  """initial_accumulator_value=0: optax's where(acc>0, rsqrt(acc+eps), 0)
  form — eps must not turn a tiny first gradient into a huge step."""
  p0 = np.ones((2, 3), np.float32)
  g = np.full((2, 3), 1e-5, np.float32)
  spec = train.LazyAdagrad(learning_rate=1.0,
                           initial_accumulator_value=0.0, max_rows=2)
  p = {'embedding': jnp.asarray(p0)}
  state = spec.init(p)
  p, state = jax.jit(spec.update)({'embedding': jnp.asarray(g)}, state, p)

  tx = optax.adagrad(1.0, initial_accumulator_value=0.0)
  op = {'w': jnp.asarray(p0)}
  ostate = tx.init(op)
  updates, _ = tx.update({'w': jnp.asarray(g)}, ostate, op)
  op = optax.apply_updates(op, updates)
  np.testing.assert_allclose(np.asarray(p['embedding']),
                             np.asarray(op['w']), rtol=1e-6, atol=1e-7)
