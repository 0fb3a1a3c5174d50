"""Sparse train step (train/steps.py make_sparse_train_step): the
vocab-independent embedding path. Ground truth is the dense-grad LazyAdam
step, which these tests require it to match bitwise."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ranking_tpu import models, ops, train
from ranking_tpu.data.batch import batch_from_labels
from ranking_tpu.train import sparse as sparse_lib


# ---------------------------------------------------------------- unique


def _np_unique_oracle(flat):
  valid = flat >= 0
  uids = np.unique(flat[valid])
  slot = {int(u): i for i, u in enumerate(uids)}
  remap = np.array([slot[int(x)] if x >= 0 else int(x) for x in flat],
                   np.int32)
  return uids, remap


@pytest.mark.parametrize('seed,n,vocab,pad_frac', [
    (0, 64, 10, 0.2), (1, 128, 1000, 0.0), (2, 37, 5, 0.5), (3, 16, 1, 0.3),
])
def test_compact_unique_matches_numpy(seed, n, vocab, pad_frac):
  rng = np.random.RandomState(seed)
  flat = rng.randint(0, vocab, size=n).astype(np.int32)
  flat[rng.rand(n) < pad_frac] = -1
  uids, remap, filled = jax.jit(sparse_lib.compact_unique)(jnp.asarray(flat))
  uids, remap, filled = map(np.asarray, (uids, remap, filled))
  exp_uids, exp_remap = _np_unique_oracle(flat)
  k = len(exp_uids)
  assert filled.sum() == k
  np.testing.assert_array_equal(filled[:k], True)
  np.testing.assert_array_equal(uids[:k], exp_uids)
  np.testing.assert_array_equal(remap, exp_remap)
  # Round trip: every valid position's id is recoverable from its slot.
  valid = flat >= 0
  np.testing.assert_array_equal(uids[remap[valid]], flat[valid])


@pytest.mark.parametrize('seed,n,vocab,pad_frac', [
    (0, 64, 10, 0.2), (1, 256, 7, 0.0), (2, 37, 5, 0.5), (3, 16, 1, 0.3),
    (4, 128, 100000, 0.1), (5, 8, 3, 1.0),
])
def test_compact_unique_bitwise_equals_scatter_reference(
    seed, n, vocab, pad_frac):
  """The sort-based hot path must be bitwise identical to the scatter
  formulation it replaced (incl. heavy duplication and all-padding)."""
  rng = np.random.RandomState(seed)
  flat = rng.randint(0, vocab, size=n).astype(np.int32)
  pad = rng.rand(n) < pad_frac
  flat[pad] = -rng.randint(1, 5, size=n)[pad]
  got = jax.jit(sparse_lib.compact_unique)(jnp.asarray(flat))
  want = jax.jit(sparse_lib._compact_unique_reference)(jnp.asarray(flat))
  for g, w, name in zip(got, want, ('uids', 'remap', 'filled')):
    np.testing.assert_array_equal(np.asarray(g), np.asarray(w), err_msg=name)


def test_compact_unique_all_padding():
  uids, remap, filled = jax.jit(sparse_lib.compact_unique)(
      jnp.full((8,), -1, jnp.int32))
  assert int(np.sum(np.asarray(filled))) == 0
  np.testing.assert_array_equal(np.asarray(remap), -1)


# ------------------------------------------------------------ step parity


def _embedding_batch(rng, batch=4, lists=6, tokens=3, vocab=64):
  labels = rng.randint(0, 3, size=(batch, lists)).astype(np.float32)
  labels[0, -2:] = -1.0  # padded docs
  docs = rng.randint(-1, vocab, size=(batch, lists, tokens)).astype(np.int32)
  ctx = rng.randint(0, vocab, size=(batch, tokens)).astype(np.int32)
  return batch_from_labels(labels=labels,
                           examples={'document_tokens': docs},
                           context={'query_tokens': ctx})


def _embedding_model(vocab=64):
  return models.RankingModel(scorer=models.EmbeddingDNNScorer(
      hidden_layer_dims=(8,),
      vocab_sizes={'query_tokens': vocab, 'document_tokens': vocab},
      embedding_dim=4, dropout=0.0, use_batch_norm=False))


def _mkstate(model, batch, lr=1e-2):
  return train.create_train_state(
      model, optax.adam(lr), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask,
      sparse_tx=train.LazyAdam(learning_rate=lr, max_rows=256))


def test_sparse_step_matches_dense_lazy_step_bitwise():
  rng = np.random.RandomState(0)
  model = _embedding_model()
  batches = [_embedding_batch(rng) for _ in range(4)]
  dense_state = _mkstate(model, batches[0])
  sparse_state = _mkstate(model, batches[0])
  efs = sparse_lib.derive_embed_features(
      sparse_state.params, batches[0].context, batches[0].examples)
  assert {ef.param_path for ef in efs} == {
      'scorer/embed_document_tokens/embedding',
      'scorer/embed_query_tokens/embedding'}
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)
  dstep = jax.jit(train.make_train_step(loss_fn))
  sstep = jax.jit(train.make_sparse_train_step(loss_fn, efs))
  for i, batch in enumerate(batches):
    dense_state, dm = dstep(dense_state, batch, jax.random.PRNGKey(7))
    sparse_state, sm = sstep(sparse_state, batch, jax.random.PRNGKey(7))
    assert float(dm['loss']) == float(sm['loss'])
  jax.tree.map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      dense_state.params, sparse_state.params)
  jax.tree.map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      dense_state.sparse_opt_state, sparse_state.sparse_opt_state)


def test_sparse_step_pairwise_loss_and_weights_feature():
  # A pairwise loss with a weights feature exercises batch2.features
  # (remapped ids must not disturb weight lookup).
  rng = np.random.RandomState(1)
  model = _embedding_model()
  batch = _embedding_batch(rng)
  batch = dataclasses.replace(
      batch, examples={**batch.examples,
                       'doc_weight': np.abs(
                           rng.rand(4, 6).astype(np.float32))})
  dense_state = _mkstate(model, batch)
  sparse_state = _mkstate(model, batch)
  efs = sparse_lib.derive_embed_features(
      sparse_state.params, batch.context, batch.examples)
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.PAIRWISE_LOGISTIC_LOSS,
                             weights_feature_name='doc_weight')
  dstep = jax.jit(train.make_train_step(loss_fn))
  sstep = jax.jit(train.make_sparse_train_step(loss_fn, efs))
  for _ in range(3):
    dense_state, dm = dstep(dense_state, batch, jax.random.PRNGKey(3))
    sparse_state, sm = sstep(sparse_state, batch, jax.random.PRNGKey(3))
    assert float(dm['loss']) == float(sm['loss'])
  jax.tree.map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      dense_state.params, sparse_state.params)


def test_sparse_step_hash_encoder_num_buckets():
  """HashEmbeddingEncoder path: ids pre-hashed outside, slots inside."""

  class HashScorer(models.scorers.nn.Module):  # type: ignore[name-defined]

    @models.scorers.nn.compact
    def __call__(self, context, examples, mask, training=False):
      from ranking_tpu.models import embeddings as emb_lib
      emb = emb_lib.HashEmbeddingEncoder(
          num_buckets=16, embedding_dim=4, name='embed_document_tokens')(
              examples['document_tokens'])
      return models.DNNScorer(hidden_layer_dims=(8,), dropout=0.0,
                              use_batch_norm=False, name='dnn')(
          {}, {'emb': emb}, mask, training=training)

  rng = np.random.RandomState(2)
  labels = rng.randint(0, 3, size=(4, 6)).astype(np.float32)
  docs = rng.randint(-1, 200, size=(4, 6, 3)).astype(np.int32)  # > buckets
  batch = batch_from_labels(labels=labels,
                            examples={'document_tokens': docs})
  model = models.RankingModel(scorer=HashScorer())
  dense_state = _mkstate(model, batch)
  sparse_state = _mkstate(model, batch)
  efs = (sparse_lib.EmbedFeature(
      param_path='scorer/embed_document_tokens/embedding',
      feature='document_tokens', source='examples', num_buckets=16),)
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)
  dstep = jax.jit(train.make_train_step(loss_fn))
  sstep = jax.jit(train.make_sparse_train_step(loss_fn, efs))
  for _ in range(3):
    dense_state, dm = dstep(dense_state, batch, jax.random.PRNGKey(5))
    sparse_state, sm = sstep(sparse_state, batch, jax.random.PRNGKey(5))
    assert float(dm['loss']) == float(sm['loss'])
  jax.tree.map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      dense_state.params, sparse_state.params)


def test_uncovered_table_raises():
  rng = np.random.RandomState(3)
  model = _embedding_model()
  batch = _embedding_batch(rng)
  state = _mkstate(model, batch)
  efs = sparse_lib.derive_embed_features(
      state.params, batch.context, batch.examples)[:1]  # drop one table
  step = train.make_sparse_train_step(
      ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS), efs)
  with pytest.raises(ValueError, match='no declared id feature'):
    step(state, batch, jax.random.PRNGKey(0))


def test_pipeline_auto_selects_sparse_step(tmp_path):
  """optimizer='lazy_adam' + EmbeddingDNNScorer => the pipeline derives the
  id features and runs the sparse step end to end."""
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
  assert int(state.step) == 6
  tables = sparse_lib.partition(state.params, state.sparse_tx)[1]
  assert len(tables) == 2


def test_sparse_step_sharded_tables_match_dense_lazy():
  """Row-sharded tables (mesh model axis): the sparse step must produce
  the same training trajectory as the dense-grad LazyAdam path, with the
  sharded encoder's lookup redirected onto the gathered row slab."""
  from ranking_tpu import parallel

  mesh = parallel.make_mesh(model=2)
  vocab = 63  # odd on purpose: table pads itself to the model axis
  model = models.RankingModel(scorer=models.EmbeddingDNNScorer(
      hidden_layer_dims=(8,),
      vocab_sizes={'query_tokens': vocab, 'document_tokens': vocab},
      embedding_dim=4, mesh=mesh, dropout=0.0, use_batch_norm=False))
  rng = np.random.RandomState(7)
  batch = _embedding_batch(rng, batch=4, vocab=vocab)

  def mkstate():
    state = train.create_train_state(
        model, optax.adam(1e-2), jax.random.PRNGKey(0),
        batch.context, batch.examples, batch.mask,
        sparse_tx=train.LazyAdam(learning_rate=1e-2, dma_scatter=False))
    return state.replace(
        params=parallel.shard_params(state.params, mesh),
        opt_state=parallel.shard_params(state.opt_state, mesh),
        sparse_opt_state=parallel.shard_params(state.sparse_opt_state,
                                               mesh))

  sharded_batch = parallel.shard_batch(batch, mesh)
  dense_state, sparse_state = mkstate(), mkstate()
  efs = sparse_lib.derive_embed_features(
      sparse_state.params, batch.context, batch.examples)
  assert len(efs) == 2
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)
  dstep = jax.jit(train.make_train_step(loss_fn))
  sstep = jax.jit(train.make_sparse_train_step(loss_fn, efs))
  for _ in range(3):
    dense_state, dm = dstep(dense_state, sharded_batch,
                            jax.random.PRNGKey(2))
    sparse_state, sm = sstep(sparse_state, sharded_batch,
                             jax.random.PRNGKey(2))
    # Forward summation orders differ (shard_map psum of partials vs
    # replicated slab pooling), so equality is numerical, not bitwise.
    np.testing.assert_allclose(float(dm['loss']), float(sm['loss']),
                               rtol=1e-5)
  # Adam normalizes near-zero gradients by near-zero sqrt(v), amplifying
  # the forward paths' different summation orders; one optimizer step is
  # ~lr = 1e-2, so 1e-3 is a tenth of a step.
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3),
      dense_state.params, sparse_state.params)


def test_sparse_step_encoder_token_table():
  """TFR-BERT analog: the encoder's token table trains sparsely, with the
  nn.Embed lookup redirected onto the row slab — bitwise-equal to the
  dense-grad lazy path (pos/type tables stay dense via table_pattern)."""
  from ranking_tpu.models import encoder as enc_lib

  rng = np.random.RandomState(11)
  B, L, S, V = 3, 4, 8, 64
  labels = rng.randint(0, 3, size=(B, L)).astype(np.float32)
  ids = rng.randint(0, V, size=(B, L, S)).astype(np.int32)
  masks = (rng.rand(B, L, S) > 0.2).astype(np.int32)
  segs = rng.randint(0, 2, size=(B, L, S)).astype(np.int32)
  batch = batch_from_labels(
      labels=labels,
      examples={'input_ids': ids, 'input_mask': masks,
                'segment_ids': segs})
  model = models.RankingModel(scorer=models.EncoderScorer(
      encoder=enc_lib.TransformerEncoder(
          vocab_size=V, hidden_dim=8, num_layers=1, num_heads=2,
          mlp_dim=16, max_len=S, type_vocab_size=2, dropout=0.0),
      dropout=0.0))

  def mkstate():
    return train.create_train_state(
        model, optax.adam(1e-2), jax.random.PRNGKey(0),
        batch.context, batch.examples, batch.mask,
        sparse_tx=train.LazyAdam(learning_rate=1e-2,
                                 table_pattern=r'token_embed/embedding'))

  dense_state, sparse_state = mkstate(), mkstate()
  efs = sparse_lib.derive_embed_features(
      sparse_state.params, batch.context, batch.examples)
  assert [ef.feature for ef in efs] == ['input_ids']
  assert efs[0].param_path.endswith('token_embed/embedding')
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)
  dstep = jax.jit(train.make_train_step(loss_fn))
  sstep = jax.jit(train.make_sparse_train_step(loss_fn, efs))
  for _ in range(3):
    dense_state, dm = dstep(dense_state, batch, jax.random.PRNGKey(9))
    sparse_state, sm = sstep(sparse_state, batch, jax.random.PRNGKey(9))
    assert float(dm['loss']) == float(sm['loss'])
  jax.tree.map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      dense_state.params, sparse_state.params)


def test_sparse_step_hash_encoder_without_declared_buckets():
  """derive_embed_features can't know num_buckets; the step defaults the
  modulus to the table's own row count, which for HashEmbeddingEncoder IS
  num_buckets — raw ids beyond the table stay bitwise-equal to dense."""

  class HashScorer(models.scorers.nn.Module):  # type: ignore[name-defined]

    @models.scorers.nn.compact
    def __call__(self, context, examples, mask, training=False):
      from ranking_tpu.models import embeddings as emb_lib
      emb = emb_lib.HashEmbeddingEncoder(
          num_buckets=16, embedding_dim=4, name='embed_document_tokens')(
              examples['document_tokens'])
      return models.DNNScorer(hidden_layer_dims=(8,), dropout=0.0,
                              use_batch_norm=False, name='dnn')(
          {}, {'emb': emb}, mask, training=training)

  rng = np.random.RandomState(4)
  labels = rng.randint(0, 3, size=(4, 6)).astype(np.float32)
  docs = rng.randint(-1, 200, size=(4, 6, 3)).astype(np.int32)  # > buckets
  batch = batch_from_labels(labels=labels,
                            examples={'document_tokens': docs})
  model = models.RankingModel(scorer=HashScorer())
  dense_state = _mkstate(model, batch)
  sparse_state = _mkstate(model, batch)
  efs = sparse_lib.derive_embed_features(
      sparse_state.params, batch.context, batch.examples)
  assert [ef.num_buckets for ef in efs] == [None]
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)
  dstep = jax.jit(train.make_train_step(loss_fn))
  sstep = jax.jit(train.make_sparse_train_step(loss_fn, efs))
  for _ in range(3):
    dense_state, dm = dstep(dense_state, batch, jax.random.PRNGKey(5))
    sparse_state, sm = sstep(sparse_state, batch, jax.random.PRNGKey(5))
    assert float(dm['loss']) == float(sm['loss'])
    assert np.isfinite(float(sm['loss']))
  jax.tree.map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      dense_state.params, sparse_state.params)


def test_update_rows_bf16_table_keeps_dtype():
  """Adam math promotes to f32; the scattered rows must come back in the
  table's dtype (the DMA kernel requires same-dtype src/dst)."""
  import jax.numpy as jnp
  spec = train.LazyAdam(learning_rate=1e-2, max_rows=8)
  table = jnp.ones((8, 4), jnp.bfloat16)
  state = spec.init({'t': table})
  uids = jnp.arange(8, dtype=jnp.int32)
  g = jnp.ones((8, 4), jnp.bfloat16)
  filled = jnp.ones((8,), bool)
  new_p, new_s = spec.update_rows({'t': (uids, g, filled)}, state,
                                  {'t': table})
  assert new_p['t'].dtype == jnp.bfloat16
  assert new_s['t']['m'].dtype == jnp.bfloat16
  assert float(jnp.abs(new_p['t'].astype(jnp.float32) - 1.0).max()) > 0


def test_sparse_step_shared_table_two_features():
  """Two id features feeding ONE table share a dedup + slab; gradients
  must stay bitwise-equal to the dense path (regression: per-feature
  slabs used to overwrite each other for shared param_paths)."""

  class SharedScorer(models.scorers.nn.Module):  # type: ignore[name-defined]

    @models.scorers.nn.compact
    def __call__(self, context, examples, mask, training=False):
      from ranking_tpu.models import embeddings as emb_lib
      enc = emb_lib.EmbeddingEncoder(vocab_size=32, embedding_dim=4,
                                     name='embed_shared')
      q = enc(context['q_ids'])                       # [B, d]
      d = enc(examples['d_ids'])                      # [B, L, d]
      feats = {'d': d, 'q': models.scorers.jnp.broadcast_to(
          q[:, None, :], d.shape)}
      return models.DNNScorer(hidden_layer_dims=(8,), dropout=0.0,
                              use_batch_norm=False, name='dnn')(
          {}, feats, mask, training=training)

  rng = np.random.RandomState(6)
  labels = rng.randint(0, 3, size=(4, 5)).astype(np.float32)
  batch = batch_from_labels(
      labels=labels,
      context={'q_ids': rng.randint(-1, 32, size=(4, 3)).astype(np.int32)},
      examples={'d_ids': rng.randint(-1, 32, size=(4, 5, 3))
                .astype(np.int32)})
  model = models.RankingModel(scorer=SharedScorer())
  dense_state = _mkstate(model, batch)
  sparse_state = _mkstate(model, batch)
  efs = (sparse_lib.EmbedFeature(
             param_path='scorer/embed_shared/embedding',
             feature='q_ids', source='context'),
         sparse_lib.EmbedFeature(
             param_path='scorer/embed_shared/embedding',
             feature='d_ids', source='examples'))
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)
  dstep = jax.jit(train.make_train_step(loss_fn))
  sstep = jax.jit(train.make_sparse_train_step(loss_fn, efs))
  for _ in range(3):
    dense_state, dm = dstep(dense_state, batch, jax.random.PRNGKey(7))
    sparse_state, sm = sstep(sparse_state, batch, jax.random.PRNGKey(7))
    assert float(dm['loss']) == float(sm['loss'])
  # Shared-table grads accumulate in a different order on the slab than
  # the dense scatter-add, so equality here is to float round-off (the
  # single-feature cases stay bitwise — see the tests above).
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                              rtol=1e-5, atol=1e-7),
      dense_state.params, sparse_state.params)


def test_default_rules_shard_lazy_adam_moments():
  """Sparse moment buffers ('<table>/m', '<table>/v') shard like the
  table (regression: the end-anchored rule replicated full-vocab
  moments on every device)."""
  from jax.sharding import PartitionSpec as P
  from ranking_tpu import parallel
  import jax.numpy as jnp
  mesh = parallel.make_mesh(model=2)
  state = {'scorer/embed_q/embedding': {'m': jnp.zeros((32, 4)),
                                        'v': jnp.zeros((32, 4))},
           'count': jnp.zeros((), jnp.int32)}
  sh = parallel.param_shardings(state, mesh)
  assert sh['scorer/embed_q/embedding']['m'].spec == P('model', None)
  assert sh['scorer/embed_q/embedding']['v'].spec == P('model', None)
  assert sh['count'].spec == P()


def test_sparse_step_lazy_adagrad_matches_dense_bitwise():
  """LazyAdagrad through the sparse step == its dense-grad path, bitwise
  (the 2-slab optimizer: param + accumulator instead of Adam's 3)."""
  rng = np.random.RandomState(12)
  model = _embedding_model()
  batches = [_embedding_batch(rng) for _ in range(3)]

  def mk():
    return train.create_train_state(
        model, optax.adagrad(1e-2), jax.random.PRNGKey(0),
        batches[0].context, batches[0].examples, batches[0].mask,
        sparse_tx=train.LazyAdagrad(learning_rate=1e-2, max_rows=256))

  dense_state, sparse_state = mk(), mk()
  efs = sparse_lib.derive_embed_features(
      sparse_state.params, batches[0].context, batches[0].examples)
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)
  dstep = jax.jit(train.make_train_step(loss_fn))
  sstep = jax.jit(train.make_sparse_train_step(loss_fn, efs))
  for batch in batches:
    dense_state, dm = dstep(dense_state, batch, jax.random.PRNGKey(7))
    sparse_state, sm = sstep(sparse_state, batch, jax.random.PRNGKey(7))
    assert float(dm['loss']) == float(sm['loss'])
  jax.tree.map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      dense_state.params, sparse_state.params)
  jax.tree.map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      dense_state.sparse_opt_state, sparse_state.sparse_opt_state)


def test_pipeline_auto_selects_sparse_step_adagrad(tmp_path):
  from ranking_tpu import pipeline
  from ranking_tpu.data import FixedLenFeature, VarLenFeature
  REF = '/root/reference/tensorflow_ranking/examples/data'
  ctx = {'query_tokens': VarLenFeature(dtype='string', max_len=6,
                                       hash_buckets=64)}
  ex = {'document_tokens': VarLenFeature(dtype='string', max_len=10,
                                         hash_buckets=64),
        'relevance': FixedLenFeature(shape=(), dtype='int64',
                                     default_value=0)}
  builder = pipeline.SimpleDatasetBuilder(
      ctx, ex, pipeline.DatasetHparams(
          train_input_pattern=f'{REF}/train_elwc.tfrecord',
          valid_input_pattern=f'{REF}/eval_elwc.tfrecord',
          train_batch_size=4, valid_batch_size=4, list_size=5), seed=1)
  model = models.RankingModel(scorer=models.EmbeddingDNNScorer(
      hidden_layer_dims=(8,), vocab_sizes={'query_tokens': 64,
                                           'document_tokens': 64},
      embedding_dim=4, dropout=0.0, use_batch_norm=False))
  pipe = pipeline.SimplePipeline(
      model, builder,
      pipeline.PipelineHparams(
          model_dir=str(tmp_path / 'm'), num_epochs=1, steps_per_epoch=3,
          validation_steps=1, learning_rate=0.05, loss='softmax_loss',
          optimizer='lazy_adagrad'))
  history = pipe.train_and_validate()
  assert np.isfinite(history['loss'])
  assert pipe.final_state.sparse_opt_state is not None
  assert 'acc' in next(iter(
      v for k, v in pipe.final_state.sparse_opt_state.items()
      if k not in ('count', 'dropped')))
