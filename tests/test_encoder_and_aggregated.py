"""Tests: transformer EncoderScorer (TFR-BERT analog), warm start,
aggregated query-grouped metrics, calibrated softmax loss."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ranking_tpu import models, ops, train
from ranking_tpu.data.batch import batch_from_labels
from ranking_tpu.models import encoder as enc_lib
from ranking_tpu.ops import aggregated, losses


def _bert_batch(rng, batch=4, list_size=3, seq=12):
  ids = rng.randint(0, 50, size=(batch, list_size, seq))
  ids[:, :, -4:] = -1  # token padding
  labels = rng.randint(0, 3, size=(batch, list_size)).astype(np.float32)
  labels[:, -1] = np.where(rng.rand(batch) < 0.5, -1.0, labels[:, -1])
  return batch_from_labels(labels=jnp.asarray(labels),
                           examples={'input_ids': jnp.asarray(ids)})


def _scorer():
  return models.RankingModel(scorer=enc_lib.EncoderScorer(
      encoder=enc_lib.TransformerEncoder(
          vocab_size=50, hidden_dim=16, num_layers=1, num_heads=2,
          mlp_dim=32, max_len=16, dropout=0.0),
      dropout=0.0))


def test_encoder_scorer_trains():
  rng = np.random.RandomState(0)
  batch = _bert_batch(rng)
  model = _scorer()
  state = train.create_train_state(
      model, optax.adam(1e-3), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask)
  step = jax.jit(train.make_train_step(
      ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)), donate_argnums=0)
  first = None
  for _ in range(5):
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    if first is None:
      first = float(metrics['loss'])
  assert np.isfinite(float(metrics['loss']))
  # Padded logits are the log-epsilon sentinel.
  logits, _ = train.steps._forward(state, batch, training=False)
  assert np.allclose(np.asarray(logits)[~np.asarray(batch.mask)],
                     np.log(1e-10))


def test_warm_start_overlays_matching_params():
  rng = np.random.RandomState(1)
  batch = _bert_batch(rng)
  model = _scorer()
  variables = model.init(
      {'params': jax.random.PRNGKey(0)}, batch.context, batch.examples,
      batch.mask, training=False)
  params = variables['params']
  tgt = np.asarray(
      params['scorer']['encoder']['token_embed']['embedding'])
  pretrained = {'token_embed/embedding': np.ones_like(tgt) * 0.5}
  merged = enc_lib.warm_start_from(params, pretrained)
  got = np.asarray(merged['scorer']['encoder']['token_embed']['embedding'])
  np.testing.assert_allclose(got, 0.5)
  # Unmatched params untouched.
  np.testing.assert_allclose(
      np.asarray(merged['scorer']['score']['kernel']),
      np.asarray(params['scorer']['score']['kernel']))


def test_aggregated_metrics_merge_split_queries():
  acc = aggregated.PredictionAccumulator()
  # Query 'a' split across two batches; query 'b' in one.
  acc.add_batch(np.array(['a', 'b']),
                np.array([[1., 0.], [0., 1.]]),
                np.array([[2.0, 1.0], [0.5, 1.5]]))
  acc.add_batch(np.array(['a']),
                np.array([[0., -1.]]),
                np.array([[3.0, 0.0]]))
  labels, scores, qids = acc.grouped()
  assert set(qids) == {'a', 'b'}
  a_row = labels[list(qids).index('a')]
  assert (a_row >= 0).sum() == 3  # merged docs from both batches
  res = acc.compute({'mrr': (ops.RankingMetricKey.MRR, None),
                     'ndcg@2': (ops.RankingMetricKey.NDCG, 2)})
  # Query a: relevant doc scored 2.0, but doc from batch 2 scored 3.0 with
  # label 0 -> relevant at rank 2 -> rr = 0.5. Query b: rr = 1.0.
  np.testing.assert_allclose(res['mrr'], 0.75, rtol=1e-5)


def test_aggregated_csv_dump(tmp_path):
  acc = aggregated.PredictionAccumulator()
  acc.add_batch(np.array(['q1']), np.array([[1., 0.]]),
                np.array([[0.3, 0.7]]))
  path = str(tmp_path / 'preds.csv')
  acc.dump_csv(path)
  lines = open(path).read().strip().splitlines()
  assert lines[0] == 'query_id,relevance,score'
  assert len(lines) == 3


def test_calibrated_softmax_reference_golden():
  # Golden value from the reference docstring
  # (tensorflow_ranking/python/keras/losses.py:852-861).
  loss = losses.CalibratedSoftmaxLoss(virtual_label=0.1)
  v = loss(np.array([[1., 0.]]), np.array([[0.6, 0.8]]))
  np.testing.assert_allclose(float(v), 1.1808171, rtol=1e-6)


def test_calibrated_softmax_registry_and_padding():
  fn = ops.make_loss_fn(ops.RankingLossKey.CALIBRATED_SOFTMAX_LOSS,
                        params={'virtual_label': 0.5})
  labels = np.array([[1., 0., -1.], [2., 1., 0.]])
  logits = np.array([[1., 2., 3.], [0.5, 0.1, -0.3]])
  v = fn(labels, logits)
  assert np.isfinite(float(v))
  # With virtual_label=0 and large positive scores it tends to plain
  # softmax; just check ordering monotonicity of the anchor effect.
  v0 = ops.make_loss_fn(ops.RankingLossKey.CALIBRATED_SOFTMAX_LOSS,
                        params={'virtual_label': 0.0})(labels, logits)
  assert float(v) != float(v0)


def test_fuse_query_document_ids():
  from ranking_tpu.data import bert
  q = np.array([[7, 8, -1]])
  d = np.array([[[1, 2, 3, -1], [4, -1, -1, -1]]])
  fused = bert.fuse_query_document_ids(q, d, seq_len=8, cls_id=100,
                                       sep_id=101)
  assert fused.shape == (1, 2, 8)
  np.testing.assert_array_equal(fused[0, 0],
                                [100, 7, 8, 101, 1, 2, 3, 101])
  np.testing.assert_array_equal(fused[0, 1],
                                [100, 7, 8, 101, 4, 101, -1, -1])


def test_fuse_truncates_long_docs():
  from ranking_tpu.data import bert
  q = np.array([[1, 2]])
  d = np.array([[[9] * 10]])
  fused = bert.fuse_query_document_ids(q, d, seq_len=7, cls_id=100,
                                       sep_id=101)
  # [CLS] 1 2 [SEP] 9 9 [SEP]
  np.testing.assert_array_equal(fused[0, 0], [100, 1, 2, 101, 9, 9, 101])
