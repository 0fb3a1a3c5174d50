"""Tests: transformer EncoderScorer (TFR-BERT analog), warm start,
aggregated query-grouped metrics, calibrated softmax loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


# ---------------------------------------------------------------------------
# Real pretrained-BERT ingestion (tfrbert_task.py:346-361 analog)
# ---------------------------------------------------------------------------

TESTDATA = '/root/reference/tensorflow_ranking/extension/testdata'


def test_wordpiece_tokenizer():
  from ranking_tpu.data import bert
  tok = bert.WordPieceTokenizer(f'{TESTDATA}/bert_lite_vocab.txt')
  # vocab: [PAD] this is my simple test [UNK] [CLS] [SEP] [MASK]
  assert tok.tokenize('This is my simple test') == [1, 2, 3, 4, 5]
  assert tok.tokenize('unknown word!') == [6, 6, 6]  # UNK UNK punct->UNK
  ids, mask, segs = tok.encode_pair('this is', 'my simple test', 12)
  assert ids.tolist() == [7, 1, 2, 8, 3, 4, 5, 8, 0, 0, 0, 0]
  assert mask.tolist() == [1] * 8 + [0] * 4
  assert segs.tolist() == [0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0]
  # truncation: B first, then A (longest-first)
  ids2, mask2, _ = tok.encode_pair('this is my', 'simple test this is', 7)
  assert mask2.sum() == 7 and ids2[0] == 7 and ids2[-1] == 8


def test_wordpiece_continuation_pieces():
  from ranking_tpu.data import bert
  tok = bert.WordPieceTokenizer(
      ['[PAD]', '[CLS]', '[SEP]', '[UNK]', 'un', '##aff', '##able', 'aff'])
  assert tok.tokenize('unaffable') == [4, 5, 6]
  assert tok.tokenize('aff') == [7]
  assert tok.tokenize('unzzz') == [3]  # no full segmentation -> UNK


def test_bert_checkpoint_loads_and_maps_every_variable():
  import jax
  import jax.tree_util as jtu

  from ranking_tpu.models import bert_ckpt
  enc, params = bert_ckpt.load_tf2_bert_checkpoint(
      f'{TESTDATA}/bert_lite_tf2.ckpt', f'{TESTDATA}/bert_lite_config.json')
  assert enc.vocab_size == 10 and enc.hidden_dim == 2
  assert enc.num_layers == 1 and enc.max_len == 4

  ids = jnp.asarray(np.array([[7, 1, 2, 8], [7, 3, 8, 0]], np.int32))
  am = jnp.asarray(np.array([[1, 1, 1, 1], [1, 1, 1, 0]], np.int32))
  seg = jnp.zeros_like(ids)
  fresh = enc.init(jax.random.PRNGKey(0), ids, segment_ids=seg,
                   attn_mask=am)
  # Identical tree structure and shapes as a fresh init; values differ.
  assert (jtu.tree_structure(fresh['params'])
          == jtu.tree_structure(params))
  jax.tree.map(lambda a, b: None if a.shape == b.shape else
               (_ for _ in ()).throw(AssertionError((a.shape, b.shape))),
               fresh['params'], params)
  out = enc.apply({'params': params}, ids, segment_ids=seg, attn_mask=am)
  assert np.isfinite(np.asarray(out)).all()
  # The checkpoint's word embeddings landed verbatim.
  import tensorflow as tf
  reader = tf.train.load_checkpoint(f'{TESTDATA}/bert_lite_tf2.ckpt')
  want = reader.get_tensor(
      'model/layer_with_weights-0/embeddings/.ATTRIBUTES/VARIABLE_VALUE')
  np.testing.assert_array_equal(
      np.asarray(params['token_embed']['embedding']), want)


def test_encoder_seq_len_guard():
  import jax

  from ranking_tpu.models import bert_ckpt
  enc, params = bert_ckpt.load_tf2_bert_checkpoint(
      f'{TESTDATA}/bert_lite_tf2.ckpt', f'{TESTDATA}/bert_lite_config.json')
  too_long = jnp.zeros((1, 8), jnp.int32)  # max_len is 4
  with pytest.raises(ValueError, match='exceeds max_len'):
    enc.apply({'params': params}, too_long)


def test_bert_warm_start_fine_tune():
  """E2e: EncoderScorer initialized from the checkpoint trains on
  lite-vocab data; warm-started encoder params are the checkpoint values
  at step 0 and training runs finite. (The bundled toy checkpoint's
  2-dim encoder emits document-independent pooled vectors, so softmax
  per-list gradients cancel exactly — quality improvement from THIS
  checkpoint is undefined; the from-scratch run asserts optimization of
  the same architecture, and examples/encoder_ranking.py
  --init_checkpoint covers the full pipeline.)"""
  import jax
  import optax

  from ranking_tpu import models, ops, train
  from ranking_tpu.data import bert
  from ranking_tpu.data.batch import batch_from_labels
  from ranking_tpu.models import bert_ckpt

  enc, bert_params = bert_ckpt.load_tf2_bert_checkpoint(
      f'{TESTDATA}/bert_lite_tf2.ckpt', f'{TESTDATA}/bert_lite_config.json')
  tok = bert.WordPieceTokenizer(f'{TESTDATA}/bert_lite_vocab.txt')

  queries = ['this is', 'my test', 'simple this', 'test is']
  doc_sets = [['my simple test', 'this'], ['simple', 'is my'],
              ['test test', 'my'], ['this simple', 'is']]
  b, l, t = len(queries), 2, 4
  ids = np.zeros((b, l, t), np.int32)
  ams = np.zeros_like(ids)
  segs = np.zeros_like(ids)
  for i, (q, docs) in enumerate(zip(queries, doc_sets)):
    ids[i], ams[i], segs[i] = bert.encode_query_documents(tok, q, docs, t)
  labels = np.array([[2.0, 0.0], [1.0, 0.0], [0.0, 1.0], [2.0, 1.0]],
                    np.float32)
  batch = batch_from_labels(
      labels=labels,
      examples={'input_ids': ids, 'input_mask': ams, 'segment_ids': segs})

  model = models.RankingModel(
      scorer=models.EncoderScorer(encoder=enc, dropout=0.0))

  def run(warm):
    state = train.create_train_state(
        model, optax.adam(5e-2), jax.random.PRNGKey(3),
        batch.context, batch.examples, batch.mask)
    if warm:
      params = dict(state.params)
      params['scorer'] = dict(params['scorer'])
      params['scorer']['encoder'] = bert_params
      state = state.replace(params=params)
      np.testing.assert_array_equal(
          np.asarray(state.params['scorer']['encoder']['token_embed']
                     ['embedding']),
          np.asarray(bert_params['token_embed']['embedding']))
    step = jax.jit(train.make_train_step(
        ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)))
    first = None
    for i in range(12):
      state, metrics = step(state, batch, jax.random.PRNGKey(i))
      if first is None:
        first = float(metrics['loss'])
    return first, float(metrics['loss'])

  warm_first, warm_last = run(True)
  cold_first, cold_last = run(False)
  # The 2-dim toy encoder is piecewise-constant through its LayerNorms
  # (D=2 LN collapses to +-[1,-1]), so loss movement is not asserted;
  # the tokenizing example e2e (test_examples.py) covers learning.
  assert np.isfinite([warm_first, warm_last, cold_first, cold_last]).all()


def test_encoder_remat_matches_plain():
  """remat=True recomputes activations but is numerically identical."""
  rng = np.random.RandomState(0)
  ids = jnp.asarray(rng.randint(0, 48, size=(6, 8)), jnp.int32)

  def run(remat):
    enc = enc_lib.TransformerEncoder(
        vocab_size=48, hidden_dim=16, num_layers=2, num_heads=4,
        mlp_dim=32, max_len=8, dropout=0.1, remat=remat)
    params = enc.init({'params': jax.random.PRNGKey(0)}, ids)
    out = enc.apply(params, ids, training=False)
    grads = jax.grad(lambda v: jnp.sum(enc.apply(
        v, ids, training=True,
        rngs={'dropout': jax.random.PRNGKey(3)}) ** 2))(params)
    return out, grads

  out_plain, g_plain = run(False)
  out_remat, g_remat = run(True)
  np.testing.assert_allclose(np.asarray(out_remat), np.asarray(out_plain),
                             rtol=1e-6, atol=1e-7)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                              rtol=1e-5, atol=1e-6),
      g_remat, g_plain)


def test_wordpiece_bert_basic_tokenization_fidelity():
  """BERT-convention details: '_' splits as punctuation, accents strip
  under lowercasing (NFD, drop Mn), CJK splits per character, missing
  [UNK] raises, and pair truncation pops B on length ties."""
  from ranking_tpu.data import bert
  vocab = ['[PAD]', 'foo', 'bar', '[UNK]', '[CLS]', '[SEP]', 'cafe',
           '今', '天', 'a', 'b', 'c', 'd']
  tok = bert.WordPieceTokenizer(vocab)
  foo, bar, unk, cafe = 1, 2, 3, 6
  # '_' is punctuation to BERT: foo_bar -> foo / _ / bar (the '_' itself
  # is OOV in this vocab).
  assert tok.tokenize('foo_bar') == [foo, unk, bar]
  # Accent stripping: 'café' -> 'cafe'.
  assert tok.tokenize('café') == [cafe]
  # CJK ideographs split per character.
  assert tok.tokenize('今天') == [7, 8]
  # Missing [UNK] is an error, not a silent fallback to id 0 ([PAD]).
  import pytest as _pytest
  with _pytest.raises(ValueError, match='UNK'):
    bert.WordPieceTokenizer(['[PAD]', '[CLS]', '[SEP]', 'x'])
  # Tie truncation pops B (reference _truncate_seq_pair: strict > for A).
  ids, mask, _ = tok.encode_pair('a b c', 'b c d', 8)  # budget 5, tie 3/3
  a_ids = ids.tolist()[1:ids.tolist().index(tok.sep_id)]
  assert a_ids == [9, 10, 11]  # A intact; B lost its tail token
