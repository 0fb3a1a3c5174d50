"""Robustness: malformed input safety and loss-invariant fuzzing.

The native decoder must never crash the process on corrupt bytes (it
backs the serving path); losses must stay finite across random
shapes/masks and respect reduction scaling invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ranking_tpu import ops
from ranking_tpu.data import FixedLenFeature, VarLenFeature, native, parsers
from ranking_tpu.ops.loss_registry import RankingLossKey, make_loss_fn

RANK3_KEYS = {
    RankingLossKey.ORDINAL_LOSS,
    RankingLossKey.MULTI_CLASS_LOSS,
    RankingLossKey.CLICK_EM_LOSS,
    RankingLossKey.MIXTURE_EM_LOSS,
}


@pytest.mark.skipif(not native.available(), reason='no native toolchain')
def test_native_decoder_survives_malformed_bytes():
  context_spec = {'q': FixedLenFeature(shape=(1,), dtype='float32',
                                       default_value=0.0)}
  example_spec = {'rel': FixedLenFeature(shape=(), dtype='int64',
                                         default_value=0),
                  'ids': VarLenFeature(dtype='int64', max_len=4)}
  rng = np.random.RandomState(0)
  for trial in range(50):
    n = rng.randint(1, 20)
    garbage = [bytes(rng.randint(0, 256, size=n, dtype=np.uint8).data)
               for _ in range(3)]
    try:
      parsed = native.decode_elwc_batch(garbage, 3, context_spec,
                                        example_spec)
      # If it parses, outputs must still be well-shaped.
      assert parsed.mask.shape == (3, 3)
    except ValueError:
      pass  # graceful rejection is fine; crashing is not


@pytest.mark.skipif(not native.available(), reason='no native toolchain')
def test_native_decoder_survives_truncated_real_records():
  from ranking_tpu.data import proto
  rec = proto.make_elwc({'q': [1.0]},
                        [{'rel': [1], 'ids': [1, 2]}]).SerializeToString()
  context_spec = {'q': FixedLenFeature(shape=(1,), dtype='float32',
                                       default_value=0.0)}
  example_spec = {'rel': FixedLenFeature(shape=(), dtype='int64',
                                         default_value=0),
                  'ids': VarLenFeature(dtype='int64', max_len=4)}
  for cut in range(0, len(rec)):
    try:
      native.decode_elwc_batch([rec[:cut]], 2, context_spec, example_spec)
    except ValueError:
      pass


def test_loss_fuzz_finite_and_scaling():
  rng = np.random.RandomState(0)
  keys = [k for k in RankingLossKey.all_keys() if k not in RANK3_KEYS]
  for trial in range(12):
    b = int(rng.randint(1, 6))
    l = int(rng.randint(2, 15))
    labels = rng.randint(0, 4, size=(b, l)).astype(np.float32)
    # Random padding; keep at least one valid item per list.
    pad = rng.rand(b, l) < 0.3
    pad[:, 0] = False
    labels[pad] = -1.0
    logits = (rng.randn(b, l) * 2).astype(np.float32)
    key = jax.random.PRNGKey(trial)
    loss_key = keys[trial % len(keys)]
    fn = make_loss_fn(loss_key)
    v = float(fn(labels, logits, key=key))
    assert np.isfinite(v), f'{loss_key} b={b} l={l}'

  # Reduction invariant: scaling all weights leaves MEAN unchanged and
  # scales SUM-style numerators linearly.
  labels = rng.randint(0, 3, size=(4, 8)).astype(np.float32)
  logits = rng.randn(4, 8).astype(np.float32)
  weights = (rng.rand(4, 8) + 0.5).astype(np.float32)
  from ranking_tpu.ops import losses as jl
  loss = jl.SigmoidCrossEntropyLoss(name='s')
  m1 = float(loss(labels, logits, weights=weights, reduction='mean'))
  m2 = float(loss(labels, logits, weights=weights * 3.0, reduction='mean'))
  np.testing.assert_allclose(m1, m2, rtol=1e-5)


def test_all_lists_invalid_is_finite():
  labels = np.full((3, 6), -1.0, np.float32)
  logits = np.random.RandomState(1).randn(3, 6).astype(np.float32)
  for loss_key in (RankingLossKey.SOFTMAX_LOSS,
                   RankingLossKey.PAIRWISE_LOGISTIC_LOSS,
                   RankingLossKey.APPROX_NDCG_LOSS,
                   RankingLossKey.MEAN_SQUARED_LOSS):
    v = float(make_loss_fn(loss_key)(labels, logits))
    assert np.isfinite(v), loss_key
  for key in (ops.RankingMetricKey.NDCG, ops.RankingMetricKey.MRR,
              ops.RankingMetricKey.MAP):
    v = float(ops.compute_mean(key, labels, logits))
    assert np.isfinite(v), key


@pytest.mark.skipif(not native.available(), reason='no native toolchain')
def test_native_vs_python_parser_fuzz_parity():
  """Randomized well-formed ELWCs: the C++ decoder and the Python parser
  must produce identical batches (features, labels via specs, sizes,
  masks) across random list lengths, missing optional features, value
  counts, and string/int/float kinds."""
  from ranking_tpu.data import proto

  context_spec = {
      'qf': FixedLenFeature(shape=(2,), dtype='float32', default_value=0.5),
      'q_ids': VarLenFeature(dtype='int64', max_len=4),
      'q_tok': VarLenFeature(dtype='string', max_len=3, hash_buckets=97),
  }
  example_spec = {
      'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0),
      'df': FixedLenFeature(shape=(3,), dtype='float32', default_value=-1.),
      'd_ids': VarLenFeature(dtype='int64', max_len=5),
      'd_tok': VarLenFeature(dtype='string', max_len=4, hash_buckets=31),
  }
  rng = np.random.RandomState(7)
  words = [b'alpha', b'beta', b'gamma', b'delta', b'x', b'\xc3\xa9clair']

  def rand_example(optional_df=True):
    ex = {'rel': [int(rng.randint(0, 5))]}
    if not optional_df or rng.rand() < 0.7:
      ex['df'] = [float(v) for v in rng.randn(3)]
    if rng.rand() < 0.8:
      ex['d_ids'] = [int(v) for v in
                     rng.randint(0, 1 << 40, size=rng.randint(0, 8))]
    if rng.rand() < 0.8:
      ex['d_tok'] = [words[i] for i in
                     rng.randint(0, len(words), size=rng.randint(0, 6))]
    return ex

  for trial in range(25):
    records = []
    for _ in range(rng.randint(1, 5)):
      ctx = {'qf': [float(v) for v in rng.randn(2)]}
      if rng.rand() < 0.8:
        ctx['q_ids'] = [int(v) for v in
                        rng.randint(0, 1 << 40, size=rng.randint(0, 6))]
      if rng.rand() < 0.8:
        ctx['q_tok'] = [words[i] for i in
                        rng.randint(0, len(words), size=rng.randint(0, 4))]
      docs = [rand_example() for _ in range(rng.randint(0, 7))]
      records.append(proto.make_elwc(ctx, docs).SerializeToString())
    list_size = int(rng.randint(1, 9))

    got = native.decode_elwc_batch(records, list_size, context_spec,
                                   example_spec)
    ref = parsers.parse_example_list(records, context_spec, example_spec,
                                     list_size=list_size)
    np.testing.assert_array_equal(np.asarray(got.sizes),
                                  np.asarray(ref.sizes), err_msg=f't{trial}')
    np.testing.assert_array_equal(np.asarray(got.mask),
                                  np.asarray(ref.mask), err_msg=f't{trial}')
    for name in context_spec:
      np.testing.assert_array_equal(
          np.asarray(got.context[name]), np.asarray(ref.context[name]),
          err_msg=f't{trial} context/{name}')
    for name in example_spec:
      np.testing.assert_array_equal(
          np.asarray(got.examples[name]), np.asarray(ref.examples[name]),
          err_msg=f't{trial} examples/{name}')
