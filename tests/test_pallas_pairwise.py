"""Fused pairwise kernel == jnp reference, forward and gradient.

Runs the Pallas kernel in interpreter mode on CPU; the same code compiles
to Mosaic on TPU. Kernels are optimizations, never semantic forks
(SURVEY.md section 7 step 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ranking_tpu.ops import lambda_weights as lw
from ranking_tpu.ops import losses as losses_lib
from ranking_tpu.ops import pallas as pallas_ops
from ranking_tpu.ops.pallas import pairwise as pk
from ranking_tpu.ops.reductions import Reduction
from ranking_tpu.utils import fns


@pytest.fixture(autouse=True)
def _interpret_and_enable():
  pk._INTERPRET = True
  pallas_ops.set_enabled(True)
  yield
  pk._INTERPRET = False
  pallas_ops.set_enabled(None)


def _data(b=5, l=11, seed=0, with_padding=True):
  rng = np.random.RandomState(seed)
  logits = rng.randn(b, l).astype(np.float32) * 2
  labels = rng.randint(0, 4, size=(b, l)).astype(np.float32)
  if with_padding:
    labels[:, -3:] = np.where(rng.rand(b, 3) < 0.6, -1.0, labels[:, -3:])
  weights = rng.rand(b, l).astype(np.float32) + 0.1
  return jnp.asarray(labels), jnp.asarray(logits), jnp.asarray(weights)


def _jnp_loss(loss, labels, logits, weights, reduction):
  pallas_ops.set_enabled(False)
  try:
    return loss(labels, logits, weights=weights, reduction=reduction)
  finally:
    pallas_ops.set_enabled(True)


LOSSES = [
    losses_lib.PairwiseLogisticLoss(),
    losses_lib.PairwiseHingeLoss(),
    losses_lib.PairwiseSoftZeroOneLoss(),
    losses_lib.PairwiseLogisticLoss(temperature=0.5),
    losses_lib.PairwiseLogisticLoss(
        lambda_weight=lw.LabelDiffLambdaWeight()),
    losses_lib.PairwiseLogisticLoss(
        lambda_weight=lw.DCGLambdaWeightV2(
            gain_fn=fns.pow_minus_1, rank_discount_fn=fns.log2_inverse)),
    losses_lib.PairwiseHingeLoss(
        lambda_weight=lw.DCGLambdaWeightV2(
            topn=5, normalized=True,
            gain_fn=fns.pow_minus_1, rank_discount_fn=fns.log2_inverse)),
    # The canonical LambdaRank recipe: DCG-v1 from the factory (round-4
    # kernelization; the factory now returns named registry fns so the
    # kernel's identity checks recognize it).
    losses_lib.PairwiseLogisticLoss(
        lambda_weight=lw.create_ndcg_lambda_weight()),
    losses_lib.PairwiseLogisticLoss(
        lambda_weight=lw.create_ndcg_lambda_weight(smooth_fraction=0.4)),
    losses_lib.PairwiseHingeLoss(
        lambda_weight=lw.DCGLambdaWeight(
            topn=5, smooth_fraction=1.0, gain_fn=fns.pow_minus_1,
            rank_discount_fn=fns.log2_inverse)),
    losses_lib.PairwiseLogisticLoss(
        lambda_weight=lw.create_ndcg_lambda_weight_v2()),
    # Yeti neighbor-pair restriction.
    losses_lib.PairwiseLogisticLoss(
        lambda_weight=lw.create_yeti_dcg_lambda_weight()),
    losses_lib.PairwiseLogisticLoss(
        lambda_weight=lw.create_yeti_dcg_lambda_weight(topn=4)),
]

REDUCTIONS = [Reduction.SUM, Reduction.MEAN, Reduction.SUM_BY_NONZERO_WEIGHTS]


@pytest.mark.parametrize('reduction', REDUCTIONS)
@pytest.mark.parametrize('loss', LOSSES, ids=lambda l: repr(l)[:60])
def test_forward_matches_jnp(loss, reduction):
  labels, logits, weights = _data()
  expected = _jnp_loss(loss, labels, logits, weights, reduction)
  got = loss(labels, logits, weights=weights, reduction=reduction)
  np.testing.assert_allclose(float(got), float(expected),
                             rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('loss', LOSSES[:5], ids=lambda l: repr(l)[:60])
def test_gradient_matches_jnp(loss):
  labels, logits, weights = _data(seed=3)

  def f_fused(s):
    return loss(labels, s, weights=weights)

  def f_ref(s):
    return _jnp_loss(loss, labels, s, weights,
                     Reduction.SUM_BY_NONZERO_WEIGHTS)

  g_fused = jax.grad(f_fused)(logits)
  g_ref = jax.grad(f_ref)(logits)
  np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                             rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize('loss', LOSSES, ids=lambda l: repr(l)[:60])
def test_kernel_engages(loss, monkeypatch):
  """Every LOSSES case must actually reach the kernel — otherwise the
  parity tests above compare the jnp path with itself (vacuous)."""
  calls = []
  orig = pallas_ops.fused_pairwise_sums

  def counting(*a, **k):
    calls.append(1)
    return orig(*a, **k)

  monkeypatch.setattr(pallas_ops, 'fused_pairwise_sums', counting)
  labels, logits, weights = _data()
  loss(labels, logits, weights=weights)
  assert calls, f'kernel did not engage for {loss!r}'


@pytest.mark.parametrize('lamw', [
    lw.create_ndcg_lambda_weight(),
    lw.create_ndcg_lambda_weight(smooth_fraction=0.3),
    lw.create_yeti_dcg_lambda_weight(),
], ids=['v1', 'v1_smooth', 'yeti'])
def test_gradient_matches_jnp_dcg_v1_and_yeti(lamw):
  loss = losses_lib.PairwiseLogisticLoss(lambda_weight=lamw)
  labels, logits, weights = _data(seed=6)
  g_fused = jax.grad(lambda s: loss(labels, s, weights=weights))(logits)
  pallas_ops.set_enabled(False)
  g_ref = jax.grad(lambda s: loss(labels, s, weights=weights))(logits)
  pallas_ops.set_enabled(True)
  np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                             rtol=1e-4, atol=1e-6)


def test_gradient_matches_jnp_dcg_v2():
  # Rank computation uses sort; grads flow only through the loss surface
  # (weights are stop_gradient on both paths).
  loss = losses_lib.PairwiseLogisticLoss(
      lambda_weight=lw.DCGLambdaWeightV2(
          gain_fn=fns.pow_minus_1, rank_discount_fn=fns.log2_inverse))
  labels, logits, weights = _data(seed=5)
  g_fused = jax.grad(lambda s: loss(labels, s, weights=weights))(logits)
  pallas_ops.set_enabled(False)
  g_ref = jax.grad(lambda s: loss(labels, s, weights=weights))(logits)
  pallas_ops.set_enabled(True)
  np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                             rtol=1e-4, atol=1e-6)


def test_no_weights_and_full_mask():
  loss = losses_lib.PairwiseLogisticLoss()
  labels, logits, _ = _data(seed=7, with_padding=False)
  expected = _jnp_loss(loss, labels, logits, None,
                       Reduction.SUM_BY_NONZERO_WEIGHTS)
  got = loss(labels, logits)
  np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_odd_batch_padding():
  loss = losses_lib.PairwiseLogisticLoss()
  labels, logits, weights = _data(b=3, l=7, seed=9)
  expected = _jnp_loss(loss, labels, logits, weights,
                       Reduction.SUM_BY_NONZERO_WEIGHTS)
  got = loss(labels, logits, weights=weights)
  np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_fallback_for_unkernelized_config():
  # MSE pairwise loss is not kernelized; __call__ must still work.
  loss = losses_lib.PairwiseMSELoss()
  labels, logits, weights = _data(seed=11)
  out = loss(labels, logits, weights=weights)
  assert np.isfinite(float(out))


@pytest.mark.parametrize('tile_rows', [8, 64])
def test_tile_rows_variants_match(tile_rows, monkeypatch):
  monkeypatch.setattr(pk, 'TILE_ROWS', tile_rows)
  loss = losses_lib.PairwiseLogisticLoss()
  labels, logits, weights = _data(b=4, l=40, seed=21)
  got = loss(labels, logits, weights=weights)
  expected = _jnp_loss(loss, labels, logits, weights,
                       Reduction.SUM_BY_NONZERO_WEIGHTS)
  np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_explicit_mask_with_negative_labels_matches_jnp():
  """The fused path's weight/gain masking uses is_label_valid(labels)
  (the jnp normalize_weights semantics), not the caller's mask."""
  labels, logits, weights = _data(seed=9)
  mask = jnp.ones_like(labels, bool)  # all-true mask; labels have -1s
  for loss in (losses_lib.PairwiseLogisticLoss(),
               losses_lib.PairwiseLogisticLoss(
                   lambda_weight=lw.DCGLambdaWeightV2(
                       gain_fn=fns.pow_minus_1,
                       rank_discount_fn=fns.log2_inverse))):
    fused = loss(labels, logits, weights=weights, mask=mask)
    pallas_ops.set_enabled(False)
    try:
      ref = loss(labels, logits, weights=weights, mask=mask)
    finally:
      pallas_ops.set_enabled(True)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5,
                               atol=1e-6)


def test_hinge_gradient_at_boundary_matches_autodiff():
  """dl/dd at exactly d == 1 must match jax.grad of jnp.maximum (-0.5)."""
  labels = jnp.asarray([[1.0, 0.0]])
  logits = jnp.asarray([[1.0, 0.0]])  # the (0,1) pair has d exactly 1.0
  loss = losses_lib.PairwiseHingeLoss()

  g_fused = jax.grad(lambda s: loss(labels, s))(logits)
  pallas_ops.set_enabled(False)
  try:
    g_ref = jax.grad(lambda s: loss(labels, s))(logits)
  finally:
    pallas_ops.set_enabled(True)
  np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                             rtol=1e-6, atol=1e-7)


def test_force_on_cpu_without_interpret_falls_back():
  """set_enabled(True) off-TPU without interpret mode must not crash —
  the kernel silently defers to the jnp path."""
  pk._INTERPRET = False
  try:
    labels, logits, weights = _data(seed=3)
    out = losses_lib.PairwiseLogisticLoss()(labels, logits, weights=weights)
    assert np.isfinite(float(out))
  finally:
    pk._INTERPRET = True
