"""Fused approx-ranks kernel == jnp reference, values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ranking_tpu.ops import losses as jl
from ranking_tpu.ops import pallas as pallas_ops
from ranking_tpu.ops import sorting
from ranking_tpu.ops.pallas import approx as ak


@pytest.fixture(autouse=True)
def _interpret():
  ak._INTERPRET = True
  yield
  ak._INTERPRET = False


def _jnp_approx(logits):
  pairs = jax.nn.sigmoid(logits[:, None, :] - logits[:, :, None])
  return jnp.sum(pairs, axis=-1) + 0.5


@pytest.mark.parametrize('shape', [(5, 11), (8, 32), (3, 70)])
def test_forward_matches(shape):
  rng = np.random.RandomState(0)
  logits = jnp.asarray(rng.randn(*shape).astype(np.float32) * 2)
  got = ak.approx_ranks_fused(logits)
  np.testing.assert_allclose(np.asarray(got), np.asarray(_jnp_approx(logits)),
                             rtol=1e-5, atol=1e-5)


def test_gradient_matches():
  rng = np.random.RandomState(1)
  logits = jnp.asarray(rng.randn(4, 13).astype(np.float32))
  ct = jnp.asarray(rng.randn(4, 13).astype(np.float32))
  g_fused = jax.vjp(ak.approx_ranks_fused, logits)[1](ct)[0]
  g_ref = jax.vjp(_jnp_approx, logits)[1](ct)[0]
  np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                             rtol=1e-4, atol=1e-5)


def test_approx_ndcg_loss_end_to_end_with_kernel():
  pallas_ops.set_enabled(True)
  try:
    rng = np.random.RandomState(2)
    labels = rng.randint(0, 4, size=(6, 9)).astype(np.float32)
    labels[:, -2:] = -1.0
    logits = jnp.asarray(rng.randn(6, 9).astype(np.float32))
    loss = jl.ApproxNDCGLoss(name='a', temperature=0.1)
    fused_val = float(loss(labels, logits))
    fused_grad = jax.grad(lambda s: loss(labels, s))(logits)
    pallas_ops.set_enabled(False)
    ref_val = float(loss(labels, logits))
    ref_grad = jax.grad(lambda s: loss(labels, s))(logits)
    np.testing.assert_allclose(fused_val, ref_val, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fused_grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=1e-6)
  finally:
    pallas_ops.set_enabled(None)


def test_routing_through_sorting():
  pallas_ops.set_enabled(True)
  try:
    logits = jnp.asarray(np.random.RandomState(3).randn(4, 10)
                         .astype(np.float32))
    got = sorting.approx_ranks(logits)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_jnp_approx(logits)), rtol=1e-5)
  finally:
    pallas_ops.set_enabled(None)
