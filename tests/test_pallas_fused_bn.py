"""Fused Dense+BN+ReLU tower: equality vs the standard flax chain.

All tests run the Pallas kernels in interpret mode on CPU (conftest
forces the CPU backend; ``fused_bn.set_enabled(True)`` forces the fused
path). Three layers of ground truth:

* full-valid mask: the fused tower must equal flax
  ``Dense -> BatchNorm -> relu`` exactly (forward, gradients, and the
  running-statistics updates);
* arbitrary mask: the fused tower must equal the masked jnp mirror
  ``reference_bn_mlp(mask=...)`` including gradients through the masked
  statistics (autodiff of the mirror is the oracle);
* the DNNScorer integration must keep logits finite/masked and accept
  both paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ranking_tpu.models import layers as layers_lib
from ranking_tpu.ops.pallas import fused_bn


@pytest.fixture(autouse=True)
def _force_fused():
  fused_bn.set_enabled(True)
  yield
  fused_bn.set_enabled(None)


def _mlp_params(seed, f0, dims):
  rng = np.random.RandomState(seed)
  ws, bs, gs, betas = [], [], [], []
  f_in = f0
  for d in dims:
    ws.append(jnp.asarray(rng.randn(f_in, d).astype(np.float32) * 0.1))
    bs.append(jnp.asarray(rng.randn(d).astype(np.float32) * 0.1))
    gs.append(jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32)))
    betas.append(jnp.asarray(0.1 * rng.randn(d).astype(np.float32)))
    f_in = d
  return ws, bs, gs, betas


@pytest.mark.parametrize('n', [512, 700])  # multiple and non-multiple of tile
def test_fused_mlp_forward_matches_reference(n):
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.randn(n, 136).astype(np.float32))
  ws, bs, gs, betas = _mlp_params(1, 136, [64, 32])
  mask = jnp.ones((n,), jnp.float32)
  out, means, vars_ = fused_bn.fused_bn_mlp(x, mask, ws, bs, gs, betas,
                                            1e-5)
  rout, rmeans, rvars = fused_bn.reference_bn_mlp(x, ws, bs, gs, betas)
  np.testing.assert_allclose(np.asarray(out), np.asarray(rout),
                             rtol=1e-4, atol=1e-5)
  for m, rm in zip(means, rmeans):
    np.testing.assert_allclose(np.asarray(m), np.asarray(rm),
                               rtol=1e-4, atol=1e-5)
  for v, rv in zip(vars_, rvars):
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv),
                               rtol=1e-4, atol=1e-5)


def test_fused_mlp_masked_forward_and_grads():
  rng = np.random.RandomState(2)
  n = 600
  x = jnp.asarray(rng.randn(n, 48).astype(np.float32))
  ws, bs, gs, betas = _mlp_params(3, 48, [32, 16])
  mask = jnp.asarray((rng.rand(n) > 0.35).astype(np.float32))
  weights = jnp.asarray(rng.randn(n, 16).astype(np.float32))

  def loss_fused(x, ws, bs, gs, betas):
    out, _, _ = fused_bn.fused_bn_mlp(x, mask, ws, bs, gs, betas, 1e-5)
    return jnp.sum(out * weights)

  def loss_ref(x, ws, bs, gs, betas):
    out, _, _ = fused_bn.reference_bn_mlp(x, ws, bs, gs, betas, mask=mask)
    return jnp.sum(out * weights)

  args = (x, tuple(ws), tuple(bs), tuple(gs), tuple(betas))
  np.testing.assert_allclose(float(loss_fused(*args)),
                             float(loss_ref(*args)), rtol=1e-4)
  gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
  gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
  for la, lb in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-3, atol=2e-4)


def test_wide_tower_keeps_fused_path_without_fold():
  """When the fold-dW0 VMEM extra does not fit, the fused path must
  stay supported (the backward falls back to the dedicated first-layer
  dW kernel) — a wide tower must not silently lose the whole kernel.
  supported() therefore must NOT count the fold extra: there must exist
  configs where the base kernels fit but the fold does not."""
  assert fused_bn.fold_dw0_fits(136, 1024, 512)  # flagship folds
  assert not fused_bn.fold_dw0_fits(132, 1024, 512)  # 8-row rule
  decoupled = [
      (f0, dims) for f0 in range(256, 2049, 64)
      for dims in ((512, 512), (1024, 512), (768, 384))
      if fused_bn.supported(f0, dims)
      and not fused_bn.fold_dw0_fits(f0, dims[0], dims[1])]
  assert decoupled, ('no config separates supported() from '
                     'fold_dw0_fits — the gates are conflated again')


def test_fused_mlp_grads_unaligned_features():
  """num_features % 8 != 0 disables the folded first-layer dW (Mosaic's
  8-row output-tile rule) — the dedicated _bwd_dw_only fallback must
  stay correct."""
  rng = np.random.RandomState(7)
  n = 300
  x = jnp.asarray(rng.randn(n, 42).astype(np.float32))
  ws, bs, gs, betas = _mlp_params(9, 42, [32, 24])
  mask = jnp.asarray((rng.rand(n) > 0.3).astype(np.float32))
  weights = jnp.asarray(rng.randn(n, 24).astype(np.float32))

  def loss(fn, x, ws, bs, gs, betas):
    kw = {'mask': mask} if fn is fused_bn.reference_bn_mlp else {}
    args = (x, mask) if fn is fused_bn.fused_bn_mlp else (x,)
    out, _, _ = fn(*args, ws, bs, gs, betas, 1e-5, **kw)
    return jnp.sum(out * weights)

  args = (x, tuple(ws), tuple(bs), tuple(gs), tuple(betas))
  gf = jax.grad(lambda *a: loss(fused_bn.fused_bn_mlp, *a),
                argnums=(0, 1, 2, 3, 4))(*args)
  gr = jax.grad(lambda *a: loss(fused_bn.reference_bn_mlp, *a),
                argnums=(0, 1, 2, 3, 4))(*args)
  for la, lb in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-3, atol=2e-4)


def test_fused_mlp_input_grad_false_param_grads_unchanged():
  """input_grad=False (≡ stop_gradient on x): identical parameter
  gradients via the no-dx-write backward variant, zero input cotangent."""
  rng = np.random.RandomState(11)
  n = 600
  x = jnp.asarray(rng.randn(n, 48).astype(np.float32))
  ws, bs, gs, betas = _mlp_params(3, 48, [32, 16])
  mask = jnp.asarray((rng.rand(n) > 0.35).astype(np.float32))
  weights = jnp.asarray(rng.randn(n, 16).astype(np.float32))

  def loss(x, ws, bs, gs, betas, input_grad):
    out, _, _ = fused_bn.fused_bn_mlp(x, mask, ws, bs, gs, betas, 1e-5,
                                      input_grad=input_grad)
    return jnp.sum(out * weights)

  args = (x, tuple(ws), tuple(bs), tuple(gs), tuple(betas))
  g_on = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3, 4))(*args)
  g_off = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2, 3, 4))(*args)
  assert np.asarray(g_on[0]).any()  # dx nonzero with grads on
  np.testing.assert_array_equal(np.asarray(g_off[0]), 0.0)
  for la, lb in zip(jax.tree.leaves(g_on[1:]), jax.tree.leaves(g_off[1:])):
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-6, atol=1e-7)
  # Single-hidden-layer tower: exercises the l==0-only branch.
  ws1, bs1, gs1, betas1 = _mlp_params(5, 48, [32])
  args1 = (x, tuple(ws1), tuple(bs1), tuple(gs1), tuple(betas1))
  w1 = weights[:, :16].repeat(2, axis=1)

  def loss1(x, ws, bs, gs, betas, input_grad):
    out, _, _ = fused_bn.fused_bn_mlp(x, mask, ws, bs, gs, betas, 1e-5,
                                      input_grad=input_grad)
    return jnp.sum(out * w1)

  g1_on = jax.grad(lambda *a: loss1(*a, True),
                   argnums=(1, 2, 3, 4))(*args1)
  g1_off = jax.grad(lambda *a: loss1(*a, False),
                    argnums=(1, 2, 3, 4))(*args1)
  for la, lb in zip(jax.tree.leaves(g1_on), jax.tree.leaves(g1_off)):
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-6, atol=1e-7)


def test_tower_fused_equals_standard_flax():
  """Full-valid mask: fused Tower == standard flax Tower — forward,
  batch-stats running updates, and parameter gradients."""
  rng = np.random.RandomState(1)
  x = jnp.asarray(rng.randn(600, 136).astype(np.float32))
  tower = layers_lib.Tower(hidden_layer_dims=(64, 32), output_units=1,
                           dropout=0.0)
  variables = tower.init(jax.random.PRNGKey(0), x, training=True)

  def run(enabled):
    fused_bn.set_enabled(enabled)
    return tower.apply(variables, x, training=True,
                       mutable=['batch_stats'])

  out_std, upd_std = run(False)
  out_fused, upd_fused = run(True)
  np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_std),
                             rtol=1e-4, atol=1e-5)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6),
      upd_std, upd_fused)

  def loss(variables, enabled):
    fused_bn.set_enabled(enabled)
    out, _ = tower.apply(variables, x, training=True,
                         mutable=['batch_stats'])
    return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape)))

  g_std = jax.grad(lambda v: loss(v, False))(variables)
  g_fused = jax.grad(lambda v: loss(v, True))(variables)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4),
      g_std, g_fused)


def test_tower_param_tree_identical_between_paths():
  """Checkpoints are interchangeable: init under either path produces
  the same variable tree (names, shapes, values)."""
  rng = np.random.RandomState(4)
  x = jnp.asarray(rng.randn(256, 20).astype(np.float32))
  tower = layers_lib.Tower(hidden_layer_dims=(16, 8), dropout=0.0)
  fused_bn.set_enabled(False)
  v_std = tower.init(jax.random.PRNGKey(7), x, training=True)
  fused_bn.set_enabled(True)
  v_fused = tower.init(jax.random.PRNGKey(7), x, training=True)
  jax.tree.map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      v_std, v_fused)


def test_tower_masked_input_grads():
  """Input cotangents flow through the first-layer dx kernel."""
  rng = np.random.RandomState(5)
  n = 512
  x = jnp.asarray(rng.randn(n, 24).astype(np.float32))
  mask = jnp.asarray((rng.rand(n) > 0.3).astype(np.float32))
  tower = layers_lib.Tower(hidden_layer_dims=(16, 8), output_units=1,
                           dropout=0.0)
  variables = tower.init(jax.random.PRNGKey(0), x, training=True)

  def f_fused(xx):
    fused_bn.set_enabled(True)
    out, _ = tower.apply(variables, xx, training=True, row_mask=mask,
                         mutable=['batch_stats'])
    return jnp.sum(jnp.tanh(out))

  def f_ref(xx):
    p = variables['params']
    ws = [p['Dense_0']['kernel'], p['Dense_1']['kernel']]
    bs = [p['Dense_0']['bias'], p['Dense_1']['bias']]
    gs = [p['BatchNorm_0']['scale'], p['BatchNorm_1']['scale']]
    bes = [p['BatchNorm_0']['bias'], p['BatchNorm_1']['bias']]
    h, _, _ = fused_bn.reference_bn_mlp(xx, ws, bs, gs, bes, mask=mask)
    return jnp.sum(jnp.tanh(h @ p['Dense_2']['kernel']
                            + p['Dense_2']['bias']))

  gx = jax.grad(f_fused)(x)
  gr = jax.grad(f_ref)(x)
  np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                             rtol=2e-3, atol=2e-4)


def test_dnn_scorer_fused_train_step():
  """DNNScorer integration: fused masked-BN path trains end to end and
  produces masked logits."""
  import optax

  from ranking_tpu import models, ops, train
  from ranking_tpu.data.batch import batch_from_labels

  rng = np.random.RandomState(6)
  labels = rng.randint(0, 5, size=(8, 64)).astype(np.float32)
  labels[:, -16:] = -1.0
  batch = batch_from_labels(
      labels=labels,
      examples={'x': rng.randn(8, 64, 16).astype(np.float32)})
  model = models.RankingModel(
      scorer=models.DNNScorer(hidden_layer_dims=(32, 16), dropout=0.0,
                              use_batch_norm=True))
  state = train.create_train_state(
      model, optax.adam(1e-2), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask)
  step = jax.jit(train.make_train_step(
      ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)))
  state, metrics = step(state, batch, jax.random.PRNGKey(1))
  assert np.isfinite(float(metrics['loss']))
  logits = model.apply(state.variables, batch.context, batch.examples,
                       batch.mask, training=False)
  assert np.isfinite(np.asarray(logits)[np.asarray(batch.mask)]).all()


def test_tower_bf16_fused_matches_standard_bf16_accuracy():
  """bf16 activations: the fused path must be as close to f32 truth as
  the standard flax bf16 tower is (same precision class), and the two
  bf16 variants must agree closely with each other."""
  rng = np.random.RandomState(1)
  x = jnp.asarray(rng.randn(600, 136).astype(np.float32))
  t32 = layers_lib.Tower(hidden_layer_dims=(64, 32), output_units=1,
                         dropout=0.0, dtype=jnp.float32)
  tbf = layers_lib.Tower(hidden_layer_dims=(64, 32), output_units=1,
                         dropout=0.0, dtype=jnp.bfloat16)
  variables = t32.init(jax.random.PRNGKey(0), x, training=True)

  def loss(tower, v, enabled):
    fused_bn.set_enabled(enabled)
    out, _ = tower.apply(v, x, training=True, mutable=['batch_stats'])
    return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape)))

  g_ref = jax.grad(lambda v: loss(t32, v, False))(variables)
  g_bf_std = jax.grad(lambda v: loss(tbf, v, False))(variables)
  g_bf_fused = jax.grad(lambda v: loss(tbf, v, True))(variables)

  def rms_err(a, b):
    num = den = 0.0
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
      la = np.asarray(la, np.float64)
      lb = np.asarray(lb, np.float64)
      num += float(np.sum((la - lb) ** 2))
      den += float(np.sum(la ** 2))
    return (num / max(den, 1e-30)) ** 0.5

  std_err = rms_err(g_ref, g_bf_std)
  fused_err = rms_err(g_ref, g_bf_fused)
  cross = rms_err(g_bf_std, g_bf_fused)
  assert fused_err < 1.5 * std_err + 1e-3, (fused_err, std_err)
  assert cross < 0.05, cross
