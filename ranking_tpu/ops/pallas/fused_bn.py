"""Fused Dense -> BatchNorm -> ReLU tower (train mode) for TPU.

The reference's default scoring tower interleaves batch norm with every
dense layer (tensorflow_ranking/python/keras/layers.py:26-77). Under XLA,
each train-mode BN costs several extra HBM passes over the [B*L, F]
activations: a stats reduction, a materialized normalize, and the mirror
passes in the backward — measured at ~2x the whole step time on the
flagship workload (benchmarks/profile_step.py: 2.17 ms BN-on vs 1.06 ms
BN-off).

This module closes that gap by restructuring the whole hidden chain into
one Pallas kernel per layer:

* forward: ``y_l = relu(y_{l-1} * s + t) @ W + b`` — the previous layer's
  BN fold (scale s, shift t) and ReLU are applied to input tiles already
  in VMEM (free VPU work against the matmul), and the column sums /
  sums-of-squares for THIS layer's BN are accumulated in the matmul
  epilogue. Each activation is written to HBM exactly once and read
  exactly once; batch norm adds no activation-sized HBM traffic at all.
* backward: one stats kernel (reads g, y once) computes the BN reduction
  terms; one matmul kernel (reads g, y, y_prev once) reconstructs
  ``dy = s*dyhat - y*c2 - c1`` on the fly and emits both ``dx = dy @ W^T``
  and ``dW = z_prev^T @ dy`` without materializing ``dy``.

Semantics are EXACTLY flax's ``Dense -> BatchNorm(use_fast_variance) ->
relu`` chain in train mode (same fast-variance formula, variance clip,
epsilon, float32 stats); equality tests run both paths side by side
(tests/test_pallas_fused_bn.py). The BN mean/var per layer are returned
so the caller can apply flax's running-average update.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_N = 256
MAX_TILE_F = 512
VMEM_BUDGET = 14 * 1024 * 1024

_FORCED: Optional[bool] = None  # None = auto (TPU only)


def set_enabled(value: Optional[bool]) -> None:
  """True forces the fused tower (interpret mode off-TPU, for tests);
  False disables; None restores the default (on when running on TPU)."""
  global _FORCED
  _FORCED = value


def _interpret() -> bool:
  return jax.default_backend() != 'tpu'


def enabled() -> bool:
  if _FORCED is not None:
    return _FORCED
  return jax.default_backend() == 'tpu'


def supported(num_features: int, hidden_dims: Sequence[int]) -> bool:
  """VMEM feasibility of the per-layer kernels at these widths."""
  dims = [num_features] + list(hidden_dims)
  for f_in, f_out in zip(dims[:-1], dims[1:]):
    tf = min(f_out, MAX_TILE_F)
    fwd = 4 * (TILE_N * f_in + f_in * tf + TILE_N * tf + 4 * f_in + 4 * tf)
    bwd = 4 * (2 * TILE_N * f_out + TILE_N * f_in + 2 * f_in * f_out
               + TILE_N * f_in + 8 * f_out + 4 * f_in)
    if max(fwd, bwd) > VMEM_BUDGET:
      return False
  return True


def _cdiv(a: int, b: int) -> int:
  return -(-a // b)


# ---------------------------------------------------------------------------
# Forward kernel: prologue(BN-fold+ReLU) -> matmul -> stats epilogue
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, s_ref, t_ref, w_ref, b_ref, y_ref, sum_ref, ssq_ref,
                *, relu_in: bool, n_valid: int):
  i = pl.program_id(1)
  z = x_ref[:]
  z = z * s_ref[:] + t_ref[:]
  if relu_in:
    z = jnp.maximum(z, 0.0)
  y = jnp.dot(z, w_ref[:], preferred_element_type=jnp.float32) + b_ref[:]
  y_ref[:] = y

  rows = i * TILE_N + jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
  ym = jnp.where(rows < n_valid, y, 0.0)

  @pl.when(i == 0)
  def _():
    sum_ref[:] = jnp.zeros_like(sum_ref)
    ssq_ref[:] = jnp.zeros_like(ssq_ref)

  sum_ref[:] += jnp.sum(ym, axis=0, keepdims=True)
  ssq_ref[:] += jnp.sum(ym * ym, axis=0, keepdims=True)


def _layer_forward(x, s_in, t_in, w, b, *, relu_in: bool, n_valid: int):
  n_pad, f_in = x.shape
  f_out = w.shape[1]
  tf = min(f_out, MAX_TILE_F)
  grid = (_cdiv(f_out, tf), _cdiv(n_pad, TILE_N))

  y, col_sum, col_ssq = pl.pallas_call(
      functools.partial(_fwd_kernel, relu_in=relu_in, n_valid=n_valid),
      grid=grid,
      in_specs=[
          pl.BlockSpec((TILE_N, f_in), lambda j, i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_in), lambda j, i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_in), lambda j, i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((f_in, tf), lambda j, i: (0, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, tf), lambda j, i: (0, j),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((TILE_N, tf), lambda j, i: (i, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, tf), lambda j, i: (0, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, tf), lambda j, i: (0, j),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((n_pad, f_out), jnp.float32),
          jax.ShapeDtypeStruct((1, f_out), jnp.float32),
          jax.ShapeDtypeStruct((1, f_out), jnp.float32),
      ],
      cost_estimate=pl.CostEstimate(
          flops=2 * n_pad * f_in * f_out,
          bytes_accessed=4 * (n_pad * f_in + f_in * f_out + n_pad * f_out),
          transcendentals=0),
      interpret=_interpret(),
  )(x, s_in.reshape(1, f_in), t_in.reshape(1, f_in), w, b.reshape(1, f_out))
  return y, col_sum[0], col_ssq[0]


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_stats_kernel(g_ref, y_ref, s_ref, t_ref, s1_ref, s2_ref):
  i = pl.program_id(1)
  g = g_ref[:]
  y = y_ref[:]
  yhat = y * s_ref[:] + t_ref[:]
  dyhat = jnp.where(yhat > 0, g, 0.0)

  @pl.when(i == 0)
  def _():
    s1_ref[:] = jnp.zeros_like(s1_ref)
    s2_ref[:] = jnp.zeros_like(s2_ref)

  s1_ref[:] += jnp.sum(dyhat, axis=0, keepdims=True)
  s2_ref[:] += jnp.sum(dyhat * y, axis=0, keepdims=True)


def _bwd_stats(g, y, s, t):
  n_pad, f = y.shape
  tf = min(f, MAX_TILE_F)
  grid = (_cdiv(f, tf), _cdiv(n_pad, TILE_N))
  s1, s2 = pl.pallas_call(
      _bwd_stats_kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((TILE_N, tf), lambda j, i: (i, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N, tf), lambda j, i: (i, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, tf), lambda j, i: (0, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, tf), lambda j, i: (0, j),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((1, tf), lambda j, i: (0, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, tf), lambda j, i: (0, j),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((1, f), jnp.float32),
          jax.ShapeDtypeStruct((1, f), jnp.float32),
      ],
      interpret=_interpret(),
  )(g, y, s.reshape(1, f), t.reshape(1, f))
  return s1[0], s2[0]


def _bwd_mats_kernel(g_ref, y_ref, s_ref, t_ref, c1_ref, c2_ref,
                     xin_ref, sin_ref, tin_ref, w_ref, dx_ref, dw_ref,
                     *, relu_in: bool, n_valid: int):
  i = pl.program_id(0)
  g = g_ref[:]
  y = y_ref[:]
  yhat = y * s_ref[:] + t_ref[:]
  dyhat = jnp.where(yhat > 0, g, 0.0)
  dy = s_ref[:] * dyhat - y * c2_ref[:] - c1_ref[:]
  rows = i * TILE_N + jax.lax.broadcasted_iota(jnp.int32, dy.shape, 0)
  dy = jnp.where(rows < n_valid, dy, 0.0)

  dx_ref[:] = jax.lax.dot_general(
      dy, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)

  z = xin_ref[:]
  z = z * sin_ref[:] + tin_ref[:]
  if relu_in:
    z = jnp.maximum(z, 0.0)

  @pl.when(i == 0)
  def _():
    dw_ref[:] = jnp.zeros_like(dw_ref)

  dw_ref[:] += jax.lax.dot_general(
      z, dy, dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)


def _bwd_mats(g, y, s, t, c1, c2, x_in, s_in, t_in, w, *, relu_in: bool,
              n_valid: int):
  n_pad, f_out = y.shape
  f_in = x_in.shape[1]
  grid = (_cdiv(n_pad, TILE_N),)
  dx, dw = pl.pallas_call(
      functools.partial(_bwd_mats_kernel, relu_in=relu_in, n_valid=n_valid),
      grid=grid,
      in_specs=[
          pl.BlockSpec((TILE_N, f_out), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N, f_out), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N, f_in), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_in), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_in), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((f_in, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((TILE_N, f_in), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((f_in, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((n_pad, f_in), jnp.float32),
          jax.ShapeDtypeStruct((f_in, f_out), jnp.float32),
      ],
      cost_estimate=pl.CostEstimate(
          flops=4 * n_pad * f_in * f_out,
          bytes_accessed=4 * (3 * n_pad * f_out + 2 * n_pad * f_in
                              + 2 * f_in * f_out),
          transcendentals=0),
      interpret=_interpret(),
  )(g, y, s.reshape(1, f_out), t.reshape(1, f_out), c1.reshape(1, f_out),
    c2.reshape(1, f_out), x_in, s_in.reshape(1, f_in),
    t_in.reshape(1, f_in), w)
  return dx, dw


# ---------------------------------------------------------------------------
# The fused tower op (custom VJP)
# ---------------------------------------------------------------------------


def _bn_fold(col_sum, col_ssq, gamma, beta, n: int, eps: float):
  mu = col_sum / n
  var = jnp.maximum(0.0, col_ssq / n - mu * mu)
  sig_inv = jax.lax.rsqrt(var + eps)
  s = gamma * sig_inv
  t = beta - mu * s
  return mu, var, sig_inv, s, t


def _pad_rows(x, n_pad):
  if x.shape[0] == n_pad:
    return x
  return jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_bn_mlp(x, ws, bs, gammas, betas, eps, n_valid):
  """relu(BN(x @ W_l + b_l)) chained over layers; returns
  (last_hidden_activations [N, F_L], means tuple, vars tuple).

  The mean/var outputs are for running-average updates only and are
  non-differentiable (their cotangents are ignored).
  """
  out, _ = _fused_fwd(x, ws, bs, gammas, betas, eps, n_valid)
  return out


def _fused_fwd(x, ws, bs, gammas, betas, eps, n_valid):
  n_pad = _cdiv(n_valid, TILE_N) * TILE_N
  x_p = _pad_rows(x, n_pad)
  f_in0 = x.shape[1]

  ys, sums, ssqs, folds = [], [], [], []
  s_in = jnp.ones((f_in0,), jnp.float32)
  t_in = jnp.zeros((f_in0,), jnp.float32)
  h = x_p
  relu_in = False
  for l, (w, b, gamma, beta) in enumerate(zip(ws, bs, gammas, betas)):
    y, col_sum, col_ssq = _layer_forward(
        h, s_in, t_in, w, b, relu_in=relu_in, n_valid=n_valid)
    mu, var, sig_inv, s, t = _bn_fold(col_sum, col_ssq, gamma, beta,
                                      n_valid, eps)
    ys.append(y)
    sums.append(col_sum)
    ssqs.append(col_ssq)
    folds.append((mu, var, sig_inv, s, t))
    h, s_in, t_in, relu_in = y, s, t, True

  y_last = ys[-1]
  _, _, _, s_last, t_last = folds[-1]
  a_last = jnp.maximum(y_last * s_last[None, :] + t_last[None, :], 0.0)
  a_last = a_last[:n_valid]

  means = tuple(f[0] for f in folds)
  vars_ = tuple(f[1] for f in folds)
  residuals = (x_p, tuple(ys), tuple(sums), tuple(folds), tuple(ws),
               tuple(gammas))
  return (a_last, means, vars_), residuals


def _fused_bwd(eps, n_valid, residuals, cotangents):
  del eps
  g_a, _, _ = cotangents  # mean/var cotangents are ignored (stats outputs)
  x_p, ys, sums, folds, ws, gammas = residuals
  n_pad = x_p.shape[0]
  num_layers = len(ys)

  g = _pad_rows(g_a, n_pad)
  d_ws, d_bs, d_gammas, d_betas = [], [], [], []
  for l in range(num_layers - 1, -1, -1):
    y = ys[l]
    mu, var, sig_inv, s, t = folds[l]
    s1, s2 = _bwd_stats(g, y, s, t)
    dbeta = s1
    dgamma = (s2 - mu * s1) * sig_inv
    c2 = s * sig_inv * dgamma / n_valid
    c1 = s * (s1 / n_valid - mu * sig_inv * dgamma / n_valid)
    db = s * s1 - sums[l] * c2 - n_valid * c1

    if l == 0:
      x_in = x_p
      s_in = jnp.ones((x_p.shape[1],), jnp.float32)
      t_in = jnp.zeros((x_p.shape[1],), jnp.float32)
      relu_in = False
    else:
      x_in = ys[l - 1]
      _, _, _, s_in, t_in = folds[l - 1]
      relu_in = True

    dx, dw = _bwd_mats(g, y, s, t, c1, c2, x_in, s_in, t_in, ws[l],
                       relu_in=relu_in, n_valid=n_valid)
    d_ws.append(dw)
    d_bs.append(db)
    d_gammas.append(dgamma)
    d_betas.append(dbeta)
    g = dx

  dx0 = g[:n_valid] if n_valid != n_pad else g
  return (dx0, tuple(reversed(d_ws)), tuple(reversed(d_bs)),
          tuple(reversed(d_gammas)), tuple(reversed(d_betas)))


fused_bn_mlp.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# jnp reference (flax-equivalent semantics, for tests)
# ---------------------------------------------------------------------------


def reference_bn_mlp(x, ws, bs, gammas, betas, eps=1e-5):
  """Pure-jnp mirror of fused_bn_mlp: Dense -> train-mode BatchNorm
  (fast variance, clip, float32) -> relu per layer."""
  h = x
  means, vars_ = [], []
  for w, b, gamma, beta in zip(ws, bs, gammas, betas):
    y = h @ w + b
    mu = jnp.mean(y, axis=0)
    var = jnp.maximum(0.0, jnp.mean(y * y, axis=0) - mu * mu)
    yhat = (y - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    h = jnp.maximum(yhat, 0.0)
    means.append(mu)
    vars_.append(var)
  return h, tuple(means), tuple(vars_)
