"""Fused Dense -> (masked) BatchNorm -> ReLU tower (train mode) for TPU.

The reference's default scoring tower interleaves batch norm with every
dense layer (tensorflow_ranking/python/keras/layers.py:26-77), and keeps
padding out of the batch statistics by circularly duplicating valid docs
into the padded rows before the tower (keras/model.py:755-777
organize-valid-indices + gather). Under XLA this costs (a) several extra
HBM passes over the [B*L, F] activations per BN (stats reduction,
materialized normalize, and their backward mirrors) and (b) the index
build + gather machinery itself — together ~2x the whole step
(benchmarks/profile_step.py round 1: 2.17 ms BN-on vs 1.06 ms BN-off).

This module restructures the hidden chain into one Pallas kernel per
layer, and makes the statistics *exactly* mask-weighted instead of
circular-padding-approximated (the TPU-native form of "BN over valid
flattened docs"):

* forward (_fwd_kernel): ``y_l = relu(y_{l-1} * s + t) @ W + b`` — the
  previous layer's BN fold (scale s, shift t) and ReLU apply to input
  tiles already in VMEM, and this layer's masked column sums /
  sums-of-squares accumulate in the matmul epilogue. Each activation is
  written to HBM once and read once; BN adds no activation-sized HBM
  traffic.
* backward: ``_bwd_stats_kernel`` (only for the topmost layer) computes
  the BN reduction terms in one pass; ``_bwd_mats_kernel`` reconstructs
  ``dy = s*dyhat - mask*(y*c2 + c1)`` on the fly, emits ``dx = dy@W^T``
  and ``dW = z_prev^T@dy``, and — in the same epilogue — the NEXT
  iteration's BN reduction terms from the dx tile it just produced, so
  no separate stats pass is needed below the top layer. The first
  layer's dx runs in a separate kernel that XLA dead-code-eliminates
  when input gradients are not needed (raw-feature scorers).

With a full-valid mask this is numerically the flax
``Dense -> BatchNorm(use_fast_variance) -> relu`` chain in train mode
(same fast-variance formula, variance clip, epsilon, float32 stats) —
equality-tested both ways in tests/test_pallas_fused_bn.py. With
padding, statistics are the exact masked moments (weighted by the valid
count) rather than the reference's duplicate-biased approximation; the
jnp mirror ``reference_bn_mlp(mask=...)`` defines those semantics for
the tests.
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

TILE_N = 512       # forward kernel rows per block
TILE_N_BWD = 256   # backward kernels (more resident buffers -> smaller tile;
                   # 384/320 measured slower — MXU wants 128-row multiples
                   # and the 2x256 double-buffer already covers the latency)
MAX_TILE_F = 512
VMEM_BUDGET = 13 * 1024 * 1024

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
    # Tiled blocks are double-buffered by the pipeline (x2).
    fwd = 4 * (2 * TILE_N * (f_in + tf) + f_in * tf + 4 * f_in
               + 4 * tf + 4 * TILE_N)
    bwd = 4 * (2 * TILE_N_BWD * (2 * f_out + 2 * f_in) + 2 * f_in * f_out
               + 16 * f_out + 8 * f_in + 4 * TILE_N_BWD)
    # The layer-1 fold-dW0 extra is NOT counted here: when it does not
    # fit, the backward just uses the dedicated first-layer dW kernel
    # (fold_dw0_fits) — a wide tower must not lose the whole fused path
    # over an optional optimization.
    if max(fwd, bwd) > VMEM_BUDGET:
      return False
  return True


def fold_dw0_fits(f0: int, f_out0: int, f_out1: int) -> bool:
  """VMEM feasibility of folding the first layer's dW terms into layer
  1's backward kernel: the base layer-1 buffers plus the raw-feature
  tile and the A/B accumulators must fit (f0 = num_features, f_out0 =
  layer-0 width = layer-1's f_in, f_out1 = layer-1 width)."""
  if f0 % 8 != 0:  # Mosaic's output-tile rule for the A/B blocks
    return False
  f_in = f_out0
  bwd = 4 * (2 * TILE_N_BWD * (2 * f_out1 + 2 * f_in) + 2 * f_in * f_out1
             + 16 * f_out1 + 8 * f_in + 4 * TILE_N_BWD)
  extra = 4 * (2 * TILE_N_BWD * f0 + 2 * f0 * f_in)
  return bwd + extra <= VMEM_BUDGET


def _cdiv(a: int, b: int) -> int:
  return -(-a // b)


# ---------------------------------------------------------------------------
# Forward kernel: prologue(BN-fold+ReLU) -> matmul -> masked stats epilogue
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, m_ref, s_ref, t_ref, w_ref, b_ref,
                y_ref, sum_ref, ssq_ref, *, relu_in: bool):
  i = pl.program_id(1)
  z = x_ref[:].astype(jnp.float32)
  z = z * s_ref[:] + t_ref[:]
  if relu_in:
    z = jnp.maximum(z, 0.0)
  y = jnp.dot(z.astype(w_ref.dtype), w_ref[:],
              preferred_element_type=jnp.float32) + b_ref[:]
  y_ref[:] = y.astype(y_ref.dtype)

  ym = y * m_ref[:]

  @pl.when(i == 0)
  def _():
    sum_ref[:] = jnp.zeros_like(sum_ref)
    ssq_ref[:] = jnp.zeros_like(ssq_ref)

  sum_ref[:] += jnp.sum(ym, axis=0, keepdims=True)
  ssq_ref[:] += jnp.sum(ym * y, axis=0, keepdims=True)


def _layer_forward(x, mask_col, s_in, t_in, w, b, *, relu_in: bool,
                   act_dtype=jnp.float32):
  n_pad, f_in = x.shape
  f_out = w.shape[1]
  w = w.astype(act_dtype)
  tf = min(f_out, MAX_TILE_F)
  grid = (_cdiv(f_out, tf), _cdiv(n_pad, TILE_N))

  y, col_sum, col_ssq = pl.pallas_call(
      functools.partial(_fwd_kernel, relu_in=relu_in),
      grid=grid,
      in_specs=[
          pl.BlockSpec((TILE_N, f_in), lambda j, i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N, 1), lambda j, i: (i, 0),
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
          jax.ShapeDtypeStruct((n_pad, f_out), act_dtype),
          jax.ShapeDtypeStruct((1, f_out), jnp.float32),
          jax.ShapeDtypeStruct((1, f_out), jnp.float32),
      ],
      cost_estimate=pl.CostEstimate(
          flops=2 * n_pad * f_in * f_out,
          bytes_accessed=4 * (n_pad * f_in + f_in * f_out + n_pad * f_out),
          transcendentals=0),
      interpret=_interpret(),
  )(x, mask_col, s_in.reshape(1, f_in), t_in.reshape(1, f_in), w,
    b.reshape(1, f_out))
  return y, col_sum[0], col_ssq[0]


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_stats_kernel(g_ref, y_ref, s_ref, t_ref, s1_ref, s2_ref):
  """One-pass BN reduction terms for the topmost layer only."""
  i = pl.program_id(1)
  g = g_ref[:].astype(jnp.float32)
  y = y_ref[:].astype(jnp.float32)
  yhat = y * s_ref[:] + t_ref[:]
  # Unmasked: every row's yhat depends on the (masked) statistics and on
  # beta/gamma, so the reduction terms sum over ALL rows; the mask gates
  # only the dy correction term (see _dy_tile).
  dyhat = jnp.where(yhat > 0, g, 0.0)

  @pl.when(i == 0)
  def _():
    s1_ref[:] = jnp.zeros_like(s1_ref)
    s2_ref[:] = jnp.zeros_like(s2_ref)

  s1_ref[:] += jnp.sum(dyhat, axis=0, keepdims=True)
  s2_ref[:] += jnp.sum(dyhat * y, axis=0, keepdims=True)


def _bwd_stats(g, y, s, t):
  # Note: the reductions are deliberately unmasked (every row's yhat
  # depends on the masked statistics), so no mask operand is streamed.
  n_pad, f = y.shape
  tf = min(f, MAX_TILE_F)
  grid = (_cdiv(f, tf), _cdiv(n_pad, TILE_N_BWD))
  s1, s2 = pl.pallas_call(
      _bwd_stats_kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((TILE_N_BWD, tf), lambda j, i: (i, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N_BWD, tf), lambda j, i: (i, j),
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


def _dy_tile(g, y, m, s, t, c1, c2):
  """dy = s*dyhat - mask*(y*c2 + c1); dyhat = relu'(yhat) * g.

  The direct term applies to every row; the statistics-correction term
  only to rows that participated in the masked moments."""
  g = g.astype(jnp.float32)
  y = y.astype(jnp.float32)
  yhat = y * s + t
  dyhat = jnp.where(yhat > 0, g, 0.0)
  return s * dyhat - m * (y * c2 + c1)


def _bwd_mats_kernel(*refs, relu_in: bool, emit_prev_stats: bool,
                     emit_prev_dw: bool, emit_dx: bool):
  it = iter(refs)
  (g_ref, y_ref, m_ref, s_ref, t_ref, c1_ref, c2_ref,
   xin_ref, sin_ref, tin_ref, w_ref) = (next(it) for _ in range(11))
  x0_ref = next(it) if emit_prev_dw else None
  dx_ref = next(it) if emit_dx else None
  dw_ref, s1_ref, s2_ref = (next(it) for _ in range(3))
  if emit_prev_dw:
    a_ref, b_ref = next(it), next(it)
  i = pl.program_id(0)
  m = m_ref[:]
  dy = _dy_tile(g_ref[:], y_ref[:], m, s_ref[:], t_ref[:], c1_ref[:],
                c2_ref[:])

  dx = jax.lax.dot_general(
      dy.astype(w_ref.dtype), w_ref[:],
      dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  if emit_dx:
    dx_ref[:] = dx.astype(dx_ref.dtype)

  x_in = xin_ref[:].astype(jnp.float32)
  zhat = x_in * sin_ref[:] + tin_ref[:]
  z = jnp.maximum(zhat, 0.0) if relu_in else zhat

  @pl.when(i == 0)
  def _():
    dw_ref[:] = jnp.zeros_like(dw_ref)
    if emit_prev_stats:
      s1_ref[:] = jnp.zeros_like(s1_ref)
      s2_ref[:] = jnp.zeros_like(s2_ref)
    if emit_prev_dw:
      a_ref[:] = jnp.zeros_like(a_ref)
      b_ref[:] = jnp.zeros_like(b_ref)

  dw_ref[:] += jax.lax.dot_general(
      z.astype(w_ref.dtype), dy.astype(w_ref.dtype),
      dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)

  if emit_prev_stats:
    # The next (lower) layer's BN reduction terms, from the dx tile that
    # is still in VMEM — saves that layer's separate stats pass.
    dyhat_prev = jnp.where(zhat > 0, dx.astype(jnp.float32), 0.0)
    s1_ref[:] += jnp.sum(dyhat_prev, axis=0, keepdims=True)
    s2_ref[:] += jnp.sum(dyhat_prev * x_in, axis=0, keepdims=True)
    if emit_prev_dw:
      # First-layer dW matmul terms, from tiles already in VMEM:
      #   dy0 = s0*dyhat0 - m*(y0*c2_0 + c1_0)
      #   dW0 = x^T dy0 = s0*(x^T dyhat0) - c2_0*(x^T (m*y0)) - c1_0*(x^T m)
      # c1_0/c2_0 only exist after this kernel's own s1/s2 reduction, so
      # accumulate the two matmuls A = x^T dyhat0 and B = x^T (m*y0) here
      # (x is the cheap raw-feature stream) and combine outside. This
      # removes the dedicated first-layer dW kernel, whose g0/y0 re-read
      # was ~19% of the whole BN-on step's HBM traffic.
      x0 = x0_ref[:].astype(w_ref.dtype)
      a_ref[:] += jax.lax.dot_general(
          x0, dyhat_prev.astype(w_ref.dtype),
          dimension_numbers=(((0,), (0,)), ((), ())),
          preferred_element_type=jnp.float32)
      b_ref[:] += jax.lax.dot_general(
          x0, (m * x_in).astype(w_ref.dtype),
          dimension_numbers=(((0,), (0,)), ((), ())),
          preferred_element_type=jnp.float32)


def _bwd_mats(g, y, mask_col, s, t, c1, c2, x_in, s_in, t_in, w,
              *, relu_in: bool, emit_prev_stats: bool, x0=None,
              emit_dx: bool = True):
  n_pad, f_out = y.shape
  f_in = x_in.shape[1]
  act_dtype = y.dtype
  w = w.astype(act_dtype)
  grid = (_cdiv(n_pad, TILE_N_BWD),)
  emit_prev_dw = x0 is not None
  assert emit_dx or emit_prev_dw, 'dx is the only dW0 feed without fold'
  extra_in_specs, extra_out_specs, extra_out_shapes, extra_ops = [], [], [], []
  if emit_prev_dw:
    f0 = x0.shape[1]
    extra_in_specs = [pl.BlockSpec((TILE_N_BWD, f0), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
    extra_out_specs = [pl.BlockSpec((f0, f_in), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)] * 2
    extra_out_shapes = [jax.ShapeDtypeStruct((f0, f_in), jnp.float32)] * 2
    extra_ops = [x0]
  dx_out_specs = [pl.BlockSpec((TILE_N_BWD, f_in), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] if emit_dx else []
  dx_out_shapes = ([jax.ShapeDtypeStruct((n_pad, f_in), act_dtype)]
                   if emit_dx else [])
  outs = pl.pallas_call(
      functools.partial(_bwd_mats_kernel, relu_in=relu_in,
                        emit_prev_stats=emit_prev_stats,
                        emit_prev_dw=emit_prev_dw, emit_dx=emit_dx),
      grid=grid,
      in_specs=[
          pl.BlockSpec((TILE_N_BWD, f_out), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N_BWD, f_out), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N_BWD, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N_BWD, f_in), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_in), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_in), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((f_in, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ] + extra_in_specs,
      out_specs=dx_out_specs + [
          pl.BlockSpec((f_in, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_in), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_in), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ] + extra_out_specs,
      out_shape=dx_out_shapes + [
          jax.ShapeDtypeStruct((f_in, f_out), jnp.float32),
          jax.ShapeDtypeStruct((1, f_in), jnp.float32),
          jax.ShapeDtypeStruct((1, f_in), jnp.float32),
      ] + extra_out_shapes,
      cost_estimate=pl.CostEstimate(
          flops=4 * n_pad * f_in * f_out
                + (4 * n_pad * x0.shape[1] * f_in if emit_prev_dw else 0),
          bytes_accessed=4 * (3 * n_pad * f_out + 2 * n_pad * f_in
                              + 2 * f_in * f_out),
          transcendentals=0),
      interpret=_interpret(),
  )(g, y, mask_col, s.reshape(1, f_out), t.reshape(1, f_out),
    c1.reshape(1, f_out), c2.reshape(1, f_out), x_in,
    s_in.reshape(1, f_in), t_in.reshape(1, f_in), w, *extra_ops)
  outs = list(outs)
  dx = outs.pop(0) if emit_dx else None
  dw, s1, s2 = outs[:3]
  if emit_prev_dw:
    return dx, dw, s1[0], s2[0], outs[3], outs[4]
  return dx, dw, s1[0], s2[0]


def _dx_kernel(g_ref, y_ref, m_ref, s_ref, t_ref, c1_ref, c2_ref, w_ref,
               dx_ref):
  dy = _dy_tile(g_ref[:], y_ref[:], m_ref[:], s_ref[:], t_ref[:],
                c1_ref[:], c2_ref[:])
  dx_ref[:] = jax.lax.dot_general(
      dy.astype(w_ref.dtype), w_ref[:],
      dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32).astype(dx_ref.dtype)


def _bwd_dx_only(g, y, mask_col, s, t, c1, c2, w):
  """First-layer input gradient, in its own kernel so XLA can drop it
  when the caller never consumes input cotangents (raw-feature towers)."""
  n_pad, f_out = y.shape
  f_in = w.shape[0]
  w = w.astype(y.dtype)
  grid = (_cdiv(n_pad, TILE_N_BWD),)
  return pl.pallas_call(
      _dx_kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((TILE_N_BWD, f_out), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N_BWD, f_out), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N_BWD, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((f_in, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((TILE_N_BWD, f_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n_pad, f_in), jnp.float32),
      interpret=_interpret(),
  )(g, y, mask_col, s.reshape(1, f_out), t.reshape(1, f_out),
    c1.reshape(1, f_out), c2.reshape(1, f_out), w)


def _dw_only_kernel(g_ref, y_ref, m_ref, s_ref, t_ref, c1_ref, c2_ref,
                    xin_ref, sin_ref, tin_ref, dw_ref, *, relu_in: bool):
  i = pl.program_id(0)
  dy = _dy_tile(g_ref[:], y_ref[:], m_ref[:], s_ref[:], t_ref[:],
                c1_ref[:], c2_ref[:])
  x_in = xin_ref[:].astype(jnp.float32)
  z = x_in * sin_ref[:] + tin_ref[:]
  if relu_in:
    z = jnp.maximum(z, 0.0)

  @pl.when(i == 0)
  def _():
    dw_ref[:] = jnp.zeros_like(dw_ref)

  mxu_dtype = y_ref.dtype
  dw_ref[:] += jax.lax.dot_general(
      z.astype(mxu_dtype), dy.astype(mxu_dtype),
      dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)


def _bwd_dw_only(g, y, mask_col, s, t, c1, c2, x_in, s_in, t_in,
                 *, relu_in: bool):
  """First-layer dW without the dx matmul or prev-stats epilogue."""
  n_pad, f_out = y.shape
  f_in = x_in.shape[1]
  grid = (_cdiv(n_pad, TILE_N_BWD),)
  return pl.pallas_call(
      functools.partial(_dw_only_kernel, relu_in=relu_in),
      grid=grid,
      in_specs=[
          pl.BlockSpec((TILE_N_BWD, f_out), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N_BWD, f_out), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N_BWD, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((TILE_N_BWD, f_in), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_in), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, f_in), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((f_in, f_out), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((f_in, f_out), jnp.float32),
      interpret=_interpret(),
  )(g, y, mask_col, s.reshape(1, f_out), t.reshape(1, f_out),
    c1.reshape(1, f_out), c2.reshape(1, f_out), x_in,
    s_in.reshape(1, f_in), t_in.reshape(1, f_in))


# ---------------------------------------------------------------------------
# The fused tower op (custom VJP)
# ---------------------------------------------------------------------------


def _bn_fold(col_sum, col_ssq, gamma, beta, n, eps: float):
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


def eligible(training: bool, use_batch_norm: bool, input_batch_norm: bool,
             dropout: float, activation: str, dtype, x) -> bool:
  """Static-config eligibility for the fused path (shared by Tower and
  the scorers that must decide padding strategy before calling it)."""
  return (training
          and use_batch_norm
          and not input_batch_norm
          and not dropout
          and activation == 'relu'
          and jnp.dtype(dtype) in (jnp.float32, jnp.bfloat16)
          and x.dtype == jnp.float32
          and x.ndim == 2
          and enabled())


def fused_bn_mlp(x, mask, ws, bs, gammas, betas, eps,
                 act_dtype=jnp.float32, input_grad: bool = True):
  """relu(maskedBN(x @ W_l + b_l)) chained over layers.

  Args:
    x: ``[N, F0]`` float32 rows (documents).
    mask: ``[N]`` row validity (any dtype; cast to float32). Statistics
      are the exact moments over rows where mask is nonzero; all rows
      still produce (normalized) outputs. Pass all-ones to reproduce
      plain BN.
    ws/bs/gammas/betas: per-layer Dense kernel/bias and BN scale/offset.
    eps: BN epsilon (static).
    input_grad: False ≡ the input is wrapped in ``stop_gradient`` (its
      cotangent is zero). For raw-feature towers — where ``x`` comes
      straight from the batch and nothing upstream trains — this lets
      the backward skip writing the first hidden activation's gradient
      (the largest single HBM write of the step). Keep True whenever
      anything trainable (embeddings, encoders) feeds the tower.

  Returns:
    ``(a_last [N, F_L], means tuple, vars tuple)``. The mean/var outputs
    are for running-average updates only and are non-differentiable.
  """
  mask = jax.lax.stop_gradient(jnp.asarray(mask, jnp.float32))
  if not input_grad:
    x = jax.lax.stop_gradient(x)
  return _fused_op(x, mask, tuple(ws), tuple(bs), tuple(gammas),
                   tuple(betas), eps, jnp.dtype(act_dtype).name,
                   bool(input_grad))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _fused_op(x, mask, ws, bs, gammas, betas, eps, act_dtype_name,
              input_grad):
  out, _ = _fused_fwd(x, mask, ws, bs, gammas, betas, eps, act_dtype_name,
                      input_grad)
  return out


def _fused_fwd(x, mask, ws, bs, gammas, betas, eps, act_dtype_name,
               input_grad=True):
  act_dtype = jnp.dtype(act_dtype_name)
  n_valid = x.shape[0]
  n_pad = _cdiv(n_valid, TILE_N) * TILE_N
  x_p = _pad_rows(x, n_pad)
  mask_col = _pad_rows(
      jnp.asarray(mask, jnp.float32).reshape(n_valid, 1), n_pad)
  n = jnp.maximum(jnp.sum(mask_col), 1.0)
  f_in0 = x.shape[1]

  ys, sums, folds = [], [], []
  s_in = jnp.ones((f_in0,), jnp.float32)
  t_in = jnp.zeros((f_in0,), jnp.float32)
  h = x_p
  relu_in = False
  for w, b, gamma, beta in zip(ws, bs, gammas, betas):
    y, col_sum, col_ssq = _layer_forward(
        h, mask_col, s_in, t_in, w, b, relu_in=relu_in,
        act_dtype=act_dtype)
    mu, var, sig_inv, s, t = _bn_fold(col_sum, col_ssq, gamma, beta, n, eps)
    ys.append(y)
    sums.append(col_sum)
    folds.append((mu, var, sig_inv, s, t))
    h, s_in, t_in, relu_in = y, s, t, True

  _, _, _, s_last, t_last = folds[-1]
  a_last = jnp.maximum(
      ys[-1].astype(jnp.float32) * s_last[None, :] + t_last[None, :], 0.0)
  a_last = a_last[:n_valid].astype(act_dtype)

  means = tuple(f[0] for f in folds)
  vars_ = tuple(f[1] for f in folds)
  residuals = (x_p, mask_col, n, tuple(ys), tuple(sums), tuple(folds),
               tuple(ws))
  return (a_last, means, vars_), residuals


def _layer_consts(fold, s1, s2, col_sum, n):
  """Per-column BN backward constants and param grads for one layer."""
  mu, _, sig_inv, s, _ = fold
  dbeta = s1
  dgamma = (s2 - mu * s1) * sig_inv
  c2 = s * sig_inv * dgamma / n
  c1 = s * (s1 / n - mu * sig_inv * dgamma / n)
  db = s * s1 - col_sum * c2 - n * c1
  return dbeta, dgamma, c1, c2, db


def _fused_bwd(eps, act_dtype_name, input_grad, residuals, cotangents):
  del eps, act_dtype_name
  g_a, _, _ = cotangents  # mean/var cotangents are ignored (stats outputs)
  x_p, mask_col, n, ys, sums, folds, ws = residuals
  n_pad = x_p.shape[0]
  n_valid = g_a.shape[0]
  num_layers = len(ys)

  g = _pad_rows(g_a, n_pad)
  d_ws = [None] * num_layers
  d_bs = [None] * num_layers
  d_gammas = [None] * num_layers
  d_betas = [None] * num_layers

  # Top layer's reduction terms need their own pass; every lower layer's
  # arrive from the _bwd_mats epilogue of the layer above.
  top = num_layers - 1
  mu, var, sig_inv, s, t = folds[top]
  s1, s2 = _bwd_stats(g, ys[top], s, t)

  # Fold the first layer's dW matmul terms into layer 1's kernel (the
  # raw-feature stream is narrow) when the feature count satisfies
  # Mosaic's 8-row output-tile rule; otherwise keep the dedicated kernel.
  fold_dw0 = (num_layers >= 2
              and fold_dw0_fits(x_p.shape[1], ys[0].shape[1],
                                ys[1].shape[1]))
  a0 = b0 = None
  for l in range(top, -1, -1):
    fold = folds[l]
    dbeta, dgamma, c1, c2, db = _layer_consts(fold, s1, s2, sums[l], n)
    d_bs[l] = db
    d_gammas[l] = dgamma
    d_betas[l] = dbeta
    _, _, _, s, t = fold

    if l == 0:
      if a0 is not None:
        # dW0 = s0*A - c2_0*B - c1_0*(x^T m); A/B accumulated in layer 1's
        # backward kernel, the x^T m reduction is one cheap XLA pass.
        xm = jnp.sum(x_p * mask_col, axis=0)
        d_ws[l] = (a0 * s[None, :] - b0 * c2[None, :]
                   - xm[:, None] * c1[None, :])
      else:
        x_in = x_p
        s_in = jnp.ones((x_p.shape[1],), jnp.float32)
        t_in = jnp.zeros((x_p.shape[1],), jnp.float32)
        d_ws[l] = _bwd_dw_only(g, ys[l], mask_col, s, t, c1, c2, x_in,
                               s_in, t_in, relu_in=False)
      if input_grad:
        dx0 = _bwd_dx_only(g, ys[l], mask_col, s, t, c1, c2, ws[l])
    else:
      x_in = ys[l - 1]
      _, _, _, s_in, t_in = folds[l - 1]
      # With the first layer's dW folded in (A/B) and input cotangents
      # declared unused, layer 1's dx — the largest single HBM write of
      # the backward — never leaves VMEM (it still feeds the in-kernel
      # stats/dW epilogues).
      last_fold = l == 1 and fold_dw0
      outs = _bwd_mats(
          g, ys[l], mask_col, s, t, c1, c2, x_in, s_in, t_in, ws[l],
          relu_in=True, emit_prev_stats=True,
          x0=x_p if last_fold else None,
          emit_dx=input_grad or not last_fold)
      if last_fold:
        dx, dw, s1, s2, a0, b0 = outs
      else:
        dx, dw, s1, s2 = outs
      d_ws[l] = dw
      g = dx

  if not input_grad:
    dx0 = jnp.zeros((n_pad, x_p.shape[1]), jnp.float32)
  dx0 = dx0[:n_valid] if n_valid != n_pad else dx0
  dmask = jnp.zeros((n_valid,), jnp.float32)
  return (dx0, dmask, tuple(d_ws), tuple(d_bs), tuple(d_gammas),
          tuple(d_betas))


_fused_op.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# jnp reference (flax-equivalent semantics, for tests)
# ---------------------------------------------------------------------------


def reference_bn_mlp(x, ws, bs, gammas, betas, eps=1e-5, mask=None):
  """Pure-jnp mirror of fused_bn_mlp: Dense -> train-mode masked
  BatchNorm (fast variance, clip, float32) -> relu per layer."""
  h = x
  if mask is None:
    m = jnp.ones((x.shape[0], 1), jnp.float32)
  else:
    m = jnp.asarray(mask, jnp.float32).reshape(x.shape[0], 1)
  n = jnp.maximum(jnp.sum(m), 1.0)
  means, vars_ = [], []
  for w, b, gamma, beta in zip(ws, bs, gammas, betas):
    y = h @ w + b
    mu = jnp.sum(y * m, axis=0) / n
    var = jnp.maximum(0.0, jnp.sum(y * y * m, axis=0) / n - mu * mu)
    yhat = (y - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    h = jnp.maximum(yhat, 0.0)
    means.append(mu)
    vars_.append(var)
  return h, tuple(means), tuple(vars_)
