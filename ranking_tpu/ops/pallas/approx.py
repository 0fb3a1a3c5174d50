"""Fused approx-ranks kernel (Pallas/Mosaic), tiled over the list.

``approx_ranks`` — rank_i = 0.5 + sum_j sigmoid(s_j - s_i)
(tensorflow_ranking/python/losses_impl.py:77-106) — is the O(L^2) core of
ApproxNDCG / ApproxMRR. The jnp path builds a [B, L, L] sigmoid tensor for
XLA to fuse; this kernel tiles it (same grid discipline as
ops/pallas/pairwise.py) and pairs it with a custom VJP that recomputes the
sigmoid slabs in the backward pass:

  d rank_i / d s_k =  sigmoid'(s_k - s_i)              for k != i
  d rank_i / d s_i = -sum_{j != i} sigmoid'(s_j - s_i)

so  ds_k = sum_i ct_i sigmoid'(s_k - s_i) - ct_k sum_j sigmoid'(s_j - s_k)
(diagonal terms cancel: both sums may include j = i = k freely).

Enable with ``ops.pallas.set_enabled(True)`` — ``sorting.approx_ranks``
then routes here. Equality-tested against the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ranking_tpu.ops.pallas.pairwise import (
    TILE_B, TILE_ROWS, _pad_axis, _select_matrix)

Array = jax.Array

_INTERPRET = False  # flipped by CPU tests


def _fwd_kernel(log_ref, ranks_ref):
  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    ranks_ref[:, :] = jnp.full_like(ranks_ref, 0.5)

  log = log_ref[:]                                   # [TB, L]
  sel = _select_matrix(j * TILE_ROWS, log.shape[1])
  log_r = jax.lax.dot_general(
      log, sel, (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)            # [TB, TR]
  # slab[i, j] = sigmoid(s_j - s_i) for my rows i.
  slab = jax.nn.sigmoid(log[:, None, :] - log_r[:, :, None])  # [TB, TR, L]
  partial = jnp.sum(slab, axis=2)                    # [TB, TR]
  scattered = jax.lax.dot_general(
      partial, sel, (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)            # [TB, L]
  ranks_ref[:, :] = ranks_ref[:, :] + scattered


def _bwd_kernel(log_ref, ct_ref, dlog_ref):
  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    dlog_ref[:, :] = jnp.zeros_like(dlog_ref)

  log = log_ref[:]
  ct = ct_ref[:]
  sel = _select_matrix(j * TILE_ROWS, log.shape[1])
  log_r = jax.lax.dot_general(
      log, sel, (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  ct_r = jax.lax.dot_general(
      ct, sel, (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  s = jax.nn.sigmoid(log[:, None, :] - log_r[:, :, None])  # [TB, TR, L]
  sp = s * (1.0 - s)                                       # sigmoid'
  # + sum over my rows i of ct_i * sigmoid'(s_k - s_i) lands on column k;
  # - ct_i * (row sum) lands back on row i's own position.
  col_part = jnp.sum(ct_r[:, :, None] * sp, axis=1)        # [TB, L]
  row_sums = jnp.sum(sp, axis=2)                           # [TB, TR]
  row_part = jax.lax.dot_general(
      ct_r * row_sums, sel, (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)                  # [TB, L]
  dlog_ref[:, :] = dlog_ref[:, :] + col_part - row_part


def _grid_specs(bp, lp):
  grid = (bp // TILE_B, lp // TILE_ROWS)
  spec = pl.BlockSpec((TILE_B, lp), lambda i, j: (i, 0),
                      memory_space=pltpu.VMEM)
  return grid, spec


@jax.custom_vjp
def approx_ranks_fused(logits: Array) -> Array:
  """Drop-in for ``sorting.approx_ranks`` on ``[B, L]`` logits."""
  out, _ = _fwd(logits)
  return out


def _fwd(logits):
  b, l = logits.shape
  x = _pad_axis(jnp.asarray(logits, jnp.float32), 1, TILE_ROWS, -1e9)
  x = _pad_axis(x, 0, TILE_B, 0.0)
  bp, lp = x.shape
  grid, spec = _grid_specs(bp, lp)
  ranks = pl.pallas_call(
      _fwd_kernel,
      grid=grid,
      in_specs=[spec],
      out_specs=spec,
      out_shape=jax.ShapeDtypeStruct((bp, lp), jnp.float32),
      interpret=_INTERPRET,
      cost_estimate=pl.CostEstimate(
          flops=6 * bp * lp * lp, bytes_accessed=3 * bp * lp * 4,
          transcendentals=bp * lp * lp),
  )(x)
  # Padding columns sit at -1e9: they contribute sigmoid ~ 0 to real rows,
  # matching the unpadded computation.
  return ranks[:b, :l], logits


def _bwd(residual_logits, ct):
  logits = residual_logits
  b, l = logits.shape
  x = _pad_axis(jnp.asarray(logits, jnp.float32), 1, TILE_ROWS, -1e9)
  x = _pad_axis(x, 0, TILE_B, 0.0)
  ct_p = _pad_axis(jnp.asarray(ct, jnp.float32), 1, TILE_ROWS, 0.0)
  ct_p = _pad_axis(ct_p, 0, TILE_B, 0.0)
  bp, lp = x.shape
  grid, spec = _grid_specs(bp, lp)
  dlog = pl.pallas_call(
      _bwd_kernel,
      grid=grid,
      in_specs=[spec, spec],
      out_specs=spec,
      out_shape=jax.ShapeDtypeStruct((bp, lp), jnp.float32),
      interpret=_INTERPRET,
      cost_estimate=pl.CostEstimate(
          flops=10 * bp * lp * lp, bytes_accessed=4 * bp * lp * 4,
          transcendentals=bp * lp * lp),
  )(x, ct_p)
  return (dlog[:b, :l],)


approx_ranks_fused.defvjp(_fwd, _bwd)
