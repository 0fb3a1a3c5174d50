"""Fused pairwise ranking-loss kernel (Pallas/Mosaic), tiled over the list.

The reference materializes ``[B, L, L]`` pairwise tensors in HBM for every
pairwise loss (tensorflow_ranking/python/losses_impl.py:61-64,503-537).
This kernel tiles the pair matrix: the grid is (batch tiles x row tiles);
each program builds the ``[TB, TR, L]`` slab of logit diffs, preference
labels, lambda weights and the loss surface in VMEM and accumulates into
per-list (loss_sum, weight_sum, nonzero_count) outputs — the full pair
matrix never exists anywhere. A custom VJP recomputes the slab in the
backward kernel and accumulates ``dlogits`` directly (pair weights are
stop_gradient, matching losses_impl.py:882).

Lambda-weight support (static ``lambda_mode``):

* ``none``       — plain preference pairs.
* ``labeldiff``  — ``|l_i - l_j|`` (LabelDiffLambdaWeight,
  losses_impl.py:210-216).
* ``dcg_v2``     — ``|g_i - g_j| * |D(|r_i - r_j|) - D(|r_i - r_j| + 1)| *
  mult * scale_b`` with the V2 topn multiplier ``1 / (1 - D(max_rank))``
  (DCGLambdaWeightV2, losses_impl.py:372-394). Per-item gains ``g`` and
  1-based ranks ``r`` are computed outside (O(B L log L)); the O(L^2) work
  stays in VMEM. ``scale_b`` folds the ``* list_size`` rescale and the
  optional 1/maxDCG normalization.
* ``dcg_v1``     — the reference-default LambdaRank weight
  (DCGLambdaWeight, losses_impl.py:299-369): LambdaLoss discount u mixed
  with the LambdaMART discount v by ``smooth_fraction``, masked to pairs
  with min rank <= topn.
* ``dcg_v2_neighbor`` — YetiDCGLambdaWeight (losses_impl.py:397-407):
  the v2 weight restricted to adjacent-rank pairs.

Padding strategy: the batch axis pads to TILE_B and the list axis to
TILE_ROWS with ``mask = 0`` / ``weight = 0`` rows, which zero every pair
they touch — no in-kernel bounds checks needed. VMEM per program is
~12 slabs of [TB, TR, L] f32 (≈3 MB at L=1024).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_B = 8     # lists per program (sublane-aligned)
TILE_ROWS = 64  # pair-matrix rows per program (device-profiled: ~3% over 32)

LOSS_LOGISTIC = 0
LOSS_HINGE = 1
LOSS_SOFT_ZERO_ONE = 2

LAMBDA_NONE = 0
LAMBDA_LABELDIFF = 1
LAMBDA_DCG_V2 = 2
LAMBDA_DCG_V1 = 3           # smooth_fraction mix + topn pair mask
LAMBDA_DCG_V2_NEIGHBOR = 4  # YetiDCGLambdaWeight: V2 x (|r_i - r_j| == 1)

DISCOUNT_LOG2_INVERSE = 0   # D(r) = log(2) / log(1 + r)
DISCOUNT_INVERSE = 1        # D(r) = 1 / r
DISCOUNT_LOG1P_INVERSE = 2  # D(r) = 1 / log(1 + r) (losses-factory default)

_INTERPRET = False  # flipped by CPU tests

_LN2 = 0.6931471805599453


def _discount(kind: int, r: Array) -> Array:
  if kind == DISCOUNT_LOG2_INVERSE:
    return _LN2 / jnp.log1p(r)
  if kind == DISCOUNT_INVERSE:
    return 1.0 / r
  if kind == DISCOUNT_LOG1P_INVERSE:
    return 1.0 / jnp.log1p(r)
  raise ValueError(f'unknown discount kind {kind}')


def _loss_and_grad(loss_type: int, d: Array) -> Tuple[Array, Array]:
  """Pair loss l(d) and dl/dd for d = s_i - s_j. Static branch."""
  if loss_type == LOSS_LOGISTIC:
    return (jnp.maximum(-d, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(d))),
            -jax.nn.sigmoid(-d))
  if loss_type == LOSS_HINGE:
    # At the hinge point d == 1, jax.grad of jnp.maximum splits the tie
    # (-0.5); match it exactly so the fused VJP never forks from autodiff.
    grad = jnp.where(d < 1.0, -1.0,
                     jnp.where(d == 1.0, -0.5, 0.0)).astype(jnp.float32)
    return jnp.maximum(1.0 - d, 0.0), grad
  if loss_type == LOSS_SOFT_ZERO_ONE:
    s = jax.nn.sigmoid(-d)
    return s, -s * (1.0 - s)
  raise ValueError(f'unknown loss_type {loss_type}')


def _select_matrix(start, lp):
  """One-hot ``[TR, Lp]`` selector: S[t, c] = 1 iff c == start + t.

  Row entities are extracted from full-width lane blocks by an MXU matmul
  with this matrix — Mosaic forbids both small lane-dim blocks (last dim
  must divide 128) and dynamic lane slicing, so selection is arithmetic.
  """
  col = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, lp), 1)
  row = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, lp), 0)
  return (col == row + start).astype(jnp.float32)


def _rows_of(x, sel):
  """[TB, Lp] -> [TB, TR] row-tile extraction via the selector matmul."""
  return jax.lax.dot_general(
      x, sel, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _slab(full_refs, scale_ref, sel, lambda_mode, discount_kind, topn,
          smooth_fraction):
  """Pair weights W and logit diffs D for one row tile ``[TB, TR, L]``."""
  lab_ref, log_ref, msk_ref, w_ref, g_ref, r_ref = full_refs
  lab, log, msk = lab_ref[:], log_ref[:], msk_ref[:]
  g, r, scale = g_ref[:], r_ref[:], scale_ref[:]
  lab_r, log_r, msk_r, w_r = (_rows_of(lab, sel), _rows_of(log, sel),
                              _rows_of(msk, sel), _rows_of(w_ref[:], sel))
  diff = log_r[:, :, None] - log[:, None, :]
  pref = ((lab_r[:, :, None] - lab[:, None, :]) > 0).astype(jnp.float32)
  valid = msk_r[:, :, None] * msk[:, None, :]
  pw = pref * valid
  if lambda_mode == LAMBDA_LABELDIFF:
    pw = pw * jnp.abs(lab_r[:, :, None] - lab[:, None, :])
  elif lambda_mode in (LAMBDA_DCG_V2, LAMBDA_DCG_V2_NEIGHBOR):
    g_r, r_r = _rows_of(g, sel), _rows_of(r, sel)
    pair_gain = jnp.abs(g_r[:, :, None] - g[:, None, :])
    rank_diff = jnp.abs(r_r[:, :, None] - r[:, None, :])
    max_rank = jnp.maximum(r_r[:, :, None], r[:, None, :])
    mult = jnp.where(
        max_rank > topn,
        1.0 / (1.0 - _discount(discount_kind, max_rank)),
        1.0)
    pair_disc = jnp.where(
        rank_diff > 0.0,
        jnp.abs(_discount(discount_kind, jnp.maximum(rank_diff, 1e-12))
                - _discount(discount_kind, rank_diff + 1.0)) * mult,
        0.0)
    if lambda_mode == LAMBDA_DCG_V2_NEIGHBOR:
      # Yeti: only adjacent-rank pairs carry weight
      # (losses_impl.py:397-407; ranks are integral floats, so the
      # equality test is exact).
      pair_disc = pair_disc * (rank_diff == 1.0).astype(jnp.float32)
    pw = pw * pair_gain * pair_disc * scale[:, :, None]
  elif lambda_mode == LAMBDA_DCG_V1:
    # DCGLambdaWeight (losses_impl.py:299-369): the LambdaLoss pair
    # discount u mixed with the LambdaMART discount v by
    # smooth_fraction, masked to pairs with min(r_i, r_j) <= topn.
    g_r, r_r = _rows_of(g, sel), _rows_of(r, sel)
    pair_gain = jnp.abs(g_r[:, :, None] - g[:, None, :])
    rank_diff = jnp.abs(r_r[:, :, None] - r[:, None, :])
    pair_valid_rank = jnp.logical_or(r_r[:, :, None] <= topn,
                                     r[:, None, :] <= topn)
    u = jnp.where(
        (rank_diff > 0.0) & pair_valid_rank,
        jnp.abs(_discount(discount_kind, jnp.maximum(rank_diff, 1e-12))
                - _discount(discount_kind, rank_diff + 1.0)),
        0.0)
    capped = jnp.where(r > topn, 0.0, _discount(discount_kind, r))
    capped_r = jnp.where(r_r > topn, 0.0, _discount(discount_kind, r_r))
    v = jnp.abs(capped_r[:, :, None] - capped[:, None, :])
    pair_disc = ((1.0 - smooth_fraction) * u + smooth_fraction * v)
    pair_disc = pair_disc * pair_valid_rank.astype(jnp.float32)
    pw = pw * pair_gain * pair_disc * scale[:, :, None]
  # Left-item normalized weights apply to every pair (i, j)
  # (losses_impl.py:917-930).
  pw = pw * w_r[:, :, None]
  return pw, diff


def _fwd_kernel(lab_ref, log_ref, msk_ref, w_ref, g_ref, r_ref, scale_ref,
                out_ref, *, loss_type, lambda_mode, discount_kind, topn,
                smooth_fraction):
  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    out_ref[:, :] = jnp.zeros_like(out_ref)

  sel = _select_matrix(j * TILE_ROWS, lab_ref.shape[1])
  pw, diff = _slab(
      (lab_ref, log_ref, msk_ref, w_ref, g_ref, r_ref),
      scale_ref, sel, lambda_mode, discount_kind, topn, smooth_fraction)
  losses, _ = _loss_and_grad(loss_type, diff)
  # Keep every intermediate >= 2-D: Mosaic layouts are (sublane, lane).
  loss_sum = jnp.sum(jnp.sum(losses * pw, axis=2), axis=1,
                     keepdims=True)                            # [TB, 1]
  weight_sum = jnp.sum(jnp.sum(pw, axis=2), axis=1, keepdims=True)
  nonzero = jnp.sum(jnp.sum((pw != 0).astype(jnp.float32), axis=2),
                    axis=1, keepdims=True)
  out = jnp.concatenate([loss_sum, weight_sum, nonzero], axis=1)  # [TB, 3]
  out_ref[:, :] = out_ref[:, :] + jnp.pad(out, ((0, 0), (0, 128 - 3)))


def _bwd_kernel(lab_ref, log_ref, msk_ref, w_ref, g_ref, r_ref, scale_ref,
                ct_ref, dlog_ref, *, loss_type, lambda_mode,
                discount_kind, topn, smooth_fraction):
  j = pl.program_id(1)

  @pl.when(j == 0)
  def _():
    dlog_ref[:, :] = jnp.zeros_like(dlog_ref)

  sel = _select_matrix(j * TILE_ROWS, lab_ref.shape[1])
  pw, diff = _slab(
      (lab_ref, log_ref, msk_ref, w_ref, g_ref, r_ref),
      scale_ref, sel, lambda_mode, discount_kind, topn, smooth_fraction)
  _, grad = _loss_and_grad(loss_type, diff)
  wg = pw * grad                                      # [TB, TR, L]
  # d loss_sum / d s_i = sum_j wg[i, j] - sum_j wg[j, i]: the row sums
  # scatter back to their lane positions via the transposed selector
  # matmul; the column sums subtract in place.
  row_part = jnp.sum(wg, axis=2)                      # [TB, TR]
  col_part = jnp.sum(wg, axis=1)                      # [TB, L]
  row_scattered = jax.lax.dot_general(
      row_part, sel, (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)             # [TB, L]
  ct = ct_ref[:, 0:1]
  dlog_ref[:, :] = dlog_ref[:, :] + (row_scattered - col_part) * ct


def _pad_axis(x: Array, axis: int, multiple: int, value: float) -> Array:
  pad = (-x.shape[axis]) % multiple
  if not pad:
    return x
  widths = [(0, 0)] * x.ndim
  widths[axis] = (0, pad)
  return jnp.pad(x, widths, constant_values=value)


def _pad_inputs(labels, logits, mask, norm_w, gain, ranks, scale):
  """Pads batch to TILE_B and list to TILE_ROWS with inert rows (mask 0 /
  weight 0 zero every pair they touch)."""
  def prep(x, value):
    x = _pad_axis(jnp.asarray(x, jnp.float32), 1, TILE_ROWS, value)
    return _pad_axis(x, 0, TILE_B, 0.0)

  return (prep(labels, -1.0), prep(logits, 0.0), prep(mask, 0.0),
          prep(norm_w, 0.0), prep(gain, 0.0), prep(ranks, 1e9),
          _pad_axis(jnp.asarray(scale, jnp.float32).reshape(-1, 1), 0,
                    TILE_B, 0.0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _pairwise_sums(labels, logits, mask, norm_w, gain, ranks, scale,
                   loss_type, lambda_mode, discount_kind, topn,
                   smooth_fraction):
  out, _ = _pairwise_sums_fwd(labels, logits, mask, norm_w, gain, ranks,
                              scale, loss_type, lambda_mode, discount_kind,
                              topn, smooth_fraction)
  return out


def _grid_and_specs(bp: int, lp: int):
  grid = (bp // TILE_B, lp // TILE_ROWS)
  spec2 = pl.BlockSpec((TILE_B, lp), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM)
  spec1 = pl.BlockSpec((TILE_B, 1), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM)
  return grid, spec2, spec1


def _pairwise_sums_fwd(labels, logits, mask, norm_w, gain, ranks, scale,
                       loss_type, lambda_mode, discount_kind, topn,
                       smooth_fraction):
  b, l = labels.shape
  args = _pad_inputs(labels, logits, mask, norm_w, gain, ranks, scale)
  bp, lp = args[0].shape
  grid, spec2, spec1 = _grid_and_specs(bp, lp)
  out = pl.pallas_call(
      functools.partial(_fwd_kernel, loss_type=loss_type,
                        lambda_mode=lambda_mode,
                        discount_kind=discount_kind, topn=topn,
                        smooth_fraction=smooth_fraction),
      grid=grid,
      in_specs=[spec2] * 6 + [spec1],
      out_specs=pl.BlockSpec((TILE_B, 128), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((bp, 128), jnp.float32),
      interpret=_INTERPRET,
      cost_estimate=pl.CostEstimate(
          flops=10 * bp * lp * lp, bytes_accessed=7 * bp * lp * 4,
          transcendentals=2 * bp * lp * lp),
  )(*args)
  sums = out[:b, :3]  # [B, 3]: loss_sum, weight_sum, nonzero_count
  return sums, (labels, logits, mask, norm_w, gain, ranks, scale)


def _pairwise_sums_bwd(loss_type, lambda_mode, discount_kind, topn,
                       smooth_fraction, residuals, ct):
  labels, logits, mask, norm_w, gain, ranks, scale = residuals
  b, l = labels.shape
  args = _pad_inputs(labels, logits, mask, norm_w, gain, ranks, scale)
  bp, lp = args[0].shape
  ct_pad = _pad_axis(jnp.asarray(ct, jnp.float32), 0, TILE_B, 0.0)
  grid, spec2, spec1 = _grid_and_specs(bp, lp)
  spec_ct = pl.BlockSpec((TILE_B, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
  dlog = pl.pallas_call(
      functools.partial(_bwd_kernel, loss_type=loss_type,
                        lambda_mode=lambda_mode,
                        discount_kind=discount_kind, topn=topn,
                        smooth_fraction=smooth_fraction),
      grid=grid,
      in_specs=[spec2] * 6 + [spec1, spec_ct],
      out_specs=spec2,
      out_shape=jax.ShapeDtypeStruct((bp, lp), jnp.float32),
      interpret=_INTERPRET,
      cost_estimate=pl.CostEstimate(
          flops=12 * bp * lp * lp, bytes_accessed=8 * bp * lp * 4,
          transcendentals=2 * bp * lp * lp),
  )(*args, ct_pad)
  dlogits = dlog[:b, :l]
  z = lambda a: jnp.zeros_like(a)
  return (z(labels), dlogits, z(mask), z(norm_w), z(gain), z(ranks),
          z(scale))


_pairwise_sums.defvjp(_pairwise_sums_fwd, _pairwise_sums_bwd)


def fused_pairwise_sums(
    labels: Array,
    logits: Array,
    mask: Array,
    norm_weights: Array,
    loss_type: int,
    lambda_mode: int = LAMBDA_NONE,
    gain: Optional[Array] = None,
    ranks: Optional[Array] = None,
    scale: Optional[Array] = None,
    discount_kind: int = DISCOUNT_LOG2_INVERSE,
    topn: float = 1e9,
    smooth_fraction: float = 0.0,
) -> Array:
  """Per-list ``[B, 3]`` (loss_sum, weight_sum, nonzero_count).

  ``norm_weights`` are the left-item weights ``[B, L]`` (already masked).
  For the dcg modes pass per-item ``gain`` (cleaned labels through
  gain_fn), 1-based ``ranks``, and per-list ``scale`` (list_size x
  optional 1/maxDCG); ``smooth_fraction`` applies to ``dcg_v1`` only.
  """
  b, l = labels.shape
  zeros = jnp.zeros((b, l), jnp.float32)
  return _pairwise_sums(
      jnp.asarray(labels, jnp.float32), jnp.asarray(logits, jnp.float32),
      jnp.asarray(mask, jnp.float32), jnp.asarray(norm_weights, jnp.float32),
      zeros if gain is None else jnp.asarray(gain, jnp.float32),
      zeros if ranks is None else jnp.asarray(ranks, jnp.float32),
      jnp.ones((b,), jnp.float32) if scale is None
      else jnp.asarray(scale, jnp.float32),
      loss_type, lambda_mode, discount_kind, float(topn),
      float(smooth_fraction))
