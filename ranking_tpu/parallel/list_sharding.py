"""List-axis sharding: pairwise losses over lists too large for one chip.

A genuinely new capability over the reference (SURVEY.md section 5): the
reference materializes O(L^2) tensors and can only scale ``list_size`` until
one device's memory runs out. Here the *list axis itself* shards over a mesh
axis: each shard owns ``L/n`` documents of every list, computes its
(rows-local x all-columns) slab of the pair matrix against the all-gathered
column entities, and psums the per-list reduction terms. Memory per chip is
O(L^2 / n); the collective payload is O(L) per list (the gathered column
entities), not O(L^2).

Semantics are identical to ``ops.losses._PairwiseLoss`` with
SUM_BY_NONZERO_WEIGHTS / MEAN / SUM reductions (tested shard-vs-single on
the CPU mesh). Use for very long candidate lists (L in the tens of
thousands) where even XLA's fused jnp path exceeds HBM or stalls.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ranking_tpu.ops.reductions import Reduction

Array = jax.Array



def _pair_loss(kind: str, d: Array) -> Array:
  if kind == 'logistic':
    return jnp.maximum(-d, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(d)))
  if kind == 'hinge':
    return jnp.maximum(1.0 - d, 0.0)
  if kind == 'soft_zero_one':
    return jax.nn.sigmoid(-d)
  raise ValueError(f'unknown pair loss {kind!r}')


def sharded_pairwise_loss(
    labels: Array,
    logits: Array,
    mesh: Mesh,
    axis: str = 'model',
    loss_kind: str = 'logistic',
    weights: Optional[Array] = None,
    reduction: Reduction = Reduction.SUM_BY_NONZERO_WEIGHTS,
    data_axis: Optional[str] = None,
) -> Array:
  """Pairwise loss with the list axis sharded over ``mesh[axis]``.

  Args:
    labels/logits: ``[B, L]`` with L divisible by the axis size; padding
      label -1. Arrays may be host-global; sharding constraints are applied.
    mesh: mesh containing ``axis``.
    axis: mesh axis to shard the list dimension over.
    loss_kind: 'logistic' | 'hinge' | 'soft_zero_one'.
    weights: optional ``[B, L]`` per-item (left-hand) weights.
    reduction: SUM / MEAN / SUM_BY_NONZERO_WEIGHTS.
    data_axis: if set, the batch dimension additionally shards over this
      mesh axis (B divisible by its size) so data-parallel batches stay in
      place instead of being gathered; the reduction psums over both axes.

  Returns:
    scalar loss (replicated).
  """
  reduction = Reduction(reduction)
  if reduction not in (Reduction.SUM, Reduction.MEAN,
                       Reduction.SUM_BY_NONZERO_WEIGHTS):
    raise ValueError(f'unsupported reduction {reduction}')
  labels = jnp.asarray(labels, jnp.float32)
  logits = jnp.asarray(logits, jnp.float32)
  if weights is None:
    weights = jnp.ones_like(labels)
  weights = jnp.broadcast_to(
      jnp.asarray(weights, jnp.float32), labels.shape)

  n = mesh.shape[axis]
  if labels.shape[1] % n:
    raise ValueError(f'list size {labels.shape[1]} not divisible by '
                     f'{axis}={n}')
  if data_axis is not None and labels.shape[0] % mesh.shape[data_axis]:
    raise ValueError(f'batch {labels.shape[0]} not divisible by '
                     f'{data_axis}={mesh.shape[data_axis]}')
  reduce_axes = (axis,) if data_axis is None else (axis, data_axis)

  @partial(
      jax.shard_map,
      mesh=mesh,
      in_specs=(P(data_axis, axis),) * 3,
      out_specs=P(),
  )
  def _loss(lab_s, log_s, w_s):
    # Column entities: gather the full list along the sharded axis —
    # O(L) communication, never O(L^2).
    lab = jax.lax.all_gather(lab_s, axis, axis=1, tiled=True)
    log = jax.lax.all_gather(log_s, axis, axis=1, tiled=True)
    valid_rows = lab_s >= 0
    valid_cols = lab >= 0
    # Local slab: my rows x all columns.
    diff = log_s[:, :, None] - log[:, None, :]
    pref = ((lab_s[:, :, None] - lab[:, None, :]) > 0).astype(jnp.float32)
    pair_valid = (valid_rows[:, :, None] & valid_cols[:, None, :])
    w_rows = jnp.where(valid_rows, w_s, 0.0)
    pw = pref * pair_valid.astype(jnp.float32) * w_rows[:, :, None]
    losses = _pair_loss(loss_kind, diff)
    num = jax.lax.psum(jnp.sum(losses * pw), reduce_axes)
    if reduction == Reduction.SUM:
      return num
    if reduction == Reduction.MEAN:
      den = jax.lax.psum(jnp.sum(pw), reduce_axes)
    else:
      den = jax.lax.psum(jnp.sum((pw != 0).astype(jnp.float32)), reduce_axes)
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-38), 0.0)

  return _loss(labels, logits, weights)
