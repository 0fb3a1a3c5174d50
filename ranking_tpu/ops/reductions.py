"""Weighted loss reductions with TF-parity semantics.

Reproduces the reduction modes of ``tf.compat.v1.losses.compute_weighted_loss``
(the reduction layer behind every loss in the reference, see
tensorflow_ranking/python/losses_impl.py:813) as pure jnp functions. The
framework default is ``SUM_BY_NONZERO_WEIGHTS`` — sum of weighted losses
divided by the number of non-zero weights — matching the reference's factory
default (tensorflow_ranking/python/losses.py:270).

All reductions are `psum`-friendly: ``reduce_weighted`` can also return the
(numerator, denominator) pair so data-parallel training can all-reduce both
before dividing, which is exactly what a cross-replica
``SUM_BY_NONZERO_WEIGHTS`` requires.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax.numpy as jnp

Array = jnp.ndarray


class Reduction(str, enum.Enum):
  """How to reduce a tensor of weighted losses to a scalar."""

  NONE = 'none'
  SUM = 'sum'
  MEAN = 'mean'  # sum(w * l) / sum(w)
  SUM_OVER_BATCH_SIZE = 'sum_over_batch_size'
  SUM_BY_NONZERO_WEIGHTS = 'sum_by_nonzero_weights'


def reduce_terms(
    losses: Array,
    weights: Optional[Array],
    reduction: Reduction,
) -> Tuple[Array, Array]:
  """Returns the (numerator, denominator) of the reduced loss.

  Splitting the reduction this way keeps it exact under data parallelism:
  psum numerator and denominator separately across the mesh, then divide.
  """
  reduction = Reduction(reduction)
  if weights is None:
    weights = jnp.ones_like(losses)
  weights = jnp.broadcast_to(weights, jnp.broadcast_shapes(
      losses.shape, weights.shape)).astype(losses.dtype)
  losses = jnp.broadcast_to(losses, weights.shape)
  weighted = losses * weights
  numerator = jnp.sum(weighted)

  if reduction == Reduction.SUM:
    return numerator, jnp.ones((), dtype=losses.dtype)
  if reduction == Reduction.MEAN:
    return numerator, jnp.sum(weights)
  if reduction == Reduction.SUM_OVER_BATCH_SIZE:
    return numerator, jnp.asarray(weighted.size, dtype=losses.dtype)
  if reduction == Reduction.SUM_BY_NONZERO_WEIGHTS:
    return numerator, jnp.sum((weights != 0).astype(losses.dtype))
  raise ValueError(f'Reduction {reduction} has no scalar terms.')


def reduce_weighted(
    losses: Array,
    weights: Optional[Array],
    reduction: Reduction = Reduction.SUM_BY_NONZERO_WEIGHTS,
) -> Array:
  """Reduces weighted losses to a scalar (or elementwise for NONE)."""
  reduction = Reduction(reduction)
  if reduction == Reduction.NONE:
    if weights is None:
      return losses
    return losses * jnp.broadcast_to(weights, jnp.broadcast_shapes(
        losses.shape, jnp.shape(weights))).astype(losses.dtype)
  numerator, denominator = reduce_terms(losses, weights, reduction)
  if reduction == Reduction.SUM:
    return numerator
  return jnp.where(denominator > 0, numerator / jnp.maximum(denominator, 1e-38),
                   jnp.zeros_like(numerator))
