"""LambdaWeight framework: metric-driven pair/item weights for ranking losses.

JAX port of the LambdaLoss weighting machinery
(tensorflow_ranking/python/losses_impl.py:170-480). Each LambdaWeight is a
frozen dataclass (hashable, safe as a jit static argument) exposing two pure
functions:

* ``pair_weights(labels, ranks) -> [B, L, L]`` for pairwise losses,
* ``individual_weights(labels, ranks) -> [B, L]`` for listwise losses.

Ranks are 1-based and typically come from ``ops.sorting.compute_ranks``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from ranking_tpu.utils import fns, list_ops

Array = jnp.ndarray
ScalarFn = Callable[[Array], Array]


def _pairwise(op, t: Array) -> Array:
  """Applies a binary op on all in-list pairs: out[b, i, j] = op(t_i, t_j)."""
  return op(t[:, :, None], t[:, None, :])


def _valid_pairs_and_clean_labels(labels: Array):
  is_valid = list_ops.is_label_valid(labels)
  valid_pair = _pairwise(jnp.logical_and, is_valid)
  return valid_pair, jnp.where(is_valid, labels, 0.0)


class LambdaWeight:
  """Interface: see module docstring."""

  def pair_weights(self, labels: Array, ranks: Array) -> Array:
    raise NotImplementedError

  def individual_weights(self, labels: Array, ranks: Array) -> Array:
    del ranks
    return labels


@dataclasses.dataclass(frozen=True)
class LabelDiffLambdaWeight(LambdaWeight):
  """Absolute label difference per pair."""

  def pair_weights(self, labels: Array, ranks: Array) -> Array:
    del ranks
    return jnp.abs(_pairwise(jnp.subtract, labels))


@dataclasses.dataclass(frozen=True)
class AbstractDCGLambdaWeight(LambdaWeight):
  """Shared DCG lambda-weight math; subclasses define the pair rank discount.

  tensorflow_ranking/python/losses_impl.py:219-296. Note the deliberate
  ``* list_size`` rescale on pair weights — a heuristic keeping LambdaLoss
  magnitudes comparable to plain pairwise losses.
  """

  topn: Optional[int] = None
  gain_fn: ScalarFn = lambda label: label
  rank_discount_fn: ScalarFn = lambda rank: 1.0 / rank
  normalized: bool = False

  def _pair_rank_discount(self, ranks: Array, topn: int) -> Array:
    raise NotImplementedError

  def _gains(self, labels: Array) -> Array:
    gain = self.gain_fn(labels)
    if self.normalized:
      gain = gain * _inverse_max_dcg_like(
          labels, self.gain_fn, self.rank_discount_fn, self.topn)
    return gain

  def pair_weights(self, labels: Array, ranks: Array) -> Array:
    valid_pair, labels = _valid_pairs_and_clean_labels(labels)
    gain = self._gains(labels)
    pair_gain = _pairwise(jnp.subtract, gain) * valid_pair.astype(jnp.float32)
    list_size = labels.shape[1]
    topn = self.topn or list_size
    pair_weight = jnp.abs(pair_gain) * self._pair_rank_discount(ranks, topn)
    return pair_weight * float(list_size)

  def individual_weights(self, labels: Array, ranks: Array) -> Array:
    labels = jnp.where(list_ops.is_label_valid(labels), labels, 0.0)
    gain = self._gains(labels)
    return gain * self.rank_discount_fn(ranks.astype(jnp.float32))


def _inverse_max_dcg_like(labels, gain_fn, rank_discount_fn, topn):
  # Local import to avoid a circular module dependency at import time.
  from ranking_tpu.ops import sorting
  return sorting.inverse_max_dcg(
      labels, gain_fn=gain_fn, rank_discount_fn=rank_discount_fn, topn=topn)


@dataclasses.dataclass(frozen=True)
class DCGLambdaWeight(AbstractDCGLambdaWeight):
  """LambdaLoss/LambdaMART mixed pair discount.

  u = |D(|i-j|) - D(|i-j|+1)| (LambdaLoss Eq.18), v = |D(i) - D(j)|
  (LambdaMART); combined as (1 - smooth_fraction) * u + smooth_fraction * v,
  masked to pairs with min(rank_i, rank_j) <= topn
  (tensorflow_ranking/python/losses_impl.py:299-369).
  """

  smooth_fraction: float = 0.0

  def __post_init__(self):
    if not 0.0 <= self.smooth_fraction <= 1.0:
      raise ValueError(
          f'smooth_fraction must be in [0, 1], got {self.smooth_fraction}')

  def _pair_rank_discount(self, ranks: Array, topn: int) -> Array:
    ranks_f = ranks.astype(jnp.float32)
    pair_valid_rank = _pairwise(jnp.logical_or, ranks <= topn)
    rank_diff = jnp.abs(_pairwise(jnp.subtract, ranks_f))
    u = jnp.where(
        (rank_diff > 0) & pair_valid_rank,
        jnp.abs(self.rank_discount_fn(jnp.maximum(rank_diff, 1e-12))
                - self.rank_discount_fn(rank_diff + 1.0)),
        0.0)
    capped = jnp.where(ranks > topn, 0.0, self.rank_discount_fn(ranks_f))
    v = jnp.abs(_pairwise(jnp.subtract, capped))
    pair_discount = (1.0 - self.smooth_fraction) * u + self.smooth_fraction * v
    return pair_discount * pair_valid_rank.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class DCGLambdaWeightV2(AbstractDCGLambdaWeight):
  """LambdaLoss discount with the improved topn handling.

  Pairs whose max rank exceeds topn are scaled by 1 / (1 - D(max_rank))
  instead of being hard-masked (tensorflow_ranking/python/losses_impl.py:372).
  """

  def _pair_rank_discount(self, ranks: Array, topn: int) -> Array:
    ranks_f = ranks.astype(jnp.float32)
    rank_diff = jnp.abs(_pairwise(jnp.subtract, ranks_f))
    max_rank = _pairwise(jnp.maximum, ranks_f)
    multiplier = jnp.where(
        max_rank > float(topn),
        1.0 / (1.0 - self.rank_discount_fn(max_rank)),
        1.0)
    return jnp.where(
        rank_diff > 0.0,
        jnp.abs(self.rank_discount_fn(jnp.maximum(rank_diff, 1e-12))
                - self.rank_discount_fn(rank_diff + 1.0)) * multiplier,
        0.0)


@dataclasses.dataclass(frozen=True)
class YetiDCGLambdaWeight(DCGLambdaWeightV2):
  """V2 restricted to neighbor pairs (|rank_i - rank_j| == 1).

  tensorflow_ranking/python/losses_impl.py:397-407.
  """

  def pair_weights(self, labels: Array, ranks: Array) -> Array:
    pair_weight = super().pair_weights(labels, ranks)
    neighbor = jnp.abs(_pairwise(jnp.subtract, ranks)) == 1
    return pair_weight * neighbor.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class PrecisionLambdaWeight(LambdaWeight):
  """Swap gain for Precision@k: binary label diff x xor(i<=k, j<=k).

  tensorflow_ranking/python/losses_impl.py:410-454.
  """

  topn: int = 10
  positive_fn: ScalarFn = lambda label: label >= 1.0

  def pair_weights(self, labels: Array, ranks: Array) -> Array:
    valid_pair, labels = _valid_pairs_and_clean_labels(labels)
    binary = self.positive_fn(labels).astype(jnp.float32)
    label_diff = jnp.abs(_pairwise(jnp.subtract, binary))
    label_diff = label_diff * valid_pair.astype(jnp.float32)
    rank_mask = _pairwise(jnp.logical_xor, ranks <= self.topn)
    return label_diff * rank_mask.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class ListMLELambdaWeight(LambdaWeight):
  """Position-aware ListMLE discounts over rank positions.

  tensorflow_ranking/python/losses_impl.py:457-480.
  """

  rank_discount_fn: ScalarFn = lambda rank: 1.0

  def pair_weights(self, labels: Array, ranks: Array) -> Array:
    raise NotImplementedError('ListMLELambdaWeight has no pair weights.')

  def individual_weights(self, labels: Array, ranks: Array) -> Array:
    return jnp.ones_like(labels) * self.rank_discount_fn(
        ranks.astype(jnp.float32))


def create_ndcg_lambda_weight(
    topn: Optional[int] = None,
    smooth_fraction: float = 0.0,
) -> DCGLambdaWeight:
  """NDCG LambdaWeight: gain 2^l - 1, discount 1/log1p(rank), normalized.

  Uses the NAMED registry fns (utils/fns.py) rather than inline lambdas so
  the fused pairwise kernel's identity checks recognize factory-built
  weights (ops/pallas maybe_fused_pairwise)."""
  return DCGLambdaWeight(
      topn=topn,
      gain_fn=fns.pow_minus_1,
      rank_discount_fn=fns.log1p_inverse,
      normalized=True,
      smooth_fraction=smooth_fraction)


def create_ndcg_lambda_weight_v2(
    topn: Optional[int] = None) -> DCGLambdaWeightV2:
  """V2 NDCG LambdaWeight (better topn handling); named registry fns."""
  return DCGLambdaWeightV2(
      topn=topn,
      gain_fn=fns.pow_minus_1,
      rank_discount_fn=fns.log1p_inverse,
      normalized=True)


def create_yeti_dcg_lambda_weight(
    topn: Optional[int] = None) -> YetiDCGLambdaWeight:
  """Neighbor-pair DCG LambdaWeight used by yeti_* losses.

  Un-normalized, so the discount must be the keras default log(2)/log1p
  (tensorflow_ranking/python/keras/losses.py:184-187) — the log(2) factor
  does not cancel here as it does in the normalized NDCG weights.
  """
  return YetiDCGLambdaWeight(
      topn=topn,
      gain_fn=fns.pow_minus_1,
      rank_discount_fn=fns.log2_inverse,
      normalized=False)


def create_reciprocal_rank_lambda_weight(
    topn: Optional[int] = None,
    smooth_fraction: float = 0.0,
) -> DCGLambdaWeight:
  """MRR-like LambdaWeight: identity gain, 1/rank discount, normalized."""
  return DCGLambdaWeight(
      topn=topn,
      gain_fn=lambda labels: labels,
      rank_discount_fn=lambda rank: 1.0 / rank,
      normalized=True,
      smooth_fraction=smooth_fraction)


def create_p_list_mle_lambda_weight(list_size: int) -> ListMLELambdaWeight:
  """Position-Aware ListMLE weight: 2^(n - rank) - 1 (Lan et al.)."""
  return ListMLELambdaWeight(
      rank_discount_fn=lambda rank: jnp.exp2(float(list_size) - rank) - 1.0)
