"""Pallas TPU kernels: drop-in accelerators for the O(L^2) ranking hot path.

Kernels never fork semantics: each has a jnp reference implementation in
``ranking_tpu.ops`` and equality tests. ``set_enabled(True)`` flips the
fused pairwise fast path on globally.

Default is OFF: measured on TPU v5e (B128 x L200, logistic + NDCG-v2
lambda, fwd+bwd), the fused kernel ran at parity with XLA's own fusion
(~2.5 vs ~2.2 ms/step) — XLA already avoids materializing [B, L, L] in
HBM for these elementwise-reduce patterns, so the kernel is an
optimization lever for shapes where XLA's fusion heuristics break, not a
default win. The in-VMEM sort kernel (ops/pallas/sort.py) is invoked
explicitly by callers.
"""

from __future__ import annotations

from typing import Optional

import jax

from ranking_tpu.ops.pallas import approx
from ranking_tpu.ops.pallas import pairwise
from ranking_tpu.ops.pallas.pairwise import (
    DISCOUNT_INVERSE,
    DISCOUNT_LOG2_INVERSE,
    LAMBDA_DCG_V2,
    LAMBDA_LABELDIFF,
    LAMBDA_NONE,
    LOSS_HINGE,
    LOSS_LOGISTIC,
    LOSS_SOFT_ZERO_ONE,
    fused_pairwise_sums,
)

_ENABLED: Optional[bool] = None  # None = default (off; see module docstring)


def set_enabled(value: Optional[bool]) -> None:
  """True/False to force the fused pairwise path; None restores default."""
  global _ENABLED
  _ENABLED = value


def enabled() -> bool:
  return bool(_ENABLED)


def maybe_fused_pairwise(loss, labels, logits, weights, mask, reduction,
                         key):
  """Fused scalar pairwise loss, or None if this config isn't kernelized.

  Reproduces _PairwiseLoss.__call__ semantics exactly: temperature scaling,
  left-item weight normalization, lambda weights (None / LabelDiff /
  DCGLambdaWeightV2 with registry discount fns), and the SUM / MEAN /
  SUM_BY_NONZERO_WEIGHTS reductions.
  """
  import jax.numpy as jnp

  from ranking_tpu.ops import lambda_weights as lw
  from ranking_tpu.ops import sorting
  from ranking_tpu.ops.reductions import Reduction
  from ranking_tpu.utils import fns, list_ops

  if not enabled():
    return None
  reduction = Reduction(reduction)
  if reduction not in (Reduction.SUM, Reduction.MEAN,
                       Reduction.SUM_BY_NONZERO_WEIGHTS,
                       Reduction.SUM_OVER_BATCH_SIZE):
    return None
  labels = jnp.asarray(labels, jnp.float32)
  logits = jnp.asarray(logits, jnp.float32)
  if labels.ndim != 2:
    return None

  from ranking_tpu.ops import losses as losses_lib
  loss_types = {
      losses_lib.PairwiseLogisticLoss: LOSS_LOGISTIC,
      losses_lib.PairwiseHingeLoss: LOSS_HINGE,
      losses_lib.PairwiseSoftZeroOneLoss: LOSS_SOFT_ZERO_ONE,
  }
  loss_type = loss_types.get(type(loss))
  if loss_type is None:
    return None

  lamw = loss.lambda_weight
  lambda_mode, gain, ranks, scale = LAMBDA_NONE, None, None, None
  discount_kind, topn = DISCOUNT_LOG2_INVERSE, 1e9
  if mask is None:
    mask = list_ops.is_label_valid(labels)
  logits = loss.get_logits(logits)

  if lamw is None:
    pass
  elif type(lamw) is lw.LabelDiffLambdaWeight:
    lambda_mode = LAMBDA_LABELDIFF
  elif type(lamw) is lw.DCGLambdaWeightV2:
    if lamw.rank_discount_fn is fns.log2_inverse:
      discount_kind = DISCOUNT_LOG2_INVERSE
    elif lamw.rank_discount_fn is fns.inverse:
      discount_kind = DISCOUNT_INVERSE
    else:
      return None
    lambda_mode = LAMBDA_DCG_V2
    clean = jnp.where(mask, labels, 0.0)
    gain = lamw.gain_fn(clean)
    ranks = sorting.compute_ranks(logits, mask, key=key).astype(jnp.float32)
    list_size = labels.shape[1]
    scale = jnp.full((labels.shape[0],), float(list_size), jnp.float32)
    if lamw.normalized:
      inv = sorting.inverse_max_dcg(
          clean, gain_fn=lamw.gain_fn,
          rank_discount_fn=lamw.rank_discount_fn, topn=lamw.topn)
      scale = scale * inv[:, 0]
    topn = float(lamw.topn or list_size)
  else:
    return None

  # normalize_weights: left-item validity-masked weights.
  if weights is None:
    weights = 1.0
  norm_w = jnp.where(mask, jnp.ones_like(labels) * weights, 0.0)

  sums = fused_pairwise_sums(
      labels, logits, mask, norm_w, loss_type,
      lambda_mode=lambda_mode, gain=gain, ranks=ranks, scale=scale,
      discount_kind=discount_kind, topn=topn)
  num = jnp.sum(sums[:, 0])
  if reduction == Reduction.SUM:
    return num
  if reduction == Reduction.MEAN:
    den = jnp.sum(sums[:, 1])
  elif reduction == Reduction.SUM_OVER_BATCH_SIZE:
    den = jnp.asarray(labels.shape[0] * labels.shape[1] ** 2, jnp.float32)
    return num / den
  else:
    den = jnp.sum(sums[:, 2])
  return jnp.where(den > 0, num / jnp.maximum(den, 1e-38),
                   jnp.zeros_like(num))


__all__ = [
    'approx',
    'DISCOUNT_INVERSE',
    'DISCOUNT_LOG2_INVERSE',
    'LAMBDA_DCG_V2',
    'LAMBDA_LABELDIFF',
    'LAMBDA_NONE',
    'LOSS_HINGE',
    'LOSS_LOGISTIC',
    'LOSS_SOFT_ZERO_ONE',
    'enabled',
    'fused_pairwise_sums',
    'maybe_fused_pairwise',
    'pairwise',
    'set_enabled',
]
