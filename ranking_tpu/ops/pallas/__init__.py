"""Pallas TPU kernels: drop-in accelerators for the ranking hot path.

Kernels never fork semantics: each has a jnp reference implementation in
``ranking_tpu.ops`` and equality tests.

Three kernel families, three measured wins on TPU v5e (PARITY.md):

* fused masked batch-norm tower (``fused_bn.py``): auto-enabled in train
  mode — flagship train step 2.17 -> 1.47 ms (1.14 bf16);
* in-VMEM per-list sort (``sort.py``): eval step with the full metric
  suite 2.65 -> 1.44 ms (1.83x) at the flagship B128xL200;
* fused pairwise loss (``pairwise.py``): 1.27-1.31x fwd+bwd at
  L >= 1024 (B32xL1024, B16xL2048), but SLOWER than XLA fusion at small
  L (0.32x at the flagship B128xL200).

``set_enabled`` policy: None (default) = auto — each fast path engages
on TPU only in its measured-win domain: pairwise at list size >=
``MIN_LIST_SIZE``, sort within its VMEM domain. True forces the
pairwise kernel for any shape and lifts the sort kernel's
TPU requirement (interpret mode for tests) — the sort kernel's hard
VMEM bound (L <= 512, ``utils.list_ops._pallas_sort_ok``) and its
float-channel requirement still apply even when forced; False
disables everything. Forcing True off-TPU without interpret mode is
ignored for the pairwise kernel (no backend to run it on).

(A fused approx-ranks kernel was carried through rounds 2-3 and retired
in round 4: two full sweeps showed XLA fusion at parity on every shape
— 0.95-1.06x — so it never earned an auto domain.)
"""

from __future__ import annotations

from typing import Optional

import jax

from ranking_tpu.ops.pallas import pairwise
from ranking_tpu.ops.pallas.pairwise import (
    DISCOUNT_INVERSE,
    DISCOUNT_LOG1P_INVERSE,
    DISCOUNT_LOG2_INVERSE,
    LAMBDA_DCG_V1,
    LAMBDA_DCG_V2,
    LAMBDA_DCG_V2_NEIGHBOR,
    LAMBDA_LABELDIFF,
    LAMBDA_NONE,
    LOSS_HINGE,
    LOSS_LOGISTIC,
    LOSS_SOFT_ZERO_ONE,
    fused_pairwise_sums,
)

_ENABLED: Optional[bool] = None  # None = auto (see module docstring)

# Auto-domain for the pairwise kernel, from the round-3 full-train-step
# sweep on TPU v5e (benchmarks/pairwise_sweep.py, PAIRWISE_SWEEP.json):
# tile-ALIGNED list sizes (multiples of the 128 tile) win 3-8.5% at
# L=128-512 and hold parity at 1024; unaligned sizes pay the padding
# (L=200 f32: 0.97x) and stay on XLA until the relative padding shrinks
# at MIN_LIST_SIZE.
MIN_LIST_SIZE = 1024   # unaligned sizes engage at-or-above this
ALIGNED_TILE = 128     # aligned multiples engage from one tile up


def set_enabled(value: Optional[bool]) -> None:
  """True/False to force the pairwise/sort fast paths; None = auto."""
  global _ENABLED
  _ENABLED = value


def enabled(list_size: Optional[int] = None) -> bool:
  """Whether the fast paths apply. In auto mode (None), engage on TPU
  when the list size is large enough to win; callers that cannot supply
  a list size get the forced value only."""
  if _ENABLED is not None:
    if _ENABLED and jax.default_backend() != 'tpu':
      # Forcing on without a TPU only works in interpret mode (tests);
      # otherwise fall back rather than crash in Mosaic lowering.
      from ranking_tpu.ops.pallas import pairwise as _pw
      return bool(_pw._INTERPRET)
    return _ENABLED
  if list_size is None:
    return False
  in_domain = (list_size >= MIN_LIST_SIZE or
               (list_size >= ALIGNED_TILE and
                list_size % ALIGNED_TILE == 0))
  return jax.default_backend() == 'tpu' and in_domain


def maybe_fused_pairwise(loss, labels, logits, weights, mask, reduction,
                         key):
  """Fused scalar pairwise loss, or None if this config isn't kernelized.

  Reproduces _PairwiseLoss.__call__ semantics exactly: temperature scaling,
  left-item weight normalization, lambda weights (None / LabelDiff /
  DCGLambdaWeight incl. smooth_fraction / DCGLambdaWeightV2 /
  YetiDCGLambdaWeight, with registry discount fns), and the SUM / MEAN /
  SUM_BY_NONZERO_WEIGHTS reductions.
  """
  import jax.numpy as jnp

  from ranking_tpu.ops import lambda_weights as lw
  from ranking_tpu.ops import sorting
  from ranking_tpu.ops.reductions import Reduction
  from ranking_tpu.utils import fns, list_ops

  import numpy as np
  if not enabled(int(np.shape(labels)[-1])):
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
  smooth_fraction = 0.0
  explicit_mask = mask is not None
  if mask is None:
    mask = list_ops.is_label_valid(labels)
  logits = loss.get_logits(logits)

  dcg_modes = {
      lw.DCGLambdaWeight: LAMBDA_DCG_V1,
      lw.DCGLambdaWeightV2: LAMBDA_DCG_V2,
      lw.YetiDCGLambdaWeight: LAMBDA_DCG_V2_NEIGHBOR,
  }
  if lamw is None:
    pass
  elif type(lamw) is lw.LabelDiffLambdaWeight:
    lambda_mode = LAMBDA_LABELDIFF
  elif type(lamw) in dcg_modes:
    if explicit_mask:
      # The lambda pair gains are zeroed by LABEL-validity pairs in the
      # jnp path (lambda_weights.py _valid_pairs_and_clean_labels) while
      # the kernel's pair mask comes from the caller's mask — identical
      # when the mask IS label validity (the production path passes
      # mask=None), potentially different otherwise: fall back.
      return None
    if lamw.rank_discount_fn is fns.log2_inverse:
      discount_kind = DISCOUNT_LOG2_INVERSE
    elif lamw.rank_discount_fn is fns.inverse:
      discount_kind = DISCOUNT_INVERSE
    elif lamw.rank_discount_fn is fns.log1p_inverse:
      discount_kind = DISCOUNT_LOG1P_INVERSE
    else:
      return None
    lambda_mode = dcg_modes[type(lamw)]
    if (lambda_mode == LAMBDA_DCG_V2_NEIGHBOR and _ENABLED is None
        and labels.shape[-1] < MIN_LIST_SIZE):
      # Round-4 sweep (PAIRWISE_SWEEP.json yeti rows): the neighbor-pair
      # weight zeroes all but ~2L of the L^2 pairs, so XLA's fused slab
      # is cheap and the kernel's tile overhead only pays off at
      # L >= 1024 (0.85-0.99x below, 1.03x at 1024).
      return None
    if lambda_mode == LAMBDA_DCG_V1:
      smooth_fraction = float(lamw.smooth_fraction)
    # pair_weights cleans labels via is_label_valid (lambda_weights.py),
    # independent of any caller-supplied mask.
    clean = jnp.where(list_ops.is_label_valid(labels), labels, 0.0)
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

  # normalize_weights: left-item weights masked by LABEL validity (the
  # jnp path's semantics, losses.py normalize_weights — is_label_valid,
  # not the caller's mask, which gates only the pair mask and ranks).
  if weights is None:
    weights = 1.0
  norm_w = jnp.where(list_ops.is_label_valid(labels),
                     jnp.ones_like(labels) * weights, 0.0)

  sums = fused_pairwise_sums(
      labels, logits, mask, norm_w, loss_type,
      lambda_mode=lambda_mode, gain=gain, ranks=ranks, scale=scale,
      discount_kind=discount_kind, topn=topn,
      smooth_fraction=smooth_fraction)
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
    'DISCOUNT_INVERSE',
    'DISCOUNT_LOG1P_INVERSE',
    'DISCOUNT_LOG2_INVERSE',
    'LAMBDA_DCG_V1',
    'LAMBDA_DCG_V2',
    'LAMBDA_DCG_V2_NEIGHBOR',
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
