"""The ranking loss zoo as pure, masking-aware JAX functions.

TPU-native re-design of the reference's loss core
(tensorflow_ranking/python/losses_impl.py). Losses are frozen dataclasses —
hashable, cheap to construct, safe to close over under ``jax.jit`` — with pure
methods instead of TF graph state:

* ``unreduced(labels, logits, mask, key) -> (losses, loss_weights)``
* ``normalize_weights(labels, weights)`` — the family-specific weight
  semantics (pointwise item validity / pairwise left-item expansion /
  listwise label-weighted mean) that the reference encodes in
  ``_normalize_weights_impl`` (losses_impl.py:917,1004,1287).
* ``__call__(labels, logits, weights, reduction, mask, key) -> scalar``
* ``per_list(...) -> ([B] losses, [B] weights)`` for loss-as-metric streams.

Conventions: ``labels``/``logits`` are ``[B, L]`` float32 (rank-3 for
ordinal / multiclass / click-EM / mixture-EM heads), padding label is -1,
``mask = labels >= 0`` when not given. All randomness (tie shuffles, Gumbel
sampling) is an explicit ``jax.random`` key; ``key=None`` falls back to a
fixed key so behavior is deterministic by default.

The O(L^2) pairwise tensors formed here are the canonical semantics; the
fused Pallas kernels in ``ranking_tpu.ops.pallas`` accelerate the same math
without materializing ``[B, L, L]`` in HBM.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ranking_tpu.ops import lambda_weights as lw
from ranking_tpu.ops import sorting
from ranking_tpu.ops.reductions import Reduction, reduce_weighted
from ranking_tpu.utils import list_ops

Array = jnp.ndarray

EPSILON = 1e-10
LOG_EPSILON = math.log(EPSILON)

# Fixed fallback key: mirrors the reference's fixed op-level seed 37 for
# tie shuffling / distillation sampling (losses_impl.py:1560,2053).
_DEFAULT_SEED = 37


def _default_key(key: Optional[Array]) -> Array:
  return jax.random.PRNGKey(_DEFAULT_SEED) if key is None else key


def _pairwise(op, t: Array) -> Array:
  return op(t[:, :, None], t[:, None, :])


def pairwise_comparison(
    labels: Array,
    logits: Array,
    mask: Array,
) -> Tuple[Array, Array]:
  """Pairwise preference labels and logit differences.

  Returns ``(pairwise_labels, pairwise_logits)``, both ``[B, L, L]``:
  ``pairwise_labels[b, i, j] = I[l_i > l_j and both valid]`` and
  ``pairwise_logits[b, i, j] = s_i - s_j``
  (tensorflow_ranking/python/losses_impl.py:503-537).
  """
  pairwise_label_diff = _pairwise(jnp.subtract, labels)
  pairwise_logits = _pairwise(jnp.subtract, logits)
  pairwise_labels = (pairwise_label_diff > 0).astype(jnp.float32)
  valid_pair = _pairwise(jnp.logical_and, mask)
  return pairwise_labels * valid_pair.astype(jnp.float32), pairwise_logits


def sigmoid_cross_entropy(labels: Array, logits: Array) -> Array:
  """Numerically stable elementwise sigmoid CE with soft labels."""
  return (jnp.maximum(logits, 0.0) - logits * labels
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def softmax_cross_entropy(label_dist: Array, logits: Array) -> Array:
  """Per-row CE between a label distribution and softmax(logits)."""
  return -jnp.sum(label_dist * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def _label_distribution(labels: Array, mask: Optional[Array]):
  """Masked per-list label distribution with the reference's EPSILON
  padding for all-zero lists (losses_impl.py:1122-1137); shared by the
  softmax-family losses. Returns ``(label_dist, label_sum)``."""
  if mask is None:
    mask = list_ops.is_label_valid(labels)
  label_sum = jnp.sum(labels, axis=1, keepdims=True)
  nonzero = label_sum > 0.0
  padded_labels = jnp.where(nonzero, labels, EPSILON)
  padded_labels = jnp.where(mask, padded_labels, 0.0)
  padded_sum = jnp.sum(padded_labels, axis=1, keepdims=True)
  label_dist = jnp.where(padded_sum > 0,
                         padded_labels / jnp.maximum(padded_sum, 1e-38),
                         0.0)
  return label_dist, label_sum


@dataclasses.dataclass(frozen=True)
class RankingLoss:
  """Base ranking loss; see module docstring."""

  name: str = ''
  lambda_weight: Optional[lw.LambdaWeight] = None
  temperature: float = 1.0

  # --- family hooks -------------------------------------------------------

  def unreduced(self, labels, logits, mask=None, key=None):
    raise NotImplementedError

  def normalize_weights(self, labels: Array, weights) -> Array:
    del labels
    return 1.0 if weights is None else weights

  def get_logits(self, logits: Array) -> Array:
    return logits / self.temperature

  # --- public API ---------------------------------------------------------

  def __call__(self, labels, logits, weights=None, mask=None,
               reduction: Reduction = Reduction.SUM_BY_NONZERO_WEIGHTS,
               key=None, ragged: bool = False) -> Array:
    """Reduced scalar loss (estimator-`compute` parity,
    losses_impl.py:787-814).

    With ``ragged=True``, ``labels``/``logits``/``weights`` are host-side
    variable-length lists (lists of lists) densified with the reference's
    padding sentinels before computing (losses_impl.py:692-694 parity).
    """
    if ragged:
      labels, logits, weights, mask = list_ops.ragged_to_dense(
          labels, logits, weights)
    logits = self.get_logits(jnp.asarray(logits, jnp.float32))
    labels = jnp.asarray(labels, jnp.float32)
    losses, loss_weights = self.unreduced(labels, logits, mask=mask, key=key)
    weights = jnp.multiply(
        self.normalize_weights(labels, weights), loss_weights)
    return reduce_weighted(losses, weights, reduction)

  def per_list(self, labels, logits, weights=None, mask=None, key=None):
    raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class _PairwiseLoss(RankingLoss):
  """Pairwise family: loss on s_i - s_j for preference pairs l_i > l_j."""

  def _pairwise_loss(self, pairwise_logits: Array) -> Array:
    raise NotImplementedError

  def __call__(self, labels, logits, weights=None, mask=None,
               reduction: Reduction = Reduction.SUM_BY_NONZERO_WEIGHTS,
               key=None, ragged: bool = False) -> Array:
    if ragged:
      labels, logits, weights, mask = list_ops.ragged_to_dense(
          labels, logits, weights)
    # Fused Pallas fast path (VMEM-resident pair matrices); falls back to
    # the canonical jnp path for non-kernelized configs.
    from ranking_tpu.ops import pallas as pallas_ops
    fused = pallas_ops.maybe_fused_pairwise(
        self, labels, logits, weights, mask, reduction, key)
    if fused is not None:
      return fused
    return super().__call__(labels, logits, weights=weights, mask=mask,
                            reduction=reduction, key=key)

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    pairwise_labels, pairwise_logits = pairwise_comparison(
        labels, logits, mask)
    pairwise_weights = pairwise_labels
    if self.lambda_weight is not None:
      ranks = sorting.compute_ranks(logits, mask, key=key)
      pairwise_weights = pairwise_weights * self.lambda_weight.pair_weights(
          labels, ranks)
    pairwise_weights = jax.lax.stop_gradient(pairwise_weights)
    return self._pairwise_loss(pairwise_logits), pairwise_weights

  def normalize_weights(self, labels, weights):
    # Item weight w_i applies to every pair (i, j): expand on the left axis.
    if weights is None:
      weights = 1.0
    weights = jnp.where(
        list_ops.is_label_valid(labels),
        jnp.ones_like(labels) * weights, 0.0)
    return weights[:, :, None]

  def per_list(self, labels, logits, weights=None, mask=None, key=None):
    labels = jnp.asarray(labels, jnp.float32)
    logits = self.get_logits(jnp.asarray(logits, jnp.float32))
    losses, loss_weights = self.unreduced(labels, logits, mask=mask, key=key)
    weights = jnp.multiply(
        self.normalize_weights(labels, weights), loss_weights)
    per_list_weights = jnp.sum(weights, axis=(1, 2))
    per_list_losses = jnp.sum(losses * weights, axis=(1, 2))
    per_list_losses = jnp.where(
        per_list_weights > 0,
        per_list_losses / jnp.maximum(per_list_weights, 1e-38), 0.0)
    return per_list_losses, per_list_weights


@dataclasses.dataclass(frozen=True)
class PairwiseLogisticLoss(_PairwiseLoss):
  """log(1 + exp(-(s_i - s_j))) on preference pairs."""

  def _pairwise_loss(self, pairwise_logits: Array) -> Array:
    return (jnp.maximum(-pairwise_logits, 0.0)
            + jnp.log1p(jnp.exp(-jnp.abs(pairwise_logits))))


@dataclasses.dataclass(frozen=True)
class PairwiseHingeLoss(_PairwiseLoss):
  """max(0, 1 - (s_i - s_j)) on preference pairs."""

  def _pairwise_loss(self, pairwise_logits: Array) -> Array:
    return jnp.maximum(1.0 - pairwise_logits, 0.0)


@dataclasses.dataclass(frozen=True)
class PairwiseSoftZeroOneLoss(_PairwiseLoss):
  """1 - sigmoid(s_i - s_j): a smooth, bounded zero-one surrogate."""

  def _pairwise_loss(self, pairwise_logits: Array) -> Array:
    # sigmoid(-x) == 1 - sigmoid(x), computed in the stable direction.
    return jax.nn.sigmoid(-pairwise_logits)


@dataclasses.dataclass(frozen=True)
class PairwiseMSELoss(_PairwiseLoss):
  """((s_i - s_j) - (l_i - l_j))^2 over all valid non-diagonal pairs.

  Unlike the other pairwise losses this one is computed on *all* pairs
  (including equal labels) except self-pairs
  (tensorflow_ranking/python/losses_impl.py:961-998).
  """

  def _pairwise_loss(self, pairwise_logits: Array) -> Array:
    raise NotImplementedError  # unreduced() is self-contained.

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    pairwise_label_diff = _pairwise(jnp.subtract, labels)
    pairwise_logit_diff = _pairwise(jnp.subtract, logits)
    losses = jnp.square(pairwise_logit_diff - pairwise_label_diff)

    list_size = labels.shape[1]
    valid_pair = _pairwise(jnp.logical_and, mask)
    pairwise_weights = (valid_pair.astype(jnp.float32)
                        * (1.0 - jnp.eye(list_size, dtype=jnp.float32)))
    if self.lambda_weight is not None:
      ranks = sorting.compute_ranks(logits, mask, key=key)
      pairwise_weights = pairwise_weights * self.lambda_weight.pair_weights(
          labels, ranks)
    return losses, jax.lax.stop_gradient(pairwise_weights)


@dataclasses.dataclass(frozen=True)
class _ListwiseLoss(RankingLoss):
  """Listwise family: one loss value per list."""

  def normalize_weights(self, labels, weights):
    # Label-weighted mean of the item weights per list.
    if weights is None:
      return 1.0
    labels = jnp.where(list_ops.is_label_valid(labels), labels, 0.0)
    label_sum = jnp.sum(labels, axis=1, keepdims=True)
    weighted = jnp.sum(weights * labels, axis=1, keepdims=True)
    return jnp.where(label_sum > 0,
                     weighted / jnp.maximum(label_sum, 1e-38), 0.0)

  def per_list(self, labels, logits, weights=None, mask=None, key=None):
    labels = jnp.asarray(labels, jnp.float32)
    logits = self.get_logits(jnp.asarray(logits, jnp.float32))
    losses, loss_weights = self.unreduced(labels, logits, mask=mask, key=key)
    weights = jnp.multiply(
        self.normalize_weights(labels, weights), loss_weights)
    return jnp.squeeze(losses, axis=1), jnp.squeeze(
        jnp.broadcast_to(weights, losses.shape), axis=1)


@dataclasses.dataclass(frozen=True)
class CircleLoss(_ListwiseLoss):
  """Circle loss (Sun et al. 2020) on clipped-[0, 1] similarity scores.

  tensorflow_ranking/python/losses_impl.py:1036-1116.
  """

  gamma: float = 64.0
  margin: float = 0.25

  def get_logits(self, logits: Array) -> Array:
    return jnp.clip(logits, 0.0, 1.0)

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)

    score_i = logits[:, :, None]
    score_j = logits[:, None, :]
    alpha_i = jax.lax.stop_gradient(
        jnp.maximum(1.0 - score_i + self.margin, 0.0))
    alpha_j = jax.lax.stop_gradient(jnp.maximum(score_j + self.margin, 0.0))
    pairwise_logits = (alpha_i * (1.0 - score_i - self.margin)
                       + alpha_j * (score_j - self.margin))

    pairwise_label_diff = _pairwise(jnp.subtract, labels)
    valid_pair = _pairwise(jnp.logical_and, mask)
    pairwise_labels = jax.lax.stop_gradient(
        (pairwise_label_diff > 0).astype(jnp.float32)
        * valid_pair.astype(jnp.float32))

    # log1p(sum_k w_k exp(g x_k)) computed as softplus(logsumexp(g x + ln w))
    # so that exp(gamma * x) can never overflow in the forward or the grad.
    log_terms = jnp.where(
        pairwise_labels > 0.0,
        self.gamma * pairwise_logits + jnp.log(
            jnp.maximum(pairwise_labels, EPSILON)),
        -jnp.inf)
    flat = log_terms.reshape(log_terms.shape[0], -1)
    has_pairs = jnp.any(pairwise_labels > 0.0, axis=(1, 2))
    lse = jax.nn.logsumexp(
        jnp.where(has_pairs[:, None], flat, 0.0), axis=1)
    per_list_losses = jnp.where(has_pairs, jax.nn.softplus(lse), 0.0)
    num_pairs = jnp.sum((pairwise_labels > 0).astype(jnp.float32),
                        axis=(1, 2))
    pair_weight_sum = jnp.sum(pairwise_labels, axis=(1, 2))
    per_list_weights = jnp.where(
        num_pairs > 0, pair_weight_sum / jnp.maximum(num_pairs, 1.0), 0.0)
    return per_list_losses[:, None], per_list_weights[:, None]


@dataclasses.dataclass(frozen=True)
class SoftmaxLoss(_ListwiseLoss):
  """ListNet softmax CE over the label distribution, per-list weighted by
  the label sum; lambda weights fold DCG gains/discounts into labels
  (tensorflow_ranking/python/losses_impl.py:1119-1197)."""

  def precompute(self, labels, logits, weights, mask=None, key=None):
    """Folds lambda weights and item weights into the labels."""
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    logits = jnp.where(mask, logits, LOG_EPSILON)
    if self.lambda_weight is not None and isinstance(
        self.lambda_weight, lw.DCGLambdaWeight):
      ranks = sorting.compute_ranks(logits, mask, key=key)
      labels = self.lambda_weight.individual_weights(labels, ranks)
    if weights is not None:
      labels = labels * weights
    return labels, logits

  def unreduced(self, labels, logits, mask=None, key=None):
    label_dist, label_sum = _label_distribution(labels, mask)
    losses = softmax_cross_entropy(label_dist, logits)
    return losses, jnp.reshape(label_sum, (-1,))

  def __call__(self, labels, logits, weights=None, mask=None,
               reduction: Reduction = Reduction.SUM_BY_NONZERO_WEIGHTS,
               key=None, ragged: bool = False) -> Array:
    if ragged:
      labels, logits, weights, mask = list_ops.ragged_to_dense(
          labels, logits, weights)
    labels = jnp.asarray(labels, jnp.float32)
    logits = self.get_logits(jnp.asarray(logits, jnp.float32))
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels, logits = self.precompute(labels, logits, weights, mask, key=key)
    losses, softmax_weights = self.unreduced(labels, logits, mask=mask)
    return reduce_weighted(losses, softmax_weights, reduction)

  def per_list(self, labels, logits, weights=None, mask=None, key=None):
    labels = jnp.asarray(labels, jnp.float32)
    logits = self.get_logits(jnp.asarray(logits, jnp.float32))
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels, logits = self.precompute(labels, logits, weights, mask, key=key)
    return self.unreduced(labels, logits, mask=mask)


@dataclasses.dataclass(frozen=True)
class CalibratedSoftmaxLoss(SoftmaxLoss):
  """Softmax CE with a per-list virtual anchor item (Yan et al. 2022).

  A virtual label ``y_0 >= 0`` with a fixed score of 0 is appended to every
  list, calibrating absolute score scale: loss =
  -sum_i y_i log(exp(s_i) / (1 + sum_j exp(s_j)))
  - y_0 log(1 / (1 + sum_j exp(s_j)))
  (tensorflow_ranking/python/keras/losses.py:836-943).
  """

  virtual_label: float = 0.0

  def __post_init__(self):
    if self.virtual_label < 0:
      raise ValueError('virtual_label must be non-negative.')

  def _augment(self, labels, logits, weights, mask):
    batch = labels.shape[0]
    labels = jnp.concatenate(
        [labels, jnp.full((batch, 1), self.virtual_label, labels.dtype)],
        axis=1)
    # The virtual score is 0 *after* temperature scaling, so concat happens
    # on raw logits in __call__ before get_logits... the reference concats
    # post-hoc zeros and then scales; 0/T == 0 so order is irrelevant.
    logits = jnp.concatenate(
        [logits, jnp.zeros((batch, 1), logits.dtype)], axis=1)
    if weights is not None and jnp.ndim(weights) == 2 and (
        weights.shape[1] > 1):
      weights = jnp.concatenate(
          [weights, jnp.ones((batch, 1), weights.dtype)], axis=1)
    if mask is not None:
      mask = jnp.concatenate(
          [mask, jnp.ones((batch, 1), bool)], axis=1)
    return labels, logits, weights, mask

  def __call__(self, labels, logits, weights=None, mask=None,
               reduction: Reduction = Reduction.SUM_BY_NONZERO_WEIGHTS,
               key=None, ragged: bool = False) -> Array:
    if ragged:
      labels, logits, weights, mask = list_ops.ragged_to_dense(
          labels, logits, weights)
    labels = jnp.asarray(labels, jnp.float32)
    logits = jnp.asarray(logits, jnp.float32)
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    if weights is not None:
      weights = jnp.asarray(weights, jnp.float32)
    labels, logits, weights, mask = self._augment(labels, logits, weights,
                                                  mask)
    return SoftmaxLoss.__call__(self, labels, logits, weights=weights,
                                mask=mask, reduction=reduction, key=key)

  def per_list(self, labels, logits, weights=None, mask=None, key=None):
    labels = jnp.asarray(labels, jnp.float32)
    logits = jnp.asarray(logits, jnp.float32)
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    if weights is not None:
      weights = jnp.asarray(weights, jnp.float32)
    labels, logits, weights, mask = self._augment(labels, logits, weights,
                                                  mask)
    return SoftmaxLoss.per_list(self, labels, logits, weights=weights,
                                mask=mask, key=key)


@dataclasses.dataclass(frozen=True)
class PolyOneSoftmaxLoss(SoftmaxLoss):
  """Poly-1 softmax: CE + epsilon * (1 - p_t) (Leng et al., ICLR'22).

  tensorflow_ranking/python/losses_impl.py:1200-1247.
  """

  epsilon: float = 1.0

  def unreduced(self, labels, logits, mask=None, key=None):
    label_dist, label_sum = _label_distribution(labels, mask)
    pt = jnp.sum(label_dist * jax.nn.softmax(logits, axis=-1), axis=-1)
    ce = softmax_cross_entropy(label_dist, logits)
    return ce + self.epsilon * (1.0 - pt), jnp.reshape(label_sum, (-1,))


@dataclasses.dataclass(frozen=True)
class UniqueSoftmaxLoss(_ListwiseLoss):
  """uRank unique-rating softmax (Zhu & Klabjan):
  -sum_i (2^l_i - 1) log softmax over {j : l_j < l_i} + {i}
  (tensorflow_ranking/python/losses_impl.py:1250-1281)."""

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    logits = jnp.where(mask, logits, LOG_EPSILON)
    pairwise_labels, _ = pairwise_comparison(labels, logits, mask)
    # Denominator for item i: logits of strictly-lower-rated docs plus itself.
    denom_logits = logits[:, None, :] * pairwise_labels
    denom_logits = jnp.concatenate(
        [denom_logits, logits[:, :, None]], axis=2)
    denom_mask = jnp.concatenate(
        [pairwise_labels, jnp.ones_like(logits)[:, :, None]], axis=2)
    denom_logits = jnp.where(
        denom_mask > 0.0, denom_logits, jnp.min(denom_logits) - 1e-3)
    logits_max = jnp.max(denom_logits, axis=-1, keepdims=True)
    denom_logits = denom_logits - logits_max
    shifted_logits = logits - jnp.squeeze(logits_max, axis=-1)
    gains = jnp.exp2(labels) - 1.0
    per_doc = -shifted_logits + jnp.log(
        jnp.sum(jnp.exp(denom_logits) * denom_mask, axis=-1))
    losses = jnp.sum(per_doc * gains, axis=1, keepdims=True)
    return losses, jnp.ones_like(losses)


@dataclasses.dataclass(frozen=True)
class ListMLELoss(_ListwiseLoss):
  """ListMLE (Xia et al. 2008): Plackett-Luce NLL of the label order.

  tensorflow_ranking/python/losses_impl.py:1541-1576. Ties in labels are
  broken randomly via ``key`` (deterministic fallback otherwise).
  """

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    logits = jnp.where(mask, logits, LOG_EPSILON)
    scores = jnp.where(
        mask, labels, jnp.min(labels, axis=1, keepdims=True) - 1e-6)
    sorted_labels, sorted_logits = list_ops.sort_by_scores(
        scores, [labels, logits], key=_default_key(key))

    raw_max = jnp.max(sorted_logits, axis=1, keepdims=True)
    sorted_logits = sorted_logits - raw_max
    # Reverse cumulative logsumexp: log sum_{j >= i} exp(s_j) - s_i.
    sums = jnp.cumsum(jnp.exp(sorted_logits)[:, ::-1], axis=1)[:, ::-1]
    sums = jnp.log(sums) - sorted_logits

    if self.lambda_weight is not None and isinstance(
        self.lambda_weight, lw.ListMLELambdaWeight):
      batch, list_size = sorted_labels.shape
      positions = jnp.broadcast_to(
          jnp.arange(1, list_size + 1)[None, :], (batch, list_size))
      sums = sums * self.lambda_weight.individual_weights(
          sorted_labels, positions)

    nll = jnp.sum(sums, axis=1, keepdims=True)
    return nll, jnp.ones_like(nll)


def _mask_to_min_offset(logits: Array, mask: Array) -> Array:
  """Pushes invalid logits 1e3 below the per-list min (Approx* sentinel)."""
  return jnp.where(
      mask, logits, -1e3 + jnp.min(logits, axis=-1, keepdims=True))


def _standardize_logits(logits: Array, mask: Array,
                        temperature: float) -> Array:
  """Per-list masked standardization + sharpness for the Approx* losses.

  ``(s - mean) / (std * temperature)`` over valid entries. This makes the
  loss invariant to the overall logit scale: the sigmoid in approx_ranks
  sees score differences in units of the list's own std, so the gradient
  signal cannot vanish by logit growth. With the reference recipe (a fixed
  ÷0.1), trained logit magnitudes grow unboundedly (measured std 6.7-8.3
  after 400 steps at L=128) and the sigmoid saturates — optimization
  freezes at a seed-chaotic ranking; see APPROX_NDCG_DIAG.json. The
  standardization is differentiated through (mean/std are functions of
  the scores), so scale growth is simply not a descent direction."""
  valid = mask.astype(jnp.float32)
  count = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1.0)
  mean = jnp.sum(jnp.where(mask, logits, 0.0), axis=-1,
                 keepdims=True) / count
  var = jnp.sum(jnp.where(mask, (logits - mean) ** 2, 0.0), axis=-1,
                keepdims=True) / count
  std = jnp.sqrt(var + 1e-12)
  return (logits - mean) / (std * temperature)


@dataclasses.dataclass(frozen=True)
class ApproxNDCGLoss(_ListwiseLoss):
  """-NDCG with sigmoid-approximated ranks (Qin et al.).

  Default temperature 0.1 (tensorflow_ranking/python/losses_impl.py:1579).

  ``scale_invariant=True`` standardizes logits per list before the
  temperature (see _standardize_logits): at long list sizes the reference
  recipe's fixed ÷0.1 lets logit growth saturate the rank sigmoid and
  freeze optimization; the standardized form keeps the gradient alive for
  the whole run and measures ~+0.08 NDCG@5 over the stock recipe of
  EITHER framework at L=128 (APPROX_NDCG_DIAG.json).
  """

  temperature: float = 0.1
  scale_invariant: bool = False

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    if self.scale_invariant:
      # __call__ already divided by temperature; standardization cancels
      # that (and any) prior scale, then reapplies temperature as the
      # post-normalization sharpness.
      logits = _standardize_logits(logits, mask, self.temperature)
    logits = _mask_to_min_offset(logits, mask)
    label_sum = jnp.sum(labels, axis=1, keepdims=True)
    nonzero = label_sum > 0.0
    labels = jnp.where(nonzero, labels, EPSILON)
    ranks = sorting.approx_ranks(logits)
    return -sorting.ndcg(labels, ranks), nonzero.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class ApproxMRRLoss(_ListwiseLoss):
  """-MRR with sigmoid-approximated ranks; default temperature 0.1.

  ``scale_invariant``: see ApproxNDCGLoss."""

  temperature: float = 0.1
  scale_invariant: bool = False

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    if self.scale_invariant:
      logits = _standardize_logits(logits, mask, self.temperature)
    logits = _mask_to_min_offset(logits, mask)
    label_sum = jnp.sum(labels, axis=1, keepdims=True)
    nonzero = label_sum > 0.0
    labels = jnp.where(nonzero, labels, EPSILON)
    rr = 1.0 / sorting.approx_ranks(logits)
    rr = jnp.sum(rr * labels, axis=-1, keepdims=True)
    mrr = rr / jnp.sum(labels, axis=-1, keepdims=True)
    return -mrr, nonzero.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class NeuralSortCrossEntropyLoss(_ListwiseLoss):
  """CE between NeuralSort permutation matrices of labels and logits.

  tensorflow_ranking/python/losses_impl.py:1635-1673.
  """

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    logits = jnp.where(mask, logits, 0.0)
    label_sum = jnp.sum(labels, axis=1, keepdims=True)
    nonzero = label_sum > 0.0

    true_perm = sorting.neural_sort(labels, mask=mask)
    smooth_perm = sorting.neural_sort(logits, mask=mask)
    losses = softmax_cross_entropy(
        true_perm, jnp.log(1e-20 + smooth_perm))

    # NeuralSort pins masked items to trailing rows; zero those rows out.
    sorted_mask = jnp.sort(
        mask.astype(jnp.float32), axis=1)[:, ::-1].astype(bool)
    losses = jnp.where(sorted_mask, losses, 0.0)
    valid_counts = jnp.sum(mask.astype(jnp.float32), axis=-1, keepdims=True)
    losses = jnp.where(
        valid_counts > 0,
        jnp.sum(losses, axis=-1, keepdims=True)
        / jnp.maximum(valid_counts, 1.0),
        0.0)
    return losses, nonzero.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class NeuralSortNDCGLoss(_ListwiseLoss):
  """PiRank-NDCG: -expected NDCG under the NeuralSort soft permutation.

  tensorflow_ranking/python/losses_impl.py:1676-1713.
  """

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    logits = jnp.where(mask, logits, 0.0)
    label_sum = jnp.sum(labels, axis=1, keepdims=True)
    nonzero = label_sum > 0.0
    labels = jnp.where(nonzero, labels, EPSILON)
    smooth_perm = sorting.neural_sort(logits, mask=mask)
    return (-sorting.ndcg(labels, perm_mat=smooth_perm),
            nonzero.astype(jnp.float32))


@dataclasses.dataclass(frozen=True)
class MixtureEMLoss(_ListwiseLoss):
  """EM over a mixture of scoring models; logits are [B, L, num_models].

  tensorflow_ranking/python/losses_impl.py:1472-1538.
  """

  alpha: float = 1.0

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    # [B, L, M] per-model sigmoid CE (M step), masked.
    losses = sigmoid_cross_entropy(labels[:, :, None], logits)
    losses = jnp.where(mask[:, :, None], losses, 0.0)

    # E step: model responsibilities from total per-list log-odds.
    per_list_logodds = jax.lax.stop_gradient(
        jnp.sum(losses, axis=1, keepdims=True))
    model_prob = jnp.exp(-self.alpha * (
        per_list_logodds
        - jnp.min(per_list_logodds, axis=2, keepdims=True)))
    prob_norm = jnp.sum(model_prob, axis=2, keepdims=True)

    label_sum = jnp.sum(labels, axis=1, keepdims=True)
    nonzero = (label_sum > 0.0).astype(jnp.float32)
    out = jnp.sum(losses * model_prob / prob_norm, axis=(1, 2))
    return out[:, None], nonzero


@dataclasses.dataclass(frozen=True)
class CoupledRankDistilLoss(_ListwiseLoss):
  """Coupled RankDistil (Reddi et al. 2021): CE between k-Plackett-Luce
  models of teacher labels and student logits, estimated with Gumbel samples
  of teacher permutations (tensorflow_ranking/python/losses_impl.py:1984)."""

  sample_size: int = 8
  topk: Optional[int] = None

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    label_sum = jnp.sum(labels, axis=1, keepdims=True)
    nonzero = label_sum > 0.0

    teacher = jnp.where(mask, labels, LOG_EPSILON)
    student = jnp.where(mask, logits, LOG_EPSILON)

    batch, list_size = labels.shape
    sample_key, sort_key = jax.random.split(_default_key(key))
    noise = sorting.sample_gumbel(
        sample_key, (batch, self.sample_size, list_size))
    sampled_teacher = teacher[:, None, :] + noise
    sampled_teacher = jnp.log(
        jax.nn.softmax(sampled_teacher, axis=-1) + EPSILON)

    expanded_student = jnp.broadcast_to(
        student[:, None, :], (batch, self.sample_size, list_size))

    # Order student scores by sampled teacher permutations.
    sorted_student = list_ops.sort_by_scores(
        sampled_teacher.reshape(batch * self.sample_size, list_size),
        [expanded_student.reshape(batch * self.sample_size, list_size)],
        key=sort_key)[0]

    topk = self.topk or list_size
    # logprob[i] = s_(i) - log(sum_{j >= i} exp(s_(j)) + i * eps): the
    # reference builds the denominator by REPLACING the i entries before
    # position i with log(eps) rather than excluding them, so each
    # contributes eps to the sum — material for rows deep in the masked
    # tail where exp(s_(j)) is itself ~eps (losses_impl.py:2088-2108).
    raw_max = jnp.max(sorted_student, axis=1, keepdims=True)
    shifted = sorted_student - raw_max
    rev_sum = jnp.cumsum(jnp.exp(shifted)[:, ::-1], axis=1)[:, ::-1]
    replaced = jnp.arange(list_size, dtype=jnp.float32)[None, :]
    rev_lse = jnp.log(rev_sum + replaced * EPSILON * jnp.exp(-raw_max))
    logprob = (shifted - rev_lse)[:, :topk]
    logprob = jnp.sum(logprob, axis=1).reshape(batch, self.sample_size)
    nll = jnp.mean(-logprob, axis=1, keepdims=True)
    return nll, nonzero.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class _PointwiseLoss(RankingLoss):
  """Pointwise family: one loss value per item."""

  def normalize_weights(self, labels, weights):
    if weights is None:
      weights = 1.0
    return jnp.where(
        list_ops.is_label_valid(labels),
        jnp.ones_like(labels) * weights, 0.0)

  def per_list(self, labels, logits, weights=None, mask=None, key=None):
    labels = jnp.asarray(labels, jnp.float32)
    logits = self.get_logits(jnp.asarray(logits, jnp.float32))
    losses, loss_weights = self.unreduced(labels, logits, mask=mask, key=key)
    weights = jnp.multiply(
        self.normalize_weights(labels, weights), loss_weights)
    per_list_weights = jnp.sum(weights, axis=1)
    per_list_losses = jnp.sum(losses * weights, axis=1)
    per_list_losses = jnp.where(
        per_list_weights > 0,
        per_list_losses / jnp.maximum(per_list_weights, 1e-38), 0.0)
    return per_list_losses, per_list_weights


@dataclasses.dataclass(frozen=True)
class SigmoidCrossEntropyLoss(_PointwiseLoss):
  """Per-item sigmoid CE (tensorflow_ranking/python/losses_impl.py:1425)."""

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    logits = jnp.where(mask, logits, 0.0)
    return sigmoid_cross_entropy(labels, logits), mask.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class MeanSquaredLoss(_PointwiseLoss):
  """Per-item squared error (tensorflow_ranking/python/losses_impl.py:1449)."""

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    logits = jnp.where(mask, logits, 0.0)
    return jnp.square(labels - logits), mask.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class OrdinalLoss(_PointwiseLoss):
  """Ordinal regression: per-level sigmoid CE on [B, L, ordinal_size] logits.

  tensorflow_ranking/python/losses_impl.py:1850-1918.
  """

  ordinal_size: int = 1
  use_fraction_label: bool = False

  def _labels_to_ordinals(self, labels: Array, mask: Array) -> Array:
    one_to_n = jnp.arange(1, self.ordinal_size + 1, dtype=jnp.float32)
    unsqueezed = jnp.repeat(labels[:, :, None], self.ordinal_size, axis=-1)
    ordinals = (unsqueezed >= one_to_n).astype(jnp.float32)
    if self.use_fraction_label:
      fractions = unsqueezed - one_to_n + 1.0
      fractions = jnp.where(
          (fractions > 0.0) & (fractions < 1.0), fractions, 0.0)
      ordinals = ordinals + fractions
    return jnp.where(mask[:, :, None], ordinals, 0.0)

  def unreduced(self, labels, logits, mask=None, key=None):
    if logits.ndim != 3 or logits.shape[-1] != self.ordinal_size:
      raise ValueError(
          f'Ordinal loss expects logits [B, L, {self.ordinal_size}], got '
          f'{logits.shape}.')
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    logits = jnp.where(mask[:, :, None], logits, 0.0)
    ordinals = self._labels_to_ordinals(labels, mask)
    losses = jnp.where(mask[:, :, None],
                       sigmoid_cross_entropy(ordinals, logits), 0.0)
    return jnp.sum(losses, axis=-1), mask.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class MultiClassLoss(_PointwiseLoss):
  """One-hot categorical CE with label smoothing on [B, L, C] predictions.

  tensorflow_ranking/python/losses_impl.py:1921-1981.
  """

  num_classes: int = 2
  from_logits: bool = False
  label_smoothing: float = 0.0

  def unreduced(self, labels, logits, mask=None, key=None):
    if logits.ndim != 3 or logits.shape[-1] != self.num_classes:
      raise ValueError(
          f'Multi-class loss expects logits [B, L, {self.num_classes}], got '
          f'{logits.shape}.')
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    labels = jnp.where(mask, labels, 0.0)
    logits = jnp.where(mask[:, :, None], logits, 0.0)
    classes = jax.nn.one_hot(
        labels.astype(jnp.int32), self.num_classes, dtype=jnp.float32)
    classes = jnp.where(mask[:, :, None], classes, 0.0)
    if self.label_smoothing:
      classes = (classes * (1.0 - self.label_smoothing)
                 + self.label_smoothing / self.num_classes)
    if self.from_logits:
      losses = softmax_cross_entropy(classes, logits)
    else:
      probs = logits / jnp.maximum(
          jnp.sum(logits, axis=-1, keepdims=True), 1e-7)
      probs = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
      losses = -jnp.sum(classes * jnp.log(probs), axis=-1)
    losses = losses * mask.astype(jnp.float32)
    return losses, mask.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class ClickEMLoss(_PointwiseLoss):
  """Position-bias EM (Wang et al.): factorized P(click) =
  P(examination) * P(relevance); logits are [B, L, 2] = (exam, rel).
  E-step posteriors are computed in stable logit space and stop-gradiented
  (tensorflow_ranking/python/losses_impl.py:1324-1422)."""

  exam_loss_weight: float = 1.0
  rel_loss_weight: float = 1.0

  def _latent_prob(self, clicks, exam_logits, rel_logits):
    is_clicked = clicks >= 1.0
    exam_posterior = exam_logits - jax.nn.softplus(rel_logits)
    rel_posterior = rel_logits - jax.nn.softplus(exam_logits)
    exam_prob = jnp.where(is_clicked, 1.0, jax.nn.sigmoid(exam_posterior))
    rel_prob = jnp.where(is_clicked, 1.0, jax.nn.sigmoid(rel_posterior))
    return (jax.lax.stop_gradient(exam_prob),
            jax.lax.stop_gradient(rel_prob))

  def unreduced(self, labels, logits, mask=None, key=None):
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    clicks = jnp.where(mask, labels, 0.0)
    exam_logits = jnp.where(mask, logits[..., 0], 0.0)
    rel_logits = jnp.where(mask, logits[..., 1], 0.0)
    exam_prob, rel_prob = self._latent_prob(clicks, exam_logits, rel_logits)
    losses = (sigmoid_cross_entropy(exam_prob, exam_logits)
              * self.exam_loss_weight
              + sigmoid_cross_entropy(rel_prob, rel_logits)
              * self.rel_loss_weight)
    return losses, mask.astype(jnp.float32)
