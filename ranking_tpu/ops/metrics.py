"""Ranking metrics as pure per-list functions.

TPU-native re-design of tensorflow_ranking/python/metrics_impl.py. Every
metric is a frozen dataclass whose ``__call__`` returns
``(per_list_values [B, 1], per_list_weights [B, 1])``. The weighted mean of
these streams (see ``ranking_tpu.ops.metric_registry.MeanState``) reproduces
the reference's ``tf.metrics.mean`` semantics, and the (sum, count) state is
``psum``-able across a device mesh for exact multi-host evaluation.

Shared semantics ported faithfully:
* input preparation: mask = valid-label AND weight > 0; invalid predictions
  are reset below the per-list min (metrics_impl.py:228-266),
* ``per_example_weights_to_per_list_weights`` with its batch-global
  average-weight fallback for zero-relevance lists (metrics_impl.py:63-119) —
  the behavior that makes weighted/unbiased metrics comparable.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from ranking_tpu.utils import fns, list_ops

Array = jnp.ndarray

# One source of truth for the DCG defaults: the named fn registry
# (utils/fns.py). Fast paths dispatch on function IDENTITY (e.g.
# `rank_discount_fn is fns.log2_inverse`), so equivalent local lambdas
# would never match them.
DEFAULT_GAIN_FN = fns.pow_minus_1
DEFAULT_RANK_DISCOUNT_FN = fns.log2_inverse


def _div_no_nan(a: Array, b: Array) -> Array:
  return jnp.where(b != 0, a / jnp.where(b != 0, b, 1.0), 0.0)


def per_example_weights_to_per_list_weights(
    weights: Array, relevance: Array) -> Array:
  """Per-list weights = sum(weights * relevance) / sum(relevance).

  Lists with zero total relevance (but nonzero weight) fall back to the
  batch-average per-list weight; if every list has zero relevance the average
  is 1.0. See metrics_impl.py:63-119 for the full rationale.
  """
  nonzero_weights = jnp.sum(weights, axis=1, keepdims=True) > 0.0
  per_list_relevance = jnp.sum(relevance, axis=1, keepdims=True)
  nonzero_relevance = jnp.where(
      nonzero_weights, (per_list_relevance > 0.0).astype(jnp.float32), 0.0)
  nonzero_relevance_count = jnp.sum(nonzero_relevance, axis=0, keepdims=True)

  per_list_weights = _div_no_nan(
      jnp.sum(weights * relevance, axis=1, keepdims=True),
      per_list_relevance)
  sum_weights = jnp.sum(per_list_weights, axis=0, keepdims=True)
  avg_weight = jnp.where(
      nonzero_relevance_count > 0.0,
      _div_no_nan(sum_weights, nonzero_relevance_count),
      jnp.ones_like(nonzero_relevance_count))
  return jnp.where(
      nonzero_weights,
      jnp.where(per_list_relevance > 0.0, per_list_weights, avg_weight),
      0.0)


def discounted_cumulative_gain(
    labels: Array,
    weights: Array,
    gain_fn: Callable[[Array], Array] = DEFAULT_GAIN_FN,
    rank_discount_fn: Callable[[Array], Array] = DEFAULT_RANK_DISCOUNT_FN,
) -> Array:
  """Weighted DCG over already rank-ordered labels; [B, 1]."""
  list_size = labels.shape[1]
  position = jnp.arange(1, list_size + 1, dtype=jnp.float32)
  gain = gain_fn(labels.astype(jnp.float32))
  discount = rank_discount_fn(position)
  return jnp.sum(weights * gain * discount, axis=1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class RankingMetric:
  """Base metric: shared input preparation + compute dispatch."""

  name: str = ''
  topn: Optional[int] = None

  def prepare(self, labels, predictions, weights, mask):
    # Inside a shared_sort_scope (the eval step), identical preparations
    # are interned: every metric in the suite then holds the SAME
    # prepared labels/predictions/mask tracers, so their per-metric
    # sorts collapse into the scope's one shared sort order. prepare is
    # metric-independent, so the interning is exact.
    cache = list_ops.shared_sort_cache()
    ck = None
    if cache is not None:
      ck = ('metric_prepare', id(labels), id(predictions), id(weights),
            id(mask))
      hit = cache.get(ck)
      if hit is not None:
        # The stored inputs tuple keeps the keyed objects alive so their
        # ids cannot be recycled; verify the invariant on every hit —
        # free at trace time, and turns a silent aliasing bug (if a
        # future edit drops the pin) into an immediate failure.
        pinned = hit[0]
        if not (pinned[0] is labels and pinned[1] is predictions
                and pinned[2] is weights and pinned[3] is mask):
          # Explicit raise, not `assert`: python -O must not strip the
          # tripwire that turns this silent aliasing bug into a failure.
          raise AssertionError(
              'shared_sort_scope id-cache hit with non-identical '
              'operands: id() was recycled; the pinned inputs tuple '
              'must keep keyed objects alive')
        return hit[1]
      inputs = (labels, predictions, weights, mask)  # pin ids
    labels = jnp.asarray(labels, jnp.float32)
    predictions = jnp.asarray(predictions, jnp.float32)
    weights = 1.0 if weights is None else jnp.asarray(weights, jnp.float32)
    example_weights = jnp.ones_like(labels) * weights
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    mask = mask & (example_weights > 0.0)
    labels = jnp.where(mask, labels, 0.0)
    predictions = jnp.where(
        mask, predictions,
        -1e-6 + jnp.min(predictions, axis=1, keepdims=True))
    out = (labels, predictions, example_weights, mask)
    if ck is not None:
      cache[ck] = (inputs, out)
    return out

  def __call__(self, labels, predictions, weights=None, mask=None,
               key=None) -> Tuple[Array, Array]:
    labels, predictions, weights, mask = self.prepare(
        labels, predictions, weights, mask)
    return self.compute(labels, predictions, weights, mask, key=key)

  def compute(self, labels, predictions, weights, mask, key=None):
    raise NotImplementedError


def _binary_relevance(labels: Array) -> Array:
  return (labels >= 1.0).astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class MRRMetric(RankingMetric):
  """Mean reciprocal rank over topn (metrics_impl.py:429-459)."""

  def compute(self, labels, predictions, weights, mask, key=None):
    sorted_labels, = list_ops.sort_by_scores(
        predictions, [labels], topn=self.topn, mask=mask, key=key)
    relevance = _binary_relevance(sorted_labels)
    rr = 1.0 / jnp.arange(1, sorted_labels.shape[1] + 1, dtype=jnp.float32)
    mrr = jnp.max(relevance * rr[None, :], axis=1, keepdims=True)
    per_list_weights = per_example_weights_to_per_list_weights(
        weights, _binary_relevance(labels))
    return mrr, per_list_weights


@dataclasses.dataclass(frozen=True)
class HitsMetric(RankingMetric):
  """Hits@k: 1 if any relevant item in the top k (metrics_impl.py:462)."""

  def compute(self, labels, predictions, weights, mask, key=None):
    sorted_labels, = list_ops.sort_by_scores(
        predictions, [labels], topn=self.topn, mask=mask, key=key)
    hits = jnp.max(_binary_relevance(sorted_labels), axis=1, keepdims=True)
    per_list_weights = per_example_weights_to_per_list_weights(
        weights, _binary_relevance(labels))
    return hits, per_list_weights


@dataclasses.dataclass(frozen=True)
class ARPMetric(RankingMetric):
  """Average relevance position (metrics_impl.py:509-536)."""

  def __post_init__(self):
    if self.topn is not None:
      # The reference never exposes a cutoff on ARP; accepting one and
      # ignoring it would be a silent no-op parameter.
      raise ValueError('ARP has no topn cutoff (full-list metric)')

  def compute(self, labels, predictions, weights, mask, key=None):
    list_size = predictions.shape[1]
    sorted_labels, sorted_weights = list_ops.sort_by_scores(
        predictions, [labels, weights], topn=list_size, mask=mask, key=key)
    weighted_labels = sorted_labels * sorted_weights
    position = jnp.arange(1, list_size + 1, dtype=jnp.float32)[None, :]
    per_list_weights = jnp.sum(weighted_labels, axis=1, keepdims=True)
    per_list_arp = _div_no_nan(
        jnp.sum(position * weighted_labels, axis=1, keepdims=True),
        per_list_weights)
    return per_list_arp, per_list_weights


@dataclasses.dataclass(frozen=True)
class RecallMetric(RankingMetric):
  """Recall@k (metrics_impl.py:539-561, helper :154-177)."""

  def compute(self, labels, predictions, weights, mask, key=None):
    sorted_labels, = list_ops.sort_by_scores(
        predictions, [labels], topn=self.topn, mask=mask, key=key)
    topn_positives = _binary_relevance(sorted_labels)
    relevance = _binary_relevance(labels)
    per_list_recall = _div_no_nan(
        jnp.sum(topn_positives, axis=1, keepdims=True),
        jnp.sum(relevance, axis=1, keepdims=True))
    per_list_weights = per_example_weights_to_per_list_weights(
        weights, relevance)
    return per_list_recall, per_list_weights


@dataclasses.dataclass(frozen=True)
class PrecisionMetric(RankingMetric):
  """Precision@k with valid-topn clamping (metrics_impl.py:564-586)."""

  def compute(self, labels, predictions, weights, mask, key=None):
    sorted_labels, = list_ops.sort_by_scores(
        predictions, [labels], topn=self.topn, mask=mask, key=key)
    relevance_topn = _binary_relevance(sorted_labels)
    topn = self.topn if self.topn is not None else predictions.shape[1]
    valid_topn = jnp.minimum(
        topn, jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True))
    per_list_precision = _div_no_nan(
        jnp.sum(relevance_topn, axis=1, keepdims=True),
        valid_topn.astype(jnp.float32))
    per_list_weights = per_example_weights_to_per_list_weights(
        weights, _binary_relevance(labels))
    return per_list_precision, per_list_weights


@dataclasses.dataclass(frozen=True)
class MeanAveragePrecisionMetric(RankingMetric):
  """MAP@k (metrics_impl.py:589-628)."""

  def compute(self, labels, predictions, weights, mask, key=None):
    relevance = _binary_relevance(labels)
    sorted_relevance, sorted_weights = list_ops.sort_by_scores(
        predictions, [relevance, weights], topn=self.topn, mask=mask, key=key)
    relevant_counts = jnp.cumsum(sorted_relevance, axis=1)
    cutoffs = jnp.cumsum(jnp.ones_like(sorted_relevance), axis=1)
    precisions = _div_no_nan(relevant_counts, cutoffs)
    total_precision = jnp.sum(
        precisions * sorted_weights * sorted_relevance, axis=1, keepdims=True)
    total_relevance = jnp.sum(weights * relevance, axis=1, keepdims=True)
    per_list_map = _div_no_nan(total_precision, total_relevance)
    per_list_weights = per_example_weights_to_per_list_weights(
        weights, relevance)
    return per_list_map, per_list_weights


@dataclasses.dataclass(frozen=True)
class NDCGMetric(RankingMetric):
  """NDCG@k with configurable gain/discount (metrics_impl.py:631-670)."""

  gain_fn: Callable[[Array], Array] = DEFAULT_GAIN_FN
  rank_discount_fn: Callable[[Array], Array] = DEFAULT_RANK_DISCOUNT_FN

  def compute(self, labels, predictions, weights, mask, key=None):
    sorted_labels, sorted_weights = list_ops.sort_by_scores(
        predictions, [labels, weights], topn=self.topn, mask=mask, key=key)
    dcg = discounted_cumulative_gain(
        sorted_labels, sorted_weights, self.gain_fn, self.rank_discount_fn)
    weighted_gains = weights * self.gain_fn(labels)
    # Independent tie-shuffle for the ideal sort: reusing `key` would
    # correlate numerator and denominator tie-breaks.
    ideal_key = None if key is None else jax.random.split(key)[1]
    ideal_labels, ideal_weights = list_ops.sort_by_scores(
        weighted_gains, [labels, weights], topn=self.topn, mask=mask,
        key=ideal_key)
    ideal_dcg = discounted_cumulative_gain(
        ideal_labels, ideal_weights, self.gain_fn, self.rank_discount_fn)
    per_list_ndcg = _div_no_nan(dcg, ideal_dcg)
    per_list_weights = per_example_weights_to_per_list_weights(
        weights, self.gain_fn(labels))
    return per_list_ndcg, per_list_weights


@dataclasses.dataclass(frozen=True)
class DCGMetric(RankingMetric):
  """DCG@k normalized by the per-list weight (metrics_impl.py:673-705)."""

  gain_fn: Callable[[Array], Array] = DEFAULT_GAIN_FN
  rank_discount_fn: Callable[[Array], Array] = DEFAULT_RANK_DISCOUNT_FN

  def compute(self, labels, predictions, weights, mask, key=None):
    sorted_labels, sorted_weights = list_ops.sort_by_scores(
        predictions, [labels, weights], topn=self.topn, mask=mask, key=key)
    dcg = discounted_cumulative_gain(
        sorted_labels, sorted_weights, self.gain_fn, self.rank_discount_fn)
    per_list_weights = per_example_weights_to_per_list_weights(
        weights, self.gain_fn(labels))
    return _div_no_nan(dcg, per_list_weights), per_list_weights


@dataclasses.dataclass(frozen=True)
class OPAMetric(RankingMetric):
  """Ordered pair accuracy (metrics_impl.py:708-743)."""

  def __post_init__(self):
    if self.topn is not None:
      raise ValueError('OPA has no topn cutoff (all-pairs metric)')

  def compute(self, labels, predictions, weights, mask, key=None):
    valid_pair = mask[:, :, None] & mask[:, None, :]
    pair_label_diff = labels[:, :, None] - labels[:, None, :]
    pair_pred_diff = predictions[:, :, None] - predictions[:, None, :]
    correct = ((pair_label_diff > 0).astype(jnp.float32)
               * (pair_pred_diff > 0).astype(jnp.float32))
    pair_weights = ((pair_label_diff > 0).astype(jnp.float32)
                    * weights[:, :, None]
                    * valid_pair.astype(jnp.float32))
    per_list_weights = jnp.sum(pair_weights, axis=(1, 2))[:, None]
    per_list_opa = _div_no_nan(
        jnp.sum(correct * pair_weights, axis=(1, 2))[:, None],
        per_list_weights)
    return per_list_opa, per_list_weights


@dataclasses.dataclass(frozen=True)
class _DivRankingMetric(RankingMetric):
  """Diversity metrics over [B, L, subtopic] labels (metrics_impl.py:313)."""

  def prepare(self, labels, predictions, weights, mask):
    labels = jnp.asarray(labels, jnp.float32)
    predictions = jnp.asarray(predictions, jnp.float32)
    if labels.ndim != 3:
      raise ValueError(f'Diversity labels must be rank 3, got {labels.shape}')
    if mask is None:
      mask = list_ops.is_label_valid(labels)
    if mask.ndim == 3:
      mask = jnp.any(mask, axis=2)
    predictions = jnp.where(
        mask, predictions,
        -1e-6 + jnp.min(predictions, axis=1, keepdims=True))
    labels = jnp.where(mask[:, :, None], labels, 0.0)
    weights = 1.0 if weights is None else jnp.asarray(weights, jnp.float32)
    example_weights = jnp.ones_like(predictions) * weights
    return labels, predictions, example_weights, mask

  def _per_list_weights(self, weights, labels):
    return per_example_weights_to_per_list_weights(
        weights,
        jnp.any(labels >= 1.0, axis=-1).astype(jnp.float32))


@dataclasses.dataclass(frozen=True)
class PrecisionIAMetric(_DivRankingMetric):
  """Intent-aware Precision@k (metrics_impl.py:746-782)."""

  def compute(self, labels, predictions, weights, mask, key=None):
    sorted_labels, = list_ops.sort_by_scores(
        predictions, [labels], topn=self.topn, mask=mask, key=key)
    relevance = jnp.sum(
        (sorted_labels >= 1.0).astype(jnp.float32), axis=-1)
    num_subtopics = jnp.sum(
        jnp.any(labels >= 1.0, axis=1, keepdims=True).astype(jnp.float32),
        axis=-1)
    topn = self.topn if self.topn is not None else predictions.shape[1]
    valid_topn = jnp.minimum(
        topn, jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True))
    per_list = _div_no_nan(
        jnp.sum(relevance, axis=1, keepdims=True),
        jnp.sum(valid_topn.astype(jnp.float32) * num_subtopics,
                axis=1, keepdims=True))
    return per_list, self._per_list_weights(weights, labels)


@dataclasses.dataclass(frozen=True)
class AlphaDCGMetric(_DivRankingMetric):
  """alpha-DCG@k for diversification (metrics_impl.py:785-822)."""

  alpha: float = 0.5
  rank_discount_fn: Callable[[Array], Array] = DEFAULT_RANK_DISCOUNT_FN

  def _gain_fn(self, labels: Array) -> Array:
    # Subtopic gains decay by (1 - alpha)^(#docs already covering it).
    cum_subtopics = jnp.cumsum(labels, axis=1) - labels  # exclusive cumsum
    return jnp.sum(
        labels * jnp.power(1.0 - self.alpha, cum_subtopics), axis=-1)

  def compute(self, labels, predictions, weights, mask, key=None):
    sorted_labels, sorted_weights = list_ops.sort_by_scores(
        predictions, [labels, weights], topn=self.topn, mask=mask, key=key)
    alpha_dcg = discounted_cumulative_gain(
        sorted_labels, sorted_weights, self._gain_fn, self.rank_discount_fn)
    per_list_weights = self._per_list_weights(weights, labels)
    return _div_no_nan(alpha_dcg, per_list_weights), per_list_weights


@dataclasses.dataclass(frozen=True)
class BPrefMetric(RankingMetric):
  """Binary preference; TREC-2005 or classic formula (metrics_impl.py:825)."""

  use_trec_version: bool = True

  def compute(self, labels, predictions, weights, mask, key=None):
    relevance = _binary_relevance(labels)
    irrelevance = mask.astype(jnp.float32) - relevance
    total_relevance = jnp.sum(relevance, axis=1, keepdims=True)
    total_irrelevance = jnp.sum(irrelevance, axis=1, keepdims=True)
    sorted_relevance, sorted_irrelevance = list_ops.sort_by_scores(
        predictions, [relevance, irrelevance], topn=self.topn, mask=mask,
        key=key)
    numerator = jnp.minimum(
        jnp.cumsum(sorted_irrelevance, axis=1), total_relevance)
    denominator = (jnp.minimum(total_irrelevance, total_relevance)
                   if self.use_trec_version else total_relevance)
    bpref = _div_no_nan(
        jnp.sum((1.0 - _div_no_nan(numerator, denominator))
                * sorted_relevance, axis=1, keepdims=True),
        total_relevance)
    per_list_weights = per_example_weights_to_per_list_weights(
        weights, relevance)
    return bpref, per_list_weights


@dataclasses.dataclass(frozen=True)
class PWAMetric(RankingMetric):
  """Position-weighted average rating; weights must be per-list [B, 1]
  (metrics_impl.py:901-965)."""

  topn: Optional[int] = 5

  def compute(self, labels, predictions, weights, mask, key=None):
    sorted_labels, sorted_mask = list_ops.sort_by_scores(
        predictions, [labels, mask], topn=self.topn, mask=mask, key=key)
    position_weights = 1.0 / jnp.arange(
        1, sorted_labels.shape[1] + 1, dtype=jnp.float32)
    masked_pw = sorted_mask.astype(jnp.float32) * position_weights[None, :]
    pwa = _div_no_nan(
        jnp.sum(sorted_labels * masked_pw, axis=1, keepdims=True),
        jnp.sum(masked_pw, axis=1, keepdims=True))
    per_list_weights = weights[:, :1]
    return pwa, per_list_weights

  def __call__(self, labels, predictions, weights=None, mask=None,
               key=None):
    # The reference validates PWA weights are per-list [batch_size, 1]
    # (metrics_impl.py:901-965 raises); silently averaging per-example
    # weights would diverge without a diagnostic. Static shape check,
    # before the base prepare broadcasts to [B, L].
    if weights is not None:
      shape = jnp.shape(weights)
      if len(shape) >= 2 and shape[-1] != 1:
        raise ValueError(
            'PWA weights must be per-list [batch_size, 1] '
            f'(got shape {shape})')
    return super().__call__(labels, predictions, weights=weights,
                            mask=mask, key=key)
