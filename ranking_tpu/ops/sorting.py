"""Differentiable ranking relaxations: approx ranks, NDCG, NeuralSort, Gumbel.

TPU-native forms of the reference's smooth-sorting machinery
(tensorflow_ranking/python/losses_impl.py:77-167,483-649,1716-1847). These are
the O(L^2) building blocks of the Approx*/NeuralSort loss families; the jnp
expressions here are the semantic source of truth, with fused Pallas kernels
in ``ranking_tpu.ops.pallas`` as drop-in accelerations.

Conventions: logits/labels are ``[B, L]`` float32, ``mask`` is ``[B, L]``
bool. Randomness flows through explicit PRNG keys.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ranking_tpu.utils import list_ops

Array = jnp.ndarray

# Smallest probability used to derive logits of invalid entries, matching the
# reference's sentinel (tensorflow_ranking/python/losses_impl.py:30).
EPSILON = 1e-10


def safe_gains(labels: Array) -> Array:
  """Overflow-safe 2^l - 1 style gains, shifted by the per-list max label.

  gains_i = 2^(l_i - max_l) - 2^(-max_l); the shift cancels in any normalized
  (NDCG-style) ratio while keeping exp2 arguments bounded
  (tensorflow_ranking/python/losses_impl.py:33-49).
  """
  max_labels = jnp.max(labels, axis=-1, keepdims=True)
  return jnp.exp2(labels - max_labels) - jnp.exp2(-max_labels)


def compute_ranks(
    logits: Array,
    is_valid: Array,
    key: Optional[Array] = None,
) -> Array:
  """1-based ranks of items by logit, with invalid items ranked last.

  Invalid logits are replaced by (row min - 1e-6) before ranking
  (tensorflow_ranking/python/losses_impl.py:483-500).
  """
  scores = jnp.where(
      is_valid, logits,
      jnp.min(logits, axis=1, keepdims=True) - 1e-6)
  return list_ops.sorted_ranks(scores, key=key)


def approx_ranks(logits: Array) -> Array:
  """Sigmoid-smoothed ranks: rank_i = 0.5 + sum_j sigmoid(s_j - s_i).

  The j == i term contributes exactly 0.5, so rank_i smoothly approximates
  1 + |{j : s_j > s_i}| (tensorflow_ranking/python/losses_impl.py:77-106).
  Temperature is applied by the caller via logit scaling. XLA fuses the
  [B, L, L] sigmoid slab into its consumers at parity with a hand kernel
  on every measured shape (a Pallas version was retired in round 4 after
  two sweeps showed 0.95-1.06x everywhere).
  """
  pairs = jax.nn.sigmoid(logits[:, None, :] - logits[:, :, None])
  return jnp.sum(pairs, axis=-1) + 0.5


def inverse_max_dcg(
    labels: Array,
    gain_fn: Callable[[Array], Array] = lambda l: jnp.exp2(l) - 1.0,
    rank_discount_fn: Callable[[Array], Array] = lambda r: 1.0 / jnp.log1p(r),
    topn: Optional[int] = None,
) -> Array:
  """[B, 1] multiplier 1/maxDCG, 0 where the ideal DCG is 0.

  tensorflow_ranking/python/losses_impl.py:109-134.
  """
  ideal_sorted, = list_ops.sort_by_scores(labels, [labels], topn=topn)
  ranks = jnp.arange(1, ideal_sorted.shape[1] + 1, dtype=jnp.float32)
  discounted = gain_fn(ideal_sorted) * rank_discount_fn(ranks)[None, :]
  ideal_dcg = jnp.sum(discounted, axis=1, keepdims=True)
  return jnp.where(ideal_dcg > 0.0, 1.0 / ideal_dcg,
                   jnp.zeros_like(ideal_dcg))


def ndcg(
    labels: Array,
    ranks: Optional[Array] = None,
    perm_mat: Optional[Array] = None,
) -> Array:
  """NDCG with safe gains, from (possibly soft) ranks or a permutation matrix.

  ``ranks=None`` assumes labels are already in rank order. ``perm_mat`` is a
  ``[B, L, L]`` row-stochastic matrix (rows = ranks, cols = items), giving the
  expected NDCG under that soft permutation
  (tensorflow_ranking/python/losses_impl.py:137-167).
  """
  if ranks is not None and perm_mat is not None:
    raise ValueError('Pass at most one of ranks and perm_mat.')
  list_size = labels.shape[1]
  if ranks is None:
    ranks = jnp.arange(1, list_size + 1, dtype=jnp.float32)[None, :]
  discounts = 1.0 / jnp.log1p(ranks.astype(jnp.float32))
  gains = safe_gains(labels.astype(jnp.float32))
  if perm_mat is not None:
    gains = jnp.sum(perm_mat * gains[:, None, :], axis=-1)
  dcg = jnp.sum(gains * discounts, axis=-1, keepdims=True)
  return dcg * inverse_max_dcg(labels, gain_fn=safe_gains)


def neural_sort(
    logits: Array,
    mask: Optional[Array] = None,
    temperature: float = 1.0,
) -> Array:
  """Differentiable permutation matrix via NeuralSort (Grover et al. 2019).

  P_hat[b, k, i] = softmax_i(((n + 1 - 2k) * s_i - sum_j |s_i - s_j|) / t),
  mask-aware: invalid items are pinned to the trailing rows and rows of
  invalid rank spread probability uniformly over invalid items
  (tensorflow_ranking/python/losses_impl.py:1716-1801).
  """
  if mask is None:
    mask = jnp.ones_like(logits, dtype=bool)
  logits = jnp.where(mask, logits, 0.0)
  num_valid = jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)

  logit_diff = jnp.abs(logits[:, :, None] - logits[:, None, :])
  valid_pair = mask[:, :, None] & mask[:, None, :]
  logit_diff = jnp.where(valid_pair, logit_diff, 0.0)
  # [B, 1, L]: sum over the first pair axis.
  diff_sum = jnp.sum(logit_diff, axis=1, keepdims=True)

  # Rank coefficients computed over valid positions only.
  masked_range = jnp.cumsum(mask.astype(jnp.int32), axis=1)
  scaling = (num_valid + 1 - 2 * masked_range).astype(jnp.float32)
  p_logits = scaling[:, :, None] * logits[:, None, :] - diff_sum

  p_logits = jnp.where(valid_pair, p_logits, -jnp.inf)
  either_valid = mask[:, :, None] | mask[:, None, :]
  p_logits = jnp.where(either_valid, p_logits, 0.0)

  # Move rows belonging to masked items to the bottom of the matrix.
  order = jnp.argsort(-mask.astype(jnp.int32), axis=1, stable=True)
  p_logits = jnp.take_along_axis(p_logits, order[:, :, None], axis=1)
  return jax.nn.softmax(p_logits / temperature, axis=-1)


def sample_gumbel(
    key: Array,
    shape: Tuple[int, ...],
    eps: float = 1e-20,
) -> Array:
  """Standard Gumbel(0, 1) noise: -log(-log U)."""
  u = jax.random.uniform(key, shape, dtype=jnp.float32)
  return -jnp.log(-jnp.log(u + eps) + eps)


def gumbel_neural_sort(
    logits: Array,
    key: Array,
    sample_size: int = 8,
    temperature: float = 1.0,
) -> Array:
  """[B, S, L, L] stochastic NeuralSort over Gumbel-perturbed logits.

  tensorflow_ranking/python/losses_impl.py:1804-1847.
  """
  batch, list_size = logits.shape
  noise = sample_gumbel(key, (batch, sample_size, list_size))
  sampled = (logits[:, None, :] + noise).reshape(
      batch * sample_size, list_size)
  perm = neural_sort(sampled / temperature)
  return perm.reshape(batch, sample_size, list_size, list_size)


def gumbel_sample_lists(
    labels: Array,
    logits: Array,
    key: Array,
    weights: Optional[Array] = None,
    sample_size: int = 8,
    temperature: float = 1.0,
) -> Tuple[Array, Array, Optional[Array]]:
  """Expands a batch to ``batch * sample_size`` Gumbel-resampled lists.

  Labels (and weights) are tiled; logits are replaced by masked log-softmax of
  Gumbel-perturbed logits, the Concrete-distribution trick used by all
  ``gumbel_*`` losses (tensorflow_ranking/python/losses_impl.py:540-644).

  Supports 2-D labels and 3-D (diversity, ``[B, L, S]`` subtopic) labels.
  """
  batch, list_size = logits.shape

  expanded_labels = jnp.repeat(labels[:, None], sample_size, axis=1)
  expanded_labels = expanded_labels.reshape(
      (batch * sample_size,) + labels.shape[1:])

  noise = sample_gumbel(key, (batch, sample_size, list_size))
  sampled_logits = (logits[:, None, :] + noise).reshape(
      batch * sample_size, list_size)

  valid = list_ops.is_label_valid(expanded_labels)
  if valid.ndim > 2:
    valid = jnp.any(valid, axis=-1)
  sampled_logits = jnp.where(valid, sampled_logits / temperature,
                             math.log(1e-20))
  sampled_logits = jnp.log(jax.nn.softmax(sampled_logits, axis=-1) + 1e-20)

  expanded_weights = None
  if weights is not None:
    weights = jnp.asarray(weights, dtype=jnp.float32)
    if weights.ndim == 1:
      weights = weights[:, None]
    expanded_weights = jnp.repeat(weights[:, None, :], sample_size, axis=1)
    expanded_weights = expanded_weights.reshape(batch * sample_size, -1)

  return expanded_labels, sampled_logits, expanded_weights
