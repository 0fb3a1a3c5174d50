"""Groupwise (multivariate) scoring: score documents jointly in small groups.

TPU-native re-design of the legacy groupwise ranking model
(tensorflow_ranking/python/model.py:273-421). For ``group_size = g``, rolling
windows of g documents are formed circularly over the *valid* items of each
list (model.py:164-244), every group is scored jointly, and each document's
logit is the mean of its scores across all groups containing it
(scatter-mean, model.py:388-419). ``num_shuffles`` independent shuffles of
the valid items reduce window-composition bias (model.py:313-339).

The whole computation is expressed with static shapes (windows for all L
positions are formed; invalid windows are masked out of the scatter), so one
XLA compilation serves every batch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ranking_tpu.models import layers as layers_lib
from ranking_tpu.utils import list_ops

Array = jax.Array
FeatureDict = Dict[str, Array]


def rolling_group_indices(
    mask: Array,
    group_size: int,
    key: Optional[Array] = None,
):
  """Builds circular rolling-window group indices over valid items.

  Returns:
    indices: ``[B, L, g]`` int32 positions into the original list,
    group_mask: ``[B, L]`` bool — window i is real iff i < num_valid.
  """
  batch, list_size = mask.shape
  valid_first = list_ops.organize_valid_indices(mask, key=key)  # [B, L]
  num_valid = jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)
  safe_n = jnp.maximum(num_valid, 1)
  starts = jnp.arange(list_size)[:, None]           # [L, 1]
  offsets = jnp.arange(group_size)[None, :]          # [1, g]
  windows = jnp.mod(starts + offsets, safe_n[:, :, None])  # [B, L, g]
  # indices[b, i, j] = valid_first[b, windows[b, i, j]]
  indices = jax.vmap(jnp.take)(valid_first, windows)
  group_mask = jnp.arange(list_size)[None, :] < num_valid
  return indices.astype(jnp.int32), group_mask


def scatter_group_scores(
    group_scores: Array,
    indices: Array,
    group_mask: Array,
    list_size: int,
) -> Array:
  """Averages per-group scores back onto document positions.

  Args:
    group_scores: ``[B, G, g]`` scores for each group member.
    indices: ``[B, G, g]`` document positions of each group member.
    group_mask: ``[B, G]`` validity of each group.

  Returns:
    ``[B, list_size]`` mean score per document (0 where never scored).
  """
  weights = group_mask[:, :, None].astype(group_scores.dtype)

  def _scatter_row(scores, idx, w):
    flat_idx = idx.reshape(-1)
    sums = jnp.zeros(list_size, group_scores.dtype).at[flat_idx].add(
        (scores * w).reshape(-1))
    counts = jnp.zeros(list_size, group_scores.dtype).at[flat_idx].add(
        (w * jnp.ones_like(scores)).reshape(-1))
    return sums, counts

  sums, counts = jax.vmap(_scatter_row)(group_scores, indices, weights)
  return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)


class GroupwiseDNNScorer(nn.Module):
  """Joint scorer over rolling document groups with a shared tower.

  Each group's example features are concatenated (g * F features plus
  context) and scored by one tower with g outputs, mirroring the legacy
  ``EstimatorBuilder`` group scoring function (python/estimator.py:397-470).
  ``group_size=1`` recovers plain univariate scoring.
  """

  group_size: int = 2
  hidden_layer_dims: Sequence[int] = (256, 128)
  activation: str = 'relu'
  use_batch_norm: bool = True
  batch_norm_momentum: float = 0.999
  dropout: float = 0.5
  num_shuffles: int = 1
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, context: FeatureDict, examples: FeatureDict,
               mask: Array, training: bool = False) -> Array:
    batch, list_size = mask.shape
    g = self.group_size

    # [B, L, F] dense example features; [B, Fc] context.
    feats = layers_lib.concat_features({}, examples, mask,
                                       circular_padding=False)
    context_parts = [context[k].reshape(batch, -1).astype(jnp.float32)
                     for k in sorted(context)]
    context_vec = (jnp.concatenate(context_parts, axis=-1)
                   if context_parts else None)

    tower = layers_lib.Tower(
        hidden_layer_dims=self.hidden_layer_dims,
        output_units=g,
        activation=self.activation,
        use_batch_norm=self.use_batch_norm,
        batch_norm_momentum=self.batch_norm_momentum,
        dropout=self.dropout,
        dtype=self.dtype)

    def score_groups(indices: Array, group_mask: Array) -> Array:
      # Gather member features: [B, G=L, g, F].
      group_feats = jax.vmap(lambda f, i: f[i])(feats, indices)
      flat = group_feats.reshape(batch * list_size, -1)
      if context_vec is not None:
        tiled = jnp.repeat(context_vec, list_size, axis=0)
        flat = jnp.concatenate([tiled, flat], axis=-1)
      scores = tower(flat, training=training)  # [B*L, g]
      scores = scores.reshape(batch, list_size, g)
      return scatter_group_scores(scores, indices, group_mask, list_size)

    if self.num_shuffles < 1:
      # The legacy reference asserts this at build time (model.py:326);
      # silently looping zero times would emit 0/0 = NaN logits.
      raise ValueError(f'num_shuffles must be >= 1, got {self.num_shuffles}')
    num_shuffles = self.num_shuffles if (training and g > 1) else 1
    total = jnp.zeros((batch, list_size), jnp.float32)
    for shuffle_idx in range(num_shuffles):
      key = None
      # The reference shuffles valid items for ANY non-predict pass with
      # group_size > 1, even at num_shuffles == 1 (model.py:313-339) —
      # without it every document is grouped with the same list-order
      # neighbors on every step (window-composition bias). DELIBERATE
      # DEVIATION: this scorer shuffles only when ``training`` — the
      # reference also shuffles at EVAL (its eval metrics are therefore
      # nondeterministic run to run), while here eval == predict uses the
      # fixed rolling windows, making val metrics, best-export decisions,
      # and the serving scores deterministic AND mutually consistent
      # (scoring under eval-only shuffles would diverge from what the
      # exported model serves). Set num_shuffles > 1 at training to
      # average window composition where it matters for learning.
      if training and g > 1:
        key = jax.random.fold_in(self.make_rng('shuffle'), shuffle_idx)
      indices, group_mask = rolling_group_indices(mask, g, key=key)
      total = total + score_groups(indices, group_mask)
    logits = total / float(num_shuffles)
    return jnp.where(mask, logits, jnp.log(1e-10))
