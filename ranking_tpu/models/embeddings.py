"""Embedding encoders for sparse/categorical ranking features.

Replaces the reference's feature-column embedding path
(tensorflow_ranking/python/feature.py:79-133,
examples/tf_ranking_tfrecord.py:99-115): token-id features ``[B, T]``
(context) or ``[B, L, T]`` (example) are looked up in a dense table and
pooled over the token axis. Padding id < 0 is masked out of the pooling.

For pod-scale vocabularies, ``ranking_tpu.parallel.embedding`` provides the
row-sharded table with all-to-all ID exchange; this module is the single-chip
(replicated-table) form sharing the same pooling semantics.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def pooled_lookup(
    table: Array,
    ids: Array,
    combiner: str = 'mean',
) -> Array:
  """Masked pooled embedding lookup.

  Args:
    table: ``[vocab, dim]`` embedding table.
    ids: integer ids, any shape ``[..., T]``; ids < 0 are padding. Ids
      >= vocab clip to the last row and still count toward the combiner
      (explicit ``mode='clip'`` — jnp.take's default would fill NaN
      under jit, and the sharded explicit-collective path
      (parallel.sharded_pooled_lookup) clamps identically so the two
      paths agree on out-of-range inputs).
    combiner: 'mean' | 'sum' | 'sqrtn'.

  Returns:
    ``[..., dim]`` pooled embeddings.
  """
  valid = ids >= 0
  safe_ids = jnp.where(valid, ids, 0)
  embeds = jnp.take(table, safe_ids, axis=0, mode='clip')
  embeds = jnp.where(valid[..., None], embeds, 0.0)
  summed = jnp.sum(embeds, axis=-2)
  counts = jnp.sum(valid.astype(embeds.dtype), axis=-1, keepdims=True)
  if combiner == 'sum':
    return summed
  if combiner == 'mean':
    return summed / jnp.maximum(counts, 1.0)
  if combiner == 'sqrtn':
    return summed / jnp.sqrt(jnp.maximum(counts, 1.0))
  raise ValueError(f'Unknown combiner {combiner!r}')


class EmbeddingEncoder(nn.Module):
  """Learned embedding table with masked pooling over a token axis."""

  vocab_size: int
  embedding_dim: int
  combiner: str = 'mean'
  param_dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, ids: Array) -> Array:
    table = self.param(
        'embedding', nn.initializers.normal(stddev=1e-2),
        (self.vocab_size, self.embedding_dim), self.param_dtype)
    return pooled_lookup(table, ids, self.combiner)


class HashEmbeddingEncoder(nn.Module):
  """Embedding over hashed string/int ids (vocabulary-free).

  Equivalent of `categorical_column_with_hash_bucket` + embedding: ids are
  reduced modulo ``num_buckets`` before lookup. Callers hash raw strings
  host-side (the data layer does this for token features).
  """

  num_buckets: int
  embedding_dim: int
  combiner: str = 'mean'
  param_dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, ids: Array) -> Array:
    valid = ids >= 0
    hashed = jnp.where(valid, jnp.mod(ids, self.num_buckets), -1)
    table = self.param(
        'embedding', nn.initializers.normal(stddev=1e-2),
        (self.num_buckets, self.embedding_dim), self.param_dtype)
    return pooled_lookup(table, hashed, self.combiner)
