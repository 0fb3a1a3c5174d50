"""Row-sharded embedding tables with explicit collective lookup.

SPMD replacement for the reference's ParameterServerStrategy variable
partitioning (tensorflow_ranking/python/keras/strategy_utils.py:100-113) and
feature-column embedding path (python/feature.py:79-133): the table lives
row-sharded over the mesh ``model`` axis, every chip holds ``vocab/M`` rows,
and a lookup is a local take + psum of partial pooled sums.

Two paths share identical semantics with ``models.embeddings.pooled_lookup``:

* the *automatic* path — plain ``pooled_lookup`` under ``jit`` with the table
  annotated P('model', None); XLA's SPMD partitioner emits the collectives.
* the *explicit* path — ``sharded_pooled_lookup`` under ``shard_map``: each
  shard takes the rows it owns, pools locally (pooling before the collective
  shrinks the payload from [..., T, D] gathers to one [..., D] psum), and
  psums partial sums over ``model``. This is the hand-scheduled reference
  used for testing the automatic path and for fusing with downstream compute.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ranking_tpu.parallel import mesh as mesh_lib

Array = jax.Array


def local_pooled_partial(
    table_shard: Array,
    ids: Array,
    shard_index: Array,
    rows_per_shard: int,
) -> Array:
  """Partial pooled lookup over one row shard (runs inside shard_map).

  Ids outside ``[shard_index*rows, (shard_index+1)*rows)`` and padding ids
  (< 0) contribute zero; summing partials over the ``model`` axis and
  normalizing reproduces ``models.embeddings.pooled_lookup`` exactly.

  Returns ``[..., D+1]``: pooled partial sum with the valid-token count
  appended so the caller can normalize after the psum.
  """
  lo = shard_index * rows_per_shard
  valid = ids >= 0
  mine = valid & (ids >= lo) & (ids < lo + rows_per_shard)
  local_ids = jnp.where(mine, ids - lo, 0)
  embeds = jnp.take(table_shard, local_ids, axis=0)
  embeds = jnp.where(mine[..., None], embeds, 0.0)
  summed = jnp.sum(embeds, axis=-2)
  # Count owned tokens only, so the psum over shards yields the global valid
  # count exactly once per token.
  counts = jnp.sum(mine.astype(summed.dtype), axis=-1, keepdims=True)
  return jnp.concatenate([summed, counts], axis=-1)


def _normalize(summed: Array, counts: Array, combiner: str) -> Array:
  if combiner == 'sum':
    return summed
  if combiner == 'mean':
    return summed / jnp.maximum(counts, 1.0)
  if combiner == 'sqrtn':
    return summed / jnp.sqrt(jnp.maximum(counts, 1.0))
  raise ValueError(f'Unknown combiner {combiner!r}')


def sharded_pooled_lookup(
    table: Array,
    ids: Array,
    mesh: Mesh,
    combiner: str = 'mean',
) -> Array:
  """Explicit-collective pooled lookup on a row-sharded table.

  Args:
    table: ``[vocab, dim]`` table, sharded P('model', None) (or about to be).
    ids: integer ids ``[..., T]``, replicated over ``model`` (typically
      sharded over ``data`` on the leading axis); ids < 0 are padding.
    mesh: mesh with 'data' and 'model' axes.
    combiner: 'mean' | 'sum' | 'sqrtn'.

  Returns:
    ``[..., dim]`` pooled embeddings, sharded like ``ids`` over 'data'.
  """
  n_model = mesh.shape[mesh_lib.MODEL_AXIS]
  vocab = table.shape[0]
  # Reproduce pooled_lookup's jnp.take clip semantics for out-of-range
  # ids: clamp to the last REAL row (>= vocab would otherwise be silently
  # dropped by the ownership test — and, on a pre-padded table, could
  # address an uninitialized padding row); the clamped token still counts
  # toward the combiner, exactly like the automatic path.
  ids = jnp.where(ids >= 0, jnp.minimum(ids, vocab - 1), ids)
  rows = -(-vocab // n_model)  # ceil: arbitrary vocab sizes supported
  pad = rows * n_model - vocab
  if pad:
    # Zero-pad the table to a shard multiple (the MinSizePartitioner
    # analog, keras/strategy_utils.py:104-113); padded rows are never
    # addressed because ids < vocab, so semantics are unchanged. Callers
    # that pre-pad their params (ShardedEmbeddingEncoder) skip this.
    table = jnp.pad(table, ((0, pad), (0, 0)))

  @partial(
      jax.shard_map,
      mesh=mesh,
      in_specs=(P(mesh_lib.MODEL_AXIS, None), P(mesh_lib.DATA_AXIS)),
      out_specs=P(mesh_lib.DATA_AXIS),
  )
  def _lookup(table_shard, ids_shard):
    idx = jax.lax.axis_index(mesh_lib.MODEL_AXIS)
    partial_out = local_pooled_partial(table_shard, ids_shard, idx, rows)
    return jax.lax.psum(partial_out, mesh_lib.MODEL_AXIS)

  out = _lookup(table, ids)
  return _normalize(out[..., :-1], out[..., -1:], combiner)


class ShardedEmbeddingEncoder(nn.Module):
  """Flax module: row-sharded table + explicit-collective pooled lookup.

  The table param is named ``embedding`` so ``mesh.param_shardings``'
  default rules shard it P('model', None). Use inside models trained under
  a 2-D mesh; on a model=1 mesh this degenerates to the replicated encoder.

  Checkpoint-portability note: the stored param is pre-padded to a
  multiple of the mesh's model-axis size (``vocab + (-vocab) % n_model``
  rows), so when ``vocab_size`` is not divisible by every deployment's
  model-axis size, a checkpoint trained on one topology has a different
  param SHAPE than a module built on another (Orbax restore fails with a
  shape mismatch). Pick a vocab_size divisible by the largest model-axis
  you will deploy (the usual practice: round vocab to a power of two),
  or serve from an ``export_predictor`` artifact, which bakes the padded
  shape in and is topology-independent at load time.
  """

  vocab_size: int
  embedding_dim: int
  mesh: Mesh
  combiner: str = 'mean'
  param_dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, ids: Array) -> Array:
    # Allocate the table pre-padded to a shard multiple so the lookup
    # needs no runtime pad and the param shards evenly over 'model'
    # (arbitrary vocab sizes, keras/strategy_utils.py:104-113 analog).
    n_model = self.mesh.shape[mesh_lib.MODEL_AXIS]
    padded_vocab = self.vocab_size + (-self.vocab_size) % n_model
    table = self.param(
        'embedding', nn.initializers.normal(stddev=1e-2),
        (padded_vocab, self.embedding_dim), self.param_dtype)
    table = jax.lax.with_sharding_constraint(
        table, NamedSharding(self.mesh, P(mesh_lib.MODEL_AXIS, None)))
    return sharded_pooled_lookup(table, ids, self.mesh, self.combiner)
