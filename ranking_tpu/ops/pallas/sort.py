"""In-VMEM per-list sort kernel: ranks + sorted gathers in one pass.

The reference's metric/loss stack sorts every list with
``tf.math.top_k`` + gathers (tensorflow_ranking/python/utils.py:115-164);
XLA lowers the jnp equivalent to a generic variadic sort. For ranking list
sizes (L <= ~1k) a comparison-count rank is cheaper and stays entirely in
VMEM: rank_i = 1 + |{j : key_j beats key_i}| on the VPU, then the sorted
gather is a one-hot permutation matmul on the MXU — one kernel, no HBM
round-trips, no host-side sort.

Tie/mask semantics (deterministic): invalid items always lose to valid
ones; score ties break by original position (stable descending order) —
matching ``utils.list_ops.sort_by_scores(..., key=None)`` on tie-free
scores and ``sorted_ranks``'s stable ranking.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_B = 8

_INTERPRET = False  # flipped by CPU tests


def _rank_kernel(scores_ref, mask_ref, vals_ref, ranks_ref, sorted_ref, *,
                 topn):
  scores = scores_ref[:]          # [TB, L]
  msk = mask_ref[:]               # [TB, L] float 0/1
  tb, l = scores.shape
  # Invalid scores -> row min so they can never outrank a valid item on
  # score; the validity term below settles exact ties. Only the
  # all-invalid row (min over empty = +inf) needs a finite stand-in; a
  # -inf row min must stay -inf — replacing it with 0.0 would let
  # invalid items outrank every negative-scored valid item.
  row_min = jnp.min(jnp.where(msk > 0, scores, jnp.inf), axis=1,
                    keepdims=True)
  row_min = jnp.where(row_min == jnp.inf, 0.0, row_min)
  s = jnp.where(msk > 0, scores, row_min)

  pos = jax.lax.broadcasted_iota(jnp.int32, (tb, l), 1)
  si, sj = s[:, :, None], s[:, None, :]
  vi, vj = msk[:, :, None], msk[:, None, :]
  pi, pj = pos[:, :, None], pos[:, None, :]
  # j beats i: higher score, or equal score and more valid, or equal on
  # both and earlier position (stable).
  beats = ((sj > si)
           | ((sj == si) & (vj > vi))
           | ((sj == si) & (vj == vi) & (pj < pi)))
  ranks = 1 + jnp.sum(beats.astype(jnp.int32), axis=2)   # [TB, L]
  ranks_ref[:] = ranks.astype(jnp.float32)

  # Sorted gather via one-hot permutation matmul (MXU): out[r] = vals[i]
  # where rank_i == r+1.
  r_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, l, topn), 2)
  onehot = (ranks[:, :, None] - 1 == r_iota).astype(jnp.float32)
  sorted_vals = jax.lax.dot_general(
      onehot, vals_ref[:],
      dimension_numbers=(((1,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)                # [TB, topn, K]
  sorted_ref[:] = sorted_vals


def _pad_batch(x: Array, tile: int = TILE_B) -> Array:
  pad = (-x.shape[0]) % tile
  if pad:
    x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
  return x


def sorted_values_and_ranks(
    scores: Array,
    values: Array,
    mask: Optional[Array] = None,
    topn: Optional[int] = None,
) -> Tuple[Array, Array]:
  """Ranks and sorted value channels for every list, in one fused kernel.

  Args:
    scores: ``[B, L]``.
    values: ``[B, L, K]`` channels to reorder by descending score.
    mask: ``[B, L]`` validity; invalid rows sort last.
    topn: static output length (default L).

  Returns:
    (sorted ``[B, topn, K]``, ranks ``[B, L]`` float 1-based).
  """
  b, l = scores.shape
  topn = l if topn is None else min(topn, l)
  if mask is None:
    mask = jnp.ones((b, l), jnp.float32)
  scores_p = _pad_batch(jnp.asarray(scores, jnp.float32))
  mask_p = _pad_batch(jnp.asarray(mask, jnp.float32))
  vals_p = _pad_batch(jnp.asarray(values, jnp.float32))
  bp = scores_p.shape[0]
  k = values.shape[-1]

  spec2 = pl.BlockSpec((TILE_B, l), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
  spec3 = pl.BlockSpec((TILE_B, l, k), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
  out_specs = (
      spec2,
      pl.BlockSpec((TILE_B, topn, k), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
  )
  ranks, sorted_vals = pl.pallas_call(
      functools.partial(_rank_kernel, topn=topn),
      grid=(bp // TILE_B,),
      in_specs=[spec2, spec2, spec3],
      out_specs=out_specs,
      out_shape=(
          jax.ShapeDtypeStruct((bp, l), jnp.float32),
          jax.ShapeDtypeStruct((bp, topn, k), jnp.float32),
      ),
      interpret=_INTERPRET,
      cost_estimate=pl.CostEstimate(
          flops=6 * bp * l * l + 2 * bp * l * topn * k,
          bytes_accessed=bp * l * (2 + k + 1 + topn * k // l + 1) * 4,
          transcendentals=0),
  )(scores_p, mask_p, vals_p)
  return sorted_vals[:b], ranks[:b]


def sort_by_scores(
    scores: Array,
    features_list: Sequence[Array],
    topn: Optional[int] = None,
    mask: Optional[Array] = None,
) -> List[Array]:
  """Drop-in for ``utils.list_ops.sort_by_scores`` (deterministic ties):
  stacks 2-D feature tensors into channels and sorts them in one kernel."""
  stacked = jnp.stack([jnp.asarray(f, jnp.float32) for f in features_list],
                      axis=-1)
  sorted_vals, _ = sorted_values_and_ranks(scores, stacked, mask=mask,
                                           topn=topn)
  return [sorted_vals[..., i] for i in range(len(features_list))]


def sorted_ranks(scores: Array, mask: Optional[Array] = None) -> Array:
  """Drop-in for ``utils.list_ops.sorted_ranks`` (stable ties), int32."""
  b, l = scores.shape
  dummy = jnp.zeros((b, l, 1), jnp.float32)
  _, ranks = sorted_values_and_ranks(scores, dummy, mask=mask, topn=1)
  return ranks.astype(jnp.int32)
