"""The shared batch data model.

Every layer of the framework exchanges this one structure — the equivalent
of the reference's feature-dict convention (tensorflow_ranking/python/
data.py:41,207, utils.py:78-81): context features ``[B, ...]``, example
(per-document) features ``[B, L, ...]``, labels ``[B, L]`` with -1.0 padding
(or a dict of such for multi-task), and a boolean mask ``[B, L]``.

Static shapes by construction: ``B`` and ``L`` are fixed at parse time
(truncate/pad), which TPU/XLA requires and the reference only half-honored
(keras/model.py:53-54).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Union

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Labels = Union[Array, Dict[str, Array]]


@flax.struct.dataclass
class RankingBatch:
  """One training/eval batch as a pytree."""

  context: Dict[str, Array]   # each [B, ...]
  examples: Dict[str, Array]  # each [B, L, ...]
  labels: Labels              # [B, L] float, padding -1.0 (or dict of)
  mask: Array                 # [B, L] bool

  @property
  def features(self) -> Dict[str, Array]:
    """Merged view for weight-feature lookup (losses.make_loss_fn).

    Precedence: an examples feature shadows a same-named context feature
    (per-document beats per-query for weight lookups) — avoid reusing a
    name across the two groups for anything read through this view."""
    return {**self.context, **self.examples}

  @property
  def batch_size(self) -> int:
    return self.mask.shape[0]

  @property
  def list_size(self) -> int:
    return self.mask.shape[1]

  def pad_to(self, batch_size: int) -> 'RankingBatch':
    """Pads the batch axis with fully-masked rows up to ``batch_size``.

    Padded rows carry labels −1, mask False, and zero features, so every
    mask-aware loss/metric weights them zero — semantics are unchanged
    (tests pin that an all-padding list contributes nothing). Used by
    the eval loop to keep a finite split's final partial batch shardable
    over the data mesh axis with static shapes (shard_map models require
    exact divisibility; dropping the tail would silently truncate the
    eval set — python/data.py:1008 keeps it).
    """
    pad = batch_size - self.batch_size
    if pad <= 0:
      return self

    def _pad(a):
      a = np.asarray(a)
      return np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    def _pad_labels(lab):
      lab = np.asarray(lab)
      return np.concatenate(
          [lab, np.full((pad,) + lab.shape[1:], -1.0, lab.dtype)])

    return RankingBatch(
        context={k: _pad(v) for k, v in self.context.items()},
        examples={k: _pad(v) for k, v in self.examples.items()},
        labels=(jax.tree.map(_pad_labels, dict(self.labels))
                if isinstance(self.labels, dict)
                else _pad_labels(self.labels)),
        mask=_pad(self.mask))


def batch_from_labels(
    labels: Labels,
    context: Optional[Mapping[str, Array]] = None,
    examples: Optional[Mapping[str, Array]] = None,
    mask: Optional[Array] = None,
) -> RankingBatch:
  """Convenience constructor; mask defaults to ``labels >= 0`` (for dict
  labels: valid where ANY task labels the item — a doc unlabeled for one
  task must not be masked out of the others)."""
  ref = labels if not isinstance(labels, dict) else next(iter(labels.values()))
  ref = jnp.asarray(ref)
  if mask is None:
    if isinstance(labels, dict):
      mask = jnp.zeros(ref.shape, bool)
      for lab in labels.values():
        mask = mask | (jnp.asarray(lab) >= 0)
    else:
      mask = ref >= 0
  return RankingBatch(
      context=dict(context or {}),
      examples=dict(examples or {}),
      labels=(jax.tree.map(jnp.asarray, dict(labels))
              if isinstance(labels, dict) else ref),
      mask=jnp.asarray(mask, bool))


def stack_numpy_batches(batches) -> 'RankingBatch':
  """Stacks a list of per-step numpy batches along a new leading axis
  (useful for scan-over-steps eval loops)."""
  batches = list(batches)
  if not batches:
    raise ValueError('no batches to stack (empty stream?)')
  return jax.tree.map(lambda *xs: np.stack(xs), *batches)
