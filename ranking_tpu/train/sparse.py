"""Lazy (sparse-row) Adam for embedding tables.

A TPU-native answer to the reference stack's sparse embedding updates: TF
trains embedding columns with `tf.IndexedSlices` gradients, so an Adam /
Adagrad step only visits the rows a batch touched. Naive JAX instead
materializes a dense ``[vocab, dim]`` gradient and streams the full
``param/m/v`` triple through HBM every step — at BERT-vocab scale that
dense optimizer traffic is ~30% of the whole train step (PARITY.md,
encoder profile), and at production vocabularies (10M+ rows) it makes
training infeasible.

``LazyAdam`` keeps full-size moment buffers but touches only the rows
whose gradient is non-zero:

* the train step's gradient for a gather-based lookup is a scatter-add —
  exactly the touched rows are non-zero;
* a sort-free cumsum+scatter compaction of the non-zero row ids (the
  same trick as ``utils.list_ops.organize_valid_indices``) yields up to
  ``max_rows`` distinct touched indices with static shapes — O(vocab)
  index work, no ``top_k`` sort, no dynamic ``unique()``;
* moments and params for those rows are gathered, stepped with Adam
  math, and scattered back: O(max_rows * dim) HBM traffic instead of
  O(vocab * dim);
* ``max_rows`` is a static bound that must cover the rows one batch can
  touch (ids per batch; the pipeline derives it from the sample batch).
  Rows beyond the bound lose that step's gradient and increment the
  ``dropped`` counter in the optimizer state — deliberately NOT a
  ``lax.cond`` dense fallback, which was measured to force full-table
  buffer copies at the branch boundary (+2.3 ms/step at BERT vocab).

Semantics are TF-contrib ``LazyAdamOptimizer``: untouched rows receive no
moment decay (this is the standard — and deliberate — deviation from
dense Adam for embeddings). Bias correction uses the global step count.

Used via ``create_train_state(..., sparse_tx=LazyAdam(...))``: params
whose '/'-joined path matches ``table_pattern`` leave the dense optax
chain and are stepped here.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array
Schedule = Union[float, Callable[[Array], Array]]


def compact_unique(flat_ids: Array) -> Tuple[Array, Array, Array]:
  """Static-shape unique over a flat int32 id vector.

  The building block of the sparse train step: instead of the dense-grad
  path's O(vocab) row-norm scan, the ids one batch touches (N of them,
  batch-bounded and vocab-independent) are deduplicated with one 1-D sort.

  Args:
    flat_ids: ``[N]`` integer ids; ids < 0 are padding. Ids must be
      strictly below ``int32`` max (that value is the internal padding
      sentinel; the sparse step guarantees this by reducing ids modulo
      the table's row count before deduplication).

  Returns:
    ``(uids, remap, filled)``, all ``[N]``:
      * ``uids`` — the distinct non-negative ids compacted into the first
        ``n_unique`` slots (remaining slots hold 0 and are not ``filled``);
      * ``remap`` — for every input position, the slot its id landed in;
        padding positions keep their (negative) id;
      * ``filled`` — bool, marks the occupied slots of ``uids``.
  """
  n = flat_ids.shape[0]
  flat_ids = flat_ids.astype(jnp.int32)
  valid = flat_ids >= 0
  big = jnp.iinfo(jnp.int32).max
  key = jnp.where(valid, flat_ids, big)
  # Everything below is expressed as SORTS, never 1-D scatters/gathers:
  # XLA serializes rank-1 scatter/gather on TPU (profiled 0.24-0.41 ms
  # each at N=51k) while its rank-1 sort runs in 0.045 ms, so inverse
  # permutations and compactions are 10x cheaper as sort-by-destination.
  iota = jnp.arange(n, dtype=jnp.int32)
  s, order = jax.lax.sort((key, iota), num_keys=1)
  valid_s = s != big  # == valid[order], without the serialized gather
  first = jnp.concatenate(
      [jnp.ones((1,), bool), s[1:] != s[:-1]]) & valid_s
  firsti = first.astype(jnp.int32)
  urank = jnp.cumsum(firsti) - 1  # [N]
  n_unique = jnp.sum(firsti)
  # uids: compact the first occurrence of each run to the front. Tie
  # order among the pushed-back non-firsts is irrelevant (masked to 0).
  _, uids = jax.lax.sort((jnp.where(first, urank, big), s), num_keys=1)
  filled = iota < n_unique
  uids = jnp.where(filled, uids, 0)
  # remap[order[i]] = urank[i]: the inverse permutation, as a sort keyed
  # by `order` (a permutation, so keys are distinct). Duplicated input
  # ids share one urank, so an unstable primary sort cannot change the
  # result vs the reference scatter formulation.
  _, remap = jax.lax.sort((order, urank), num_keys=1)
  remap = jnp.where(valid, remap, flat_ids)
  return uids, remap, filled


def _compact_unique_reference(flat_ids: Array) -> Tuple[Array, Array, Array]:
  """Scatter-based reference formulation of :func:`compact_unique` (the
  round-2 implementation) — kept for equality tests of the sort-based
  hot path."""
  n = flat_ids.shape[0]
  flat_ids = flat_ids.astype(jnp.int32)
  valid = flat_ids >= 0
  big = jnp.iinfo(jnp.int32).max
  key = jnp.where(valid, flat_ids, big)
  order = jnp.argsort(key)
  s = key[order]
  valid_s = valid[order]
  first = jnp.concatenate(
      [jnp.ones((1,), bool), s[1:] != s[:-1]]) & valid_s
  urank = jnp.cumsum(first.astype(jnp.int32)) - 1  # [N]
  n_unique = jnp.sum(first.astype(jnp.int32))
  dest = jnp.where(valid_s, urank, n)  # invalid ids scatter out of bounds
  uids = jnp.zeros((n,), jnp.int32).at[dest].set(s, mode='drop')
  filled = jnp.arange(n, dtype=jnp.int32) < n_unique
  remap = jnp.zeros((n,), jnp.int32).at[order].set(urank)
  remap = jnp.where(valid, remap, flat_ids)
  return uids, remap, filled


@dataclasses.dataclass(frozen=True)
class EmbedFeature:
  """Declares that a feature's ids feed an embedding table.

  The sparse train step (train/steps.py make_sparse_train_step) uses this
  to route gradients: it remaps the feature's ids to batch-local slots,
  gathers the touched table rows, and differentiates with respect to those
  rows only — the dense ``[vocab, dim]`` gradient never exists.
  """

  param_path: str          # '/'-joined path of the table leaf
  feature: str             # feature name carrying the ids
  source: str = 'examples'  # 'context' | 'examples'
  # Pre-hash ids modulo this before lookup (HashEmbeddingEncoder analog);
  # None = ids are direct row indices (EmbeddingEncoder).
  num_buckets: Optional[int] = None


def derive_embed_features(params: Any, context: Mapping[str, Array],
                          examples: Mapping[str, Array],
                          table_pattern: str = r'embedding',
                          ) -> Tuple[EmbedFeature, ...]:
  """Best-effort EmbedFeature derivation for EmbeddingDNNScorer-style
  models: table leaves at ``.../embed_<feature>/embedding`` whose
  ``<feature>`` is present in the batch."""
  out = []
  for pth, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
    s = path_str(pth)
    if not re.search(table_pattern, s):
      continue
    m = re.search(r'embed_([^/]+)/[^/]+$', s)
    if m:
      feat = m.group(1)
      if feat in context:
        out.append(EmbedFeature(param_path=s, feature=feat,
                                source='context'))
      elif feat in examples:
        out.append(EmbedFeature(param_path=s, feature=feat,
                                source='examples'))
      continue
    # EncoderScorer/TFR-BERT convention: the encoder's token table is fed
    # by the fused input_ids feature (models/encoder.py).
    if re.search(r'token_embed/[^/]+$', s) and 'input_ids' in examples:
      out.append(EmbedFeature(param_path=s, feature='input_ids',
                              source='examples'))
  return tuple(out)


def path_str(path) -> str:
  """'/'-joined key path, matching parallel.mesh's rule paths."""
  parts = []
  for p in path:
    if hasattr(p, 'key'):
      parts.append(str(p.key))
    elif hasattr(p, 'idx'):
      parts.append(str(p.idx))
    else:
      parts.append(str(p))
  return '/'.join(parts)


@dataclasses.dataclass(frozen=True)
class LazyAdam:
  """Config for the sparse-row Adam applied to matching table params."""

  learning_rate: Schedule = 1e-3
  b1: float = 0.9
  b2: float = 0.999
  eps: float = 1e-8
  # Params whose path matches (re.search) get the lazy update; they must
  # be >= 2-D with the vocabulary as the leading axis.
  table_pattern: str = r'embedding'
  # Static bound on rows updated per step. Must be >= the rows one batch
  # can touch (<= ids per batch); overflow rows are dropped and counted
  # in state['dropped'].
  max_rows: int = 8192
  # In-place DMA scatter (ops/pallas/rows.py) for the row updates. Turn
  # off for tables sharded over the mesh 'model' axis — the Pallas call
  # addresses one local buffer and must not be SPMD-partitioned; the XLA
  # reference scatter partitions correctly there.
  dma_scatter: bool = True

  def matches(self, path: str) -> bool:
    return re.search(self.table_pattern, path) is not None

  def init(self, sparse_params: Mapping[str, Array]) -> Dict[str, Any]:
    # Moments stay separate [vocab, dim] buffers (not packed [..., 2*dim]):
    # the in-place DMA scatter (ops/pallas/rows.py) moves height-1 row
    # slices, which Mosaic only accepts at exactly one 128-lane tile —
    # a packed 256-wide row would force the O(vocab) XLA scatter back.
    state: Dict[str, Any] = {
        p: {'m': jnp.zeros_like(x), 'v': jnp.zeros_like(x)}
        for p, x in sparse_params.items()}
    state['count'] = jnp.zeros((), jnp.int32)
    state['dropped'] = jnp.zeros((), jnp.int32)
    return state

  def _lr(self, count: Array) -> Any:
    # A callable schedule receives the pre-increment (0-based) count —
    # the optax scale_by_schedule convention, so one schedule can be
    # shared verbatim between the dense optax chain and LazyAdam.
    return (self.learning_rate(count) if callable(self.learning_rate)
            else self.learning_rate)

  def update(
      self,
      sparse_grads: Mapping[str, Array],
      state: Mapping[str, Any],
      sparse_params: Mapping[str, Array],
  ) -> Tuple[Dict[str, Array], Dict[str, Any]]:
    lr = self._lr(state['count'])
    count = state['count'] + 1
    new_params: Dict[str, Array] = {}
    new_state: Dict[str, Any] = {'count': count}
    dropped = state.get('dropped', jnp.zeros((), jnp.int32))
    for p, g in sparse_grads.items():
      table, m, v = sparse_params[p], state[p]['m'], state[p]['v']
      nt, nm, nv, nd = _lazy_update(self, g, table, m, v, count, lr)
      new_params[p] = nt
      new_state[p] = {'m': nm, 'v': nv}
      dropped = dropped + nd
    for p in sparse_params:  # untouched tables keep their state verbatim
      if p not in sparse_grads:
        new_params[p] = sparse_params[p]
        new_state[p] = state[p]
    new_state['dropped'] = dropped
    return new_params, new_state

  def update_rows(
      self,
      row_grads: Mapping[str, Tuple[Array, Array, Array]],
      state: Mapping[str, Any],
      sparse_params: Mapping[str, Array],
      row_params: Optional[Mapping[str, Array]] = None,
  ) -> Tuple[Dict[str, Array], Dict[str, Any]]:
    """Row-level update for the sparse train step: O(K·dim) per table.

    ``row_grads`` maps table path -> ``(uids [K], grads [K, dim...],
    filled [K])`` as produced by ``compact_unique`` + grads w.r.t. the
    gathered rows. Unlike ``update``, no full-table gradient is ever read:
    moments and params are gathered at the touched rows, stepped, and
    scattered back. A row counts as touched iff its gradient is nonzero —
    identical semantics to the dense-grad path (and to TF's
    IndexedSlices-driven LazyAdam, where an all-masked token contributes a
    zero slice that moves nothing on a fresh row and is excluded here
    exactly).

    ``row_params`` optionally supplies the already-gathered param rows
    ``table[uids]`` per path (the sparse step's forward slab) so the
    update skips its own gather of the full table; untouched slots'
    values are irrelevant (their scatter is dropped).
    """
    from ranking_tpu.ops.pallas import rows as rows_lib
    lr = self._lr(state['count'])
    count = state['count'] + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - self.b1 ** t
    bc2 = 1.0 - self.b2 ** t
    # On TPU the row writes go through the in-place DMA scatter kernel
    # (ops/pallas/rows.py) — XLA's own scatter rewrites the whole table.
    use_dma = self.dma_scatter and rows_lib.use_kernel()
    new_params: Dict[str, Array] = {}
    new_state: Dict[str, Any] = {'count': count}
    new_state['dropped'] = state.get('dropped', jnp.zeros((), jnp.int32))
    for p, (uids, g, filled) in row_grads.items():
      table, m, v = sparse_params[p], state[p]['m'], state[p]['v']
      if table.ndim < 2:  # same contract as the dense-grad path
        raise ValueError(
            f'LazyAdam table must be >= 2-D, got shape {table.shape}')
      reduce_axes = tuple(range(1, g.ndim))
      touched = filled & (jnp.sum(jnp.abs(g), axis=reduce_axes) > 0)
      safe = jnp.where(touched, uids, 0)
      if row_params is not None and p in row_params:
        p_r = row_params[p]  # table[uids], gathered once by the step
      else:
        p_r = table[safe]
      m_r, v_r = m[safe], v[safe]
      new_m = self.b1 * m_r + (1.0 - self.b1) * g
      new_v = self.b2 * v_r + (1.0 - self.b2) * g * g
      step = lr * (new_m / bc1) / (jnp.sqrt(new_v / bc2) + self.eps)
      # uids are unique among touched slots, so no scatter conflicts.
      nt, nm, nv = _scatter_rows_multi_auto(
          (table, m, v), uids, touched, (p_r - step, new_m, new_v),
          use_dma)
      new_params[p] = nt
      new_state[p] = {'m': nm, 'v': nv}
    for p in sparse_params:  # untouched tables keep their state verbatim
      if p not in row_grads:
        new_params[p] = sparse_params[p]
        new_state[p] = state[p]
    return new_params, new_state


def _scatter_rows_multi_auto(bufs, uids: Array, touched: Array,
                             rows_list, use_dma: bool):
  """Optimizer-update scatter: all buffers (param + moment state) share
  one id stream, so inside the DMA domain they go through the fused
  multi-table kernel (ops/pallas/rows.py scatter_rows_multi — one grid,
  n DMAs per row; measured 1.22x over n separate kernels at 51k rows of
  [3M, 128]). Outside the domain each buffer falls back independently."""
  from ranking_tpu.ops.pallas import rows as rows_lib
  bufs = list(bufs)
  rows_list = [r.astype(b.dtype) for b, r in zip(bufs, rows_list)]
  b0, r0 = bufs[0], rows_list[0]
  if (use_dma and len(bufs) > 1 and r0.ndim == 2
      and all(b.shape == b0.shape and b.dtype == b0.dtype for b in bufs)
      and not any(_visibly_partitioned(b) for b in bufs)
      and rows_lib.supported_width(r0.shape[-1])
      and b0.size > 2000 * r0.shape[0]):
    return rows_lib.scatter_rows_multi(bufs, uids, touched, rows_list)
  return tuple(_scatter_rows_auto(b, uids, touched, r, use_dma)
               for b, r in zip(bufs, rows_list))


def _scatter_rows_auto(buf: Array, uids: Array, touched: Array,
                       rows: Array, use_dma: bool) -> Array:
  """Row scatter with the measured auto domain.

  The optimizer math may promote to f32 (bias corrections are f32
  arrays); the table's dtype is authoritative for both paths. Auto
  domain: the DMA kernel costs O(rows) (~20 ns/row issue rate), XLA's
  scatter O(table) (full rewrite). Crossover measured at table.size ≈
  2000 × rows (PARITY.md); the kernel additionally requires width-128
  rows (rows_lib.supported_width)."""
  from ranking_tpu.ops.pallas import rows as rows_lib
  rows = rows.astype(buf.dtype)
  if (use_dma and rows.ndim == 2
      and not _visibly_partitioned(buf)
      and rows_lib.supported_width(rows.shape[-1])
      and buf.size > 2000 * rows.shape[0]):
    return rows_lib.scatter_rows(buf, uids, touched, rows)
  return rows_lib.scatter_rows_reference(buf, uids, touched, rows)


def _visibly_partitioned(buf: Array) -> bool:
  """True when a *concrete* array is sharded over a mesh axis (eager use
  of update_rows). Inside jit, tracers carry no sharding and this returns
  False — there the ``dma_scatter`` flag stays authoritative (the
  pipeline sets it from ``mesh_model``)."""
  try:
    spec = getattr(getattr(buf, 'sharding', None), 'spec', None)
  except Exception:
    return False
  return bool(spec) and any(axes is not None for axes in spec)


@dataclasses.dataclass(frozen=True)
class LazyAdagrad:
  """Sparse-row Adagrad for embedding tables.

  The reference's embedding-era default optimizer (the canned
  estimators train with Adagrad, examples/tf_ranking_libsvm.py) in
  lazy-row form: ONE accumulator buffer instead of Adam's two moments,
  so each step moves 2 row slabs (param + accumulator) instead of 3 —
  measured ~30% faster per sparse step at multi-million-row tables,
  where the per-row DMA issue rate is the bound (PARITY.md). Semantics
  match ``optax.adagrad`` exactly on the touched rows; untouched rows
  are untouched (the lazy contract).
  """

  learning_rate: Schedule = 1e-3
  initial_accumulator_value: float = 0.1
  eps: float = 1e-7  # optax.adagrad's default
  table_pattern: str = r'embedding'
  max_rows: int = 8192
  dma_scatter: bool = True

  def matches(self, path: str) -> bool:
    return re.search(self.table_pattern, path) is not None

  def _lr(self, count: Array) -> Any:
    # 0-based pre-increment count: the optax schedule convention.
    return (self.learning_rate(count) if callable(self.learning_rate)
            else self.learning_rate)

  def init(self, sparse_params: Mapping[str, Array]) -> Dict[str, Any]:
    state: Dict[str, Any] = {
        p: {'acc': jnp.full_like(x, self.initial_accumulator_value)}
        for p, x in sparse_params.items()}
    state['count'] = jnp.zeros((), jnp.int32)
    state['dropped'] = jnp.zeros((), jnp.int32)
    return state

  def update(
      self,
      sparse_grads: Mapping[str, Array],
      state: Mapping[str, Any],
      sparse_params: Mapping[str, Array],
  ) -> Tuple[Dict[str, Array], Dict[str, Any]]:
    lr = self._lr(state['count'])
    count = state['count'] + 1
    new_params: Dict[str, Array] = {}
    new_state: Dict[str, Any] = {'count': count}
    dropped = state.get('dropped', jnp.zeros((), jnp.int32))
    for p, g in sparse_grads.items():
      table, acc = sparse_params[p], state[p]['acc']
      nt, nacc, nd = _lazy_adagrad_update(self, g, table, acc, lr)
      new_params[p] = nt
      new_state[p] = {'acc': nacc}
      dropped = dropped + nd
    for p in sparse_params:  # untouched tables keep their state verbatim
      if p not in sparse_grads:
        new_params[p] = sparse_params[p]
        new_state[p] = state[p]
    new_state['dropped'] = dropped
    return new_params, new_state

  def update_rows(
      self,
      row_grads: Mapping[str, Tuple[Array, Array, Array]],
      state: Mapping[str, Any],
      sparse_params: Mapping[str, Array],
      row_params: Optional[Mapping[str, Array]] = None,
  ) -> Tuple[Dict[str, Array], Dict[str, Any]]:
    """Row-level update: O(K·dim) per table — 2 gathers + 2 scatters
    (vs LazyAdam's 3+3); see LazyAdam.update_rows for the contract."""
    from ranking_tpu.ops.pallas import rows as rows_lib
    lr = self._lr(state['count'])
    count = state['count'] + 1
    use_dma = self.dma_scatter and rows_lib.use_kernel()
    new_params: Dict[str, Array] = {}
    new_state: Dict[str, Any] = {'count': count}
    new_state['dropped'] = state.get('dropped', jnp.zeros((), jnp.int32))
    for p, (uids, g, filled) in row_grads.items():
      table, acc = sparse_params[p], state[p]['acc']
      if table.ndim < 2:  # same contract as the dense-grad path
        raise ValueError(
            f'LazyAdagrad table must be >= 2-D, got shape {table.shape}')
      reduce_axes = tuple(range(1, g.ndim))
      touched = filled & (jnp.sum(jnp.abs(g), axis=reduce_axes) > 0)
      safe = jnp.where(touched, uids, 0)
      if row_params is not None and p in row_params:
        p_r = row_params[p]
      else:
        p_r = table[safe]
      acc_r = acc[safe]
      new_acc = acc_r + g * g
      step = lr * g * _adagrad_inv(new_acc, self.eps)
      nt, nacc = _scatter_rows_multi_auto(
          (table, acc), uids, touched, (p_r - step, new_acc), use_dma)
      new_params[p] = nt
      new_state[p] = {'acc': nacc}
    for p in sparse_params:  # untouched tables keep their state verbatim
      if p not in row_grads:
        new_params[p] = sparse_params[p]
        new_state[p] = state[p]
    return new_params, new_state


def _adagrad_inv(acc: Array, eps: float) -> Array:
  """optax.scale_by_rss's exact inverse-root: rsqrt(acc + eps) where the
  accumulator is positive, 0 otherwise (a zero accumulator must not turn
  eps into a huge step)."""
  return jnp.where(acc > 0, jax.lax.rsqrt(acc + eps), 0.0)


def _compact_touched_rows(g: Array, max_rows: int, n_table_rows: int):
  """Compacts the ids of rows with nonzero gradient into the first slots
  of a [k] buffer: row r goes to slot (number of touched rows before it).
  O(n) index work — no sort, and crucially no lax.cond: a conditional
  here forces XLA to copy every full-size table buffer at the branch
  boundary (measured +2.3 ms/step at BERT vocab).

  Returns ``(idx [k], filled [k] bool, dest [k], n_dropped)`` where
  ``dest`` scatters unfilled slots out of bounds (mode='drop')."""
  reduce_axes = tuple(range(1, g.ndim))
  rownorm = jnp.sum(jnp.abs(g), axis=reduce_axes)
  k = min(max_rows, n_table_rows)
  n = rownorm.shape[0]
  nz = rownorm > 0
  slot = jnp.where(nz, jnp.cumsum(nz.astype(jnp.int32)) - 1, k)
  idx = jnp.zeros((k,), jnp.int32).at[slot].set(
      jnp.arange(n, dtype=jnp.int32), mode='drop')
  n_rows = jnp.sum(nz.astype(jnp.int32))
  filled = jnp.arange(k, dtype=jnp.int32) < jnp.minimum(n_rows, k)
  dest = jnp.where(filled, idx, n)
  n_dropped = jnp.maximum(n_rows - k, 0)
  return idx, filled, dest, n_dropped


def _lazy_adagrad_update(spec: LazyAdagrad, g: Array, p: Array, acc: Array,
                         lr) -> Tuple[Array, Array, Array]:
  """Dense-gradient LazyAdagrad: compact touched rows, step, scatter."""
  if p.ndim < 2:
    raise ValueError(
        f'LazyAdagrad table must be >= 2-D, got shape {p.shape}')
  idx, filled, dest, n_dropped = _compact_touched_rows(
      g, spec.max_rows, p.shape[0])
  g_r, p_r, acc_r = g[idx], p[idx], acc[idx]
  new_acc = acc_r + g_r * g_r
  step = lr * g_r * _adagrad_inv(new_acc, spec.eps)
  return (p.at[dest].set((p_r - step).astype(p.dtype), mode='drop'),
          acc.at[dest].set(new_acc.astype(acc.dtype), mode='drop'),
          n_dropped)


def _lazy_update(spec: LazyAdam, g: Array, p: Array, m: Array, v: Array,
                 count: Array, lr) -> Tuple[Array, Array, Array, Array]:
  if p.ndim < 2:
    raise ValueError(
        f'LazyAdam table must be >= 2-D, got shape {p.shape}')
  t = count.astype(jnp.float32)
  bc1 = 1.0 - spec.b1 ** t
  bc2 = 1.0 - spec.b2 ** t
  idx, filled, dest, n_dropped = _compact_touched_rows(
      g, spec.max_rows, p.shape[0])
  del filled  # dest already scatters unfilled slots out of bounds
  g_r, p_r, m_r, v_r = g[idx], p[idx], m[idx], v[idx]
  new_m = spec.b1 * m_r + (1.0 - spec.b1) * g_r
  new_v = spec.b2 * v_r + (1.0 - spec.b2) * g_r * g_r
  step = lr * (new_m / bc1) / (jnp.sqrt(new_v / bc2) + spec.eps)
  # Rows beyond max_rows (misconfigured bound) lose this step's gradient;
  # the 'dropped' counter in the optimizer state surfaces it.
  return (p.at[dest].set((p_r - step).astype(p.dtype), mode='drop'),
          m.at[dest].set(new_m.astype(m.dtype), mode='drop'),
          v.at[dest].set(new_v.astype(v.dtype), mode='drop'),
          n_dropped)


def partition(params: Any, spec: Any):
  """Splits a param tree into (dense tree with None at table leaves,
  {path: table leaf})."""
  sparse: Dict[str, Array] = {}

  def _pick(path, leaf):
    s = path_str(path)
    if spec.matches(s):
      sparse[s] = leaf
      return None
    return leaf

  dense = jax.tree_util.tree_map_with_path(_pick, params)
  return dense, sparse


def merge(params: Any, new_dense: Any, new_sparse: Mapping[str, Array]):
  """Rebuilds the full param tree from the dense tree + sparse leaves."""
  flat, treedef = jax.tree_util.tree_flatten_with_path(params)
  dense_flat = {path_str(pth): x
                for pth, x in jax.tree_util.tree_flatten_with_path(
                    new_dense)[0]}
  out = []
  for pth, _ in flat:
    s = path_str(pth)
    out.append(new_sparse[s] if s in new_sparse else dense_flat[s])
  return jax.tree_util.tree_unflatten(treedef, out)
