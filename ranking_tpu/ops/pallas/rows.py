"""In-place sparse row scatter for embedding tables (TPU DMA kernel).

XLA's TPU scatter never updates in place: ``table.at[ids].set(rows)``
lowers to a full-table materialization, so updating 51k rows of a
``[3M, 128]`` table costs a 1.5 GB rewrite (~3.8 ms on v5e) — O(vocab),
exactly the cost the sparse train step (train/steps.py
make_sparse_train_step) exists to avoid. This kernel aliases the table
buffer (``input_output_aliases``) and DMAs each updated row from VMEM
straight into its HBM slot: O(rows) traffic, measured 1.02 ms for 51200
rows of a 3M x 128 table — 3.7x over the donated XLA scatter and
independent of vocabulary size (the DMA-issue rate, ~50 rows/us, is the
bound; block size is capped by DMA-semaphore space at 256).

Semantics (jnp reference ``scatter_rows_reference``): rows with
``valid == 0`` are skipped, and ids outside ``[0, V)`` are dropped (the
kernel masks them itself — a raw-address DMA must never trust its
indices). Valid ids must be unique — the sparse step's
``compact_unique`` guarantees that.

Width constraint: Mosaic's memref slicer only accepts height-1 row
slices that cover exactly one full (8, 128) tile's lanes, so the DMA
path engages at row width 128 precisely (``supported_width``); every
other width silently uses the jnp reference path. Size TPU embedding
dims at 128 — it is also the lane-tiling sweet spot for the tables
themselves (a [V, 64] f32 table wastes half of every (8, 128) tile).

Like every kernel in this package this is an optimization, never a
semantic fork: equality tests in tests/test_pallas_rows.py run the DMA
kernel in interpret mode on CPU and against the jnp reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Rows per grid step; bounded by DMA-semaphore space (512 fails to
# compile on v5e: 'Ran out of memory in memory space sflag').
BLOCK_ROWS = 256


def scatter_rows_reference(table: Array, ids: Array, valid: Array,
                           updates: Array) -> Array:
  """jnp semantics: table with ``updates[i]`` written at row ``ids[i]``
  for every ``valid[i] != 0``; invalid slots and ids outside ``[0, V)``
  are dropped (no NumPy negative-index wrapping — a raw-address DMA has
  no such notion, so neither path may)."""
  ok = (valid != 0) & (ids >= 0) & (ids < table.shape[0])
  dest = jnp.where(ok, ids, table.shape[0])
  return table.at[dest].set(updates, mode='drop')


def supported_width(d: int) -> bool:
  """Mosaic accepts height-1 row slices only when the row is exactly one
  full 128-lane tile — narrower rows ([1, 64]) and wider rows ([1, 256],
  or width-128 stripes of a wider memref) all fail its tiling check
  ('slice shape along dimension 0 must be aligned to tiling (8)'), in
  VMEM and HBM alike. Other widths use the XLA reference path; size
  embedding dims at 128 to stay on the DMA kernel."""
  return d == 128


def _scatter_kernel(ids_ref, valid_ref, updates_ref, tab_in, tab_out, sems):
  del tab_in  # aliased with tab_out; the kernel only writes
  base = pl.program_id(0) * BLOCK_ROWS

  def _copy(j):
    return pltpu.make_async_copy(
        updates_ref.at[pl.ds(j, 1), :],
        tab_out.at[pl.ds(ids_ref[base + j], 1), :],
        sems.at[j])

  for j in range(BLOCK_ROWS):
    @pl.when(valid_ref[base + j] != 0)
    def _(j=j):
      _copy(j).start()
  for j in range(BLOCK_ROWS):
    @pl.when(valid_ref[base + j] != 0)
    def _(j=j):
      _copy(j).wait()


def scatter_rows(table: Array, ids: Array, valid: Array, updates: Array,
                 interpret: bool = False) -> Array:
  """In-place row scatter: ``table[ids[i]] = updates[i]`` where valid.

  Meant to run inside a jitted step whose table buffer is donated — the
  ``input_output_aliases`` on the kernel then updates the table in place
  (XLA inserts a copy only if the table has later uses).

  Args:
    table: ``[V, D]`` table.
    ids: ``[K]`` int32 row ids, unique among valid entries; out-of-range
      ids are dropped like the reference's ``mode='drop'``.
    valid: ``[K]`` int32/bool; zero entries are skipped.
    updates: ``[K, D]`` rows, same dtype as ``table``.
    interpret: run the Pallas interpreter (CPU tests).

  Returns:
    The updated table (aliasing the input buffer when possible).
  """
  k, d = updates.shape
  if not supported_width(d):
    return scatter_rows_reference(table, ids, valid, updates)
  # The DMA writes raw HBM addresses; an out-of-range id would corrupt
  # whatever lives next to the table. Drop such rows here — the same
  # semantics as the reference's mode='drop' scatter.
  ok = (valid != 0) & (ids >= 0) & (ids < table.shape[0])
  ids = jnp.where(ok, ids, 0)
  valid = ok
  pad = (-k) % BLOCK_ROWS
  if pad:
    ids = jnp.pad(ids, (0, pad))
    valid = jnp.pad(valid.astype(jnp.int32), (0, pad))
    updates = jnp.pad(updates, ((0, pad), (0, 0)))
    k += pad
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(k // BLOCK_ROWS,),
      in_specs=[
          pl.BlockSpec((BLOCK_ROWS, d), lambda i, ids, valid: (i, 0)),
          pl.BlockSpec(memory_space=pl.ANY),
      ],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      scratch_shapes=[pltpu.SemaphoreType.DMA((BLOCK_ROWS,))],
  )
  return pl.pallas_call(
      _scatter_kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
      input_output_aliases={3: 0},
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary',)),
      interpret=interpret,
  )(ids.astype(jnp.int32), valid.astype(jnp.int32), updates, table)


def _make_multi_kernel(n: int, block: int):
  """Kernel scattering ``n`` update slabs into ``n`` same-shape tables
  under ONE id/valid stream: per row, ``n`` DMA starts are issued
  back-to-back before any wait, so the row's address computation, bounds
  predicate, and loop control are paid once instead of ``n`` times."""

  def kernel(ids_ref, valid_ref, *refs):
    updates = refs[:n]
    tab_out = refs[2 * n:3 * n]  # refs[n:2n] are the aliased inputs
    sems = refs[3 * n]
    base = pl.program_id(0) * block

    def _copy(j, t):
      return pltpu.make_async_copy(
          updates[t].at[pl.ds(j, 1), :],
          tab_out[t].at[pl.ds(ids_ref[base + j], 1), :],
          sems.at[j, t])

    for j in range(block):
      @pl.when(valid_ref[base + j] != 0)
      def _(j=j):
        for t in range(n):
          _copy(j, t).start()
    for j in range(block):
      @pl.when(valid_ref[base + j] != 0)
      def _(j=j):
        for t in range(n):
          _copy(j, t).wait()

  return kernel


def multi_block_rows(n: int) -> int:
  """Rows per grid step for the ``n``-table fused scatter.

  n*block DMAs are in flight per grid step; the semaphore budget that
  caps the single-table kernel at BLOCK_ROWS is split across the n
  streams. Must stay a multiple of 8: Mosaic's sublane divisibility rule
  for the (block, d) update BlockSpecs — a bare ``BLOCK_ROWS // n``
  gives e.g. 85 at n=3, which lowers fine in interpret mode but fails
  Mosaic compilation on the chip (found on TPU: LazyAdam's 3-slab
  scatter was broken while the n=2 LazyAdagrad path worked).
  """
  return max(8, (BLOCK_ROWS // n) // 8 * 8)


def scatter_rows_multi(tables, ids: Array, valid: Array, updates,
                       interpret: bool = False):
  """Fused in-place row scatter of ``n`` slabs into ``n`` tables.

  The optimizer-update shape: LazyAdagrad writes (param, accumulator) and
  LazyAdam (param, m, v) rows at the SAME unique ids. One kernel issues
  all ``n`` DMAs per row under a single grid and scalar-prefetch stream;
  vs ``n`` separate :func:`scatter_rows` calls this halves (n=2) the
  non-DMA per-row overhead and the kernel-launch count. Tables must share
  shape and dtype; semantics per table equal ``scatter_rows_reference``.
  """
  tables = list(tables)
  updates = list(updates)
  n = len(tables)
  if n != len(updates) or n == 0:
    raise ValueError('scatter_rows_multi: need equally many tables and '
                     f'update slabs, got {n} vs {len(updates)}')
  shape, dtype = tables[0].shape, tables[0].dtype
  if any(t.shape != shape or t.dtype != dtype for t in tables):
    raise ValueError('scatter_rows_multi: tables must share shape/dtype, '
                     f'got {[(t.shape, t.dtype) for t in tables]}')
  k, d = updates[0].shape
  # The kernel reads ids/valid as a scalar-prefetch stream sized to the
  # update slabs: a shorter ids array would read out of bounds and feed an
  # unmasked index to a raw-address DMA. Validate before anything traces.
  if any(u.shape != (k, d) for u in updates):
    raise ValueError('scatter_rows_multi: update slabs must share shape '
                     f'({k}, {d}), got {[u.shape for u in updates]}')
  if ids.shape != (k,) or valid.shape != (k,):
    raise ValueError(f'scatter_rows_multi: ids/valid must be shape ({k},) '
                     f'matching the update slabs, got ids {ids.shape}, '
                     f'valid {valid.shape}')
  if n == 1:
    return (scatter_rows(tables[0], ids, valid, updates[0],
                         interpret=interpret),)
  if not supported_width(d):
    return tuple(scatter_rows_reference(t, ids, valid, u)
                 for t, u in zip(tables, updates))
  ok = (valid != 0) & (ids >= 0) & (ids < shape[0])
  ids = jnp.where(ok, ids, 0)
  valid = ok
  block = multi_block_rows(n)
  pad = (-k) % block
  if pad:
    ids = jnp.pad(ids, (0, pad))
    valid = jnp.pad(valid.astype(jnp.int32), (0, pad))
    updates = [jnp.pad(u, ((0, pad), (0, 0))) for u in updates]
    k += pad
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(k // block,),
      in_specs=(
          [pl.BlockSpec((block, d), lambda i, ids, valid: (i, 0))] * n
          + [pl.BlockSpec(memory_space=pl.ANY)] * n),
      out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n,
      scratch_shapes=[pltpu.SemaphoreType.DMA((block, n))],
  )
  out = pl.pallas_call(
      _make_multi_kernel(n, block),
      grid_spec=grid_spec,
      out_shape=[jax.ShapeDtypeStruct(shape, dtype)] * n,
      input_output_aliases={2 + n + t: t for t in range(n)},
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary',)),
      interpret=interpret,
  )(ids.astype(jnp.int32), valid.astype(jnp.int32), *updates, *tables)
  return tuple(out)


def use_kernel() -> bool:
  """Auto policy: the DMA scatter engages on TPU (where the XLA scatter
  is O(vocab)); elsewhere the jnp reference path runs. ops.pallas
  set_enabled(False) disables, True has no extra effect (the kernel
  needs a real DMA engine, so forcing it off-TPU falls back to
  interpret-free reference semantics)."""
  from ranking_tpu.ops import pallas as pallas_pkg
  if pallas_pkg._ENABLED is False:  # explicit global off-switch
    return False
  return jax.default_backend() == 'tpu'
