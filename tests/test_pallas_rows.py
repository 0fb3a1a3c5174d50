"""DMA row-scatter kernel (ops/pallas/rows.py) vs its jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ranking_tpu.ops.pallas import rows as rows_lib


@pytest.mark.parametrize('seed,v,d,k', [
    (0, 500, 128, 70),     # k not a block multiple
    (1, 64, 8, 64),        # narrow rows
    (2, 2000, 256, 512),   # block-aligned k
    (3, 300, 128, 1),      # single row
])
def test_scatter_kernel_matches_reference(seed, v, d, k):
  rng = np.random.RandomState(seed)
  table = jnp.asarray(rng.randn(v, d).astype(np.float32))
  ids = jnp.asarray(rng.choice(v, k, replace=False).astype(np.int32))
  valid = jnp.asarray((rng.rand(k) > 0.2).astype(np.int32))
  updates = jnp.asarray(rng.randn(k, d).astype(np.float32))
  ref = rows_lib.scatter_rows_reference(table, ids, valid, updates)
  out = rows_lib.scatter_rows(table, ids, valid, updates, interpret=True)
  np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_scatter_all_invalid_is_identity():
  rng = np.random.RandomState(4)
  table_np = rng.randn(100, 128).astype(np.float32)
  table = jnp.asarray(table_np)
  ids = jnp.zeros((16,), jnp.int32)
  valid = jnp.zeros((16,), jnp.int32)
  updates = jnp.asarray(rng.randn(16, 128).astype(np.float32))
  out = rows_lib.scatter_rows(table, ids, valid, updates, interpret=True)
  np.testing.assert_array_equal(np.asarray(out), table_np)


def test_lazy_adam_update_rows_same_on_and_off_kernel(monkeypatch):
  """update_rows must be bit-identical whichever scatter path runs.

  On CPU use_kernel() is False; force the interpret-mode kernel through
  the same code path and compare."""
  from ranking_tpu import train

  rng = np.random.RandomState(5)
  v, d, k = 200, 128, 32
  spec = train.LazyAdam(learning_rate=1e-2)
  params = {'t': jnp.asarray(rng.randn(v, d).astype(np.float32))}
  state = spec.init(params)
  uids = jnp.asarray(rng.choice(v, k, replace=False).astype(np.int32))
  grads = jnp.asarray(rng.randn(k, d).astype(np.float32))
  filled = jnp.asarray((np.arange(k) < k - 3))
  row_grads = {'t': (uids, grads, filled)}

  ref_params, ref_state = spec.update_rows(row_grads, state, params)

  real_scatter = rows_lib.scatter_rows
  monkeypatch.setattr(rows_lib, 'use_kernel', lambda: True)
  monkeypatch.setattr(
      rows_lib, 'scatter_rows',
      lambda *a, **kw: real_scatter(*a, interpret=True, **kw))
  k_params, k_state = spec.update_rows(row_grads, state, params)
  np.testing.assert_array_equal(np.asarray(ref_params['t']),
                                np.asarray(k_params['t']))
  np.testing.assert_array_equal(np.asarray(ref_state['t']['m']),
                                np.asarray(k_state['t']['m']))
  np.testing.assert_array_equal(np.asarray(ref_state['t']['v']),
                                np.asarray(k_state['t']['v']))


@pytest.mark.parametrize('n,v,d,k', [
    (2, 500, 128, 70),   # LazyAdagrad shape (param + acc), unaligned k
    (3, 300, 128, 33),   # LazyAdam shape (param + m + v)
    (2, 64, 8, 16),      # unsupported width -> per-table reference path
    (1, 200, 128, 20),   # degenerate single table
])
def test_scatter_multi_matches_reference(n, v, d, k):
  rng = np.random.RandomState(n * 100 + k)
  tables = [jnp.asarray(rng.randn(v, d).astype(np.float32))
            for _ in range(n)]
  ids = jnp.asarray(rng.choice(v, k, replace=False).astype(np.int32))
  valid = jnp.asarray((rng.rand(k) > 0.2).astype(np.int32))
  updates = [jnp.asarray(rng.randn(k, d).astype(np.float32))
             for _ in range(n)]
  refs = [rows_lib.scatter_rows_reference(t, ids, valid, u)
          for t, u in zip(tables, updates)]
  outs = rows_lib.scatter_rows_multi(tables, ids, valid, updates,
                                     interpret=True)
  for i, (r, o) in enumerate(zip(refs, outs)):
    np.testing.assert_array_equal(np.asarray(r), np.asarray(o),
                                  err_msg=f'table {i}')


def test_scatter_multi_validates_shapes():
  t = jnp.zeros((8, 128), jnp.float32)
  u = jnp.zeros((4, 128), jnp.float32)
  ids = jnp.zeros((4,), jnp.int32)
  valid = jnp.ones((4,), jnp.int32)
  with pytest.raises(ValueError, match='equally many'):
    rows_lib.scatter_rows_multi((t, t), ids, valid, (u,))
  with pytest.raises(ValueError, match='share shape'):
    rows_lib.scatter_rows_multi(
        (t, jnp.zeros((9, 128), jnp.float32)), ids, valid, (u, u))
  # A shorter ids/valid stream than the update slabs would feed an
  # unmasked OOB index into a raw-address DMA — must raise, not trace.
  with pytest.raises(ValueError, match='ids/valid must be shape'):
    rows_lib.scatter_rows_multi((t, t), ids[:3], valid, (u, u))
  with pytest.raises(ValueError, match='ids/valid must be shape'):
    rows_lib.scatter_rows_multi((t, t), ids, valid[:2], (u, u))
  with pytest.raises(ValueError, match='update slabs must share shape'):
    rows_lib.scatter_rows_multi(
        (t, t), ids, valid, (u, jnp.zeros((5, 128), jnp.float32)))


def test_multi_block_rows_sublane_aligned():
  """Mosaic requires the (block, d) update BlockSpecs' row count to be a
  multiple of 8 (sublane divisibility); interpret mode does not enforce
  it, so the LazyAdam n=3 path compiled on CPU but crashed on the chip.
  Pin the block policy for every plausible slab count."""
  for n in range(1, 9):
    block = rows_lib.multi_block_rows(n)
    assert block % 8 == 0, (n, block)
    assert block >= 8
    # The DMA-semaphore budget: n streams of `block` rows must not
    # exceed the single-table kernel's measured 256-row cap.
    assert n * block <= max(rows_lib.BLOCK_ROWS, 8 * n)


def test_update_rows_fused_scatter_same_as_reference(monkeypatch):
  """LazyAdagrad.update_rows through the fused multi-table DMA path
  (interpret mode, table inside the size domain) must be bit-identical
  to the pure-reference run."""
  from ranking_tpu import train

  rng = np.random.RandomState(11)
  v, d, k = 512, 128, 16  # v*d > 2000*k -> inside the DMA auto domain
  spec = train.LazyAdagrad(learning_rate=1e-2)
  params = {'t': jnp.asarray(rng.randn(v, d).astype(np.float32))}
  state = spec.init(params)
  uids = jnp.asarray(rng.choice(v, k, replace=False).astype(np.int32))
  grads = jnp.asarray(rng.randn(k, d).astype(np.float32))
  filled = jnp.asarray(np.arange(k) < k - 3)
  row_grads = {'t': (uids, grads, filled)}

  ref_params, ref_state = spec.update_rows(row_grads, state, params)

  real_multi = rows_lib.scatter_rows_multi
  calls = []
  def multi_interpret(*a, **kw):
    calls.append(1)
    return real_multi(*a, interpret=True, **kw)
  monkeypatch.setattr(rows_lib, 'use_kernel', lambda: True)
  monkeypatch.setattr(rows_lib, 'scatter_rows_multi', multi_interpret)
  k_params, k_state = spec.update_rows(row_grads, state, params)
  assert calls, 'fused multi-table scatter path was not exercised'
  np.testing.assert_array_equal(np.asarray(ref_params['t']),
                                np.asarray(k_params['t']))
  np.testing.assert_array_equal(np.asarray(ref_state['t']['acc']),
                                np.asarray(k_state['t']['acc']))


def test_scatter_out_of_range_ids_dropped():
  """Ids outside [0, V) must be dropped, not DMA'd past the table."""
  rng = np.random.RandomState(5)
  table = jnp.asarray(rng.randn(8, 128).astype(np.float32))
  ids = jnp.asarray([0, 7, 8, 200, -3], jnp.int32)  # 3 invalid
  valid = jnp.asarray([1, 1, 1, 1, 1], jnp.int32)
  updates = jnp.asarray(rng.randn(5, 128).astype(np.float32))
  ref = rows_lib.scatter_rows_reference(table, ids, valid, updates)
  out = rows_lib.scatter_rows(table, ids, valid, updates, interpret=True)
  np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
  # Rows 0 and 7 updated, everything else untouched.
  np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(updates[0]))
  np.testing.assert_array_equal(np.asarray(out[7]), np.asarray(updates[1]))
  np.testing.assert_array_equal(np.asarray(out[1:7]),
                                np.asarray(table[1:7]))
