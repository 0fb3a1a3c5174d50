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
