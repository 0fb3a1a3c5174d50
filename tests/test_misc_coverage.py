"""Coverage for small utilities: Bilinear, attention mask, fns registry,
step timer, libsvm helpers, batch stacking."""

import jax
import jax.numpy as jnp
import numpy as np

from ranking_tpu.data import libsvm
from ranking_tpu.data.batch import batch_from_labels, stack_numpy_batches
from ranking_tpu.models import layers
from ranking_tpu.utils import fns, profiling

REF_DATA = '/root/reference/tensorflow_ranking/examples/data'


def test_bilinear_layer_shapes_and_grad():
  bil = layers.Bilinear(output_units=3)
  x = jnp.asarray(np.random.RandomState(0).randn(4, 5).astype(np.float32))
  y = jnp.asarray(np.random.RandomState(1).randn(4, 7).astype(np.float32))
  variables = bil.init(jax.random.PRNGKey(0), x, y)
  out = bil.apply(variables, x, y)
  assert out.shape == (4, 3)
  g = jax.grad(lambda v: jnp.sum(bil.apply(v, x, y) ** 2))(variables)
  assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_self_attention_mask():
  mask = jnp.asarray([[True, False], [True, True]])
  attn = layers.SelfAttentionMask()(mask)
  assert attn.shape == (2, 1, 2, 2)
  a = np.asarray(attn, dtype=bool)
  # Row 0: only position 0 is valid -> attention confined to it.
  assert a[0, 0, 0, 0] and not a[0, 0, 0, 1]
  assert a[1, 0].all()


def test_registered_fns():
  r = jnp.asarray([1.0, 3.0])
  np.testing.assert_allclose(np.asarray(fns.log1p_inverse(r)),
                             1.0 / np.log1p([1.0, 3.0]), rtol=1e-6)
  np.testing.assert_allclose(np.asarray(fns.is_greater_equal_1(
      jnp.asarray([0.5, 2.0]))), [0.0, 1.0])
  np.testing.assert_allclose(np.asarray(fns.symmetric_log1p(
      jnp.asarray([-1.0, 1.0]))), [-np.log(2.0), np.log(2.0)], rtol=1e-6)
  assert fns.get_gain_fn('pow_minus_1') is fns.pow_minus_1
  assert fns.get_rank_discount_fn('log2_inverse') is fns.log2_inverse


def test_step_timer():
  t = profiling.StepTimer(window=4)
  for _ in range(6):
    t.step(32)
  rates = t.rates()
  assert rates['examples_per_sec'] > 0
  assert rates['steps_per_sec'] > 0
  assert 'recent_examples_per_sec' in rates


def test_libsvm_helpers():
  n = libsvm.infer_num_features(f'{REF_DATA}/train.txt')
  assert n == 136
  rows = list(libsvm.iter_libsvm_lines(f'{REF_DATA}/train.txt'))
  assert rows and all(qid for _, qid, _ in rows[:5])


def test_stack_numpy_batches():
  batches = []
  for i in range(3):
    labels = np.full((2, 4), float(i), np.float32)
    batches.append(batch_from_labels(
        labels=labels, examples={'x': np.ones((2, 4, 5), np.float32) * i}))
  stacked = stack_numpy_batches(batches)
  assert stacked.labels.shape == (3, 2, 4)
  assert stacked.examples['x'].shape == (3, 2, 4, 5)
  np.testing.assert_allclose(stacked.labels[2], 2.0)
