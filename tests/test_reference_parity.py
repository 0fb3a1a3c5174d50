"""Numerical parity against the actual reference implementation.

Loads the reference's losses_impl / metrics_impl (TF, CPU, shimmed past the
removed tf.estimator import) and compares our JAX implementations value-for-
value on shared random inputs with padding and weights. This is the
strongest form of the reference's golden-test strategy (SURVEY.md section
4): the oracle is the reference itself, not hand-derived constants.

Inputs are tie-free (scores jittered) so shuffle-tie randomness cannot
diverge between frameworks.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

from ranking_tpu.ops import lambda_weights as lw
from ranking_tpu.ops import losses as jl
from ranking_tpu.ops import metric_registry, metrics as jm
from ranking_tpu.ops.reductions import Reduction
from ranking_tpu.utils import fns

_REF_ROOT = '/root/reference/tensorflow_ranking'


@pytest.fixture(scope='module')
def ref():
  """Reference losses_impl + metrics_impl modules."""
  if not os.path.isdir(_REF_ROOT):
    pytest.skip('reference not mounted')
  pkg = types.ModuleType('tensorflow_ranking')
  pkg.__path__ = [_REF_ROOT]
  sys.modules.setdefault('tensorflow_ranking', pkg)
  sub = types.ModuleType('tensorflow_ranking.python')
  sub.__path__ = [os.path.join(_REF_ROOT, 'python')]
  sys.modules.setdefault('tensorflow_ranking.python', sub)

  def load(name):
    full = f'tensorflow_ranking.python.{name}'
    if full in sys.modules:
      return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, os.path.join(_REF_ROOT, 'python', f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    setattr(sub, name, mod)
    return mod

  load('utils')
  out = types.SimpleNamespace(
      losses_impl=load('losses_impl'), metrics_impl=load('metrics_impl'))
  return out


def _data(b=6, l=12, seed=0):
  rng = np.random.RandomState(seed)
  logits = rng.randn(b, l).astype(np.float32) * 2
  logits += np.arange(l)[None, :] * 1e-3  # tie-free
  labels = rng.randint(0, 4, size=(b, l)).astype(np.float32)
  labels[:, -3:] = np.where(rng.rand(b, 3) < 0.5, -1.0, labels[:, -3:])
  labels[0, :] = -1.0  # one fully-invalid list
  labels[1, :] = 0.0   # one zero-relevance list
  weights = (rng.rand(b, l) + 0.2).astype(np.float32)
  return labels, logits, weights


SBNW = 'sum_by_nonzero_weights'

# (name, reference ctor, ours, needs_tf_kwargs)
LOSS_CASES = [
    ('softmax', 'SoftmaxLoss', jl.SoftmaxLoss, {}),
    ('poly1', 'PolyOneSoftmaxLoss', jl.PolyOneSoftmaxLoss,
     {'epsilon': 0.9}),
    ('unique_softmax', 'UniqueSoftmaxLoss', jl.UniqueSoftmaxLoss, {}),
    ('pairwise_logistic', 'PairwiseLogisticLoss', jl.PairwiseLogisticLoss,
     {}),
    ('pairwise_hinge', 'PairwiseHingeLoss', jl.PairwiseHingeLoss, {}),
    ('pairwise_soft01', 'PairwiseSoftZeroOneLoss',
     jl.PairwiseSoftZeroOneLoss, {}),
    ('pairwise_mse', 'PairwiseMSELoss', jl.PairwiseMSELoss, {}),
    ('sigmoid_ce', 'SigmoidCrossEntropyLoss', jl.SigmoidCrossEntropyLoss,
     {}),
    ('mse', 'MeanSquaredLoss', jl.MeanSquaredLoss, {}),
    ('list_mle', 'ListMLELoss', jl.ListMLELoss, {}),
    ('approx_ndcg', 'ApproxNDCGLoss', jl.ApproxNDCGLoss,
     {'temperature': 0.1}),
    ('approx_mrr', 'ApproxMRRLoss', jl.ApproxMRRLoss,
     {'temperature': 0.1}),
    ('circle', 'CircleLoss', jl.CircleLoss, {}),
    ('neural_sort_ce', 'NeuralSortCrossEntropyLoss',
     jl.NeuralSortCrossEntropyLoss, {'temperature': 1.0}),
]


@pytest.mark.parametrize('case', LOSS_CASES, ids=lambda c: c[0])
@pytest.mark.parametrize('weighted', [False, True], ids=['now', 'w'])
def test_loss_parity(ref, case, weighted):
  name, ref_cls_name, our_cls, kwargs = case
  labels, logits, weights = _data()
  if name == 'circle':
    # Circle loss operates on [0, 1] similarity scores; the reference
    # NaNs on fully-invalid and zero-relevance lists (our log-space form
    # is stable and returns 0 there), so compare on healthy lists only.
    logits = 1.0 / (1.0 + np.exp(-logits))
    labels, logits, weights = labels[2:], logits[2:], weights[2:]
  if name == 'list_mle':
    # ListMLE sorts by labels with tie shuffling; only tie-free labels
    # are comparable across frameworks.
    rng = np.random.RandomState(42)
    jitter = rng.rand(*labels.shape).astype(np.float32) * 0.9
    labels = np.where(labels >= 0, labels + jitter, labels)
  w = weights if weighted else None

  ref_cls = getattr(ref.losses_impl, ref_cls_name)
  ref_kwargs = dict(kwargs)
  temperature = ref_kwargs.pop('temperature', None)
  if temperature is not None:
    ref_kwargs['temperature'] = temperature
  ref_loss = ref_cls(name=name, **ref_kwargs)
  ours = our_cls(name=name, **kwargs)

  if name == 'circle':
    # The reference's circle loss overflows exp(gamma * x) to NaN on
    # confidently-scored lists; ours is computed in log space and stays
    # finite. Compare per-list values where the reference is finite and
    # require ours to be finite everywhere.
    rl, _ = ref_loss.compute_unreduced_loss(
        tf.constant(labels), tf.constant(logits))
    ref_vals = np.asarray(rl).reshape(-1)
    ol, _ = ours.unreduced(labels, logits)
    our_vals = np.asarray(ol).reshape(-1)
    assert np.isfinite(our_vals).all()
    finite = np.isfinite(ref_vals)
    assert finite.any()
    np.testing.assert_allclose(our_vals[finite], ref_vals[finite],
                               rtol=2e-4, atol=1e-5)
    return

  expected = float(ref_loss.compute(
      tf.constant(labels), tf.constant(logits),
      tf.constant(w) if w is not None else None,
      reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))
  got = float(ours(labels, logits, weights=w, reduction=SBNW))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


LAMBDA_CASES = [
    ('dcg_v1', 'DCGLambdaWeight', lw.DCGLambdaWeight, {}),
    ('dcg_v1_topn', 'DCGLambdaWeight', lw.DCGLambdaWeight,
     {'topn': 4, 'smooth_fraction': 0.3}),
    ('dcg_v1_smooth', 'DCGLambdaWeight', lw.DCGLambdaWeight,
     {'topn': 4, 'smooth_fraction': 0.7}),
    ('dcg_v2', 'DCGLambdaWeightV2', lw.DCGLambdaWeightV2, {}),
    ('dcg_v2_topn', 'DCGLambdaWeightV2', lw.DCGLambdaWeightV2, {'topn': 4}),
    ('yeti_dcg', 'YetiDCGLambdaWeight', lw.YetiDCGLambdaWeight, {}),
    ('yeti_dcg_topn', 'YetiDCGLambdaWeight', lw.YetiDCGLambdaWeight,
     {'topn': 4}),
    ('precision', 'PrecisionLambdaWeight', lw.PrecisionLambdaWeight,
     {'topn': 5}),
    ('labeldiff', 'LabelDiffLambdaWeight', lw.LabelDiffLambdaWeight, {}),
]


@pytest.mark.parametrize('case', LAMBDA_CASES, ids=lambda c: c[0])
def test_pairwise_loss_with_lambda_parity(ref, case):
  name, ref_cls_name, our_cls, kwargs = case
  labels, logits, weights = _data(seed=3)
  ref_extra = {}
  our_extra = {}
  if 'DCGLambdaWeight' in ref_cls_name:
    ref_extra = dict(
        gain_fn=lambda l: tf.pow(2.0, l) - 1.0,
        rank_discount_fn=lambda r: tf.math.log(2.0) / tf.math.log1p(r))
    our_extra = dict(gain_fn=fns.pow_minus_1,
                     rank_discount_fn=fns.log2_inverse)
  ref_lw = getattr(ref.losses_impl, ref_cls_name)(**kwargs, **ref_extra)
  our_lw = our_cls(**kwargs, **our_extra)

  ref_loss = ref.losses_impl.PairwiseLogisticLoss(name, lambda_weight=ref_lw)
  expected = float(ref_loss.compute(
      tf.constant(labels), tf.constant(logits), tf.constant(weights),
      reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))
  ours = jl.PairwiseLogisticLoss(name=name, lambda_weight=our_lw)
  got = float(ours(labels, logits, weights=weights, reduction=SBNW))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


METRIC_CASES = [
    ('mrr', 'MRRMetric', metric_registry.RankingMetricKey.MRR, None),
    ('mrr@3', 'MRRMetric', metric_registry.RankingMetricKey.MRR, 3),
    ('ndcg', 'NDCGMetric', metric_registry.RankingMetricKey.NDCG, None),
    ('ndcg@5', 'NDCGMetric', metric_registry.RankingMetricKey.NDCG, 5),
    ('dcg@5', 'DCGMetric', metric_registry.RankingMetricKey.DCG, 5),
    ('precision@5', 'PrecisionMetric',
     metric_registry.RankingMetricKey.PRECISION, 5),
    ('recall@5', 'RecallMetric', metric_registry.RankingMetricKey.RECALL, 5),
    ('map@5', 'MeanAveragePrecisionMetric',
     metric_registry.RankingMetricKey.MAP, 5),
    ('arp', 'ARPMetric', metric_registry.RankingMetricKey.ARP, None),
    ('opa', 'OPAMetric',
     metric_registry.RankingMetricKey.ORDERED_PAIR_ACCURACY, None),
    ('hits@5', 'HitsMetric', metric_registry.RankingMetricKey.HITS, 5),
    ('bpref', 'BPrefMetric', metric_registry.RankingMetricKey.BPREF, None),
    ('pwa', 'PWAMetric', metric_registry.RankingMetricKey.PWA, None),
]


@pytest.mark.parametrize('case', METRIC_CASES, ids=lambda c: c[0])
@pytest.mark.parametrize('weighted', [False, True], ids=['now', 'w'])
def test_metric_parity(ref, case, weighted):
  name, ref_cls_name, key, topn = case
  labels, logits, weights = _data(seed=7)
  if name == 'pwa' and weighted:
    pytest.skip('PWA takes per-list weights only; covered unweighted')
  w = weights if weighted else None

  ref_cls = getattr(ref.metrics_impl, ref_cls_name)
  if name in ('arp', 'opa'):  # reference ctors take no topn
    ref_metric = ref_cls(name=name)
  else:
    ref_metric = ref_cls(name=name, topn=topn)
  ref_vals, ref_wts = ref_metric.compute(
      tf.constant(labels), tf.constant(logits),
      tf.constant(w) if w is not None else None)
  denom = float(tf.reduce_sum(ref_wts))
  expected = (float(tf.reduce_sum(ref_vals * ref_wts)) / denom
              if denom else 0.0)

  got = float(metric_registry.compute_mean(
      key, labels, logits, weights=w, topn=topn))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_alpha_dcg_parity(ref):
  rng = np.random.RandomState(11)
  b, l, s = 4, 8, 3
  labels = (rng.rand(b, l, s) > 0.6).astype(np.float32)
  logits = rng.randn(b, l).astype(np.float32)
  logits += np.arange(l)[None, :] * 1e-3
  ref_metric = ref.metrics_impl.AlphaDCGMetric('alpha_dcg', topn=None)
  ref_vals, ref_wts = ref_metric.compute(
      tf.constant(labels), tf.constant(logits), None)
  denom = float(tf.reduce_sum(ref_wts))
  expected = float(tf.reduce_sum(ref_vals * ref_wts)) / denom

  got = float(metric_registry.compute_mean(
      metric_registry.RankingMetricKey.ALPHA_DCG, labels, logits))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_neural_sort_ndcg_parity(ref):
  labels, logits, _ = _data(seed=5)
  ref_loss = ref.losses_impl.NeuralSortNDCGLoss('pirank', temperature=1.0)
  expected = float(ref_loss.compute(
      tf.constant(labels), tf.constant(logits), None,
      reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))
  got = float(jl.NeuralSortNDCGLoss(name='pirank', temperature=1.0)(
      labels, logits, reduction=SBNW))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_ordinal_loss_parity(ref):
  rng = np.random.RandomState(9)
  b, l, k = 5, 8, 3
  labels = rng.randint(0, k + 1, size=(b, l)).astype(np.float32)
  labels[:, -2:] = np.where(rng.rand(b, 2) < 0.5, -1.0, labels[:, -2:])
  logits3 = rng.randn(b, l, k).astype(np.float32)
  ref_loss = ref.losses_impl.OrdinalLoss('ordinal', ordinal_size=k)
  expected = float(ref_loss.compute(
      tf.constant(labels), tf.constant(logits3), None,
      reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))
  got = float(jl.OrdinalLoss(name='ordinal', ordinal_size=k)(
      labels, logits3, reduction=SBNW))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_multiclass_loss_parity(ref):
  rng = np.random.RandomState(10)
  b, l, k = 5, 8, 4
  labels = rng.randint(0, k, size=(b, l)).astype(np.float32)
  labels[:, -2:] = np.where(rng.rand(b, 2) < 0.5, -1.0, labels[:, -2:])
  logits3 = rng.randn(b, l, k).astype(np.float32)
  ref_loss = ref.losses_impl.MultiClassLoss('mc', num_classes=k,
                                            from_logits=True)
  expected = float(ref_loss.compute(
      tf.constant(labels), tf.constant(logits3), None,
      reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))
  got = float(jl.MultiClassLoss(name='mc', num_classes=k,
                               from_logits=True)(
      labels, logits3, reduction=SBNW))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_click_em_loss_parity(ref):
  rng = np.random.RandomState(12)
  b, l = 5, 8
  clicks = (rng.rand(b, l) > 0.6).astype(np.float32)
  clicks[:, -2:] = np.where(rng.rand(b, 2) < 0.5, -1.0, clicks[:, -2:])
  # [B, L, 2]: exam logits + relevance logits.
  logits3 = rng.randn(b, l, 2).astype(np.float32)
  ref_loss = ref.losses_impl.ClickEMLoss('em')
  expected = float(ref_loss.compute(
      tf.constant(clicks), tf.constant(logits3), None,
      reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))
  got = float(jl.ClickEMLoss(name='em')(clicks, logits3, reduction=SBNW))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_softmax_with_ndcg_lambda_parity(ref):
  labels, logits, weights = _data(seed=13)
  ref_lw = ref.losses_impl.DCGLambdaWeight(
      gain_fn=lambda l: tf.pow(2.0, l) - 1.0,
      rank_discount_fn=lambda r: tf.math.log(2.0) / tf.math.log1p(r),
      normalized=True)
  ref_loss = ref.losses_impl.SoftmaxLoss('sm', lambda_weight=ref_lw)
  expected = float(ref_loss.compute(
      tf.constant(labels), tf.constant(logits), tf.constant(weights),
      reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))
  our_lw = lw.DCGLambdaWeight(gain_fn=fns.pow_minus_1,
                              rank_discount_fn=fns.log2_inverse,
                              normalized=True)
  got = float(jl.SoftmaxLoss(name='sm', lambda_weight=our_lw)(
      labels, logits, weights=weights, reduction=SBNW))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def _load_ref_losses_factory(ref):
  import importlib.util
  full = 'tensorflow_ranking.python.losses'
  if full in sys.modules:
    return sys.modules[full]
  spec = importlib.util.spec_from_file_location(
      full, os.path.join(_REF_ROOT, 'python', 'losses.py'))
  mod = importlib.util.module_from_spec(spec)
  sys.modules[full] = mod
  spec.loader.exec_module(mod)
  return mod


def test_make_loss_fn_weighted_combo_parity(ref):
  """The multi-loss factory closure (python/losses.py:265-311) end to end:
  encoded 'key:weight,key:weight' string + weights feature."""
  from ranking_tpu import ops
  ref_losses = _load_ref_losses_factory(ref)
  labels, logits, weights = _data(seed=21)
  features = {'doc_w': weights}

  spec = 'softmax_loss:0.7,sigmoid_cross_entropy_loss:0.3'
  ref_fn = ref_losses.make_loss_fn(spec, weights_feature_name='doc_w')
  expected = float(ref_fn(tf.constant(labels), tf.constant(logits),
                          {'doc_w': tf.constant(weights)}))
  our_fn = ops.make_loss_fn(spec, weights_feature_name='doc_w')
  got = float(our_fn(labels, logits, features=features))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_make_loss_fn_single_key_parity(ref):
  from ranking_tpu import ops
  ref_losses = _load_ref_losses_factory(ref)
  labels, logits, _ = _data(seed=22)
  for key in ('pairwise_logistic_loss', 'approx_ndcg_loss',
              'mean_squared_loss', 'unique_softmax_loss'):
    ref_fn = ref_losses.make_loss_fn(key)
    expected = float(ref_fn(tf.constant(labels), tf.constant(logits), None))
    # Our factory defaults the approx keys to the scale-invariant recipe
    # (a measured quality win, loss_registry._SCALE_INVARIANT_DEFAULT_KEYS);
    # reference value parity is pinned via the explicit opt-out.
    params = ({'scale_invariant': False} if key.startswith('approx')
              else {})
    got = float(ops.make_loss_fn(key, params=params)(labels, logits))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5,
                               err_msg=key)


def test_per_list_losses_parity(ref):
  """compute_per_list (losses_impl.py:817-835) drives loss-as-metric
  streams; parity on values and weights."""
  from ranking_tpu.ops import losses as jlo
  labels, logits, weights = _data(seed=23)
  for ref_cls, our_obj in [
      (ref.losses_impl.SoftmaxLoss('sm'), jlo.SoftmaxLoss(name='sm')),
      (ref.losses_impl.PairwiseLogisticLoss('pl'),
       jlo.PairwiseLogisticLoss(name='pl')),
      (ref.losses_impl.MeanSquaredLoss('mse'),
       jlo.MeanSquaredLoss(name='mse')),
  ]:
    rv, rw = ref_cls.compute_per_list(tf.constant(labels),
                                      tf.constant(logits),
                                      tf.constant(weights))
    ov, ow = our_obj.per_list(labels, logits, weights=weights)
    np.testing.assert_allclose(np.asarray(ov), np.asarray(rv),
                               rtol=2e-4, atol=1e-5,
                               err_msg=ref_cls._name)
    np.testing.assert_allclose(np.asarray(ow), np.asarray(rw),
                               rtol=2e-4, atol=1e-5,
                               err_msg=ref_cls._name)


def test_mixture_em_loss_parity(ref):
  rng = np.random.RandomState(14)
  b, l, m = 4, 7, 3  # m scoring heads in the mixture
  labels = rng.randint(0, 3, size=(b, l)).astype(np.float32)
  labels[:, -2:] = np.where(rng.rand(b, 2) < 0.5, -1.0, labels[:, -2:])
  logits3 = rng.randn(b, l, m).astype(np.float32)
  ref_loss = ref.losses_impl.MixtureEMLoss('mix')
  expected = float(ref_loss.compute(
      tf.constant(labels), tf.constant(logits3), None,
      reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))
  got = float(jl.MixtureEMLoss(name='mix')(labels, logits3, reduction=SBNW))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_precision_ia_parity(ref):
  rng = np.random.RandomState(15)
  b, l, s = 4, 8, 3
  labels = (rng.rand(b, l, s) > 0.6).astype(np.float32)
  logits = rng.randn(b, l).astype(np.float32)
  logits += np.arange(l)[None, :] * 1e-3
  ref_metric = ref.metrics_impl.PrecisionIAMetric('pia', topn=5)
  rv, rw = ref_metric.compute(tf.constant(labels), tf.constant(logits), None)
  denom = float(tf.reduce_sum(rw))
  expected = float(tf.reduce_sum(rv * rw)) / denom
  got = float(metric_registry.compute_mean(
      metric_registry.RankingMetricKey.PRECISION_IA, labels, logits,
      topn=5))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_groupwise_rolling_indices_parity(ref):
  """Our rolling_group_indices == the reference's _form_group_indices_nd
  (python/model.py:164-244) without shuffling."""
  import importlib.util
  import types as types_mod

  # model.py only needs tf.estimator.ModeKeys; stub it.
  if not hasattr(tf, 'estimator'):
    est = types_mod.ModuleType('tf_estimator_stub')

    class ModeKeys:
      TRAIN, EVAL, PREDICT = 'train', 'eval', 'infer'

    est.ModeKeys = ModeKeys
    tf.estimator = est
  full = 'tensorflow_ranking.python.model'
  if full in sys.modules:
    ref_model = sys.modules[full]
  else:
    spec = importlib.util.spec_from_file_location(
        full, os.path.join(_REF_ROOT, 'python', 'model.py'))
    ref_model = importlib.util.module_from_spec(spec)
    sys.modules[full] = ref_model
    spec.loader.exec_module(ref_model)

  from ranking_tpu.models import groupwise

  rng = np.random.RandomState(17)
  mask = rng.rand(5, 9) > 0.3
  mask[:, 0] = True
  for group_size in (1, 2, 3):
    nd_indices, ref_mask = ref_model._form_group_indices_nd(
        tf.constant(mask), group_size,
        shuffle=False)
    ref_idx = np.asarray(nd_indices)[..., 1]        # [B, G, g] positions
    got_idx, got_mask = groupwise.rolling_group_indices(
        jnp.asarray(mask), group_size)
    np.testing.assert_array_equal(np.asarray(got_mask),
                                  np.asarray(ref_mask))
    # Compare only real (unmasked) groups; padding groups are free to
    # point anywhere (both implementations mask them out of the scatter).
    gm = np.asarray(ref_mask)
    np.testing.assert_array_equal(np.asarray(got_idx)[gm], ref_idx[gm])


import jax.numpy as jnp  # noqa: E402  (used by the groupwise test)


def test_ordinal_fraction_label_parity(ref):
  rng = np.random.RandomState(19)
  b, l, k = 4, 6, 3
  labels = (rng.rand(b, l) * k).astype(np.float32)  # fractional grades
  labels[:, -1] = -1.0
  logits3 = rng.randn(b, l, k).astype(np.float32)
  ref_loss = ref.losses_impl.OrdinalLoss('ord', ordinal_size=k,
                                         use_fraction_label=True)
  expected = float(ref_loss.compute(
      tf.constant(labels), tf.constant(logits3), None,
      reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))
  got = float(jl.OrdinalLoss(name='ord', ordinal_size=k,
                             use_fraction_label=True)(
      labels, logits3, reduction=SBNW))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_ndcg_custom_gain_discount_parity(ref):
  labels, logits, weights = _data(seed=25)
  ref_metric = ref.metrics_impl.NDCGMetric(
      'ndcg', topn=None,
      gain_fn=lambda l: l,                      # identity gain
      rank_discount_fn=lambda r: 1.0 / r)       # inverse discount
  rv, rw = ref_metric.compute(tf.constant(labels), tf.constant(logits),
                              tf.constant(weights))
  denom = float(tf.reduce_sum(rw))
  expected = float(tf.reduce_sum(rv * rw)) / denom

  from ranking_tpu.utils import fns
  got = float(metric_registry.compute_mean(
      metric_registry.RankingMetricKey.NDCG, labels, logits,
      weights=weights, gain_fn=fns.identity, rank_discount_fn=fns.inverse))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_dcg_custom_gain_parity(ref):
  labels, logits, _ = _data(seed=26)
  ref_metric = ref.metrics_impl.DCGMetric(
      'dcg', topn=3, gain_fn=lambda l: l * 2.0,
      rank_discount_fn=lambda r: tf.math.log(2.0) / tf.math.log1p(r))
  rv, rw = ref_metric.compute(tf.constant(labels), tf.constant(logits),
                              None)
  denom = float(tf.reduce_sum(rw))
  expected = float(tf.reduce_sum(rv * rw)) / denom
  got = float(metric_registry.compute_mean(
      metric_registry.RankingMetricKey.DCG, labels, logits, topn=3,
      gain_fn=lambda l: l * 2.0))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Stochastic losses: noise-injected oracle parity.
#
# Both frameworks draw Gumbel noise as -log(-log U) from a module-level
# sampler (reference: losses_impl._sample_gumbel; ours:
# ops.sorting.sample_gumbel). We patch BOTH to return the same fixed noise
# tensor, which makes every gumbel_* / yeti / CoupledRankDistil loss fully
# deterministic and comparable at the standard 2e-4 tolerance.
# ---------------------------------------------------------------------------

import contextlib

import jax
import jax.numpy as jnp

from ranking_tpu.ops import loss_registry
from ranking_tpu.ops import sorting


def _gumbel_noise(shape, seed=11):
  rng = np.random.RandomState(seed)
  u = rng.rand(*shape)
  return (-np.log(-np.log(u + 1e-20) + 1e-20)).astype(np.float32)


@contextlib.contextmanager
def _inject_gumbel(ref, noise):
  """Patches both frameworks' Gumbel samplers to return ``noise``."""
  orig_ref = ref.losses_impl._sample_gumbel
  orig_ours = sorting.sample_gumbel

  def fake_ref(shape, eps=1e-20, seed=None):
    del shape, eps, seed  # reference passes dynamic tf.shape scalars
    return tf.constant(noise)

  def fake_ours(key, shape, eps=1e-20):
    del key, eps
    assert tuple(shape) == noise.shape, (shape, noise.shape)
    return jnp.asarray(noise)

  ref.losses_impl._sample_gumbel = fake_ref
  sorting.sample_gumbel = fake_ours
  try:
    yield
  finally:
    ref.losses_impl._sample_gumbel = orig_ref
    sorting.sample_gumbel = orig_ours


@pytest.mark.parametrize('wmode', ['none', 'item', 'list'])
def test_gumbel_sampler_parity(ref, wmode):
  """GumbelSampler.sample (losses_impl.py:540-644) vs gumbel_sample_lists:
  expanded labels, Concrete-sampled logits and tiled weights elementwise."""
  labels, logits, weights = _data(seed=5)
  s = 5
  noise = _gumbel_noise((labels.shape[0], s, labels.shape[1]))
  w = {'none': None, 'item': weights, 'list': weights[:, :1]}[wmode]

  with _inject_gumbel(ref, noise):
    sampler = ref.losses_impl.GumbelSampler(sample_size=s, temperature=0.7)
    rl, rs, rw = sampler.sample(
        tf.constant(labels), tf.constant(logits),
        weights=tf.constant(w) if w is not None else None)
    ol, os_, ow = sorting.gumbel_sample_lists(
        jnp.asarray(labels), jnp.asarray(logits), jax.random.PRNGKey(0),
        weights=w, sample_size=s, temperature=0.7)

  np.testing.assert_array_equal(np.asarray(ol), rl.numpy())
  np.testing.assert_allclose(np.asarray(os_), rs.numpy(),
                             rtol=2e-4, atol=1e-5)
  if w is None:
    assert ow is None and rw is None
  else:
    np.testing.assert_allclose(np.asarray(ow), rw.numpy(),
                               rtol=2e-4, atol=1e-5)


def test_gumbel_sampler_3d_subtopic_parity(ref):
  """Diversity-task path: [B, L, subtopic] labels, validity = any(subtopic)."""
  rng = np.random.RandomState(8)
  b, l, sub, s = 4, 7, 3, 3
  labels = rng.randint(0, 2, size=(b, l, sub)).astype(np.float32)
  labels[:, -2:, :] = -1.0
  logits = rng.randn(b, l).astype(np.float32)
  noise = _gumbel_noise((b, s, l), seed=9)

  with _inject_gumbel(ref, noise):
    sampler = ref.losses_impl.GumbelSampler(sample_size=s)
    rl, rs, _ = sampler.sample(tf.constant(labels), tf.constant(logits))
    ol, os_, _ = sorting.gumbel_sample_lists(
        jnp.asarray(labels), jnp.asarray(logits), jax.random.PRNGKey(0),
        sample_size=s)

  np.testing.assert_array_equal(np.asarray(ol), rl.numpy())
  np.testing.assert_allclose(np.asarray(os_), rs.numpy(),
                             rtol=2e-4, atol=1e-5)


def test_gumbel_neural_sort_parity(ref):
  """gumbel_neural_sort (losses_impl.py:1804-1847): full [B, S, L, L]
  permutation-matrix parity under injected noise."""
  labels, logits, _ = _data(seed=6)
  s = 4
  noise = _gumbel_noise((labels.shape[0], s, labels.shape[1]), seed=13)
  with _inject_gumbel(ref, noise):
    ref_perm = ref.losses_impl.gumbel_neural_sort(
        tf.constant(logits), sample_size=s, temperature=0.5)
    our_perm = sorting.gumbel_neural_sort(
        jnp.asarray(logits), jax.random.PRNGKey(0), sample_size=s,
        temperature=0.5)
  np.testing.assert_allclose(np.asarray(our_perm), ref_perm.numpy(),
                             rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize('key', ['gumbel_approx_ndcg_loss',
                                 'gumbel_neural_sort_cross_entropy_loss',
                                 'gumbel_neural_sort_ndcg_loss'])
@pytest.mark.parametrize('weighted', [False, True], ids=['now', 'w'])
def test_gumbel_loss_factory_parity(ref, key, weighted):
  """End-to-end factory closures for the gumbel_* keys
  (python/losses.py:149-158 + GumbelSampler), noise-injected."""
  ref_losses = _load_ref_losses_factory(ref)
  labels, logits, weights = _data(seed=31)
  s, gt = 4, 0.8
  noise = _gumbel_noise((labels.shape[0], s, labels.shape[1]), seed=14)
  wname = 'doc_w' if weighted else None

  with _inject_gumbel(ref, noise):
    ref_fn = ref_losses.make_loss_fn(
        key, weights_feature_name=wname,
        gumbel_params={'sample_size': s, 'temperature': gt})
    expected = float(ref_fn(tf.constant(labels), tf.constant(logits),
                            {'doc_w': tf.constant(weights)}))
    # scale_invariant=False pins the reference-exact approx recipe (the
    # factory defaults the gumbel_approx key to the scale-invariant one).
    params = ({'scale_invariant': False} if 'approx' in key else {})
    our_fn = loss_registry.make_loss_fn(
        key, weights_feature_name=wname, params=params,
        gumbel_params={'sample_size': s, 'temperature': gt})
    got = float(our_fn(labels, logits, features={'doc_w': weights},
                       key=jax.random.PRNGKey(3)))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5,
                             err_msg=key)


@pytest.mark.parametrize('topk', [None, 4])
@pytest.mark.parametrize('weighted', [False, True], ids=['now', 'w'])
def test_coupled_rank_distil_parity(ref, topk, weighted):
  """CoupledRankDistilLoss (losses_impl.py:1984-2115): k-Plackett-Luce CE
  between teacher samples and student scores, noise-injected."""
  labels, logits, weights = _data(seed=33)
  s = 4
  noise = _gumbel_noise((labels.shape[0], s, labels.shape[1]), seed=15)
  w = weights if weighted else None

  with _inject_gumbel(ref, noise):
    ref_loss = ref.losses_impl.CoupledRankDistilLoss(
        'crd', sample_size=s, topk=topk)
    expected = float(ref_loss.compute(
        tf.constant(labels), tf.constant(logits),
        tf.constant(w) if w is not None else None,
        reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))
    ours = jl.CoupledRankDistilLoss(name='crd', sample_size=s, topk=topk)
    got = float(ours(labels, logits, weights=w, reduction=SBNW))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize('weighted', [False, True], ids=['now', 'w'])
def test_yeti_logistic_parity(ref, weighted):
  """YetiLogisticLoss (keras/losses.py:609-718) decomposed into its
  losses_impl parts: GumbelSampler -> PairwiseLogisticLoss with
  YetiDCGLambdaWeight — vs our yeti_logistic_loss factory key."""
  labels, logits, weights = _data(seed=35)
  s, gt, temp = 3, 0.7, 1.3
  noise = _gumbel_noise((labels.shape[0], s, labels.shape[1]), seed=16)
  w = weights if weighted else None

  with _inject_gumbel(ref, noise):
    sampler = ref.losses_impl.GumbelSampler(sample_size=s, temperature=gt)
    gl, gs, gw = sampler.sample(
        tf.constant(labels), tf.constant(logits),
        weights=tf.constant(w) if w is not None else None)
    ref_lw = ref.losses_impl.YetiDCGLambdaWeight(
        topn=None,
        gain_fn=lambda l: tf.pow(2.0, l) - 1.0,
        rank_discount_fn=lambda r: tf.math.log(2.0) / tf.math.log1p(r),
        normalized=False)
    ref_loss = ref.losses_impl.PairwiseLogisticLoss(
        'yeti', lambda_weight=ref_lw, temperature=temp)
    expected = float(ref_loss.compute(
        gl, gs, gw,
        reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))

    our_fn = loss_registry.make_loss_fn(
        'yeti_logistic_loss',
        weights_feature_name='doc_w' if w is not None else None,
        params={'temperature': temp},
        gumbel_params={'sample_size': s, 'temperature': gt})
    got = float(our_fn(labels, logits, features={'doc_w': weights},
                       key=jax.random.PRNGKey(4)))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize('virtual_label', [0.0, 0.5])
@pytest.mark.parametrize('wmode', ['none', 'item', 'list'])
def test_calibrated_softmax_parity(ref, virtual_label, wmode):
  """CalibratedSoftmaxLoss (keras/losses.py:836-943) is deterministic:
  append virtual label / zero score / unit weight, then SoftmaxLoss. The
  reference side mirrors the keras concat verbatim on losses_impl."""
  labels, logits, weights = _data(seed=37)
  b = labels.shape[0]
  w = {'none': None, 'item': weights, 'list': weights[:, :1]}[wmode]

  aug_labels = np.concatenate(
      [labels, np.full((b, 1), virtual_label, np.float32)], axis=1)
  aug_logits = np.concatenate([logits, np.zeros((b, 1), np.float32)], axis=1)
  aug_w = w
  if w is not None and w.shape[1] > 1:  # keras concats ones only for [B, L]
    aug_w = np.concatenate([w, np.ones((b, 1), np.float32)], axis=1)

  ref_loss = ref.losses_impl.SoftmaxLoss('cal', temperature=0.9)
  expected = float(ref_loss.compute(
      tf.constant(aug_labels), tf.constant(aug_logits),
      tf.constant(aug_w) if aug_w is not None else None,
      reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))

  ours = jl.CalibratedSoftmaxLoss(
      name='cal', virtual_label=virtual_label, temperature=0.9)
  got = float(ours(labels, logits, weights=w, reduction=SBNW))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)

  # Per-list parity drives loss-as-metric for the calibrated key.
  rv, rw = ref_loss.compute_per_list(
      tf.constant(aug_labels), tf.constant(aug_logits),
      tf.constant(aug_w) if aug_w is not None else None)
  ov, ow = ours.per_list(labels, logits, weights=w)
  np.testing.assert_allclose(np.asarray(ov), rv.numpy(),
                             rtol=2e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(ow), rw.numpy(),
                             rtol=2e-4, atol=1e-5)


def test_list_mle_lambda_weight_parity(ref):
  """ListMLELambdaWeight (losses_impl.py:457-480) position discounts inside
  ListMLELoss, on tie-free labels."""
  labels, logits, _ = _data(seed=39)
  rng = np.random.RandomState(42)
  jitter = rng.rand(*labels.shape).astype(np.float32) * 0.9
  labels = np.where(labels >= 0, labels + jitter, labels)
  n = labels.shape[1]

  ref_lw = ref.losses_impl.ListMLELambdaWeight(
      rank_discount_fn=lambda r: tf.pow(2.0, float(n) - r) - 1.0)
  ref_loss = ref.losses_impl.ListMLELoss('pmle', lambda_weight=ref_lw)
  expected = float(ref_loss.compute(
      tf.constant(labels), tf.constant(logits), None,
      reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS))

  our_lw = lw.create_p_list_mle_lambda_weight(n)
  ours = jl.ListMLELoss(name='pmle', lambda_weight=our_lw)
  got = float(ours(labels, logits, reduction=SBNW))
  np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_reference_key_strings_all_accepted():
  """Every public key string in the reference registries builds here.

  Parses the literal key constants out of the reference's RankingLossKey
  (python/losses.py:29-54 and python/keras/losses.py:25) and
  RankingMetricKey (python/metrics.py:37-76) classes and asserts our
  factories accept each — guarding against misnamed or missing keys that
  per-key tests (which iterate OUR registry) cannot catch."""
  import re
  import numpy as np
  from ranking_tpu import ops

  def key_strings(path, cls):
    with open(os.path.join(_REF_ROOT, path)) as f:
      src = f.read()
    body = re.search(rf'class {cls}\b.*?\n(.*?)(?=\nclass |\Z)',
                     src, re.S).group(1)
    return set(re.findall(r"^\s+[A-Z_0-9]+ = '([a-z0-9_@]+)'", body, re.M))

  loss_keys = (key_strings('python/losses.py', 'RankingLossKey')
               | key_strings('python/keras/losses.py', 'RankingLossKey'))
  metric_keys = key_strings('python/metrics.py', 'RankingMetricKey')
  assert len(loss_keys) >= 19 and len(metric_keys) >= 13

  rng = np.random.RandomState(0)
  labels = rng.randint(0, 3, size=(2, 6)).astype(np.float32)
  logits = rng.randn(2, 6).astype(np.float32)
  import jax
  key = jax.random.PRNGKey(0)
  for k in sorted(loss_keys):
    kwargs = {'params': {'ordinal_size': 3}} if k == 'ordinal_loss' else {}
    fn = ops.make_loss_fn(k, **kwargs)
    lab = labels
    if k == 'ordinal_loss':
      pass
    out = float(fn(lab, np.repeat(logits[:, :, None], 3, -1)
                   if k == 'ordinal_loss' else logits, {}, key=key))
    assert np.isfinite(out), k
  for k in sorted(metric_keys):
    fn = ops.make_ranking_metric_fn(k, topn=3)
    sub = (np.abs(rng.randn(2, 6, 2)) if k in ('alpha_dcg', 'precision_ia')
           else None)
    if sub is not None:
      v, w = fn((sub > 1).astype(np.float32), logits)
    else:
      v, w = fn(labels, logits)
    assert np.isfinite(float(np.sum(np.asarray(v)))), k
