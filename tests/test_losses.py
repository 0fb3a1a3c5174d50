"""Golden-value tests for the loss zoo.

Expected values are computed by independent plain-Python loop oracles that
transcribe the mathematical definitions directly (not the vectorized jnp
implementations), so a shared bug cannot cancel out.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ranking_tpu.ops import lambda_weights as lw
from ranking_tpu.ops import losses
from ranking_tpu.ops.loss_registry import RankingLossKey, build_loss, make_loss_fn
from ranking_tpu.ops.reductions import Reduction


def log1pexp(x):
  return math.log1p(math.exp(-abs(x))) + max(x, 0.0)


def sigmoid(x):
  return 1.0 / (1.0 + math.exp(-x))


def reduce_oracle(terms, weights, reduction):
  """terms/weights: flat python lists."""
  num = sum(t * w for t, w in zip(terms, weights))
  if reduction == Reduction.SUM:
    return num
  if reduction == Reduction.MEAN:
    d = sum(weights)
  elif reduction == Reduction.SUM_BY_NONZERO_WEIGHTS:
    d = sum(1.0 for w in weights if w != 0)
  else:
    raise ValueError(reduction)
  return num / d if d else 0.0


LABELS = [[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]]
LOGITS = [[0.0, 0.6, 0.8], [1.0, 2.0, 3.0]]
WEIGHTS_2D = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]
PADDED_LABELS = [[0.0, 0.0, 1.0], [0.0, 2.0, -1.0]]


def pairwise_oracle(labels, logits, pair_loss, weights=None, reduction=None):
  """Loop-based oracle: loss over pairs with l_i > l_j, both valid."""
  terms, wts = [], []
  for b in range(len(labels)):
    for i in range(len(labels[b])):
      for j in range(len(labels[b])):
        if labels[b][i] < 0 or labels[b][j] < 0:
          continue
        if labels[b][i] > labels[b][j]:
          w = 1.0 if weights is None else weights[b][i]
          terms.append(pair_loss(logits[b][i] - logits[b][j]))
          wts.append(w)
  return reduce_oracle(terms, wts, reduction or
                       Reduction.SUM_BY_NONZERO_WEIGHTS)


class TestPairwiseLosses:

  @pytest.mark.parametrize('cls,form', [
      (losses.PairwiseLogisticLoss, lambda x: log1pexp(-x)),
      (losses.PairwiseHingeLoss, lambda x: max(0.0, 1.0 - x)),
      (losses.PairwiseSoftZeroOneLoss, lambda x: sigmoid(-x)),
  ])
  def test_unweighted(self, cls, form):
    got = cls()(jnp.array(LABELS), jnp.array(LOGITS))
    want = pairwise_oracle(LABELS, LOGITS, form)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  @pytest.mark.parametrize('cls,form', [
      (losses.PairwiseLogisticLoss, lambda x: log1pexp(-x)),
      (losses.PairwiseHingeLoss, lambda x: max(0.0, 1.0 - x)),
  ])
  def test_padded_labels(self, cls, form):
    got = cls()(jnp.array(PADDED_LABELS), jnp.array(LOGITS))
    want = pairwise_oracle(PADDED_LABELS, LOGITS, form)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_item_weights(self):
    got = losses.PairwiseLogisticLoss()(
        jnp.array(LABELS), jnp.array(LOGITS), weights=jnp.array(WEIGHTS_2D))
    want = pairwise_oracle(LABELS, LOGITS, lambda x: log1pexp(-x),
                           weights=WEIGHTS_2D)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_mean_reduction(self):
    got = losses.PairwiseLogisticLoss()(
        jnp.array(LABELS), jnp.array(LOGITS),
        weights=jnp.array(WEIGHTS_2D), reduction=Reduction.MEAN)
    want = pairwise_oracle(LABELS, LOGITS, lambda x: log1pexp(-x),
                           weights=WEIGHTS_2D, reduction=Reduction.MEAN)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_temperature_scales_logits(self):
    hot = losses.PairwiseLogisticLoss(temperature=2.0)(
        jnp.array(LABELS), jnp.array(LOGITS))
    scaled = losses.PairwiseLogisticLoss()(
        jnp.array(LABELS), jnp.array(LOGITS) / 2.0)
    np.testing.assert_allclose(float(hot), float(scaled), rtol=1e-6)

  def test_pairwise_mse(self):
    labels = [[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]]
    terms, wts = [], []
    for b in range(2):
      for i in range(3):
        for j in range(3):
          if i == j:
            continue
          d = (LOGITS[b][i] - LOGITS[b][j]) - (labels[b][i] - labels[b][j])
          terms.append(d * d)
          wts.append(1.0)
    want = reduce_oracle(terms, wts, Reduction.SUM_BY_NONZERO_WEIGHTS)
    got = losses.PairwiseMSELoss()(jnp.array(labels), jnp.array(LOGITS))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_lambda_weight_label_diff(self):
    lambda_weight = lw.LabelDiffLambdaWeight()
    got = losses.PairwiseLogisticLoss(lambda_weight=lambda_weight)(
        jnp.array(LABELS), jnp.array(LOGITS))
    terms, wts = [], []
    for b in range(2):
      for i in range(3):
        for j in range(3):
          if LABELS[b][i] > LABELS[b][j]:
            terms.append(log1pexp(-(LOGITS[b][i] - LOGITS[b][j])))
            wts.append(abs(LABELS[b][i] - LABELS[b][j]))
    want = reduce_oracle(terms, wts, Reduction.SUM_BY_NONZERO_WEIGHTS)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_ndcg_lambda_weight_pairwise(self):
    """Full LambdaLoss check with the NDCG lambda weight, loop oracle."""
    labels = [[0.0, 1.0, 2.0]]
    logits = [[2.0, 1.0, 3.0]]
    # ranks by logit desc: item0 -> 2, item1 -> 3, item2 -> 1.
    ranks = [2, 3, 1]
    gains = [2**l - 1 for l in labels[0]]
    # maxDCG over ideal order (labels sorted desc: 2,1,0).
    ideal = sorted(labels[0], reverse=True)
    max_dcg = sum((2**l - 1) / math.log1p(r + 1)
                  for r, l in enumerate(ideal))
    inv_max = 1.0 / max_dcg
    n = 3
    terms, wts = [], []
    for i in range(n):
      for j in range(n):
        if labels[0][i] > labels[0][j]:
          gain_diff = abs(gains[i] * inv_max - gains[j] * inv_max)
          rd = abs(ranks[i] - ranks[j])
          disc = abs(1 / math.log1p(rd) - 1 / math.log1p(rd + 1))
          terms.append(log1pexp(-(logits[0][i] - logits[0][j])))
          wts.append(gain_diff * disc * n)
    want = reduce_oracle(terms, wts, Reduction.SUM_BY_NONZERO_WEIGHTS)
    got = losses.PairwiseLogisticLoss(
        lambda_weight=lw.create_ndcg_lambda_weight())(
            jnp.array(labels), jnp.array(logits))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_per_list(self):
    loss = losses.PairwiseLogisticLoss()
    per_list_losses, per_list_weights = loss.per_list(
        jnp.array(LABELS), jnp.array(LOGITS))
    assert per_list_losses.shape == (2,)
    # Each list has 2 preference pairs.
    np.testing.assert_allclose(np.asarray(per_list_weights), [2.0, 2.0])
    # Weighted mean of per-list losses recovers MEAN reduction of pair terms.
    want = pairwise_oracle(LABELS, LOGITS, lambda x: log1pexp(-x),
                           reduction=Reduction.MEAN)
    got = float(jnp.sum(per_list_losses * per_list_weights)
                / jnp.sum(per_list_weights))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def softmax_oracle(labels, logits, weights=None, reduction=None):
  terms, wts = [], []
  for b in range(len(labels)):
    lbl = [max(l, 0.0) if l >= 0 else 0.0 for l in labels[b]]
    lgt = [s if labels[b][i] >= 0 else math.log(1e-10)
           for i, s in enumerate(logits[b])]
    if weights is not None:
      lbl = [l * w for l, w in zip(lbl, weights[b])]
    s = sum(lbl)
    if s <= 0:
      terms.append(0.0)  # zero-label rows get weight 0 and arbitrary loss
      wts.append(0.0)
      continue
    z = sum(math.exp(x) for x in lgt)
    ce = -sum((l / s) * (x - math.log(z)) for l, x in zip(lbl, lgt))
    terms.append(ce)
    wts.append(s)
  return reduce_oracle(terms, wts,
                       reduction or Reduction.SUM_BY_NONZERO_WEIGHTS)


class TestSoftmaxLoss:

  def test_unweighted(self):
    got = losses.SoftmaxLoss()(jnp.array(LABELS), jnp.array(LOGITS))
    want = softmax_oracle(LABELS, LOGITS)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_padded(self):
    got = losses.SoftmaxLoss()(jnp.array(PADDED_LABELS), jnp.array(LOGITS))
    want = softmax_oracle(PADDED_LABELS, LOGITS)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_item_weights_fold_into_labels(self):
    got = losses.SoftmaxLoss()(
        jnp.array(LABELS), jnp.array(LOGITS), weights=jnp.array(WEIGHTS_2D))
    want = softmax_oracle(LABELS, LOGITS, weights=WEIGHTS_2D)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_all_zero_labels_list_gets_zero_weight(self):
    labels = [[0.0, 0.0, 0.0], [0.0, 0.0, 2.0]]
    got = losses.SoftmaxLoss()(jnp.array(labels), jnp.array(LOGITS))
    want = softmax_oracle(labels, LOGITS)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_poly_one(self):
    labels, logits = LABELS, LOGITS
    eps = 0.5
    terms, wts = [], []
    for b in range(len(labels)):
      s = sum(labels[b])
      z = sum(math.exp(x) for x in logits[b])
      probs = [math.exp(x) / z for x in logits[b]]
      dist = [l / s for l in labels[b]]
      ce = -sum(d * math.log(p) for d, p in zip(dist, probs) if d > 0)
      pt = sum(d * p for d, p in zip(dist, probs))
      terms.append(ce + eps * (1 - pt))
      wts.append(s)
    want = reduce_oracle(terms, wts, Reduction.SUM_BY_NONZERO_WEIGHTS)
    got = losses.PolyOneSoftmaxLoss(epsilon=eps)(
        jnp.array(labels), jnp.array(logits))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


class TestUniqueSoftmaxLoss:

  def test_hand_computed(self):
    labels = [[1.0, 0.0, 2.0]]
    logits = [[1.0, 2.0, 3.0]]
    # item0 (l=1): denominator = {item1 (l=0), item0} -> softmax over s=[2,1]
    # item2 (l=2): denominator = {item0, item1, item2} -> s=[1,2,3]
    l0 = -1.0 + math.log(math.exp(1.0) + math.exp(2.0))
    l2 = -3.0 + math.log(math.exp(1.0) + math.exp(2.0) + math.exp(3.0))
    want = (2**1 - 1) * l0 + (2**2 - 1) * l2
    got = losses.UniqueSoftmaxLoss()(jnp.array(labels), jnp.array(logits))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


class TestListMLELoss:

  def test_distinct_labels(self):
    labels = [[0.0, 2.0, 1.0]]
    logits = [[1.0, 3.0, 2.0]]
    # Label order: item1, item2, item0 with logits 3, 2, 1.
    s = [3.0, 2.0, 1.0]
    want = 0.0
    for i in range(3):
      want += math.log(sum(math.exp(x) for x in s[i:])) - s[i]
    got = losses.ListMLELoss()(jnp.array(labels), jnp.array(logits))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_position_aware_lambda(self):
    labels = [[0.0, 2.0, 1.0]]
    logits = [[1.0, 3.0, 2.0]]
    n = 3
    s = [3.0, 2.0, 1.0]
    want = 0.0
    for i in range(3):
      w = 2.0 ** (n - (i + 1)) - 1.0
      want += w * (math.log(sum(math.exp(x) for x in s[i:])) - s[i])
    got = losses.ListMLELoss(
        lambda_weight=lw.create_p_list_mle_lambda_weight(n))(
            jnp.array(labels), jnp.array(logits))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def approx_ranks_oracle(logits, temperature):
  n = len(logits)
  scaled = [x / temperature for x in logits]
  return [0.5 + sum(sigmoid(sj - si) for sj in scaled)
          for si in scaled]


class TestApproxLosses:

  def test_approx_ndcg(self):
    labels = [[0.0, 1.0, 2.0]]
    logits = [[2.0, 1.0, 3.0]]
    ranks = approx_ranks_oracle(logits[0], 0.1)
    dcg = sum((2**l - 1) / math.log1p(r) for l, r in zip(labels[0], ranks))
    ideal = sorted(labels[0], reverse=True)
    max_dcg = sum((2**l - 1) / math.log1p(i + 1) for i, l in enumerate(ideal))
    want = -dcg / max_dcg
    got = losses.ApproxNDCGLoss()(jnp.array(labels), jnp.array(logits))
    np.testing.assert_allclose(float(got), want, rtol=1e-4)

  def test_approx_mrr(self):
    labels = [[0.0, 0.0, 1.0]]
    logits = [[2.0, 1.0, 3.0]]
    ranks = approx_ranks_oracle(logits[0], 0.1)
    rr = sum(l / r for l, r in zip(labels[0], ranks)) / sum(labels[0])
    got = losses.ApproxMRRLoss()(jnp.array(labels), jnp.array(logits))
    np.testing.assert_allclose(float(got), -rr, rtol=1e-4)

  def test_approx_ndcg_masked_matches_compact(self):
    """A padded list must give the same loss as its compact version."""
    padded = losses.ApproxNDCGLoss()(
        jnp.array([[1.0, 2.0, -1.0, -1.0]]),
        jnp.array([[1.0, 3.0, 100.0, 100.0]]))
    compact = losses.ApproxNDCGLoss()(
        jnp.array([[1.0, 2.0]]), jnp.array([[1.0, 3.0]]))
    np.testing.assert_allclose(float(padded), float(compact), rtol=1e-4)


class TestScaleInvariantApprox:
  """The scale-invariant Approx* recipe (losses._standardize_logits):
  the framework's factory default for the approx keys — the reference's
  fixed temperature saturates at realistic list sizes
  (APPROX_NDCG_DIAG.json)."""

  def _data(self):
    rng = np.random.RandomState(7)
    labels = rng.randint(0, 4, size=(4, 16)).astype(np.float32)
    labels[:, -3:] = -1.0
    logits = rng.randn(4, 16).astype(np.float32)
    return jnp.array(labels), jnp.array(logits)

  @pytest.mark.parametrize('cls', [losses.ApproxNDCGLoss,
                                   losses.ApproxMRRLoss])
  def test_scale_and_shift_invariance(self, cls):
    labels, logits = self._data()
    loss = cls(scale_invariant=True)
    base = float(loss(labels, logits))
    scaled = float(loss(labels, logits * 37.5 - 11.0))
    np.testing.assert_allclose(scaled, base, rtol=1e-5)
    # The reference recipe is NOT scale invariant (sanity of the test).
    ref = cls(scale_invariant=False)
    assert abs(float(ref(labels, logits * 37.5 - 11.0))
               - float(ref(labels, logits))) > 1e-4

  def test_relative_gradient_signal_is_scale_free(self):
    """The property that prevents the saturation death spiral: the SI
    form's RELATIVE gradient signal (||grad|| x logit scale) is exactly
    constant in the logit scale, so logit growth during training cannot
    quench the learning signal. The reference recipe's decays with
    scale (the sigmoid saturates)."""
    labels, logits = self._data()

    def rel_signal(si, c):
      g = jax.grad(
          lambda s: losses.ApproxNDCGLoss(scale_invariant=si)(labels, s)
      )(logits * c)
      return float(jnp.linalg.norm(g)) * c

    si_ratio = rel_signal(True, 100.0) / rel_signal(True, 1.0)
    np.testing.assert_allclose(si_ratio, 1.0, rtol=1e-4)
    ref_ratio = rel_signal(False, 100.0) / rel_signal(False, 1.0)
    assert ref_ratio < 0.99

  def test_factory_defaults_to_scale_invariant(self):
    from ranking_tpu.ops import loss_registry
    labels, logits = self._data()
    got = float(loss_registry.make_loss_fn('approx_ndcg_loss')(
        labels, logits))
    explicit = float(losses.ApproxNDCGLoss(
        scale_invariant=True,
        temperature=loss_registry.SCALE_INVARIANT_TEMPERATURE)(
            labels, logits))
    np.testing.assert_allclose(got, explicit, rtol=1e-6)
    # Explicit opt-out reproduces the reference recipe.
    ref = float(loss_registry.make_loss_fn(
        'approx_ndcg_loss', params={'scale_invariant': False})(
            labels, logits))
    assert abs(got - ref) > 1e-5

  def test_masked_padding_equivalence(self):
    loss = losses.ApproxNDCGLoss(scale_invariant=True)
    padded = loss(jnp.array([[1.0, 2.0, 0.0, -1.0, -1.0]]),
                  jnp.array([[1.0, 3.0, -0.5, 100.0, -100.0]]))
    compact = loss(jnp.array([[1.0, 2.0, 0.0]]),
                   jnp.array([[1.0, 3.0, -0.5]]))
    np.testing.assert_allclose(float(padded), float(compact), rtol=1e-5)

  def test_single_valid_doc_is_finite(self):
    loss = losses.ApproxNDCGLoss(scale_invariant=True)
    val = float(loss(jnp.array([[2.0, -1.0, -1.0]]),
                     jnp.array([[0.7, 1.0, 2.0]])))
    assert np.isfinite(val)


class TestNeuralSortLosses:

  def test_neural_sort_ndcg_identity_when_sorted(self):
    """With very spread logits the soft permutation is ~hard, so the loss
    approaches -NDCG of the induced order."""
    labels = jnp.array([[2.0, 1.0, 0.0]])
    logits = jnp.array([[30.0, 20.0, 10.0]])
    got = losses.NeuralSortNDCGLoss()(labels, logits)
    np.testing.assert_allclose(float(got), -1.0, atol=1e-3)

  def test_neural_sort_ce_nonnegative(self):
    labels = jnp.array([[2.0, 1.0, 0.0], [0.0, 1.0, -1.0]])
    logits = jnp.array([[1.0, 3.0, 2.0], [2.0, 1.0, 0.0]])
    got = losses.NeuralSortCrossEntropyLoss()(labels, logits)
    assert float(got) > 0.0

  def test_masked_matches_compact(self):
    padded = losses.NeuralSortNDCGLoss()(
        jnp.array([[1.0, 2.0, -1.0]]), jnp.array([[1.0, 3.0, 50.0]]))
    compact = losses.NeuralSortNDCGLoss()(
        jnp.array([[1.0, 2.0]]), jnp.array([[1.0, 3.0]]))
    np.testing.assert_allclose(float(padded), float(compact), rtol=1e-5)


class TestPointwiseLosses:

  def test_sigmoid_ce(self):
    terms, wts = [], []
    for b in range(2):
      for i in range(3):
        l, x = LABELS[b][i], LOGITS[b][i]
        terms.append(max(x, 0) - x * l + math.log1p(math.exp(-abs(x))))
        wts.append(1.0)
    want = reduce_oracle(terms, wts, Reduction.SUM_BY_NONZERO_WEIGHTS)
    got = losses.SigmoidCrossEntropyLoss()(
        jnp.array(LABELS), jnp.array(LOGITS))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_sigmoid_ce_padded(self):
    terms, wts = [], []
    for b in range(2):
      for i in range(3):
        l, x = PADDED_LABELS[b][i], LOGITS[b][i]
        if l < 0:
          continue
        terms.append(max(x, 0) - x * l + math.log1p(math.exp(-abs(x))))
        wts.append(1.0)
    want = reduce_oracle(terms, wts, Reduction.SUM_BY_NONZERO_WEIGHTS)
    got = losses.SigmoidCrossEntropyLoss()(
        jnp.array(PADDED_LABELS), jnp.array(LOGITS))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_mse(self):
    got = losses.MeanSquaredLoss()(jnp.array(LABELS), jnp.array(LOGITS))
    terms = [(LABELS[b][i] - LOGITS[b][i]) ** 2
             for b in range(2) for i in range(3)]
    want = sum(terms) / 6.0
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_ordinal(self):
    labels = [[0.0, 2.0]]
    logits = [[[0.5, -0.5], [1.0, 0.3]]]
    terms = []
    for i in range(2):
      for level in range(2):
        target = 1.0 if labels[0][i] >= level + 1 else 0.0
        x = logits[0][i][level]
        terms.append(max(x, 0) - x * target + math.log1p(math.exp(-abs(x))))
    want = sum(terms) / 2.0  # two valid items
    got = losses.OrdinalLoss(ordinal_size=2)(
        jnp.array(labels), jnp.array(logits))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_ordinal_fraction(self):
    labels = [[1.2]]
    logits = [[[0.5, -0.5]]]
    # ordinals: level1 -> 1.0 (1.2 >= 1), level2 -> 0.2 fraction.
    targets = [1.0, 0.2]
    terms = [max(x, 0) - x * t + math.log1p(math.exp(-abs(x)))
             for x, t in zip(logits[0][0], targets)]
    want = sum(terms)
    got = losses.OrdinalLoss(ordinal_size=2, use_fraction_label=True)(
        jnp.array(labels), jnp.array(logits))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_multiclass_from_logits(self):
    labels = [[1.0, 0.0]]
    logits = [[[0.1, 2.0, 0.3], [1.5, 0.2, 0.1]]]
    terms = []
    for i in range(2):
      z = sum(math.exp(x) for x in logits[0][i])
      cls = int(labels[0][i])
      terms.append(-(logits[0][i][cls] - math.log(z)))
    want = sum(terms) / 2.0
    got = losses.MultiClassLoss(num_classes=3, from_logits=True)(
        jnp.array(labels), jnp.array(logits))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_click_em(self):
    labels = [[1.0, 0.0]]
    exam = [0.5, -0.2]
    rel = [0.3, 0.8]
    logits = [[[exam[0], rel[0]], [exam[1], rel[1]]]]
    terms = []
    for i in range(2):
      clicked = labels[0][i] >= 1.0
      if clicked:
        p_exam, p_rel = 1.0, 1.0
      else:
        p_exam = sigmoid(exam[i] - log1pexp(rel[i]))
        p_rel = sigmoid(rel[i] - log1pexp(exam[i]))
      ce_exam = max(exam[i], 0) - exam[i] * p_exam + math.log1p(
          math.exp(-abs(exam[i])))
      ce_rel = max(rel[i], 0) - rel[i] * p_rel + math.log1p(
          math.exp(-abs(rel[i])))
      terms.append(ce_exam + ce_rel)
    want = sum(terms) / 2.0
    got = losses.ClickEMLoss()(jnp.array(labels), jnp.array(logits))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


class TestCircleLoss:

  def test_hand_computed(self):
    labels = [[1.0, 0.0]]
    scores = [[0.7, 0.4]]
    gamma, margin = 64.0, 0.25
    a_i = max(0.0, 1.0 - scores[0][0] + margin)
    a_j = max(0.0, scores[0][1] + margin)
    pair_logit = (a_i * (1.0 - scores[0][0] - margin)
                  + a_j * (scores[0][1] - margin))
    want = math.log1p(math.exp(gamma * pair_logit))
    got = losses.CircleLoss()(jnp.array(labels), jnp.array(scores))
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


class TestMixtureEMLoss:

  def test_runs_and_weights(self):
    labels = jnp.array([[1.0, 0.0], [0.0, 0.0]])
    logits = jnp.array([[[0.1, 0.2], [0.3, 0.4]],
                        [[0.5, 0.6], [0.7, 0.8]]])
    loss = losses.MixtureEMLoss()
    values, weights = loss.unreduced(labels, logits)
    assert values.shape == (2, 1)
    np.testing.assert_allclose(np.asarray(weights), [[1.0], [0.0]])


class TestCoupledRankDistil:

  def test_shape_and_nonzero_mask(self):
    labels = jnp.array([[2.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    logits = jnp.array([[1.0, 2.0, 3.0], [1.0, 2.0, 3.0]])
    loss = losses.CoupledRankDistilLoss(sample_size=4, topk=2)
    values, weights = loss.unreduced(labels, logits,
                                     key=jax.random.PRNGKey(0))
    assert values.shape == (2, 1)
    np.testing.assert_allclose(np.asarray(weights), [[1.0], [0.0]])
    assert float(values[0, 0]) > 0.0


class TestGumbelSampling:

  def test_expansion_shapes(self):
    from ranking_tpu.ops import sorting
    labels = jnp.array([[0.0, 1.0, -1.0]])
    logits = jnp.array([[1.0, 2.0, 3.0]])
    l, s, w = sorting.gumbel_sample_lists(
        labels, logits, jax.random.PRNGKey(0),
        weights=jnp.array([[1.0, 2.0, 3.0]]), sample_size=4)
    assert l.shape == (4, 3)
    assert s.shape == (4, 3)
    assert w.shape == (4, 3)
    # Labels are tiled unchanged.
    np.testing.assert_allclose(np.asarray(l),
                               np.tile(np.asarray(labels), (4, 1)))
    # Invalid entries get log(1e-20)-ish logits.
    assert np.asarray(s)[:, 2].max() < -40.0


class TestLossRegistry:

  def test_all_keys_build(self):
    for key in RankingLossKey.all_keys():
      params = {}
      if key == RankingLossKey.ORDINAL_LOSS:
        params = {'ordinal_size': 2}
      elif key == RankingLossKey.MULTI_CLASS_LOSS:
        params = {'num_classes': 3}
      assert build_loss(key, **params) is not None

  def test_make_loss_fn_single(self):
    fn = make_loss_fn(RankingLossKey.SOFTMAX_LOSS)
    got = fn(jnp.array(LABELS), jnp.array(LOGITS))
    want = softmax_oracle(LABELS, LOGITS)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_make_loss_fn_weighted_combo(self):
    fn = make_loss_fn(
        'softmax_loss:0.9,sigmoid_cross_entropy_loss:0.1')
    sm = make_loss_fn(RankingLossKey.SOFTMAX_LOSS)
    ce = make_loss_fn(RankingLossKey.SIGMOID_CROSS_ENTROPY_LOSS)
    got = fn(jnp.array(LABELS), jnp.array(LOGITS))
    want = (0.9 * float(sm(jnp.array(LABELS), jnp.array(LOGITS)))
            + 0.1 * float(ce(jnp.array(LABELS), jnp.array(LOGITS))))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_weights_feature(self):
    fn = make_loss_fn(
        RankingLossKey.PAIRWISE_LOGISTIC_LOSS,
        weights_feature_name='example_weights')
    got = fn(jnp.array(LABELS), jnp.array(LOGITS),
             features={'example_weights': jnp.array(WEIGHTS_2D)})
    want = pairwise_oracle(LABELS, LOGITS, lambda x: log1pexp(-x),
                           weights=WEIGHTS_2D)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_gumbel_key_runs(self):
    fn = make_loss_fn(RankingLossKey.GUMBEL_APPROX_NDCG_LOSS,
                      gumbel_params={'sample_size': 4})
    got = fn(jnp.array(LABELS), jnp.array(LOGITS),
             key=jax.random.PRNGKey(3))
    assert np.isfinite(float(got))

  def test_jit_compatible(self):
    fn = make_loss_fn(RankingLossKey.SOFTMAX_LOSS)
    jitted = jax.jit(lambda l, s: fn(l, s))
    got = jitted(jnp.array(LABELS), jnp.array(LOGITS))
    want = softmax_oracle(LABELS, LOGITS)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

  def test_gradients_flow(self):
    fn = make_loss_fn(RankingLossKey.APPROX_NDCG_LOSS)
    grad = jax.grad(lambda s: fn(jnp.array(LABELS), s))(jnp.array(LOGITS))
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).sum() > 0.0

  def test_gradients_all_losses(self):
    labels = jnp.array(PADDED_LABELS)
    logits = jnp.array(LOGITS)
    key = jax.random.PRNGKey(0)
    for loss_key in RankingLossKey.all_keys():
      if loss_key in (RankingLossKey.ORDINAL_LOSS,
                      RankingLossKey.MULTI_CLASS_LOSS,
                      RankingLossKey.CLICK_EM_LOSS,
                      RankingLossKey.MIXTURE_EM_LOSS):
        continue  # rank-3 logits, covered separately
      fn = make_loss_fn(loss_key)
      grad = jax.grad(lambda s: fn(labels, s, key=key))(logits)
      assert np.isfinite(np.asarray(grad)).all(), loss_key


class TestLossMetricFn:
  """make_loss_metric_fn turns a loss into a (values, weights) eval metric
  (python/losses.py:424 parity)."""

  def test_loss_metric_matches_per_list(self):
    from ranking_tpu.ops.loss_registry import make_loss_metric_fn
    fn = make_loss_metric_fn(RankingLossKey.SOFTMAX_LOSS)
    labels = jnp.array(PADDED_LABELS)
    logits = jnp.array(LOGITS)
    values, weights = fn(labels, logits)
    assert values.shape == weights.shape == (labels.shape[0],)
    # Weighted mean of per-list losses equals the scalar MEAN-style value.
    denom = float(jnp.sum(weights))
    assert denom > 0
    assert np.isfinite(float(jnp.sum(values * weights) / denom))

  def test_loss_metric_weights_feature(self):
    from ranking_tpu.ops.loss_registry import make_loss_metric_fn
    fn = make_loss_metric_fn(RankingLossKey.SIGMOID_CROSS_ENTROPY_LOSS,
                             weights_feature_name='w')
    labels = jnp.array(PADDED_LABELS)
    logits = jnp.array(LOGITS)
    values, weights = fn(labels, logits,
                         features={'w': jnp.array(WEIGHTS_2D)})
    assert np.isfinite(np.asarray(values)).all()


class TestRaggedCalling:
  """ragged=True densifies variable-length host lists with the reference's
  sentinels before computing (losses_impl.py:692-694 parity)."""

  def test_ragged_equals_padded(self):
    from ranking_tpu.ops import losses as jlo
    ragged_labels = [[1.0, 0.0], [2.0, 1.0, 0.0]]
    ragged_logits = [[0.5, -0.2], [1.0, 0.3, -0.4]]
    for loss in (jlo.SoftmaxLoss(name='s'),
                 jlo.PairwiseLogisticLoss(name='p'),
                 jlo.MeanSquaredLoss(name='m')):
      via_ragged = float(loss(ragged_labels, ragged_logits, ragged=True))
      dense_labels = jnp.array([[1.0, 0.0, -1.0], [2.0, 1.0, 0.0]])
      dense_logits = jnp.array([[0.5, -0.2, -1e6], [1.0, 0.3, -0.4]])
      via_dense = float(loss(dense_labels, dense_logits))
      np.testing.assert_allclose(via_ragged, via_dense, rtol=1e-5,
                                 err_msg=loss.name)


class TestDistillationSanity:
  """CoupledRankDistil: a student matching the teacher's order must score
  a lower distillation loss than a reversed student."""

  def test_agreement_beats_reversal(self):
    from ranking_tpu.ops import losses as jlo
    rng = np.random.RandomState(0)
    teacher = np.sort(rng.randn(8, 10).astype(np.float32), axis=1)[:, ::-1]
    aligned = teacher * 0.7 + 0.1  # same order
    reversed_ = -teacher           # opposite order
    loss = jlo.CoupledRankDistilLoss(name='d', sample_size=8, topk=4)
    key = jax.random.PRNGKey(3)
    # Teacher scores act as soft labels.
    good = float(loss(teacher.copy(), jnp.asarray(aligned), key=key))
    bad = float(loss(teacher.copy(), jnp.asarray(reversed_), key=key))
    assert good < bad


class TestNoLambdaOverride:

  def test_yeti_no_lambda_suppresses_keras_default(self):
    """lambda_weight=NO_LAMBDA reproduces the reference's python-generation
    yeti recipe (python/losses.py:133: pairwise logistic on the Gumbel
    sample with NO lambda weight), while the factory default mirrors the
    keras YetiLogisticLoss (neighbor-pair DCG weight)."""
    import numpy as np
    from ranking_tpu import ops
    from ranking_tpu.ops import lambda_weights as lw
    from ranking_tpu.ops import loss_registry

    plain_obj = loss_registry.build_loss(
        'yeti_logistic_loss', lambda_weight=loss_registry.NO_LAMBDA)
    assert plain_obj.lambda_weight is None
    default_obj = loss_registry.build_loss('yeti_logistic_loss')
    assert isinstance(default_obj.lambda_weight, lw.DCGLambdaWeightV2)

    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 3, size=(4, 9)).astype(np.float32))
    logits = jnp.asarray(rng.randn(4, 9).astype(np.float32))
    key = jax.random.PRNGKey(7)
    plain = ops.make_loss_fn('yeti_logistic_loss',
                             lambda_weight=loss_registry.NO_LAMBDA)
    keras_default = ops.make_loss_fn('yeti_logistic_loss')
    a = float(plain(labels, logits, key=key))
    b = float(keras_default(labels, logits, key=key))
    assert np.isfinite(a) and np.isfinite(b)
    assert abs(a - b) > 1e-4  # genuinely different objectives
