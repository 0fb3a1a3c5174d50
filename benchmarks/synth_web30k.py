"""Deterministic Web30K-shaped synthetic ranking data with learnable
structure, shared by the L>=100 quality-parity section and the
corpus-scale cross-framework run.

Shape follows the reference's stated quality bar — lists of 100-200 docs,
136 features (examples/tf_ranking_libsvm.py:90-91) — with MSLR-like label
statistics: graded 0..4 relevance, skewed toward 0 (roughly 50/30/12/5/3%),
variable list lengths. Labels are driven by a fixed nonlinear scoring
function of the features plus noise, so frameworks can actually learn and
final NDCG differences are meaningful, not floor effects.
"""

import numpy as np

NUM_FEATURES = 136
# Graded-label thresholds over the noisy per-query score quantiles,
# matching MSLR's skew (most docs irrelevant).
LABEL_QUANTILES = (0.50, 0.80, 0.92, 0.97)


def scoring_weights(seed: int = 1234):
  rng = np.random.RandomState(seed)
  w1 = rng.randn(NUM_FEATURES) / np.sqrt(NUM_FEATURES)
  w2 = rng.randn(16) / 4.0  # weights for squared terms of the first 16
  pair = (rng.permutation(NUM_FEATURES)[:8],
          rng.permutation(NUM_FEATURES)[:8])  # interaction pairs
  return w1, w2, pair


def true_scores(x: np.ndarray, weights=None) -> np.ndarray:
  """Nonlinear ground-truth score for features [..., F]."""
  w1, w2, (ia, ib) = weights or scoring_weights()
  s = x @ w1
  s = s + np.clip(x[..., :16], -3, 3) ** 2 @ w2
  s = s + 0.5 * (x[..., ia] * x[..., ib]).sum(-1)
  return s


def generate(num_queries: int, list_size: int, min_docs: int = None,
             seed: int = 0, noise: float = 1.0):
  """Returns (features [Q, L, F], labels [Q, L] with -1 padding).

  Real doc counts are uniform in [min_docs, list_size] (default
  list_size//2 .. list_size). Labels are graded by per-query quantiles of
  the noisy true score.
  """
  rng = np.random.RandomState(seed)
  weights = scoring_weights()
  if min_docs is None:
    min_docs = max(2, list_size // 2)
  feats = rng.randn(num_queries, list_size, NUM_FEATURES).astype(np.float32)
  labels = np.full((num_queries, list_size), -1.0, np.float32)
  counts = rng.randint(min_docs, list_size + 1, size=num_queries)
  scores = true_scores(feats, weights) + noise * rng.randn(
      num_queries, list_size)
  for q in range(num_queries):
    n = counts[q]
    feats[q, n:] = 0.0
    s = scores[q, :n]
    cut = np.quantile(s, LABEL_QUANTILES)
    labels[q, :n] = np.searchsorted(cut, s, side='right')
  return feats, labels
