"""LIBSVM ranking-format ingestion (MSLR-WEB30K and friends).

Reproduces the semantics of the reference's example-side loader
(/root/reference/tensorflow_ranking/examples/tf_ranking_libsvm.py:137-195):
rows ``label qid:<id> f1:v1 f2:v2 ...`` are grouped by qid into
``[num_queries, list_size, num_features]`` arrays, labels padded with -1,
lists truncated to the first ``list_size`` documents. Feature indices are
1-based; missing features default to 0.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np


def iter_libsvm_lines(path: str) -> Iterator[Tuple[float, str, dict]]:
  """Yields (label, qid, {feature_index: value}) per row."""
  with open(path) as f:
    for line in f:
      line = line.split('#')[0].strip()
      if not line:
        continue
      parts = line.split()
      label = float(parts[0])
      qid = None
      feats = {}
      for tok in parts[1:]:
        key, _, val = tok.partition(':')
        if key == 'qid':
          qid = val
        else:
          feats[int(key)] = float(val)
      if qid is None:
        raise ValueError(f'Row without qid in {path}: {line[:80]}')
      yield label, qid, feats


def load_libsvm_lists(
    path: str,
    list_size: int,
    num_features: int,
    padding_label: float = -1.0,
    use_native: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
  """Loads one LIBSVM file into padded listwise arrays.

  Returns:
    features: ``[Q, list_size, num_features]`` float32
    labels: ``[Q, list_size]`` float32, padded with ``padding_label``
    qids: ``[Q]`` array of qid strings (document order within a list follows
      file order; truncation keeps the first ``list_size`` docs, matching
      tf_ranking_libsvm.py:176-183).
  """
  if use_native:
    try:
      from ranking_tpu.data import native
      if native.available():
        return native.load_libsvm_lists(path, list_size, num_features,
                                        padding_label)
    except (RuntimeError, OSError):
      pass
  qid_order = []
  by_qid = {}
  for label, qid, feats in iter_libsvm_lines(path):
    if qid not in by_qid:
      by_qid[qid] = []
      qid_order.append(qid)
    by_qid[qid].append((label, feats))

  num_queries = len(qid_order)
  features = np.zeros((num_queries, list_size, num_features), np.float32)
  labels = np.full((num_queries, list_size), padding_label, np.float32)
  for qi, qid in enumerate(qid_order):
    for di, (label, feats) in enumerate(by_qid[qid][:list_size]):
      labels[qi, di] = label
      for fidx, val in feats.items():
        if 1 <= fidx <= num_features:
          features[qi, di, fidx - 1] = val
  return features, labels, np.asarray(qid_order)


def infer_num_features(path: str, sample_rows: Optional[int] = 1000) -> int:
  """Max feature index seen in the first ``sample_rows`` rows."""
  max_idx = 0
  for i, (_, _, feats) in enumerate(iter_libsvm_lines(path)):
    if feats:
      max_idx = max(max_idx, max(feats))
    if sample_rows is not None and i + 1 >= sample_rows:
      break
  return max_idx
