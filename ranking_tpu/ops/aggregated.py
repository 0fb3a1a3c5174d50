"""Cross-batch aggregated metrics grouped by query id (host-side).

The analog of TFR-BERT's aggregated evaluation
(/root/reference/tensorflow_ranking/extension/premade/tfrbert_task.py:
238-344): predictions from many eval batches are pooled by query id so a
query whose documents were split across batches (or truncated lists) is
scored once over its full candidate set, then the per-query metric values
are averaged. Groups are re-padded into one ``[Q, Lmax]`` batch and scored
by the standard metric fns — no second metric implementation.

Also provides the csv prediction dump (tfrbert_task.py:332-344).
"""

from __future__ import annotations

import csv
from typing import Dict, List, Mapping, Optional, Tuple

import numpy as np

from ranking_tpu.ops import metric_registry


class PredictionAccumulator:
  """Collects (query_id, relevance, score) triples across eval batches."""

  def __init__(self):
    self._qids: List = []
    self._labels: List[float] = []
    self._scores: List[float] = []

  def add_batch(self, query_ids, labels, scores, mask=None) -> None:
    """query_ids: [B] or [B, L]; labels/scores: [B, L]; mask: [B, L]."""
    query_ids = np.asarray(query_ids)
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    if mask is None:
      mask = labels >= 0
    mask = np.asarray(mask, bool)
    if query_ids.ndim == 1:
      query_ids = np.repeat(query_ids[:, None], labels.shape[1], axis=1)
    self._qids.extend(query_ids[mask].tolist())
    self._labels.extend(labels[mask].astype(float).tolist())
    self._scores.extend(scores[mask].astype(float).tolist())

  def grouped(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (labels [Q, Lmax], scores [Q, Lmax], qids [Q]), -1 padded."""
    by_qid: Dict = {}
    order = []
    for q, l, s in zip(self._qids, self._labels, self._scores):
      if q not in by_qid:
        by_qid[q] = []
        order.append(q)
      by_qid[q].append((l, s))
    lmax = max((len(v) for v in by_qid.values()), default=1)
    labels = np.full((len(order), lmax), -1.0, np.float32)
    scores = np.full((len(order), lmax), -1e6, np.float32)
    for i, q in enumerate(order):
      for j, (l, s) in enumerate(by_qid[q]):
        labels[i, j] = l
        scores[i, j] = s
    return labels, scores, np.asarray(order)

  def compute(self, metric_specs: Mapping[str, Tuple[str, Optional[int]]],
              ) -> Dict[str, float]:
    """metric_specs: display name -> (metric_key, topn)."""
    import jax.numpy as jnp
    from ranking_tpu.utils import list_ops
    grouped_labels, grouped_scores, _ = self.grouped()
    # One device transfer, then one shared sort across the spec list
    # (same mechanism as the eval step — see list_ops.shared_sort_scope).
    labels = jnp.asarray(grouped_labels)
    scores = jnp.asarray(grouped_scores)
    out = {}
    with list_ops.shared_sort_scope():
      for name, (key, topn) in metric_specs.items():
        out[name] = float(metric_registry.compute_mean(
            key, labels, scores, topn=topn))
    return out

  def dump_csv(self, path: str) -> None:
    with open(path, 'w', newline='') as f:
      writer = csv.writer(f)
      writer.writerow(['query_id', 'relevance', 'score'])
      for q, l, s in zip(self._qids, self._labels, self._scores):
        writer.writerow([q, l, s])
