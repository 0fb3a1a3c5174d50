"""BERT-style input assembly for encoder scorers.

Host-side counterpart of TFRBertDataLoader's feature mapping
(/root/reference/tensorflow_ranking/extension/premade/tfrbert_task.py:50-97):
each (query, document) token-id pair becomes one fused sequence
``[CLS] query [SEP] document [SEP]`` padded to ``seq_len`` with -1 (the
encoder masks ids < 0), shaped ``[B, L, seq_len]`` for
``models.encoder.EncoderScorer``.
"""

from __future__ import annotations

import numpy as np


def fuse_query_document_ids(
    query_ids: np.ndarray,
    document_ids: np.ndarray,
    seq_len: int,
    cls_id: int,
    sep_id: int,
    pad_id: int = -1,
) -> np.ndarray:
  """Builds ``[B, L, seq_len]`` fused BERT inputs.

  Args:
    query_ids: ``[B, Tq]`` int ids, padding < 0.
    document_ids: ``[B, L, Td]`` int ids, padding < 0.
    seq_len: fused sequence length (truncates document tail first).
    cls_id/sep_id: special token ids.
    pad_id: padding id (< 0 so encoders mask it).

  Returns:
    int32 ``[B, L, seq_len]``.
  """
  query_ids = np.asarray(query_ids)
  document_ids = np.asarray(document_ids)
  b, l, _ = document_ids.shape
  out = np.full((b, l, seq_len), pad_id, np.int32)
  for bi in range(b):
    q = [int(t) for t in query_ids[bi] if t >= 0]
    head = [cls_id] + q + [sep_id]
    head = head[:seq_len]
    for li in range(l):
      d = [int(t) for t in document_ids[bi, li] if t >= 0]
      seq = head + d
      seq = seq[:seq_len - 1] + [sep_id]
      out[bi, li, :len(seq)] = seq
  return out
