"""Data ingestion: batch model, proto/LIBSVM parsing, dataset pipelines."""

from ranking_tpu.data import batch as batch_lib
from ranking_tpu.data.batch import RankingBatch, batch_from_labels

__all__ = [
    'RankingBatch',
    'batch_from_labels',
    'batch_lib',
]
