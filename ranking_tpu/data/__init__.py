"""Data ingestion: batch model, proto/LIBSVM parsing, dataset pipelines."""

from ranking_tpu.data import batch as batch_lib
from ranking_tpu.data import bert
from ranking_tpu.data import dataset
from ranking_tpu.data import libsvm
from ranking_tpu.data import parsers
from ranking_tpu.data import proto
from ranking_tpu.data import tfrecord
from ranking_tpu.data import trec
from ranking_tpu.data.batch import RankingBatch, batch_from_labels
from ranking_tpu.data.dataset import (
    build_ranking_dataset,
    flatten_examples,
    in_memory_batches,
    native_ranking_dataset,
    prefetch_to_device,
)
from ranking_tpu.data.parsers import (
    FixedLenFeature,
    VarLenFeature,
    Vocabulary,
)

__all__ = [
    'FixedLenFeature',
    'RankingBatch',
    'VarLenFeature',
    'Vocabulary',
    'batch_from_labels',
    'batch_lib',
    'bert',
    'build_ranking_dataset',
    'dataset',
    'flatten_examples',
    'in_memory_batches',
    'libsvm',
    'native_ranking_dataset',
    'parsers',
    'prefetch_to_device',
    'proto',
    'tfrecord',
    'trec',
]
