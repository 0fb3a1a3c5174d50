"""ranking_tpu: a TPU-native learning-to-rank framework in JAX/XLA/Pallas.

A from-scratch re-design of the capability surface of tensorflow/ranking
for TPUs: padded [batch, list_size, ...] data model with -1 label padding,
masking-aware loss/metric zoo, univariate/GAM/DIN/groupwise scorers, sharded
embedding tables, and a pjit-based train/eval/export pipeline.
"""

__version__ = '0.1.0'

from ranking_tpu import data
from ranking_tpu import models
from ranking_tpu import ops
from ranking_tpu import parallel
from ranking_tpu import pipeline
from ranking_tpu import train
from ranking_tpu import utils

__all__ = ['data', 'models', 'ops', 'parallel', 'pipeline', 'train', 'utils',
           '__version__']
