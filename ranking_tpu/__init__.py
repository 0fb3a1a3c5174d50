"""ranking_tpu: a TPU-native learning-to-rank framework in JAX/XLA/Pallas.

A from-scratch re-design of the capability surface of tensorflow/ranking
for TPUs: padded [batch, list_size, ...] data model with -1 label padding,
masking-aware loss/metric zoo, univariate/GAM/DIN/groupwise scorers, sharded
embedding tables, and a pjit-based train/eval/export pipeline.

Submodules load lazily (PEP 562) so lightweight consumers — e.g. a serving
process reconstructing a model from a ``pipeline.export`` artifact — don't
pay for (or depend on) the model-construction stack.
"""

import importlib

__version__ = '0.1.0'

_SUBMODULES = ('data', 'models', 'ops', 'parallel', 'pipeline', 'train',
               'utils')

__all__ = list(_SUBMODULES) + ['__version__']


def __getattr__(name):
  if name in _SUBMODULES:
    module = importlib.import_module(f'ranking_tpu.{name}')
    globals()[name] = module
    return module
  raise AttributeError(f'module {__name__!r} has no attribute {name!r}')


def __dir__():
  return sorted(__all__)
