"""Training loop: state, jitted steps, checkpointing."""

from ranking_tpu.train import checkpoint
from ranking_tpu.train import sparse
from ranking_tpu.train import state as state_lib
from ranking_tpu.train import steps
from ranking_tpu.train.checkpoint import CheckpointManager
from ranking_tpu.train.sparse import EmbedFeature, LazyAdagrad, LazyAdam
from ranking_tpu.train.state import TrainState, create_train_state
from ranking_tpu.train.steps import (
    init_metric_states,
    make_eval_step,
    make_multi_step,
    make_sparse_train_step,
    make_train_step,
    metric_results,
)

__all__ = [
    'CheckpointManager',
    'EmbedFeature',
    'LazyAdagrad',
    'LazyAdam',
    'TrainState',
    'checkpoint',
    'create_train_state',
    'init_metric_states',
    'make_eval_step',
    'make_multi_step',
    'make_sparse_train_step',
    'make_train_step',
    'metric_results',
    'sparse',
    'state_lib',
    'steps',
]
