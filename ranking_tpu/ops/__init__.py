"""Core ranking math: losses, metrics, lambda weights, reductions, sorting."""

from ranking_tpu.ops import aggregated
from ranking_tpu.ops import lambda_weights
from ranking_tpu.ops import loss_registry
from ranking_tpu.ops import losses
from ranking_tpu.ops import metric_registry
from ranking_tpu.ops import metrics
from ranking_tpu.ops import reductions
from ranking_tpu.ops import sorting
from ranking_tpu.ops.loss_registry import RankingLossKey, make_loss_fn
from ranking_tpu.ops.metric_registry import (
    RankingMetricKey,
    compute_mean,
    eval_metric,
    make_ranking_metric_fn,
)
from ranking_tpu.ops.reductions import Reduction

__all__ = [
    'aggregated',
    'RankingLossKey',
    'RankingMetricKey',
    'Reduction',
    'compute_mean',
    'eval_metric',
    'lambda_weights',
    'loss_registry',
    'losses',
    'make_loss_fn',
    'make_ranking_metric_fn',
    'metric_registry',
    'metrics',
    'reductions',
    'sorting',
]
