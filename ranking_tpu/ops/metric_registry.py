"""Metric key registry, factory, and psum-able streaming mean state.

TPU-native counterpart of tensorflow_ranking/python/metrics.py. The streaming
state here replaces ``tf.metrics.mean`` variables with a pure functional
``MeanState`` pytree: each batch contributes (sum of value*weight, sum of
weight); states add associatively, so they can be ``jax.lax.psum``'d across a
mesh and accumulated across steps without mutable metric variables.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ranking_tpu.ops import metrics as metrics_impl
from ranking_tpu.utils import list_ops

Array = jnp.ndarray


class RankingMetricKey:
  """Ranking metric key strings (parity with python/metrics.py:37-76)."""

  MRR = 'mrr'
  ARP = 'arp'
  NDCG = 'ndcg'
  DCG = 'dcg'
  PRECISION = 'precision'
  RECALL = 'recall'
  MAP = 'map'
  PRECISION_IA = 'precision_ia'
  ORDERED_PAIR_ACCURACY = 'ordered_pair_accuracy'
  ALPHA_DCG = 'alpha_dcg'
  BPREF = 'bpref'
  HITS = 'hits'
  PWA = 'pwa'

  @classmethod
  def all_keys(cls):
    return [v for k, v in vars(cls).items()
            if k.isupper() and isinstance(v, str)]


def build_metric(
    metric_key: str,
    topn: Optional[int] = None,
    name: str = '',
    gain_fn: Callable[[Array], Array] = metrics_impl.DEFAULT_GAIN_FN,
    rank_discount_fn: Callable[[Array], Array] = (
        metrics_impl.DEFAULT_RANK_DISCOUNT_FN),
    **kwargs: Any,
) -> metrics_impl.RankingMetric:
  """Instantiates the metric object behind a key."""
  # Typos must not silently produce a different metric: only the keys
  # below consume extra kwargs.
  allowed = {RankingMetricKey.ALPHA_DCG: {'alpha'},
             RankingMetricKey.BPREF: {'use_trec_version'}}
  unknown = set(kwargs) - allowed.get(metric_key, set())
  if unknown:
    raise ValueError(
        f'{metric_key!r} does not accept options {sorted(unknown)}'
        + (f' (allowed: {sorted(allowed[metric_key])})'
           if metric_key in allowed else ''))
  name = name or (f'{metric_key}_{topn}' if topn else metric_key)
  builders: Dict[str, Callable[..., metrics_impl.RankingMetric]] = {
      RankingMetricKey.MRR: metrics_impl.MRRMetric,
      RankingMetricKey.ARP: metrics_impl.ARPMetric,
      RankingMetricKey.NDCG: lambda **kw: metrics_impl.NDCGMetric(
          gain_fn=gain_fn, rank_discount_fn=rank_discount_fn, **kw),
      RankingMetricKey.DCG: lambda **kw: metrics_impl.DCGMetric(
          gain_fn=gain_fn, rank_discount_fn=rank_discount_fn, **kw),
      RankingMetricKey.PRECISION: metrics_impl.PrecisionMetric,
      RankingMetricKey.RECALL: metrics_impl.RecallMetric,
      RankingMetricKey.MAP: metrics_impl.MeanAveragePrecisionMetric,
      RankingMetricKey.PRECISION_IA: metrics_impl.PrecisionIAMetric,
      RankingMetricKey.ORDERED_PAIR_ACCURACY: metrics_impl.OPAMetric,
      RankingMetricKey.ALPHA_DCG: lambda **kw: metrics_impl.AlphaDCGMetric(
          rank_discount_fn=rank_discount_fn,
          **{k: v for k, v in {**kwargs, **kw}.items()
             if k in ('name', 'topn', 'alpha')}),
      RankingMetricKey.BPREF: lambda **kw: metrics_impl.BPrefMetric(
          use_trec_version=kwargs.get('use_trec_version', True), **kw),
      RankingMetricKey.HITS: metrics_impl.HitsMetric,
      RankingMetricKey.PWA: metrics_impl.PWAMetric,
  }
  if metric_key not in builders:
    raise ValueError(f'Invalid metric_key: {metric_key!r}. '
                     f'Valid keys: {RankingMetricKey.all_keys()}')
  if metric_key in (RankingMetricKey.ARP,
                    RankingMetricKey.ORDERED_PAIR_ACCURACY):
    # Full-list metrics: the reference factory accepts-and-ignores topn
    # for these keys (python/metrics.py); the metric classes themselves
    # raise if constructed with one directly.
    return builders[metric_key](name=name)
  return builders[metric_key](name=name, topn=topn)


def make_ranking_metric_fn(
    metric_key: str,
    weights_feature_name: Optional[str] = None,
    topn: Optional[int] = None,
    name: Optional[str] = None,
    gain_fn: Callable[[Array], Array] = metrics_impl.DEFAULT_GAIN_FN,
    rank_discount_fn: Callable[[Array], Array] = (
        metrics_impl.DEFAULT_RANK_DISCOUNT_FN),
    ragged: bool = False,
    **kwargs: Any,
) -> Callable[..., Tuple[Array, Array]]:
  """Factory: ``metric_fn(labels, predictions, features=None) ->
  (per_list_values, per_list_weights)`` (python/metrics.py:124-301).

  With ``ragged=True`` the metric fn accepts host-side variable-length
  lists (lists of lists), densified with the reference's sentinels
  (python/metrics.py ragged parity via utils.ragged_to_dense)."""
  metric = build_metric(metric_key, topn=topn, name=name or '',
                        gain_fn=gain_fn, rank_discount_fn=rank_discount_fn,
                        **kwargs)

  def _metric_fn(labels, predictions, features=None):
    weights = None
    if weights_feature_name:
      if features is None or weights_feature_name not in features:
        raise ValueError(f'features must contain {weights_feature_name!r}')
      weights = features[weights_feature_name]
    if ragged:
      labels, predictions, weights, _ = list_ops.ragged_to_dense(
          labels, predictions, weights)
    if weights is not None:
      weights = jnp.asarray(weights, jnp.float32)
      if metric_key != RankingMetricKey.PWA:
        weights = list_ops.reshape_to_2d(weights)
    return metric(labels, predictions, weights=weights)

  return _metric_fn


def compute_mean(
    metric_key: str,
    labels,
    predictions,
    weights=None,
    topn: Optional[int] = None,
    name: Optional[str] = None,
    **kwargs: Any,
) -> Array:
  """One-shot weighted-mean metric value (python/metrics.py:79-121)."""
  metric = build_metric(metric_key, topn=topn, name=name or '', **kwargs)
  values, wts = metric(labels, predictions, weights=weights)
  denom = jnp.sum(wts)
  return jnp.where(denom != 0, jnp.sum(values * wts)
                   / jnp.where(denom != 0, denom, 1.0), 0.0)


def eval_metric(metric_fn, **kwargs) -> Array:
  """Stand-alone evaluation of a metric fn on ranked results.

  The analog of the reference's ``tfr.metrics.eval_metric``
  (python/metrics.py:650-705): arguments are passed by name and
  validated against the metric fn's signature, and the weighted mean is
  returned as a scalar.

  Example::

    value = eval_metric(
        metric_fn=make_ranking_metric_fn(RankingMetricKey.MRR),
        labels=[[0., 0., 1.]], predictions=[[1., 3., 2.]])
  """
  import inspect

  spec = inspect.getfullargspec(metric_fn)
  defaults = spec.defaults or ()
  fn_name = getattr(metric_fn, '__name__', repr(metric_fn))
  required = spec.args[: len(spec.args) - len(defaults)] + [
      n for n in spec.kwonlyargs if n not in (spec.kwonlydefaults or {})]
  for arg in required:
    if arg not in kwargs:
      raise ValueError(f'Metric {fn_name} requires '
                       f'argument {arg}.')
  accepted = set(spec.args) | set(spec.kwonlyargs)
  for arg in kwargs:
    if arg not in accepted:
      raise ValueError(f'Metric {fn_name} does not accept '
                       f'argument {arg}.')
  values, weights = metric_fn(**kwargs)
  denom = jnp.sum(weights)
  return jnp.where(denom != 0, jnp.sum(values * weights)
                   / jnp.where(denom != 0, denom, 1.0), 0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MeanState:
  """Streaming weighted mean as a pytree: add per-batch, psum across mesh."""

  total: Array
  count: Array

  @classmethod
  def zero(cls) -> 'MeanState':
    return cls(total=jnp.zeros((), jnp.float32),
               count=jnp.zeros((), jnp.float32))

  def update(self, values: Array, weights: Array) -> 'MeanState':
    # Flatten both sides before pairing: metric fns return [B, 1] values
    # while callers may hold [B] weights — NumPy broadcasting would pair
    # them as [B, B] and silently compute sum(v)*sum(w) instead of the
    # weighted mean.
    values = jnp.reshape(jnp.asarray(values, jnp.float32), (-1,))
    weights = jnp.asarray(weights, jnp.float32)
    if weights.ndim == 0:
      weights = jnp.broadcast_to(weights, values.shape)
    weights = jnp.reshape(weights, (-1,))
    if values.shape != weights.shape:
      raise ValueError(
          f'MeanState.update: {values.shape[0]} values vs '
          f'{weights.shape[0]} weights')
    return MeanState(
        total=self.total + jnp.sum(values * weights),
        count=self.count + jnp.sum(weights))

  def merge(self, other: 'MeanState') -> 'MeanState':
    return MeanState(self.total + other.total, self.count + other.count)

  def psum(self, axis_name: str) -> 'MeanState':
    return MeanState(jax.lax.psum(self.total, axis_name),
                     jax.lax.psum(self.count, axis_name))

  def result(self) -> Array:
    return jnp.where(self.count != 0,
                     self.total / jnp.where(self.count != 0, self.count, 1.0),
                     0.0)


def default_metric_fns(
    topns=(1, 5, 10, None),
) -> Dict[str, Callable[..., Tuple[Array, Array]]]:
  """The default eval set: NDCG at several cutoffs (keras/metrics.py:131)."""
  fns = {}
  for topn in topns:
    label = f'ndcg_{topn}' if topn else 'ndcg'
    fns[f'metric/{label}'] = make_ranking_metric_fn(
        RankingMetricKey.NDCG, topn=topn)
  return fns
