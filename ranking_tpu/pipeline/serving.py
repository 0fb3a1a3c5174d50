"""Serving: saved params + jitted apply + host parse shims.

The export/serving analog of ``tfr.keras.saved_model.Signatures``
(tensorflow_ranking/python/keras/saved_model.py:24-175): a ``Predictor``
bundles inference params with two entry points —

* ``predict(serialized_elwcs)`` — listwise: parse ELWC protos to a padded
  batch, run the model, return ``[B, L]`` scores (padded slots get
  ``float32.min``-like sentinel, matching saved_model.py:120-123's mask
  semantics);
* ``regress(serialized_examples)`` — pointwise: each tf.Example is a
  single-document list; returns ``[B]`` scores.

The listwise-predict == pointwise-regress parity invariant
(python/keras/pipeline_test.py:238) is covered by tests/test_pipeline.py.
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Optional, Sequence

import jax
import numpy as np

from ranking_tpu.data import parsers
from ranking_tpu.data.dataset import parsed_to_batch


class Predictor:
  """Inference wrapper: variables + jitted apply + proto parsing."""

  def __init__(
      self,
      model: Any,
      variables: Mapping[str, Any],
      context_feature_spec: Mapping[str, parsers.FeatureSpec],
      example_feature_spec: Mapping[str, parsers.FeatureSpec],
      list_size: Optional[int] = None,
      label_feature_name: Optional[str] = None,
  ):
    self.model = model
    # device_put ONCE: numpy/Orbax-restored params would otherwise be
    # re-uploaded host->device on every predict call.
    self.variables = jax.device_put(dict(variables))
    self.context_feature_spec = dict(context_feature_spec)
    # The label is never a model input at serving time; drop it from the
    # spec if callers pass training specs verbatim.
    self.example_feature_spec = {
        k: v for k, v in example_feature_spec.items()
        if k != label_feature_name}
    self.list_size = list_size

    @functools.partial(jax.jit, static_argnames=())
    def _apply(variables, context, examples, mask):
      return model.apply(variables, context, examples, mask, training=False)

    self._apply = _apply

  @classmethod
  def from_export(cls, model, export_path: str, context_feature_spec,
                  example_feature_spec, **kwargs) -> 'Predictor':
    from ranking_tpu.train import checkpoint
    restored = checkpoint.load_params(export_path)
    variables = {'params': restored['params']}
    if restored.get('batch_stats'):
      variables['batch_stats'] = restored['batch_stats']
    return cls(model, variables, context_feature_spec, example_feature_spec,
               **kwargs)

  def _run(self, parsed: parsers.ParsedLists) -> np.ndarray:
    scores = self._apply(self.variables,
                         jax.tree.map(jax.numpy.asarray, parsed.context),
                         jax.tree.map(jax.numpy.asarray, parsed.examples),
                         jax.numpy.asarray(parsed.mask))
    return np.asarray(scores)

  def predict(self, serialized_elwcs: Sequence[bytes]) -> np.ndarray:
    """[B, list_size] scores from serialized ELWC protos.

    With ``list_size=None`` the batch is padded up to a half-step
    power-of-two ladder (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, ...) of its
    longest list, bucketing compile shapes (each distinct padded shape
    jit-compiles once; without bucketing every request length would) with
    at most 33% padding overhead. Padded positions score the log-epsilon
    sentinel.
    """
    if not serialized_elwcs:
      return np.zeros((0, self.list_size or 1), np.float32)
    list_size = self.list_size
    if list_size is None:
      # Cheap top-level varint walk (C++ when available) — no full parse.
      list_size = parsers.bucket_list_size(
          parsers.elwc_list_sizes(serialized_elwcs).max())
    parsed = parsers.parse_with_native_fallback(
        serialized_elwcs, self.context_feature_spec,
        self.example_feature_spec, list_size)
    return self._run(parsed)

  def regress(self, serialized_examples: Sequence[bytes]) -> np.ndarray:
    """[B] scores from serialized pointwise tf.Example protos."""
    parsed = parsers.parse_with_native_fallback(
        serialized_examples, self.context_feature_spec,
        self.example_feature_spec, 1, data_format='tf_example')
    return self._run(parsed)[:, 0]

  def score_batch(self, batch) -> np.ndarray:
    """Scores a pre-assembled RankingBatch."""
    return np.asarray(self._apply(self.variables, batch.context,
                                  batch.examples, batch.mask))


def evaluate_dataset(
    model: Any,
    variables: Mapping[str, Any],
    batches,
    metric_fns: Optional[Mapping[str, Any]] = None,
    query_id_feature: Optional[str] = None,
    aggregated_metrics: Optional[Mapping[str, tuple]] = None,
    predictions_csv: Optional[str] = None,
):
  """Standalone evaluation over a RankingBatch stream.

  Computes streaming weighted-mean metrics (the pipeline's eval loop,
  usable without a pipeline), and — when ``query_id_feature`` names a
  context feature — cross-batch aggregated metrics grouped by query id
  plus an optional predictions CSV (the TFR-BERT aggregated evaluation,
  tfrbert_task.py:238-344).

  Returns a dict of metric values (aggregated metrics prefixed 'agg/').
  """
  import jax.numpy as jnp

  from ranking_tpu import train
  from ranking_tpu.ops import aggregated as agg_lib
  from ranking_tpu.ops import metric_registry

  if metric_fns is None:
    metric_fns = {
        'ndcg@5': metric_registry.make_ranking_metric_fn(
            metric_registry.RankingMetricKey.NDCG, topn=5),
        'mrr': metric_registry.make_ranking_metric_fn(
            metric_registry.RankingMetricKey.MRR),
    }
  import optax

  eval_step = jax.jit(train.make_eval_step(metric_fns))
  states = train.init_metric_states(metric_fns)

  # Inference-only TrainState shell (tx/apply_fn are static fields).
  state = train.TrainState(
      step=jnp.zeros((), jnp.int32),
      params=variables['params'],
      batch_stats=variables.get('batch_stats', {}),
      opt_state=(),
      tx=optax.identity(),
      apply_fn=model.apply)

  from ranking_tpu.data.batch import RankingBatch

  acc = agg_lib.PredictionAccumulator() if query_id_feature else None
  for batch in batches:
    model_batch = batch
    if acc is not None:
      if query_id_feature not in batch.context:
        raise ValueError(
            f'query_id_feature {query_id_feature!r} not in batch context '
            f'(features: {sorted(batch.context)})')
      # The query id keys aggregation; it is never a model input.
      ctx = {k: v for k, v in batch.context.items()
             if k != query_id_feature}
      model_batch = RankingBatch(context=ctx, examples=batch.examples,
                                 labels=batch.labels, mask=batch.mask)
    states, logits = eval_step(state, model_batch, states)
    if acc is not None:
      if isinstance(logits, dict):
        raise ValueError(
            'aggregated metrics need single-task logits; evaluate one '
            'task at a time (wrap the model to return that task\'s '
            f'logits) — got tasks {sorted(logits)}')
      qids = np.asarray(batch.context[query_id_feature]).reshape(-1)
      acc.add_batch(qids, np.asarray(batch.labels), np.asarray(logits),
                    np.asarray(batch.mask))
  out = {k: float(np.asarray(v))
         for k, v in train.metric_results(states).items()}
  if acc is not None:
    specs = aggregated_metrics or {
        'mrr': (metric_registry.RankingMetricKey.MRR, None),
        'ndcg@5': (metric_registry.RankingMetricKey.NDCG, 5),
    }
    for name, value in acc.compute(specs).items():
      out[f'agg/{name}'] = value
    if predictions_csv:
      acc.dump_csv(predictions_csv)
  return out
