"""Jitted train / eval step builders.

The hot loop of the framework — the equivalent of the per-replica step Keras
``model.fit`` runs (tensorflow_ranking/python/keras/pipeline.py:561-650) and
the Orbit task's custom ``train_step`` (extension/task.py:254-277), collapsed
into two pure functions over a ``TrainState``:

* ``train_step(state, batch, key) -> (state, metrics)`` — forward, loss,
  grad, optimizer update, batch-stat update.
* ``eval_step(state, batch, metric_states) -> metric_states`` — forward +
  streaming ``MeanState`` updates for every registered metric.

Distribution is by sharding, not by rewriting: batches arrive sharded over
the mesh ``data`` axis, params replicated (tables over ``model``), and XLA
inserts the gradient psum. There is no ``num_replicas_in_sync`` loss scaling
(extension/task.py:259) because the global loss reduction is computed on
global arrays — weighted-mean semantics are exact, not approximated per
replica.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from ranking_tpu.data.batch import RankingBatch
from ranking_tpu.ops.metric_registry import MeanState
from ranking_tpu.utils import list_ops

Array = jax.Array
LossFn = Callable[..., Array]
MetricFn = Callable[..., Tuple[Array, Array]]


def _masked_mean(values: Array, mask: Array) -> Array:
  mask = mask.astype(jnp.float32)
  # Multi-unit heads (ordinal/multiclass/click-EM: [B, L, units] logits)
  # broadcast the [B, L] mask over the trailing unit axes.
  if values.ndim > mask.ndim:
    mask = mask.reshape(mask.shape + (1,) * (values.ndim - mask.ndim))
  denom = jnp.maximum(jnp.sum(jnp.broadcast_to(mask, values.shape)), 1.0)
  return jnp.sum(values * mask) / denom


def restore_flat_examples(batch: RankingBatch) -> RankingBatch:
  """Restores ``[B*L, ...]`` example features to ``[B, L, ...]``.

  The host side of the pair is ``data.dataset.flatten_examples``: feeding
  the flattened layout lets XLA place the entry argument directly in the
  tiled layout the tower matmuls want. A ``[B, L, F]`` device entry can
  never be that layout — TPU tiling applies to the two minormost dims,
  so every 3-D choice pads ``L`` to the 128-lane tile (200 -> 256 at the
  flagship shape) and the step pays a physical re-tile copy
  (~7-8% of the bf16 step, round-5 measurement; the in-jit reshape here
  cancels against the scorer's own flatten and costs nothing).

  A leaf is restored iff its leading axis is ``B*L`` (mask gives B, L);
  with L > 1 that cannot collide with a legal unflattened feature, whose
  leading axis is ``B``. L == 1 batches are returned untouched ([B*L,
  ...] and [B, L, ...] are the same bytes there and the 3-D re-tile this
  feature removes does not arise). No-op for already-listwise batches.
  """
  b, l = batch.mask.shape
  if l <= 1:
    return batch
  examples = {
      k: (v.reshape((b, l) + tuple(v.shape[1:]))
          if v.ndim >= 1 and v.shape[0] == b * l else v)
      for k, v in batch.examples.items()}
  return batch.replace(examples=examples)


def _forward(state, batch: RankingBatch, training: bool,
             rngs: Optional[Mapping[str, Array]] = None,
             params: Optional[Any] = None):
  """Applies the model; returns (logits, new_batch_stats)."""
  variables = {'params': state.params if params is None else params}
  if state.batch_stats:
    variables['batch_stats'] = state.batch_stats
  mutable = ['batch_stats'] if (training and state.batch_stats) else False
  out = state.apply_fn(
      variables, batch.context, batch.examples, batch.mask,
      training=training, rngs=dict(rngs) if rngs else None, mutable=mutable)
  if mutable:
    logits, updated = out
    return logits, updated.get('batch_stats', state.batch_stats)
  return out, state.batch_stats


def _make_total_loss(loss_fn, multi_task_weights):
  """Single or dict-of-task loss -> scalar total-loss closure."""
  if (isinstance(loss_fn, Mapping) and multi_task_weights
      and not set(multi_task_weights) <= set(loss_fn)):
    # A typo'd task name would otherwise be silently ignored (every real
    # task defaults to weight 1.0 and the entry is never consulted).
    raise ValueError(
        f'multi_task_weights names unknown tasks '
        f'{sorted(set(multi_task_weights) - set(loss_fn))}; '
        f'tasks are {sorted(loss_fn)}')

  def _total_loss(labels, logits, features, key):
    if isinstance(loss_fn, Mapping):
      total = jnp.zeros((), jnp.float32)
      for i, (task, fn) in enumerate(sorted(loss_fn.items())):
        w = 1.0 if not multi_task_weights else multi_task_weights.get(task, 1.)
        sub_key = None if key is None else jax.random.fold_in(key, i)
        total = total + w * fn(labels[task], logits[task], features=features,
                               key=sub_key)
      return total
    return loss_fn(labels, logits, features=features, key=key)

  return _total_loss


def _sanity_metrics(loss, batch: RankingBatch, logits) -> Dict[str, Array]:
  """Loss + labels/logits means mirroring the reference head
  (python/head.py:216-223)."""
  ref_logits = (logits if not isinstance(logits, dict)
                else next(iter(sorted(logits.items())))[1])
  ref_labels = (batch.labels if not isinstance(batch.labels, dict)
                else next(iter(sorted(batch.labels.items())))[1])
  return {
      'loss': loss,
      'labels_mean': _masked_mean(ref_labels, batch.mask),
      'logits_mean': _masked_mean(ref_logits, batch.mask),
  }


def make_train_step(
    loss_fn: LossFn,
    multi_task_weights: Optional[Mapping[str, float]] = None,
) -> Callable[..., Tuple[Any, Dict[str, Array]]]:
  """Builds ``train_step(state, batch, key) -> (state, metrics)``.

  ``loss_fn(labels, logits, features=None, key=None) -> scalar`` as built by
  ``ops.make_loss_fn``; for multi-task models pass a dict
  ``{task: loss_fn}`` and the batch carries dict labels (the analog of
  MultiTaskPipeline, keras/pipeline.py:733-830).
  """

  _total_loss = _make_total_loss(loss_fn, multi_task_weights)

  def train_step(state, batch: RankingBatch, key: Array):
    batch = restore_flat_examples(batch)
    dropout_key, noise_key, shuffle_key, loss_key = jax.random.split(
        jax.random.fold_in(key, state.step), 4)

    def _loss(params):
      logits, new_stats = _forward(
          state, batch, training=True,
          rngs={'dropout': dropout_key, 'noise': noise_key,
                'shuffle': shuffle_key}, params=params)
      loss = _total_loss(batch.labels, logits, batch.features, loss_key)
      return loss, (logits, new_stats)

    (loss, (logits, new_stats)), grads = jax.value_and_grad(
        _loss, has_aux=True)(state.params)
    state = state.apply_gradients(grads, batch_stats=new_stats)
    return state, _sanity_metrics(loss, batch, logits)

  return train_step


def make_sparse_train_step(
    loss_fn: LossFn,
    embed_features: Any,
    multi_task_weights: Optional[Mapping[str, float]] = None,
) -> Callable[..., Tuple[Any, Dict[str, Array]]]:
  """Train step whose embedding gradients never materialize densely.

  The standard step differentiates through ``table[ids]``, whose backward
  is a scatter-add into a dense ``[vocab, dim]`` zero tensor — O(vocab)
  HBM traffic per step even when a batch touches a few thousand rows, the
  same cost profile that makes naive TF training of large embedding
  columns infeasible (the reference instead relies on
  ``tf.IndexedSlices``, python/feature.py:79-133). This step is the
  TPU-native equivalent of that sparse path, with strictly batch-bounded
  cost:

  1. each declared id feature is deduplicated with one 1-D sort
     (``sparse.compact_unique``) and remapped to batch-local slots;
  2. the touched table rows are gathered into a ``[K, dim]`` slab
     (K = ids per batch, static) and the embedding modules are redirected
     onto it via ``flax.linen.intercept_methods`` — the model runs
     unmodified, but its lookup reads the slab with slot ids;
  3. gradients are taken w.r.t. the slab (backward = scatter-add into
     K rows, not vocab) and applied with ``LazyAdam.update_rows`` —
     gather/step/scatter of K rows of param/m/v state.

  Requires ``state.sparse_tx`` (a ``train.sparse.LazyAdam``) and that
  every ``embed_features`` entry's ``param_path`` matches its
  ``table_pattern``. Tables not declared in ``embed_features`` would get
  no gradient at all, so construction fails loudly if any sparse table is
  left uncovered. Semantics equal the dense-grad LazyAdam path exactly
  (tests/test_sparse_step.py); only the cost changes: O(K·dim + vocab·0)
  instead of O(vocab·dim) per step.
  """
  import dataclasses as _dc

  import flax.linen as nn

  from ranking_tpu.models import embeddings as emb_lib
  from ranking_tpu.train import sparse as sparse_lib

  embed_features = tuple(embed_features)
  _total_loss = _make_total_loss(loss_fn, multi_task_weights)

  from ranking_tpu.parallel import embedding as sharded_emb_lib

  def _interceptor(rows_by_path):
    def interceptor(next_fn, args, kwargs, context):
      mod = context.module
      # The sharded encoder is redirected too: its heavy row-sharded
      # table never enters the differentiated graph — the gathered slab
      # (one collective gather per step, outside autodiff) replaces the
      # per-token shard_map lookup entirely.
      if (context.method_name == '__call__' and
          isinstance(mod, (emb_lib.EmbeddingEncoder,
                           emb_lib.HashEmbeddingEncoder,
                           sharded_emb_lib.ShardedEmbeddingEncoder))):
        path = '/'.join(tuple(mod.path) + ('embedding',))
        rows = rows_by_path.get(path)
        if rows is not None:
          ids = args[0] if args else kwargs['ids']
          # ids are already batch-local slots (and pre-hashed for the
          # hash encoder); padding stays negative for the pooling mask.
          return emb_lib.pooled_lookup(rows, ids, mod.combiner)
      if (context.method_name == '__call__'
          and isinstance(mod, nn.Embed)):
        # Plain token-embedding lookup (e.g. the encoder's token_embed,
        # TFR-BERT's 23M-param table): same redirection, no pooling.
        path = '/'.join(tuple(mod.path) + ('embedding',))
        rows = rows_by_path.get(path)
        if rows is not None:
          ids = args[0] if args else next(iter(kwargs.values()))
          return jnp.take(rows.astype(mod.dtype or rows.dtype), ids,
                          axis=0)
      return next_fn(*args, **kwargs)

    return interceptor

  def train_step(state, batch: RankingBatch, key: Array):
    if state.sparse_tx is None:
      raise ValueError('make_sparse_train_step requires a TrainState built '
                       'with sparse_tx (train.sparse.LazyAdam or '
                       'LazyAdagrad)')
    batch = restore_flat_examples(batch)
    dropout_key, noise_key, shuffle_key, loss_key = jax.random.split(
        jax.random.fold_in(key, state.step), 4)
    dense_params, sp_params = sparse_lib.partition(state.params,
                                                   state.sparse_tx)
    declared = {ef.param_path for ef in embed_features}
    uncovered = set(sp_params) - declared
    if uncovered:
      raise ValueError(
          f'sparse tables with no declared id feature: {sorted(uncovered)}; '
          'declare them in embed_features or narrow table_pattern')
    unknown = declared - set(sp_params)
    if unknown:
      # Without this, a typo'd param_path dies later as a bare KeyError
      # with no hint that embed_features is the thing to fix.
      raise ValueError(
          f'embed_features declare param_paths that match no sparse table: '
          f'{sorted(unknown)}; sparse tables are {sorted(sp_params)}')

    context = dict(batch.context)
    examples = dict(batch.examples)
    rows: Dict[str, Array] = {}
    info: Dict[str, Tuple[Array, Array]] = {}
    # Features sharing one table (several id columns over one vocabulary)
    # must share one dedup + slab: per-feature slabs would overwrite each
    # other in rows[param_path] and silently cross their slot ids.
    by_path: Dict[str, list] = {}
    for ef in embed_features:
      by_path.setdefault(ef.param_path, []).append(ef)
    # One feature feeding two tables cannot be expressed: the remap below
    # rewrites the feature to batch-local slot ids for ITS table, so a
    # second table reading the same feature would dedup slot values as if
    # they were raw ids and train garbage rows with no error.
    seen_feats: Dict[Tuple[str, str], str] = {}
    for path, group in by_path.items():
      for ef in group:
        k = (ef.source, ef.feature)
        if k in seen_feats and seen_feats[k] != path:
          raise ValueError(
              f'feature {ef.feature!r} ({ef.source}) feeds two sparse '
              f'tables ({seen_feats[k]!r} and {path!r}); the sparse step '
              'rewrites features to per-table slot ids, so each feature '
              'can feed one table — duplicate the feature under another '
              'name, or train those tables with the dense-grad path')
        seen_feats[k] = path
    for path, group in by_path.items():
      ids_list = []
      for ef in group:
        # Read RAW ids from the original batch: `context`/`examples` are
        # progressively rewritten to slot ids, and any second consumer
        # (a loss weights_feature, a raw scorer input) must never see a
        # remap — batch2 only carries remaps for the declared features.
        src = batch.context if ef.source == 'context' else batch.examples
        ids = src[ef.feature]
        # Ids must index the table: reduce modulo num_buckets (hash
        # encoders), defaulting to the table's own row count — for
        # HashEmbeddingEncoder the table IS [num_buckets, dim], so this
        # reproduces its jnp.mod exactly even when EmbedFeature was
        # derived without bucket info (pinned by
        # test_sparse_step_hash_encoder_without_declared_buckets). This
        # also keeps every deduplicated id in range for the slab gather
        # and the row scatter. Known asymmetry: a DIRECT-index table fed
        # an out-of-range id (a bug upstream) mods here but clips in the
        # dense path's pooled_lookup — hash encoders, where raw ids
        # beyond the table are NORMAL, take precedence because the step
        # cannot tell the encoder kinds apart from params alone.
        modulus = ef.num_buckets or sp_params[path].shape[0]
        ids_list.append(jnp.where(ids >= 0, jnp.mod(ids, modulus), ids))
      flat = jnp.concatenate([i.reshape(-1) for i in ids_list])
      uids, remap, filled = sparse_lib.compact_unique(flat)
      offset = 0
      for ef, ids in zip(group, ids_list):
        src = context if ef.source == 'context' else examples
        n = ids.size
        src[ef.feature] = jax.lax.dynamic_slice_in_dim(
            remap, offset, n).reshape(ids.shape)
        offset += n
      rows[path] = jnp.take(sp_params[path], uids, axis=0)
      info[path] = (uids, filled)
    batch2 = _dc.replace(batch, context=context, examples=examples)

    def _loss(dparams, rows_in):
      with nn.intercept_methods(_interceptor(rows_in)):
        logits, new_stats = _forward(
            state, batch2, training=True,
            rngs={'dropout': dropout_key, 'noise': noise_key,
                  'shuffle': shuffle_key}, params=dparams)
      loss = _total_loss(batch2.labels, logits, batch2.features, loss_key)
      return loss, (logits, new_stats)

    (loss, (logits, new_stats)), (dgrads, rgrads) = jax.value_and_grad(
        _loss, argnums=(0, 1), has_aux=True)(dense_params, rows)

    import optax
    updates, new_opt_state = state.tx.update(dgrads, state.opt_state,
                                             dense_params)
    new_dense = optax.apply_updates(dense_params, updates)
    row_grads = {p: (info[p][0], rgrads[p], info[p][1]) for p in rows}
    new_sparse, new_sparse_state = state.sparse_tx.update_rows(
        row_grads, state.sparse_opt_state, sp_params, row_params=rows)
    state = state.replace(
        step=state.step + 1,
        params=sparse_lib.merge(state.params, new_dense, new_sparse),
        opt_state=new_opt_state,
        sparse_opt_state=new_sparse_state,
        batch_stats=new_stats)
    return state, _sanity_metrics(loss, batch, logits)

  return train_step


def make_multi_step(
    train_step: Callable[..., Tuple[Any, Dict[str, Array]]],
) -> Callable[..., Tuple[Any, Dict[str, Array]]]:
  """Wraps a train_step to run K steps per dispatch via ``lax.scan``.

  The TPU-native analog of the reference's ``steps_per_execution`` knob
  (keras/pipeline.py:287-289): the host dispatches once per K steps, hiding
  host->device latency. The batch argument gains a leading steps axis
  (stack K batches); returned metrics are per-step ``[K]`` arrays.
  """

  def multi_step(state, stacked_batch: RankingBatch, key: Array):
    def body(carry, batch):
      new_state, metrics = train_step(carry, batch, key)
      return new_state, metrics

    return jax.lax.scan(body, state, stacked_batch)

  return multi_step


def make_eval_step(
    metric_fns: Mapping[str, MetricFn],
    loss_fn: Optional[Any] = None,
    multi_task_weights: Optional[Mapping[str, float]] = None,
) -> Callable[..., Tuple[Dict[str, MeanState], Any]]:
  """Builds ``eval_step(state, batch, metric_states) -> (states, logits)``.

  ``metric_fns`` maps display name -> fn from ``ops.make_ranking_metric_fn``.
  For multi-task models, names of the form ``task/metric`` route to that
  task's logits/labels; an unknown ``task/`` prefix raises (a typo must not
  silently score the wrong head). Names without a ``/`` separator use the
  first task. Metric states are ``MeanState`` pytrees — pure functional
  analogs of ``tf.keras.metrics.Mean`` variables (keras/metrics.py:156-200)
  that also ``psum`` across hosts.

  If ``loss_fn`` is given (same shape as make_train_step's: a single fn or a
  ``{task: fn}`` dict), a reserved ``'loss'`` state streams the validation
  loss — the ``val_loss`` quantity the reference's ReduceLROnPlateau and
  best-export callbacks monitor (keras/pipeline.py:497-517).
  """
  if loss_fn is not None and 'loss' in metric_fns:
    raise ValueError("'loss' is reserved for the validation loss state; "
                     'rename the metric.')

  def eval_step(state, batch: RankingBatch,
                metric_states: Dict[str, MeanState],
                num_valid_rows=None):
    """``num_valid_rows``: rows >= this index are shardability padding
    (RankingBatch.pad_to) and get metric weight 0. The distinction
    matters because an all-invalid list is NOT weightless in the
    reference's metric semantics — NDCGMetric gives it value 0, weight
    1 (metrics_impl; oracle-verified) — so padded rows would otherwise
    bias every unweighted metric down. None = every row is real data
    (all-invalid REAL lists then count exactly as the reference
    counts them)."""
    batch = restore_flat_examples(batch)
    logits, _ = _forward(state, batch, training=False)
    # One shared sort order per (scores, mask) across the whole metric
    # suite (plus NDCG's ideal sorts): the default NDCG@1/5/10/full+MRR
    # suite otherwise issues five independent sorts of the same scores —
    # 0.54 ms of a 0.95 ms eval step at B128xL200 (utils/list_ops.py
    # shared_sort_scope; results are bitwise identical).
    with list_ops.shared_sort_scope():
      out, logits = _eval_metrics(state, batch, metric_states, logits,
                                  num_valid_rows)
    return out, logits

  def _eval_metrics(state, batch, metric_states, logits,
                    num_valid_rows=None):
    out = {}
    for name, fn in metric_fns.items():
      if isinstance(logits, dict):
        task, sep, _rest = name.partition('/')
        if sep and task not in logits:
          raise ValueError(
              f'Metric {name!r} routes to unknown task {task!r}; '
              f'model tasks: {sorted(logits)}')
        default_logits = next(iter(sorted(logits.items())))[1]
        task_logits = logits[task] if sep else default_logits
        task_labels = (batch.labels[task]
                       if sep and isinstance(batch.labels, dict)
                       else (next(iter(sorted(batch.labels.items())))[1]
                             if isinstance(batch.labels, dict)
                             else batch.labels))
      else:
        task_logits, task_labels = logits, batch.labels
      values, weights = fn(task_labels, task_logits, features=batch.features)
      if num_valid_rows is not None:
        rows = jnp.arange(weights.shape[0]) < num_valid_rows
        weights = weights * rows.reshape(
            (-1,) + (1,) * (weights.ndim - 1)).astype(weights.dtype)
      out[name] = metric_states[name].update(values, weights)
    if loss_fn is not None:
      # Same reduction as the train step (key=None: fold_in is skipped,
      # so the dict-of-task weighting stays a single implementation —
      # train loss and the streamed val_loss cannot silently diverge).
      loss = _make_total_loss(loss_fn, multi_task_weights)(
          batch.labels, logits, batch.features, None)
      # Weight by the batch's valid-list count so a ragged final batch
      # (drop_remainder=False) contributes proportionally, not equally —
      # the streamed value is then the exact global mean the callbacks
      # (plateau LR, early stop, best export) should see. An all-padding
      # batch (possible under sharded padded eval) gets weight 0 and a
      # zeroed value: its loss over zero valid lists is typically NaN,
      # and 0-weight alone would not stop NaN * 0 from poisoning the
      # running sum.
      n_lists = jnp.sum(jnp.any(batch.mask, axis=-1).astype(jnp.float32))
      loss = jnp.where(n_lists > 0, loss, 0.0)
      out['loss'] = metric_states['loss'].update(loss[None], n_lists[None])
    return out, logits

  return eval_step


def init_metric_states(
    metric_fns: Mapping[str, MetricFn],
    with_loss: bool = False) -> Dict[str, MeanState]:
  states = {name: MeanState.zero() for name in metric_fns}
  if with_loss:
    states['loss'] = MeanState.zero()
  return states


def metric_results(metric_states: Mapping[str, MeanState]) -> Dict[str, Array]:
  return {name: s.result() for name, s in metric_states.items()}
