"""End-to-end pipeline tests: train on bundled reference data, resume from
checkpoint, export, and serving parity (listwise predict == pointwise
regress, the invariant of python/keras/pipeline_test.py:216-238)."""

import os

import numpy as np
import pytest

from ranking_tpu import models, ops, pipeline
from ranking_tpu.data import FixedLenFeature, VarLenFeature, proto

REF_DATA = '/root/reference/tensorflow_ranking/examples/data'


def _specs():
  context_spec = {
      'query_tokens': VarLenFeature(dtype='string', max_len=6,
                                    hash_buckets=100)}
  example_spec = {
      'document_tokens': VarLenFeature(dtype='string', max_len=20,
                                       hash_buckets=100),
      'relevance': FixedLenFeature(shape=(), dtype='int64', default_value=0)}
  return context_spec, example_spec


def _model():
  return models.RankingModel(
      scorer=models.EmbeddingDNNScorer(
          hidden_layer_dims=(16, 8),
          vocab_sizes={'query_tokens': 100, 'document_tokens': 100},
          embedding_dim=4,
          dropout=0.0,
          use_batch_norm=False))


def _hparams(tmp_path, **kw):
  defaults = dict(
      model_dir=str(tmp_path / 'model'),
      num_epochs=2,
      steps_per_epoch=3,
      validation_steps=2,
      learning_rate=0.05,
      loss=ops.RankingLossKey.SOFTMAX_LOSS,
      mesh_data=None)
  defaults.update(kw)
  return pipeline.PipelineHparams(**defaults)


def _builder():
  context_spec, example_spec = _specs()
  return pipeline.SimpleDatasetBuilder(
      context_spec, example_spec,
      pipeline.DatasetHparams(
          train_input_pattern=f'{REF_DATA}/train_elwc.tfrecord',
          valid_input_pattern=f'{REF_DATA}/eval_elwc.tfrecord',
          train_batch_size=4,
          valid_batch_size=4,
          list_size=5,
          shuffle_buffer_size=10),
      seed=3)


def test_simple_pipeline_end_to_end(tmp_path):
  pipe = pipeline.SimplePipeline(_model(), _builder(), _hparams(tmp_path))
  history = pipe.train_and_validate()
  assert np.isfinite(history['loss'])
  for name in ('ndcg@1', 'ndcg@5', 'ndcg@10', 'ndcg'):
    assert 0.0 <= history[name] <= 1.0
  assert history['examples_per_sec'] > 0
  assert int(pipe.final_state.step) == 6
  # Metrics log written.
  assert (tmp_path / 'model' / 'metrics.jsonl').exists()


def test_pipeline_bucketed_dynamic_list_size(tmp_path):
  """list_size=None: bucketed dynamic lists through the full pipeline
  (python engine; the spe>1 multi-step stack is auto-disabled because
  consecutive batches can land in different buckets)."""
  context_spec, example_spec = _specs()
  builder = pipeline.SimpleDatasetBuilder(
      context_spec, example_spec,
      pipeline.DatasetHparams(
          train_input_pattern=f'{REF_DATA}/train_elwc.tfrecord',
          valid_input_pattern=f'{REF_DATA}/eval_elwc.tfrecord',
          train_batch_size=4,
          valid_batch_size=4,
          list_size=None,
          shuffle_buffer_size=10),
      seed=3)
  pipe = pipeline.SimplePipeline(
      _model(), builder, _hparams(tmp_path, steps_per_execution=4))
  history = pipe.train_and_validate()
  assert np.isfinite(history['loss'])
  assert int(pipe.final_state.step) == 6
  # The stream really is bucketed: batch list sizes are ladder values.
  sizes = {b.labels.shape[1] for _, b in zip(range(3),
                                             builder.train_batches())}
  from ranking_tpu.data.parsers import bucket_list_size
  assert all(s == bucket_list_size(s) for s in sizes)


def test_pipeline_resumes_from_checkpoint(tmp_path):
  pipe = pipeline.SimplePipeline(_model(), _builder(), _hparams(tmp_path))
  pipe.train_and_validate()
  assert int(pipe.final_state.step) == 6
  # A new pipeline over the same model_dir resumes at step 6 and runs to 9.
  pipe2 = pipeline.SimplePipeline(
      _model(), _builder(), _hparams(tmp_path, num_epochs=3))
  pipe2.train_and_validate()
  assert int(pipe2.final_state.step) == 9


def test_lr_schedule_and_clipping(tmp_path):
  """lr_schedule: warmup + linear decay per the reference TFR-BERT
  recipe (tfrbert_antique_train_config.yaml:23-39: polynomial power 1 to
  0, ~10% warmup), cosine variant, gradient_clip_norm, and the guards
  (plateau exclusivity, lazy-optimizer constant-LR-only)."""
  from ranking_tpu.pipeline.hparams import (lr_schedule_from_hparams,
                                            optimizer_from_hparams,
                                            sparse_optimizer_from_hparams)

  def hp(**kw):
    return _hparams(tmp_path, **kw)

  # Constant stays a float (optax factories take either).
  assert lr_schedule_from_hparams(hp()) == 0.05

  # Warmup + linear decay: ramp 0 -> lr over warmup, then linear to end.
  sched = lr_schedule_from_hparams(hp(
      num_epochs=10, steps_per_epoch=10, lr_schedule='linear_decay',
      warmup_steps=10, end_learning_rate=0.0))
  assert np.isclose(float(sched(0)), 0.0)
  assert np.isclose(float(sched(5)), 0.025)
  assert np.isclose(float(sched(10)), 0.05)
  mid = float(sched(55))  # halfway through the 90 decay steps
  assert 0.0 < mid < 0.05
  assert np.isclose(float(sched(100)), 0.0, atol=1e-9)

  sched = lr_schedule_from_hparams(hp(
      num_epochs=10, steps_per_epoch=10, lr_schedule='cosine_decay'))
  assert np.isclose(float(sched(0)), 0.05)
  assert float(sched(100)) < 1e-8

  with pytest.raises(ValueError, match='Unknown lr_schedule'):
    lr_schedule_from_hparams(hp(lr_schedule='exponential'))
  with pytest.raises(ValueError, match='mutually'):
    lr_schedule_from_hparams(hp(lr_schedule='linear_decay',
                                automatic_reduce_lr=True))
  with pytest.raises(ValueError, match='constant learning rate only'):
    sparse_optimizer_from_hparams(hp(optimizer='lazy_adam',
                                     lr_schedule='linear_decay'))

  # Clipping: a huge gradient updates by at most ~clip_norm * lr (sgd).
  import jax.numpy as jnp
  import optax
  tx = optimizer_from_hparams(hp(optimizer='sgd', learning_rate=1.0,
                                 gradient_clip_norm=1.0))
  params = {'w': jnp.zeros(4)}
  grads = {'w': jnp.full(4, 1e6)}
  updates, _ = tx.update(grads, tx.init(params), params)
  assert np.isclose(float(jnp.linalg.norm(updates['w'])), 1.0, rtol=1e-5)

  # Plateau + clipping compose: hyperparams stays the top-level state.
  tx = optimizer_from_hparams(hp(automatic_reduce_lr=True,
                                 gradient_clip_norm=1.0))
  state = tx.init(params)
  assert 'learning_rate' in state.hyperparams


def test_pipeline_trains_with_lr_schedule(tmp_path):
  pipe = pipeline.SimplePipeline(
      _model(), _builder(),
      _hparams(tmp_path, lr_schedule='linear_decay', warmup_steps=2,
               gradient_clip_norm=5.0))
  history = pipe.train_and_validate()
  assert np.isfinite(history['loss'])
  assert int(pipe.final_state.step) == 6


def test_resume_dataset_bitwise_identical(tmp_path):
  """hparams.resume_dataset: interrupted-and-resumed training consumes
  exactly the uninterrupted run's batch sequence (the stream is seed-
  deterministic, the restore fast-forwards it one batch per completed
  step), so the final params are BITWISE equal to a straight run. The
  reference's BackupAndRestore restarts the dataset instead
  (keras/pipeline.py:493-495)."""
  import jax

  # Straight run: 2 epochs x 3 steps, no interruption.
  straight = pipeline.SimplePipeline(
      _model(), _builder(), _hparams(tmp_path / 'straight',
                                     resume_dataset=True))
  straight.train_and_validate()
  assert int(straight.final_state.step) == 6

  # Interrupted: 1 epoch, checkpoint at step 3; then resume to 2 epochs.
  pipeline.SimplePipeline(
      _model(), _builder(), _hparams(tmp_path / 'resumed', num_epochs=1,
                                     resume_dataset=True)
  ).train_and_validate()
  resumed = pipeline.SimplePipeline(
      _model(), _builder(), _hparams(tmp_path / 'resumed', num_epochs=2,
                                     resume_dataset=True))
  resumed.train_and_validate()
  assert int(resumed.final_state.step) == 6

  flat_a = jax.tree_util.tree_leaves_with_path(straight.final_state.params)
  flat_b = dict(jax.tree_util.tree_leaves_with_path(
      resumed.final_state.params))
  assert flat_a
  for path, leaf in flat_a:
    np.testing.assert_array_equal(
        np.asarray(leaf), np.asarray(flat_b[path]),
        err_msg=f'param {jax.tree_util.keystr(path)} diverged on resume')


def test_serving_parity_listwise_vs_pointwise(tmp_path):
  context_spec, example_spec = _specs()
  pipe = pipeline.SimplePipeline(_model(), _builder(), _hparams(tmp_path))
  pipe.train_and_validate()

  predictor = pipeline.Predictor(
      _model(), pipe.final_state.variables, context_spec, example_spec,
      list_size=None, label_feature_name='relevance')

  # Build an ELWC by hand; its docs as pointwise examples must score equal.
  docs = [{'document_tokens': ['hello', 'world'], 'relevance': [1]},
          {'document_tokens': ['foo'], 'relevance': [0]},
          {'document_tokens': ['bar', 'baz', 'qux'], 'relevance': [2]}]
  ctx = {'query_tokens': ['some', 'query']}
  elwc = proto.make_elwc(ctx, docs).SerializeToString()
  listwise = predictor.predict([elwc])[0]

  pointwise_protos = [
      proto.make_example({**ctx, **d}).SerializeToString() for d in docs]
  pointwise = predictor.regress(pointwise_protos)
  np.testing.assert_allclose(listwise[:3], pointwise, rtol=1e-4, atol=1e-5)


def test_predictor_from_export(tmp_path):
  context_spec, example_spec = _specs()
  pipe = pipeline.SimplePipeline(_model(), _builder(), _hparams(tmp_path))
  pipe.train_and_validate()
  predictor = pipeline.Predictor.from_export(
      _model(), str(tmp_path / 'model' / 'export' / 'latest'),
      context_spec, example_spec, label_feature_name='relevance')
  elwc = proto.make_elwc({'query_tokens': ['q']},
                         [{'document_tokens': ['a'], 'relevance': [0]},
                          {'document_tokens': ['b'], 'relevance': [1]}]
                         ).SerializeToString()
  scores = predictor.predict([elwc])
  assert scores.shape == (1, 2)
  assert np.isfinite(scores).all()


def test_multi_task_pipeline(tmp_path):
  context_spec, example_spec = _specs()

  class TwoLabelBuilder(pipeline.SimpleDatasetBuilder):
    def _batches(self, *a, **kw):
      from ranking_tpu.data.batch import RankingBatch
      for b in super()._batches(*a, **kw):
        yield RankingBatch(context=b.context, examples=b.examples,
                           labels={'rel': b.labels, 'click': b.labels},
                           mask=b.mask)

  builder = TwoLabelBuilder(
      context_spec, example_spec,
      pipeline.DatasetHparams(
          train_input_pattern=f'{REF_DATA}/train_elwc.tfrecord',
          valid_input_pattern=f'{REF_DATA}/eval_elwc.tfrecord',
          train_batch_size=4, valid_batch_size=4, list_size=5), seed=0)

  model = models.RankingModel(
      scorer=models.MultiTaskScorer(
          task_names=('rel', 'click'), hidden_layer_dims=(8,),
          dropout=0.0, use_batch_norm=False))
  hp = _hparams(
      tmp_path, num_epochs=1,
      loss={'rel': ops.RankingLossKey.SOFTMAX_LOSS,
            'click': ops.RankingLossKey.SIGMOID_CROSS_ENTROPY_LOSS},
      loss_weights={'rel': 1.0, 'click': 0.5})
  # MultiTaskScorer embeds nothing — drop token features to dense-only.
  class DenseOnly(TwoLabelBuilder):
    def _batches(self, *a, **kw):
      from ranking_tpu.data.batch import RankingBatch
      for b in super()._batches(*a, **kw):
        dense = {'dt_float': b.examples['document_tokens'].astype(np.float32)}
        yield RankingBatch(context={}, examples=dense, labels=b.labels,
                           mask=b.mask)

  builder = DenseOnly(
      context_spec, example_spec,
      pipeline.DatasetHparams(
          train_input_pattern=f'{REF_DATA}/train_elwc.tfrecord',
          valid_input_pattern=f'{REF_DATA}/eval_elwc.tfrecord',
          train_batch_size=4, valid_batch_size=4, list_size=5), seed=0)
  pipe = pipeline.MultiTaskPipeline(model, builder, hp)
  history = pipe.train_and_validate()
  assert np.isfinite(history['loss'])
  assert 0.0 <= history['rel/ndcg@5'] <= 1.0
  assert 0.0 <= history['click/ndcg'] <= 1.0


def test_hparams_from_yaml(tmp_path):
  cfg = tmp_path / 'config.yaml'
  cfg.write_text("""
pipeline:
  model_dir: /tmp/m
  num_epochs: 2
  steps_per_epoch: 5
  validation_steps: 3
  learning_rate: 0.01
  loss: softmax_loss
  steps_per_execution: 1
dataset:
  train_input_pattern: train*
  valid_input_pattern: valid*
  train_batch_size: 8
  valid_batch_size: 8
  list_size: 50
""")
  hp, ds = pipeline.from_yaml(str(cfg))
  assert hp.num_epochs == 2 and hp.loss == 'softmax_loss'
  assert ds.list_size == 50

  bad = tmp_path / 'bad.yaml'
  bad.write_text('pipeline: {model_dir: /tmp, bogus_key: 1}')
  with pytest.raises(ValueError):
    pipeline.from_yaml(str(bad))


def test_predict_buckets_dynamic_list_sizes(tmp_path):
  context_spec, example_spec = _specs()
  pipe = pipeline.SimplePipeline(_model(), _builder(),
                                 _hparams(tmp_path, num_epochs=1))
  pipe.train_and_validate()
  predictor = pipeline.Predictor(
      _model(), pipe.final_state.variables, context_spec, example_spec,
      list_size=None, label_feature_name='relevance')
  docs3 = [{'document_tokens': ['a'], 'relevance': [0]}] * 3
  docs5 = [{'document_tokens': ['b'], 'relevance': [1]}] * 5
  out3 = predictor.predict([proto.make_elwc({'query_tokens': ['q']},
                                            docs3).SerializeToString()])
  out5 = predictor.predict([proto.make_elwc({'query_tokens': ['q']},
                                            docs5).SerializeToString()])
  # Half-step power-of-two ladder (1, 2, 3, 4, 6, 8, 12, ...): 3 -> 3,
  # 5 -> 6.
  assert out3.shape == (1, 3)
  assert out5.shape == (1, 6)
  assert np.isfinite(out3[:, :3]).all()


def test_profile_epoch_writes_trace(tmp_path):
  pipe = pipeline.SimplePipeline(
      _model(), _builder(),
      _hparams(tmp_path, num_epochs=1,
               profile_dir=str(tmp_path / 'trace')))
  pipe.train_and_validate()
  import glob
  assert glob.glob(str(tmp_path / 'trace' / '**' / '*.xplane.pb'),
                   recursive=True)


def test_evaluate_dataset_with_aggregation(tmp_path):
  context_spec, example_spec = _specs()
  pipe = pipeline.SimplePipeline(_model(), _builder(),
                                 _hparams(tmp_path, num_epochs=1))
  pipe.train_and_validate()

  # Attach synthetic query ids to the context so aggregation has a key.
  from ranking_tpu.data.batch import RankingBatch

  def batches_with_qids():
    for i, b in enumerate(_builder().valid_batches()):
      qids = np.arange(i * b.batch_size, (i + 1) * b.batch_size)
      ctx = dict(b.context)
      ctx['query_id'] = qids
      yield RankingBatch(context=ctx, examples=b.examples,
                         labels=b.labels, mask=b.mask)

  out = pipeline.evaluate_dataset(
      _model(), pipe.final_state.variables, batches_with_qids(),
      query_id_feature='query_id',
      predictions_csv=str(tmp_path / 'preds.csv'))
  assert 0.0 <= out['ndcg@5'] <= 1.0
  assert 'agg/mrr' in out and 'agg/ndcg@5' in out
  assert (tmp_path / 'preds.csv').exists()


def test_tensorboard_events_written_and_readable(tmp_path):
  pipe = pipeline.SimplePipeline(_model(), _builder(),
                                 _hparams(tmp_path, num_epochs=1))
  pipe.train_and_validate()
  import glob
  events = glob.glob(str(tmp_path / 'model' / 'tensorboard' /
                         'events.out.tfevents.*'))
  assert events
  # Round-trip through TensorFlow's own event reader when available.
  try:
    import tensorflow as tf
  except ImportError:
    return
  tags = set()
  for rec in tf.compat.v1.train.summary_iterator(events[0]):
    for v in rec.summary.value:
      tags.add(v.tag)
  assert 'loss' in tags and 'ndcg@5' in tags


def test_reduce_lr_on_plateau(tmp_path):
  # Near-zero learning rate -> the loss plateaus immediately -> the lr
  # must decay 0.1x after the 10-epoch plateau patience.
  hp = _hparams(tmp_path, num_epochs=12, steps_per_epoch=1,
                validation_steps=1, learning_rate=1e-9,
                automatic_reduce_lr=True)
  pipe = pipeline.SimplePipeline(_model(), _builder(), hp)
  pipe.train_and_validate()
  lr = float(np.asarray(
      pipe.final_state.opt_state.hyperparams['learning_rate']))
  assert lr < 1e-9 * 0.2  # at least one 0.1x reduction applied


def test_weighted_metrics_and_reduction_knobs(tmp_path):
  from ranking_tpu.data.batch import RankingBatch

  class WeightedBuilder(pipeline.SimpleDatasetBuilder):
    def _batches(self, *a, **kw):
      rng = np.random.RandomState(5)
      for b in super()._batches(*a, **kw):
        ex = dict(b.examples)
        ex['doc_w'] = (rng.rand(*b.labels.shape) + 0.5).astype(np.float32)
        yield RankingBatch(context=b.context, examples=ex,
                           labels=b.labels, mask=b.mask)

  context_spec, example_spec = _specs()
  builder = WeightedBuilder(
      context_spec, example_spec,
      pipeline.DatasetHparams(
          train_input_pattern=f'{REF_DATA}/train_elwc.tfrecord',
          valid_input_pattern=f'{REF_DATA}/eval_elwc.tfrecord',
          train_batch_size=4, valid_batch_size=4, list_size=5), seed=0)
  hp = _hparams(tmp_path, num_epochs=1,
                loss_reduction='mean',
                use_weighted_metrics=True,
                weights_feature_name='doc_w')
  pipe = pipeline.SimplePipeline(_model(), builder, hp)
  history = pipe.train_and_validate()
  assert 'weighted_ndcg@5' in history
  assert np.isfinite(history['weighted_ndcg@5'])


def test_best_checkpoint_tracked(tmp_path):
  hp = _hparams(tmp_path, num_epochs=3, export_best_model=True,
                best_exporter_metric='ndcg@5',
                best_exporter_metric_higher_better=True)
  pipe = pipeline.SimplePipeline(_model(), _builder(), hp)
  pipe.train_and_validate()
  best = pipe.ckpt.best_step()
  latest = pipe.ckpt.latest_step()
  assert best is not None and latest == 9
  assert 1 <= best <= 9


def test_best_export_defaults_track_min_val_loss(tmp_path):
  # Footgun fixed in round 2: with defaults (metric='loss'), "best" must be
  # the *lowest* validation loss (reference keras/pipeline.py:327,497-510),
  # not the highest.
  hp = _hparams(tmp_path, num_epochs=3, export_best_model=True)
  assert hp.best_exporter_metric_higher_better is False
  pipe = pipeline.SimplePipeline(_model(), _builder(), hp)
  history = pipe.train_and_validate()
  assert 'val_loss' in history and np.isfinite(history['val_loss'])
  assert pipe.ckpt.best_step() is not None
  # The tracked best value equals the min val_loss seen across epochs.
  import json, os
  log = os.path.join(str(tmp_path / 'model'), 'metrics.jsonl')
  vals = [json.loads(l)['val_loss'] for l in open(log)]
  best_logged = min(vals)
  best_state = pipe.ckpt.best_step()
  steps = [json.loads(l)['step'] for l in open(log)]
  assert steps[vals.index(best_logged)] == best_state


def test_monitoring_unknown_metric_raises(tmp_path):
  hp = _hparams(tmp_path, num_epochs=1, export_best_model=True,
                best_exporter_metric='ndgc@5')  # typo
  pipe = pipeline.SimplePipeline(_model(), _builder(), hp)
  with pytest.raises(ValueError, match='ndgc@5'):
    pipe.train_and_validate()


def test_pipeline_native_loader_engine(tmp_path):
  from ranking_tpu.data import native
  if not native.available():
    pytest.skip('no native toolchain')
  context_spec, example_spec = _specs()
  builder = pipeline.SimpleDatasetBuilder(
      context_spec, example_spec,
      pipeline.DatasetHparams(
          train_input_pattern=f'{REF_DATA}/train_elwc.tfrecord',
          valid_input_pattern=f'{REF_DATA}/eval_elwc.tfrecord',
          train_batch_size=4, valid_batch_size=4, list_size=5,
          dataset_engine='native_loader'), seed=3)
  pipe = pipeline.SimplePipeline(_model(), builder,
                                 _hparams(tmp_path, num_epochs=1))
  history = pipe.train_and_validate()
  assert np.isfinite(history['loss'])


def test_libsvm_pipeline_end_to_end(tmp_path):
  import flax.linen as nn

  builder = pipeline.LibSVMDatasetBuilder(
      train_path=f'{REF_DATA}/train.txt',
      valid_path=f'{REF_DATA}/vali.txt',
      list_size=10, num_features=136, train_batch_size=4)
  from ranking_tpu import models
  model = models.RankingModel(
      scorer=models.DNNScorer(hidden_layer_dims=(16,), dropout=0.0,
                              use_batch_norm=False),
      transform_name='log1p')
  hp = _hparams(tmp_path, num_epochs=1, steps_per_epoch=4,
                validation_steps=3,
                loss=ops.RankingLossKey.PAIRWISE_LOGISTIC_LOSS)
  history = pipeline.SimplePipeline(model, builder, hp).train_and_validate()
  assert np.isfinite(history['loss'])
  assert 0.0 <= history['ndcg@5'] <= 1.0


def test_multilabel_dataset_builder(tmp_path):
  """MultiLabelDatasetBuilder (keras/pipeline.py:1120-1221 analog): dict
  labels parsed from multiple label features, end to end through
  MultiTaskPipeline."""
  from ranking_tpu.data import proto, tfrecord

  # Two-label copy of the bundled data: click = (relevance > 1).
  recs = []
  for rec in tfrecord.read_records(f'{REF_DATA}/train_elwc.tfrecord'):
    elwc = proto.ExampleListWithContext()
    elwc.ParseFromString(rec)
    for ex in elwc.examples:
      rel = ex.features.feature['relevance'].int64_list.value
      ex.features.feature['click'].int64_list.value.append(
          int(bool(rel) and rel[0] > 1))
    recs.append(elwc.SerializeToString())
  path = str(tmp_path / 'two_label.tfrecord')
  tfrecord.write_records(path, recs)

  context_spec, example_spec = _specs()
  example_spec = dict(example_spec)
  example_spec['click'] = FixedLenFeature(shape=(), dtype='int64',
                                          default_value=0)
  builder = pipeline.MultiLabelDatasetBuilder(
      context_spec, example_spec,
      label_spec={'rel': 'relevance', 'click': 'click'},
      hparams=pipeline.DatasetHparams(
          train_input_pattern=path, valid_input_pattern=path,
          train_batch_size=4, valid_batch_size=4, list_size=5), seed=0)

  b = next(iter(builder.train_batches()))
  assert set(b.labels) == {'rel', 'click'}
  assert b.labels['rel'].shape == (4, 5) == b.labels['click'].shape
  # Label features were popped out of the example features.
  assert 'relevance' not in b.examples and 'click' not in b.examples
  # Click is the binarized high-relevance signal, aligned with rel.
  valid = np.asarray(b.mask)
  rel = np.asarray(b.labels['rel'])
  click = np.asarray(b.labels['click'])
  np.testing.assert_array_equal(click[valid], (rel[valid] > 1).astype(
      np.float32))
  np.testing.assert_array_equal(click[~valid], -1.0)

  model = models.RankingModel(
      scorer=models.MultiTaskScorer(
          task_names=('rel', 'click'), hidden_layer_dims=(8,),
          dropout=0.0, use_batch_norm=False))
  hp = _hparams(
      tmp_path, num_epochs=1,
      loss={'rel': ops.RankingLossKey.SOFTMAX_LOSS,
            'click': ops.RankingLossKey.SIGMOID_CROSS_ENTROPY_LOSS},
      loss_weights={'rel': 1.0, 'click': 0.5})
  history = pipeline.MultiTaskPipeline(model, builder, hp).train_and_validate()
  assert np.isfinite(history['loss'])
  assert 'rel/ndcg@5' in history and 'click/ndcg@5' in history


def test_multilabel_dataset_builder_validates_spec():
  context_spec, example_spec = _specs()
  hp = pipeline.DatasetHparams(
      train_input_pattern='x', valid_input_pattern='x',
      train_batch_size=2, valid_batch_size=2, list_size=5)
  with pytest.raises(ValueError, match='label_spec'):
    pipeline.MultiLabelDatasetBuilder(
        context_spec, example_spec, label_spec={}, hparams=hp)
  with pytest.raises(ValueError, match='missing from example_feature_spec'):
    pipeline.MultiLabelDatasetBuilder(
        context_spec, example_spec, label_spec={'t': 'not_there'},
        hparams=hp)


def test_self_contained_export_loads_without_model_code(tmp_path):
  """jax.export artifact (pipeline/export.py): a fresh process loads the
  artifact with NO ranking_tpu.models import and reproduces the live
  Predictor's scores; predict == regress parity holds
  (keras/saved_model.py:24-175, pipeline_test.py:238)."""
  import subprocess
  import sys as _sys

  from ranking_tpu.data import parsers, proto, tfrecord
  from ranking_tpu.data.batch import RankingBatch
  from ranking_tpu.pipeline import export as export_lib
  from ranking_tpu.pipeline.serving import Predictor
  import jax.random as jr

  context_spec, example_spec = _specs()
  model = _model()

  recs = list(tfrecord.read_records(f'{REF_DATA}/train_elwc.tfrecord'))[:6]
  parsed = parsers.parse_example_list(
      recs, context_spec,
      {k: v for k, v in example_spec.items() if k != 'relevance'},
      list_size=4)
  batch = RankingBatch(context=parsed.context, examples=parsed.examples,
                       labels=np.zeros(parsed.mask.shape, np.float32),
                       mask=parsed.mask)
  variables = model.init(jr.PRNGKey(0), batch.context, batch.examples,
                         batch.mask, training=False)

  path = str(tmp_path / 'artifact')
  export_lib.export_predictor(
      model, variables, context_spec, example_spec, path,
      sample_batch=batch, list_size_buckets=(4, 8),
      label_feature_name='relevance')

  live = Predictor(model, variables, context_spec, example_spec,
                   list_size=4, label_feature_name='relevance')
  expected = live.predict(recs)

  # Single-document ELWCs for the regress-parity check.
  elwc0 = proto.ExampleListWithContext()
  elwc0.ParseFromString(recs[0])
  singles = [elwc0.examples[i].SerializeToString()
             for i in range(len(elwc0.examples))]
  single_elwcs = []
  for i in range(len(elwc0.examples)):
    e = proto.ExampleListWithContext()
    e.examples.add().CopyFrom(elwc0.examples[i])
    single_elwcs.append(e.SerializeToString())

  recs_file = tmp_path / 'recs.tfrecord'
  tfrecord.write_records(str(recs_file), recs)
  singles_file = tmp_path / 'singles.tfrecord'
  tfrecord.write_records(str(singles_file), singles)
  selwc_file = tmp_path / 'single_elwcs.tfrecord'
  tfrecord.write_records(str(selwc_file), single_elwcs)
  out_file = tmp_path / 'scores.npz'

  driver = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
import sys
import numpy as np
from ranking_tpu.data import tfrecord
from ranking_tpu.pipeline import export as export_lib

lp = export_lib.load_predictor({path!r})
recs = list(tfrecord.read_records({str(recs_file)!r}))
singles = list(tfrecord.read_records({str(singles_file)!r}))
single_elwcs = list(tfrecord.read_records({str(selwc_file)!r}))
scores = lp.predict(recs)
reg = lp.regress(singles)
pred1 = lp.predict(single_elwcs)
assert 'ranking_tpu.models' not in sys.modules, 'models imported!'
assert lp.predict([]).shape[0] == 0 and lp.regress([]).shape == (0,)
np.savez({str(out_file)!r}, scores=scores, reg=reg, pred1=pred1)
"""
  env = dict(os.environ)
  env.pop('JAX_PLATFORMS', None)
  res = subprocess.run([_sys.executable, '-c', driver], env=env,
                       capture_output=True, text=True, timeout=300)
  assert res.returncode == 0, res.stderr[-3000:]

  with np.load(out_file) as z:
    np.testing.assert_allclose(z['scores'], expected, rtol=1e-5, atol=1e-6)
    # Pointwise regress == single-document listwise predict (bucket 1).
    np.testing.assert_allclose(z['reg'], z['pred1'][:, 0],
                               rtol=1e-5, atol=1e-6)


def test_exported_artifact_bucket_overflow(tmp_path):
  from ranking_tpu.data import parsers, tfrecord
  from ranking_tpu.data.batch import RankingBatch
  from ranking_tpu.pipeline import export as export_lib
  import jax.random as jr

  context_spec, example_spec = _specs()
  model = _model()
  recs = list(tfrecord.read_records(f'{REF_DATA}/train_elwc.tfrecord'))[:2]
  parsed = parsers.parse_example_list(
      recs, context_spec,
      {k: v for k, v in example_spec.items() if k != 'relevance'},
      list_size=1)
  batch = RankingBatch(context=parsed.context, examples=parsed.examples,
                       labels=np.zeros(parsed.mask.shape, np.float32),
                       mask=parsed.mask)
  variables = model.init(jr.PRNGKey(0), batch.context, batch.examples,
                         batch.mask, training=False)
  path = str(tmp_path / 'artifact1')
  export_lib.export_predictor(
      model, variables, context_spec, example_spec, path,
      sample_batch=batch, list_size_buckets=(1,),
      label_feature_name='relevance')
  lp = export_lib.load_predictor(path)
  with pytest.raises(ValueError, match='largest exported bucket'):
    lp.predict(recs)  # bundled lists have 2 docs; only bucket 1 exported


def test_pipeline_tensor_parallel_encoder(tmp_path):
  """SimplePipeline(sharding_rules=ENCODER_TP_RULES) trains dp x tp."""
  from jax.sharding import PartitionSpec as P
  from ranking_tpu import parallel
  from ranking_tpu.models import encoder as enc

  model = models.RankingModel(scorer=enc.EncoderScorer(
      encoder=enc.TransformerEncoder(vocab_size=100, hidden_dim=8,
                                     num_layers=1, num_heads=2, mlp_dim=16,
                                     max_len=20, dropout=0.0),
      dropout=0.0, ids_feature_name='document_tokens'))
  pipe = pipeline.SimplePipeline(
      model, _builder(), _hparams(tmp_path, mesh_model=2),
      sharding_rules=parallel.ENCODER_TP_RULES)
  history = pipe.train_and_validate()
  assert np.isfinite(history['loss'])
  blk = pipe.final_state.params['scorer']['encoder']['block_0']
  # jit normalizes away trailing Nones in the spec.
  q_spec = blk['MultiHeadDotProductAttention_0']['query']['kernel'] \
      .sharding.spec
  assert tuple(q_spec) == (None, 'model'), q_spec
  assert tuple(blk['Dense_0']['kernel'].sharding.spec) == (None, 'model')


def test_exported_artifact_edge_contracts(tmp_path):
  """Empty predict returns the widest bucket; score_batch filters to the
  exported specs; non-dict variable pytrees fail at export time."""
  from ranking_tpu.data import parsers, tfrecord
  from ranking_tpu.data.batch import RankingBatch
  from ranking_tpu.pipeline import export as export_lib
  import dataclasses
  import jax.random as jr

  context_spec, example_spec = _specs()
  model = _model()
  recs = list(tfrecord.read_records(f'{REF_DATA}/train_elwc.tfrecord'))[:2]
  parsed = parsers.parse_example_list(
      recs, context_spec,
      {k: v for k, v in example_spec.items() if k != 'relevance'},
      list_size=4)
  batch = RankingBatch(context=parsed.context, examples=parsed.examples,
                       labels=np.zeros(parsed.mask.shape, np.float32),
                       mask=parsed.mask)
  variables = model.init(jr.PRNGKey(0), batch.context, batch.examples,
                         batch.mask, training=False)
  path = str(tmp_path / 'artifact_edge')
  export_lib.export_predictor(
      model, variables, context_spec, example_spec, path,
      sample_batch=batch, list_size_buckets=(4,),
      label_feature_name='relevance')
  lp = export_lib.load_predictor(path)

  # Empty request: widest exported bucket, stacking with full requests.
  empty = lp.predict([])
  assert empty.shape == (0, 4)
  full = lp.predict(recs)
  assert np.vstack([empty, full]).shape == full.shape

  # score_batch tolerates extra (training-only) feature columns.
  noisy = dataclasses.replace(
      batch, examples={**batch.examples,
                       'relevance': np.zeros(batch.mask.shape + (1,),
                                             np.float32)})
  scores = lp.score_batch(noisy)
  assert scores.shape == batch.mask.shape

  # Non-dict nodes in variables must fail at export, not at load/serve.
  bad = {'params': {'heads': [np.zeros((2, 2), np.float32)]}}
  with pytest.raises(TypeError, match='nested dict'):
    export_lib.export_predictor(
        model, bad, context_spec, example_spec,
        str(tmp_path / 'artifact_bad'), sample_batch=batch,
        list_size_buckets=(4,), label_feature_name='relevance')


def test_export_vocab_non_utf8_tokens_roundtrip(tmp_path):
  """Vocabulary tokens that are not valid UTF-8 survive the JSON manifest."""
  from ranking_tpu.data import parsers
  from ranking_tpu.pipeline import export as export_lib

  vocab = parsers.Vocabulary([b'plain', b'\xe9\xff\x00binary', b'caf\xc3\xa9'],
                             num_oov_buckets=2)
  spec = parsers.VarLenFeature(dtype='string', max_len=4, vocab=vocab)
  d = export_lib.spec_to_json(spec)
  json_text = __import__('json').dumps(d)  # must be JSON-serializable
  back = export_lib.spec_from_json(__import__('json').loads(json_text))
  assert back.vocab._map == vocab._map
  assert back.vocab.lookup(b'\xe9\xff\x00binary') == vocab.lookup(
      b'\xe9\xff\x00binary')


def test_best_tracking_keeps_latest_for_resume(tmp_path):
  """Best-by-metric tracking must not garbage-collect the latest
  checkpoints (regression: Orbax's best_fn retention replaced LatestN,
  so preemption resume rolled training back to the old best step)."""
  hp = _hparams(tmp_path, num_epochs=3, export_best_model=True,
                best_exporter_metric='ndcg@5',
                best_exporter_metric_higher_better=True)
  pipe = pipeline.SimplePipeline(_model(), _builder(), hp)
  pipe.train_and_validate()
  assert pipe.ckpt.latest_step() == 9
  # A fresh pipeline resumes from the true latest step, not the best.
  pipe2 = pipeline.SimplePipeline(
      _model(), _builder(),
      _hparams(tmp_path, num_epochs=4, export_best_model=True,
               best_exporter_metric='ndcg@5',
               best_exporter_metric_higher_better=True))
  pipe2.train_and_validate()
  assert int(pipe2.final_state.step) == 12
  # Both exports exist: latest (final weights) and best (by metric).
  assert (tmp_path / 'model' / 'export' / 'latest').exists()
  assert (tmp_path / 'model' / 'export' / 'best').exists()


def test_tensorboard_zero_valued_scalar_survives(tmp_path):
  """A metric equal to exactly 0.0 must serialize (explicit presence);
  plain proto3 floats elide zero and TensorBoard drops the point."""
  from ranking_tpu.utils import tensorboard as tb
  w = tb.SummaryWriter(str(tmp_path))
  w.scalars(3, {'loss': 0.0, 'ndcg': 0.5})
  w.flush()
  import glob
  events = glob.glob(str(tmp_path / 'events.out.tfevents.*'))
  try:
    import tensorflow as tf
  except ImportError:
    return
  got = {}
  for rec in tf.compat.v1.train.summary_iterator(events[0]):
    for v in rec.summary.value:
      if v.HasField('simple_value'):
        got[v.tag] = v.simple_value
  assert got.get('loss') == 0.0 and abs(got['ndcg'] - 0.5) < 1e-6


def test_export_bfloat16_params_roundtrip():
  """np.savez writes ml_dtypes arrays as raw void ('|V2'); the flatten/
  unflatten pair must tag and view them back (review finding, round 4:
  a bf16-param export previously loaded as V2 and failed at first
  serve)."""
  import tempfile

  import ml_dtypes

  from ranking_tpu.pipeline.export import _flatten_vars, _unflatten_vars

  tree = {'params': {
      'w': np.arange(6, dtype=np.float32).astype(
          ml_dtypes.bfloat16).reshape(2, 3),
      'b': np.ones(3, np.float32)}}
  with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, 'p.npz')
    np.savez(path, **_flatten_vars(tree))
    with np.load(path) as z:
      back = _unflatten_vars({k: z[k] for k in z.files})
  assert back['params']['w'].dtype == ml_dtypes.bfloat16
  np.testing.assert_array_equal(
      back['params']['w'].astype(np.float32),
      tree['params']['w'].astype(np.float32))
  assert back['params']['b'].dtype == np.float32


def test_export_rejects_spec_feature_missing_from_sample(tmp_path):
  """A spec feature absent from the sample batch must fail at EXPORT —
  previously it was silently dropped from the exported avals while the
  manifest still advertised it, crashing at the first production
  predict (review finding, round 4)."""
  import optax

  from ranking_tpu.data import batch as batch_lib
  from ranking_tpu.pipeline import export as export_lib

  spec = {'float_features': FixedLenFeature(shape=(4,), dtype='float32',
                                            default_value=0.0),
          'phantom': FixedLenFeature(shape=(2,), dtype='float32',
                                     default_value=0.0)}
  model = models.RankingModel(scorer=models.DNNScorer(
      hidden_layer_dims=(4,), dropout=0.0, use_batch_norm=False))
  sample = batch_lib.batch_from_labels(
      labels=np.zeros((2, 3), np.float32),
      examples={'float_features': np.zeros((2, 3, 4), np.float32)})
  import jax

  from ranking_tpu import train
  state = train.create_train_state(
      model, optax.adam(1e-3), jax.random.PRNGKey(0),
      sample.context, sample.examples, sample.mask)
  with pytest.raises(ValueError, match='phantom'):
    export_lib.export_predictor(model, state.variables, {}, spec,
                                str(tmp_path / 'x'), sample)


def test_int8_quantized_export(tmp_path):
  """quantize='int8': large float matrices stored as int8 + per-channel
  scales with dequantization baked into the exported graph — the loader
  is unchanged, scores track the f32 artifact, params.npz shrinks."""
  import jax.random as jr

  from ranking_tpu.data import parsers, tfrecord
  from ranking_tpu.data.batch import RankingBatch
  from ranking_tpu.pipeline import export as export_lib

  context_spec, example_spec = _specs()
  # Big enough tables that quantization actually engages (>= _Q_MIN_SIZE).
  model = models.RankingModel(
      scorer=models.EmbeddingDNNScorer(
          hidden_layer_dims=(64, 32),
          vocab_sizes={'query_tokens': 1024, 'document_tokens': 1024},
          embedding_dim=16, dropout=0.0, use_batch_norm=False))

  recs = list(tfrecord.read_records(f'{REF_DATA}/train_elwc.tfrecord'))[:6]
  parsed = parsers.parse_example_list(
      recs, context_spec,
      {k: v for k, v in example_spec.items() if k != 'relevance'},
      list_size=4)
  batch = RankingBatch(context=parsed.context, examples=parsed.examples,
                       labels=np.zeros(parsed.mask.shape, np.float32),
                       mask=parsed.mask)
  variables = model.init(jr.PRNGKey(3), batch.context, batch.examples,
                         batch.mask, training=False)

  f32_path = str(tmp_path / 'f32')
  q_path = str(tmp_path / 'int8')
  for path, quant in ((f32_path, None), (q_path, 'int8')):
    export_lib.export_predictor(
        model, variables, context_spec, example_spec, path,
        sample_batch=batch, list_size_buckets=(4,),
        label_feature_name='relevance', quantize=quant)

  full = export_lib.load_predictor(f32_path)
  quant = export_lib.load_predictor(q_path)
  a = full.predict(recs)
  b = quant.predict(recs)
  spread = float(np.abs(a).max()) or 1.0
  np.testing.assert_allclose(b, a, atol=0.03 * spread, rtol=0)
  # Ranking agreement on the valid prefix of each list.
  for i in range(a.shape[0]):
    assert np.argmax(a[i]) == np.argmax(b[i]), (i, a[i], b[i])

  # The tables are stored as int8 with per-row scales.
  qv = quant.variables['params']['scorer']
  tab = qv['embed_query_tokens']['embedding']
  assert set(tab) == {'__q__', '__scale__'}
  assert tab['__q__'].dtype == np.int8
  assert tab['__scale__'].shape == (1024, 1)

  size_f32 = os.path.getsize(os.path.join(f32_path, 'params.npz'))
  size_q = os.path.getsize(os.path.join(q_path, 'params.npz'))
  assert size_q < 0.45 * size_f32, (size_q, size_f32)


def test_dataset_engine_auto_selects_native_and_falls_back(tmp_path):
  """dataset_engine='auto' (the default) routes supported specs through
  the C++ streaming loader and unsupported ones through the Python
  stream — same batches either way."""
  from ranking_tpu.data import native
  from ranking_tpu.data import dataset as ds

  context_spec, example_spec = _specs()
  assert native.loader_supported(context_spec, example_spec,
                                 'example_list_with_context', 5)
  # Unsupported: varlen with a non-default pad value.
  bad_spec = dict(example_spec)
  bad_spec['document_tokens'] = VarLenFeature(
      dtype='string', max_len=20, hash_buckets=100, pad_value=0)
  assert not native.loader_supported(context_spec, bad_spec,
                                     'example_list_with_context', 5)
  assert not native.loader_supported(context_spec, example_spec,
                                     'example_in_example', 5)
  assert not native.loader_supported(context_spec, example_spec,
                                     'example_list_with_context', None)

  hp = pipeline.DatasetHparams(
      train_input_pattern=f'{REF_DATA}/train_elwc.tfrecord',
      valid_input_pattern=f'{REF_DATA}/eval_elwc.tfrecord',
      train_batch_size=4, valid_batch_size=4, list_size=5)
  assert hp.dataset_engine == 'auto'
  builder = pipeline.SimpleDatasetBuilder(context_spec, example_spec, hp,
                                          seed=3)
  native_batch = next(iter(builder.train_batches()))

  import dataclasses as _dc
  hp_py = _dc.replace(hp, dataset_engine='python')
  py_builder = pipeline.SimpleDatasetBuilder(context_spec, example_spec,
                                             hp_py, seed=3)
  py_batch = next(iter(py_builder.train_batches()))
  # Same spec surface and shapes on both engines (shuffle orders differ
  # by design: the native loader owns its seeded shuffle).
  assert set(native_batch.examples) == set(py_batch.examples)
  assert native_batch.labels.shape == py_batch.labels.shape
  assert native_batch.mask.shape == py_batch.mask.shape


def test_valid_batches_keep_final_partial_batch(tmp_path):
  """Reference parity (python/data.py:1008): drop_remainder applies to
  repeated training streams only — a finite eval pass keeps its final
  partial batch so validation scores the FULL split. Regression test for
  the round-5 fix (both engines silently dropped eval tails)."""
  from ranking_tpu.data import FixedLenFeature, proto, tfrecord
  from ranking_tpu.pipeline.pipeline import SimpleDatasetBuilder
  rng = np.random.RandomState(0)
  recs = []
  for _ in range(11):  # 11 lists at batch 4 -> 2 full + one of 3
    docs = [{'f': [float(x) for x in rng.randn(3)],
             'rel': int(rng.randint(3))} for _ in range(5)]
    recs.append(proto.make_elwc({}, docs).SerializeToString())
  path = str(tmp_path / 'data.tfrecord')
  tfrecord.write_records(path, recs)
  specs = dict(
      context_feature_spec={},
      example_feature_spec={
          'f': FixedLenFeature(shape=(3,), dtype='float32',
                               default_value=0.0),
          'rel': FixedLenFeature(shape=(), dtype='int64',
                                 default_value=0)})
  for engine in ('native_loader', 'python'):
    hp = pipeline.DatasetHparams(
        train_input_pattern=path, valid_input_pattern=path,
        train_batch_size=4, valid_batch_size=4, list_size=5,
        label_feature_name='rel', dataset_engine=engine)
    builder = SimpleDatasetBuilder(specs['context_feature_spec'],
                                   specs['example_feature_spec'], hp,
                                   seed=1)
    batches = list(builder.valid_batches())
    assert [b.batch_size for b in batches] == [4, 4, 3], engine
    # The training stream (repeated) still drops partials: every batch
    # it ever yields is full.
    it = builder.train_batches()
    sizes = {next(it).batch_size for _ in range(6)}
    if hasattr(it, 'close'):
      it.close()
    assert sizes == {4}, engine


def test_eval_padded_tail_matches_direct_full_split():
  """End-to-end guard for the padded eval tail: pipeline eval metrics
  (weighted + unweighted) over a split that does NOT divide the batch
  size must equal the direct whole-split computation — padded masked
  rows contribute exactly nothing."""
  import tempfile

  from ranking_tpu.data import FixedLenFeature, proto, tfrecord
  from ranking_tpu.pipeline.pipeline import (SimpleDatasetBuilder,
                                             SimplePipeline)
  rng = np.random.RandomState(4)
  labels_all, feats_all, w_all = [], [], []
  recs = []
  L = 6
  for _ in range(11):  # 11 lists at valid_batch_size 4 -> ragged tail 3
    n = int(rng.randint(2, L + 1))
    f = rng.randn(L, 3).astype(np.float32)
    f[n:] = 0.0
    y = np.full(L, -1.0, np.float32)
    y[:n] = rng.randint(0, 3, n)
    w = np.zeros(L, np.float32)
    w[:n] = rng.rand(n).astype(np.float32) + 0.5
    labels_all.append(y)
    feats_all.append(f)
    w_all.append(w)
    docs = [{'f': [float(x) for x in f[j]], 'rel': int(y[j]),
             'w': float(w[j])} for j in range(n)]
    recs.append(proto.make_elwc({}, docs).SerializeToString())
  tmp = tempfile.mkdtemp()
  path = os.path.join(tmp, 'data.tfrecord')
  tfrecord.write_records(path, recs)

  hp_ds = pipeline.DatasetHparams(
      train_input_pattern=path, valid_input_pattern=path,
      train_batch_size=4, valid_batch_size=4, list_size=L,
      label_feature_name='rel')
  specs = dict(
      context_feature_spec={},
      example_feature_spec={
          'f': FixedLenFeature(shape=(3,), dtype='float32',
                               default_value=0.0),
          'w': FixedLenFeature(shape=(), dtype='float32',
                               default_value=0.0),
          'rel': FixedLenFeature(shape=(), dtype='int64',
                                 default_value=0)})
  builder = SimpleDatasetBuilder(specs['context_feature_spec'],
                                 specs['example_feature_spec'], hp_ds,
                                 seed=2)
  hp = pipeline.PipelineHparams(
      model_dir=tempfile.mkdtemp(), loss='softmax_loss', num_epochs=1,
      steps_per_epoch=1, validation_steps=10, learning_rate=0.0,
      weights_feature_name='w', use_weighted_metrics=True, seed=5)
  model = models.RankingModel(scorer=models.DNNScorer(
      hidden_layer_dims=(8,), use_batch_norm=False, dropout=0.0))
  pipe = SimplePipeline(model, builder, hp)
  result = pipe.train_and_validate()

  # Direct whole-split computation with the SAME trained params
  # (restored from the pipeline's own checkpoint).
  import jax
  import optax

  from ranking_tpu import train
  sample = next(builder.valid_batches())
  template = train.create_train_state(
      model, optax.adam(1e-3), jax.random.PRNGKey(0), sample.context,
      sample.examples, sample.mask)
  mgr = train.CheckpointManager(
      os.path.join(hp.model_dir, 'checkpoints'))
  state = mgr.restore(template)
  from ranking_tpu.data.batch import batch_from_labels
  full = batch_from_labels(
      labels=np.stack(labels_all),
      examples={'f': np.stack(feats_all), 'w': np.stack(w_all)})
  logits, _ = train.steps._forward(state, full, training=False)
  # Weighted AND unweighted variants: the padded rows must not leak
  # into either (the unweighted case is the subtle one — the
  # reference's semantics give even an all-invalid list weight 1, so
  # the eval step zeroes padded rows explicitly).
  for key, wname in (('ndcg@5', None), ('weighted_ndcg@5', 'w')):
    fn = ops.make_ranking_metric_fn(ops.RankingMetricKey.NDCG, topn=5,
                                    weights_feature_name=wname)
    direct = float(ops.eval_metric(
        fn, labels=full.labels, predictions=np.asarray(logits),
        features=full.features))
    np.testing.assert_allclose(result[key], direct, rtol=1e-5,
                               err_msg=key)
