"""Pipeline hyperparameter dataclasses.

Mirrors the reference's ``PipelineHparams``/``DatasetHparams``
(tensorflow_ranking/python/keras/pipeline.py:261-366), re-based on the mesh
world: ``strategy`` strings are replaced by mesh axis sizes (data/model);
everything else keeps the same knobs so configs translate one-to-one.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional, Union


@dataclasses.dataclass
class PipelineHparams:
  model_dir: str
  num_epochs: int
  steps_per_epoch: int
  validation_steps: int
  learning_rate: float
  loss: Union[str, Mapping[str, str]]
  loss_weights: Optional[Union[float, Mapping[str, float]]] = None
  optimizer: str = 'adam'   # 'adam' | 'adagrad' | 'sgd' | 'adamw' |
                            # 'lazy_adam' | 'lazy_adagrad' (sparse-row embedding updates)
  loss_reduction: str = 'sum_by_nonzero_weights'
  steps_per_execution: int = 10
  export_best_model: bool = False
  # Matches the reference default (keras/pipeline.py:327): the default
  # monitored metric is 'loss', for which lower is better.
  best_exporter_metric_higher_better: bool = False
  best_exporter_metric: str = 'loss'
  automatic_reduce_lr: bool = False
  # LR schedule. The reference has two generations: keras = constant +
  # ReduceLROnPlateau (automatic_reduce_lr above); the Orbit/TFR-BERT
  # generation = linear warmup + polynomial decay to 0
  # (examples/keras/tfrbert_antique_train_config.yaml:23-39). 'constant'
  # (default) | 'linear_decay' (polynomial power 1 from learning_rate to
  # end_learning_rate over the remaining num_epochs*steps_per_epoch) |
  # 'cosine_decay'. warmup_steps > 0 prepends a 0 -> learning_rate
  # linear ramp (the recipe's ~10% of train_steps). Mutually exclusive
  # with automatic_reduce_lr (which owns the LR at epoch granularity).
  lr_schedule: str = 'constant'
  warmup_steps: int = 0
  end_learning_rate: float = 0.0
  # Global-norm gradient clipping (0 = off) — standard for the BERT
  # fine-tune recipes.
  gradient_clip_norm: float = 0.0
  early_stopping_patience: int = 0
  early_stopping_min_delta: float = 0.0
  use_weighted_metrics: bool = False
  # Optional per-example weight feature (IPW / unbiased LTR): feeds the
  # loss and, with use_weighted_metrics, the metric suite.
  weights_feature_name: Optional[str] = None
  # Mesh: replaces the reference's strategy string (strategy_utils.py:45).
  mesh_data: Optional[int] = None   # None = all devices
  mesh_model: int = 1
  seed: Optional[int] = 1
  # jax.profiler device trace of one epoch (TensorBoard/XProf viewable) —
  # a strict superset of the reference's TensorBoard callback.
  profile_dir: Optional[str] = None
  profile_epoch: int = 1
  # Deterministic mid-training data resume — beyond the reference, whose
  # BackupAndRestore restarts model.fit's dataset from the beginning
  # (keras/pipeline.py:493-495): a resumed reference run re-trains on the
  # stream's earliest batches and may never see its tail. When True, a
  # restored pipeline fast-forwards the (seed-deterministic) train stream
  # by the restored step count — one batch per completed step — so an
  # interrupted-and-resumed run consumes exactly the batch sequence the
  # uninterrupted run would have (bit-identical final params; see
  # tests/test_pipeline.py::test_resume_dataset_bitwise_identical).
  # Fast-forward cost: builders whose train_batches accepts skip_batches
  # (the bundled ones) skip parse-free — the C++ reader drops record
  # batches at mmap-scan speed (~2M rec/s), the python engine at record-
  # scan speed; other builders replay by pull-and-discard at ingest
  # speed. Default False = reference-parity restart-from-the-top.
  resume_dataset: bool = False


@dataclasses.dataclass
class DatasetHparams:
  train_input_pattern: str
  valid_input_pattern: str
  train_batch_size: int
  valid_batch_size: int
  list_size: Optional[int] = None
  valid_list_size: Optional[int] = None
  dataset_reader: str = 'example_list_with_context'
  convert_labels_to_binary: bool = False
  shuffle_buffer_size: int = 1000
  mask_feature_name: Optional[str] = None
  label_feature_name: str = 'relevance'
  size_feature_name: Optional[str] = None
  # Cycle-interleave width across input files (tf.data interleave analog).
  interleave_files: int = 1
  # 'auto' (default) = the C++ loader runtime (data/native/loader.cc:
  # read/shuffle/decode/batch end to end, multi-threaded) whenever the
  # specs/format support it (native.loader_supported), else the threaded
  # python stream; 'native_loader' forces the C++ loader (raises on
  # unsupported specs); 'python' forces the python stream.
  dataset_engine: str = 'auto'
  # Decoded-once epoch cache directory (None = off; native engine only).
  # The first pass decodes each record once into an mmap'd spill file
  # under this directory (named by a content fingerprint of the file
  # list + specs; stale spills rebuild on size/mtime/spec drift); epochs
  # >= 2 and later runs stream decoded payloads at memory bandwidth with
  # no proto decode. The batch stream is bitwise-identical with the
  # cache off, building, or complete. The reference's
  # build_ranking_dataset re-parses every epoch and never caches
  # (python/data.py:914-1017).
  dataset_cache: Optional[str] = None


def from_yaml(path: str):
  """Loads (PipelineHparams, DatasetHparams) from a YAML config file.

  The config-file analog of the reference's tf-models experiment YAMLs
  (examples/keras/tfrbert_antique_train_config.yaml): top-level keys
  ``pipeline:`` and ``dataset:`` map one-to-one onto the dataclass fields.
  """
  import yaml
  with open(path) as f:
    cfg = yaml.safe_load(f) or {}

  def _build(cls, section):
    data = dict(cfg.get(section) or {})
    valid = {f.name for f in dataclasses.fields(cls)}
    unknown = set(data) - valid
    if unknown:
      raise ValueError(f'Unknown {section} config keys: {sorted(unknown)}')
    return cls(**data)

  return _build(PipelineHparams, 'pipeline'), _build(DatasetHparams,
                                                     'dataset')


def lr_schedule_from_hparams(hparams: PipelineHparams):
  """The per-step learning-rate schedule, or a float for constant LR."""
  import optax
  kind = hparams.lr_schedule.lower()
  lr = hparams.learning_rate
  warmup = max(0, int(hparams.warmup_steps))
  if kind not in ('constant', 'linear_decay', 'cosine_decay'):
    raise ValueError(
        f'Unknown lr_schedule {hparams.lr_schedule!r}; one of constant, '
        'linear_decay, cosine_decay')
  if kind != 'constant' or warmup:
    if hparams.automatic_reduce_lr:
      raise ValueError(
          'lr_schedule/warmup_steps and automatic_reduce_lr are mutually '
          'exclusive: the plateau hook owns the LR at epoch granularity')
  if kind == 'constant' and not warmup:
    return lr
  total = max(1, hparams.num_epochs * hparams.steps_per_epoch)
  decay_steps = max(1, total - warmup)
  if kind == 'linear_decay':
    # The reference TFR-BERT recipe: polynomial power 1 to
    # end_learning_rate (tfrbert_antique_train_config.yaml:24-31).
    decay = optax.polynomial_schedule(
        init_value=lr, end_value=hparams.end_learning_rate, power=1.0,
        transition_steps=decay_steps)
  elif kind == 'cosine_decay':
    decay = optax.cosine_decay_schedule(
        init_value=lr, decay_steps=decay_steps,
        alpha=(hparams.end_learning_rate / lr) if lr else 0.0)
  else:
    decay = optax.constant_schedule(lr)
  if not warmup:
    return decay
  ramp = optax.linear_schedule(init_value=0.0, end_value=lr,
                               transition_steps=warmup)
  return optax.join_schedules([ramp, decay], [warmup])


def optimizer_from_hparams(hparams: PipelineHparams):
  import optax
  name = hparams.optimizer.lower()
  lr = lr_schedule_from_hparams(hparams)
  if name == 'lazy_adam':  # dense params ride plain adam
    name = 'adam'
  elif name == 'lazy_adagrad':  # dense params ride plain adagrad
    name = 'adagrad'
  factories = {'adam': optax.adam, 'adagrad': optax.adagrad,
               'sgd': optax.sgd, 'adamw': optax.adamw}
  if name not in factories:
    raise ValueError(f'Unknown optimizer {hparams.optimizer!r}')
  clip = (float(hparams.gradient_clip_norm)
          if hparams.gradient_clip_norm and hparams.gradient_clip_norm > 0
          else None)
  if hparams.automatic_reduce_lr:
    # Hyperparam-injected form: the pipeline's plateau logic rewrites
    # opt_state.hyperparams['learning_rate'] between epochs
    # (ReduceLROnPlateau analog, keras/pipeline.py:512-517). Clipping
    # goes INSIDE the injected factory so opt_state.hyperparams stays
    # the top-level state the plateau hook expects.
    def factory(learning_rate):
      tx = factories[name](learning_rate)
      if clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
      return tx
    return optax.inject_hyperparams(factory)(learning_rate=lr)
  tx = factories[name](lr)
  if clip is not None:
    tx = optax.chain(optax.clip_by_global_norm(clip), tx)
  return tx


def sparse_optimizer_from_hparams(hparams: PipelineHparams):
  """Sparse-row spec when optimizer='lazy_adam'/'lazy_adagrad'
  (embedding tables get sparse-row updates, train/sparse.py), else
  None. lazy_adagrad carries one accumulator instead of Adam's two
  moments — ~30% faster per sparse step at multi-million-row tables
  (the reference's embedding-era default optimizer family)."""
  name = hparams.optimizer.lower()
  if name not in ('lazy_adam', 'lazy_adagrad'):
    return None
  if hparams.automatic_reduce_lr:
    raise ValueError(
        f"optimizer={name!r} does not support automatic_reduce_lr "
        '(the plateau hook rewrites only the dense optax state)')
  if (hparams.lr_schedule.lower() != 'constant' or hparams.warmup_steps
      or (hparams.gradient_clip_norm and hparams.gradient_clip_norm > 0)):
    raise ValueError(
        f'optimizer={name!r} supports constant learning rate only: the '
        'sparse row updates apply hparams.learning_rate directly, so a '
        'schedule/warmup/clip would silently diverge between the dense '
        'and sparse parameter groups')
  from ranking_tpu.train.sparse import LazyAdagrad, LazyAdam
  # Tables sharded over 'model' must not route through the local DMA
  # scatter kernel (see LazyAdam.dma_scatter).
  cls = LazyAdam if name == 'lazy_adam' else LazyAdagrad
  return cls(learning_rate=hparams.learning_rate,
             dma_scatter=hparams.mesh_model == 1)
