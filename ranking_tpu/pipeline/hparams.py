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


def optimizer_from_hparams(hparams: PipelineHparams):
  import optax
  name = hparams.optimizer.lower()
  lr = hparams.learning_rate
  if name == 'lazy_adam':  # dense params ride plain adam
    name = 'adam'
  elif name == 'lazy_adagrad':  # dense params ride plain adagrad
    name = 'adagrad'
  factories = {'adam': optax.adam, 'adagrad': optax.adagrad,
               'sgd': optax.sgd, 'adamw': optax.adamw}
  if name not in factories:
    raise ValueError(f'Unknown optimizer {hparams.optimizer!r}')
  if hparams.automatic_reduce_lr:
    # Hyperparam-injected form: the pipeline's plateau logic rewrites
    # opt_state.hyperparams['learning_rate'] between epochs
    # (ReduceLROnPlateau analog, keras/pipeline.py:512-517).
    return optax.inject_hyperparams(factories[name])(learning_rate=lr)
  return factories[name](lr)


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
  from ranking_tpu.train.sparse import LazyAdagrad, LazyAdam
  # Tables sharded over 'model' must not route through the local DMA
  # scatter kernel (see LazyAdam.dma_scatter).
  cls = LazyAdam if name == 'lazy_adam' else LazyAdagrad
  return cls(learning_rate=hparams.learning_rate,
             dma_scatter=hparams.mesh_model == 1)
