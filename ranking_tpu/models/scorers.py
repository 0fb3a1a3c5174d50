"""Scorers and ranking models: univariate DNN, GAM, DIN, multi-task.

TPU-native equivalent of the model-construction layer
(tensorflow_ranking/python/keras/model.py:316-865). The three OO generations
of the reference collapse into one functional pattern: a ``RankingModel``
flax module mapping ``(context_features, example_features, mask) ->
logits [B, L]`` (or a dict of logits for multi-task), built from a Scorer
module. Params are a pytree; training state lives in the train loop.

Scorer contract: ``scorer(context, examples, mask, training) -> logits``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ranking_tpu.models import layers as layers_lib

Array = jax.Array
FeatureDict = Dict[str, Array]


class DNNScorer(nn.Module):
  """Univariate feed-forward scorer (keras/model.py:780-817).

  Each document is scored independently: features are concatenated (context
  broadcast over the list), circularly padded, flattened to ``[B*L, F]``,
  scored by a tower, and restored to masked ``[B, L]`` logits. The flatten /
  restore trick keeps batch norm statistics clean of padding
  (keras/model.py:755-777).
  """

  hidden_layer_dims: Sequence[int]
  output_units: int = 1
  activation: str = 'relu'
  input_batch_norm: bool = False
  use_batch_norm: bool = True
  batch_norm_momentum: float = 0.999
  dropout: float = 0.5
  dtype: Any = jnp.float32
  # Set False ONLY when every feature fed to this scorer is raw batch
  # data (≡ stop_gradient on the tower input; the fused BN backward then
  # skips its largest HBM write). EmbeddingDNNScorer-style wrappers that
  # pass trainable features MUST leave this True.
  input_grad: bool = True
  # Dense-kernel initializer ('glorot_uniform' matches the reference
  # create_tower, keras Dense default; 'lecun_normal' is flax's).
  kernel_init: str = 'lecun_normal'

  @nn.compact
  def __call__(self, context: FeatureDict, examples: FeatureDict,
               mask: Array, training: bool = False) -> Array:
    batch, list_size = mask.shape
    from ranking_tpu.ops.pallas import fused_bn

    # The fused masked-BN tower (ops/pallas/fused_bn.py) takes the row
    # mask directly — exact valid-only statistics with no index build.
    probe = layers_lib.concat_features(context, examples, mask,
                                       circular_padding=False)
    flat = probe.reshape(batch * list_size, -1)
    row_mask = None
    use_fused = (fused_bn.eligible(training, self.use_batch_norm,
                                   self.input_batch_norm, self.dropout,
                                   self.activation, self.dtype, flat)
                 and not self.is_initializing()
                 and fused_bn.supported(flat.shape[-1],
                                        self.hidden_layer_dims))
    if use_fused:
      row_mask = mask.reshape(-1)
    else:
      # Circular padding protects batch-coupled statistics (batch norm)
      # from padding rows; without batch norm every row is scored
      # independently and masked at restore, so the index build + gather
      # can be skipped (~10% of a flagship train step in device
      # profiles). Eval-mode BN uses running averages — row-independent —
      # so padding is train-only (~23% of a flagship eval step).
      needs_padding = (self.use_batch_norm or self.input_batch_norm) \
          and training
      if needs_padding:
        concat = layers_lib.concat_features(context, examples, mask,
                                            circular_padding=True)
        flat = concat.reshape(batch * list_size, -1)
    scores = layers_lib.Tower(
        hidden_layer_dims=self.hidden_layer_dims,
        output_units=self.output_units,
        activation=self.activation,
        input_batch_norm=self.input_batch_norm,
        use_batch_norm=self.use_batch_norm,
        batch_norm_momentum=self.batch_norm_momentum,
        dropout=self.dropout,
        dtype=self.dtype,
        input_grad=self.input_grad,
        kernel_init=self.kernel_init)(flat, training=training,
                                      row_mask=row_mask)
    if self.output_units == 1:
      return layers_lib.restore_list(scores, mask)
    logits = scores.reshape(batch, list_size, self.output_units)
    return jnp.where(mask[:, :, None], logits, jnp.log(1e-10))


class GAMScorer(nn.Module):
  """Generalized additive scorer (keras/model.py:820-865).

  Per-feature towers plus context-derived softmax feature weights; inherently
  interpretable (sub-scores are exposed via ``self.sow``).
  """

  example_hidden_layer_dims: Sequence[int]
  context_hidden_layer_dims: Sequence[int] = ()
  activation: str = 'relu'
  use_batch_norm: bool = True
  batch_norm_momentum: float = 0.999
  dropout: float = 0.0
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, context: FeatureDict, examples: FeatureDict,
               mask: Array, training: bool = False) -> Array:
    from ranking_tpu.utils import list_ops
    batch, list_size = mask.shape
    # Circularly pad invalid slots with valid rows (the FlattenList trick,
    # keras/model.py:713-777) so padding garbage never reaches the
    # batch-norm statistics of the per-feature towers; padded positions'
    # scores are discarded by the output mask regardless.
    gather_idx, _ = list_ops.padded_gather_indices(mask)
    example_inputs = [
        jnp.take_along_axis(
            examples[name].reshape(batch, list_size, -1).astype(jnp.float32),
            gather_idx[:, :, None], axis=1)
        for name in sorted(examples)
    ]
    context_inputs = [
        context[name].reshape(batch, -1).astype(jnp.float32)
        for name in sorted(context)
    ]
    # Broadcast context over the list so towers share shapes.
    context_inputs = [
        jnp.broadcast_to(t[:, None, :], (batch, list_size, t.shape[-1]))
        for t in context_inputs
    ]
    gam = layers_lib.GAMLayer(
        example_feature_num=len(example_inputs),
        example_hidden_layer_dims=self.example_hidden_layer_dims,
        context_feature_num=len(context_inputs),
        context_hidden_layer_dims=self.context_hidden_layer_dims,
        activation=self.activation,
        use_batch_norm=self.use_batch_norm,
        batch_norm_momentum=self.batch_norm_momentum,
        dropout=self.dropout,
        dtype=self.dtype)
    scores, sub_scores = gam(
        example_inputs, context_inputs, training=training)
    self.sow('intermediates', 'gam_sub_scores', sub_scores)
    logits = scores.squeeze(-1)
    return jnp.where(mask, logits, jnp.log(1e-10))


class DINScorer(nn.Module):
  """Document Interaction Network scorer: cross-document attention over the
  list followed by a scoring tower (keras/layers.py:420-587 +
  examples/keras/antique_kpl_din.py)."""

  num_heads: int = 2
  head_size: int = 100
  num_attention_layers: int = 1
  hidden_layer_dims: Sequence[int] = (256, 128)
  activation: str = 'relu'
  use_batch_norm: bool = True
  batch_norm_momentum: float = 0.999
  dropout: float = 0.5
  input_noise_stddev: float = 0.0
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, context: FeatureDict, examples: FeatureDict,
               mask: Array, training: bool = False) -> Array:
    batch, list_size = mask.shape
    concat = layers_lib.concat_features(context, examples, mask)
    if self.input_noise_stddev and training:
      rng = self.make_rng('noise')
      concat = concat + self.input_noise_stddev * jax.random.normal(
          rng, concat.shape)
    attended = layers_lib.DocumentInteractionAttention(
        num_heads=self.num_heads,
        head_size=self.head_size,
        num_layers=self.num_attention_layers,
        dropout=self.dropout,
        dtype=self.dtype)(concat, mask, training=training)
    flat = attended.reshape(batch * list_size, -1)
    scores = layers_lib.Tower(
        hidden_layer_dims=self.hidden_layer_dims,
        output_units=1,
        activation=self.activation,
        use_batch_norm=self.use_batch_norm,
        batch_norm_momentum=self.batch_norm_momentum,
        dropout=self.dropout,
        dtype=self.dtype)(flat, training=training)
    return layers_lib.restore_list(scores, mask)


class EmbeddingDNNScorer(nn.Module):
  """DNN scorer over mixed dense + sparse-token features.

  The sparse->embedding workload of the reference
  (examples/tf_ranking_tfrecord.py:99-115, feature columns with
  ``embedding_column``): features named in ``vocab_sizes`` are integer token
  ids ``[..., T]`` (padding < 0), embedded with a learned table and
  mean-pooled; everything else passes through as dense. When ``mesh`` is
  set, tables are row-sharded over the mesh ``model`` axis with
  explicit-collective lookup (parallel/embedding.py) — the SPMD analog of
  ParameterServerStrategy table partitioning.
  """

  hidden_layer_dims: Sequence[int]
  output_units: int = 1
  vocab_sizes: Any = None  # Mapping[str, int]: feature name -> vocab size
  embedding_dim: int = 20
  mesh: Any = None  # Optional[jax.sharding.Mesh]
  combiner: str = 'mean'
  activation: str = 'relu'
  use_batch_norm: bool = True
  batch_norm_momentum: float = 0.999
  dropout: float = 0.5
  dtype: Any = jnp.float32

  def _encoder(self, name: str):
    from ranking_tpu.models import embeddings as emb_lib
    vocab = dict(self.vocab_sizes or {})[name]
    if self.mesh is not None:
      from ranking_tpu.parallel import embedding as sharded_emb
      return sharded_emb.ShardedEmbeddingEncoder(
          vocab_size=vocab, embedding_dim=self.embedding_dim, mesh=self.mesh,
          combiner=self.combiner, name=f'embed_{name}')
    return emb_lib.EmbeddingEncoder(
        vocab_size=vocab, embedding_dim=self.embedding_dim,
        combiner=self.combiner, name=f'embed_{name}')

  @nn.compact
  def __call__(self, context: FeatureDict, examples: FeatureDict,
               mask: Array, training: bool = False) -> Array:
    vocabs = dict(self.vocab_sizes or {})
    # One encoder module per vocab name, shared across context AND
    # examples — a feature present in both groups shares one table
    # (two submodules with the same name would fail to build).
    encs = {name: self._encoder(name) for name in sorted(vocabs)}
    context = {k: (encs[k](v) if k in vocabs else v)
               for k, v in context.items()}
    examples = {k: (encs[k](v) if k in vocabs else v)
                for k, v in examples.items()}
    return DNNScorer(
        hidden_layer_dims=self.hidden_layer_dims,
        output_units=self.output_units,
        activation=self.activation,
        use_batch_norm=self.use_batch_norm,
        batch_norm_momentum=self.batch_norm_momentum,
        dropout=self.dropout,
        dtype=self.dtype,
        name='dnn')(context, examples, mask, training=training)


class MultiTaskScorer(nn.Module):
  """Wraps a shared-body scorer producing a dict of per-task logits.

  Equivalent of the reference's multi-task ``UnivariateScorer`` dict output
  (keras/model.py:726-777): one tower body with ``len(task_names)`` output
  units, split into named heads.
  """

  task_names: Sequence[str]
  hidden_layer_dims: Sequence[int] = ()
  body: Any = None  # optional shared-body scorer with len(task_names) units
  activation: str = 'relu'
  use_batch_norm: bool = True
  batch_norm_momentum: float = 0.999
  dropout: float = 0.5
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, context: FeatureDict, examples: FeatureDict,
               mask: Array, training: bool = False) -> Dict[str, Array]:
    if self.body is not None:
      scorer = self.body
      units = getattr(scorer, 'output_units', None)
      if units is not None and units != len(self.task_names):
        raise ValueError(
            f'body.output_units={units} != {len(self.task_names)} tasks')
    else:
      scorer = DNNScorer(
          hidden_layer_dims=self.hidden_layer_dims,
          output_units=len(self.task_names),
          activation=self.activation,
          use_batch_norm=self.use_batch_norm,
          batch_norm_momentum=self.batch_norm_momentum,
          dropout=self.dropout,
          dtype=self.dtype)
    logits = scorer(context, examples, mask, training=training)
    if logits.ndim == 2:  # a 1-unit body returns [B, L]
      logits = logits[..., None]
    return {name: logits[:, :, i]
            for i, name in enumerate(self.task_names)}


class RankingModel(nn.Module):
  """Top-level model: optional feature transforms + scorer.

  ``transform`` is the equivalent of the reference's Preprocessor stage
  (keras/model.py:552-665): a name->callable mapping applied to individual
  features before scoring (e.g. log1p for web30k features).
  """

  scorer: nn.Module
  transform_name: str = 'none'  # 'none' | 'log1p'

  def _transform(self, t: Array) -> Array:
    # Dense (floating) features only: integer token ids must pass through
    # untouched or downstream embedding lookups break.
    if (self.transform_name == 'log1p'
        and jnp.issubdtype(jnp.asarray(t).dtype, jnp.floating)):
      return jnp.log1p(jnp.abs(t)) * jnp.sign(t)
    return t

  @nn.compact
  def __call__(self, context: FeatureDict, examples: FeatureDict,
               mask: Array, training: bool = False):
    context = {k: self._transform(v) for k, v in context.items()}
    examples = {k: self._transform(v) for k, v in examples.items()}
    return self.scorer(context, examples, mask, training=training)
