"""Ranking model layers: towers, list flattening, DIN attention, GAM, Bilinear.

TPU-native counterparts of tensorflow_ranking/python/keras/layers.py, written
as flax.linen modules (pure functions of params) plus shape-op helpers. The
data model matches the framework convention: context features ``[B, ...]``,
example features ``[B, L, ...]``, boolean ``mask [B, L]``.

Design notes vs. the reference:
* ``flatten_list`` circularly pads invalid slots with valid items before the
  ``[B, L, .] -> [B*L, .]`` reshape (keras/layers.py:81-182) so batch-norm
  statistics and other batch-coupled ops never see padding garbage.
* Dense towers take a ``dtype`` compute precision (params stay float32;
  pass ``jnp.bfloat16`` for the MXU-native configuration). The default is
  float32 for bit-parity with the reference semantics.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ranking_tpu.utils import list_ops

Array = jax.Array


def flatten_list(
    context_features: Dict[str, Array],
    example_features: Dict[str, Array],
    mask: Array,
    circular_padding: bool = True,
) -> Tuple[Dict[str, Array], Dict[str, Array]]:
  """Flattens ``[B, L, ...]`` example features to ``[B*L, ...]``.

  Context features ``[B, ...]`` are tiled to ``[B*L, ...]``. With
  ``circular_padding`` (the default, matching keras/layers.py:126-175),
  invalid slots are replaced by valid examples from the same list so
  downstream batch-coupled ops see only real feature vectors.
  """
  batch, list_size = mask.shape
  if circular_padding:
    indices, _ = list_ops.padded_gather_indices(mask)
    example_features = {
        name: list_ops.gather_per_row(tensor, indices)
        for name, tensor in example_features.items()
    }
  flat_examples = {
      name: tensor.reshape((batch * list_size,) + tensor.shape[2:])
      for name, tensor in example_features.items()
  }
  flat_context = {
      name: jnp.repeat(tensor, list_size, axis=0)
      for name, tensor in context_features.items()
  }
  return flat_context, flat_examples


def restore_list(
    flat_logits: Array,
    mask: Array,
    by_scatter: bool = False,
) -> Array:
  """Restores ``[B*L, 1]`` (or ``[B*L]``) scores to masked ``[B, L]`` logits.

  Invalid entries become ``log(1e-10)``. With ``by_scatter`` (the groupwise
  path, keras/layers.py:231-265) scores of circularly-repeated valid items
  are averaged over their repeats instead of taking the first occurrence.
  """
  batch, list_size = mask.shape
  logits = flat_logits.reshape(batch, list_size)
  if by_scatter:
    indices, _ = list_ops.padded_gather_indices(mask)
    # Scatter-add scores and counts back onto original positions.
    sums = jax.vmap(
        lambda row_logits, row_idx: jnp.zeros(list_size).at[row_idx].add(
            row_logits))(logits, indices)
    counts = jax.vmap(
        lambda row_idx: jnp.zeros(list_size).at[row_idx].add(1.0))(indices)
    logits = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)
  return jnp.where(mask, logits, jnp.log(1e-10))


def concat_features(
    context_features: Dict[str, Array],
    example_features: Dict[str, Array],
    mask: Array,
    circular_padding: bool = True,
) -> Array:
  """Concatenates all features into one ``[B, L, sum(F)]`` tensor.

  Context features are broadcast over the list axis. 2-D example features get
  a trailing feature axis. Equivalent of keras/layers.py:276-375.
  """
  batch, list_size = mask.shape

  def _as_3d(tensor: Array) -> Array:
    if tensor.ndim == 2:
      return tensor[:, :, None]
    if tensor.ndim > 3:
      return tensor.reshape(batch, list_size, -1)
    return tensor

  parts = []
  for name in sorted(context_features):
    t = context_features[name]
    t = t.reshape(batch, -1).astype(jnp.float32)
    parts.append(jnp.broadcast_to(t[:, None, :],
                                  (batch, list_size, t.shape[-1])))
  example_parts = {}
  for name in sorted(example_features):
    example_parts[name] = _as_3d(example_features[name]).astype(jnp.float32)
  if circular_padding and example_parts:
    indices, _ = list_ops.padded_gather_indices(mask)
    example_parts = {
        name: list_ops.gather_per_row(t, indices)
        for name, t in example_parts.items()
    }
  parts.extend(example_parts[name] for name in sorted(example_parts))
  if not parts:
    raise ValueError('No features to concatenate.')
  return jnp.concatenate(parts, axis=-1)


_ACTIVATIONS: Dict[str, Callable[[Array], Array]] = {
    'relu': jax.nn.relu,
    'tanh': jnp.tanh,
    'gelu': jax.nn.gelu,
    'elu': jax.nn.elu,
    'sigmoid': jax.nn.sigmoid,
    'swish': jax.nn.swish,
    'linear': lambda x: x,
}

# Kernel initializers by name (strings keep the modules hashable).
# 'glorot_uniform' is the reference create_tower's effective init (keras
# Dense default); 'lecun_normal' is flax's.
_INITIALIZERS: Dict[str, Callable[..., Any]] = {
    'lecun_normal': nn.initializers.lecun_normal,
    'lecun_uniform': nn.initializers.lecun_uniform,
    'glorot_uniform': nn.initializers.glorot_uniform,
    'glorot_normal': nn.initializers.glorot_normal,
    'he_normal': nn.initializers.he_normal,
    'he_uniform': nn.initializers.he_uniform,
}


def kernel_initializer(name: str) -> Callable[..., Any]:
  if name not in _INITIALIZERS:
    raise ValueError(
        f'Unknown kernel_init {name!r}; one of {sorted(_INITIALIZERS)}')
  return _INITIALIZERS[name]()


class _DenseParams(nn.Module):
  """Owns a Dense layer's params (same names/init as nn.Dense) without
  running the matmul — the fused-BN path reads them into its kernels."""

  features: int
  kernel_init: str = 'lecun_normal'

  @nn.compact
  def __call__(self, in_features: int):
    kernel = self.param('kernel', kernel_initializer(self.kernel_init),
                        (in_features, self.features))
    bias = self.param('bias', nn.initializers.zeros_init(),
                      (self.features,))
    return kernel, bias


class _BNParams(nn.Module):
  """Owns a BatchNorm layer's params/stats (same names/init as
  nn.BatchNorm); a second call with batch stats applies flax's
  running-average update."""

  features: int
  momentum: float

  @nn.compact
  def __call__(self, batch_mean=None, batch_var=None):
    scale = self.param('scale', nn.initializers.ones_init(),
                       (self.features,))
    bias = self.param('bias', nn.initializers.zeros_init(),
                      (self.features,))
    ra_mean = self.variable('batch_stats', 'mean',
                            lambda s: jnp.zeros(s, jnp.float32),
                            (self.features,))
    ra_var = self.variable('batch_stats', 'var',
                           lambda s: jnp.ones(s, jnp.float32),
                           (self.features,))
    if batch_mean is not None and not self.is_initializing():
      ra_mean.value = (self.momentum * ra_mean.value
                       + (1 - self.momentum) * batch_mean)
      ra_var.value = (self.momentum * ra_var.value
                      + (1 - self.momentum) * batch_var)
    return scale, bias


class Tower(nn.Module):
  """Feed-forward scoring tower: [BN] -> (Dense -> BN -> act -> dropout)*.

  Equivalent of ``create_tower`` (keras/layers.py:26-77). ``dtype`` controls
  the compute precision (bfloat16 recommended on TPU); params stay float32.

  In train mode with batch norm, relu, and no dropout, the hidden chain
  runs as fused Pallas kernels (ops/pallas/fused_bn.py) that keep BN from
  costing any activation-sized HBM traffic — numerically the same BN
  (equality-tested), same parameter tree, enabled automatically on TPU
  (``ops.pallas.fused_bn.set_enabled`` overrides).
  """

  hidden_layer_dims: Sequence[int]
  output_units: int = 1
  activation: str = 'relu'
  input_batch_norm: bool = False
  use_batch_norm: bool = True
  batch_norm_momentum: float = 0.999
  dropout: float = 0.5
  dtype: Any = jnp.float32
  # False declares the tower input gradient unused (≡ stop_gradient on x;
  # applied by the fused path, where it skips the largest HBM write of
  # the backward). Only set False when nothing trainable feeds the tower
  # (raw batch features) — embeddings/encoders upstream need the default.
  input_grad: bool = True
  # Dense-kernel initializer by name (models/layers.py _INITIALIZERS).
  kernel_init: str = 'lecun_normal'

  def _fused_ok(self, x: Array, training: bool) -> bool:
    from ranking_tpu.ops.pallas import fused_bn
    return (fused_bn.eligible(training, self.use_batch_norm,
                              self.input_batch_norm, self.dropout,
                              self.activation, self.dtype, x)
            and bool(self.hidden_layer_dims)
            and not self.is_initializing()
            and fused_bn.supported(x.shape[-1], self.hidden_layer_dims))

  def _fused_call(self, x: Array, row_mask: Optional[Array]) -> Array:
    from ranking_tpu.ops.pallas import fused_bn
    ws, bs, gammas, betas, bn_mods = [], [], [], [], []
    f_in = x.shape[-1]
    for idx, dim in enumerate(self.hidden_layer_dims):
      kernel, bias = _DenseParams(
          dim, kernel_init=self.kernel_init, name=f'Dense_{idx}')(f_in)
      bn = _BNParams(dim, self.batch_norm_momentum, name=f'BatchNorm_{idx}')
      scale, offset = bn()
      ws.append(kernel)
      bs.append(bias)
      gammas.append(scale)
      betas.append(offset)
      bn_mods.append(bn)
      f_in = dim
    if row_mask is None:
      row_mask = jnp.ones((x.shape[0],), jnp.float32)
    out, means, vars_ = fused_bn.fused_bn_mlp(
        x, row_mask, tuple(ws), tuple(bs), tuple(gammas), tuple(betas),
        1e-5, act_dtype=self.dtype, input_grad=self.input_grad)
    for bn, mu, var in zip(bn_mods, means, vars_):
      bn(jax.lax.stop_gradient(mu), jax.lax.stop_gradient(var))
    kernel, bias = _DenseParams(
        self.output_units, kernel_init=self.kernel_init,
        name=f'Dense_{len(self.hidden_layer_dims)}')(f_in)
    out = out @ kernel.astype(self.dtype) + bias.astype(self.dtype)
    return out.astype(jnp.float32)

  @nn.compact
  def __call__(self, x: Array, training: bool = False,
               row_mask: Optional[Array] = None) -> Array:
    """``row_mask`` (fused path only): [N] row validity — BN statistics
    become the exact masked moments, replacing the circular-padding
    approximation. Ignored by the standard path."""
    if not self.input_grad:
      # Same semantics on every path (the fused backward additionally
      # exploits it to skip its largest HBM write) — a kernel must never
      # be a semantic fork.
      x = jax.lax.stop_gradient(x)
    if self._fused_ok(x, training):
      return self._fused_call(x, row_mask)
    act = _ACTIVATIONS[self.activation]
    x = x.astype(self.dtype)
    if self.input_batch_norm:
      x = nn.BatchNorm(
          use_running_average=not training,
          momentum=self.batch_norm_momentum, dtype=self.dtype)(x)
    for dim in self.hidden_layer_dims:
      x = nn.Dense(dim, dtype=self.dtype,
                   kernel_init=kernel_initializer(self.kernel_init))(x)
      if self.use_batch_norm:
        x = nn.BatchNorm(
            use_running_average=not training,
            momentum=self.batch_norm_momentum, dtype=self.dtype)(x)
      x = act(x)
      if self.dropout:
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
    x = nn.Dense(self.output_units, dtype=self.dtype,
                 kernel_init=kernel_initializer(self.kernel_init))(x)
    return x.astype(jnp.float32)


class SelfAttentionMask:
  """Builds a [B, 1, L, L] attention mask from a [B, L] validity mask.

  (keras/layers.py:380-416; here a plain function-object since it has no
  parameters.)
  """

  def __call__(self, mask: Array) -> Array:
    return (mask[:, None, None, :] & mask[:, None, :, None])


class DocumentInteractionAttention(nn.Module):
  """Cross-document attention over the list axis (DIN; keras/layers.py:420).

  A stack of ``num_layers`` blocks: LN -> MHA (masked over invalid docs) ->
  dropout -> residual. Input/output: ``[B, L, F]`` -> ``[B, L, head_size]``.
  """

  num_heads: int = 2
  head_size: int = 100
  num_layers: int = 1
  dropout: float = 0.5
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array, mask: Array, training: bool = False) -> Array:
    x = x.astype(self.dtype)
    # Project input to head_size so residual adds line up.
    x = nn.Dense(self.head_size, use_bias=False, dtype=self.dtype)(x)
    attention_mask = SelfAttentionMask()(mask)
    for _ in range(self.num_layers):
      y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
      y = nn.MultiHeadDotProductAttention(
          num_heads=self.num_heads,
          qkv_features=self.head_size,
          out_features=self.head_size,
          dropout_rate=self.dropout,
          deterministic=not training,
          dtype=self.dtype)(y, y, mask=attention_mask)
      y = nn.Dropout(self.dropout, deterministic=not training)(y)
      x = x + y
    return x.astype(jnp.float32)


class GAMLayer(nn.Module):
  """Generalized Additive Model over per-feature towers.

  Each example feature goes through its own small tower producing
  ``sublayer_units`` outputs; optional context features produce softmax
  weights over the example features; the final score is the weighted sum
  (keras/layers.py:591-803, "Interpretable Ranking with GAMs").
  Inputs: example feats ``[B, L, F_e]`` each, context feats ``[B, F_c]``.
  """

  example_feature_num: int
  example_hidden_layer_dims: Sequence[int]
  context_feature_num: int = 0
  context_hidden_layer_dims: Sequence[int] = ()
  activation: str = 'relu'
  use_batch_norm: bool = True
  batch_norm_momentum: float = 0.999
  dropout: float = 0.0
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(
      self,
      example_inputs: Sequence[Array],
      context_inputs: Sequence[Array] = (),
      training: bool = False,
  ) -> Tuple[Array, Array]:
    """Returns (scores [..., 1], per-feature sub-scores [..., F_e])."""
    if len(example_inputs) != self.example_feature_num:
      raise ValueError(
          f'Expected {self.example_feature_num} example features, got '
          f'{len(example_inputs)}.')
    if len(context_inputs) != self.context_feature_num:
      raise ValueError(
          f'Expected {self.context_feature_num} context features, got '
          f'{len(context_inputs)} — set context_feature_num (0 means the '
          f'context weighting towers are disabled).')
    sub_scores = []
    for i, feat in enumerate(example_inputs):
      tower = Tower(
          hidden_layer_dims=self.example_hidden_layer_dims,
          output_units=1,
          activation=self.activation,
          use_batch_norm=self.use_batch_norm,
          batch_norm_momentum=self.batch_norm_momentum,
          dropout=self.dropout,
          dtype=self.dtype,
          name=f'example_tower_{i}')
      sub_scores.append(tower(feat, training=training))
    # [..., F_e]
    sub_scores = jnp.concatenate(sub_scores, axis=-1)

    if context_inputs and self.context_feature_num:
      weights = []
      for i, feat in enumerate(context_inputs):
        tower = Tower(
            hidden_layer_dims=self.context_hidden_layer_dims,
            output_units=self.example_feature_num,
            activation=self.activation,
            use_batch_norm=self.use_batch_norm,
            batch_norm_momentum=self.batch_norm_momentum,
            dropout=self.dropout,
            dtype=self.dtype,
            name=f'context_tower_{i}')
        w = jax.nn.softmax(tower(feat, training=training), axis=-1)
        weights.append(w)
      feature_weights = sum(weights)
      # Context features lead with [B, ...] while example sub-scores may
      # carry a list axis ([B, L, F_e]): insert singleton axes before the
      # feature dim so per-query weights broadcast over the list instead
      # of misaligning batch with list positions.
      while feature_weights.ndim < sub_scores.ndim:
        feature_weights = feature_weights[..., None, :]
      scores = jnp.sum(sub_scores * feature_weights, axis=-1, keepdims=True)
    else:
      scores = jnp.sum(sub_scores, axis=-1, keepdims=True)
    return scores, sub_scores


class Bilinear(nn.Module):
  """Bilinear interaction x^T A y (+ linear terms) for two-tower unbiased LTR.

  (keras/layers.py:807-891.) Inputs ``x [..., Dx]``, ``y [..., Dy]`` ->
  ``[..., output_units]`` via an einsum against a ``[Dx, output, Dy]`` kernel.
  """

  output_units: int = 1
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    dx, dy = x.shape[-1], y.shape[-1]
    # The einsum contracts BOTH feature axes (Dx*Dy terms per output), so
    # fan-in must cover them jointly — lecun_normal's default in_axis=-2
    # would read fan-in off the output_units axis and blow init variance
    # up by ~Dy (the reference uses glorot over the 3-D weight).
    kernel = self.param(
        'bilinear_kernel',
        nn.initializers.variance_scaling(1.0, 'fan_in', 'truncated_normal',
                                         in_axis=(0, 2), out_axis=1),
        (dx, self.output_units, dy), jnp.float32)
    bias = self.param('bias', nn.initializers.zeros,
                      (self.output_units,), jnp.float32)
    out = jnp.einsum('...i,ioj,...j->...o', x.astype(self.dtype),
                     kernel.astype(self.dtype), y.astype(self.dtype))
    return out.astype(jnp.float32) + bias
