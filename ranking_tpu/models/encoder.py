"""Transformer encoder scorer: the TFR-BERT analog.

Re-designs the reference's TFR-BERT premade
(/root/reference/tensorflow_ranking/extension/premade/tfrbert_task.py:
TFRBertScorer at :110-132 — encoder pooled output -> dropout -> Dense(1))
as a flax module family:

* ``TransformerEncoder`` — a compact BERT-style text encoder (token +
  position embeddings, N post-LN self-attention blocks, CLS pooling) sized
  by config; runs flattened ``[B*L, T]`` so the MXU sees one large batch.
* ``EncoderScorer`` — univariate scorer: each document's (query, doc) token
  pair is encoded and scored; any flax encoder module with the same
  ``(ids, attn_mask) -> pooled`` signature can be swapped in (e.g. a ported
  HF checkpoint), mirroring how TFRBertScorer accepts any TF encoder.
* ``warm_start_from`` — maps a flat ``{path: array}`` dict (e.g. converted
  from a pretrained checkpoint) onto the encoder params by suffix match —
  the analog of tfrbert_task.py:346-361's ckpt warm start.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class TransformerBlock(nn.Module):
  hidden_dim: int
  num_heads: int
  mlp_dim: int
  dropout: float = 0.1
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array, mask: Array, training: bool = False) -> Array:
    attn_mask = mask[:, None, None, :].astype(bool)
    y = nn.MultiHeadDotProductAttention(
        num_heads=self.num_heads,
        qkv_features=self.hidden_dim,
        dropout_rate=self.dropout,
        deterministic=not training,
        dtype=self.dtype)(x, x, mask=attn_mask)
    x = nn.LayerNorm(dtype=self.dtype)(x + y)
    y = nn.Dense(self.mlp_dim, dtype=self.dtype)(x)
    y = nn.gelu(y)
    y = nn.Dense(self.hidden_dim, dtype=self.dtype)(y)
    y = nn.Dropout(self.dropout, deterministic=not training)(y)
    return nn.LayerNorm(dtype=self.dtype)(x + y)


class TransformerEncoder(nn.Module):
  """BERT-style encoder over token ids; ids < 0 are padding.

  With ``type_vocab_size > 0`` the encoder adds segment (token-type)
  embeddings and matches the full BERT embedding stack — the config
  loaded by ``models.bert_ckpt.load_tf2_bert_checkpoint``. An explicit
  ``attn_mask`` (the BERT ``input_mask`` convention, where PAD id 0 is a
  real vocabulary entry) overrides the ids<0 padding rule."""

  vocab_size: int
  hidden_dim: int = 128
  num_layers: int = 2
  num_heads: int = 4
  mlp_dim: int = 512
  max_len: int = 512
  type_vocab_size: int = 0
  dropout: float = 0.1
  dtype: Any = jnp.float32
  # Rematerialize each block on the backward pass (jax.checkpoint): block
  # activations are recomputed instead of held in HBM, cutting peak memory
  # from O(num_layers * B*L*T*hidden) to O(B*L*T*hidden) at ~1/3 extra
  # FLOPs — the standard TPU trade for large batch x list_size x seq_len.
  remat: bool = False

  @nn.compact
  def __call__(self, ids: Array, training: bool = False,
               segment_ids: Optional[Array] = None,
               attn_mask: Optional[Array] = None) -> Array:
    if ids.shape[-1] > self.max_len:
      raise ValueError(
          f'sequence length {ids.shape[-1]} exceeds max_len '
          f'{self.max_len} (position table size); re-tokenize or raise '
          f'max_len')
    if segment_ids is not None and not self.type_vocab_size:
      raise ValueError(
          'segment_ids were provided but type_vocab_size is 0 — the '
          'segment information would be silently dropped; set '
          'type_vocab_size (BERT uses 2) or remove the feature')
    mask = (ids >= 0) if attn_mask is None else (attn_mask > 0)
    safe = jnp.where(mask & (ids >= 0), ids, 0)
    x = nn.Embed(self.vocab_size, self.hidden_dim, name='token_embed',
                 dtype=self.dtype)(safe)
    pos = jnp.arange(ids.shape[-1])[None, :]
    x = x + nn.Embed(self.max_len, self.hidden_dim, name='pos_embed',
                     dtype=self.dtype)(pos)
    if self.type_vocab_size:
      seg = (jnp.zeros_like(safe) if segment_ids is None
             else jnp.where(mask, segment_ids, 0))
      x = x + nn.Embed(self.type_vocab_size, self.hidden_dim,
                       name='type_embed', dtype=self.dtype)(seg)
    x = nn.LayerNorm(dtype=self.dtype)(x)
    x = nn.Dropout(self.dropout, deterministic=not training)(x)
    x = x * mask[..., None]
    block_cls = (nn.remat(TransformerBlock, static_argnums=(3,))
                 if self.remat else TransformerBlock)
    for i in range(self.num_layers):
      x = block_cls(
          hidden_dim=self.hidden_dim, num_heads=self.num_heads,
          mlp_dim=self.mlp_dim, dropout=self.dropout, dtype=self.dtype,
          name=f'block_{i}')(x, mask, training)
    # CLS pooling with a tanh head (BERT pooled_output).
    pooled = nn.Dense(self.hidden_dim, name='pooler', dtype=self.dtype)(
        x[:, 0, :])
    return jnp.tanh(pooled)


class EncoderScorer(nn.Module):
  """Univariate scorer over a text encoder (TFRBertScorer analog).

  Expects example feature ``input_ids`` of shape ``[B, L, T]`` — the
  query+document token pair per document, padding id < 0 (built host-side
  by the data layer, mirroring TFRBertDataLoader's feature mapping,
  tfrbert_task.py:50-97). Context features are unused (the query is fused
  into each document's token sequence, as in TFR-BERT).
  """

  encoder: nn.Module
  dropout: float = 0.1
  ids_feature_name: str = 'input_ids'
  mask_feature_name: str = 'input_mask'
  segment_feature_name: str = 'segment_ids'

  @nn.compact
  def __call__(self, context, examples, mask, training: bool = False):
    ids = examples[self.ids_feature_name]
    batch, list_size, seq_len = ids.shape
    flat = ids.reshape(batch * list_size, seq_len)
    # Forward optional BERT features only to encoders that accept them —
    # the documented swap contract is just (ids, attn_mask) -> pooled.
    import inspect
    accepted = inspect.signature(type(self.encoder).__call__).parameters
    kwargs = {}
    if self.mask_feature_name in examples and 'attn_mask' in accepted:
      kwargs['attn_mask'] = examples[self.mask_feature_name].reshape(
          batch * list_size, seq_len)
    if (self.segment_feature_name in examples
        and 'segment_ids' in accepted):
      kwargs['segment_ids'] = examples[self.segment_feature_name].reshape(
          batch * list_size, seq_len)
    pooled = self.encoder(flat, training=training, **kwargs)
    pooled = nn.Dropout(self.dropout, deterministic=not training)(pooled)
    scores = nn.Dense(1, name='score')(pooled)
    logits = scores.reshape(batch, list_size)
    return jnp.where(mask, logits, jnp.log(1e-10))


def warm_start_from(params: Mapping[str, Any],
                    pretrained: Mapping[str, Array],
                    verbose: bool = False,
                    strict: bool = False) -> Dict[str, Any]:
  """Overlays pretrained arrays onto a param tree by '/'-joined path suffix.

  Matches respect path boundaries ('LayerNorm_0/scale' never matches
  'block_0/LayerNorm_0/scale'-keyed params unless no longer name does)
  and prefer the LONGEST matching pretrained name — first-match-wins over
  plain endswith silently overlaid the wrong tensor whenever one
  pretrained name was a suffix of another's path. Shapes must match;
  unmatched params keep their fresh initialization — the same
  partial-restore contract as TFR-BERT's encoder warm start
  (tfrbert_task.py:346-361). ``strict=True`` additionally raises if any
  pretrained entry went unused (the assert_existing_objects_matched
  analog).
  """
  flat = jax.tree_util.tree_flatten_with_path(dict(params))
  leaves, treedef = flat
  # Longest name first: the most specific suffix wins.
  by_len = sorted(pretrained.items(), key=lambda kv: -len(kv[0]))
  out = []
  used = set()
  for path, leaf in leaves:
    key = '/'.join(str(getattr(p, 'key', p)) for p in path)
    match = None
    for name, value in by_len:
      boundary_ok = key == name or key.endswith('/' + name)
      if boundary_ok and value.shape == leaf.shape:
        match = (name, value)
        break
    if match:
      used.add(match[0])
      out.append(jnp.asarray(match[1], leaf.dtype))
      if verbose:
        print(f'warm-start: {key} <- {match[0]}')
    else:
      out.append(leaf)
  unused = set(pretrained) - used
  if unused:
    if strict:
      raise ValueError(f'unused pretrained entries: {sorted(unused)}')
    if verbose:
      print(f'warm-start: {len(unused)} pretrained entries unused: '
            f'{sorted(unused)[:5]}...')
  return jax.tree_util.tree_unflatten(treedef, out)
