"""Pretrained TF2 BERT checkpoint ingestion for EncoderScorer.

The reference warm-starts its ranking model from a TF2 object-based BERT
checkpoint (tensorflow_ranking/extension/premade/tfrbert_task.py:346-361,
testdata ``bert_lite_tf2.ckpt`` + ``bert_lite_config.json``). This module
does the same for the flax ``TransformerEncoder``: it reads the checkpoint
with the TF checkpoint reader (no tf-models dependency), maps every
variable name onto the flax parameter path, and returns a ready
``(encoder, params)`` pair.

Checkpoint layout (official.nlp BertEncoder saved as
``tf.train.Checkpoint(model=encoder)``):

  layer_with_weights-0  word embeddings        -> token_embed
  layer_with_weights-1  position embeddings    -> pos_embed
  layer_with_weights-2  type embeddings        -> type_embed
  layer_with_weights-3  embedding layer norm   -> LayerNorm_0
  layer_with_weights-(4+i)  transformer layer i -> block_i
      _attention_layer/_{query,key,value}_dense  [H, A, D] kernels (flax
      MultiHeadDotProductAttention uses the same DenseGeneral layout)
      _attention_output_dense  [A, D, H]
      _attention_layer_norm / _output_layer_norm
      _intermediate_dense [H, I] / _output_dense [I, H]
  layer_with_weights-(4+N)  pooler dense        -> pooler
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ranking_tpu.models.encoder import TransformerEncoder

_SUFFIX = '/.ATTRIBUTES/VARIABLE_VALUE'


def _read_checkpoint(path: str) -> Dict[str, np.ndarray]:
  import tensorflow as tf
  reader = tf.train.load_checkpoint(path)
  out = {}
  for name in reader.get_variable_to_shape_map():
    if name.endswith(_SUFFIX) and name.startswith('model/'):
      key = name[len('model/'):-len(_SUFFIX)]
      out[key] = reader.get_tensor(name)
  return out


def load_tf2_bert_checkpoint(
    ckpt_path: str,
    config_path: str,
    dropout: Optional[float] = None,
) -> Tuple[TransformerEncoder, Dict[str, Any]]:
  """Builds a TransformerEncoder from a BERT config + TF2 checkpoint.

  Returns ``(encoder, params)`` where ``params`` is the encoder's flax
  parameter tree filled from the checkpoint. Raises if any checkpoint
  variable goes unused or any shape disagrees — the
  ``assert_existing_objects_matched`` analog of tfrbert_task.py:359.
  """
  with open(config_path) as f:
    cfg = json.load(f)
  if dropout is None:
    # The BERT config's own dropout (tfrbert warm-start fidelity);
    # explicit dropout= overrides for fine-tune recipes.
    dropout = cfg.get('hidden_dropout_prob', 0.1)
  encoder = TransformerEncoder(
      vocab_size=cfg['vocab_size'],
      hidden_dim=cfg['hidden_size'],
      num_layers=cfg['num_hidden_layers'],
      num_heads=cfg['num_attention_heads'],
      mlp_dim=cfg['intermediate_size'],
      max_len=cfg['max_position_embeddings'],
      type_vocab_size=cfg.get('type_vocab_size', 2),
      dropout=dropout,
  )
  raw = _read_checkpoint(ckpt_path)
  num_layers = cfg['num_hidden_layers']

  params: Dict[str, Any] = {}
  used = set()

  def take(key: str, expect_shape=None) -> jnp.ndarray:
    if key not in raw:
      raise KeyError(f'checkpoint variable missing: {key}')
    value = raw[key]
    if expect_shape is not None and tuple(value.shape) != tuple(expect_shape):
      raise ValueError(f'{key}: shape {value.shape} != {expect_shape}')
    used.add(key)
    return jnp.asarray(value, jnp.float32)

  h = cfg['hidden_size']
  a = cfg['num_attention_heads']
  d = h // a
  i_dim = cfg['intermediate_size']

  params['token_embed'] = {
      'embedding': take('layer_with_weights-0/embeddings',
                        (cfg['vocab_size'], h))}
  params['pos_embed'] = {
      'embedding': take('layer_with_weights-1/embeddings',
                        (cfg['max_position_embeddings'], h))}
  params['type_embed'] = {
      'embedding': take('layer_with_weights-2/embeddings',
                        (cfg.get('type_vocab_size', 2), h))}
  params['LayerNorm_0'] = {
      'scale': take('layer_with_weights-3/gamma', (h,)),
      'bias': take('layer_with_weights-3/beta', (h,))}

  for layer in range(num_layers):
    base = f'layer_with_weights-{4 + layer}'
    attn = {}
    for proj in ('query', 'key', 'value'):
      attn[proj] = {
          'kernel': take(f'{base}/_attention_layer/_{proj}_dense/kernel',
                         (h, a, d)),
          'bias': take(f'{base}/_attention_layer/_{proj}_dense/bias',
                       (a, d))}
    attn['out'] = {
        'kernel': take(f'{base}/_attention_output_dense/kernel', (a, d, h)),
        'bias': take(f'{base}/_attention_output_dense/bias', (h,))}
    params[f'block_{layer}'] = {
        'MultiHeadDotProductAttention_0': attn,
        'LayerNorm_0': {
            'scale': take(f'{base}/_attention_layer_norm/gamma', (h,)),
            'bias': take(f'{base}/_attention_layer_norm/beta', (h,))},
        'Dense_0': {
            'kernel': take(f'{base}/_intermediate_dense/kernel', (h, i_dim)),
            'bias': take(f'{base}/_intermediate_dense/bias', (i_dim,))},
        'Dense_1': {
            'kernel': take(f'{base}/_output_dense/kernel', (i_dim, h)),
            'bias': take(f'{base}/_output_dense/bias', (h,))},
        'LayerNorm_1': {
            'scale': take(f'{base}/_output_layer_norm/gamma', (h,)),
            'bias': take(f'{base}/_output_layer_norm/beta', (h,))},
    }

  pooler_base = f'layer_with_weights-{4 + num_layers}'
  params['pooler'] = {
      'kernel': take(f'{pooler_base}/kernel', (h, h)),
      'bias': take(f'{pooler_base}/bias', (h,))}

  unused = set(raw) - used
  if unused:
    raise ValueError(f'unmapped checkpoint variables: {sorted(unused)}')
  return encoder, params
