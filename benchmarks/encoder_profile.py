"""Device-time profile of the TFR-BERT-analog encoder train step.

Reproduces PARITY.md's encoder numbers (BERT-base dims: hidden 768,
mlp 3072, 4 layers, 30522-token vocab, 64 docs x seq 128, bf16
activations) and compares the embedding-table optimizer paths:

  * adam   — dense Adam over everything (the round-1 configuration whose
    23M-param f32 optimizer traffic was the residual step overhead);
  * lazy   — dense-grad LazyAdam on the token table;
  * sparse — make_sparse_train_step: the token table's gradient never
    materializes densely (nn.Embed redirected onto the gathered slab).

Usage: python benchmarks/encoder_profile.py [variant ...]
Prints one JSON line with device ms/step per variant.
"""

import glob
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 8
VOCAB = 30522
HIDDEN, MLP, LAYERS, HEADS = 768, 3072, 4, 12
DOCS, SEQ = 64, 128  # one batch of 8 lists x 8 docs, flattened


def _device_ms(trace_dir):
  try:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    xp = glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True)[0]
    xs.ParseFromString(open(xp, 'rb').read())
    for plane in xs.planes:
      if not plane.name.startswith('/device:'):
        continue
      for line in plane.lines:
        if line.name != 'XLA Modules':
          continue
        agg = defaultdict(int)
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for ev in line.events:
          agg[meta.get(ev.metadata_id, '?')] += ev.duration_ps
        return sum(agg.values()) / 1e9
  except Exception:
    return None
  return None


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax

  from ranking_tpu import models, ops, train
  from ranking_tpu.data.batch import batch_from_labels
  from ranking_tpu.models import encoder as enc_lib
  from ranking_tpu.train import sparse as sparse_lib

  variants = [a for a in sys.argv[1:] if not a.startswith('-')] or [
      'adam', 'lazy', 'sparse']

  B, L = 8, DOCS // 8
  rng = np.random.RandomState(0)
  batch = batch_from_labels(
      labels=rng.randint(0, 4, size=(B, L)).astype(np.float32),
      examples={
          'input_ids': rng.randint(0, VOCAB, size=(B, L, SEQ)
                                   ).astype(np.int32),
          'input_mask': np.ones((B, L, SEQ), np.int32),
          'segment_ids': rng.randint(0, 2, size=(B, L, SEQ)
                                     ).astype(np.int32)})
  model = models.RankingModel(scorer=models.EncoderScorer(
      encoder=enc_lib.TransformerEncoder(
          vocab_size=VOCAB, hidden_dim=HIDDEN, num_layers=LAYERS,
          num_heads=HEADS, mlp_dim=MLP, max_len=SEQ, type_vocab_size=2,
          dropout=0.0, dtype=jnp.bfloat16),
      dropout=0.0))
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)
  lazy = train.LazyAdam(learning_rate=1e-4,
                        table_pattern=r'token_embed/embedding',
                        max_rows=B * L * SEQ)

  results = {}
  for name in variants:
    sparse_tx = None if name == 'adam' else lazy
    state = train.create_train_state(
        model, optax.adamw(1e-4), jax.random.PRNGKey(0),
        batch.context, batch.examples, batch.mask, sparse_tx=sparse_tx)
    if name == 'sparse':
      efs = sparse_lib.derive_embed_features(
          state.params, batch.context, batch.examples)
      assert len(efs) == 1, efs
      step = jax.jit(train.make_sparse_train_step(loss_fn, efs),
                     donate_argnums=0)
    else:
      step = jax.jit(train.make_train_step(loss_fn), donate_argnums=0)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
      state, m = step(state, batch, key)
    float(m['loss'])
    trace_dir = tempfile.mkdtemp(prefix=f'rt_enc_{name}_')
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(STEPS):
      state, m = step(state, batch, key)
    float(m['loss'])
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    dev = _device_ms(trace_dir)
    results[name] = {
        'wall_ms_per_step': round(wall / STEPS * 1e3, 3),
        'device_ms_per_step': round(dev / STEPS, 3) if dev else None}
    del state, step
  print(json.dumps({'config': f'BERT-base dims {HIDDEN}/{MLP}x{LAYERS}, '
                              f'{DOCS} docs x seq {SEQ}, bf16, '
                              f'vocab {VOCAB}',
                    'steps': STEPS, 'results': results}))


if __name__ == '__main__':
  main()
