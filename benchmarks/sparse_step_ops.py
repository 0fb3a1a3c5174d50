"""Op-level device-time breakdown for one train-step variant.

Usage: python benchmarks/sparse_step_ops.py [dense|lazy|sparse] [vocab]
Prints the top XLA ops by device time from an xplane trace.
"""

import glob
import sys
import os
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT = sys.argv[1] if len(sys.argv) > 1 else 'sparse'
VOCAB = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
DIM = int(sys.argv[3]) if len(sys.argv) > 3 else 64
STEPS = 10


def main():
  import jax
  import numpy as np
  import optax

  from ranking_tpu import models, ops, train
  from ranking_tpu.data.batch import batch_from_labels
  from ranking_tpu.train import sparse as sparse_lib

  B, L, T = 128, 50, 8
  rng = np.random.RandomState(0)
  labels = rng.randint(0, 5, size=(B, L)).astype(np.float32)
  batch = batch_from_labels(
      labels=labels,
      examples={'document_tokens': rng.randint(
          0, VOCAB, size=(B, L, T)).astype(np.int32)},
      context={'query_tokens': rng.randint(
          0, VOCAB, size=(B, T)).astype(np.int32)})
  model = models.RankingModel(scorer=models.EmbeddingDNNScorer(
      hidden_layer_dims=(256, 128),
      vocab_sizes={'query_tokens': VOCAB, 'document_tokens': VOCAB},
      embedding_dim=DIM, dropout=0.0, use_batch_norm=False))
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)
  lazy = train.LazyAdam(learning_rate=1e-3, max_rows=B * L * T + B * T)

  if VARIANT == 'dense':
    state = train.create_train_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        batch.context, batch.examples, batch.mask)
    step = jax.jit(train.make_train_step(loss_fn), donate_argnums=0)
  elif VARIANT == 'lazy':
    state = train.create_train_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        batch.context, batch.examples, batch.mask, sparse_tx=lazy)
    step = jax.jit(train.make_train_step(loss_fn), donate_argnums=0)
  else:
    state = train.create_train_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        batch.context, batch.examples, batch.mask, sparse_tx=lazy)
    efs = sparse_lib.derive_embed_features(state.params, batch.context,
                                           batch.examples)
    step = jax.jit(train.make_sparse_train_step(loss_fn, efs),
                   donate_argnums=0)

  key = jax.random.PRNGKey(1)
  for _ in range(3):
    state, m = step(state, batch, key)
  float(m['loss'])
  trace_dir = tempfile.mkdtemp(prefix='rt_ops_')
  jax.profiler.start_trace(trace_dir)
  for _ in range(STEPS):
    state, m = step(state, batch, key)
  float(m['loss'])
  jax.profiler.stop_trace()

  from tensorflow.tsl.profiler.protobuf import xplane_pb2
  xs = xplane_pb2.XSpace()
  xp = glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True)[0]
  xs.ParseFromString(open(xp, 'rb').read())
  for plane in xs.planes:
    if not plane.name.startswith('/device:'):
      continue
    meta = {k: v.name for k, v in plane.event_metadata.items()}
    for line in plane.lines:
      if line.name not in ('XLA Ops',):
        continue
      agg = defaultdict(int)
      for ev in line.events:
        agg[meta.get(ev.metadata_id, '?')] += ev.duration_ps
      total = sum(agg.values()) / 1e9 / STEPS
      print(f'variant={VARIANT} vocab={VOCAB} total {total:.3f} ms/step')
      for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f'  {dur/1e9/STEPS:8.3f} ms  {name[:100]}')
      return


if __name__ == '__main__':
  main()
