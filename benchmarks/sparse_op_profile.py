"""Per-op device-time breakdown of the sparse train step (xplane trace).

Identifies where the vocab-independent sparse step spends its time
(dedup sort, row gathers/scatters, dense tower) to guide kernel work.

Usage: python benchmarks/sparse_op_profile.py [--vocab=3000000] [--dim=128]
Prints the top ops by device time and a JSON summary line.
"""

import glob
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 10


def per_op_ms(trace_dir):
  xplanes = glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True)
  from tensorflow.tsl.profiler.protobuf import xplane_pb2
  xs = xplane_pb2.XSpace()
  xs.ParseFromString(open(xplanes[0], 'rb').read())
  agg = defaultdict(int)
  for plane in xs.planes:
    if not plane.name.startswith('/device:'):
      continue
    meta = {k: v.name for k, v in plane.event_metadata.items()}
    for line in plane.lines:
      if line.name != 'XLA Ops':
        continue
      for ev in line.events:
        agg[meta.get(ev.metadata_id, '?')] += ev.duration_ps
  return {k: v / 1e9 for k, v in agg.items()}


def main():
  import jax
  import numpy as np
  import optax

  from ranking_tpu import models, ops, train
  from ranking_tpu.data.batch import batch_from_labels
  from ranking_tpu.train import sparse as sparse_lib

  vocab, dim, variant = 3_000_000, 128, 'sparse_adagrad'
  for a in sys.argv[1:]:
    if a.startswith('--vocab='):
      vocab = int(a.split('=', 1)[1])
    if a.startswith('--dim='):
      dim = int(a.split('=', 1)[1])
    if a.startswith('--variant='):
      variant = a.split('=', 1)[1]

  B, L, T = 128, 50, 8
  rng = np.random.RandomState(0)
  labels = rng.randint(0, 5, size=(B, L)).astype(np.float32)
  batch = batch_from_labels(
      labels=labels,
      examples={'document_tokens': rng.randint(
          0, vocab, size=(B, L, T)).astype(np.int32)},
      context={'query_tokens': rng.randint(
          0, vocab, size=(B, T)).astype(np.int32)})
  model = models.RankingModel(scorer=models.EmbeddingDNNScorer(
      hidden_layer_dims=(256, 128),
      vocab_sizes={'query_tokens': vocab, 'document_tokens': vocab},
      embedding_dim=dim, dropout=0.0, use_batch_norm=False))
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)

  max_rows = B * L * T + B * T
  if variant == 'sparse_adagrad':
    sparse_tx = train.LazyAdagrad(learning_rate=1e-3, max_rows=max_rows)
    dense_tx = optax.adagrad(1e-3)
  else:
    sparse_tx = train.LazyAdam(learning_rate=1e-3, max_rows=max_rows)
    dense_tx = optax.adam(1e-3)
  state = train.create_train_state(
      model, dense_tx, jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask, sparse_tx=sparse_tx)
  efs = sparse_lib.derive_embed_features(state.params, batch.context,
                                         batch.examples)
  step = jax.jit(train.make_sparse_train_step(loss_fn, efs),
                 donate_argnums=0)

  key = jax.random.PRNGKey(1)
  for _ in range(3):
    state, m = step(state, batch, key)
  float(m['loss'])
  trace_dir = tempfile.mkdtemp(prefix='rt_sparse_ops_')
  jax.profiler.start_trace(trace_dir)
  t0 = time.perf_counter()
  for _ in range(STEPS):
    state, m = step(state, batch, key)
  float(m['loss'])
  wall = time.perf_counter() - t0
  jax.profiler.stop_trace()

  ops_ms = {k: v / STEPS for k, v in per_op_ms(trace_dir).items()}
  total = sum(ops_ms.values())
  print(f'wall {wall / STEPS * 1e3:.3f} ms/step, device {total:.3f} ms/step')
  groups = defaultdict(float)
  for name, ms in ops_ms.items():
    base = re.sub(r'[.\d]+$', '', name)
    groups[base] += ms
  for name, ms in sorted(ops_ms.items(), key=lambda kv: -kv[1])[:25]:
    print(f'{ms:8.4f} ms  {name}')
  print(json.dumps({'vocab': vocab, 'dim': dim, 'variant': variant,
                    'device_ms': round(total, 3),
                    'wall_ms': round(wall / STEPS * 1e3, 3),
                    'top_groups': {k: round(v, 4) for k, v in sorted(
                        groups.items(), key=lambda kv: -kv[1])[:12]}}))


if __name__ == '__main__':
  main()
