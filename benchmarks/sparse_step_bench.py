"""Device-time benchmark for embedding training paths across vocab sizes.

Compares, on one model (EmbeddingDNNScorer: pooled token embeddings ->
DNN tower), the three ways to train the tables:

  * ``dense``  — plain optax Adam: dense [vocab, dim] gradient + dense
    moment streams (what a naive port of the reference's embedding
    columns costs once IndexedSlices are gone);
  * ``lazy``   — dense gradient + LazyAdam row update (round-2 path);
  * ``sparse`` — make_sparse_train_step: ids deduplicated per batch,
    grads taken w.r.t. the gathered rows, O(ids-per-batch) optimizer
    update. The cost target is *vocab independence*.

Usage: python benchmarks/sparse_step_bench.py [--vocabs 30000,300000]
Prints one JSON line with device ms/step per (vocab, variant).
"""

import glob
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 10


def _device_ms(trace_dir):
  xplanes = glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True)
  try:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(xplanes[0], 'rb').read())
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
  from ranking_tpu.train import sparse as sparse_lib

  vocabs = [30_000, 300_000]
  DIM = 64
  zipf = False  # realistic skewed token frequencies (uniform = worst case)
  for a in sys.argv[1:]:
    if a.startswith('--vocabs'):
      vocabs = [int(v) for v in a.split('=', 1)[1].split(',')]
    if a.startswith('--dim'):
      DIM = int(a.split('=', 1)[1])
    if a == '--zipf':
      zipf = True

  B, L, T = 128, 50, 8

  def draw_ids(rng, vocab, shape):
    if not zipf:
      return rng.randint(0, vocab, size=shape).astype(np.int32)
    # Zipf(1.1) truncated to the vocab: the head dominates, so far fewer
    # distinct rows are touched per batch than under uniform ids.
    ids = rng.zipf(1.1, size=shape)
    return np.minimum(ids - 1, vocab - 1).astype(np.int32)
  rng = np.random.RandomState(0)
  labels = rng.randint(0, 5, size=(B, L)).astype(np.float32)
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)
  results = {}

  for vocab in vocabs:
    batch = batch_from_labels(
        labels=labels,
        examples={'document_tokens': draw_ids(rng, vocab, (B, L, T))},
        context={'query_tokens': draw_ids(rng, vocab, (B, T))})
    model = models.RankingModel(scorer=models.EmbeddingDNNScorer(
        hidden_layer_dims=(256, 128),
        vocab_sizes={'query_tokens': vocab, 'document_tokens': vocab},
        embedding_dim=DIM, dropout=0.0, use_batch_norm=False))

    def mkstate(sparse_tx=None, dense_tx=None):
      return train.create_train_state(
          model, dense_tx or optax.adam(1e-3), jax.random.PRNGKey(0),
          batch.context, batch.examples, batch.mask, sparse_tx=sparse_tx)

    max_rows = B * L * T + B * T
    lazy = train.LazyAdam(learning_rate=1e-3, max_rows=max_rows)

    # Build/run/free one variant at a time: at multi-GB vocabularies the
    # three states cannot coexist in HBM.
    def make_variant(name):
      if name == 'dense':
        return mkstate(), jax.jit(
            train.make_train_step(loss_fn), donate_argnums=0)
      if name == 'lazy':
        return mkstate(lazy), jax.jit(
            train.make_train_step(loss_fn), donate_argnums=0)
      if name == 'sparse_adagrad':
        # One accumulator instead of two moments: 2 row slabs per step.
        st = mkstate(train.LazyAdagrad(learning_rate=1e-3,
                                       max_rows=max_rows),
                     dense_tx=optax.adagrad(1e-3))
      else:
        st = mkstate(lazy)
      efs = sparse_lib.derive_embed_features(st.params, batch.context,
                                             batch.examples)
      return st, jax.jit(
          train.make_sparse_train_step(loss_fn, efs), donate_argnums=0)

    results[vocab] = {}
    for name in ('dense', 'lazy', 'sparse', 'sparse_adagrad'):
      state, step = make_variant(name)
      key = jax.random.PRNGKey(1)
      for _ in range(3):  # compile + warm
        state, m = step(state, batch, key)
      float(m['loss'])
      trace_dir = tempfile.mkdtemp(prefix=f'rt_sparse_{vocab}_{name}_')
      jax.profiler.start_trace(trace_dir)
      t0 = time.perf_counter()
      for _ in range(STEPS):
        state, m = step(state, batch, key)
      float(m['loss'])
      wall = time.perf_counter() - t0
      jax.profiler.stop_trace()
      dev = _device_ms(trace_dir)
      results[vocab][name] = {
          'wall_ms_per_step': round(wall / STEPS * 1e3, 3),
          'device_ms_per_step': round(dev / STEPS, 3) if dev else None,
      }
      del state, step
  print(json.dumps({'B': B, 'L': L, 'tokens_per_doc': T, 'dim': DIM,
                    'steps': STEPS, 'results': results}))


if __name__ == '__main__':
  main()
