"""Pairwise Pallas kernel decision sweep at reference-canonical shapes.

Round-2 verdict item 7: the fused pairwise kernel's auto domain is
L >= 1024, but the reference's canonical lists are 100-200 docs — sweep
LambdaRank-style train steps (pairwise logistic x DCG-v2 lambda weight)
over L in {128, 256, 512, 1024} in bf16 and f32 on the real chip, kernel
forced ON vs OFF, and either lower the auto threshold where a win exists
or record that XLA is at parity below the threshold.

Per-shape batch keeps B*L = 16384 docs so rows are comparable. Timing uses
the scan multi-step dispatch (one host dispatch per SCAN_ITERS steps) to
keep the tunnel's per-dispatch latency out of the per-step number.

Run on the TPU:  python benchmarks/pairwise_sweep.py
Writes PAIRWISE_SWEEP.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_FEATURES = 136
HIDDEN = (1024, 512, 256)
SCAN_ITERS = 128
CHUNKS = 3
DOCS = 16384  # B * L held constant across rows


def _lambda_weight(recipe):
  from ranking_tpu import ops
  return {
      'v1': ops.lambda_weights.create_ndcg_lambda_weight,
      'v2': ops.lambda_weights.create_ndcg_lambda_weight_v2,
      'yeti': ops.lambda_weights.create_yeti_dcg_lambda_weight,
  }[recipe]()


def measure(list_size, dtype_name, force_kernel, recipe='v2'):
  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax

  from ranking_tpu import models, ops, train
  from ranking_tpu.data.batch import batch_from_labels
  from ranking_tpu.ops import pallas as pallas_ops

  pallas_ops.set_enabled(force_kernel)
  try:
    batch_size = DOCS // list_size
    dtype = jnp.bfloat16 if dtype_name == 'bf16' else jnp.float32
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 5, size=(batch_size, list_size)).astype(
        np.float32)
    labels[:, -list_size // 8:] = -1.0
    batch = batch_from_labels(
        labels=labels,
        examples={'float_features': rng.randn(
            batch_size, list_size, NUM_FEATURES).astype(np.float32)})
    batch = jax.device_put(batch)

    model = models.RankingModel(
        scorer=models.DNNScorer(hidden_layer_dims=HIDDEN, dropout=0.0,
                                use_batch_norm=False, dtype=dtype),
        transform_name='log1p')
    state = train.create_train_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        batch.context, batch.examples, batch.mask)
    loss_fn = ops.make_loss_fn(
        'pairwise_logistic_loss', lambda_weight=_lambda_weight(recipe))
    step = train.make_train_step(loss_fn)
    multi = jax.jit(train.make_multi_step(step), donate_argnums=0)
    stacked = jax.jit(lambda b: jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (SCAN_ITERS,) + x.shape),
        b))(batch)
    key = jax.random.PRNGKey(1)
    state, metrics = multi(state, stacked, key)
    float(metrics['loss'][-1])  # compile + warm barrier
    best = float('inf')
    for _ in range(CHUNKS):
      t0 = time.perf_counter()
      state, metrics = multi(state, stacked, key)
      float(metrics['loss'][-1])
      best = min(best, (time.perf_counter() - t0) / SCAN_ITERS)
    return best * 1000.0  # ms / step
  finally:
    pallas_ops.set_enabled(None)


def main():
  import argparse
  import jax
  global DOCS
  ap = argparse.ArgumentParser()
  ap.add_argument('--recipes', type=str, default='v2,v1,yeti')
  args = ap.parse_args()

  path = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), 'PAIRWISE_SWEEP.json')
  rows = []
  if os.path.exists(path):
    with open(path) as f:
      rows = [r for r in json.load(f).get('rows', [])
              if r.get('recipe', 'v2') not in args.recipes.split(',')]
  # Tile-aligned sweep at constant B*L, plus the exact flagship shape
  # (B128 x L200 — deliberately tile-UNALIGNED, it prices the padding).
  for recipe in args.recipes.split(','):
    for list_size, batch in ((128, 128), (200, 128), (256, 64), (512, 32),
                             (1024, 16)):
      DOCS = list_size * batch
      for dtype_name in ('f32', 'bf16'):
        off = measure(list_size, dtype_name, force_kernel=False,
                      recipe=recipe)
        on = measure(list_size, dtype_name, force_kernel=True,
                     recipe=recipe)
        row = {'recipe': recipe, 'list_size': list_size, 'batch': batch,
               'dtype': dtype_name, 'xla_ms': round(off, 4),
               'kernel_ms': round(on, 4),
               'kernel_speedup': round(off / on, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
  out = {
      'workload': (f'LambdaRank train step: pairwise logistic x lambda '
                   f'recipe (v1 = canonical DCG w/ smooth_fraction, '
                   f'v2, yeti = neighbor pairs), DNN{HIDDEN}, '
                   f'F={NUM_FEATURES}, scan x{SCAN_ITERS} dispatch, '
                   f'best of {CHUNKS}'),
      'decision': ('auto domain: engage when L %% 128 == 0 and '
                   'L >= 128, or L >= 1024 (ops/pallas/__init__.py '
                   'enabled()); tile-aligned L wins, unaligned '
                   'L=200 stays on XLA — one policy for all recipes'),
      'device': jax.devices()[0].device_kind,
      'rows': rows,
  }
  with open(path, 'w') as f:
    json.dump(out, f, indent=2)


if __name__ == '__main__':
  main()
