"""Device-time profiler for the flagship train step.

Captures a jax.profiler trace of N steps and prints the per-step DEVICE
time from the xplane (the tunnel/dispatch-free number), plus the top XLA
ops. This is how the 2.17 ms/step device time in PARITY.md was measured.
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
USE_BN = '--no_bn' not in sys.argv  # --no_bn reproduces the 1.06 ms figure
NO_FUSED = '--no_fused' in sys.argv  # disable the fused Pallas BN tower
BF16 = '--bf16' in sys.argv  # bfloat16 activations (TPU-native config)
EVAL = '--eval' in sys.argv  # profile the eval step (fwd + metric suite)
PALLAS_SORT = '--pallas_sort' in sys.argv  # force the fused sort in metrics
NO_PALLAS_SORT = '--no_pallas_sort' in sys.argv  # disable auto fast paths


def main():
  import jax
  import numpy as np
  import optax

  from ranking_tpu import models, ops, train
  from ranking_tpu.data.batch import batch_from_labels
  if NO_FUSED:
    from ranking_tpu.ops.pallas import fused_bn
    fused_bn.set_enabled(False)

  rng = np.random.RandomState(0)
  B, L, F = 128, 200, 136
  labels = rng.randint(0, 5, size=(B, L)).astype(np.float32)
  batch = batch_from_labels(
      labels=labels, examples={'x': rng.randn(B, L, F).astype(np.float32)})
  import jax.numpy as jnp
  model = models.RankingModel(
      scorer=models.DNNScorer(hidden_layer_dims=(1024, 512, 256),
                              input_grad=False,
                              dropout=0.0, use_batch_norm=USE_BN,
                              dtype=jnp.bfloat16 if BF16 else jnp.float32))
  state = train.create_train_state(
      model, optax.adam(1e-3), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask)
  if PALLAS_SORT:
    ops.pallas.set_enabled(True)
  elif NO_PALLAS_SORT:
    ops.pallas.set_enabled(False)
  if EVAL:
    metric_fns = {}
    for topn in (1, 5, 10, None):
      name = f'ndcg@{topn}' if topn else 'ndcg'
      metric_fns[name] = ops.make_ranking_metric_fn(
          ops.RankingMetricKey.NDCG, topn=topn)
    metric_fns['mrr'] = ops.make_ranking_metric_fn(ops.RankingMetricKey.MRR)
    eval_fn = jax.jit(train.make_eval_step(metric_fns))
    states0 = train.init_metric_states(metric_fns)

    def step(state, batch, key):
      del key
      states, _ = eval_fn(state, batch, states0)
      return state, {'loss': states[next(iter(metric_fns))].total}
  else:
    step = jax.jit(train.make_train_step(
        ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)),
        donate_argnums=0 if not EVAL else ())
  key = jax.random.PRNGKey(1)
  for _ in range(3):
    state, m = step(state, batch, key)
  float(m['loss'])

  trace_dir = tempfile.mkdtemp(prefix='rt_trace_')
  jax.profiler.start_trace(trace_dir)
  t0 = time.perf_counter()
  for _ in range(STEPS):
    state, m = step(state, batch, key)
  float(m['loss'])
  wall = time.perf_counter() - t0
  jax.profiler.stop_trace()

  xplanes = glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True)
  device_ms = None
  top = []
  try:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(xplanes[0], 'rb').read())
    for plane in xs.planes:
      if not plane.name.startswith('/device:'):
        continue
      meta = {k: v.name for k, v in plane.event_metadata.items()}
      for line in plane.lines:
        if line.name == 'XLA Modules':
          agg = defaultdict(int)
          for ev in line.events:
            agg[meta.get(ev.metadata_id, '?')] += ev.duration_ps
          for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:3]:
            top.append([name.split('(')[0], round(dur / 1e9, 3)])
          device_ms = sum(agg.values()) / 1e9
        elif line.name == 'XLA Ops' and '--ops' in sys.argv:
          agg = defaultdict(int)
          for ev in line.events:
            agg[meta.get(ev.metadata_id, '?')] += ev.duration_ps
          for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
            # per-step ms per op
            top.append(['op:' + name[:64], round(dur / 1e9 / STEPS, 4)])
  except Exception as e:  # TF protos unavailable: report wall only
    top = [['xplane parse failed', str(e)[:60]]]

  out = {
      'steps': STEPS,
      'batch_norm': USE_BN,
      'fused_bn': USE_BN and not NO_FUSED,
      'dtype': 'bf16' if BF16 else 'f32',
      'mode': 'eval' if EVAL else 'train',
      'pallas_sort': PALLAS_SORT,
      'wall_ms_per_step': round(wall / STEPS * 1e3, 3),
      'device_ms_per_step': (round(device_ms / STEPS, 3)
                             if device_ms else None),
      'device_lists_per_sec': (round(128 * STEPS / (device_ms / 1e3))
                               if device_ms else None),
      'modules': top,
      'trace_dir': trace_dir,
  }
  print(json.dumps(out))


if __name__ == '__main__':
  main()
