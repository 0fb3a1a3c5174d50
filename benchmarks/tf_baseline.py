"""Measures the reference TF-Ranking training throughput on this machine.

Loads the reference's actual loss core (/root/reference/tensorflow_ranking/
python/losses_impl.py, shimmed past the removed tf.estimator dependency) and
times the canonical flagship workload — batch 128 query lists x list_size
200 x 136 features, DNN 1024-512-256 scorer, softmax listwise loss, Adam —
as a tf.function train step on CPU (the reference's only available backend
here). Writes BASELINE_MEASURED.json used by bench.py's ``vs_baseline``.

This benchmarks the reference code, it does not copy it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import tensorflow as tf

B, L, F = 128, 200, 136
HIDDEN = (1024, 512, 256)
WARMUP, ITERS = 3, 10


def _load_reference_losses():
  """Imports reference losses_impl without the estimator-era package init
  (one shared shim: benchmarks/quality_parity.load_reference_modules)."""
  from quality_parity import load_reference_modules
  losses_impl, _, _ = load_reference_modules()
  return losses_impl


def main():
  losses_impl = _load_reference_losses()

  rng = np.random.RandomState(0)
  feats = tf.constant(rng.randn(B, L, F).astype(np.float32))
  labels_np = rng.randint(0, 5, size=(B, L)).astype(np.float32)
  labels_np[:, -L // 8:] = -1.0
  labels = tf.constant(labels_np)

  layers = []
  for h in HIDDEN:
    layers.append(tf.keras.layers.Dense(h, activation='relu'))
  layers.append(tf.keras.layers.Dense(1))
  tower = tf.keras.Sequential(layers)

  loss_obj = losses_impl.SoftmaxLoss(name='softmax_loss')
  optimizer = tf.keras.optimizers.Adam(1e-3)

  @tf.function
  def train_step(feats, labels):
    with tf.GradientTape() as tape:
      flat = tf.reshape(feats, [B * L, F])
      logits = tf.reshape(tower(flat, training=True), [B, L])
      loss = loss_obj.compute(
          labels, logits, weights=None,
          reduction=tf.compat.v1.losses.Reduction.SUM_BY_NONZERO_WEIGHTS)
    grads = tape.gradient(loss, tower.trainable_variables)
    optimizer.apply_gradients(zip(grads, tower.trainable_variables))
    return loss

  for _ in range(WARMUP):
    loss = train_step(feats, labels)
  _ = float(loss)

  t0 = time.perf_counter()
  for _ in range(ITERS):
    loss = train_step(feats, labels)
  _ = float(loss)
  dt = time.perf_counter() - t0
  eps = B * ITERS / dt

  out = {
      'tf_ranking_examples_per_sec': round(eps, 2),
      'workload': f'B{B}xL{L}xF{F} DNN{HIDDEN} softmax train step',
      'backend': 'tensorflow-cpu ' + tf.__version__,
      'measured_loss': float(loss),
  }
  # benchmarks/ lives in the repo root; write next to bench.py (the
  # path bench.py reads for vs_baseline).
  path = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), 'BASELINE_MEASURED.json')
  with open(os.path.abspath(path), 'w') as f:
    json.dump(out, f, indent=2)
  print(json.dumps(out))


if __name__ == '__main__':
  main()
