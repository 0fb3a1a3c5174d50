"""ApproxNDCG L=128 quality-gap diagnosis (round-4 VERDICT item 1).

The loss forward AND backward are bit-identical across frameworks
(verified: max grad diff 8e-9 on random [8,128] inputs), so the 0.026
NDCG@5 gap in QUALITY_PARITY_WEB30K.json must come from training
dynamics. The only configuration differences between the harness sides:

  * init: keras Dense = glorot_uniform; flax Dense = lecun_normal
  * Adam epsilon: keras 1e-7; optax 1e-8

This script trains ONLY single-side variants on the exact
quality_parity_web30k workload (same data, batch stream, steps, seeds)
and reports NDCG@5 via the reference metrics_impl, so results are
directly comparable to the committed TF row (0.5106 +/- 0.0067).

Variants (--variants, comma separated):
  jax_stock        reproduce the committed 0.485
  jax_glorot       kernel_init='glorot_uniform'
  jax_eps7         optax.adam(eps=1e-7)
  jax_glorot_eps7  both
  jax_temp_T       temperature override, e.g. jax_temp_1.0
  jax_glorot_temp_T  glorot + temperature override
  tf_lecun         TF side with lecun_normal init (causal check)
  tf_temp_T        TF side with temperature override

Run: python benchmarks/approx_ndcg_diag.py --variants jax_stock,jax_glorot
Appends results into APPROX_NDCG_DIAG.json (merged by variant name).
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import quality_parity as qp
import synth_web30k

LIST_SIZE = 128
NUM_FEATURES = synth_web30k.NUM_FEATURES
HIDDEN = (256, 128)
BATCH = 32
LR = 0.003
TRAIN_QUERIES = 1500
VALI_QUERIES = 500
STEPS = 400


def train_jax_variant(seed, data, *, kernel_init='lecun_normal',
                      eps=1e-8, temperature=None, scale_invariant=False):
  import jax
  import jax.numpy as jnp
  import optax
  from ranking_tpu import models, ops, train
  from ranking_tpu.data.batch import batch_from_labels
  train_x, train_y, vali_x, vali_y = data

  model = models.RankingModel(scorer=models.DNNScorer(
      hidden_layer_dims=HIDDEN, dropout=0.0, use_batch_norm=False,
      kernel_init=kernel_init))
  sample = batch_from_labels(labels=train_y[:BATCH],
                             examples={'x': train_x[:BATCH]})
  state = train.create_train_state(
      model, optax.adam(LR, eps=eps), jax.random.PRNGKey(seed),
      sample.context, sample.examples, sample.mask)
  params = {} if temperature is None else {'temperature': temperature}
  if scale_invariant:
    params['scale_invariant'] = True
  loss_fn = ops.make_loss_fn('approx_ndcg_loss', params=params)
  step = jax.jit(train.make_train_step(loss_fn), donate_argnums=0)
  key = jax.random.PRNGKey(seed + 1)
  for idx in qp.batch_stream(len(train_y), BATCH, STEPS, seed):
    batch = batch_from_labels(labels=train_y[idx],
                              examples={'x': train_x[idx]})
    state, _ = step(state, batch, key)
  vb = batch_from_labels(labels=vali_y, examples={'x': vali_x})
  logits, _ = train.steps._forward(state, vb, training=False)
  return np.asarray(logits)


def train_tf_variant(seed, data, ref, *, kernel_init=None, temperature=None):
  import tensorflow as tf
  losses_impl, metrics_impl, losses = ref
  train_x, train_y, vali_x, vali_y = data
  tf.config.experimental.enable_op_determinism()
  tf.random.set_seed(seed)
  kw = {}
  if kernel_init == 'lecun_normal':
    kw['kernel_initializer'] = tf.keras.initializers.VarianceScaling(
        scale=1.0, mode='fan_in', distribution='truncated_normal')
  layers = [tf.keras.layers.Dense(h, activation='relu', **kw)
            for h in HIDDEN]
  layers.append(tf.keras.layers.Dense(1, **kw))
  tower = tf.keras.Sequential(layers)
  extra = {}
  if temperature is not None:
    extra['extra_args'] = {'temperature': temperature}
  if temperature is None:
    loss_fn = losses.make_loss_fn('approx_ndcg_loss')
  else:
    # python-generation make_loss_fn has no temperature arg; build the
    # loss object directly like the factory does.
    loss_obj = losses_impl.ApproxNDCGLoss('approx_ndcg_loss',
                                          temperature=temperature)

    def loss_fn(labels, logits, features):
      return loss_obj.compute(labels, logits, None, reduction=tf.compat.v1
                              .losses.Reduction.SUM_BY_NONZERO_WEIGHTS)
  optimizer = tf.keras.optimizers.Adam(LR)

  @tf.function
  def step(feats, labels):
    b, l = labels.shape
    with tf.GradientTape() as tape:
      logits = tf.reshape(
          tower(tf.reshape(feats, [b * l, NUM_FEATURES]), training=True),
          [b, l])
      loss = loss_fn(labels, logits, {})
    grads = tape.gradient(loss, tower.trainable_variables)
    optimizer.apply_gradients(zip(grads, tower.trainable_variables))
    return loss

  for idx in qp.batch_stream(len(train_y), BATCH, STEPS, seed):
    step(tf.constant(train_x[idx]), tf.constant(train_y[idx]))
  logits = tf.reshape(
      tower(tf.reshape(vali_x, [-1, NUM_FEATURES]), training=False),
      vali_y.shape)
  return np.asarray(logits)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--variants', type=str, required=True)
  ap.add_argument('--seeds', type=int, default=5)
  args = ap.parse_args()

  import jax
  jax.config.update('jax_platforms', 'cpu')

  qp.LIST_SIZE, qp.NUM_FEATURES = LIST_SIZE, NUM_FEATURES
  qp.HIDDEN, qp.BATCH, qp.LR = HIDDEN, BATCH, LR
  ref = qp.load_reference_modules()
  train_x, train_y = synth_web30k.generate(
      TRAIN_QUERIES, LIST_SIZE, min_docs=LIST_SIZE // 2, seed=0)
  vali_x, vali_y = synth_web30k.generate(
      VALI_QUERIES, LIST_SIZE, min_docs=LIST_SIZE // 2, seed=1)
  data = (train_x, train_y, vali_x, vali_y)

  out_path = os.path.join(REPO, 'APPROX_NDCG_DIAG.json')
  results = {}
  if os.path.exists(out_path):
    with open(out_path) as f:
      results = json.load(f)

  for variant in args.variants.split(','):
    scores = []
    logit_stds = []
    for seed in range(args.seeds):
      if variant.startswith('tf'):
        kw = {}
        if 'lecun' in variant:
          kw['kernel_init'] = 'lecun_normal'
        if '_temp_' in variant:
          kw['temperature'] = float(variant.split('_temp_')[1])
        logits = train_tf_variant(seed, data, ref, **kw)
      else:
        kw = {'kernel_init': 'glorot_uniform' if 'glorot' in variant
              else 'lecun_normal',
              'eps': 1e-7 if 'eps7' in variant else 1e-8,
              'scale_invariant': '_si_' in variant}
        if '_temp_' in variant:
          kw['temperature'] = float(variant.split('_temp_')[1])
        logits = train_jax_variant(seed, data, **kw)
      m = qp.eval_ref_metrics(vali_y, logits, ref)
      scores.append(m['ndcg@5'])
      valid = logits[vali_y >= 0]
      logit_stds.append(float(np.std(valid)))
      print(f'{variant} seed {seed}: ndcg@5 {m["ndcg@5"]:.4f} '
            f'logit_std {logit_stds[-1]:.3f}', flush=True)
    arr = np.array(scores)
    results[variant] = {
        'ndcg5_mean': round(float(arr.mean()), 4),
        'ndcg5_std': round(float(arr.std()), 4),
        'seeds': [round(float(v), 4) for v in arr],
        'logit_std_mean': round(float(np.mean(logit_stds)), 3),
    }
    with open(out_path, 'w') as f:
      json.dump(results, f, indent=2)
    print(f'{variant}: {arr.mean():.4f} +/- {arr.std():.4f}', flush=True)

  print(json.dumps(results, indent=2))


if __name__ == '__main__':
  main()
