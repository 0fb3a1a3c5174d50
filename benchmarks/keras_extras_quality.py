"""End-to-end learning checks for the keras-only loss keys.

The cross-framework matrices (QUALITY_PARITY*.json) cover every key the
reference's python-generation factory exposes — but six losses exist only
in the reference's keras generation (keras/losses.py), which cannot be
loaded standalone (TF 2.21 removed its estimator deps). Their VALUE
semantics are oracle-parity-tested (tests/test_reference_parity.py); this
benchmark closes the remaining gap: each key trains a ranker end to end
at the reference's own quality bar (L=128, 136 features, synthetic
Web30K-shaped graded data) and must lift held-out NDCG@5 far above the
untrained baseline.

Per-key recipes (output head + ranking score at eval):
  * ordinal_loss            [B,L,4] per-level logits; score = sum of level
                            probabilities (expected ordinal level)
  * multi_class_loss        [B,L,5] class logits (from_logits=True —
                            the head is a raw Dense); score = E[class]
  * click_em_loss           [B,L,2] (exam, rel) logits, trained on binary
                            clicks (rel>=2); score = relevance logit
  * mixture_em_loss         [B,L,3] model logits, trained on binary
                            clicks (the reference's label contract);
                            score = model mean
  * calibrated_softmax_loss scalar logits (virtual-label bins from the
                            graded labels)
  * coupled_rankdistil_loss  scalar logits; graded labels act as teacher
                            scores (the distillation contract)

Run:  python benchmarks/keras_extras_quality.py [--seeds 2] [--steps 400]
Writes KERAS_EXTRAS_QUALITY.json at the repo root and prints a table.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import synth_web30k

LIST_SIZE = 128
HIDDEN = (256, 128)
BATCH = 32
LR = 0.003
TRAIN_QUERIES = 1500
VALI_QUERIES = 500


def recipes():
  import jax.numpy as jnp

  def expected_level(lg):  # [B, L, 4] -> [B, L]
    return jnp.sum(jax.nn.sigmoid(lg), axis=-1)

  def expected_class(lg):  # [B, L, 5] -> [B, L]
    probs = jax.nn.softmax(lg, axis=-1)
    return jnp.sum(probs * jnp.arange(lg.shape[-1], dtype=jnp.float32),
                   axis=-1)

  import jax
  return {
      'ordinal_loss': dict(units=4, params={'ordinal_size': 4},
                           score=expected_level, labels='graded'),
      'multi_class_loss': dict(units=5,
                               params={'num_classes': 5,
                                       'from_logits': True},
                               score=expected_class, labels='graded'),
      'click_em_loss': dict(units=2, params={},
                            score=lambda lg: lg[..., 1], labels='clicks'),
      # Mixture-EM logits are [B, L, num_models] and its labels are
      # CLICKS (reference losses_impl.py:1501 'representing clicks' —
      # sigmoid CE per model); rank by the model mean.
      'mixture_em_loss': dict(units=3, params={},
                              score=lambda lg: jnp.mean(lg, axis=-1),
                              labels='clicks'),
      'calibrated_softmax_loss': dict(units=1, params={}, score=None,
                                      labels='graded'),
      'coupled_rankdistil_loss': dict(units=1, params={}, score=None,
                                       labels='teacher'),
  }


def run_key(key_name, recipe, seed, steps, data):
  import jax
  import jax.numpy as jnp
  import optax

  from ranking_tpu import models, ops, train
  from ranking_tpu.data.batch import batch_from_labels

  train_x, train_y, vali_x, vali_y = data
  if recipe['labels'] == 'clicks':
    fit_y = np.where(train_y >= 0, (train_y >= 2).astype(np.float32),
                     train_y)
  else:
    # 'graded' trains on the labels directly; for 'teacher'
    # (coupled_rankdistil) the graded labels ARE the teacher scores.
    fit_y = train_y

  units = recipe['units']
  model = models.RankingModel(scorer=models.DNNScorer(
      hidden_layer_dims=HIDDEN, output_units=units, dropout=0.0,
      use_batch_norm=False))
  sample = batch_from_labels(labels=fit_y[:BATCH],
                             examples={'x': train_x[:BATCH]})
  state = train.create_train_state(
      model, optax.adam(LR), jax.random.PRNGKey(seed),
      sample.context, sample.examples, sample.mask)
  loss_fn = ops.make_loss_fn(key_name, params=recipe['params'])
  step = jax.jit(train.make_train_step(loss_fn), donate_argnums=0)

  def scores(state, x, y):
    b = batch_from_labels(labels=y, examples={'x': x})
    logits, _ = train.steps._forward(state, b, training=False)
    if recipe['score'] is not None:
      logits = recipe['score'](logits)
    elif logits.ndim == 3:
      logits = logits[..., 0]
    return np.asarray(logits)

  before = eval_ndcg(vali_y, scores(state, vali_x, vali_y))
  rng = np.random.RandomState(seed)
  n = train_x.shape[0]
  key = jax.random.PRNGKey(seed + 1)
  for s in range(steps):
    idx = rng.randint(0, n, size=BATCH)
    b = batch_from_labels(labels=fit_y[idx], examples={'x': train_x[idx]})
    state, m = step(state, b, jax.random.fold_in(key, s))
  after = eval_ndcg(vali_y, scores(state, vali_x, vali_y))
  return before, after


def eval_ndcg(labels, logits):
  from ranking_tpu import ops
  vals, w = ops.make_ranking_metric_fn(
      ops.RankingMetricKey.NDCG, topn=5)(labels, logits)
  import jax.numpy as jnp
  return float(jnp.sum(vals * w) / jnp.sum(w))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--seeds', type=int, default=2)
  ap.add_argument('--steps', type=int, default=400)
  args = ap.parse_args()

  import jax
  jax.config.update('jax_platforms', 'cpu')

  train_x, train_y = synth_web30k.generate(
      TRAIN_QUERIES, LIST_SIZE, min_docs=LIST_SIZE // 2, seed=0)
  vali_x, vali_y = synth_web30k.generate(
      VALI_QUERIES, LIST_SIZE, min_docs=LIST_SIZE // 2, seed=1)
  data = (train_x, train_y, vali_x, vali_y)

  out, all_pass = {}, True
  for key_name, recipe in recipes().items():
    befores, afters = [], []
    for seed in range(args.seeds):
      b, a = run_key(key_name, recipe, seed, args.steps, data)
      befores.append(b)
      afters.append(a)
    # The bar: a large lift over the untrained scorer (the python-factory
    # keys measure 0.33 -> 0.75-0.96 on this corpus).
    ok = float(np.mean(afters)) >= float(np.mean(befores)) + 0.2
    all_pass &= ok
    out[key_name] = {
        'ndcg5_before': round(float(np.mean(befores)), 4),
        'ndcg5_after': round(float(np.mean(afters)), 4),
        'after_seeds': [round(float(a), 4) for a in afters],
        'pass': ok}
    print(f"{key_name:<28} {out[key_name]['ndcg5_before']:.4f} -> "
          f"{out[key_name]['ndcg5_after']:.4f}  "
          f"{'OK' if ok else 'FAIL'}", flush=True)

  result = {
      'workload': (f'synthetic Web30K-shaped, L={LIST_SIZE}, '
                   f'DNN{HIDDEN}, Adam({LR}), B={BATCH}, '
                   f'steps={args.steps}, seeds={args.seeds}; keras-only '
                   'keys (no python-factory counterpart to cross-train)'),
      'criterion': 'end-to-end learning: mean NDCG@5 after >= before+0.2',
      'results': out, 'all_pass': all_pass}
  with open(os.path.join(REPO, 'KERAS_EXTRAS_QUALITY.json'), 'w') as f:
    json.dump(result, f, indent=2)
  print(json.dumps({'all_pass': all_pass}))


if __name__ == '__main__':
  main()
