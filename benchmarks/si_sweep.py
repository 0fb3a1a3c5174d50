"""Scale-invariant Approx* recipe: list-size crossover sweep.

Round-5 verdict item 5: round 4 justified the factory's
`scale_invariant=True` default for approx keys at exactly two points
(L=128 win +0.20 NDCG@5, L=10 gives back ~0.05 approx_mrr within
tolerance). This sweep locates the behavior across
L in {10, 32, 64, 128, 200} — SI vs the reference-exact stock recipe
(`params={'scale_invariant': False}`, the form pinned by the parity
tests), 5 seeds each, approx_ndcg_loss and approx_mrr_loss, on the
Web30K-shaped synthetic corpus at each L (same generator, model, and
optimizer as QUALITY_PARITY_WEB30K). Quality = NDCG@5 via the reference
metrics_impl on a 500-query held-out split.

The failure mode SI removes (APPROX_NDCG_DIAG.json): trained logit std
grows to 7-8 while the stock recipe divides pair differences by
temperature 0.1 — sigmoids saturate and optimization freezes
seed-chaotically. Smaller lists tolerate larger logit spreads before
saturating (fewer pairs near the decision boundary), so the stock
recipe's collapse is expected to onset somewhere between L=10 and L=128.

Run: python benchmarks/si_sweep.py [--seeds 5] [--steps 400]
Writes SI_SWEEP.json and prints a table.
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

HIDDEN = (256, 128)
BATCH = 32
LR = 0.003
TRAIN_QUERIES = 1500
VALI_QUERIES = 500
LIST_SIZES = (10, 32, 64, 128, 200)
LOSSES = ('approx_ndcg_loss', 'approx_mrr_loss')


def train_jax(loss_key, seed, steps, data, scale_invariant):
  import jax
  import optax

  from ranking_tpu import models, ops, train
  from ranking_tpu.data.batch import batch_from_labels
  train_x, train_y, vali_x, vali_y = data

  model = models.RankingModel(scorer=models.DNNScorer(
      hidden_layer_dims=HIDDEN, dropout=0.0, use_batch_norm=False))
  sample = batch_from_labels(labels=train_y[:BATCH],
                             examples={'x': train_x[:BATCH]})
  state = train.create_train_state(
      model, optax.adam(LR), jax.random.PRNGKey(seed),
      sample.context, sample.examples, sample.mask)
  # scale_invariant=True is the factory default; False is the
  # reference-exact stock recipe (temperature 0.1 on raw logits) that
  # the oracle parity tests pin value-for-value.
  loss_fn = ops.make_loss_fn(
      loss_key, params={'scale_invariant': scale_invariant})
  step = jax.jit(train.make_train_step(loss_fn), donate_argnums=0)
  key = jax.random.PRNGKey(seed + 1)
  for idx in qp.batch_stream(len(train_y), BATCH, steps, seed):
    batch = batch_from_labels(labels=train_y[idx],
                              examples={'x': train_x[idx]})
    state, _ = step(state, batch, key)
  vb = batch_from_labels(labels=vali_y, examples={'x': vali_x})
  logits, _ = train.steps._forward(state, vb, training=False)
  return np.asarray(logits)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--seeds', type=int, default=5)
  ap.add_argument('--steps', type=int, default=400)
  ap.add_argument('--list-sizes', type=str, default='')
  args = ap.parse_args()

  import jax
  jax.config.update('jax_platforms', 'cpu')

  list_sizes = (tuple(int(s) for s in args.list_sizes.split(','))
                if args.list_sizes else LIST_SIZES)
  ref = qp.load_reference_modules()

  out_path = os.path.join(REPO, 'SI_SWEEP.json')
  results = {}
  if args.list_sizes and os.path.exists(out_path):
    results = json.load(open(out_path)).get('results', {})
  for L in list_sizes:
    qp.BATCH = BATCH  # eval uses ref metrics directly; shape via data
    train_x, train_y = synth_web30k.generate(
        TRAIN_QUERIES, L, min_docs=max(2, L // 2), seed=0)
    vali_x, vali_y = synth_web30k.generate(
        VALI_QUERIES, L, min_docs=max(2, L // 2), seed=1)
    data = (train_x, train_y, vali_x, vali_y)
    results.setdefault(str(L), {})
    for loss_key in LOSSES:
      row = {}
      for recipe, si in (('si', True), ('stock', False)):
        vals = []
        for seed in range(args.seeds):
          logits = train_jax(loss_key, seed, args.steps, data, si)
          vals.append(qp.eval_ref_metrics(vali_y, logits, ref)['ndcg@5'])
        vals = np.array(vals)
        row[recipe] = {'ndcg@5_mean': round(float(vals.mean()), 4),
                       'ndcg@5_std': round(float(vals.std()), 4),
                       'seeds': [round(float(v), 4) for v in vals]}
      row['delta_si_minus_stock'] = round(
          row['si']['ndcg@5_mean'] - row['stock']['ndcg@5_mean'], 4)
      results[str(L)][loss_key] = row
      print(f'L={L} {loss_key}: si {row["si"]["ndcg@5_mean"]}'
            f'±{row["si"]["ndcg@5_std"]} stock '
            f'{row["stock"]["ndcg@5_mean"]}±{row["stock"]["ndcg@5_std"]} '
            f'delta {row["delta_si_minus_stock"]}', flush=True)

  out = {
      'config': f'DNN{HIDDEN}, Adam({LR}), B={BATCH}, '
                f'steps={args.steps}, seeds={args.seeds}, '
                f'synth_web30k corpus regenerated per L '
                f'(min_docs=L//2), NDCG@5 via reference metrics_impl '
                f'on {VALI_QUERIES} held-out queries',
      'results': results,
  }
  with open(out_path, 'w') as f:
    json.dump(out, f, indent=2)
  print(json.dumps({'done': True}))


if __name__ == '__main__':
  main()
