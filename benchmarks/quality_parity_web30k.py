"""Cross-framework quality parity at the reference's own quality bar:
lists of 100+ docs, 136 features (examples/tf_ranking_libsvm.py:90-91) —
the Web30K-shaped companion to benchmarks/quality_parity.py's bundled-data
matrix.

Data is the deterministic synthetic Web30K-shaped corpus
(benchmarks/synth_web30k.py: graded 0..4 labels with MSLR skew driven by a
fixed nonlinear scoring function, variable list lengths 64..128). With 500
validation queries the metric means are tight enough for a 0.005 absolute
floor — the statistically meaningful version of "matches or beats"
(round-2 verdict items 3 and 9).

Run:  python benchmarks/quality_parity_web30k.py [--seeds 3] [--steps 400]
Writes QUALITY_PARITY_WEB30K.json at the repo root and prints a table.
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

# (display, loss key, ndcg lambda, bf16): every trainable key of the
# reference factory (the same sweep as the bundled-data matrix) now at
# the reference's own quality bar (L=128), plus the canonical LambdaRank
# recipe and the headline bf16 training dtype. --losses selects a subset.
LOSSES = (
    ('softmax_loss', 'softmax_loss', False, False),
    ('lambdarank', 'pairwise_logistic_loss', True, False),
    ('approx_ndcg_loss', 'approx_ndcg_loss', False, False),
    ('softmax_loss_bf16', 'softmax_loss', False, True),
    ('pairwise_logistic_loss', 'pairwise_logistic_loss', False, False),
    ('pairwise_hinge_loss', 'pairwise_hinge_loss', False, False),
    ('pairwise_soft_zero_one_loss', 'pairwise_soft_zero_one_loss',
     False, False),
    ('pairwise_mse_loss', 'pairwise_mse_loss', False, False),
    ('yeti_logistic_loss', 'yeti_logistic_loss', False, False),
    ('circle_loss', 'circle_loss', False, False),
    ('poly_one_softmax_loss', 'poly_one_softmax_loss', False, False),
    ('unique_softmax_loss', 'unique_softmax_loss', False, False),
    ('sigmoid_cross_entropy_loss', 'sigmoid_cross_entropy_loss',
     False, False),
    ('mean_squared_loss', 'mean_squared_loss', False, False),
    ('list_mle_loss', 'list_mle_loss', False, False),
    ('approx_mrr_loss', 'approx_mrr_loss', False, False),
    ('gumbel_approx_ndcg_loss', 'gumbel_approx_ndcg_loss', False, False),
    ('neural_sort_cross_entropy_loss', 'neural_sort_cross_entropy_loss',
     False, False),
    ('gumbel_neural_sort_cross_entropy_loss',
     'gumbel_neural_sort_cross_entropy_loss', False, False),
    ('neural_sort_ndcg_loss', 'neural_sort_ndcg_loss', False, False),
    ('gumbel_neural_sort_ndcg_loss', 'gumbel_neural_sort_ndcg_loss',
     False, False),
)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--seeds', type=int, default=3)
  ap.add_argument('--steps', type=int, default=400)
  ap.add_argument('--losses', type=str, default='',
                  help='comma-separated display names to run (subset); '
                       'the merged JSON keeps other rows')
  args = ap.parse_args()
  losses = LOSSES
  if args.losses:
    want = set(args.losses.split(','))
    unknown = want - {name for name, *_ in LOSSES}
    if unknown:
      raise SystemExit(f'unknown --losses: {sorted(unknown)}; '
                       f'known: {[n for n, *_ in LOSSES]}')
    losses = tuple(row for row in LOSSES if row[0] in want)

  import jax
  jax.config.update('jax_platforms', 'cpu')  # apples-to-apples with TF-CPU

  # Patch the shared harness onto this workload's shape.
  qp.LIST_SIZE, qp.NUM_FEATURES = LIST_SIZE, NUM_FEATURES
  qp.HIDDEN, qp.BATCH, qp.LR = HIDDEN, BATCH, LR

  ref = qp.load_reference_modules()
  train_x, train_y = synth_web30k.generate(
      TRAIN_QUERIES, LIST_SIZE, min_docs=LIST_SIZE // 2, seed=0)
  vali_x, vali_y = synth_web30k.generate(
      VALI_QUERIES, LIST_SIZE, min_docs=LIST_SIZE // 2, seed=1)
  data = (train_x, train_y, vali_x, vali_y)

  # Merge with an existing JSON so --losses subsets update in place.
  out_path = os.path.join(REPO, 'QUALITY_PARITY_WEB30K.json')
  summary = {}
  if args.losses and os.path.exists(out_path):
    with open(out_path) as f:
      summary = json.load(f).get('results', {})
  all_pass = True
  for name, loss_key, ndcg_lambda, bf16 in losses:
    print(f'... training {name}', flush=True)
    rows = {'tf': [], 'jax': []}
    # Graded labels make plain MRR saturate (~half the docs are relevant,
    # matching MSLR skew); the discriminative form binarizes at rel>=3 —
    # the RD-Suite eval-script convention for graded corpora.
    hard_y = np.where(vali_y >= 0, (vali_y >= 3).astype(np.float32),
                      vali_y)
    for seed in range(args.seeds):
      tf_logits = qp.train_tf(loss_key, seed, args.steps, data, ref,
                              ndcg_lambda)
      jx_logits = qp.train_jax(loss_key, seed, args.steps, data,
                               ndcg_lambda, bf16)

      def both(labels, logits, suffix=''):
        ref_m = qp.eval_ref_metrics(labels, logits, ref)
        return {f'{k}{suffix}': v for k, v in ref_m.items()}

      tf_row = {**both(vali_y, tf_logits),
                **both(hard_y, tf_logits, '[rel>=3]')}
      rows['tf'].append(tf_row)
      jx = qp.eval_jax_metrics(vali_y, jx_logits)
      jx.update({f'ref_{k}': v for k, v in both(vali_y, jx_logits).items()})
      jx.update({f'ref_{k}': v
                 for k, v in both(hard_y, jx_logits, '[rel>=3]').items()})
      rows['jax'].append(jx)
    entry = {}
    for metric in ('ndcg@5', 'mrr', 'mrr[rel>=3]'):
      tf_vals = np.array([r[metric] for r in rows['tf']])
      jx_vals = np.array([r[f'ref_{metric}'] for r in rows['jax']])
      own_vals = np.array([r.get(metric, np.nan) for r in rows['jax']])
      pooled = float(np.sqrt((tf_vals.std() ** 2 + jx_vals.std() ** 2) / 2))
      tol = max(2.0 * pooled, 0.005)  # tight floor: 500 validation queries
      delta = float(jx_vals.mean() - tf_vals.mean())
      ok = delta >= -tol
      all_pass &= ok
      entry[metric] = {
          'tf_mean': round(float(tf_vals.mean()), 4),
          'tf_std': round(float(tf_vals.std()), 4),
          'jax_mean': round(float(jx_vals.mean()), 4),
          'jax_std': round(float(jx_vals.std()), 4),
          'jax_own_metric_mean': (round(float(own_vals.mean()), 4)
                                  if np.isfinite(own_vals).all() else None),
          'tf_seeds': [round(float(v), 4) for v in tf_vals],
          'jax_seeds': [round(float(v), 4) for v in jx_vals],
          'delta': round(delta, 4), 'tol': round(tol, 4), 'pass': ok}
    summary[name] = entry

  # Recompute over the merged table, not just this invocation's rows.
  all_pass = all(m['pass'] for entry in summary.values()
                 for m in entry.values())
  out = {
      'workload': (f'synthetic Web30K-shaped (benchmarks/synth_web30k.py), '
                   f'L={LIST_SIZE} (64-128 real docs), F={NUM_FEATURES}, '
                   f'train {TRAIN_QUERIES}q / vali {VALI_QUERIES}q, '
                   f'DNN{HIDDEN}, Adam({LR}), B={BATCH}, '
                   f'steps={args.steps}, seeds={args.seeds}'),
      'criterion': 'parity_or_better: mean_jax >= mean_tf - '
                   'max(2*pooled_std, 0.005)',
      'results': summary, 'all_pass': all_pass}
  with open(out_path, 'w') as f:
    json.dump(out, f, indent=2)

  print(f"{'loss':<22} {'metric':<8} {'tf (ref impl)':<18} "
        f"{'ranking_tpu':<18} {'delta':<8} pass")
  for loss_key, entry in summary.items():
    for metric, e in entry.items():
      print(f"{loss_key:<22} {metric:<8} "
            f"{e['tf_mean']:.4f}+/-{e['tf_std']:.4f}    "
            f"{e['jax_mean']:.4f}+/-{e['jax_std']:.4f}    "
            f"{e['delta']:<8.4f} {'OK' if e['pass'] else 'FAIL'}")
  print(json.dumps({'all_pass': all_pass}))


if __name__ == '__main__':
  main()
