"""Cross-framework quality parity on the sparse->embedding workload.

The embedding-column configuration of BASELINE.json (config 4 analog,
reference recipe examples/tf_ranking_tfrecord.py:99-115): integer token
ids, per-feature embedding tables, mean pooling, shared DNN tower —
trained by

  * the actual reference TF-Ranking loss (losses.make_loss_fn loaded
    standalone from /root/reference) over a TF embedding model,
  * ranking_tpu's EmbeddingDNNScorer with dense Adam, and
  * ranking_tpu with optimizer='lazy_adam' + the SPARSE train step
    (vocab-independent embedding gradients),

all on identical id arrays. Both JAX variants must match or beat the TF
run on held-out NDCG@5 / MRR — evaluated with the REFERENCE
metrics_impl — within run variance. This is the quality proof that the
sparse embedding path is a pure optimization.

Data: the reference's bundled token ELWC sample (20 lists) saturates
every framework at NDCG 1.0 in a few steps — no discrimination — so the
workload is a deterministic synthetic token-overlap task: each query
draws tokens from a 1000-token vocabulary and each document plants
0-3 query tokens among its own; graded relevance = planted overlap.
Learning it requires the embeddings to encode token identity, and
held-out queries are new token combinations (generalization, not
memorization). Both frameworks read the same generated arrays.

Run: python benchmarks/quality_parity_embedding.py [--seeds 5] [--steps 150]
Writes QUALITY_PARITY_EMBEDDING.json and prints a table.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmarks.quality_parity import (  # noqa: E402
    REF_DATA,
    batch_stream,
    eval_ref_metrics,
    load_reference_modules,
)

VOCAB = 1000
EDIM = 16
HIDDEN = (64, 32)
BATCH = 16
LIST_SIZE = 10
Q_TOKENS = 4
D_TOKENS = 12
LR = 0.05
LOSSES = ('softmax_loss', 'approx_ndcg_loss')


def _token_lists(rng, n):
  """Token-overlap lists: doc relevance = planted query tokens (0-3)."""
  q = rng.randint(0, VOCAB, size=(n, Q_TOKENS)).astype(np.int32)
  d = rng.randint(0, VOCAB, size=(n, LIST_SIZE, D_TOKENS)).astype(np.int32)
  y = rng.randint(0, 4, size=(n, LIST_SIZE)).astype(np.float32)
  for i in range(n):
    for j in range(LIST_SIZE):
      k = int(y[i, j])
      if k:
        pos = rng.choice(D_TOKENS, size=k, replace=False)
        d[i, j, pos] = q[i][rng.choice(Q_TOKENS, size=k, replace=False)]
  return q, d, y


def load_token_data(train_n=500, eval_n=200):
  """Identical id arrays for every framework/variant; held-out queries."""
  q, d, y = _token_lists(np.random.RandomState(7), train_n)
  vq, vd, vy = _token_lists(np.random.RandomState(1234), eval_n)
  return q, d, y, vq, vd, vy


# --- TF-Ranking side ---------------------------------------------------------


def train_tf_emb(loss_key, seed, steps, data, ref):
  import tensorflow as tf
  _, _, losses = ref
  q, d, y, vq, vd, vy = data
  tf.random.set_seed(seed)
  # Distinct seeds: a seeded keras initializer returns the SAME values on
  # every call, which would start the two tables bitwise-identical
  # (correlated embeddings, understated TF-side run variance).
  q_table = tf.Variable(tf.keras.initializers.RandomNormal(
      stddev=1e-2, seed=seed)((VOCAB, EDIM)))
  d_table = tf.Variable(tf.keras.initializers.RandomNormal(
      stddev=1e-2, seed=seed + 1)((VOCAB, EDIM)))
  layers = [tf.keras.layers.Dense(h, activation='relu') for h in HIDDEN]
  layers.append(tf.keras.layers.Dense(1))
  tower = tf.keras.Sequential(layers)
  loss_fn = losses.make_loss_fn(loss_key)
  optimizer = tf.keras.optimizers.Adam(LR)

  def pool(table, ids):
    valid = ids >= 0
    safe = tf.where(valid, ids, tf.zeros_like(ids))
    emb = tf.gather(table, safe) * tf.cast(valid, tf.float32)[..., None]
    count = tf.maximum(
        tf.reduce_sum(tf.cast(valid, tf.float32), -1, keepdims=True), 1.0)
    return tf.reduce_sum(emb, -2) / count

  def forward(q_ids, d_ids, training):
    b, l = d_ids.shape[0], d_ids.shape[1]
    qp = tf.tile(pool(q_table, q_ids)[:, None, :], [1, l, 1])
    dp = pool(d_table, d_ids)
    feats = tf.concat([dp, qp], -1)
    return tf.reshape(
        tower(tf.reshape(feats, [b * l, 2 * EDIM]), training=training),
        [b, l])

  trainables = [q_table, d_table] + tower.trainable_variables

  @tf.function
  def step(q_ids, d_ids, labels):
    with tf.GradientTape() as tape:
      loss = loss_fn(labels, forward(q_ids, d_ids, True), {})
    optimizer.apply_gradients(
        zip(tape.gradient(loss, trainables), trainables))
    return loss

  for idx in batch_stream(len(y), BATCH, steps, seed):
    step(tf.constant(q[idx]), tf.constant(d[idx]), tf.constant(y[idx]))
  return np.asarray(forward(tf.constant(vq), tf.constant(vd), False))


# --- ranking_tpu side --------------------------------------------------------


def train_jax_emb(loss_key, seed, steps, data, sparse):
  import jax
  import optax

  from ranking_tpu import models, ops, train
  from ranking_tpu.data.batch import batch_from_labels
  from ranking_tpu.train import sparse as sparse_lib
  q, d, y, vq, vd, vy = data

  model = models.RankingModel(scorer=models.EmbeddingDNNScorer(
      hidden_layer_dims=HIDDEN,
      vocab_sizes={'query_tokens': VOCAB, 'document_tokens': VOCAB},
      embedding_dim=EDIM, dropout=0.0, use_batch_norm=False))

  def mkbatch(idx):
    return batch_from_labels(
        labels=y[idx], context={'query_tokens': q[idx]},
        examples={'document_tokens': d[idx]})

  sample = mkbatch(np.arange(BATCH))
  sparse_tx = train.LazyAdam(learning_rate=LR) if sparse else None
  state = train.create_train_state(
      model, optax.adam(LR), jax.random.PRNGKey(seed),
      sample.context, sample.examples, sample.mask, sparse_tx=sparse_tx)
  loss_fn = ops.make_loss_fn(loss_key)
  if sparse:
    efs = sparse_lib.derive_embed_features(state.params, sample.context,
                                           sample.examples)
    assert len(efs) == 2, efs
    step = jax.jit(train.make_sparse_train_step(loss_fn, efs),
                   donate_argnums=0)
  else:
    step = jax.jit(train.make_train_step(loss_fn), donate_argnums=0)
  key = jax.random.PRNGKey(seed + 1)
  for idx in batch_stream(len(y), BATCH, steps, seed):
    state, _ = step(state, mkbatch(idx), key)
  vb = batch_from_labels(labels=vy, context={'query_tokens': vq},
                         examples={'document_tokens': vd})
  logits, _ = train.steps._forward(state, vb, training=False)
  return np.asarray(logits)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--seeds', type=int, default=5)
  ap.add_argument('--steps', type=int, default=150)
  args = ap.parse_args()

  import jax
  jax.config.update('jax_platforms', 'cpu')

  ref = load_reference_modules()
  data = load_token_data()
  vy = data[-1]

  results = {}
  for loss_key in LOSSES:
    rows = {'tf': [], 'jax': [], 'jax_sparse': []}
    for seed in range(args.seeds):
      rows['tf'].append(eval_ref_metrics(
          vy, train_tf_emb(loss_key, seed, args.steps, data, ref), ref))
      rows['jax'].append(eval_ref_metrics(
          vy, train_jax_emb(loss_key, seed, args.steps, data, False), ref))
      rows['jax_sparse'].append(eval_ref_metrics(
          vy, train_jax_emb(loss_key, seed, args.steps, data, True), ref))
    results[loss_key] = rows

  summary = {}
  all_pass = True
  for loss_key, rows in results.items():
    entry = {}
    for metric in ('ndcg@5', 'mrr'):
      tf_vals = np.array([r[metric] for r in rows['tf']])
      entry[metric] = {'tf_mean': round(float(tf_vals.mean()), 4),
                       'tf_std': round(float(tf_vals.std()), 4)}
      for variant in ('jax', 'jax_sparse'):
        vals = np.array([r[metric] for r in rows[variant]])
        pooled = float(np.sqrt((tf_vals.std() ** 2 + vals.std() ** 2) / 2))
        tol = max(2.0 * pooled, 0.02)
        delta = float(vals.mean() - tf_vals.mean())
        ok = delta >= -tol  # parity-or-better
        all_pass &= ok
        entry[metric][variant] = {
            'mean': round(float(vals.mean()), 4),
            'std': round(float(vals.std()), 4),
            'delta': round(delta, 4), 'tol': round(tol, 4), 'pass': ok}
    summary[loss_key] = entry

  out = {'workload': (f'synthetic token-overlap, L={LIST_SIZE}, '
                      f'vocab={VOCAB} direct int ids, edim={EDIM}, DNN{HIDDEN}, '
                      f'Adam({LR}), B={BATCH}, steps={args.steps}, '
                      f'seeds={args.seeds}; all metrics via reference '
                      f'metrics_impl'),
         'results': summary, 'all_pass': all_pass}
  with open(os.path.join(REPO, 'QUALITY_PARITY_EMBEDDING.json'), 'w') as f:
    json.dump(out, f, indent=2)

  print(f"{'loss':<20} {'metric':<8} {'tf':<18} {'jax dense':<18} "
        f"{'jax sparse':<18} pass")
  for loss_key, entry in summary.items():
    for metric, e in entry.items():
      jd, js = e['jax'], e['jax_sparse']
      print(f"{loss_key:<20} {metric:<8} "
            f"{e['tf_mean']:.4f}+/-{e['tf_std']:.4f}    "
            f"{jd['mean']:.4f}+/-{jd['std']:.4f}    "
            f"{js['mean']:.4f}+/-{js['std']:.4f}    "
            f"{'OK' if jd['pass'] and js['pass'] else 'FAIL'}")
  print(json.dumps({'all_pass': all_pass}))


if __name__ == '__main__':
  main()
