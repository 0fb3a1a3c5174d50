"""Cross-framework SERVING throughput: serialized ELWC requests scored
through each framework's full production serving artifact.

Both sides do the same job on the same request bytes:

  * ranking_tpu: `pipeline.export.export_predictor` StableHLO artifact ->
    `load_predictor` in a fresh process (no model code) -> `.predict`
    (native C++ length probe -> bucket pad -> parse -> jax_export call);
  * TF-Ranking: the reference's `keras/saved_model.py Signatures`
    (tensorflow_ranking/python/keras/saved_model.py:24-175, loaded
    standalone) wrapped over an equivalent Dense tower ->
    `tf.saved_model.save` -> `tf.saved_model.load` ->
    `signatures[PREDICT_METHOD_NAME]` (in-graph `parse_from_example_list`
    -> model).

Each side runs in its own fresh subprocess (the web30k_scale_run
methodology: a resident sibling framework costs the measured side
25-40% on this 4-core host). Writes SERVING_CROSS.json.

Run:  python benchmarks/serving_cross.py            # all sides
      python benchmarks/serving_cross.py --sides rt_cpu,tf
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NUM_FEATURES = 136
BATCH = 64          # ELWC requests per predict() call
MIN_DOCS, MAX_DOCS = 50, 100   # reference Web30K serving shape (50-200)
N_BATCHES = 8       # distinct request batches (defeats trivial caching)
ROUNDS = 12         # passes over all batches inside the clock
HIDDEN = (256, 128)
RESULT = os.path.join(REPO, 'SERVING_CROSS.json')


def make_requests():
  """[N_BATCHES][BATCH] serialized ELWCs, doc counts U[MIN_DOCS, MAX_DOCS].

  Deterministic: both sides score identical bytes."""
  from e2e_common import encode_elwc_batch_fixed
  rng = np.random.RandomState(7)
  batches = []
  for _ in range(N_BATCHES):
    feats = rng.randn(BATCH, MAX_DOCS, NUM_FEATURES).astype(np.float32)
    labels = rng.randint(0, 5, size=(BATCH, MAX_DOCS))
    counts = rng.randint(MIN_DOCS, MAX_DOCS + 1, size=BATCH)
    batches.append(encode_elwc_batch_fixed(feats, labels, counts))
  return batches


def run_ranking_tpu(quantize=None):
  import tempfile

  import jax
  import optax

  from ranking_tpu import models, train
  from ranking_tpu.data import FixedLenFeature
  from ranking_tpu.pipeline import export as export_lib

  example_spec = {
      'float_features': FixedLenFeature(shape=(NUM_FEATURES,),
                                        dtype='float32', default_value=0.0),
      'relevance': FixedLenFeature(shape=(), dtype='int64',
                                   default_value=0)}
  model = models.RankingModel(scorer=models.DNNScorer(
      hidden_layer_dims=HIDDEN, dropout=0.0, use_batch_norm=False))

  batches = make_requests()
  # Sample batch for export shapes (96/128: the bucket ladder covering
  # the 50-100-doc request range).
  from ranking_tpu.data import batch as batch_lib, parsers
  parsed = parsers.parse_example_list(
      batches[0], {}, {k: v for k, v in example_spec.items()
                       if k != 'relevance'}, list_size=128)
  sample = batch_lib.batch_from_labels(
      labels=np.zeros(parsed.mask.shape, np.float32),
      context=parsed.context, examples=parsed.examples, mask=parsed.mask)
  state = train.create_train_state(
      model, optax.adam(1e-3), jax.random.PRNGKey(0),
      sample.context, sample.examples, sample.mask)

  with tempfile.TemporaryDirectory(prefix='rt_serving_cross_') as d:
    export_lib.export_predictor(
        model, state.variables, {}, example_spec, d, sample,
        list_size_buckets=(96, 128), label_feature_name='relevance',
        quantize=quantize)
    predictor = export_lib.load_predictor(d)
    for b in batches:           # warm every bucket's compile/deserialize
      scores = predictor.predict(b)
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
      for b in batches:
        scores = predictor.predict(b)
    dt = time.perf_counter() - t0
  assert scores.shape[0] == BATCH
  return dt, jax.default_backend()


def run_tf():
  import tempfile

  import tensorflow as tf

  from web30k_scale_run import load_reference_data_module

  sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
  from quality_parity import load_reference_modules

  ref = load_reference_modules()
  load_reference_data_module(ref)   # registers tensorflow_ranking.python.data

  import importlib.util
  root = '/root/reference/tensorflow_ranking'
  spec = importlib.util.spec_from_file_location(
      'tensorflow_ranking.python.keras.saved_model',
      os.path.join(root, 'python', 'keras', 'saved_model.py'))
  saved_model_mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(saved_model_mod)

  example_spec = {
      'float_features': tf.io.FixedLenFeature(
          [NUM_FEATURES], tf.float32, default_value=[0.0] * NUM_FEATURES)}

  inputs = {
      'float_features': tf.keras.Input(shape=(None, NUM_FEATURES),
                                       dtype=tf.float32,
                                       name='float_features'),
      'example_list_mask': tf.keras.Input(shape=(None,), dtype=tf.bool,
                                          name='example_list_mask'),
  }
  x = inputs['float_features']
  for h in HIDDEN:
    x = tf.keras.layers.Dense(h, activation='relu')(x)
  logits = tf.keras.layers.Reshape((-1,))(tf.keras.layers.Dense(1)(x))
  # Keras 3 disallows raw tf ops on KerasTensors; Lambda wraps the
  # masked fill (the reference RestoreList's mask -> log(1e-10)).
  logits = tf.keras.layers.Lambda(
      lambda t: tf.where(t[1], t[0],
                         tf.fill(tf.shape(t[0]), float(np.log(1e-10)))),
      output_shape=lambda s: s[0])([logits, inputs['example_list_mask']])
  model = tf.keras.Model(inputs=inputs, outputs=logits)

  signatures = saved_model_mod.Signatures(
      model, context_feature_spec={}, example_feature_spec=example_spec,
      mask_feature_name='example_list_mask')(serving_default='predict')

  batches = [tf.constant(b) for b in make_requests()]
  with tempfile.TemporaryDirectory(prefix='tf_serving_cross_') as d:
    tf.saved_model.save(model, d, signatures=signatures)
    loaded = tf.saved_model.load(d)
    predict = loaded.signatures[tf.saved_model.PREDICT_METHOD_NAME]
    for b in batches:           # warm/trace
      out = predict(b)
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
      for b in batches:
        out = predict(b)
    dt = time.perf_counter() - t0
  assert list(out.values())[0].shape[0] == BATCH
  return dt, 'tensorflow-cpu (only available backend)'


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--sides', default='rt_tpu,rt_cpu,rt_cpu_int8,tf')
  ap.add_argument('--child', choices=['rt_cpu', 'rt_cpu_int8', 'rt_tpu',
                                      'tf'])
  args = ap.parse_args()

  if args.child:
    if args.child.startswith('rt_cpu'):
      import jax
      jax.config.update('jax_platforms', 'cpu')
    if args.child == 'tf':
      dt, backend = run_tf()
    else:
      dt, backend = run_ranking_tpu(
          quantize='int8' if args.child == 'rt_cpu_int8' else None)
    lists = BATCH * N_BATCHES * ROUNDS
    print('CHILD ' + json.dumps({
        'backend': backend,
        'predict_lists_per_s': round(lists / dt, 1),
        'ms_per_request_batch': round(dt / (N_BATCHES * ROUNDS) * 1e3, 2),
    }), flush=True)
    return

  out = {
      'config': f'DNN{HIDDEN}, {BATCH} ELWC requests/batch, '
                f'{MIN_DOCS}-{MAX_DOCS} docs/request, '
                f'{NUM_FEATURES} float features',
      'methodology': 'identical serialized ELWC bytes; each side a fresh '
                     'subprocess; full artifact round trip (ranking_tpu: '
                     'export_predictor StableHLO -> load_predictor; TF: '
                     "the reference Signatures -> tf.saved_model.save/"
                     'load -> predict signature)',
  }
  names = {'rt_tpu': 'ranking_tpu_tpu', 'rt_cpu': 'ranking_tpu_cpu',
           'rt_cpu_int8': 'ranking_tpu_cpu_int8', 'tf': 'tf_ranking'}
  if os.path.exists(RESULT):
    prev = json.load(open(RESULT))
    for k in names.values():
      if k in prev:
        out[k] = prev[k]
  for kind in [s.strip() for s in args.sides.split(',') if s.strip()]:
    row = None
    for attempt in range(2):  # the axon tunnel can hang a device fetch
      try:
        child = subprocess.run(
            [sys.executable, os.path.abspath(__file__), f'--child={kind}'],
            capture_output=True, text=True, timeout=1200)
      except subprocess.TimeoutExpired:
        print(json.dumps({names[kind]: f'timeout (attempt {attempt + 1})'}),
              flush=True)
        continue
      for line in child.stdout.splitlines():
        if line.startswith('CHILD '):
          row = json.loads(line[len('CHILD '):])
      if row is not None:
        break
      print(json.dumps({names[kind]:
                        f'no CHILD line rc={child.returncode} '
                        f'(attempt {attempt + 1})'}), flush=True)
      sys.stderr.write(child.stdout[-2000:] + child.stderr[-2000:])
    if row is None:
      continue  # keep the other sides' rows; this one keeps its old row
    out[names[kind]] = row
    print(json.dumps({names[kind]: row}), flush=True)
    # Incremental write: a later side hanging must not lose earlier rows.
    with open(RESULT, 'w') as f:
      json.dump(out, f, indent=2)

  print(json.dumps({'done': True}))


if __name__ == '__main__':
  main()
