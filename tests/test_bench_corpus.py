"""Benchmark corpus tooling: fast wire-format ELWC encoder and the
synthetic Web30K-shaped generator (benchmarks/e2e_common.py,
benchmarks/synth_web30k.py) — these feed the e2e and cross-framework
runs, so their encodings must be byte-exact and their data learnable."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'benchmarks'))

import e2e_common
import synth_web30k

from ranking_tpu.data import FixedLenFeature, native, parsers, proto


def test_fast_encoder_matches_python_proto():
  rng = np.random.RandomState(3)
  feats = rng.randn(4, 6, 9).astype(np.float32)
  labels = rng.randint(0, 5, size=(4, 6))
  fast = e2e_common.encode_elwc_batch_fixed(feats, labels)
  slow = [proto.make_elwc({}, [
      {'float_features': feats[i, d].tolist(),
       'relevance': [int(labels[i, d])]}
      for d in range(6)]).SerializeToString() for i in range(4)]
  for i in range(4):
    # Vectorized == scalar manual encoder, byte-exact.
    assert fast[i] == e2e_common.encode_elwc(feats[i], labels[i])
  # vs the protobuf runtime: parse-equal (make_elwc additionally emits an
  # explicit empty context submessage, wire-equivalent to omitting it).
  spec = {'float_features': FixedLenFeature(shape=(9,), dtype='float32',
                                            default_value=0.0),
          'relevance': FixedLenFeature(shape=(), dtype='int64',
                                       default_value=0)}
  a = parsers.parse_example_list(fast, {}, spec, list_size=6)
  b = parsers.parse_example_list(slow, {}, spec, list_size=6)
  np.testing.assert_array_equal(a.sizes, b.sizes)
  np.testing.assert_array_equal(a.examples['float_features'],
                                b.examples['float_features'])
  np.testing.assert_array_equal(a.examples['relevance'],
                                b.examples['relevance'])


def test_fast_encoder_variable_counts_decode():
  rng = np.random.RandomState(4)
  feats = rng.randn(5, 8, 7).astype(np.float32)
  labels = rng.randint(0, 5, size=(5, 8))
  counts = np.array([1, 3, 8, 2, 5])
  recs = e2e_common.encode_elwc_batch_fixed(feats, labels, counts)
  spec = dict(
      context_spec={},
      example_spec={
          'float_features': FixedLenFeature(shape=(7,), dtype='float32',
                                            default_value=0.0),
          'relevance': FixedLenFeature(shape=(), dtype='int64',
                                       default_value=0)})
  parsed = parsers.parse_example_list(recs, spec['context_spec'],
                                      spec['example_spec'], list_size=8)
  np.testing.assert_array_equal(parsed.sizes, counts)
  for i, n in enumerate(counts):
    np.testing.assert_allclose(
        parsed.examples['float_features'][i, :n], feats[i, :n], rtol=1e-6)
    np.testing.assert_array_equal(
        parsed.examples['relevance'][i, :n], labels[i, :n])
  if native.available():
    nat = native.decode_elwc_batch(recs, 8, spec['context_spec'],
                                   spec['example_spec'])
    np.testing.assert_array_equal(nat.sizes, parsed.sizes)
    np.testing.assert_array_equal(nat.examples['float_features'],
                                  parsed.examples['float_features'])


def test_synth_generator_stats_and_learnability():
  feats, labels = synth_web30k.generate(200, 64, seed=3)
  valid = labels >= 0
  # Variable lengths within [L/2, L]; padding features zeroed.
  counts = valid.sum(1)
  assert counts.min() >= 32 and counts.max() <= 64
  assert np.all(feats[~valid] == 0.0)
  # MSLR-like skew: about half the real docs are label 0.
  frac0 = (labels[valid] == 0).mean()
  assert 0.4 < frac0 < 0.6
  assert set(np.unique(labels[valid])) <= {0, 1, 2, 3, 4}
  # Learnable: the generator's own scoring function must beat random
  # ranking by a wide margin (NDCG@5 of truth vs shuffled scores).
  from ranking_tpu.ops import metric_registry
  s = synth_web30k.true_scores(feats)
  ndcg_true = float(metric_registry.compute_mean(
      'ndcg', labels, np.where(valid, s, 0.0), topn=5))
  rng = np.random.RandomState(0)
  ndcg_rand = float(metric_registry.compute_mean(
      'ndcg', labels, rng.randn(*s.shape), topn=5))
  assert ndcg_true > ndcg_rand + 0.3, (ndcg_true, ndcg_rand)


def test_generator_deterministic():
  a = synth_web30k.generate(10, 16, seed=5)
  b = synth_web30k.generate(10, 16, seed=5)
  np.testing.assert_array_equal(a[0], b[0])
  np.testing.assert_array_equal(a[1], b[1])
  c = synth_web30k.generate(10, 16, seed=6)
  assert not np.array_equal(a[1], c[1])


def test_keras_extras_recipes_train_one_step():
  """Every keras-only key's benchmark recipe (multi-unit heads, score
  derivations, label conventions) runs a real train step + eval scoring —
  the multi-unit-head path through make_train_step that the
  python-factory sweep never exercises."""
  import keras_extras_quality as keq

  feats, labels = synth_web30k.generate(8, 16, min_docs=8, seed=4)
  data = (feats, labels, feats[:4], labels[:4])
  for key_name, recipe in keq.recipes().items():
    before, after = keq.run_key(key_name, recipe, seed=0, steps=2,
                                data=data)
    assert np.isfinite(before) and np.isfinite(after), key_name
