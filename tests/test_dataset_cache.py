"""Decoded-once epoch cache (loader.cc Cache): stream identity + states.

The cache replays each record's decoded payload from an mmap'd spill
instead of re-parsing protos every epoch — a capability the reference's
tf.data pipeline lacks (build_ranking_dataset,
tensorflow_ranking/python/data.py:914-1017, re-parses per epoch). The
contract under test: the batch stream is BITWISE-identical whether the
cache is off, building (first pass), or complete (later runs); stale or
partial spills rebuild; lock contention degrades to uncached, never to a
wrong stream.
"""

import glob
import os

import numpy as np
import pytest

from ranking_tpu.data import FixedLenFeature, VarLenFeature, native
from ranking_tpu.data import parsers, proto, tfrecord
from ranking_tpu.data.dataset import native_ranking_dataset

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='no native toolchain')

VOCAB = parsers.Vocabulary([b'aa', b'bb', b'cc'], num_oov_buckets=2)


def _specs():
  return dict(
      context_feature_spec={
          'qf': FixedLenFeature(shape=(2,), dtype='float32',
                                default_value=0.0)},
      example_feature_spec={
          'f': FixedLenFeature(shape=(4,), dtype='float32',
                               default_value=0.0),
          'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0),
          'toks': VarLenFeature(dtype='string', max_len=6, vocab=VOCAB),
      })


def _write_corpus(dirpath, n_files=3, n_records=40, seed=0):
  rng = np.random.RandomState(seed)
  for fi in range(n_files):
    recs = []
    for _ in range(n_records):
      docs = [{'f': [float(x) for x in rng.randn(4)],
               'rel': int(rng.randint(5)),
               'toks': [b'aa', b'bb', b'cc', b'zz'][:rng.randint(1, 5)]}
              for _ in range(rng.randint(1, 12))]
      ctx = {'qf': [float(x) for x in rng.randn(2)]}
      recs.append(proto.make_elwc(ctx, docs).SerializeToString())
    tfrecord.write_records(
        os.path.join(dirpath, f'part-{fi}.tfrecord'), recs)
  return os.path.join(dirpath, 'part-*.tfrecord')


def _collect(pattern, cache_dir, epochs=3, **kw):
  out = []
  for b in native_ranking_dataset(
      pattern, batch_size=16, list_size=8, label_feature_name='rel',
      epochs=epochs, shuffle=True, shuffle_buffer_size=64,
      drop_remainder=False, seed=7, cache_dir=cache_dir, **_specs(), **kw):
    out.append((b.labels.copy(), b.mask.copy(),
                {k: v.copy() for k, v in b.context.items()},
                {k: v.copy() for k, v in b.examples.items()}))
  return out


def _assert_streams_equal(a, b):
  assert len(a) == len(b)
  for (l1, m1, c1, e1), (l2, m2, c2, e2) in zip(a, b):
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(m1, m2)
    assert c1.keys() == c2.keys() and e1.keys() == e2.keys()
    for k in c1:
      np.testing.assert_array_equal(c1[k], c2[k])
    for k in e1:
      np.testing.assert_array_equal(e1[k], e2[k])


def _loader(paths, cache_path, **kw):
  sp = _specs()
  kw.setdefault('epochs', 1)
  return native.NativeLoader(
      paths, sp['context_feature_spec'], sp['example_feature_spec'],
      batch_size=16, list_size=8, seed=7, drop_remainder=False,
      cache_path=cache_path, **kw)


def test_stream_bitwise_identical_off_build_read(tmp_path):
  pattern = _write_corpus(str(tmp_path))
  cdir = str(tmp_path / 'cache')
  base = _collect(pattern, None)              # no cache
  built = _collect(pattern, cdir)             # first pass: builds
  _assert_streams_equal(base, built)
  assert len(os.listdir(cdir)) == 1
  again = _collect(pattern, cdir)             # complete spill: read mode
  _assert_streams_equal(base, again)


def test_cache_states_and_lock_fallback(tmp_path):
  pattern = _write_corpus(str(tmp_path))
  cdir = str(tmp_path / 'cache')
  _collect(pattern, cdir, epochs=1)  # build + complete
  paths = sorted(glob.glob(pattern))
  sp = _specs()
  cp = native.cache_file_for(cdir, paths, sp['context_feature_spec'],
                             sp['example_feature_spec'], 8)
  assert os.path.exists(cp)

  rd = _loader(paths, cp)
  next(rd)
  assert rd.cache_state == 'read'
  # A second concurrent reader shares the complete spill (LOCK_SH).
  rd2 = _loader(paths, cp)
  next(rd2)
  assert rd2.cache_state == 'read'
  rd.close()
  rd2.close()

  # Corpus drift (mtime) -> fingerprint mismatch -> in-place rebuild...
  os.utime(paths[0], (1_000_000_000, 1_000_000_000))
  bd = _loader(paths, cp)
  next(bd)
  assert bd.cache_state == 'build'
  # ...and a loader contending with the builder's LOCK_EX runs uncached
  # (correct stream, no cache) instead of failing or double-writing.
  off = _loader(paths, cp)
  next(off)
  assert off.cache_state == 'off'
  bd.close()
  off.close()


def test_incomplete_spill_rebuilds_and_matches(tmp_path):
  pattern = _write_corpus(str(tmp_path))
  cdir = str(tmp_path / 'cache')
  base = _collect(pattern, None)
  # Abandon the stream mid-build: the spill stays incomplete on disk.
  it = native_ranking_dataset(
      pattern, batch_size=16, list_size=8, label_feature_name='rel',
      epochs=3, shuffle=True, shuffle_buffer_size=64,
      drop_remainder=False, seed=7, cache_dir=cdir, **_specs())
  next(it)
  it.close()
  assert len(os.listdir(cdir)) == 1
  # An incomplete spill is never trusted: the next loader rebuilds from
  # scratch and the stream still matches the uncached one bitwise.
  rebuilt = _collect(pattern, cdir)
  _assert_streams_equal(base, rebuilt)
  again = _collect(pattern, cdir)
  _assert_streams_equal(base, again)


def test_spec_change_gets_distinct_spill(tmp_path):
  pattern = _write_corpus(str(tmp_path))
  cdir = str(tmp_path / 'cache')
  paths = sorted(glob.glob(pattern))
  sp = _specs()
  a = native.cache_file_for(cdir, paths, sp['context_feature_spec'],
                            sp['example_feature_spec'], 8)
  b = native.cache_file_for(cdir, paths, sp['context_feature_spec'],
                            sp['example_feature_spec'], 16)  # list_size
  assert a != b
  # Vocab CONTENT feeds the name (the C++ structural hash can't see it).
  sp2 = _specs()
  sp2['example_feature_spec']['toks'] = VarLenFeature(
      dtype='string', max_len=6,
      vocab=parsers.Vocabulary([b'aa', b'bb', b'DIFFERENT'],
                               num_oov_buckets=2))
  c = native.cache_file_for(cdir, paths, sp2['context_feature_spec'],
                            sp2['example_feature_spec'], 8)
  assert a != c


def test_pipeline_dataset_cache_hparam(tmp_path):
  from ranking_tpu.pipeline import DatasetHparams
  from ranking_tpu.pipeline.pipeline import SimpleDatasetBuilder
  pattern = _write_corpus(str(tmp_path))
  sp = _specs()

  def builder(**over):
    hp = DatasetHparams(
        train_input_pattern=pattern, valid_input_pattern=pattern,
        train_batch_size=16, valid_batch_size=16, list_size=8,
        label_feature_name='rel', shuffle_buffer_size=64, **over)
    return SimpleDatasetBuilder(sp['context_feature_spec'],
                                sp['example_feature_spec'], hp, seed=7)

  def take(b, n=6):
    it = b.train_batches()
    out = [next(it) for _ in range(n)]
    labels = [x.labels.copy() for x in out]
    feats = [x.examples['f'].copy() for x in out]
    try:
      it.close()
    except AttributeError:
      pass
    return labels, feats

  plain_l, plain_f = take(builder())
  cdir = str(tmp_path / 'cache')
  cached_l, cached_f = take(builder(dataset_cache=cdir))
  for a, b in zip(plain_l, cached_l):
    np.testing.assert_array_equal(a, b)
  for a, b in zip(plain_f, cached_f):
    np.testing.assert_array_equal(a, b)
  assert os.listdir(cdir)  # the spill actually landed under the hparam

  # python engine: the cache is a no-op and must say so.
  with pytest.warns(UserWarning, match='dataset_cache'):
    take(builder(dataset_cache=cdir, dataset_engine='python'))


def test_cache_with_file_sharding_distinct_spills(tmp_path):
  """num_shards path subsets get distinct spill files (the fingerprint
  covers the exact path list) and identical streams vs uncached."""
  pattern = _write_corpus(str(tmp_path), n_files=4)
  cdir = str(tmp_path / 'cache')

  def collect(shard, cache):
    out = []
    for b in native_ranking_dataset(
        pattern, batch_size=8, list_size=8, label_feature_name='rel',
        epochs=2, shuffle=True, shuffle_buffer_size=32,
        drop_remainder=False, seed=5, cache_dir=cache,
        shard_index=shard, num_shards=2, **_specs()):
      out.append((b.labels.copy(),
                  {k: v.copy() for k, v in b.examples.items()}))
    return out

  for shard in (0, 1):
    base = collect(shard, None)
    built = collect(shard, cdir)
    again = collect(shard, cdir)
    assert len(base) == len(built) == len(again)
    for (l1, e1), (l2, e2), (l3, e3) in zip(base, built, again):
      np.testing.assert_array_equal(l1, l2)
      np.testing.assert_array_equal(l1, l3)
      for k in e1:
        np.testing.assert_array_equal(e1[k], e2[k])
        np.testing.assert_array_equal(e1[k], e3[k])
  assert len(os.listdir(cdir)) == 2  # one spill per shard


def test_cache_skip_batches_resume_identity(tmp_path):
  """skip_batches fast-forward over a cache (build AND read modes)
  continues bitwise-equal to batches[skip:] of an unskipped run — and
  the skipped records still reach the spill via the backfill."""
  pattern = _write_corpus(str(tmp_path))
  cdir = str(tmp_path / 'cache')

  def collect(cache, skip=0, epochs=2):
    out = []
    for b in native_ranking_dataset(
        pattern, batch_size=16, list_size=8, label_feature_name='rel',
        epochs=epochs, shuffle=True, shuffle_buffer_size=64,
        drop_remainder=True, seed=9, cache_dir=cache,
        skip_batches=skip, **_specs()):
      out.append((b.labels.copy(),
                  {k: v.copy() for k, v in b.examples.items()}))
    return out

  full = collect(None)
  # Build-mode skip: epoch-1 skipped batches never decode for the
  # consumer; the end-of-stream backfill must still complete the spill.
  skipped_build = collect(cdir, skip=3)
  assert len(skipped_build) == len(full) - 3
  for (l1, e1), (l2, e2) in zip(full[3:], skipped_build):
    np.testing.assert_array_equal(l1, l2)
    for k in e1:
      np.testing.assert_array_equal(e1[k], e2[k])
  # Read-mode skip over the (completed) spill.
  skipped_read = collect(cdir, skip=5)
  assert len(skipped_read) == len(full) - 5
  for (l1, e1), (l2, e2) in zip(full[5:], skipped_read):
    np.testing.assert_array_equal(l1, l2)
    for k in e1:
      np.testing.assert_array_equal(e1[k], e2[k])


def test_cache_lifecycle_fuzz(tmp_path):
  """Randomized lifecycle: random corpora/specs, partial consumption at
  random points, staleness events, repeated reopens — after every event
  the full stream must stay bitwise-equal to the uncached stream. The
  cache-side state machine (build/read/rebuild/backfill) must never
  change WHAT is streamed, only how fast."""
  for trial in range(4):
    rng = np.random.RandomState(100 + trial)
    d = tmp_path / f't{trial}'
    d.mkdir()
    n_files = int(rng.randint(1, 4))
    pattern = _write_corpus(str(d), n_files=n_files,
                            n_records=int(rng.randint(5, 40)),
                            seed=trial)
    cdir = str(d / 'cache')
    bs = int(rng.randint(3, 17))
    ls = int(rng.randint(4, 12))
    epochs = int(rng.randint(1, 4))
    drop = bool(rng.randint(2))
    seed = int(rng.randint(1000))

    def collect(cache, limit=None):
      out = []
      it = native_ranking_dataset(
          pattern, batch_size=bs, list_size=ls, label_feature_name='rel',
          epochs=epochs, shuffle=True, shuffle_buffer_size=32,
          drop_remainder=drop, seed=seed, cache_dir=cache, **_specs())
      for i, b in enumerate(it):
        out.append((b.labels.copy(),
                    {k: v.copy() for k, v in b.examples.items()}))
        if limit is not None and i + 1 >= limit:
          it.close()
          break
      return out

    def check(got):
      assert len(got) == len(base)
      for (l1, e1), (l2, e2) in zip(base, got):
        np.testing.assert_array_equal(l1, l2)
        for k in e1:
          np.testing.assert_array_equal(e1[k], e2[k])

    base = collect(None)
    # Random sequence of lifecycle events.
    for _ in range(3):
      event = rng.randint(3)
      if event == 0:        # full pass (build or read)
        check(collect(cdir))
      elif event == 1:      # abandon early -> possibly incomplete spill
        collect(cdir, limit=int(rng.randint(1, max(2, len(base)))))
      else:                 # staleness: touch a corpus file
        paths = sorted(glob.glob(pattern))
        os.utime(paths[rng.randint(len(paths))],
                 (1_000_000_000 + trial, 1_000_000_000))
    check(collect(cdir))    # and the stream is still exact
