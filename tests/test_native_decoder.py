"""Native C++ decoder == Python parser on reference + synthetic data."""

import numpy as np
import pytest

from ranking_tpu.data import FixedLenFeature, VarLenFeature, parsers, proto
from ranking_tpu.data import native, tfrecord

REF_DATA = '/root/reference/tensorflow_ranking/examples/data'

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='no native toolchain')


def test_scan_tfrecord_matches_python_reader():
  path = f'{REF_DATA}/train_elwc.tfrecord'
  expected = tfrecord.read_all_records(path, verify=True)
  got = native.read_tfrecord_payloads(path)
  assert got == expected


def test_decode_reference_elwc_matches_python_parser():
  records = tfrecord.read_all_records(f'{REF_DATA}/train_elwc.tfrecord')
  context_spec = {
      'query_tokens': VarLenFeature(dtype='string', max_len=8,
                                    hash_buckets=5000)}
  example_spec = {
      'document_tokens': VarLenFeature(dtype='string', max_len=30,
                                       hash_buckets=5000),
      'relevance': FixedLenFeature(shape=(), dtype='int64',
                                   default_value=0)}
  py = parsers.parse_example_list(records, context_spec, example_spec,
                                  list_size=6)
  nat = native.decode_elwc_batch(records, 6, context_spec, example_spec)
  np.testing.assert_array_equal(nat.sizes, py.sizes)
  np.testing.assert_array_equal(nat.mask, py.mask)
  np.testing.assert_array_equal(nat.context['query_tokens'],
                                py.context['query_tokens'])
  np.testing.assert_array_equal(nat.examples['document_tokens'],
                                py.examples['document_tokens'])
  np.testing.assert_array_equal(nat.examples['relevance'],
                                py.examples['relevance'])


def test_decode_synthetic_floats_and_ints():
  recs = []
  rng = np.random.RandomState(0)
  for i in range(7):
    docs = [{'f': list(rng.randn(3).astype(float)),
             'ids': [int(v) for v in rng.randint(0, 50, 4)],
             'rel': [int(rng.randint(0, 5))]}
            for _ in range(rng.randint(1, 5))]
    ctx = {'cf': [float(i)]}
    recs.append(proto.make_elwc(ctx, docs).SerializeToString())
  context_spec = {'cf': FixedLenFeature(shape=(1,), dtype='float32',
                                        default_value=0.0)}
  example_spec = {
      'f': FixedLenFeature(shape=(3,), dtype='float32', default_value=0.0),
      'ids': VarLenFeature(dtype='int64', max_len=6),
      'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)}
  py = parsers.parse_example_list(recs, context_spec, example_spec,
                                  list_size=3)
  nat = native.decode_elwc_batch(recs, 3, context_spec, example_spec)
  np.testing.assert_allclose(nat.context['cf'], py.context['cf'], rtol=1e-6)
  np.testing.assert_allclose(nat.examples['f'], py.examples['f'], rtol=1e-6)
  # Python pads varlen with spec.pad_value (-1 default): parity on ids.
  np.testing.assert_array_equal(nat.examples['ids'], py.examples['ids'])
  np.testing.assert_array_equal(nat.examples['rel'], py.examples['rel'])
  np.testing.assert_array_equal(nat.mask, py.mask)


def test_native_libsvm_matches_python():
  from ranking_tpu.data import libsvm
  py = libsvm.load_libsvm_lists(f'{REF_DATA}/train.txt', 10, 136,
                                use_native=False)
  nat = native.load_libsvm_lists(f'{REF_DATA}/train.txt', 10, 136)
  np.testing.assert_allclose(nat[0], py[0], rtol=1e-6)
  np.testing.assert_allclose(nat[1], py[1], rtol=1e-6)
  np.testing.assert_array_equal(nat[2], py[2])


def test_native_is_used_by_dataset_builder(tmp_path, monkeypatch):
  # The streaming dataset should produce identical batches whether the
  # native path resolves or not.
  from ranking_tpu.data import build_ranking_dataset

  kwargs = dict(
      data_format='example_list_with_context',
      batch_size=4,
      context_feature_spec={
          'query_tokens': VarLenFeature(dtype='string', max_len=6,
                                        hash_buckets=1000)},
      example_feature_spec={
          'document_tokens': VarLenFeature(dtype='string', max_len=20,
                                           hash_buckets=1000),
          'relevance': FixedLenFeature(shape=(), dtype='int64',
                                       default_value=0)},
      label_feature_name='relevance',
      list_size=5, epochs=1, shuffle=False, drop_remainder=False)

  fast = list(build_ranking_dataset(f'{REF_DATA}/train_elwc.tfrecord',
                                    **kwargs))
  monkeypatch.setattr(native, 'available', lambda: False)
  slow = list(build_ranking_dataset(f'{REF_DATA}/train_elwc.tfrecord',
                                    **kwargs))
  assert len(fast) == len(slow)
  for a, b in zip(fast, slow):
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.mask, b.mask)
    np.testing.assert_array_equal(a.examples['document_tokens'],
                                  b.examples['document_tokens'])


def test_native_loader_matches_python_pipeline():
  """Unshuffled native-loader stream == python build_ranking_dataset."""
  from ranking_tpu.data import build_ranking_dataset
  from ranking_tpu.data.dataset import native_ranking_dataset

  kwargs = dict(
      batch_size=4,
      context_feature_spec={
          'query_tokens': VarLenFeature(dtype='string', max_len=6,
                                        hash_buckets=1000)},
      example_feature_spec={
          'document_tokens': VarLenFeature(dtype='string', max_len=20,
                                           hash_buckets=1000),
          'relevance': FixedLenFeature(shape=(), dtype='int64',
                                       default_value=0)},
      label_feature_name='relevance',
      list_size=5, epochs=1, shuffle=False, drop_remainder=False)

  nat = list(native_ranking_dataset(f'{REF_DATA}/train_elwc.tfrecord',
                                    **kwargs))
  py = list(build_ranking_dataset(f'{REF_DATA}/train_elwc.tfrecord',
                                  data_format='example_list_with_context',
                                  **kwargs))
  assert len(nat) == len(py) > 0
  for a, b in zip(nat, py):
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.mask, b.mask)
    np.testing.assert_array_equal(a.examples['document_tokens'],
                                  b.examples['document_tokens'])
    np.testing.assert_array_equal(a.context['query_tokens'],
                                  b.context['query_tokens'])


def test_native_loader_shuffles_and_repeats(tmp_path):
  # The bundled reference file is 10 copies of one record, so build
  # distinct synthetic records to observe shuffle order.
  from ranking_tpu.data.dataset import native_ranking_dataset

  recs = [proto.make_elwc({}, [{'uid': [float(i)], 'rel': [1]}]
                          ).SerializeToString() for i in range(20)]
  path = str(tmp_path / 'distinct.tfrecord')
  tfrecord.write_records(path, recs)

  kwargs = dict(
      batch_size=5,
      context_feature_spec={},
      example_feature_spec={
          'uid': FixedLenFeature(shape=(1,), dtype='float32',
                                 default_value=-7.0),
          'rel': FixedLenFeature(shape=(), dtype='int64',
                                 default_value=0)},
      label_feature_name='rel',
      list_size=2, shuffle=True, shuffle_buffer_size=8)

  a = list(native_ranking_dataset(path, epochs=3, seed=1, **kwargs))
  assert len(a) == 12  # 60 records / 5
  ids_a = np.concatenate([x.examples['uid'][:, 0, 0] for x in a])
  b = list(native_ranking_dataset(path, epochs=3, seed=2, **kwargs))
  ids_b = np.concatenate([x.examples['uid'][:, 0, 0] for x in b])
  # Each epoch stream holds every record; different seeds give orders.
  assert sorted(ids_a.tolist()) == sorted(list(range(20)) * 3)
  assert not np.array_equal(ids_a, ids_b)
  assert not np.array_equal(ids_a, np.sort(ids_a))


def test_native_loader_skip_batches_bitwise(tmp_path):
  """skip_batches (decode-free fast-forward for resume_dataset): the
  skipped stream is bitwise-equal to batches[skip:] of an unskipped run
  — the reader's shuffle RNG advances identically, only the decode
  dispatch is suppressed. Covers multi-thread decode, shuffle on, and
  the final partial batch (drop_remainder=False)."""
  from ranking_tpu.data.dataset import native_ranking_dataset

  recs = [proto.make_elwc({}, [{'uid': [float(i)], 'rel': [1]}]
                          ).SerializeToString() for i in range(23)]
  path = str(tmp_path / 'skip.tfrecord')
  tfrecord.write_records(path, recs)

  kwargs = dict(
      batch_size=5,
      context_feature_spec={},
      example_feature_spec={
          'uid': FixedLenFeature(shape=(1,), dtype='float32',
                                 default_value=-7.0),
          'rel': FixedLenFeature(shape=(), dtype='int64',
                                 default_value=0)},
      label_feature_name='rel',
      list_size=2, shuffle=True, shuffle_buffer_size=8,
      drop_remainder=False, epochs=2, seed=5, num_threads=3)

  full = list(native_ranking_dataset(path, **kwargs))
  assert len(full) == 10  # 46 records -> 9 full batches + partial(1)
  for skip in (1, 3, len(full) - 1, len(full), len(full) + 4):
    skipped = list(native_ranking_dataset(path, skip_batches=skip,
                                          **kwargs))
    assert len(skipped) == max(0, len(full) - skip)
    for a, b in zip(full[skip:], skipped):
      np.testing.assert_array_equal(a.labels, b.labels)
      np.testing.assert_array_equal(a.examples['uid'], b.examples['uid'])
      np.testing.assert_array_equal(a.mask, b.mask)


def test_native_loader_abandoned_mid_stream(tmp_path):
  """Dropping the loader with batches undrained (and decode workers
  potentially blocked on the direct-write buffer ring) must join cleanly
  — close() destroys the C++ side before the ring's numpy buffers go."""
  from ranking_tpu.data import native

  recs = [proto.make_elwc({}, [{'uid': [float(i)], 'rel': [1]}]
                          ).SerializeToString() for i in range(40)]
  path = str(tmp_path / 'abandon.tfrecord')
  tfrecord.write_records(path, recs)
  spec = {'uid': FixedLenFeature(shape=(1,), dtype='float32',
                                 default_value=-7.0),
          'rel': FixedLenFeature(shape=(), dtype='int64',
                                 default_value=0)}
  for consumed in (0, 1, 3):
    loader = native.NativeLoader([path], {}, spec, batch_size=4,
                                 list_size=2, shuffle=False, epochs=50,
                                 num_threads=3)
    for _ in range(consumed):
      next(loader)
    loader.close()  # joins reader + workers; must not hang or crash
  # And plain GC-driven teardown (__del__ path).
  loader = native.NativeLoader([path], {}, spec, batch_size=4,
                               list_size=2, shuffle=False, epochs=50,
                               num_threads=2)
  next(loader)
  del loader


def test_python_stream_skip_batches_bitwise(tmp_path):
  """The python engine's skip_batches has the same bitwise-suffix
  contract (record batches are pulled through the seeded shuffle and
  dropped unparsed)."""
  from ranking_tpu.data.dataset import build_ranking_dataset

  recs = [proto.make_elwc({}, [{'uid': [float(i)], 'rel': [1]}]
                          ).SerializeToString() for i in range(23)]
  path = str(tmp_path / 'skip_py.tfrecord')
  tfrecord.write_records(path, recs)

  kwargs = dict(
      data_format='example_list_with_context',
      batch_size=5,
      context_feature_spec={},
      example_feature_spec={
          'uid': FixedLenFeature(shape=(1,), dtype='float32',
                                 default_value=-7.0),
          'rel': FixedLenFeature(shape=(), dtype='int64',
                                 default_value=0)},
      label_feature_name='rel',
      list_size=2, shuffle=True, shuffle_buffer_size=8,
      drop_remainder=False, epochs=2, seed=5)

  full = list(build_ranking_dataset(path, **kwargs))
  assert len(full) == 10
  skipped = list(build_ranking_dataset(path, skip_batches=3, **kwargs))
  assert len(skipped) == len(full) - 3
  for a, b in zip(full[3:], skipped):
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.examples['uid'], b.examples['uid'])


def test_python_stream_skip_preserves_shuffle_examples_rng(tmp_path):
  """skip_batches with shuffle_examples=True: the per-batch within-list
  shuffle seeds for SKIPPED batches must still be drawn from the shared
  rng, or every post-skip batch sees a shifted rng stream and diverges
  from batches[skip:] (review finding, round 4)."""
  from ranking_tpu.data.dataset import build_ranking_dataset

  recs = [proto.make_elwc({}, [{'uid': [float(i * 10 + d)], 'rel': [1]}
                               for d in range(4)]).SerializeToString()
          for i in range(20)]
  path = str(tmp_path / 'skip_se.tfrecord')
  tfrecord.write_records(path, recs)

  kwargs = dict(
      data_format='example_list_with_context',
      batch_size=5,
      context_feature_spec={},
      example_feature_spec={
          'uid': FixedLenFeature(shape=(1,), dtype='float32',
                                 default_value=-7.0),
          'rel': FixedLenFeature(shape=(), dtype='int64',
                                 default_value=0)},
      label_feature_name='rel',
      list_size=4, shuffle=True, shuffle_buffer_size=8,
      shuffle_examples=True, epochs=2, seed=9)

  full = list(build_ranking_dataset(path, **kwargs))
  skipped = list(build_ranking_dataset(path, skip_batches=2, **kwargs))
  assert len(skipped) == len(full) - 2
  for a, b in zip(full[2:], skipped):
    np.testing.assert_array_equal(a.examples['uid'], b.examples['uid'])


def test_native_sequence_example_matches_python():
  rng = np.random.RandomState(4)
  recs = []
  for _ in range(6):
    seq = proto.SequenceExample()
    seq.context.feature['q'].float_list.value.append(float(rng.randn()))
    fl = seq.feature_lists.feature_list['f']
    flr = seq.feature_lists.feature_list['rel']
    for _ in range(rng.randint(1, 5)):
      fl.feature.add().float_list.value.extend(
          [float(v) for v in rng.randn(2)])
      flr.feature.add().int64_list.value.append(int(rng.randint(0, 4)))
    recs.append(seq.SerializeToString())
  context_spec = {'q': FixedLenFeature(shape=(1,), dtype='float32',
                                       default_value=0.0)}
  example_spec = {
      'f': FixedLenFeature(shape=(2,), dtype='float32', default_value=0.0),
      'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)}
  py = parsers.parse_sequence_example(recs, context_spec, example_spec,
                                      list_size=3)
  nat = native.decode_elwc_batch(recs, 3, context_spec, example_spec,
                                 data_format='sequence_example')
  np.testing.assert_array_equal(nat.sizes, py.sizes)
  np.testing.assert_array_equal(nat.mask, py.mask)
  np.testing.assert_allclose(nat.context['q'], py.context['q'], rtol=1e-6)
  np.testing.assert_allclose(nat.examples['f'], py.examples['f'], rtol=1e-6)
  np.testing.assert_array_equal(nat.examples['rel'], py.examples['rel'])


def test_native_loader_sequence_example_stream(tmp_path):
  """The STREAMING loader (direct-write ring) on sequence_example format
  == the python build_ranking_dataset stream."""
  from ranking_tpu.data import build_ranking_dataset
  from ranking_tpu.data.dataset import native_ranking_dataset

  rng = np.random.RandomState(4)
  recs = []
  for _ in range(13):
    seq = proto.SequenceExample()
    seq.context.feature['q'].float_list.value.append(float(rng.randn()))
    fl = seq.feature_lists.feature_list['f']
    flr = seq.feature_lists.feature_list['rel']
    for _ in range(rng.randint(1, 5)):
      fl.feature.add().float_list.value.extend(
          [float(v) for v in rng.randn(2)])
      flr.feature.add().int64_list.value.append(int(rng.randint(0, 4)))
    recs.append(seq.SerializeToString())
  path = str(tmp_path / 'seq.tfrecord')
  tfrecord.write_records(path, recs)

  kwargs = dict(
      batch_size=4,
      context_feature_spec={'q': FixedLenFeature(shape=(1,),
                                                 dtype='float32',
                                                 default_value=0.0)},
      example_feature_spec={
          'f': FixedLenFeature(shape=(2,), dtype='float32',
                               default_value=0.0),
          'rel': FixedLenFeature(shape=(), dtype='int64',
                                 default_value=0)},
      label_feature_name='rel', list_size=3, epochs=1, shuffle=False,
      drop_remainder=False)
  nat = list(native_ranking_dataset(path,
                                    data_format='sequence_example',
                                    num_threads=2, **kwargs))
  py = list(build_ranking_dataset(path, data_format='sequence_example',
                                  **kwargs))
  assert len(nat) == len(py) == 4  # 13 records -> 3 full + partial(1)
  for a, b in zip(nat, py):
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.mask, b.mask)
    np.testing.assert_allclose(a.examples['f'], b.examples['f'],
                               rtol=1e-6)
    np.testing.assert_allclose(a.context['q'], b.context['q'], rtol=1e-6)


def test_native_eie_matches_python():
  rng = np.random.RandomState(8)
  recs = []
  for i in range(6):
    ctx = proto.make_example({'q': [float(i)]}).SerializeToString()
    inner = [proto.make_example({'f': [float(v) for v in rng.randn(2)],
                                 'rel': [int(rng.randint(0, 4))]}
                                ).SerializeToString()
             for _ in range(rng.randint(1, 5))]
    outer = proto.Example()
    outer.features.feature['serialized_context'].bytes_list.value.append(ctx)
    outer.features.feature['serialized_examples'].bytes_list.value.extend(
        inner)
    recs.append(outer.SerializeToString())
  context_spec = {'q': FixedLenFeature(shape=(1,), dtype='float32',
                                       default_value=0.0)}
  example_spec = {
      'f': FixedLenFeature(shape=(2,), dtype='float32', default_value=0.0),
      'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)}
  py = parsers.parse_example_in_example(recs, context_spec, example_spec,
                                        list_size=3)
  nat = native.decode_elwc_batch(recs, 3, context_spec, example_spec,
                                 data_format='example_in_example')
  np.testing.assert_array_equal(nat.sizes, py.sizes)
  np.testing.assert_array_equal(nat.mask, py.mask)
  np.testing.assert_allclose(nat.context['q'], py.context['q'], rtol=1e-6)
  np.testing.assert_allclose(nat.examples['f'], py.examples['f'], rtol=1e-6)
  np.testing.assert_array_equal(nat.examples['rel'], py.examples['rel'])


def test_native_tf_example_matches_python():
  rng = np.random.RandomState(9)
  recs = [proto.make_example({'q': [float(i)],
                              'f': [float(v) for v in rng.randn(2)],
                              'rel': [int(rng.randint(0, 4))]}
                             ).SerializeToString() for i in range(5)]
  context_spec = {'q': FixedLenFeature(shape=(1,), dtype='float32',
                                       default_value=0.0)}
  example_spec = {
      'f': FixedLenFeature(shape=(2,), dtype='float32', default_value=0.0),
      'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)}
  py = parsers.parse_tf_example(recs, context_spec, example_spec,
                                list_size=1)
  nat = native.decode_elwc_batch(recs, 1, context_spec, example_spec,
                                 data_format='tf_example')
  np.testing.assert_array_equal(nat.sizes, py.sizes)
  np.testing.assert_allclose(nat.context['q'], py.context['q'], rtol=1e-6)
  np.testing.assert_allclose(nat.examples['f'], py.examples['f'], rtol=1e-6)
  np.testing.assert_array_equal(nat.examples['rel'], py.examples['rel'])


def test_native_int64_full_width_no_narrowing():
  # Round-2 ADVICE fix: int64 ids/timestamps above 2^24 (old float path) and
  # 2^31 (old int32 path) must decode exactly on the native fast path.
  big = [2**62 + 12345, -(2**40) - 7, 2**33, 17]
  recs = []
  for i in range(3):
    docs = [{'id64': [big[(i + d) % 4]], 'toks': big}
            for d in range(2)]
    recs.append(proto.make_elwc({'cid': [big[i]]}, docs).SerializeToString())
  context_spec = {'cid': FixedLenFeature(shape=(), dtype='int64',
                                         default_value=0)}
  example_spec = {
      'id64': FixedLenFeature(shape=(), dtype='int64', default_value=0),
      'toks': VarLenFeature(dtype='int64', max_len=6)}
  py = parsers.parse_example_list(recs, context_spec, example_spec,
                                  list_size=2)
  nat = native.decode_elwc_batch(recs, 2, context_spec, example_spec)
  assert nat.context['cid'].dtype == np.int64
  assert nat.examples['toks'].dtype == np.int64
  np.testing.assert_array_equal(nat.context['cid'], py.context['cid'])
  np.testing.assert_array_equal(nat.examples['id64'], py.examples['id64'])
  np.testing.assert_array_equal(nat.examples['toks'], py.examples['toks'])


def test_native_missing_required_feature_raises_like_python():
  # A record missing a required feature (default_value=None) must raise on
  # the native path exactly like the strict Python parser — never silently
  # train on a zero-filled label (round-2 ADVICE fix).
  docs_ok = [{'rel': [1], 'f': [0.5, 0.25]}]
  docs_missing = [{'f': [0.5, 0.25]}]  # no 'rel'
  recs = [proto.make_elwc({}, docs_ok).SerializeToString(),
          proto.make_elwc({}, docs_missing).SerializeToString()]
  example_spec = {
      'rel': FixedLenFeature(shape=(), dtype='int64', default_value=None),
      'f': FixedLenFeature(shape=(2,), dtype='float32', default_value=0.0)}
  with pytest.raises(ValueError, match="Missing required feature 'rel'"):
    parsers.parse_example_list(recs, {}, example_spec, list_size=2)
  with pytest.raises(ValueError, match="Missing required feature 'rel'"):
    native.decode_elwc_batch(recs, 2, {}, example_spec)
  # With a default the same data decodes fine on both paths.
  spec_def = dict(example_spec)
  spec_def['rel'] = FixedLenFeature(shape=(), dtype='int64', default_value=0)
  py = parsers.parse_example_list(recs, {}, spec_def, list_size=2)
  nat = native.decode_elwc_batch(recs, 2, {}, spec_def)
  np.testing.assert_array_equal(nat.examples['rel'], py.examples['rel'])


def test_native_wrong_count_raises_like_python():
  docs = [{'f': [1.0, 2.0, 3.0]}]  # 3 values for a shape-(2,) feature
  recs = [proto.make_elwc({}, docs).SerializeToString()]
  example_spec = {
      'f': FixedLenFeature(shape=(2,), dtype='float32', default_value=0.0)}
  with pytest.raises(ValueError, match="got 3 values, expected 2"):
    parsers.parse_example_list(recs, {}, example_spec, list_size=1)
  with pytest.raises(ValueError, match="got 3 values, expected 2"):
    native.decode_elwc_batch(recs, 1, {}, example_spec)


def test_scan_tfrecord_rejects_corrupt_length(tmp_path):
  # A corrupt record length with the high bit set used to wrap negative
  # through signed arithmetic and desync the scan; it must stop cleanly.
  path = str(tmp_path / 'corrupt.tfrecord')
  tfrecord.write_records(
      path, [proto.make_elwc({}, [{'r': [1]}]).SerializeToString()])
  good = open(path, 'rb').read()
  corrupt = bytearray(good)
  corrupt[0:8] = (2**63 + 5).to_bytes(8, 'little')
  import ctypes
  lib = native._load()
  data = bytes(corrupt)
  offs = np.zeros(8, np.int64)
  lens = np.zeros(8, np.int64)
  n = lib.rt_scan_tfrecord(
      data, len(data),
      offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
      lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 8)
  assert n == 0  # stops at the corruption point, no garbage records


def test_native_elwc_sizes_matches_python():
  path = f'{REF_DATA}/train_elwc.tfrecord'
  records = tfrecord.read_all_records(path, verify=True)[:32]
  # Add synthetic records with varied list sizes, including empty.
  for n in (0, 1, 7, 33):
    docs = [{'relevance': [1]}] * n
    records.append(proto.make_elwc({'q': ['x']}, docs).SerializeToString())
  got = native.elwc_sizes(records)
  expected = parsers._elwc_list_sizes_py(records)
  np.testing.assert_array_equal(got, expected)
  assert got[-4:].tolist() == [0, 1, 7, 33]


def test_native_elwc_sizes_rejects_malformed():
  with pytest.raises(ValueError):
    native.elwc_sizes([b'\x0a\xff\xff\xff\xff\x7f trailing-garbage'])


def test_native_merges_concatenated_examples():
  """Proto semantics: concatenated serialized Examples merge — repeated
  Example.features occurrences union their maps, duplicate keys last-win
  with no stale tail (TF's parser and our Python runtime both merge)."""
  from ranking_tpu.data import native, parsers, proto
  if not native.available():
    pytest.skip('native decoder unavailable')
  e1 = proto.make_example({'a': [1.0, 2.0, 3.0],
                           'c': [9.0]}).SerializeToString()
  e2 = proto.make_example({'a': [7.0], 'b': [5.0]}).SerializeToString()
  rec = e1 + e2  # one Example with two features occurrences
  spec = {
      'a': parsers.FixedLenFeature(shape=(3,), dtype='float32',
                                   default_value=-1.0),
      'b': parsers.FixedLenFeature(shape=(1,), dtype='float32',
                                   default_value=-1.0),
      'c': parsers.FixedLenFeature(shape=(1,), dtype='float32',
                                   default_value=-1.0),
  }
  # 'a' appears in both: last occurrence wins entirely -> [7, -1, -1]
  # (count 1 of 3 - the strict required check must see the LAST count);
  # 'b' only in the second, 'c' only in the first: both survive the merge.
  got = native.decode_elwc_batch(
      [rec], 1, {}, {k: v for k, v in spec.items() if k != 'a'},
      data_format='tf_example')
  np.testing.assert_array_equal(got.examples['b'].reshape(-1), [5.0])
  np.testing.assert_array_equal(got.examples['c'].reshape(-1), [9.0])


def test_native_duplicate_key_no_stale_tail():
  """A later duplicate feature occurrence fully replaces the earlier row:
  no stale tail values survive past the new count (parity vs Python)."""
  from ranking_tpu.data import native, parsers, proto
  if not native.available():
    pytest.skip('native decoder unavailable')
  e1 = proto.make_example({'tok': [11, 12, 13, 14, 15]}).SerializeToString()
  e2 = proto.make_example({'tok': [21, 22]}).SerializeToString()
  rec = e1 + e2
  spec = {'tok': parsers.VarLenFeature(dtype='int64', max_len=5)}
  got = native.decode_elwc_batch([rec], 1, {}, spec,
                                 data_format='tf_example')
  ref = parsers.parse_tf_example([rec], {}, spec, list_size=1)
  np.testing.assert_array_equal(np.asarray(got.examples['tok']),
                                np.asarray(ref.examples['tok']))
  np.testing.assert_array_equal(
      np.asarray(got.examples['tok']).reshape(-1), [21, 22, -1, -1, -1])


def test_native_loader_surfaces_decode_failure(tmp_path):
  """A corrupt record in the stream raises — the loader must not silently
  drop batches (decode strictness parity with the one-shot path)."""
  from ranking_tpu.data import native, parsers, proto, tfrecord
  if not native.available():
    pytest.skip('native decoder unavailable')
  good = proto.make_elwc(
      {}, [{'rel': [1]}, {'rel': [0]}]).SerializeToString()
  path = str(tmp_path / 'corrupt.tfrecord')
  tfrecord.write_records(path, [good, b'\xff\xfe not a proto \x00\x01'])
  loader = native.NativeLoader(
      [path], {}, {'rel': parsers.FixedLenFeature(shape=(), dtype='int64',
                                                  default_value=0)},
      batch_size=2, list_size=4, shuffle=False, epochs=1)
  with pytest.raises(ValueError, match='failed to decode'):
    for _ in loader:
      pass


def test_native_loader_surfaces_unreadable_file(tmp_path):
  """An input file that cannot be read (here: vanished after listing)
  is a loader error, not a silent skip — otherwise a truncated corpus
  trains on partial data with no signal (round-3 ADVICE)."""
  from ranking_tpu.data import native, parsers, proto, tfrecord
  if not native.available():
    pytest.skip('native decoder unavailable')
  good = proto.make_elwc(
      {}, [{'rel': [1]}, {'rel': [0]}]).SerializeToString()
  ok_path = str(tmp_path / 'ok.tfrecord')
  tfrecord.write_records(ok_path, [good] * 4)
  loader = native.NativeLoader(
      [ok_path, str(tmp_path / 'gone.tfrecord')], {},
      {'rel': parsers.FixedLenFeature(shape=(), dtype='int64',
                                      default_value=0)},
      batch_size=2, list_size=4, shuffle=False, epochs=1)
  with pytest.raises(ValueError, match='unreadable'):
    for _ in loader:
      pass


def test_native_vocab_decode_matches_python_parser():
  """Native vocabulary-file decode (kind 4) == Python Vocabulary lookup,
  including OOV fnv1a routing, num_oov_buckets > 1, duplicate vocab
  tokens (last wins), and tokens past max_len."""
  vocab = parsers.Vocabulary(
      [b'the', b'quick', b'fox', b'the', b'zebra'], num_oov_buckets=3)
  ctx_spec = {'query_tokens': VarLenFeature(dtype='string', max_len=4,
                                            vocab=vocab)}
  ex_spec = {'document_tokens': VarLenFeature(dtype='string', max_len=3,
                                              vocab=vocab),
             'relevance': FixedLenFeature(shape=(), dtype='int64',
                                          default_value=0)}
  docs = [
      {'document_tokens': [b'the', b'quick'], 'relevance': [2]},
      {'document_tokens': [b'UNSEEN', b'zebra', b'fox', b'overflow'],
       'relevance': [0]},
      {'document_tokens': [], 'relevance': [1]},
  ]
  recs = [proto.make_elwc({'query_tokens': [b'fox', b'OOV-1', b'OOV-2']},
                          docs).SerializeToString()] * 3
  py = parsers.parse_example_list(recs, ctx_spec, ex_spec, list_size=4)
  nat = native.decode_elwc_batch(recs, 4, ctx_spec, ex_spec)
  np.testing.assert_array_equal(nat.sizes, py.sizes)
  np.testing.assert_array_equal(nat.context['query_tokens'],
                                py.context['query_tokens'])
  np.testing.assert_array_equal(nat.examples['document_tokens'],
                                py.examples['document_tokens'])
  # Sanity of the semantics themselves, not just agreement: duplicate
  # b'the' keeps the LAST id (3 + num_oov = 6), OOV ids live in [0, 3).
  q = np.asarray(nat.context['query_tokens'])[0]
  assert q[0] == 2 + 3  # 'fox' at index 2, shifted by num_oov
  assert 0 <= q[1] < 3 and 0 <= q[2] < 3
  d = np.asarray(nat.examples['document_tokens'])[0]
  assert d[0, 0] == 3 + 3  # last-wins duplicate 'the'


def test_native_loader_vocab_stream(tmp_path):
  """native_ranking_dataset decodes vocabulary string features natively —
  the canonical sparse workload (reference examples/tf_ranking_tfrecord.py
  categorical_column_with_vocabulary_file) with no Python fallback."""
  from ranking_tpu.data import build_ranking_dataset
  from ranking_tpu.data.dataset import native_ranking_dataset

  rng = np.random.RandomState(0)
  words = [f'w{i}'.encode() for i in range(50)]
  vocab = parsers.Vocabulary(words[:40], num_oov_buckets=2)
  recs = []
  for q in range(30):
    docs = [{'document_tokens': list(rng.choice(words, rng.randint(1, 9))),
             'relevance': [int(rng.randint(0, 3))]}
            for _ in range(int(rng.randint(1, 7)))]
    ctx = {'query_tokens': list(rng.choice(words, 3))}
    recs.append(proto.make_elwc(ctx, docs).SerializeToString())
  path = str(tmp_path / 'vocab.tfrecord')
  tfrecord.write_records(path, recs)

  kwargs = dict(
      batch_size=8,
      context_feature_spec={
          'query_tokens': VarLenFeature(dtype='string', max_len=4,
                                        vocab=vocab)},
      example_feature_spec={
          'document_tokens': VarLenFeature(dtype='string', max_len=10,
                                           vocab=vocab),
          'relevance': FixedLenFeature(shape=(), dtype='int64',
                                       default_value=0)},
      label_feature_name='relevance',
      list_size=6, epochs=1, shuffle=False, drop_remainder=False)
  nat = list(native_ranking_dataset(path, **kwargs))
  py = list(build_ranking_dataset(
      path, data_format='example_list_with_context', **kwargs))
  assert len(nat) == len(py) > 0
  for a, b in zip(nat, py):
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.examples['document_tokens'],
                                  b.examples['document_tokens'])
    np.testing.assert_array_equal(a.context['query_tokens'],
                                  b.context['query_tokens'])


def test_native_vocab_dataset_builder_no_fallback(tmp_path, recwarn):
  """The batched-parse pipeline decodes vocab features on the C++ path:
  no 'fell back to the Python parser' warning fires (VERDICT round-2
  weak #2: the canonical vocab workload silently dropped to Python)."""
  import warnings

  from ranking_tpu.data import build_ranking_dataset

  vocab = parsers.Vocabulary([b'a', b'b', b'c'])
  recs = [proto.make_elwc({}, [{'document_tokens': [b'a', b'zz'],
                                'relevance': [1]}]).SerializeToString()] * 8
  path = str(tmp_path / 'v.tfrecord')
  tfrecord.write_records(path, recs)
  with warnings.catch_warnings():
    warnings.simplefilter('error')  # any fallback warning -> test failure
    batches = list(build_ranking_dataset(
        path, data_format='example_list_with_context', batch_size=4,
        context_feature_spec={},
        example_feature_spec={
            'document_tokens': VarLenFeature(dtype='string', max_len=4,
                                             vocab=vocab),
            'relevance': FixedLenFeature(shape=(), dtype='int64',
                                         default_value=0)},
        label_feature_name='relevance', list_size=2, epochs=1,
        shuffle=False))
  assert len(batches) == 2
  assert batches[0].examples['document_tokens'][0, 0, 0] == 1  # 'a' -> 1


def test_native_loader_thread_count_determinism(tmp_path):
  """The shuffled batch stream is bit-identical for every num_threads:
  order comes from the reader's seeded shuffle, never from decode-thread
  scheduling (the reorder buffer restores assembly order)."""
  from ranking_tpu.data.dataset import native_ranking_dataset

  recs = [proto.make_elwc({'qid': [float(i)]},
                          [{'uid': [float(i * 10 + d)], 'rel': [d % 3]}
                           for d in range(1 + i % 5)]).SerializeToString()
          for i in range(200)]
  path = str(tmp_path / 'many.tfrecord')
  tfrecord.write_records(path, recs)

  def stream(num_threads):
    kwargs = dict(
        batch_size=16,
        context_feature_spec={
            'qid': FixedLenFeature(shape=(1,), dtype='float32',
                                   default_value=-1.0)},
        example_feature_spec={
            'uid': FixedLenFeature(shape=(1,), dtype='float32',
                                   default_value=-7.0),
            'rel': FixedLenFeature(shape=(), dtype='int64',
                                   default_value=0)},
        label_feature_name='rel', list_size=5, epochs=2, shuffle=True,
        shuffle_buffer_size=64, seed=13, drop_remainder=False,
        num_threads=num_threads)
    return list(native_ranking_dataset(path, **kwargs))

  base = stream(1)
  assert len(base) == 25  # 400 records / 16
  for threads in (2, 8):
    other = stream(threads)
    assert len(other) == len(base)
    for a, b in zip(base, other):
      np.testing.assert_array_equal(a.labels, b.labels)
      np.testing.assert_array_equal(a.mask, b.mask)
      np.testing.assert_array_equal(a.examples['uid'], b.examples['uid'])
      np.testing.assert_array_equal(a.context['qid'], b.context['qid'])


def test_native_loader_multi_host_file_sharding(tmp_path):
  """shard_index/num_shards gives each process a disjoint file subset
  (same contract as build_ranking_dataset); the union covers every
  record exactly once."""
  from ranking_tpu.data.dataset import native_ranking_dataset

  for f in range(4):
    recs = [proto.make_elwc({'qid': [float(f * 100 + i)]},
                            [{'rel': [1]}]).SerializeToString()
            for i in range(8)]
    tfrecord.write_records(str(tmp_path / f'part-{f}.tfrecord'), recs)

  def qids(shard_index, num_shards):
    batches = list(native_ranking_dataset(
        str(tmp_path / 'part-*.tfrecord'),
        batch_size=4,
        context_feature_spec={
            'qid': FixedLenFeature(shape=(1,), dtype='float32',
                                   default_value=-1.0)},
        example_feature_spec={
            'rel': FixedLenFeature(shape=(), dtype='int64',
                                   default_value=0)},
        label_feature_name='rel', list_size=2, epochs=1, shuffle=False,
        drop_remainder=False, num_threads=2,
        shard_index=shard_index, num_shards=num_shards))
    return sorted(np.concatenate(
        [b.context['qid'].reshape(-1) for b in batches]).tolist())

  shards = [qids(i, 2) for i in range(2)]
  assert not set(shards[0]) & set(shards[1])
  expect = sorted(float(f * 100 + i) for f in range(4) for i in range(8))
  assert sorted(shards[0] + shards[1]) == expect
  import pytest as _pytest
  with _pytest.raises(ValueError, match='got no files'):
    qids(4, 5)
  # Out-of-range index must raise, not silently return an
  # overlapping/incomplete shard.
  with _pytest.raises(ValueError, match='out of range'):
    qids(2, 2)
  with _pytest.raises(ValueError, match='out of range'):
    qids(-1, 2)


def test_native_loader_slow_consumer_bounded_and_ordered(tmp_path):
  """A consumer that lags far behind the decoders still receives the
  complete stream in assembly order: the decode threads are gated on the
  reorder buffer (ring_capacity + num_threads), so they neither drain
  the dataset into memory nor deadlock against the waiting consumer."""
  import time
  from ranking_tpu.data.dataset import native_ranking_dataset

  recs = [proto.make_elwc({'qid': [float(i)]},
                          [{'rel': [1]}]).SerializeToString()
          for i in range(512)]
  path = str(tmp_path / 'slow.tfrecord')
  tfrecord.write_records(path, recs)

  it = iter(native_ranking_dataset(
      path,
      batch_size=4,
      context_feature_spec={
          'qid': FixedLenFeature(shape=(1,), dtype='float32',
                                 default_value=-1.0)},
      example_feature_spec={
          'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)},
      label_feature_name='rel', list_size=2, epochs=1, shuffle=False,
      drop_remainder=False, num_threads=4))
  first = next(it)
  time.sleep(1.0)  # decoders run ahead; the out-bound gate must hold them
  batches = [first] + list(it)
  assert len(batches) == 128
  qids = np.concatenate([b.context['qid'].reshape(-1) for b in batches])
  np.testing.assert_array_equal(qids, np.arange(512, dtype=np.float32))


def test_native_pad_value_falls_back(tmp_path):
  """Non-default varlen pad_value is not natively decodable: the one-shot
  decode raises (so the batched pipeline falls back to the Python parser,
  which honors it) instead of silently padding with -1."""
  spec = {'toks': VarLenFeature(dtype='int64', max_len=3, pad_value=0)}
  rec = proto.make_elwc({}, [{'toks': [5]}]).SerializeToString()
  with pytest.raises(ValueError, match='pad'):
    native.decode_elwc_batch([rec], 2, {}, spec)
