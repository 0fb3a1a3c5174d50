"""Data layer tests: tfrecord io, proto parsing, parsers, dataset pipeline."""

import numpy as np
import pytest

from ranking_tpu.data import (
    FixedLenFeature, VarLenFeature, Vocabulary,
    build_ranking_dataset, in_memory_batches, libsvm, parsers, proto, tfrecord,
)

REF_DATA = '/root/reference/tensorflow_ranking/examples/data'


def _elwc_bytes(context, examples):
  return proto.make_elwc(context, examples).SerializeToString()


def test_tfrecord_roundtrip(tmp_path):
  path = str(tmp_path / 'x.tfrecord')
  payloads = [b'alpha', b'b' * 1000, b'']
  assert tfrecord.write_records(path, payloads) == 3
  got = list(tfrecord.read_records(path, verify=True))
  assert got == payloads


def test_crc32c_known_vectors():
  # Castagnoli CRC of 'a'..'i' strings (RFC 3720 style checks).
  assert tfrecord.crc32c(b'') == 0
  assert tfrecord.crc32c(b'123456789') == 0xE3069283
  assert tfrecord.crc32c(b'\x00' * 32) == 0x8A9136AA


def test_reads_reference_elwc_with_verification():
  recs = tfrecord.read_all_records(f'{REF_DATA}/train_elwc.tfrecord',
                                   verify=True)
  assert len(recs) == 10
  e = proto.ExampleListWithContext()
  e.ParseFromString(recs[0])
  assert 'query_tokens' in e.context.features.feature
  assert 'relevance' in e.examples[0].features.feature


def test_parse_example_list_padding_and_truncation():
  recs = [
      _elwc_bytes({'q': [1.0]}, [{'f': [1.0], 'rel': [2]},
                                 {'f': [2.0], 'rel': [0]},
                                 {'f': [3.0], 'rel': [1]}]),
      _elwc_bytes({'q': [2.0]}, [{'f': [4.0], 'rel': [1]}]),
  ]
  spec_c = {'q': FixedLenFeature(shape=(1,), dtype='float32')}
  spec_e = {'f': FixedLenFeature(shape=(1,), dtype='float32',
                                 default_value=0.0),
            'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)}
  parsed = parsers.parse_example_list(recs, spec_c, spec_e, list_size=2)
  assert parsed.examples['f'].shape == (2, 2, 1)
  np.testing.assert_array_equal(parsed.sizes, [2, 1])
  np.testing.assert_array_equal(parsed.mask, [[True, True], [True, False]])
  np.testing.assert_allclose(parsed.examples['f'][:, :, 0],
                             [[1.0, 2.0], [4.0, 0.0]])
  np.testing.assert_array_equal(parsed.examples['rel'], [[2, 0], [1, 0]])


def test_parse_example_in_example():
  ctx = proto.make_example({'q': [7.0]}).SerializeToString()
  exs = [proto.make_example({'f': [float(i)]}).SerializeToString()
         for i in range(3)]
  outer = proto.Example()
  outer.features.feature['serialized_context'].bytes_list.value.append(ctx)
  outer.features.feature['serialized_examples'].bytes_list.value.extend(exs)
  parsed = parsers.parse_example_in_example(
      [outer.SerializeToString()],
      {'q': FixedLenFeature(shape=(1,), dtype='float32')},
      {'f': FixedLenFeature(shape=(1,), dtype='float32', default_value=0.0)},
      list_size=4)
  np.testing.assert_allclose(parsed.context['q'], [[7.0]])
  np.testing.assert_allclose(parsed.examples['f'][0, :, 0],
                             [0.0, 1.0, 2.0, 0.0])
  np.testing.assert_array_equal(parsed.mask[0], [True, True, True, False])


def test_parse_sequence_example():
  seq = proto.SequenceExample()
  seq.context.feature['q'].float_list.value.append(3.0)
  fl = seq.feature_lists.feature_list['f']
  for v in (1.0, 2.0):
    fl.feature.add().float_list.value.append(v)
  parsed = parsers.parse_sequence_example(
      [seq.SerializeToString()],
      {'q': FixedLenFeature(shape=(1,), dtype='float32')},
      {'f': FixedLenFeature(shape=(1,), dtype='float32', default_value=0.0)},
      list_size=3)
  np.testing.assert_allclose(parsed.examples['f'][0, :, 0], [1.0, 2.0, 0.0])
  np.testing.assert_array_equal(parsed.sizes, [2])


def test_varlen_tokens_with_vocab_and_hash():
  vocab = Vocabulary(['apple', 'pear'], num_oov_buckets=1)
  rec = _elwc_bytes({'qt': ['apple', 'unknown']},
                    [{'dt': ['pear'], 'rel': [1]}])
  parsed = parsers.parse_example_list(
      [rec],
      {'qt': VarLenFeature(dtype='string', max_len=3, vocab=vocab)},
      {'dt': VarLenFeature(dtype='string', max_len=2, vocab=vocab),
       'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)},
      list_size=1)
  qt = parsed.context['qt'][0]
  assert qt[0] == 1  # apple -> first real id after 1 oov bucket
  assert qt[1] == 0  # unknown -> oov bucket 0
  assert qt[2] == -1  # padding
  assert parsed.examples['dt'][0, 0, 0] == 2  # pear

  hashed = parsers.parse_example_list(
      [rec],
      {'qt': VarLenFeature(dtype='string', max_len=2, hash_buckets=100)},
      {'dt': VarLenFeature(dtype='string', max_len=2, hash_buckets=100),
       'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)},
      list_size=1)
  assert 0 <= hashed.context['qt'][0, 0] < 100


def test_build_ranking_dataset_on_reference_data(tmp_path):
  batches = list(build_ranking_dataset(
      f'{REF_DATA}/train_elwc.tfrecord',
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
      list_size=5,
      epochs=2,
      shuffle=True,
      seed=7))
  # 10 records x 2 epochs / batch 4 = 5 full batches.
  assert len(batches) == 5
  b = batches[0]
  assert b.labels.shape == (4, 5)
  assert b.mask.shape == (4, 5)
  assert b.examples['document_tokens'].shape == (4, 5, 20)
  assert b.context['query_tokens'].shape == (4, 6)
  # Padded slots must carry the padding label.
  assert np.all(b.labels[~b.mask] == -1.0)
  assert np.all(b.labels[b.mask] >= 0)


def test_libsvm_loader():
  feats, labels, qids = libsvm.load_libsvm_lists(
      f'{REF_DATA}/train.txt', list_size=10, num_features=136)
  assert feats.shape[1:] == (10, 136)
  assert labels.shape == feats.shape[:2]
  assert len(qids) == feats.shape[0]
  valid = labels >= 0
  assert valid.any() and (labels[valid] <= 4).all()
  assert np.isfinite(feats).all()


def test_in_memory_batches_epochs():
  feats = np.random.randn(10, 4, 3).astype(np.float32)
  labels = np.random.randint(0, 3, (10, 4)).astype(np.float32)
  out = list(in_memory_batches(feats, labels, batch_size=4, epochs=3,
                               seed=0))
  assert len(out) == 6  # 2 full batches per epoch x 3
  assert out[0].examples['float_features'].shape == (4, 4, 3)


def test_convert_labels_to_binary(tmp_path):
  rec = _elwc_bytes({}, [{'f': [1.0], 'rel': [3]}, {'f': [2.0], 'rel': [0]}])
  path = str(tmp_path / 'd.tfrecord')
  tfrecord.write_records(path, [rec])
  (b,) = build_ranking_dataset(
      path, data_format='example_list_with_context', batch_size=1,
      context_feature_spec={},
      example_feature_spec={
          'f': FixedLenFeature(shape=(1,), dtype='float32',
                               default_value=0.0),
          'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)},
      label_feature_name='rel', list_size=3, epochs=1, shuffle=False,
      drop_remainder=False, convert_labels_to_binary=True)
  np.testing.assert_allclose(b.labels[0], [1.0, 0.0, -1.0])


def test_file_sharding_disjoint(tmp_path):
  from ranking_tpu.data import build_ranking_dataset
  # 4 files x 2 records each, unique float ids.
  for fi in range(4):
    recs = [proto.make_elwc({}, [{'uid': [float(fi * 10 + ri)],
                                  'rel': [1]}]).SerializeToString()
            for ri in range(2)]
    tfrecord.write_records(str(tmp_path / f'part-{fi}.tfrecord'), recs)
  spec = {'uid': FixedLenFeature(shape=(1,), dtype='float32',
                                 default_value=-1.0),
          'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)}

  def ids_for(shard):
    out = []
    for b in build_ranking_dataset(
        str(tmp_path / 'part-*.tfrecord'),
        data_format='example_list_with_context', batch_size=2,
        context_feature_spec={}, example_feature_spec=spec,
        label_feature_name='rel', list_size=1, epochs=1, shuffle=False,
        drop_remainder=False, shard_index=shard, num_shards=2):
      out.extend(b.examples['uid'][:, 0, 0].tolist())
    return set(out)

  a, b = ids_for(0), ids_for(1)
  assert a and b and not (a & b)
  assert a | b == {0.0, 1.0, 10.0, 11.0, 20.0, 21.0, 30.0, 31.0}


def test_pad_final_batch(tmp_path):
  recs = [_elwc_bytes({}, [{'f': [float(i)], 'rel': [1]}])
          for i in range(3)]
  path = str(tmp_path / 'p.tfrecord')
  tfrecord.write_records(path, recs)
  batches = list(build_ranking_dataset(
      path, data_format='example_list_with_context', batch_size=2,
      context_feature_spec={},
      example_feature_spec={
          'f': FixedLenFeature(shape=(1,), dtype='float32',
                               default_value=0.0),
          'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)},
      label_feature_name='rel', list_size=2, epochs=1, shuffle=False,
      drop_remainder=False, pad_final_batch=True))
  assert len(batches) == 2
  last = batches[-1]
  # Final batch padded to full batch size with fully-masked rows.
  assert last.labels.shape == (2, 2)
  assert not last.mask[1].any()
  assert (last.labels[1] == -1.0).all()


def test_bucketed_dynamic_list_size(tmp_path):
  """list_size=None: each batch pads to its longest list rounded up the
  half-step power-of-two ladder (bounded compile shapes on TPU); values
  and masks match the fixed-size parse of the same records."""
  spec = {
      'f': FixedLenFeature(shape=(1,), dtype='float32', default_value=0.0),
      'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)}
  lengths = [5, 9, 2, 7, 11, 3]
  recs = [_elwc_bytes({}, [{'f': [float(i * 100 + d)], 'rel': [d % 3]}
                           for d in range(n)])
          for i, n in enumerate(lengths)]
  path = str(tmp_path / 'dyn.tfrecord')
  tfrecord.write_records(path, recs)
  kwargs = dict(data_format='example_list_with_context', batch_size=2,
                context_feature_spec={}, example_feature_spec=spec,
                label_feature_name='rel', epochs=1, shuffle=False,
                drop_remainder=False)
  batches = list(build_ranking_dataset(path, list_size=None, **kwargs))
  assert len(batches) == 3
  # Buckets: max(5,9)=9 -> 12; max(2,7)=7 -> 8; max(11,3)=11 -> 12.
  assert [b.labels.shape[1] for b in batches] == [12, 8, 12]
  assert [int(b.mask.sum()) for b in batches] == [14, 9, 14]
  # Same records parsed at a fixed size agree on every valid entry.
  fixed = list(build_ranking_dataset(path, list_size=12, **kwargs))
  for dyn, fix in zip(batches, fixed):
    L = dyn.labels.shape[1]
    np.testing.assert_array_equal(dyn.mask, fix.mask[:, :L])
    np.testing.assert_array_equal(dyn.labels[dyn.mask],
                                  fix.labels[:, :L][dyn.mask])
    np.testing.assert_array_equal(dyn.examples['f'][dyn.mask],
                                  fix.examples['f'][:, :L][dyn.mask])


def test_bucket_list_size_ladder():
  got = [parsers.bucket_list_size(n) for n in
         (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 12, 13, 100, 128, 129, 200)]
  assert got == [1, 1, 2, 3, 4, 6, 6, 8, 8, 12, 12, 16, 128, 128,
                 192, 256]


def test_dynamic_list_size_rejected_for_other_formats(tmp_path):
  with pytest.raises(ValueError, match='example_list_with_context'):
    list(build_ranking_dataset(
        str(tmp_path / 'none.tfrecord'), data_format='sequence_example',
        batch_size=2, context_feature_spec={}, example_feature_spec={
            'rel': FixedLenFeature(shape=(), dtype='int64',
                                   default_value=0)},
        label_feature_name='rel', list_size=None))


def test_interleave_files_round_robins(tmp_path):
  from ranking_tpu.data import build_ranking_dataset
  for fi in range(3):
    recs = [proto.make_elwc({}, [{'uid': [float(fi * 10 + ri)],
                                  'rel': [1]}]).SerializeToString()
            for ri in range(3)]
    tfrecord.write_records(str(tmp_path / f'il-{fi}.tfrecord'), recs)
  spec = {'uid': FixedLenFeature(shape=(1,), dtype='float32',
                                 default_value=-1.0),
          'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)}
  out = []
  for b in build_ranking_dataset(
      str(tmp_path / 'il-*.tfrecord'),
      data_format='example_list_with_context', batch_size=3,
      context_feature_spec={}, example_feature_spec=spec,
      label_feature_name='rel', list_size=1, epochs=1, shuffle=False,
      drop_remainder=False, interleave_files=3):
    out.extend(b.examples['uid'][:, 0, 0].tolist())
  # Round-robin across the 3 files: first three records come one per file.
  assert sorted(out[:3]) == [0.0, 10.0, 20.0]
  assert sorted(out) == sorted([f * 10 + r for f in range(3)
                                for r in range(3)])


def test_pad_final_batch_multitask_labels(tmp_path):
  """pad_final_batch with dict (multi-task) label_feature_name (the guard
  used to call .shape on the dict)."""
  recs = [_elwc_bytes({}, [{'f': [float(i)], 'rel': [1], 'click': [0]}])
          for i in range(3)]
  path = str(tmp_path / 'mt.tfrecord')
  tfrecord.write_records(path, recs)
  batches = list(build_ranking_dataset(
      path, data_format='example_list_with_context', batch_size=2,
      context_feature_spec={},
      example_feature_spec={
          'f': FixedLenFeature(shape=(1,), dtype='float32',
                               default_value=0.0),
          'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0),
          'click': FixedLenFeature(shape=(), dtype='int64',
                                   default_value=0)},
      label_feature_name={'rel': 'rel', 'click': 'click'},
      list_size=2, epochs=1, shuffle=False, drop_remainder=False,
      pad_final_batch=True))
  assert all(b.mask.shape[0] == 2 for b in batches)
  last = batches[-1]
  assert set(last.labels) == {'rel', 'click'}
  # Padded row: mask off, labels at the padding sentinel.
  assert not last.mask[1].any()
  np.testing.assert_allclose(last.labels['rel'][1], -1.0)


def test_prefetch_sentinel_survives_full_queue(tmp_path):
  """End-of-stream must terminate the iterator even when the prefetch
  queue is full when the record stream ends (regression: the sentinel
  was dropped on queue.Full and the consumer hung forever)."""
  import threading
  import time as time_lib
  recs = [_elwc_bytes({}, [{'f': [float(i)], 'rel': [1]}])
          for i in range(6)]
  path = str(tmp_path / 'q.tfrecord')
  tfrecord.write_records(path, recs)
  it = build_ranking_dataset(
      path, data_format='example_list_with_context', batch_size=2,
      context_feature_spec={},
      example_feature_spec={
          'f': FixedLenFeature(shape=(1,), dtype='float32',
                               default_value=0.0),
          'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)},
      label_feature_name='rel', list_size=1, epochs=1, shuffle=False,
      drop_remainder=False, prefetch_batches=1)
  time_lib.sleep(0.7)  # let the filler finish the stream with a full queue

  got = []
  done = threading.Event()

  def consume():
    got.extend(b.mask.shape[0] for b in it)
    done.set()

  t = threading.Thread(target=consume, daemon=True)
  t.start()
  assert done.wait(timeout=30), 'dataset iterator hung at end of stream'
  assert sum(got) == 6


def test_libsvm_native_rejects_malformed_rows(tmp_path):
  """The native LIBSVM fast path must raise on malformed rows, exactly
  like the Python loader — not silently drop them."""
  from ranking_tpu.data import libsvm, native
  path = str(tmp_path / 'bad.txt')
  with open(path, 'w') as f:
    f.write('1 qid:1 1:0.5 2:0.3\n')
    f.write('2 1:0.1 2:0.2\n')  # missing qid
  with pytest.raises(ValueError):
    libsvm.load_libsvm_lists(path, list_size=4, num_features=2,
                             use_native=False)
  if native.available():
    with pytest.raises(ValueError, match='malformed LIBSVM'):
      native.load_libsvm_lists(path, 4, 2, -1.0)


def test_dataset_flag_conflicts_raise(tmp_path):
  recs = [_elwc_bytes({}, [{'f': [1.0], 'rel': [1]}])]
  path = str(tmp_path / 'c.tfrecord')
  tfrecord.write_records(path, recs)
  spec = {'f': FixedLenFeature(shape=(1,), dtype='float32',
                               default_value=0.0),
          'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)}
  with pytest.raises(ValueError, match='shuffle_examples'):
    next(iter(build_ranking_dataset(
        path, data_format='sequence_example', batch_size=1,
        context_feature_spec={}, example_feature_spec=spec,
        label_feature_name='rel', list_size=2, epochs=1,
        shuffle_examples=True)))
  with pytest.raises(ValueError, match='pad_final_batch'):
    next(iter(build_ranking_dataset(
        path, data_format='example_list_with_context', batch_size=2,
        context_feature_spec={}, example_feature_spec=spec,
        label_feature_name='rel', list_size=2, epochs=1,
        pad_final_batch=True, drop_remainder=True)))


def test_dataset_stream_error_propagates(tmp_path):
  """A corrupt TFRecord mid-stream raises in the consumer — it must not
  become a silent clean end-of-stream (data truncation)."""
  recs = [_elwc_bytes({}, [{'f': [1.0], 'rel': [1]}]) for _ in range(2)]
  path = str(tmp_path / 'trunc.tfrecord')
  tfrecord.write_records(path, recs)
  with open(path, 'ab') as f:
    f.write(b'\x99' * 7)  # truncated trailing record header
  spec = {'f': FixedLenFeature(shape=(1,), dtype='float32',
                               default_value=0.0),
          'rel': FixedLenFeature(shape=(), dtype='int64', default_value=0)}
  with pytest.raises(Exception):
    list(build_ranking_dataset(
        path, data_format='example_list_with_context', batch_size=1,
        context_feature_spec={}, example_feature_spec=spec,
        label_feature_name='rel', list_size=2, epochs=1, shuffle=False))


def test_batch_pad_to_masked_rows():
  from ranking_tpu.data.batch import batch_from_labels
  import numpy as np
  b = batch_from_labels(
      labels=np.array([[1.0, 0.0], [2.0, -1.0], [0.0, 1.0]]),
      examples={'x': np.ones((3, 2, 4), np.float32)},
      context={'q': np.ones((3, 5), np.float32)})
  p = b.pad_to(5)
  assert p.batch_size == 5 and p.list_size == 2
  assert not p.mask[3:].any()
  np.testing.assert_array_equal(p.labels[3:], -1.0)
  np.testing.assert_array_equal(p.examples['x'][:3], b.examples['x'])
  np.testing.assert_array_equal(p.examples['x'][3:], 0.0)
  assert b.pad_to(3) is b and b.pad_to(2) is b  # no-op when not short
  # Dict labels: every task padded to -1.
  d = batch_from_labels(
      labels={'a': np.array([[1.0, -1.0]]), 'b': np.array([[0.0, 2.0]])})
  pd = d.pad_to(4)
  for task in ('a', 'b'):
    np.testing.assert_array_equal(pd.labels[task][1:], -1.0)
  assert not pd.mask[1:].any()
