"""Runtime-built protobuf messages for ranking data formats.

The reference decodes `ExampleListWithContext` by synthesizing a
FileDescriptorSet at runtime and calling ``tf.io.decode_proto``
(tensorflow_ranking/python/data.py:59-96). We do the TPU-native analog
host-side: synthesize descriptors for the full message family —
``tensorflow.Example``, ``tensorflow.SequenceExample``, and
``tensorflow.serving.ExampleListWithContext`` — and parse with the
protobuf C (upb) runtime. No TensorFlow, no checked-in generated code.

Wire compatibility notes (field numbers are the contract):
  Example.features = 1;  Features.feature = map<string, Feature> 1;
  Feature.bytes_list = 1 / float_list = 2 / int64_list = 3;
  {Bytes,Float,Int64}List.value = 1;
  SequenceExample.context = 1, .feature_lists = 2;
  FeatureLists.feature_list = map<string, FeatureList> 1;
  FeatureList.feature = repeated Feature 1;
  ExampleListWithContext.examples = repeated 1, .context = 2
  (tensorflow_ranking/python/data.py:66-77).
"""

from __future__ import annotations

from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

_POOL = descriptor_pool.DescriptorPool()

_T = descriptor_pb2.FieldDescriptorProto


def _field(name, number, ftype, label=_T.LABEL_OPTIONAL, type_name=None,
           packed=None):
  f = _T(name=name, number=number, type=ftype, label=label)
  if type_name:
    f.type_name = type_name
  if packed is not None:
    f.options.packed = packed
  return f


def _build_feature_file() -> descriptor_pb2.FileDescriptorProto:
  """tensorflow/core/example/feature.proto equivalents."""
  f = descriptor_pb2.FileDescriptorProto(
      name='ranking_tpu/feature.proto', package='tensorflow', syntax='proto3')

  bl = f.message_type.add(name='BytesList')
  bl.field.append(_field('value', 1, _T.TYPE_BYTES, _T.LABEL_REPEATED))
  fl = f.message_type.add(name='FloatList')
  fl.field.append(_field('value', 1, _T.TYPE_FLOAT, _T.LABEL_REPEATED,
                         packed=True))
  il = f.message_type.add(name='Int64List')
  il.field.append(_field('value', 1, _T.TYPE_INT64, _T.LABEL_REPEATED,
                         packed=True))

  feat = f.message_type.add(name='Feature')
  feat.field.append(_field('bytes_list', 1, _T.TYPE_MESSAGE,
                           type_name='.tensorflow.BytesList'))
  feat.field.append(_field('float_list', 2, _T.TYPE_MESSAGE,
                           type_name='.tensorflow.FloatList'))
  feat.field.append(_field('int64_list', 3, _T.TYPE_MESSAGE,
                           type_name='.tensorflow.Int64List'))
  oneof = feat.oneof_decl.add(name='kind')
  del oneof
  for fld in feat.field:
    fld.oneof_index = 0

  # Features.feature: map<string, Feature>. Maps are syntactic sugar for a
  # nested repeated MapEntry message (key=1, value=2).
  feats = f.message_type.add(name='Features')
  entry = feats.nested_type.add(name='FeatureEntry')
  entry.options.map_entry = True
  entry.field.append(_field('key', 1, _T.TYPE_STRING))
  entry.field.append(_field('value', 2, _T.TYPE_MESSAGE,
                            type_name='.tensorflow.Feature'))
  feats.field.append(_field('feature', 1, _T.TYPE_MESSAGE, _T.LABEL_REPEATED,
                            type_name='.tensorflow.Features.FeatureEntry'))

  flist = f.message_type.add(name='FeatureList')
  flist.field.append(_field('feature', 1, _T.TYPE_MESSAGE, _T.LABEL_REPEATED,
                            type_name='.tensorflow.Feature'))
  flists = f.message_type.add(name='FeatureLists')
  fentry = flists.nested_type.add(name='FeatureListEntry')
  fentry.options.map_entry = True
  fentry.field.append(_field('key', 1, _T.TYPE_STRING))
  fentry.field.append(_field('value', 2, _T.TYPE_MESSAGE,
                             type_name='.tensorflow.FeatureList'))
  flists.field.append(
      _field('feature_list', 1, _T.TYPE_MESSAGE, _T.LABEL_REPEATED,
             type_name='.tensorflow.FeatureLists.FeatureListEntry'))
  return f


def _build_example_file() -> descriptor_pb2.FileDescriptorProto:
  f = descriptor_pb2.FileDescriptorProto(
      name='ranking_tpu/example.proto', package='tensorflow', syntax='proto3')
  f.dependency.append('ranking_tpu/feature.proto')
  ex = f.message_type.add(name='Example')
  ex.field.append(_field('features', 1, _T.TYPE_MESSAGE,
                         type_name='.tensorflow.Features'))
  seq = f.message_type.add(name='SequenceExample')
  seq.field.append(_field('context', 1, _T.TYPE_MESSAGE,
                          type_name='.tensorflow.Features'))
  seq.field.append(_field('feature_lists', 2, _T.TYPE_MESSAGE,
                          type_name='.tensorflow.FeatureLists'))
  return f


def _build_elwc_file() -> descriptor_pb2.FileDescriptorProto:
  f = descriptor_pb2.FileDescriptorProto(
      name='ranking_tpu/input.proto', package='tensorflow.serving',
      syntax='proto3')
  f.dependency.append('ranking_tpu/example.proto')
  elwc = f.message_type.add(name='ExampleListWithContext')
  elwc.field.append(_field('examples', 1, _T.TYPE_MESSAGE, _T.LABEL_REPEATED,
                           type_name='.tensorflow.Example'))
  elwc.field.append(_field('context', 2, _T.TYPE_MESSAGE,
                           type_name='.tensorflow.Example'))
  return f


_POOL.Add(_build_feature_file())
_POOL.Add(_build_example_file())
_POOL.Add(_build_elwc_file())


def _msg(full_name: str):
  return message_factory.GetMessageClass(_POOL.FindMessageTypeByName(full_name))


BytesList = _msg('tensorflow.BytesList')
FloatList = _msg('tensorflow.FloatList')
Int64List = _msg('tensorflow.Int64List')
Feature = _msg('tensorflow.Feature')
Features = _msg('tensorflow.Features')
FeatureList = _msg('tensorflow.FeatureList')
FeatureLists = _msg('tensorflow.FeatureLists')
Example = _msg('tensorflow.Example')
SequenceExample = _msg('tensorflow.SequenceExample')
ExampleListWithContext = _msg('tensorflow.serving.ExampleListWithContext')


def make_example(features: dict) -> 'Example':
  """Builds a tensorflow.Example from {name: list-of-values} (test helper).

  Value type is inferred: bytes/str -> bytes_list, float -> float_list,
  int -> int64_list.
  """
  ex = Example()
  for name, values in features.items():
    if not isinstance(values, (list, tuple)):
      values = [values]
    if not values:
      # Skip BEFORE touching the map: the [] access would create a
      # present-but-kindless Feature, which strict parsers treat
      # differently from an absent key.
      continue
    feat = ex.features.feature[name]
    v0 = values[0]
    if isinstance(v0, bytes):
      feat.bytes_list.value.extend(values)
    elif isinstance(v0, str):
      feat.bytes_list.value.extend(v.encode() for v in values)
    elif isinstance(v0, float):
      feat.float_list.value.extend(values)
    elif isinstance(v0, (bool, int)):
      feat.int64_list.value.extend(int(v) for v in values)
    else:
      raise TypeError(f'Unsupported value type for {name!r}: {type(v0)}')
  return ex


def make_elwc(context: dict, examples: list) -> 'ExampleListWithContext':
  """Builds an ELWC from a context feature dict + list of example dicts."""
  elwc = ExampleListWithContext()
  elwc.context.CopyFrom(make_example(context))
  for ex in examples:
    elwc.examples.add().CopyFrom(make_example(ex))
  return elwc
