"""Self-contained serving artifacts: StableHLO apply + manifest + params.

The deploy-without-code analog of the reference's SavedModel
``Signatures`` export (tensorflow_ranking/python/keras/saved_model.py:
24-175): ``export_predictor`` serializes the model's apply function with
``jax.export`` (StableHLO, batch-dimension polymorphic) at one or more
list-size buckets, alongside a JSON manifest of the feature specs and an
``.npz`` of the variables. ``load_predictor`` reconstructs a fully
functional predictor from the artifact alone — no model class, no
``ranking_tpu.models`` import, no Python code from training time.

Artifact layout::

    <path>/manifest.json          feature specs, buckets, dtypes
    <path>/params.npz             flattened variables
    <path>/apply_L<bucket>.bin    jax.export serialization per bucket

The loaded predictor exposes the same ``predict`` / ``regress`` /
``score_batch`` surface as ``pipeline.serving.Predictor`` and passes the
same predict==regress parity invariant (python/keras/pipeline_test.py:238).
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping, Optional, Sequence, Tuple

import jax
import jax.export as jax_export
import jax.numpy as jnp
import numpy as np

from ranking_tpu.data import parsers

_MANIFEST = 'manifest.json'
_PARAMS = 'params.npz'
_SEP = '|'  # flattened-pytree key separator (never in feature names)


# ---------------------------------------------------------------------------
# Feature-spec (de)serialization
# ---------------------------------------------------------------------------


def spec_to_json(spec: parsers.FeatureSpec) -> dict:
  if isinstance(spec, parsers.FixedLenFeature):
    return {'kind': 'fixed', 'shape': list(spec.shape), 'dtype': spec.dtype,
            'default_value': spec.default_value}
  if isinstance(spec, parsers.VarLenFeature):
    vocab = None
    if spec.vocab is not None:
      inv = sorted(spec.vocab._map.items(), key=lambda kv: kv[1])
      # surrogateescape round-trips arbitrary (non-UTF-8) token bytes
      # through JSON; spec_from_json re-encodes with the same handler.
      vocab = {'tokens': [t.decode('utf-8', 'surrogateescape')
                          for t, _ in inv],
               'num_oov_buckets': spec.vocab.num_oov_buckets}
    return {'kind': 'varlen', 'dtype': spec.dtype, 'max_len': spec.max_len,
            'pad_value': spec.pad_value, 'hash_buckets': spec.hash_buckets,
            'vocab': vocab}
  raise TypeError(f'Unknown spec type: {type(spec)}')


def spec_from_json(d: Mapping[str, Any]) -> parsers.FeatureSpec:
  if d['kind'] == 'fixed':
    return parsers.FixedLenFeature(shape=tuple(d['shape']), dtype=d['dtype'],
                                   default_value=d['default_value'])
  vocab = None
  if d.get('vocab'):
    vocab = parsers.Vocabulary(
        [t.encode('utf-8', 'surrogateescape') for t in d['vocab']['tokens']],
        num_oov_buckets=d['vocab']['num_oov_buckets'])
  return parsers.VarLenFeature(dtype=d['dtype'], max_len=d['max_len'],
                               pad_value=d['pad_value'], vocab=vocab,
                               hash_buckets=d['hash_buckets'])


# ---------------------------------------------------------------------------
# Pytree <-> npz
# ---------------------------------------------------------------------------


def _as_plain_dicts(tree, where='variables'):
  """Validates/normalizes the variables pytree to nested str-keyed dicts
  (the only structure ``_unflatten_vars`` can rebuild at load time) —
  anything else must fail at EXPORT, not at first serving call."""
  from typing import Mapping as _Mapping
  if isinstance(tree, _Mapping):
    out = {}
    for k, v in tree.items():
      if not isinstance(k, str):
        raise TypeError(
            f'export_predictor requires str-keyed dict variables; got key '
            f'{k!r} at {where}')
      if _SEP in k:
        raise TypeError(f'variable key {k!r} contains the reserved '
                        f'separator {_SEP!r} (at {where})')
      out[k] = _as_plain_dicts(v, f'{where}/{k}')
    return out
  if isinstance(tree, (list, tuple)):
    raise TypeError(
        f'export_predictor requires nested dict variables (flax style); '
        f'got {type(tree).__name__} at {where} — restructure or wrap the '
        f'sequence in a dict with string keys')
  return tree


# np.savez writes ml_dtypes arrays (bfloat16, fp8, ...) as raw void
# ('|V2') and np.load hands those back, mismatching the exported graph's
# avals at first serve. Such leaves are stored as a same-width uint view
# under a tagged companion key and viewed back on load.
_DTYPE_TAG = '::dtype'


def _flatten_vars(variables) -> dict:
  flat = {}
  for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
    key = _SEP.join(str(getattr(p, 'key', getattr(p, 'idx', p)))
                    for p in path)
    arr = np.asarray(leaf)
    if arr.dtype.kind == 'V' or arr.dtype.name not in np.sctypeDict:
      uint = np.dtype(f'u{arr.dtype.itemsize}')
      flat[key + _DTYPE_TAG] = np.array(arr.dtype.name)
      arr = arr.view(uint)
    flat[key] = arr
  return flat


def _unflatten_vars(flat: Mapping[str, np.ndarray]) -> dict:
  import ml_dtypes  # noqa: F401 — registers bfloat16/fp8 with numpy
  tree: dict = {}
  tags = {key[:-len(_DTYPE_TAG)]: str(value)
          for key, value in flat.items() if key.endswith(_DTYPE_TAG)}
  for key, value in flat.items():
    if key.endswith(_DTYPE_TAG):
      continue
    if key in tags:
      value = value.view(np.dtype(tags[key]))
    node = tree
    parts = key.split(_SEP)
    for part in parts[:-1]:
      node = node.setdefault(part, {})
    node[parts[-1]] = value
  return tree


# ---------------------------------------------------------------------------
# Weight-only int8 quantization
# ---------------------------------------------------------------------------

_QVAL = '__q__'
_QSCALE = '__scale__'
# Leaves smaller than this stay f32: biases, BN vectors, LayerNorm gains —
# quantizing them saves nothing and costs accuracy.
_Q_MIN_SIZE = 4096


def _quantize_leaf(w: np.ndarray):
  """Symmetric int8 with per-channel scales.

  Tall matrices (rows >= 4x cols — embedding tables) get per-row scales
  (row norms vary wildly across a vocabulary); everything else (Dense
  kernels [in, out], attention projections) per-output-channel scales.
  """
  w = np.asarray(w)
  axis = tuple(range(1, w.ndim)) if w.shape[0] >= 4 * w.shape[-1] \
      else tuple(range(w.ndim - 1))
  amax = np.max(np.abs(w), axis=axis, keepdims=True)
  scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
  q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
  return {_QVAL: q, _QSCALE: scale}


def quantize_variables(variables):
  """Replaces large float matrices with {__q__, __scale__} subtrees.

  Raises if nothing qualifies — a silent no-op would ship a full-size
  artifact whose manifest claims int8.
  """
  hits = [0]

  def walk(node):
    if isinstance(node, Mapping):
      return {k: walk(v) for k, v in node.items()}
    arr = np.asarray(node)
    # jnp.issubdtype covers bfloat16 (np.issubdtype does not — bf16
    # params from mixed-precision training must not silently skip).
    if (arr.ndim >= 2 and arr.size >= _Q_MIN_SIZE
        and jnp.issubdtype(arr.dtype, jnp.floating)):
      hits[0] += 1
      return _quantize_leaf(arr.astype(np.float32))
    return node

  out = walk(variables)
  if not hits[0]:
    raise ValueError(
        'quantize=\'int8\' matched no variables (need float matrices with '
        f'>= {_Q_MIN_SIZE} elements) — the artifact would be full-size '
        'while claiming int8; export without quantize instead')
  return out


def dequantize_tree(tree):
  """In-graph inverse: works on jnp tracers inside the exported apply."""
  if isinstance(tree, Mapping):
    if set(tree) == {_QVAL, _QSCALE}:
      return tree[_QVAL].astype(jnp.float32) * tree[_QSCALE]
    return {k: dequantize_tree(v) for k, v in tree.items()}
  return tree


# ---------------------------------------------------------------------------
# Export
# ---------------------------------------------------------------------------


def _example_avals(sample_examples, list_size: int, batch_dim):
  avals = {}
  for name, arr in sample_examples.items():
    shape = (batch_dim, list_size) + tuple(np.shape(arr)[2:])
    avals[name] = jax.ShapeDtypeStruct(shape, np.asarray(arr).dtype)
  return avals


def export_predictor(
    model: Any,
    variables: Mapping[str, Any],
    context_feature_spec: Mapping[str, parsers.FeatureSpec],
    example_feature_spec: Mapping[str, parsers.FeatureSpec],
    path: str,
    sample_batch: Any,
    list_size_buckets: Sequence[int] = (),
    label_feature_name: Optional[str] = None,
    quantize: Optional[str] = None,
) -> str:
  """Writes a self-contained serving artifact to ``path``.

  ``sample_batch`` (a RankingBatch or anything with ``.context`` /
  ``.examples`` / ``.mask``) supplies the per-feature shapes and dtypes;
  the batch dimension is exported symbolically so any request batch size
  works, and the list dimension is exported once per bucket in
  ``list_size_buckets`` (default: the sample's list size, plus 1 for the
  pointwise ``regress`` signature).

  ``quantize='int8'`` stores every large float matrix (Dense kernels,
  embedding tables) as symmetric int8 with per-channel float scales —
  ~4x smaller params.npz — and bakes the dequantization into the
  exported graph, so the artifact stays self-contained and the loader
  is unchanged. Weight-only: activations and the math stay float.
  """
  example_feature_spec = {k: v for k, v in example_feature_spec.items()
                          if k != label_feature_name}
  # Fail at EXPORT, not at first serve: a spec feature missing from the
  # sample batch would be silently dropped from the exported avals while
  # the manifest still advertises it — the serving-side parse would then
  # pass an extra pytree leaf and fn.call would raise in production.
  missing_ex = sorted(set(example_feature_spec) - set(sample_batch.examples))
  missing_ctx = sorted(set(context_feature_spec) - set(sample_batch.context))
  if missing_ex or missing_ctx:
    raise ValueError(
        'export_predictor: feature spec names absent from sample_batch — '
        f'examples: {missing_ex}, context: {missing_ctx}; the sample must '
        'carry every feature the serving spec will parse')
  sample_examples = {k: v for k, v in dict(sample_batch.examples).items()
                     if k in example_feature_spec}
  sample_context = {k: v for k, v in dict(sample_batch.context).items()
                    if k in context_feature_spec}

  buckets = sorted(set(list_size_buckets)
                   or {int(np.shape(sample_batch.mask)[1])})
  if 1 not in buckets:
    buckets = [1] + buckets

  os.makedirs(path, exist_ok=True)

  variables = _as_plain_dicts(dict(variables))
  if quantize is not None:
    if quantize != 'int8':
      raise ValueError(f"quantize must be 'int8' or None, got {quantize!r}")
    variables = quantize_variables(variables)
  var_avals = jax.tree.map(
      lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
      variables)

  def _apply(variables, context, examples, mask):
    if quantize is not None:
      variables = dequantize_tree(variables)
    return model.apply(variables, context, examples, mask, training=False)

  for bucket in buckets:
    (b,) = jax_export.symbolic_shape('b')
    ctx_avals = {
        name: jax.ShapeDtypeStruct((b,) + tuple(np.shape(arr)[1:]),
                                   np.asarray(arr).dtype)
        for name, arr in sample_context.items()}
    ex_avals = _example_avals(sample_examples, bucket, b)
    mask_aval = jax.ShapeDtypeStruct((b, bucket), np.bool_)
    exported = jax_export.export(jax.jit(_apply))(
        var_avals, ctx_avals, ex_avals, mask_aval)
    with open(os.path.join(path, f'apply_L{bucket}.bin'), 'wb') as f:
      f.write(exported.serialize())

  np.savez(os.path.join(path, _PARAMS), **_flatten_vars(variables))

  manifest = {
      'format_version': 1,
      'context_feature_spec': {k: spec_to_json(v)
                               for k, v in context_feature_spec.items()},
      'example_feature_spec': {k: spec_to_json(v)
                               for k, v in example_feature_spec.items()},
      'list_size_buckets': buckets,
      # Informational: dequantization is baked into the exported graphs,
      # so the loader needs no special handling.
      'quantize': quantize,
  }
  with open(os.path.join(path, _MANIFEST), 'w') as f:
    json.dump(manifest, f, indent=2)
  return path


# ---------------------------------------------------------------------------
# Load
# ---------------------------------------------------------------------------


class ExportedPredictor:
  """Predictor reconstructed from an artifact — no model code needed."""

  def __init__(self, path: str):
    with open(os.path.join(path, _MANIFEST)) as f:
      manifest = json.load(f)
    if manifest.get('format_version') != 1:
      raise ValueError(f"Unsupported artifact version: "
                       f"{manifest.get('format_version')!r}")
    self.context_feature_spec = {
        k: spec_from_json(v)
        for k, v in manifest['context_feature_spec'].items()}
    self.example_feature_spec = {
        k: spec_from_json(v)
        for k, v in manifest['example_feature_spec'].items()}
    self.buckets = list(manifest['list_size_buckets'])

    with np.load(os.path.join(path, _PARAMS)) as z:
      # device_put ONCE: serving from host numpy would re-upload every
      # parameter (embedding tables included) on every predict call.
      self.variables = jax.device_put(
          _unflatten_vars({k: z[k] for k in z.files}))

    self._fns = {}
    for bucket in self.buckets:
      with open(os.path.join(path, f'apply_L{bucket}.bin'), 'rb') as f:
        self._fns[bucket] = jax_export.deserialize(bytearray(f.read()))

  def _bucket_for(self, longest: int) -> int:
    for bucket in self.buckets:
      if bucket >= longest:
        return bucket
    raise ValueError(
        f'Request list size {longest} exceeds the largest exported bucket '
        f'{self.buckets[-1]}; re-export with a larger bucket.')

  def _run(self, parsed: parsers.ParsedLists, bucket: int) -> np.ndarray:
    fn = self._fns[bucket]
    return np.asarray(fn.call(
        self.variables,
        jax.tree.map(jnp.asarray, parsed.context),
        jax.tree.map(jnp.asarray, parsed.examples),
        jnp.asarray(parsed.mask)))

  def predict(self, serialized_elwcs: Sequence[bytes]) -> np.ndarray:
    """[B, bucket] scores from serialized ELWC protos (bucketed shapes)."""
    if not serialized_elwcs:
      # Widest exported bucket: buckets[0] is the regress-signature 1.
      return np.zeros((0, self.buckets[-1]), np.float32)
    longest = max(1, int(parsers.elwc_list_sizes(serialized_elwcs).max()))
    bucket = self._bucket_for(longest)
    parsed = self._parse_elwc(serialized_elwcs, bucket)
    return self._run(parsed, bucket)

  def _parse_elwc(self, serialized, bucket):
    return parsers.parse_with_native_fallback(
        serialized, self.context_feature_spec, self.example_feature_spec,
        bucket)

  def regress(self, serialized_examples: Sequence[bytes]) -> np.ndarray:
    """[B] scores from serialized pointwise tf.Example protos."""
    if not serialized_examples:
      return np.zeros((0,), np.float32)
    parsed = parsers.parse_with_native_fallback(
        serialized_examples, self.context_feature_spec,
        self.example_feature_spec, 1, data_format='tf_example')
    return self._run(parsed, 1)[:, 0]

  def score_batch(self, batch) -> np.ndarray:
    """Scores a pre-assembled RankingBatch at its exact list size."""
    bucket = self._bucket_for(int(np.shape(batch.mask)[1]))
    if int(np.shape(batch.mask)[1]) != bucket:
      raise ValueError(
          f'score_batch requires an exported bucket size; got list size '
          f'{np.shape(batch.mask)[1]}, buckets {self.buckets}')
    fn = self._fns[bucket]
    # Restrict to the exported calling convention: training batches may
    # carry extra columns (e.g. the label feature) the artifact never saw.
    context = {k: v for k, v in dict(batch.context).items()
               if k in self.context_feature_spec}
    examples = {k: v for k, v in dict(batch.examples).items()
                if k in self.example_feature_spec}
    return np.asarray(fn.call(self.variables, context, examples,
                              batch.mask))


def load_predictor(path: str) -> ExportedPredictor:
  return ExportedPredictor(path)
