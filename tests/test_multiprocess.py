"""True multi-process distributed test: 2 processes x 4 virtual devices.

Exercises the real multi-host code path the reference never tested
(SURVEY.md section 4): ``jax.distributed.initialize`` over localhost,
per-process host batches assembled into global arrays
(``parallel.local_batch_to_global``), a sharded train step whose gradient
psum spans both processes, and cross-process ``MeanState.psum`` metric
aggregation. Skipped gracefully if the local environment cannot form the
cluster.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent('''
    import os, sys
    import jax
    jax.config.update('jax_platforms', 'cpu')

    coordinator, rank = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=rank)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8  # 4 local x 2 processes

    import numpy as np
    import optax
    sys.path.insert(0, os.getcwd())
    from ranking_tpu import models, ops, parallel, train
    from ranking_tpu.data.batch import batch_from_labels

    mesh = parallel.make_mesh()
    assert mesh.shape['data'] == 8

    # Each process contributes its own half of the global batch.
    rng = np.random.RandomState(100 + rank)
    labels = rng.randint(0, 3, size=(8, 6)).astype(np.float32)
    local = batch_from_labels(
        labels=labels, examples={'x': rng.randn(8, 6, 4).astype(np.float32)})
    batch = parallel.local_batch_to_global(local, mesh)
    assert batch.labels.shape[0] == 16  # global batch

    model = models.RankingModel(scorer=models.DNNScorer(
        hidden_layer_dims=(8,), dropout=0.0, use_batch_norm=False))
    state = train.create_train_state(
        model, optax.sgd(0.1), jax.random.PRNGKey(0),
        batch.context, batch.examples, batch.mask)
    state = state.replace(params=parallel.shard_params(state.params, mesh),
                          opt_state=parallel.shard_params(state.opt_state,
                                                          mesh))
    step = jax.jit(train.make_train_step(
        ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)), donate_argnums=0)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics['loss'])
    assert np.isfinite(loss)

    # Params are replicated: every process must hold identical values.
    checksum = float(sum(jax.numpy.sum(jax.numpy.abs(l))
                         for l in jax.tree.leaves(state.params)))

    # Phase 2: embedding table sharded over a model axis that spans both
    # processes -> the lookup psum crosses the process boundary.
    import jax.numpy as jnp
    from ranking_tpu.models import embeddings
    mesh2 = parallel.make_mesh(model=2)
    table = jnp.asarray(np.random.RandomState(5).randn(32, 4)
                        .astype(np.float32))
    ids = jnp.asarray(np.random.RandomState(6).randint(-1, 32, (16, 3)))
    sharded = parallel.sharded_pooled_lookup(table, ids, mesh2, 'mean')
    expected = embeddings.pooled_lookup(table, ids, 'mean')
    emb_diff = float(jnp.max(jnp.abs(sharded - expected)))
    assert emb_diff < 1e-5, emb_diff

    # Phase 3: the SPARSE train step on row-sharded tables over a model
    # axis spanning both processes (dp=4 x tp=2): the embedding-row
    # gather/scatter collectives cross the process boundary.
    from ranking_tpu.train import sparse as sparse_lib
    vocab = 31  # odd -> table pads itself to the model axis
    smodel = models.RankingModel(scorer=models.EmbeddingDNNScorer(
        hidden_layer_dims=(8,), vocab_sizes={'document_tokens': vocab},
        embedding_dim=8, mesh=mesh2, dropout=0.0))
    rngs = np.random.RandomState(7)  # same on both ranks: shared global
    slabels = rngs.randint(0, 3, size=(16, 6)).astype(np.float32)
    sglobal = batch_from_labels(
        labels=slabels,
        examples={
            'float_features': rngs.randn(16, 6, 4).astype(np.float32),
            'document_tokens': rngs.randint(
                0, vocab, size=(16, 6, 3)).astype(np.int32)})
    rows = 16 // jax.process_count()
    slocal = jax.tree.map(lambda x: x[rank * rows:(rank + 1) * rows],
                          sglobal)
    sbatch = parallel.local_batch_to_global(slocal, mesh2)
    sstate = train.create_train_state(
        smodel, optax.adam(1e-3), jax.random.PRNGKey(0),
        sbatch.context, sbatch.examples, sbatch.mask,
        sparse_tx=train.LazyAdam(learning_rate=1e-3, dma_scatter=False))
    sstate = sstate.replace(
        params=parallel.shard_params(sstate.params, mesh2),
        opt_state=parallel.shard_params(sstate.opt_state, mesh2),
        sparse_opt_state=parallel.shard_params(
            sstate.sparse_opt_state, mesh2))
    efs = sparse_lib.derive_embed_features(
        sstate.params, sbatch.context, sbatch.examples)
    assert len(efs) == 1, efs
    sstep = jax.jit(train.make_sparse_train_step(
        ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS), efs),
        donate_argnums=0)
    sstate, sm = sstep(sstate, sbatch, jax.random.PRNGKey(2))
    sloss = float(sm['loss'])
    assert np.isfinite(sloss)

    # Phase 4: multi-host input sharding end to end — each process
    # streams a DISJOINT file shard through the native C++ loader
    # (shard_index=rank), contributes its half of every global batch,
    # and the replicated params stay identical across processes.
    from ranking_tpu.data import FixedLenFeature
    from ranking_tpu.data.dataset import native_ranking_dataset
    corpus = sys.argv[3]
    nbatches = 0
    for lb in native_ranking_dataset(
        corpus + '/part-*.tfrecord', batch_size=4,
        context_feature_spec={},
        example_feature_spec={
            'x': FixedLenFeature(shape=(4,), dtype='float32',
                                 default_value=0.0),
            'rel': FixedLenFeature(shape=(), dtype='int64',
                                   default_value=0)},
        label_feature_name='rel', list_size=6, epochs=1, shuffle=False,
        drop_remainder=True, num_threads=2,
        shard_index=rank, num_shards=2):
      gb = parallel.local_batch_to_global(lb, mesh)
      assert gb.labels.shape[0] == 8  # 4 local lists x 2 processes
      state, metrics = step(state, gb, jax.random.PRNGKey(3))
      nbatches += 1
    dloss = float(metrics['loss'])
    checksum2 = float(sum(jax.numpy.sum(jax.numpy.abs(l))
                          for l in jax.tree.leaves(state.params)))

    print(f'RESULT rank={rank} loss={loss:.6f} checksum={checksum:.6f} '
          f'embdiff={emb_diff:.8f} sloss={sloss:.6f} '
          f'nbatches={nbatches} dloss={dloss:.6f} '
          f'checksum2={checksum2:.6f}', flush=True)
''')


@pytest.mark.skipif(os.environ.get('RANKING_TPU_SKIP_MULTIPROC') == '1',
                    reason='explicitly disabled')
def test_two_process_data_parallel(tmp_path):
  with socket.socket() as s:
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
  coordinator = f'localhost:{port}'
  worker = tmp_path / 'worker.py'
  worker.write_text(_WORKER)

  # Phase-4 corpus: 4 files x 8 ELWC records (6 docs, 4 floats + rel)
  # so each of the 2 processes owns 2 files = 16 records = 4 batches.
  import numpy as np
  from ranking_tpu.data import proto, tfrecord
  corpus = tmp_path / 'corpus'
  corpus.mkdir()
  rng = np.random.RandomState(0)
  for f in range(4):
    recs = []
    for _ in range(8):
      docs = [{'x': rng.randn(4).astype(np.float32).tolist(),
               'rel': [int(rng.randint(0, 3))]} for _ in range(6)]
      recs.append(proto.make_elwc({}, docs).SerializeToString())
    tfrecord.write_records(str(corpus / f'part-{f}.tfrecord'), recs)

  env = dict(os.environ)
  env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
  env.pop('JAX_PLATFORMS', None)
  procs = [
      subprocess.Popen(
          [sys.executable, str(worker), coordinator, str(rank),
           str(corpus)],
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
          cwd='/root/repo', env=env)
      for rank in range(2)
  ]
  outs = []
  for p in procs:
    try:
      out, _ = p.communicate(timeout=300)
    except subprocess.TimeoutExpired:
      p.kill()
      for q in procs:
        if q.poll() is None:
          q.kill()
      pytest.skip('multi-process cluster did not form in time')
    outs.append(out)
  for p, out in zip(procs, outs):
    if p.returncode != 0 and 'DEADLINE_EXCEEDED' in out:
      pytest.skip('coordination service unavailable in this sandbox')
    assert p.returncode == 0, out[-2000:]

  results = {}
  for out in outs:
    for line in out.splitlines():
      if line.startswith('RESULT'):
        parts = dict(kv.split('=') for kv in line.split()[1:])
        results[parts['rank']] = (parts['loss'], parts['checksum'],
                                  parts['embdiff'], parts['sloss'],
                                  parts['nbatches'], parts['dloss'],
                                  parts['checksum2'])
  assert set(results) == {'0', '1'}
  # Same global computation on both processes: loss and params agree,
  # including after the sharded-ingestion training phase.
  assert results['0'] == results['1']
  assert results['0'][4] == '4'  # 16 records per shard / 4 local lists
