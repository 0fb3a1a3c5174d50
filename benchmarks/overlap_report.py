"""Collective inventory + overlap evidence for the sharded train step.

Two modes:

* default (CPU, 8 virtual devices): compiles the full data+model sharded
  train step (row-sharded embeddings, softmax loss) and inventories every
  collective in the optimized HLO — op kind, payload shape, bytes —
  separating the embedding-lookup psums from the data-parallel gradient
  reductions. The CPU backend emits synchronous ``all-reduce`` only, so
  this mode documents *what* must overlap, not that it does.

* ``--tpu_topology`` (e.g. ``v5e:2x2``): AOT-compiles the same step for a
  multi-chip TPU topology (no chips needed) and scans the scheduled HLO
  for ``all-reduce-start``/``-done`` pairs with compute scheduled between
  them — XLA's latency-hiding scheduler overlapping the collective with
  dense work. This is the BASELINE.md "lookup all-to-all overlapped
  against dense compute" evidence (reference analog:
  keras/strategy_utils.py embedding partitioning, which offers no such
  overlap view at all).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/overlap_report.py
  python benchmarks/overlap_report.py --tpu_topology v5e:2x2
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(mesh):
  import jax
  import optax

  import __graft_entry__ as g
  from ranking_tpu import models, ops, parallel, train

  vocab = 63  # odd: exercises the pad-to-shard-multiple path
  model = models.RankingModel(
      scorer=models.EmbeddingDNNScorer(
          hidden_layer_dims=(64, 32),
          vocab_sizes={'query_tokens': vocab, 'document_tokens': vocab},
          embedding_dim=16,
          mesh=mesh,
          dropout=0.0))
  batch = g._synthetic_batch(batch=8, list_size=16, num_features=8,
                             vocab=vocab)
  state = train.create_train_state(
      model, optax.adam(1e-3), jax.random.PRNGKey(0),
      batch.context, batch.examples, batch.mask)
  state = g._shard_state(state, mesh)
  batch = parallel.shard_batch(batch, mesh)
  loss_fn = ops.make_loss_fn(ops.RankingLossKey.SOFTMAX_LOSS)
  step = jax.jit(train.make_train_step(loss_fn))
  return step, (state, batch, jax.random.PRNGKey(1))


_SHAPE_RE = re.compile(r'=\s*\(?([a-z0-9]+)\[([0-9,]*)\]')
_DTYPE_BYTES = {'f32': 4, 'bf16': 2, 'f16': 2, 's32': 4, 'u32': 4,
                'pred': 1, 's8': 1, 'u8': 1, 'f64': 8, 's64': 8, 'u64': 8}


def _payload_bytes(line: str) -> int:
  m = _SHAPE_RE.search(line)
  if not m:
    return 0
  dtype, dims = m.group(1), m.group(2)
  n = 1
  for d in dims.split(','):
    if d:
      n *= int(d)
  return n * _DTYPE_BYTES.get(dtype, 4)


def inventory(hlo: str):
  rows = []
  for line in hlo.splitlines():
    m = re.search(r'\b(all-reduce-start|all-reduce-done|all-reduce|'
                  r'all-gather-start|all-gather|reduce-scatter|'
                  r'collective-permute|all-to-all)\b', line)
    if m and '=' in line:
      rows.append((m.group(1), _payload_bytes(line), line.strip()[:100]))
  return rows


def overlap_windows(hlo: str):
  """(start_name, #compute ops scheduled between start and done) pairs."""
  windows = []
  open_ops = {}
  for line in hlo.splitlines():
    line = line.strip()
    ms = re.match(r'%?([\w.-]+)\s*=.*\b(all-reduce-start|all-gather-start|'
                  r'collective-permute-start)\b', line)
    if ms:
      open_ops[ms.group(1)] = 0
      continue
    md = re.search(r'\b(all-reduce-done|all-gather-done|'
                   r'collective-permute-done)\b.*%?([\w.-]+)\)', line)
    if md and md.group(2) in open_ops:
      windows.append((md.group(2), open_ops.pop(md.group(2))))
      continue
    if open_ops and re.search(r'\b(dot|fusion|convolution|custom-call)\b',
                              line):
      for k in open_ops:
        open_ops[k] += 1
  return windows


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--tpu_topology', default=None,
                  help="e.g. 'v5e:2x2' — AOT-compile for this topology")
  ap.add_argument('--dump_hlo', default=None)
  args = ap.parse_args()

  import jax

  if args.tpu_topology:
    from jax.experimental import topologies
    kind, _, dims = args.tpu_topology.partition(':')
    topo = topologies.get_topology_desc(
        platform='tpu', topology_name=f'{kind}:{dims}')
    devices = topo.devices
    from ranking_tpu import parallel
    mesh = parallel.make_mesh(devices=devices, model=2)
    step, arg_specs = build_step(mesh)
    compiled = step.lower(*arg_specs).compile()
  else:
    jax.config.update('jax_platforms', 'cpu')
    assert len(jax.devices()) >= 8, (
        'run with XLA_FLAGS=--xla_force_host_platform_device_count=8')
    from ranking_tpu import parallel
    mesh = parallel.make_mesh(devices=jax.devices()[:8], model=2)
    step, arg_specs = build_step(mesh)
    compiled = step.lower(*arg_specs).compile()

  hlo = compiled.as_text()
  if args.dump_hlo:
    with open(args.dump_hlo, 'w') as f:
      f.write(hlo)

  rows = inventory(hlo)
  by_kind = {}
  for kind, nbytes, _ in rows:
    cnt, total = by_kind.get(kind, (0, 0))
    by_kind[kind] = (cnt + 1, total + nbytes)
  print('== collective inventory (optimized HLO) ==')
  for kind, (cnt, total) in sorted(by_kind.items()):
    print(f'  {kind:24s} x{cnt:<4d} {total / 1024:.1f} KiB total payload')

  # Lookup psums carry the pooled [.., D+1] activations; gradient
  # reductions carry parameter-shaped payloads.
  small = [r for r in rows if 0 < r[1] <= 16 * 1024]
  print(f'  ({len(small)} collectives with <=16 KiB payloads — '
        'activation-sized, the embedding-lookup psum class)')

  wins = overlap_windows(hlo)
  if wins:
    overlapped = [w for w in wins if w[1] > 0]
    print(f'== overlap: {len(overlapped)}/{len(wins)} async collectives '
          'have compute scheduled inside their start/done window ==')
    for name, n in wins[:12]:
      print(f'  {name}: {n} compute ops inside window')
  else:
    print('== no async start/done pairs in this backend '
          '(CPU emits synchronous collectives; use --tpu_topology for '
          'overlap evidence) ==')


if __name__ == '__main__':
  main()
