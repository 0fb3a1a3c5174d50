"""TREC run/qrels evaluation (RD-Suite eval script analog).

Hand-computed golden values follow the notebook's semantics
(datasets/rd_suite/RD_Suite_Eval_Script.ipynb): inner join of qrels and
run on (query_id, doc_id), metrics over the joined lists.
"""

import math
import os
import sys

import numpy as np
import pytest

from ranking_tpu.data import trec
from ranking_tpu.ops import metric_registry


@pytest.fixture
def files(tmp_path):
  qrels = tmp_path / 'qrels.txt'
  run = tmp_path / 'run.txt'
  qrels.write_text('\n'.join([
      'q1 0 d1 1',
      'q1 0 d2 0',
      'q1 0 d3 2',
      'q1 0 d5 3',      # judged but never retrieved -> dropped
      'q2 0 d1 0',
      'q2 0 d2 1',
      'q3 0 d9 2',      # query absent from the run -> skipped
  ]) + '\n')
  run.write_text('\n'.join([
      'q1 Q0 d2 1 0.9 sys',
      'q1 Q0 d1 2 0.5 sys',
      'q1 Q0 d4 3 0.3 sys',  # retrieved but unjudged -> dropped
      'q1 Q0 d3 4 0.1 sys',
      'q2 Q0 d1 1 1.0 sys',
      'q2 Q0 d2 2 0.2 sys',
  ]) + '\n')
  return str(qrels), str(run)


def test_evaluate_run_golden(files):
  qrels_path, run_path = files
  res = trec.evaluate_run(qrels_path, run_path, metrics='mrr,ndcg,mrr@1')
  # q1 joined: d2(0,.9) d1(1,.5) d3(2,.1); q2: d1(0,1.) d2(1,.2).
  assert res['mrr'] == pytest.approx(0.5, abs=1e-6)
  ndcg_q1 = ((1 / math.log2(3) + 3 / math.log2(4))
             / (3 / math.log2(2) + 1 / math.log2(3)))
  ndcg_q2 = (1 / math.log2(3)) / 1.0
  assert res['ndcg'] == pytest.approx((ndcg_q1 + ndcg_q2) / 2, abs=1e-5)
  assert res['mrr@1'] == pytest.approx(0.0, abs=1e-6)


def test_binary_threshold(files):
  qrels_path, run_path = files
  res = trec.evaluate_run(qrels_path, run_path, metrics='mrr:rel>=2')
  # q1 binarized at rel>=2: only d3 relevant, ranked 3rd -> 1/3. q2: none.
  assert res['mrr[rel>=2]'] == pytest.approx((1 / 3 + 0.0) / 2, abs=1e-6)


def test_matches_compute_mean_on_dense(files):
  qrels_path, run_path = files
  lists = list(trec.merged_lists(trec.read_qrels(qrels_path),
                                 trec.read_run(run_path)))
  assert [qid for qid, _, _ in lists] == ['q1', 'q2']
  (labels, scores), = list(trec.padded_batches(iter(lists)))
  assert labels.shape == scores.shape == (2, 8)  # bucketed to min size 8
  want = float(metric_registry.compute_mean('ndcg', labels, scores, topn=5))
  res = trec.evaluate_run(qrels_path, run_path, metrics='ndcg@5')
  assert res['ndcg@5'] == pytest.approx(want, abs=1e-6)


def test_write_read_run_round_trip(tmp_path, files):
  qrels_path, run_path = files
  scores = {'q1': {'d2': 0.9, 'd1': 0.5, 'd4': 0.3, 'd3': 0.1},
            'q2': {'d1': 1.0, 'd2': 0.2}}
  out = tmp_path / 'round.txt'
  trec.write_run(str(out), scores)
  rt = trec.read_run(str(out))
  assert set(rt) == {'q1', 'q2'}
  # Ranked by descending score with 1-based ranks.
  assert [d for d, _ in rt['q1']] == ['d2', 'd1', 'd4', 'd3']
  first = out.read_text().splitlines()[0].split()
  assert first[:4] == ['q1', 'Q0', 'd2', '1'] and first[5] == 'ranking_tpu'
  res_rt = trec.evaluate_run(qrels_path, str(out), metrics='ndcg,mrr')
  res_orig = trec.evaluate_run(qrels_path, run_path, metrics='ndcg,mrr')
  assert res_rt == pytest.approx(res_orig)


def test_batching_equals_single_batch(files):
  qrels_path, run_path = files
  a = trec.evaluate_run(qrels_path, run_path, metrics='ndcg,mrr',
                        batch_size=1)
  b = trec.evaluate_run(qrels_path, run_path, metrics='ndcg,mrr',
                        batch_size=128)
  assert a == pytest.approx(b, abs=1e-6)


def test_bucketing():
  assert trec._bucket(1) == 8
  assert trec._bucket(8) == 8
  assert trec._bucket(9) == 16
  assert trec._bucket(1000) == 1024


def test_parse_metric_specs_validation():
  specs = trec.parse_metric_specs('ndcg@5, mrr:rel>=3.0 ,map')
  assert [s.name for s in specs] == ['ndcg@5', 'mrr[rel>=3]', 'map']
  with pytest.raises(ValueError, match='Unknown metric key'):
    trec.parse_metric_specs('ndgc@5')
  with pytest.raises(ValueError, match='rel>='):
    trec.parse_metric_specs('mrr:rel>3')
  with pytest.raises(ValueError, match='no metrics'):
    trec.evaluate_run('x', 'y', metrics='')


def test_merged_lists_qrels_row_order_under_ties(tmp_path):
  """Joined docs follow qrels (left-frame) row order, like the notebook's
  qrel.merge(run) — observable when scores tie, since sort_by_scores
  breaks ties by list position."""
  qrels = tmp_path / 'q.txt'
  run = tmp_path / 'r.txt'
  qrels.write_text('q1 0 dA 1\nq1 0 dB 0\n')
  # Run retrieves them in the OPPOSITE order with tied scores; a repeated
  # doc keeps its first score.
  run.write_text('q1 Q0 dB 1 0.5 sys\n'
                 'q1 Q0 dA 2 0.5 sys\n'
                 'q1 Q0 dA 3 9.9 sys\n')
  (qid, labels, scores), = list(trec.merged_lists(
      trec.read_qrels(str(qrels)), trec.read_run(str(run))))
  assert qid == 'q1'
  np.testing.assert_array_equal(labels, [1.0, 0.0])  # dA first (qrels order)
  np.testing.assert_array_equal(scores, [0.5, 0.5])  # dA's FIRST run score


def test_duplicate_metric_specs_raise(files):
  qrels_path, run_path = files
  with pytest.raises(ValueError, match='Duplicate metric spec'):
    trec.evaluate_run(qrels_path, run_path, metrics='ndcg,ndcg')


def test_malformed_files(tmp_path):
  bad = tmp_path / 'bad.txt'
  bad.write_text('q1 0 d1\n')
  with pytest.raises(ValueError, match='expected 4 fields'):
    trec.read_qrels(str(bad))
  with pytest.raises(ValueError, match='expected 6 fields'):
    trec.read_run(str(bad))


def test_no_overlap_returns_zero(tmp_path):
  qrels = tmp_path / 'q.txt'
  run = tmp_path / 'r.txt'
  qrels.write_text('q1 0 d1 1\n')
  run.write_text('q2 Q0 d1 1 1.0 sys\n')
  res = trec.evaluate_run(str(qrels), str(run), metrics='mrr')
  assert res['mrr'] == 0.0


def test_reference_metrics_parity(tmp_path):
  """evaluate_run matches the ACTUAL reference metrics_impl on the merged
  lists — the RD-Suite notebook's exact recipe (pandas inner join + tfr
  metrics) replayed with the oracle implementation."""
  import tests.test_reference_parity as rp
  ref = None
  try:
    # Reuse the parity suite's standalone loader (module-scoped fixture
    # body, invoked directly — no TF estimator package import).
    ref = rp.ref.__wrapped__()
  except Exception as e:  # reference not mounted / TF import failure
    pytest.skip(f'reference unavailable: {e}')
  import tensorflow as tf

  rng = np.random.RandomState(7)
  qrels_path = str(tmp_path / 'q.txt')
  run_path = str(tmp_path / 'r.txt')
  with open(qrels_path, 'w') as q, open(run_path, 'w') as r:
    for qi in range(40):
      n = int(rng.randint(2, 30))
      for di in range(n):
        rel = int(rng.choice([0, 0, 1, 2, 3]))
        score = rel * 0.5 + rng.randn()
        q.write(f'q{qi} 0 d{di} {rel}\n')
        r.write(f'q{qi} Q0 d{di} {di + 1} {score:.4f} sys\n')

  lists = list(trec.merged_lists(trec.read_qrels(qrels_path),
                                 trec.read_run(run_path)))
  size = max(len(l) for _, l, _ in lists)
  labels = np.full((len(lists), size), -1.0, np.float32)
  scores = np.zeros((len(lists), size), np.float32)
  for i, (_, l, s) in enumerate(lists):
    labels[i, :len(l)] = l
    scores[i, :len(s)] = s

  def ref_mean(metric, lab):
    v, w = metric.compute(tf.constant(lab), tf.constant(scores), None)
    v, w = v.numpy(), w.numpy()
    return float((v * w).sum() / w.sum())

  bin_labels = np.where(labels >= 0, (labels >= 3).astype(np.float32),
                        labels)
  want = {
      'ndcg@5': ref_mean(ref.metrics_impl.NDCGMetric('ndcg', topn=5),
                         labels),
      'mrr@10': ref_mean(ref.metrics_impl.MRRMetric('mrr', topn=10),
                         labels),
      'map': ref_mean(
          ref.metrics_impl.MeanAveragePrecisionMetric('map', topn=None),
          labels),
      'mrr[rel>=3]': ref_mean(
          ref.metrics_impl.MRRMetric('mrr', topn=None), bin_labels),
  }
  got = trec.evaluate_run(qrels_path, run_path,
                          metrics='ndcg@5,mrr@10,map,mrr:rel>=3')
  for name, value in want.items():
    assert got[name] == pytest.approx(value, abs=2e-4), name


def test_cli(tmp_path, files, monkeypatch, capsys):
  qrels_path, run_path = files
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      'trec_eval_example', os.path.join(repo, 'examples/trec_eval.py'))
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  monkeypatch.setattr(sys, 'argv', [
      'trec_eval.py', f'--qrels={qrels_path}', f'--run={run_path}',
      '--metrics=ndcg@5,mrr'])
  mod.main()
  out = capsys.readouterr().out
  assert 'ndcg@5=' in out and 'mrr=0.5000' in out
