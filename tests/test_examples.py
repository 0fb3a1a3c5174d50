"""Example CLIs run a few steps on the bundled reference data
(the reference's example-test strategy, e.g. tf_ranking_libsvm_test.py).

Examples are executed in-process (main() with patched argv) so they run on
the CPU test backend configured by conftest.py.
"""

import importlib.util
import os
import sys

REF_DATA = '/root/reference/tensorflow_ranking/examples/data'
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(monkeypatch, capsys, path, args):
  path = os.path.join(REPO, path)
  spec = importlib.util.spec_from_file_location('example_under_test', path)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  monkeypatch.setattr(sys, 'argv', [path] + args)
  mod.main()
  return capsys.readouterr().out


def test_ranking_libsvm_example(tmp_path, monkeypatch, capsys):
  out = _run_example(monkeypatch, capsys, 'examples/ranking_libsvm.py', [
      f'--train_path={REF_DATA}/train.txt',
      f'--vali_path={REF_DATA}/vali.txt',
      f'--test_path={REF_DATA}/test.txt',
      f'--output_dir={tmp_path}/out',
      '--num_features=136', '--list_size=10', '--batch_size=4',
      '--num_train_steps=8', '--eval_every=8',
      '--hidden_layer_dims=16,8',
  ])
  assert 'ndcg@5=' in out
  assert 'test:' in out
  assert 'exported params' in out


def test_ranking_libsvm_groupwise_lambda(tmp_path, monkeypatch, capsys):
  out = _run_example(monkeypatch, capsys, 'examples/ranking_libsvm.py', [
      f'--train_path={REF_DATA}/train.txt',
      f'--vali_path={REF_DATA}/vali.txt',
      f'--output_dir={tmp_path}/out',
      '--num_features=136', '--list_size=10', '--batch_size=4',
      '--num_train_steps=4', '--eval_every=4',
      '--hidden_layer_dims=8', '--group_size=2', '--lambda_ndcg',
  ])
  assert 'ndcg@5=' in out


def test_ranking_elwc_pipeline_example(tmp_path, monkeypatch, capsys):
  out = _run_example(monkeypatch, capsys,
                     'examples/ranking_elwc_pipeline.py', [
      f'--train_pattern={REF_DATA}/train_elwc.tfrecord',
      f'--valid_pattern={REF_DATA}/eval_elwc.tfrecord',
      f'--model_dir={tmp_path}/model',
      '--batch_size=4', '--list_size=5', '--num_epochs=1',
      '--steps_per_epoch=3', '--validation_steps=2',
      '--hash_buckets=100', '--embedding_dim=4',
      '--hidden_layer_dims=8',
  ])
  assert 'final:' in out


def test_ranking_elwc_pipeline_with_vocab(tmp_path, monkeypatch, capsys):
  out = _run_example(monkeypatch, capsys,
                     'examples/ranking_elwc_pipeline.py', [
      f'--train_pattern={REF_DATA}/train_elwc.tfrecord',
      f'--valid_pattern={REF_DATA}/eval_elwc.tfrecord',
      f'--vocab_file={REF_DATA}/vocab.txt',
      f'--model_dir={tmp_path}/model',
      '--batch_size=4', '--list_size=5', '--num_epochs=1',
      '--steps_per_epoch=2', '--validation_steps=1',
      '--embedding_dim=4', '--hidden_layer_dims=8',
  ])
  assert 'final:' in out


def test_ranking_elwc_sharded_embeddings_ipw_gumbel(tmp_path, monkeypatch,
                                                   capsys):
  # BASELINE configs 4+5: sharded tables over the model axis + IPW
  # weights-feature + Gumbel-sampled listwise loss.
  out = _run_example(monkeypatch, capsys,
                     'examples/ranking_elwc_pipeline.py', [
      f'--train_pattern={REF_DATA}/train_elwc.tfrecord',
      f'--valid_pattern={REF_DATA}/eval_elwc.tfrecord',
      f'--model_dir={tmp_path}/model',
      '--batch_size=4', '--list_size=5', '--num_epochs=1',
      '--steps_per_epoch=2', '--validation_steps=1',
      '--hash_buckets=100', '--embedding_dim=4',
      '--hidden_layer_dims=8', '--mesh_model=2',
      '--loss=gumbel_approx_ndcg_loss', '--weights_feature=doc_weight',
  ])
  assert 'final:' in out


def test_serve_predict_example(tmp_path, monkeypatch, capsys):
  # Train + export, then batch-score the eval file from the export.
  # Tables sized to reach the int8 quantization floor (256*16 = 4096).
  common = ['--batch_size=4', '--list_size=5',
            '--hash_buckets=256', '--embedding_dim=16',
            '--hidden_layer_dims=8']
  _run_example(monkeypatch, capsys, 'examples/ranking_elwc_pipeline.py', [
      f'--train_pattern={REF_DATA}/train_elwc.tfrecord',
      f'--valid_pattern={REF_DATA}/eval_elwc.tfrecord',
      f'--model_dir={tmp_path}/model',
      '--num_epochs=1', '--steps_per_epoch=2', '--validation_steps=1',
  ] + common)
  out = _run_example(monkeypatch, capsys, 'examples/serve_predict.py', [
      f'--export_path={tmp_path}/model/export/latest',
      f'--input={REF_DATA}/eval_elwc.tfrecord',
      f'--output={tmp_path}/scores.csv',
      f'--artifact_path={tmp_path}/artifact',
      '--quantize=int8',
      '--query_tokens=10', '--document_tokens=60',
  ] + common)
  assert 'scored' in out
  assert 'quantize=int8' in out
  from ranking_tpu.pipeline import export as export_lib
  from ranking_tpu.data import tfrecord
  lp = export_lib.load_predictor(f'{tmp_path}/artifact')
  recs = list(tfrecord.read_records(f'{REF_DATA}/eval_elwc.tfrecord'))[:3]
  assert lp.predict(recs).shape[0] == 3
  lines = open(f'{tmp_path}/scores.csv').read().strip().splitlines()
  assert lines[0] == 'record,position,relevance,score'
  assert len(lines) > 1


def test_antique_din_example(tmp_path, monkeypatch, capsys):
  out = _run_example(monkeypatch, capsys, 'examples/antique_din.py', [
      f'--train_pattern={REF_DATA}/train_elwc.tfrecord',
      f'--valid_pattern={REF_DATA}/eval_elwc.tfrecord',
      f'--model_dir={tmp_path}/model',
      '--batch_size=4', '--list_size=5', '--num_epochs=1',
      '--steps_per_epoch=2', '--validation_steps=1',
      '--hash_buckets=100', '--embedding_dim=4',
      '--hidden_layer_dims=8', '--head_size=4',
  ])
  assert 'final:' in out


def test_encoder_ranking_example(tmp_path, monkeypatch, capsys):
  out = _run_example(monkeypatch, capsys, 'examples/encoder_ranking.py', [
      f'--train_pattern={REF_DATA}/train_elwc.tfrecord',
      f'--valid_pattern={REF_DATA}/eval_elwc.tfrecord',
      f'--model_dir={tmp_path}/model',
      '--batch_size=4', '--list_size=5', '--seq_len=24',
      '--vocab_buckets=200', '--hidden_dim=16', '--num_layers=1',
      '--num_heads=2', '--num_epochs=1', '--steps_per_epoch=2',
      '--validation_steps=1',
      # The TFR-BERT recipe knobs (adamw + warmup + linear decay + clip).
      '--optimizer=adamw', '--lr_schedule=linear_decay',
      '--warmup_steps=1', '--gradient_clip_norm=1.0',
  ])
  assert 'final:' in out


def test_ranking_libsvm_gam_scorer(tmp_path, monkeypatch, capsys):
  out = _run_example(monkeypatch, capsys, 'examples/ranking_libsvm.py', [
      f'--train_path={REF_DATA}/train.txt',
      f'--vali_path={REF_DATA}/vali.txt',
      f'--output_dir={tmp_path}/out',
      '--num_features=10', '--list_size=10', '--batch_size=4',
      '--num_train_steps=4', '--eval_every=4',
      '--hidden_layer_dims=4', '--scorer=gam',
  ])
  assert 'ndcg@5=' in out


def test_multitask_ranking_example(tmp_path, monkeypatch, capsys):
  out = _run_example(monkeypatch, capsys, 'examples/multitask_ranking.py', [
      f'--train_pattern={REF_DATA}/train_elwc.tfrecord',
      f'--valid_pattern={REF_DATA}/eval_elwc.tfrecord',
      f'--model_dir={tmp_path}/model',
      '--batch_size=4', '--list_size=5', '--num_epochs=1',
      '--steps_per_epoch=2', '--validation_steps=1',
      '--hash_buckets=100', '--hidden_layer_dims=8',
  ])
  assert 'final:' in out
  assert 'relevance/ndcg@5' in out


def test_unbiased_two_tower_debiases(tmp_path, monkeypatch, capsys):
  import importlib.util
  path = os.path.join(REPO, 'examples/unbiased_two_tower.py')
  spec = importlib.util.spec_from_file_location('u2t', path)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  monkeypatch.setattr(sys, 'argv', [path, '--queries=1500', '--steps=400',
                                    '--list_size=15', '--eta=1.5'])
  naive, debiased = mod.main()
  # The position-aware model must recover a meaningfully better true
  # ranking than the naive click model.
  assert debiased > naive + 0.03, (naive, debiased)


def test_encoder_ranking_init_checkpoint(monkeypatch, capsys, tmp_path):
  """Pretrained-BERT mode: WordPiece tokenization of the bundled raw
  query/document strings + checkpoint-initialized encoder, e2e."""
  td = '/root/reference/tensorflow_ranking/extension/testdata'
  out = _run_example(
      monkeypatch, capsys, 'examples/encoder_ranking.py',
      [f'--train_pattern={td}/tfrbert_elwc_train.tfrecord',
       f'--valid_pattern={td}/tfrbert_elwc_test.tfrecord',
       f'--model_dir={tmp_path}/bert', '--num_epochs=1',
       '--steps_per_epoch=3', '--validation_steps=1', '--list_size=3',
       '--batch_size=2',
       f'--init_checkpoint={td}/bert_lite_tf2.ckpt',
       f'--bert_config={td}/bert_lite_config.json',
       f'--vocab_file={td}/bert_lite_vocab.txt'])
  assert 'final:' in out and 'nan' not in out
