"""Transformer-encoder ranker on ELWC data (TFR-BERT counterpart).

The analog of /root/reference/tensorflow_ranking/examples/keras/
tfrbert_antique_train.py: each document's (query, document) token pair is
fused into one ``[CLS] q [SEP] d [SEP]`` sequence, encoded by a
TransformerEncoder, and scored univariately. Pretrained encoder weights can
be overlaid with ``models.warm_start_from`` (pass --warm_start_dir with an
Orbax export holding encoder params).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def parse_args():
  p = argparse.ArgumentParser()
  p.add_argument('--train_pattern', required=True)
  p.add_argument('--valid_pattern', required=True)
  p.add_argument('--model_dir', default='/tmp/ranking_encoder')
  p.add_argument('--warm_start_dir', default=None)
  p.add_argument('--init_checkpoint', default=None,
                 help='TF2 BERT checkpoint (e.g. bert_lite_tf2.ckpt); '
                      'requires --bert_config; reads input_ids/input_mask/'
                      'segment_ids features (TFRBertDataLoader format)')
  p.add_argument('--bert_config', default=None)
  p.add_argument('--vocab_file', default=None,
                 help='WordPiece vocab: tokenize raw query/document string '
                      'features instead of reading pre-tokenized ids')
  p.add_argument('--batch_size', type=int, default=4)
  p.add_argument('--list_size', type=int, default=10)
  p.add_argument('--seq_len', type=int, default=64)
  p.add_argument('--vocab_buckets', type=int, default=30000)
  p.add_argument('--hidden_dim', type=int, default=64)
  p.add_argument('--num_layers', type=int, default=2)
  p.add_argument('--num_heads', type=int, default=4)
  p.add_argument('--remat', action='store_true',
                 help='rematerialize encoder blocks on backward '
                      '(lower peak HBM, ~1/3 extra FLOPs)')
  p.add_argument('--loss', default='softmax_loss')
  p.add_argument('--learning_rate', type=float, default=1e-3)
  # The reference TFR-BERT recipe trains adamw + linear decay to 0 with
  # ~10% linear warmup (tfrbert_antique_train_config.yaml:23-39).
  p.add_argument('--optimizer', default='adam')
  p.add_argument('--lr_schedule', default='constant',
                 choices=['constant', 'linear_decay', 'cosine_decay'])
  p.add_argument('--warmup_steps', type=int, default=0)
  p.add_argument('--gradient_clip_norm', type=float, default=0.0)
  p.add_argument('--num_epochs', type=int, default=2)
  p.add_argument('--steps_per_epoch', type=int, default=5)
  p.add_argument('--validation_steps', type=int, default=2)
  return p.parse_args()


def main():
  args = parse_args()
  from ranking_tpu import models, pipeline
  from ranking_tpu.data import FixedLenFeature, VarLenFeature, bert
  from ranking_tpu.data.batch import RankingBatch

  # Reserve ids: hashed tokens occupy [0, vocab_buckets); CLS/SEP above.
  cls_id, sep_id = args.vocab_buckets, args.vocab_buckets + 1
  vocab_size = args.vocab_buckets + 2

  context_spec = {
      'query_tokens': VarLenFeature(dtype='string', max_len=10,
                                    hash_buckets=args.vocab_buckets)}
  example_spec = {
      'document_tokens': VarLenFeature(dtype='string', max_len=48,
                                       hash_buckets=args.vocab_buckets),
      'relevance': FixedLenFeature(shape=(), dtype='int64',
                                   default_value=0)}

  class BertInputBuilder(pipeline.SimpleDatasetBuilder):
    """Fuses query+document ids into BERT inputs host-side."""

    def _batches(self, *a, **kw):
      for b in super()._batches(*a, **kw):
        fused = bert.fuse_query_document_ids(
            b.context['query_tokens'], b.examples['document_tokens'],
            seq_len=args.seq_len, cls_id=cls_id, sep_id=sep_id)
        yield RankingBatch(context={}, examples={'input_ids': fused},
                           labels=b.labels, mask=b.mask)

  builder = None
  if not args.init_checkpoint:
    builder = BertInputBuilder(
        context_spec, example_spec,
        pipeline.DatasetHparams(
            train_input_pattern=args.train_pattern,
            valid_input_pattern=args.valid_pattern,
            train_batch_size=args.batch_size,
            valid_batch_size=args.batch_size,
            list_size=args.list_size))

  if args.init_checkpoint:
    # Pretrained-BERT mode (tfrbert_task.py:346-361 analog): encoder
    # config + weights from the checkpoint. With --vocab_file, raw
    # query/document strings are WordPiece-tokenized host-side at the
    # checkpoint's max sequence length; otherwise the records must carry
    # pre-tokenized input_ids/input_mask/segment_ids
    # (TFRBertDataLoader format).
    import numpy as np

    from ranking_tpu.data import FixedLenFeature as FLF
    from ranking_tpu.models import bert_ckpt
    encoder, bert_params = bert_ckpt.load_tf2_bert_checkpoint(
        args.init_checkpoint, args.bert_config)
    seq_len = min(args.seq_len, encoder.max_len)
    if args.vocab_file:
      from ranking_tpu.data import proto, tfrecord
      tokenizer = bert.WordPieceTokenizer(args.vocab_file)

      class TokenizingBuilder:
        """ELWC reader tokenizing raw query/document strings."""

        def __init__(self, train, valid):
          self.train, self.valid = train, valid

        def _load(self, path):
          import glob as _glob
          lists = []
          ls = args.list_size
          for fp in sorted(_glob.glob(path)):
            for rec in tfrecord.read_records(fp):
              elwc = proto.ExampleListWithContext()
              elwc.ParseFromString(rec)
              docs, rels, query = [], [], ''
              for ex in elwc.examples[:ls]:
                f = ex.features.feature
                query = (f['query'].bytes_list.value or [b''])[0].decode()
                docs.append(
                    (f['document'].bytes_list.value or [b''])[0].decode())
                rel = f['relevance'].int64_list.value
                rels.append(float(rel[0]) if rel else 0.0)
              if not docs:
                continue  # an empty list has nothing to rank (or stack)
              # Tokenize ONCE at load — per-epoch WordPiece over the whole
              # corpus would dominate step feed time.
              ids = np.zeros((ls, seq_len), np.int32)
              ams = np.zeros_like(ids)
              segs = np.zeros_like(ids)
              labels = np.full((ls,), -1.0, np.float32)
              i, m, sg = bert.encode_query_documents(
                  tokenizer, query, docs, seq_len)
              ids[:len(docs)] = i
              ams[:len(docs)] = m
              segs[:len(docs)] = sg
              labels[:len(rels)] = rels
              lists.append((ids, ams, segs, labels))
          return lists

        def _batches(self, lists, epochs, shuffle=True):
          rng = np.random.RandomState(11)
          epoch = 0
          while epochs is None or epoch < epochs:
            epoch += 1
            order = (rng.permutation(len(lists)) if shuffle
                     else np.arange(len(lists)))
            for start in range(0, len(lists), args.batch_size):
              sel = order[start:start + args.batch_size]
              if len(sel) < args.batch_size:
                continue
              chunk = [lists[j] for j in sel]
              yield RankingBatch(
                  context={},
                  examples={
                      'input_ids': np.stack([c[0] for c in chunk]),
                      'input_mask': np.stack([c[1] for c in chunk]),
                      'segment_ids': np.stack([c[2] for c in chunk])},
                  labels=np.stack([c[3] for c in chunk]),
                  mask=np.stack([c[3] for c in chunk]) >= 0)

        def train_batches(self):
          return self._batches(self._load(self.train), None)

        def valid_batches(self):
          return self._batches(self._load(self.valid), 1, shuffle=False)

      builder = TokenizingBuilder(args.train_pattern, args.valid_pattern)
    else:
      spec = {name: FLF(shape=(seq_len,), dtype='int64', default_value=0)
              for name in ('input_ids', 'input_mask', 'segment_ids')}
      spec['relevance'] = FLF(shape=(), dtype='int64', default_value=0)
      builder = pipeline.SimpleDatasetBuilder(
          {}, spec,
          pipeline.DatasetHparams(
              train_input_pattern=args.train_pattern,
              valid_input_pattern=args.valid_pattern,
              train_batch_size=args.batch_size,
              valid_batch_size=args.batch_size,
              list_size=args.list_size))
    model = models.RankingModel(
        scorer=models.EncoderScorer(encoder=encoder, dropout=0.1))
  else:
    bert_params = None
    model = models.RankingModel(scorer=models.EncoderScorer(
        encoder=models.TransformerEncoder(
            vocab_size=vocab_size, hidden_dim=args.hidden_dim,
            num_layers=args.num_layers, num_heads=args.num_heads,
            mlp_dim=args.hidden_dim * 4, max_len=args.seq_len,
            remat=args.remat),
        dropout=0.1))

  hparams = pipeline.PipelineHparams(
      model_dir=args.model_dir,
      num_epochs=args.num_epochs,
      steps_per_epoch=args.steps_per_epoch,
      validation_steps=args.validation_steps,
      learning_rate=args.learning_rate,
      optimizer=args.optimizer,
      lr_schedule=args.lr_schedule,
      warmup_steps=args.warmup_steps,
      gradient_clip_norm=args.gradient_clip_norm,
      loss=args.loss)

  pipe = pipeline.SimplePipeline(model, builder, hparams)
  if bert_params is not None:
    orig_build = pipe._build

    def build_with_bert(sample):
      state = orig_build(sample)
      params = dict(state.params)
      params['scorer'] = dict(params['scorer'])
      params['scorer']['encoder'] = bert_params
      return state.replace(params=params)

    pipe._build = build_with_bert
  if args.warm_start_dir:
    from ranking_tpu.train import checkpoint
    pretrained = checkpoint.load_params(args.warm_start_dir)
    flat = {}

    def _flatten(prefix, tree):
      for k, v in tree.items():
        path = f'{prefix}/{k}' if prefix else k
        if isinstance(v, dict):
          _flatten(path, v)
        else:
          flat[path] = v

    _flatten('', pretrained.get('params', pretrained))
    # Overlaid after state build: hook via a wrapped _build.
    orig_build = pipe._build

    def build_and_warm_start(sample):
      state = orig_build(sample)
      return state.replace(
          params=models.warm_start_from(state.params, flat))

    pipe._build = build_and_warm_start

  history = pipe.train_and_validate(verbose=True)
  print('final:', {k: round(v, 4) for k, v in history.items()})


if __name__ == '__main__':
  main()
