"""Evaluate a TREC run file against TREC qrels with the ranking metric suite.

The CLI analog of the reference's RD-Suite evaluation script
(/root/reference/tensorflow_ranking/datasets/rd_suite/RD_Suite_Eval_Script.ipynb):
inner-joins qrels and run on (query_id, doc_id) and streams the joined
per-query lists through the requested metrics.

Usage:
  python examples/trec_eval.py \
    --qrels=/path/trec_qrel.txt --run=/path/trec_run.txt \
    --metrics='ndcg@1,ndcg@5,ndcg,mrr,mrr@10'

Graded datasets (Web30K/Istella) use a binary cut for MRR, e.g.
``--metrics='ndcg@5,mrr:rel>=3,mrr@10:rel>=3'``.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json


def parse_args():
  p = argparse.ArgumentParser()
  p.add_argument('--qrels', required=True, help='TREC qrels file')
  p.add_argument('--run', required=True, help='TREC run file')
  p.add_argument('--metrics', default='ndcg@1,ndcg@5,ndcg,mrr,mrr@10',
                 help='comma list of key[@topn][:rel>=T] specs')
  p.add_argument('--batch_size', type=int, default=128)
  return p.parse_args()


def main():
  args = parse_args()
  from ranking_tpu.data import trec

  results = trec.evaluate_run(args.qrels, args.run,
                              metrics=args.metrics,
                              batch_size=args.batch_size)
  for name, value in results.items():
    print(f'{name}={value:.4f}')
  print(json.dumps(results))


if __name__ == '__main__':
  main()
