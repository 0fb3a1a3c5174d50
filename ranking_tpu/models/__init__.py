"""Ranking models: scorers, layers, groupwise scoring, embeddings."""

from ranking_tpu.models import bert_ckpt
from ranking_tpu.models import embeddings
from ranking_tpu.models import encoder
from ranking_tpu.models import groupwise
from ranking_tpu.models import layers
from ranking_tpu.models import scorers
from ranking_tpu.models.bert_ckpt import load_tf2_bert_checkpoint
from ranking_tpu.models.encoder import (
    EncoderScorer,
    TransformerEncoder,
    warm_start_from,
)
from ranking_tpu.models.groupwise import GroupwiseDNNScorer
from ranking_tpu.models.scorers import (
    DINScorer,
    DNNScorer,
    EmbeddingDNNScorer,
    GAMScorer,
    MultiTaskScorer,
    RankingModel,
)

__all__ = [
    'DINScorer',
    'DNNScorer',
    'EmbeddingDNNScorer',
    'EncoderScorer',
    'GAMScorer',
    'GroupwiseDNNScorer',
    'MultiTaskScorer',
    'RankingModel',
    'TransformerEncoder',
    'bert_ckpt',
    'embeddings',
    'encoder',
    'groupwise',
    'layers',
    'load_tf2_bert_checkpoint',
    'scorers',
    'warm_start_from',
]
