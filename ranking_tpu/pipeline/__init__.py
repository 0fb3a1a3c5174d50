"""Training pipelines, hparams, and serving."""

from ranking_tpu.pipeline import hparams as hparams_lib
from ranking_tpu.pipeline import pipeline as pipeline_lib
from ranking_tpu.pipeline import serving
from ranking_tpu.pipeline.hparams import (
    DatasetHparams,
    PipelineHparams,
    from_yaml,
)
from ranking_tpu.pipeline.pipeline import (
    LibSVMDatasetBuilder,
    MultiLabelDatasetBuilder,
    MultiTaskPipeline,
    RankingPipeline,
    SimpleDatasetBuilder,
    SimplePipeline,
)
from ranking_tpu.pipeline.serving import Predictor, evaluate_dataset

__all__ = [
    'DatasetHparams',
    'LibSVMDatasetBuilder',
    'MultiLabelDatasetBuilder',
    'MultiTaskPipeline',
    'PipelineHparams',
    'Predictor',
    'RankingPipeline',
    'SimpleDatasetBuilder',
    'SimplePipeline',
    'evaluate_dataset',
    'from_yaml',
    'hparams_lib',
    'pipeline_lib',
    'serving',
]
