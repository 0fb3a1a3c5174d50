"""Training pipelines, hparams, and serving."""

from ranking_tpu.pipeline import export as export_lib
from ranking_tpu.pipeline import hparams as hparams_lib
from ranking_tpu.pipeline import pipeline as pipeline_lib
from ranking_tpu.pipeline import serving
from ranking_tpu.pipeline.export import (
    ExportedPredictor,
    export_predictor,
    load_predictor,
)
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
    'ExportedPredictor',
    'LibSVMDatasetBuilder',
    'MultiLabelDatasetBuilder',
    'MultiTaskPipeline',
    'PipelineHparams',
    'Predictor',
    'RankingPipeline',
    'SimpleDatasetBuilder',
    'SimplePipeline',
    'evaluate_dataset',
    'export_lib',
    'export_predictor',
    'from_yaml',
    'hparams_lib',
    'load_predictor',
    'pipeline_lib',
    'serving',
]
