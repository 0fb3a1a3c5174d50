"""Device mesh, shardings, and explicit-collective sharded embeddings."""

from ranking_tpu.parallel import embedding
from ranking_tpu.parallel import list_sharding
from ranking_tpu.parallel import mesh
from ranking_tpu.parallel.embedding import (
    ShardedEmbeddingEncoder,
    sharded_pooled_lookup,
)
from ranking_tpu.parallel.list_sharding import sharded_pairwise_loss
from ranking_tpu.parallel.mesh import (
    DATA_AXIS,
    DEFAULT_RULES,
    ENCODER_TP_RULES,
    MODEL_AXIS,
    batch_sharding,
    local_batch_to_global,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    'DATA_AXIS',
    'DEFAULT_RULES',
    'ENCODER_TP_RULES',
    'MODEL_AXIS',
    'ShardedEmbeddingEncoder',
    'batch_sharding',
    'embedding',
    'list_sharding',
    'local_batch_to_global',
    'make_mesh',
    'mesh',
    'param_shardings',
    'replicated',
    'shard_batch',
    'shard_params',
    'sharded_pairwise_loss',
    'sharded_pooled_lookup',
]
