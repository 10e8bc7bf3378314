from .mesh import make_mesh, shard_batch, replicate
from .sharding import (
    make_sharded_train_step,
    shard_catalog,
    whisper_param_sharding,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_sharded_train_step",
    "shard_catalog",
    "whisper_param_sharding",
]
