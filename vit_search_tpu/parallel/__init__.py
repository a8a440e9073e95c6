"""Device mesh, sharding and multi-host helpers."""

from . import mesh
from .mesh import (DATA_AXIS, batch_sharding, create_mesh, init_distributed,
                   is_main_process, prefetch_to_mesh, process_count,
                   replicate, replicated, shard_batch)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "create_mesh",
    "init_distributed",
    "is_main_process",
    "mesh",
    "prefetch_to_mesh",
    "process_count",
    "replicate",
    "replicated",
    "shard_batch",
]
