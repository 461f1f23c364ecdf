"""Device-mesh construction and data-parallel sharding helpers."""

from pointvit_tpu.parallel.mesh import (
    batch_shard_map,
    batch_sharding,
    make_hybrid_mesh,
    make_mesh,
    make_multihost_mesh,
    replicate,
    shard_batch,
    transformer_tp_shardings,
)

__all__ = [
    "batch_shard_map",
    "batch_sharding",
    "make_hybrid_mesh",
    "make_mesh",
    "make_multihost_mesh",
    "replicate",
    "shard_batch",
    "transformer_tp_shardings",
]
