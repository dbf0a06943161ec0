# Copyright 2026. Apache License 2.0.
from .mesh import (batch_sharding, batch_spec, build_mesh, label_sharding,
                   process_shard, replicated, shard_batch)

__all__ = ["build_mesh", "batch_spec", "batch_sharding", "label_sharding",
           "replicated", "shard_batch", "process_shard"]
