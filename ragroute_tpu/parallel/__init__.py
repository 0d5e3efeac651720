"""Multi-chip scaling: mesh construction + sharded federated search."""

from ragroute_tpu.parallel.mesh import make_mesh
from ragroute_tpu.parallel.sharded import (
    ShardedSearch,
    sharded_ivf_topk,
    sharded_shard_topk,
)

__all__ = ["make_mesh", "ShardedSearch", "sharded_ivf_topk",
           "sharded_shard_topk"]
