"""Multi-chip scaling: mesh construction + sharded federated search.

Single-host: :func:`make_mesh` over the local chips. Multi-host (DCN):
:mod:`ragroute_tpu.parallel.multihost` — join the distributed runtime,
build the global mesh with the ``idx`` axis inside each host's ICI
domain, and lockstep-feed serving batches from the HTTP process.
"""

from ragroute_tpu.parallel.mesh import make_mesh
from ragroute_tpu.parallel.multihost import (
    LockstepEngine,
    initialize as initialize_multihost,
    make_multihost_mesh,
)
from ragroute_tpu.parallel.sharded import (
    ShardedSearch,
    sharded_ivf_topk,
    sharded_shard_topk,
)
from ragroute_tpu.parallel.streamed_mesh import MeshStreamedEngine

__all__ = ["make_mesh", "MeshStreamedEngine", "ShardedSearch",
           "sharded_ivf_topk", "sharded_shard_topk", "LockstepEngine",
           "initialize_multihost", "make_multihost_mesh"]
