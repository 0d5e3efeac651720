"""Learned corpus router: batched JAX MLP gating over federated sources.

TPU-native re-design of the reference router process
(``ragroute/router.py``): instead of a per-query torch MLP forward in a
dedicated OS process fed by ZeroMQ, routing runs as one batched matmul
stack inside the engine's jitted device step, producing a boolean routing
mask ``[B, num_sources]`` that gates which corpus shards count toward the
merged top-k.
"""

from ragroute_tpu.router.mlp import (
    CorpusRouterParams,
    init_router_params,
    router_forward,
    router_apply_train,
)
from ragroute_tpu.router.features import RouterBank, build_features
from ragroute_tpu.router.strategies import routing_mask

__all__ = [
    "CorpusRouterParams",
    "init_router_params",
    "router_forward",
    "router_apply_train",
    "RouterBank",
    "build_features",
    "routing_mask",
]
