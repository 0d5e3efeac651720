"""ragroute_tpu: a TPU-native federated index-and-query engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
sacs-epfl/ragroute (an asyncio+ZeroMQ+FAISS federated RAG search system):

* corpus embedding shards live in HBM and are scored by a fused
  matmul+top-k Pallas kernel (:mod:`ragroute_tpu.ops`);
* the learned corpus router runs as batched JAX MLP inference producing a
  routing mask (:mod:`ragroute_tpu.router`);
* routing, per-shard scoring, and cross-shard merge execute as ONE jitted
  device step (:mod:`ragroute_tpu.engine`) — only final doc ids leave the
  chip;
* multi-chip scaling shards the document axis over a ``jax.sharding.Mesh``
  with all-gather segmented top-k (:mod:`ragroute_tpu.parallel`);
* a thin asyncio host shim keeps the reference's HTTP federation protocol
  and benchmark tooling (:mod:`ragroute_tpu.engine.server`).
"""

__version__ = "0.1.0"

from ragroute_tpu.config import WORLDS, get_world

__all__ = ["WORLDS", "get_world", "__version__"]
