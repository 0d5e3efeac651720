"""TPU scoring ops: fused matmul + top-k over corpus embedding shards."""

from ragroute_tpu.ops.topk import (
    exact_topk,
    chunked_topk,
    shard_topk,
    merge_topk,
)
from ragroute_tpu.ops.pallas_topk import pallas_topk, \
    pallas_stream_topk
from ragroute_tpu.ops.ivf_topk import ivf_topk

__all__ = [
    "exact_topk",
    "chunked_topk",
    "shard_topk",
    "merge_topk",
    "pallas_topk",
    "pallas_stream_topk",
    "ivf_topk",
]
