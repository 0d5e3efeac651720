"""Tensor-parallel shardings for the llama-family decoder.

Megatron-style TP expressed the TPU way: we only ANNOTATE the weight
layout (`PartitionSpec`s over a mesh axis) and let XLA's GSPMD insert
the collectives — q/k/v and gate/up are column-sharded (heads / ffn
split across devices, no communication), wo and down are row-sharded
(one psum each per layer, riding ICI), the LM head is vocab-sharded.
The KV cache shards on the kv-head axis by propagation from the wk/wv
layout, so decode attention stays device-local end to end. The batch
axis composes orthogonally with dp (``data_spec``), mirroring the
retrieval engine's (dp, idx) mesh (`parallel/sharded.py`).

Contrast with the reference, whose generation is an opaque external
Ollama process (`/root/reference/ragroute/http_server.py:309-327`) with
no scaling story inside the framework.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ragroute_tpu.llm.model import DecoderConfig


def decoder_param_specs(cfg: DecoderConfig, axis: str = "idx") -> Dict:
    """PartitionSpec pytree matching ``init_decoder_params`` /
    ``params_from_torch_causal_lm`` output."""
    layer = {
        "ln1": P(), "ln2": P(),
        "wq": P(None, axis), "wk": P(None, axis), "wv": P(None, axis),
        "wo": P(axis, None),
        "gate": P(None, axis), "up": P(None, axis),
        "down": P(axis, None),
    }
    if cfg.qk_norm:
        layer["q_norm"] = P()
        layer["k_norm"] = P()
    specs = {
        "embed": P(),
        "ln_f": P(),
        "layers": [dict(layer) for _ in range(cfg.num_layers)],
    }
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(None, axis)
    return specs


def shard_decoder_params(params, cfg: DecoderConfig, mesh: Mesh,
                         axis: str = "idx"):
    """Place a decoder pytree on the mesh with TP layout. The sharded
    axes must divide the axis size (num_kv_heads and intermediate_size
    are the binding ones)."""
    n = mesh.shape[axis]
    if cfg.num_kv_heads % n:
        raise ValueError(
            f"num_kv_heads={cfg.num_kv_heads} not divisible by mesh "
            f"axis {axis!r}={n}")
    if cfg.intermediate_size % n:
        raise ValueError(
            f"intermediate_size={cfg.intermediate_size} not divisible "
            f"by mesh axis {axis!r}={n}")
    specs = decoder_param_specs(cfg, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def data_spec(mesh: Mesh, dp_axis: str = "dp") -> P:
    """Batch sharding for input_ids/attention_mask (dp over the mesh's
    data axis; absent axis = replicated)."""
    if dp_axis in mesh.shape and mesh.shape[dp_axis] > 1:
        return P(dp_axis, None)
    return P(None, None)
