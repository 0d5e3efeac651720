"""Pure-JAX MPNet text encoder with HF weight import.

Covers ``all-mpnet-base-v2`` (2 of 13 feb4rag sources, reference
``model_zoo.py:58-118`` BEIR SentenceBERT path: mean pooling + L2
normalize). MPNet is BERT-shaped with two differences, both handled here:

* **Relative position bias** — a T5-style bucketed relative-position
  embedding (32 buckets, max distance 128) shared across layers, added to
  every layer's attention logits.
* **Padding-aware absolute positions** — position ids are
  ``cumsum(mask) * mask + padding_idx`` (fairseq convention, pad = 1), and
  there are no token-type embeddings.

Runs under jit on TPU (static shapes). Weights import from a transformers
``MPNetModel`` state dict so any locally cached checkpoint loads directly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ragroute_tpu.utils.precision import scoring_precision

PADDING_IDX = 1
LN_EPS = 1e-5  # MPNet layer_norm_eps


@dataclasses.dataclass(frozen=True)
class MPNetConfig:
    vocab_size: int = 30527
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    relative_attention_num_buckets: int = 32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _ln(x, p):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * p["scale"] + p["bias"]


def _dense(x, p):
    return jnp.dot(x, p["w"], precision=scoring_precision(x.dtype),
                   preferred_element_type=jnp.float32) + p["b"]


def relative_position_bucket(
    relative_position: jnp.ndarray, num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """T5-style bidirectional bucketing of relative positions."""
    n = -relative_position
    half = num_buckets // 2
    ret = (n < 0).astype(jnp.int32) * half
    n = jnp.abs(n)
    max_exact = half // 2
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (half - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, half - 1)
    return ret + jnp.where(n < max_exact, n, val_if_large)


def mpnet_encode(
    params: Dict,
    cfg: MPNetConfig,
    input_ids: jnp.ndarray,        # [B, L] int32
    attention_mask: jnp.ndarray,   # [B, L] 0/1
) -> Dict[str, jnp.ndarray]:
    """Full MPNet encoder forward (eval mode)."""
    bsz, seq = input_ids.shape
    mask_i = attention_mask.astype(jnp.int32)

    # fairseq positions: padding rows pinned to padding_idx
    pos_ids = jnp.cumsum(mask_i, axis=1) * mask_i + PADDING_IDX
    emb = (params["embeddings"]["word"][input_ids]
           + params["embeddings"]["position"][pos_ids])
    h = _ln(emb, params["embeddings"]["ln"])

    # shared relative position bias [1, heads, L, L]
    pos = jnp.arange(seq)
    rel = pos[None, :] - pos[:, None]
    buckets = relative_position_bucket(
        rel, cfg.relative_attention_num_buckets)
    pos_bias = jnp.transpose(
        params["rel_bias"][buckets], (2, 0, 1))[None]

    att_bias = (1.0 - attention_mask[:, None, None, :]
                .astype(jnp.float32)) * -1e9
    scale = 1.0 / math.sqrt(cfg.head_dim)

    for layer in params["layers"]:
        q = _dense(h, layer["q"]).reshape(bsz, seq, cfg.num_heads,
                                          cfg.head_dim)
        k = _dense(h, layer["k"]).reshape(bsz, seq, cfg.num_heads,
                                          cfg.head_dim)
        v = _dense(h, layer["v"]).reshape(bsz, seq, cfg.num_heads,
                                          cfg.head_dim)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         precision=scoring_precision(h.dtype)) * scale
        att = jax.nn.softmax(att + pos_bias + att_bias, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v,
                         precision=scoring_precision(h.dtype))
        ctx = ctx.reshape(bsz, seq, cfg.hidden_size)
        h = _ln(_dense(ctx, layer["att_out"]) + h, layer["att_ln"])
        ffn = jax.nn.gelu(_dense(h, layer["ffn_in"]), approximate=False)
        h = _ln(_dense(ffn, layer["ffn_out"]) + h, layer["ffn_ln"])

    return {"last_hidden": h, "cls": h[:, 0]}


def params_from_torch_mpnet(state_dict, cfg: MPNetConfig) -> Dict:
    """Map a torch ``MPNetModel`` state dict to our pytree."""

    def get(name):
        for prefix in ("", "mpnet.", "0.auto_model."):
            key = prefix + name
            if key in state_dict:
                t = state_dict[key]
                return np.asarray(
                    t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                    dtype=np.float32)
        raise KeyError(name)

    def dense(name):
        return {"w": jnp.asarray(get(f"{name}.weight").T),
                "b": jnp.asarray(get(f"{name}.bias"))}

    def ln(name):
        return {"scale": jnp.asarray(get(f"{name}.weight")),
                "bias": jnp.asarray(get(f"{name}.bias"))}

    params = {
        "embeddings": {
            "word": jnp.asarray(get("embeddings.word_embeddings.weight")),
            "position": jnp.asarray(
                get("embeddings.position_embeddings.weight")),
            "ln": ln("embeddings.LayerNorm"),
        },
        "rel_bias": jnp.asarray(
            get("encoder.relative_attention_bias.weight")),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        e = f"encoder.layer.{i}"
        params["layers"].append({
            "q": dense(f"{e}.attention.attn.q"),
            "k": dense(f"{e}.attention.attn.k"),
            "v": dense(f"{e}.attention.attn.v"),
            "att_out": dense(f"{e}.attention.attn.o"),
            "att_ln": ln(f"{e}.attention.LayerNorm"),
            "ffn_in": dense(f"{e}.intermediate.dense"),
            "ffn_out": dense(f"{e}.output.dense"),
            "ffn_ln": ln(f"{e}.output.LayerNorm"),
        })
    return params


def config_from_hf(hf_config) -> MPNetConfig:
    return MPNetConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        relative_attention_num_buckets=
        hf_config.relative_attention_num_buckets,
    )
