"""Pure-JAX BERT-family text encoder with HF weight import.

One implementation serves every BERT-architecture query encoder in the
reference zoo (MedCPT, DPR question encoder, e5-base/large,
multilingual-e5-large, gte-base, ember-v1, UAE-Large-V1): the differences
between them are data, not code — pooling mode, prefixes, normalization —
captured in :mod:`ragroute_tpu.encoders.registry`.

Runs under jit on TPU (static shapes; batches padded to fixed sequence
length) or CPU. Weights import from a transformers ``BertModel`` state
dict (torch) so any locally cached HF checkpoint loads directly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ragroute_tpu.utils.precision import scoring_precision

LN_EPS = 1e-12  # BERT default layer_norm_eps


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2

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


def bert_encode(
    params: Dict,
    cfg: BertConfig,
    input_ids: jnp.ndarray,        # [B, L] int32
    attention_mask: jnp.ndarray,   # [B, L] 0/1
    token_type_ids: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Full BERT encoder forward (eval mode).

    Returns ``{"last_hidden": [B, L, H], "cls": [B, H], "pooler": [B, H]}``
    (``pooler`` only when pooler weights are present).
    """
    bsz, seq = input_ids.shape
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)

    emb = (
        params["embeddings"]["word"][input_ids]
        + params["embeddings"]["position"][jnp.arange(seq)][None, :, :]
        + params["embeddings"]["token_type"][token_type_ids]
    )
    h = _ln(emb, params["embeddings"]["ln"])

    # additive attention bias: 0 keep, -1e9 masked
    bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9

    scale = 1.0 / math.sqrt(cfg.head_dim)
    for layer in params["layers"]:
        q = _dense(h, layer["q"]).reshape(bsz, seq, cfg.num_heads, cfg.head_dim)
        k = _dense(h, layer["k"]).reshape(bsz, seq, cfg.num_heads, cfg.head_dim)
        v = _dense(h, layer["v"]).reshape(bsz, seq, cfg.num_heads, cfg.head_dim)
        # [B, heads, L, L]
        att = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k,
            precision=scoring_precision(h.dtype)) * scale + bias
        att = jax.nn.softmax(att, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", att, v,
            precision=scoring_precision(h.dtype))
        ctx = ctx.reshape(bsz, seq, cfg.hidden_size)
        h = _ln(_dense(ctx, layer["att_out"]) + h, layer["att_ln"])
        ffn = _dense(h, layer["ffn_in"])
        ffn = jax.nn.gelu(ffn, approximate=False)
        h = _ln(_dense(ffn, layer["ffn_out"]) + h, layer["ffn_ln"])

    out = {"last_hidden": h, "cls": h[:, 0]}
    if "pooler" in params:
        out["pooler"] = jnp.tanh(_dense(h[:, 0], params["pooler"]))
    return out


# ---------------------------------------------------------------------------
# Pooling modes (reference: custom_sentence_transformer.py CLS force;
# custom_models.py E5 mean pooling; instructor_model.py weightedmean/
# lasttoken)
# ---------------------------------------------------------------------------

def pool(outputs: Dict, attention_mask: jnp.ndarray, mode: str) -> jnp.ndarray:
    h = outputs["last_hidden"]
    m = attention_mask.astype(h.dtype)[:, :, None]
    if mode == "cls":
        return outputs["cls"]
    if mode == "pooler":
        return outputs.get("pooler", outputs["cls"])
    if mode == "mean":
        return (h * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)
    if mode == "weightedmean":
        # position-weighted mean (SGPT scheme, instructor_model.py:25-195)
        seq = h.shape[1]
        w = jnp.arange(1, seq + 1, dtype=h.dtype)[None, :, None] * m
        return (h * w).sum(1) / jnp.maximum(w.sum(1), 1e-9)
    if mode == "lasttoken":
        idx = jnp.maximum(attention_mask.sum(1) - 1, 0)
        return jnp.take_along_axis(h, idx[:, None, None].astype(jnp.int32)
                                   .repeat(h.shape[-1], -1), axis=1)[:, 0]
    raise ValueError(f"unknown pooling mode {mode!r}")


# ---------------------------------------------------------------------------
# Weight import from a transformers BertModel state dict
# ---------------------------------------------------------------------------

def params_from_torch_bert(state_dict, cfg: BertConfig) -> Dict:
    """Map a torch ``BertModel`` (or DPR/BERT-based) state dict to our
    pytree. Accepts tensors or numpy arrays; strips common prefixes."""

    def get(name):
        for prefix in ("", "bert.", "question_encoder.bert_model.",
                       "0.auto_model."):
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
            "token_type": jnp.asarray(
                get("embeddings.token_type_embeddings.weight")),
            "ln": ln("embeddings.LayerNorm"),
        },
        "layers": [],
    }
    for i in range(cfg.num_layers):
        e = f"encoder.layer.{i}"
        params["layers"].append({
            "q": dense(f"{e}.attention.self.query"),
            "k": dense(f"{e}.attention.self.key"),
            "v": dense(f"{e}.attention.self.value"),
            "att_out": dense(f"{e}.attention.output.dense"),
            "att_ln": ln(f"{e}.attention.output.LayerNorm"),
            "ffn_in": dense(f"{e}.intermediate.dense"),
            "ffn_out": dense(f"{e}.output.dense"),
            "ffn_ln": ln(f"{e}.output.LayerNorm"),
        })
    try:
        params["pooler"] = dense("pooler.dense")
    except KeyError:
        pass
    return params


def config_from_hf(hf_config) -> BertConfig:
    return BertConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
    )
