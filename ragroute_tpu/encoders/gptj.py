"""Pure-JAX GPT-J causal encoder with HF weight import.

The TPU-native forward for SGPT-5.8B-weightedmean-msmarco-specb-bitfit
(reference ``custom_models.py:183-229`` runs it through torch
sentence-transformers). GPT-J specifics implemented here:

* rotary position embeddings on the first ``rotary_dim`` head dims, in
  the interleaved (rotate-every-two) convention;
* PARALLEL attention + MLP: both consume the same ``ln_1(x)`` and the
  block output is ``x + attn + mlp`` (no second layernorm);
* no biases on q/k/v/out projections; biased fc_in/fc_out MLP
  (bitfit-tuned checkpoints carry those biases);
* causal masking combined with padding-key masking; attention logits in
  f32 (HF keeps them in fp32 "to avoid overflow").

Embeddings come out of :func:`gptj_encode` as the last hidden state; SGPT
pooling (position-weighted mean over the specb-bracketed tokens) lives in
:func:`ragroute_tpu.encoders.bert.pool` / ``encoders.custom``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ragroute_tpu.utils.precision import scoring_precision


@dataclasses.dataclass(frozen=True)
class GPTJConfig:
    vocab_size: int = 50400
    hidden_size: int = 4096
    num_layers: int = 28
    num_heads: int = 16
    rotary_dim: int = 64
    intermediate_size: int = 16384
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _ln(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(x, p):
    y = jnp.dot(x, p["w"], precision=scoring_precision(x.dtype),
                preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


def _rotate_every_two(x):
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack((-x2, x1), axis=-1).reshape(x.shape)


def _rotary_sincos(seq: int, rotary_dim: int):
    inv_freq = 1.0 / (10000 ** (np.arange(0, rotary_dim, 2) / rotary_dim))
    ang = np.einsum("i,j->ij", np.arange(seq, dtype=np.float32),
                    inv_freq.astype(np.float32))
    sin = np.repeat(ang, 2, axis=1)
    return jnp.asarray(np.sin(sin)), jnp.asarray(np.cos(sin))


def gptj_encode(
    params: Dict,
    cfg: GPTJConfig,
    input_ids: jnp.ndarray,        # [B, L] int32
    attention_mask: jnp.ndarray,   # [B, L] 0/1
) -> Dict[str, jnp.ndarray]:
    """GPT-J forward (eval mode), returns the last hidden state."""
    bsz, seq = input_ids.shape
    h = params["wte"][input_ids]

    sin, cos = _rotary_sincos(seq, cfg.rotary_dim)
    sin = sin[None, :, None, :]     # [1, L, 1, rotary_dim]
    cos = cos[None, :, None, :]

    causal = jnp.tril(jnp.ones((seq, seq), bool))
    keep = causal[None, None] & (attention_mask[:, None, None, :] > 0)
    att_bias = jnp.where(keep, 0.0, jnp.finfo(jnp.float32).min)
    scale = 1.0 / math.sqrt(cfg.head_dim)

    for layer in params["layers"]:
        x = _ln(h, layer["ln1"], cfg.layer_norm_eps)
        q = _dense(x, layer["q"]).reshape(bsz, seq, cfg.num_heads,
                                          cfg.head_dim)
        k = _dense(x, layer["k"]).reshape(bsz, seq, cfg.num_heads,
                                          cfg.head_dim)
        v = _dense(x, layer["v"]).reshape(bsz, seq, cfg.num_heads,
                                          cfg.head_dim)
        rd = cfg.rotary_dim
        q = jnp.concatenate(
            [q[..., :rd] * cos + _rotate_every_two(q[..., :rd]) * sin,
             q[..., rd:]], axis=-1)
        k = jnp.concatenate(
            [k[..., :rd] * cos + _rotate_every_two(k[..., :rd]) * sin,
             k[..., rd:]], axis=-1)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         precision=scoring_precision(h.dtype)) * scale
        att = jax.nn.softmax(att + att_bias, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v,
                         precision=scoring_precision(h.dtype))
        attn_out = _dense(ctx.reshape(bsz, seq, cfg.hidden_size),
                          layer["out"])
        mlp = _dense(jax.nn.gelu(_dense(x, layer["fc_in"]),
                                 approximate=True), layer["fc_out"])
        h = h + attn_out + mlp      # parallel attention + MLP

    h = _ln(h, params["ln_f"], cfg.layer_norm_eps)
    return {"last_hidden": h, "cls": h[:, 0]}


def params_from_torch_gptj(state_dict, cfg: GPTJConfig) -> Dict:
    """Map a torch ``GPTJModel`` state dict to our pytree."""

    def get(name):
        for prefix in ("", "transformer.", "0.auto_model."):
            key = prefix + name
            if key in state_dict:
                t = state_dict[key]
                return np.asarray(
                    t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                    dtype=np.float32)
        raise KeyError(name)

    def dense(name, bias=True):
        p = {"w": jnp.asarray(get(f"{name}.weight").T)}
        if bias:
            try:
                p["b"] = jnp.asarray(get(f"{name}.bias"))
            except KeyError:
                pass
        return p

    def ln(name):
        return {"scale": jnp.asarray(get(f"{name}.weight")),
                "bias": jnp.asarray(get(f"{name}.bias"))}

    params = {
        "wte": jnp.asarray(get("wte.weight")),
        "ln_f": ln("ln_f"),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        e = f"h.{i}"
        params["layers"].append({
            "ln1": ln(f"{e}.ln_1"),
            "q": dense(f"{e}.attn.q_proj", bias=False),
            "k": dense(f"{e}.attn.k_proj", bias=False),
            "v": dense(f"{e}.attn.v_proj", bias=False),
            "out": dense(f"{e}.attn.out_proj", bias=False),
            "fc_in": dense(f"{e}.mlp.fc_in"),
            "fc_out": dense(f"{e}.mlp.fc_out"),
        })
    return params


def config_from_hf(hf_config) -> GPTJConfig:
    return GPTJConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.n_embd,
        num_layers=hf_config.n_layer,
        num_heads=hf_config.n_head,
        rotary_dim=hf_config.rotary_dim or (hf_config.n_embd
                                            // hf_config.n_head),
        intermediate_size=hf_config.n_inner or 4 * hf_config.n_embd,
        layer_norm_eps=hf_config.layer_norm_epsilon,
    )
