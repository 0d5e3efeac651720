"""Pure-JAX T5 encoder with HF weight import.

The TPU-native forward under INSTRUCTOR (reference
``instructor/instructor_model.py`` wraps a torch T5 encoder stack).
T5-encoder specifics implemented here:

* RMS layernorm (scale only, no mean subtraction, pre-norm);
* UNSCALED attention logits (T5 folds the 1/sqrt(d) into its weight
  init — there is no runtime scaling);
* bucketed relative position bias computed once from layer 0's embedding
  and shared by every layer (same bidirectional bucket function as MPNet,
  reused from :mod:`ragroute_tpu.encoders.mpnet`);
* no biases anywhere; both FFN variants: ReLU (t5) and gated-GELU
  (t5-v1_1 / GTR / instructor).

Instruction-masked pooling lives in :mod:`ragroute_tpu.encoders.custom`;
this module only produces last hidden states.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ragroute_tpu.encoders.mpnet import relative_position_bucket
from ragroute_tpu.utils.precision import scoring_precision


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    hidden_size: int = 1024          # d_model
    num_layers: int = 24
    num_heads: int = 16
    head_dim: int = 64               # d_kv (NOT necessarily d_model/heads)
    intermediate_size: int = 2816    # d_ff
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    gated_act: bool = True           # t5-v1_1/GTR/instructor family
    layer_norm_eps: float = 1e-6


def _rms(x, scale, eps):
    var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)) * scale


def _dense(x, w):
    return jnp.dot(x, w, precision=scoring_precision(x.dtype),
                   preferred_element_type=jnp.float32)


def t5_encode(
    params: Dict,
    cfg: T5Config,
    input_ids: jnp.ndarray,        # [B, L] int32
    attention_mask: jnp.ndarray,   # [B, L] 0/1
) -> Dict[str, jnp.ndarray]:
    """T5 encoder stack forward (eval mode)."""
    bsz, seq = input_ids.shape
    h = params["embed"][input_ids]

    pos = jnp.arange(seq)
    rel = pos[None, :] - pos[:, None]          # memory - context
    buckets = relative_position_bucket(
        rel, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    pos_bias = jnp.transpose(params["rel_bias"][buckets], (2, 0, 1))[None]
    pos_bias = pos_bias + (
        1.0 - attention_mask[:, None, None, :].astype(jnp.float32)
    ) * jnp.finfo(jnp.float32).min

    nh, hd = cfg.num_heads, cfg.head_dim
    for layer in params["layers"]:
        x = _rms(h, layer["ln_att"], cfg.layer_norm_eps)
        q = _dense(x, layer["q"]).reshape(bsz, seq, nh, hd)
        k = _dense(x, layer["k"]).reshape(bsz, seq, nh, hd)
        v = _dense(x, layer["v"]).reshape(bsz, seq, nh, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         precision=scoring_precision(h.dtype))
        att = jax.nn.softmax(att + pos_bias, axis=-1)  # T5: no 1/sqrt(d)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v,
                         precision=scoring_precision(h.dtype))
        h = h + _dense(ctx.reshape(bsz, seq, nh * hd), layer["o"])

        x = _rms(h, layer["ln_ffn"], cfg.layer_norm_eps)
        if cfg.gated_act:
            ff = jax.nn.gelu(_dense(x, layer["wi_0"]), approximate=True) \
                * _dense(x, layer["wi_1"])
        else:
            ff = jax.nn.relu(_dense(x, layer["wi"]))
        h = h + _dense(ff, layer["wo"])

    h = _rms(h, params["ln_final"], cfg.layer_norm_eps)
    return {"last_hidden": h, "cls": h[:, 0]}


def params_from_torch_t5(state_dict, cfg: T5Config) -> Dict:
    """Map a torch ``T5EncoderModel`` state dict to our pytree."""

    def get(name):
        for prefix in ("", "encoder.", "0.auto_model.", "0.auto_model.encoder."):
            key = prefix + name
            if key in state_dict:
                t = state_dict[key]
                return np.asarray(
                    t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                    dtype=np.float32)
        raise KeyError(name)

    def w(name):
        return jnp.asarray(get(f"{name}.weight").T)

    params = {
        "embed": jnp.asarray(get("embed_tokens.weight")),
        "rel_bias": jnp.asarray(get(
            "block.0.layer.0.SelfAttention.relative_attention_bias"
            ".weight")),
        "ln_final": jnp.asarray(get("final_layer_norm.weight")),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        e = f"block.{i}"
        layer = {
            "ln_att": jnp.asarray(get(f"{e}.layer.0.layer_norm.weight")),
            "q": w(f"{e}.layer.0.SelfAttention.q"),
            "k": w(f"{e}.layer.0.SelfAttention.k"),
            "v": w(f"{e}.layer.0.SelfAttention.v"),
            "o": w(f"{e}.layer.0.SelfAttention.o"),
            "ln_ffn": jnp.asarray(get(f"{e}.layer.1.layer_norm.weight")),
        }
        if cfg.gated_act:
            layer["wi_0"] = w(f"{e}.layer.1.DenseReluDense.wi_0")
            layer["wi_1"] = w(f"{e}.layer.1.DenseReluDense.wi_1")
        else:
            layer["wi"] = w(f"{e}.layer.1.DenseReluDense.wi")
        layer["wo"] = w(f"{e}.layer.1.DenseReluDense.wo")
        params["layers"].append(layer)
    return params


def config_from_hf(hf_config) -> T5Config:
    return T5Config(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.d_model,
        num_layers=hf_config.num_layers,
        num_heads=hf_config.num_heads,
        head_dim=hf_config.d_kv,
        intermediate_size=hf_config.d_ff,
        relative_attention_num_buckets=
        hf_config.relative_attention_num_buckets,
        relative_attention_max_distance=getattr(
            hf_config, "relative_attention_max_distance", 128),
        gated_act=hf_config.is_gated_act,
        layer_norm_eps=hf_config.layer_norm_epsilon,
    )
