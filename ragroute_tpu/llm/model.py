"""Pure-JAX llama-family causal decoder with KV-cache generation.

The TPU-native LLM forward behind ``LLMClient(backend="jax")`` — the
reference delegates generation to an external Ollama daemon
(``/root/reference/ragroute/http_server.py:309-327``); here the models in
the registry (``config.LLM_MODELS``: Llama-3.1-8B-Instruct, Qwen3-8B/0.6B)
run ON the TPU next to retrieval. One architecture covers both families:

* RMSNorm (f32 accumulation), SwiGLU MLP, no biases;
* rotary position embeddings in the half-rotation (NeoX) convention,
  with optional Llama-3.1 long-context frequency rescaling
  (``rope_scaling``);
* grouped-query attention with an explicit ``head_dim`` (Qwen3 decouples
  it from ``hidden/num_heads``) and optional per-head q/k RMSNorm
  (Qwen3's qk-norm);
* tied or untied LM head.

Generation is XLA-shaped: prompts are LEFT-padded to a static bucket
length so every row's next token lands at the same cache slot, the KV
cache is a dense ``[L, B, S, Hkv, Dh]`` buffer donated through a
``lax.scan`` decode loop (static ``max_new``), and per-row prompt lengths
drive both the rotary position offsets and the key-validity masks — so a
ragged batch decodes in lockstep with zero dynamic shapes. Verified
logit- and greedy-sequence-exact against ``transformers``
``LlamaForCausalLM`` / ``Qwen3ForCausalLM`` (``tests/test_llm_jax.py``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ragroute_tpu.utils.precision import scoring_precision


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    rms_eps: float = 1e-6
    rope_theta: float = 10000.0
    qk_norm: bool = False           # Qwen3: RMSNorm on q/k per head
    tie_embeddings: bool = False
    # Llama-3.1 rope rescale: (factor, low_freq_factor, high_freq_factor,
    # original_max_position_embeddings); None = plain RoPE.
    rope_scaling: Optional[Tuple[float, float, float, int]] = None

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


def _rms(x, scale, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * scale).astype(x.dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantW:
    """int8 weight-only quantization of a ``[in, out]`` matrix with
    per-output-channel symmetric scales. Decode is weight-STREAM-bound
    (bench_llm: B=1 runs at ~78% of HBM_BW/param_bytes), so halving the
    bytes per weight converts ~directly into decode tokens/s; the int8 →
    bf16 convert fuses into the matmul's operand read."""

    q: jnp.ndarray       # int8 [in, out]
    scale: jnp.ndarray   # f32  [out]

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def quantize(cls, w, axis: int = 0) -> "QuantW":
        wf = np.asarray(w, np.float32)
        amax = np.maximum(np.abs(wf).max(axis=axis), 1e-12)
        scale = (amax / 127.0).astype(np.float32)
        q = np.clip(np.round(wf / np.expand_dims(scale, axis)),
                    -127, 127).astype(np.int8)
        return cls(jnp.asarray(q), jnp.asarray(scale))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantW4:
    """int4 weight-only quantization: packed nibbles + GROUP-wise scales
    (``ops/int4_matmul``). Another ~2x fewer HBM bytes per decode step
    over int8; the nibble unpack happens inside a Pallas kernel so each
    packed byte is read from HBM exactly once (an XLA-level unpack
    either materializes bf16 weights or reads the buffer per nibble —
    see the module docstring of ``ops/int4_matmul``)."""

    q: jnp.ndarray       # int8 [in/2, out] packed nibbles
    scale: jnp.ndarray   # f32  [in//group, out] group scales

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def group(self) -> int:
        return (2 * self.q.shape[0]) // self.scale.shape[0]

    @classmethod
    def quantize(cls, w, group: int = 128) -> "QuantW4":
        from ragroute_tpu.ops.int4_matmul import quantize_int4

        in_dim = np.asarray(w).shape[0]
        g = _int4_group(in_dim, group)
        packed, scale = quantize_int4(np.asarray(w, np.float32), group=g)
        return cls(jnp.asarray(packed), jnp.asarray(scale))


def _int4_group(in_dim: int, group: int = 128) -> int:
    """Largest group size <= ``group`` dividing in_dim/2 (tiny demo
    shapes get proportionally small groups)."""
    half = in_dim // 2
    g = min(group, half)
    while half % g:
        g -= 1
    return g


def _dot(x, w):
    if isinstance(w, QuantW4):
        from ragroute_tpu.ops.int4_matmul import int4_matmul

        shape = x.shape
        y = int4_matmul(x.reshape(-1, shape[-1]), w.q, w.scale,
                        group=w.group)
        return y.reshape(*shape[:-1], y.shape[-1]).astype(x.dtype)
    if isinstance(w, QuantW):
        y = jnp.dot(x, w.q.astype(x.dtype),
                    precision=scoring_precision(x.dtype),
                    preferred_element_type=jnp.float32)
        return (y * w.scale).astype(x.dtype)
    return jnp.dot(x, w, precision=scoring_precision(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)


def _inv_freq(cfg: DecoderConfig) -> np.ndarray:
    inv = 1.0 / (cfg.rope_theta
                 ** (np.arange(0, cfg.head_dim, 2) / cfg.head_dim))
    if cfg.rope_scaling is not None:
        # HF modeling_rope_utils._compute_llama3_parameters semantics
        factor, low_ff, high_ff, orig_max = cfg.rope_scaling
        low_wl = orig_max / low_ff
        high_wl = orig_max / high_ff
        wavelen = 2 * math.pi / inv
        inv_scaled = np.where(wavelen > low_wl, inv / factor, inv)
        smooth = (orig_max / wavelen - low_ff) / (high_ff - low_ff)
        smoothed = (1 - smooth) / factor * inv + smooth * inv
        is_medium = (wavelen >= high_wl) & (wavelen <= low_wl)
        inv = np.where(is_medium, smoothed, inv_scaled)
    return inv.astype(np.float32)


def _rope(x, positions, inv_freq):
    """Half-rotation RoPE. x: [B, T, H, Dh], positions: [B, T] int32."""
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # [B,T,Dh/2]
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin],
        axis=-1).astype(x.dtype)


def _qkv(layer, cfg: DecoderConfig, x, positions, inv_freq):
    """Project + (qk-norm) + rope. Returns q [B,T,H,Dh], k/v [B,T,Hkv,Dh]."""
    b, t = x.shape[:2]
    q = _dot(x, layer["wq"]).reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = _dot(x, layer["wk"]).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    v = _dot(x, layer["wv"]).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    if cfg.qk_norm:
        q = _rms(q, layer["q_norm"], cfg.rms_eps)
        k = _rms(k, layer["k_norm"], cfg.rms_eps)
    return (_rope(q, positions, inv_freq), _rope(k, positions, inv_freq), v)


def _attend(q, k, v, kmask, cfg: DecoderConfig, k_scale=None, v_scale=None,
            prefix_kv=None):
    """GQA attention. q: [B,Tq,H,Dh]; k/v: [B,S,Hkv,Dh]; kmask: [B,Tq,S]
    True where the key may be attended. f32 logits/softmax.

    ``k_scale``/``v_scale`` ([B,S,Hkv] f32) carry int8-KV-cache dequant
    scales. They are applied to the SCORE matrix, not the operands —
    per-(position, head) scales are constant over head_dim, so
    ``(q · s*k) == s * (q · k)``; this keeps both dots reading the int8
    cache directly (the int8→f32 convert fuses into the dot's operand
    read) instead of materializing a dequantized [B,S,Hkv,Dh] copy in
    HBM each step, which is what an up-front dequant costs (measured:
    dequant-before-dot DOUBLES the B=32 step time; see BENCHMARKS.md).

    ``prefix_kv`` = ``(pk, pv)``, each ``[P0,Hkv,Dh]``: a SHARED prompt
    prefix's K/V, stored once (no batch dim) and attended by every row
    before its own keys — one softmax over the concatenated
    ``[P0 + S]`` score axis, so the result is bit-comparable to having
    the prefix copied into every row's cache. The prefix is always
    fully attendable (every query position is causally after it); its
    dot broadcasts the [P0,Hkv,Dh] block across the batch, so the HBM
    read is P0 instead of B×P0 rows."""
    groups = cfg.num_heads // cfg.num_kv_heads
    b, tq = q.shape[:2]
    s = k.shape[1]
    qg = q.reshape(b, tq, cfg.num_kv_heads, groups, cfg.head_dim)
    scale = 1.0 / math.sqrt(cfg.head_dim)
    att = jnp.einsum("bqhgd,bkhd->bhgqk", qg.astype(jnp.float32),
                     k.astype(jnp.float32),
                     precision=scoring_precision(jnp.float32))
    if k_scale is not None:
        att = att * k_scale.transpose(0, 2, 1)[:, :, None, None, :]
    att = att * scale
    att = jnp.where(kmask[:, None, None], att, jnp.finfo(jnp.float32).min)
    if prefix_kv is not None:
        pk, pv = prefix_kv
        patt = jnp.einsum("bqhgd,khd->bhgqk", qg.astype(jnp.float32),
                          pk.astype(jnp.float32),
                          precision=scoring_precision(jnp.float32)) * scale
        att = jnp.concatenate([patt, att], axis=-1)    # [.., P0 + S]
    att = jax.nn.softmax(att, axis=-1)
    if prefix_kv is not None:
        p0 = prefix_kv[0].shape[0]
        pctx = jnp.einsum("bhgqk,khd->bqhgd", att[..., :p0],
                          pv.astype(jnp.float32),
                          precision=scoring_precision(jnp.float32))
        att = att[..., p0:]
    if v_scale is not None:
        att = att * v_scale.transpose(0, 2, 1)[:, :, None, None, :]
    ctx = jnp.einsum("bhgqk,bkhd->bqhgd", att, v.astype(jnp.float32),
                     precision=scoring_precision(jnp.float32))
    if prefix_kv is not None:
        ctx = ctx + pctx
    return ctx.reshape(b, tq, cfg.q_dim).astype(q.dtype)


def _mlp(layer, x):
    return _dot(jax.nn.silu(_dot(x, layer["gate"])) * _dot(x, layer["up"]),
                layer["down"])


def _embed_lookup(params, ids):
    e = params["embed"]
    if isinstance(e, QuantW4):
        # int4 embeddings are stored HEAD-form ([D/2, V] packed along D,
        # group scales [D/group, V]) so the tied head rides the Pallas
        # kernel; a lookup gathers columns and unpacks them in XLA (the
        # gathered bytes are tiny — B rows, not the V x D table)
        d2, _ = e.q.shape
        g = e.scale.shape[0]
        flat = ids.reshape(-1)
        cols = jnp.take(e.q, flat, axis=1).astype(jnp.int32)  # [D/2, N]
        lo = jnp.right_shift(jnp.left_shift(cols, 28), 28)
        hi = jnp.right_shift(cols, 4)
        codes = jnp.concatenate([lo, hi], axis=0)             # [D, N]
        s = jnp.take(e.scale, flat, axis=1)                   # [G, N]
        deq = (codes.astype(jnp.float32).reshape(g, (2 * d2) // g, -1)
               * s[:, None])
        emb = deq.reshape(2 * d2, -1).T
        return emb.reshape(*ids.shape, 2 * d2).astype(
            params["ln_f"].dtype)
    if isinstance(e, QuantW):  # q [V, D] int8, scale [V]
        return (e.q[ids].astype(jnp.float32)
                * e.scale[ids][..., None]).astype(params["ln_f"].dtype)
    return e[ids]


def _logits(params, cfg: DecoderConfig, h):
    h = _rms(h, params["ln_f"], cfg.rms_eps)

    def _head4(w4, h):
        from ragroute_tpu.ops.int4_matmul import int4_matmul

        shape = h.shape
        y = int4_matmul(h.reshape(-1, shape[-1]), w4.q, w4.scale,
                        group=w4.group)
        return y.reshape(*shape[:-1], y.shape[-1])

    if cfg.tie_embeddings:
        e = params["embed"]
        if isinstance(e, QuantW4):  # stored head-form [D/2, V]
            return _head4(e, h)
        if isinstance(e, QuantW):  # head = embed.T → per-COLUMN scales
            y = jnp.dot(h, e.q.T.astype(h.dtype),
                        precision=scoring_precision(h.dtype),
                        preferred_element_type=jnp.float32)
            return y * e.scale
        head = e.T
    else:
        head = params["lm_head"]
        if isinstance(head, QuantW4):
            return _head4(head, h)
        if isinstance(head, QuantW):
            y = jnp.dot(h, head.q.astype(h.dtype),
                        precision=scoring_precision(h.dtype),
                        preferred_element_type=jnp.float32)
            return y * head.scale
    return jnp.dot(h, head, precision=scoring_precision(jnp.float32),
                   preferred_element_type=jnp.float32)


def quantize_decoder_params(params, cfg: DecoderConfig,
                            quantize_embed: bool = True,
                            bits: int = 8, group: int = 128):
    """Weight-only quantization of every layer matrix, the LM head, and
    (optionally) the embedding table.

    ``bits=8``: per-output-channel int8 scales — ~2× fewer HBM bytes per
    decode step at <1e-2 relative logit error (gated in
    tests/test_llm_jax.py). ``bits=4``: packed int4 with GROUP-wise
    scales through the Pallas dequant matmul (``ops/int4_matmul``) —
    another ~2× fewer bytes; the embedding table is stored head-form so
    the tied head rides the kernel and lookups gather+unpack columns.
    Not composable with ``shard_decoder_params`` yet (the spec pytree
    doesn't descend into the quant nodes)."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    mats = ("wq", "wk", "wv", "wo", "gate", "up", "down")

    def qmat(v):
        if bits == 8:
            return QuantW.quantize(v)
        return QuantW4.quantize(v, group=group)

    out = {
        "ln_f": params["ln_f"],
        "layers": [
            {k: (qmat(v) if k in mats else v)
             for k, v in layer.items()}
            for layer in params["layers"]
        ],
    }
    if quantize_embed:
        if bits == 8:
            # [V, D] with per-ROW scales: exact for both the lookup and
            # the tied head (columns of embed.T)
            out["embed"] = QuantW.quantize(params["embed"], axis=1)
        else:
            # head-form: quantize embed.T [D, V] along D (group scales
            # per vocab column = per vocab row of the table)
            out["embed"] = QuantW4.quantize(
                np.asarray(params["embed"]).T, group=group)
    else:
        out["embed"] = params["embed"]
    if not cfg.tie_embeddings:
        out["lm_head"] = qmat(params["lm_head"])
    return out


def init_cache(cfg: DecoderConfig, batch: int, max_len: int,
               dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """KV cache. ``dtype="int8"`` quantizes the cache: int8 codes with
    per-(position, head) f32 scales (``ks``/``vs`` leaves). Decode at
    large batch is KV-READ-bound (BENCHMARKS.md: B=32 re-reads ~1.2 GB
    of cache per step on the 0.6B shape), so halving the cached bytes
    converts into decode tokens/s exactly like int8 weights do at small
    batch — PROVIDED the scales are applied to the attention scores,
    not the operands (see ``_attend``; measured 1.37× at B=32 vs 0.73×
    for dequant-before-dot)."""
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if isinstance(dtype, str):
        if dtype != "int8":
            raise ValueError(f"unknown cache dtype {dtype!r}")
        return {"k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "ks": jnp.zeros(shape[:-1], jnp.float32),
                "vs": jnp.zeros(shape[:-1], jnp.float32)}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def quant_kv(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 per-(…, head) quantization over the head_dim axis:
    ``x [..., Dh]`` → ``(codes int8 [..., Dh], scales f32 [...])``."""
    s = jnp.maximum(jnp.abs(x).max(axis=-1), 1e-12).astype(
        jnp.float32) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def cache_write(cache: Dict[str, jnp.ndarray], name: str, val, put) -> None:
    """ONE quantize-aware KV-cache write shared by every engine
    (lockstep prefill/decode, continuous admit/chunk, speculative).
    ``val`` is the new K or V block in compute precision; ``put(plane,
    payload)`` scatters a payload into one cache plane at the caller's
    indices — the same index expression serves the code plane
    ``[..., Dh]`` and the scale plane ``[...]`` because the indices
    only address leading axes. Centralizing the \"quantize then write
    codes+scales, else cast and write\" branch here is what keeps the
    cross-engine token-exactness contract safe if the quantization
    scheme ever changes."""
    if name + "s" in cache:
        q, s = quant_kv(val)
        cache[name] = put(cache[name], q)
        cache[name + "s"] = put(cache[name + "s"], s)
    else:
        cache[name] = put(cache[name], val.astype(cache[name].dtype))


def cache_read(cache: Dict[str, jnp.ndarray], name: str, li):
    """Layer ``li``'s K or V codes plus the dequant scale (``None`` for
    a non-quantized cache). Pass both to ``_attend`` — scales are folded
    into the score matrix there so the dots read the int8 cache
    directly; dequantizing here would write a full bf16 copy to HBM
    every step (measured 2× slower at B=32)."""
    s = cache.get(name + "s")
    return cache[name][li], (None if s is None else s[li])


def prefill_layers(params, cfg: DecoderConfig, h, positions, kmask, *,
                   inv_freq, prefix_kv=None):
    """The transformer stack for PREFILL-side engines (lockstep prefill,
    continuous row admit): rms -> qkv -> attend fresh K/V -> wo -> mlp
    per layer. Returns (h, ks, vs) with per-layer fresh K/V lists —
    callers write them into their own cache layout. ONE copy of the
    layer body keeps the cross-engine token-exactness contract safe
    (a change here reaches every engine or none)."""
    ks, vs = [], []
    for li, layer in enumerate(params["layers"]):
        x = _rms(h, layer["ln1"], cfg.rms_eps)
        q, k, v = _qkv(layer, cfg, x, positions, inv_freq)
        ks.append(k)
        vs.append(v)
        pkv = (None if prefix_kv is None
               else (prefix_kv[0][li], prefix_kv[1][li]))
        h = h + _dot(_attend(q, k, v, kmask, cfg, prefix_kv=pkv),
                     layer["wo"])
        h = h + _mlp(layer, _rms(h, layer["ln2"], cfg.rms_eps))
    return h, ks, vs


def decode_layers(params, cfg: DecoderConfig, h, positions, kmask, cache,
                  write, *, inv_freq, prefix_kv=None):
    """The transformer stack for DECODE-side engines (lockstep decode
    step, continuous ragged chunk, speculative window): rms -> qkv ->
    cache_write -> cache_read -> attend(+scales, +prefix) -> wo -> mlp
    per layer. ``write(cache, li, k, v)`` scatters fresh K/V into the
    caller's cache layout (fixed slot / per-row count / window) — the
    only thing that differs between engines."""
    for li, layer in enumerate(params["layers"]):
        x = _rms(h, layer["ln1"], cfg.rms_eps)
        q, k, v = _qkv(layer, cfg, x, positions, inv_freq)
        write(cache, li, k, v)
        ck, ksc = cache_read(cache, "k", li)
        cv, vsc = cache_read(cache, "v", li)
        pkv = (None if prefix_kv is None
               else (prefix_kv[0][li], prefix_kv[1][li]))
        h = h + _dot(
            _attend(q, ck, cv, kmask, cfg, k_scale=ksc, v_scale=vsc,
                    prefix_kv=pkv),
            layer["wo"])
        h = h + _mlp(layer, _rms(h, layer["ln2"], cfg.rms_eps))
    return h


def prefill(params, cfg: DecoderConfig, input_ids, attention_mask,
            cache) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Run the prompt (LEFT-padded to its bucket length P ≤ S) and fill
    cache slots [0, P). Returns (last-position logits [B, V] f32, cache).

    ``attention_mask`` is [B, P] 0/1 with the zeros on the LEFT; the
    real tokens of row b sit in slots [P - len_b, P), so the next
    generated token for every row lands at slot P.
    """
    b, p = input_ids.shape
    inv_freq = jnp.asarray(_inv_freq(cfg))
    mask = attention_mask.astype(jnp.int32)
    # absolute position of each prompt token (0 for pads; they're masked)
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
    causal = jnp.tril(jnp.ones((p, p), bool))
    kmask = causal[None] & (mask[:, None, :] > 0)

    h = _embed_lookup(params, input_ids)
    h, new_k, new_v = prefill_layers(params, cfg, h, positions, kmask,
                                     inv_freq=inv_freq)

    def at_origin(plane, payload):
        return jax.lax.dynamic_update_slice(
            plane, payload, (0,) * plane.ndim)

    cache_write(cache, "k", jnp.stack(new_k), at_origin)
    cache_write(cache, "v", jnp.stack(new_v), at_origin)
    return _logits(params, cfg, h[:, -1:])[:, 0], cache


def decode_step(params, cfg: DecoderConfig, cache, token, lengths,
                prompt_pad: int, t) -> Tuple[jnp.ndarray, Dict]:
    """One decode step: ``token`` [B] goes to cache slot ``prompt_pad + t``
    (traced scalar ``t``); row b's rotary position is ``lengths[b] + t``.
    Returns (logits [B, V] f32, cache)."""
    b = token.shape[0]
    s = cache["k"].shape[2]
    inv_freq = jnp.asarray(_inv_freq(cfg))
    positions = (lengths + t)[:, None]            # [B, 1]
    slot = prompt_pad + t
    iota = jnp.arange(s)
    # valid keys: prompt tokens [P - len_b, P) plus generated [P, P + t]
    kmask = ((iota[None, :] >= prompt_pad - lengths[:, None])
             & (iota[None, :] <= slot))[:, None, :]  # [B, 1, S]

    def write(cache, li, k, v):
        def at_slot(plane, payload):
            return jax.lax.dynamic_update_slice(
                plane, payload[None],
                (li, 0, slot) + (0,) * (plane.ndim - 3))

        cache_write(cache, "k", k, at_slot)
        cache_write(cache, "v", v, at_slot)

    h = _embed_lookup(params, token)[:, None]     # [B, 1, D]
    h = decode_layers(params, cfg, h, positions, kmask, cache, write,
                      inv_freq=inv_freq)
    return _logits(params, cfg, h)[:, 0], cache


def sample_token(logits, key, temperature: float, top_k: int = 0,
                 top_p: float = 1.0):
    """Greedy at temperature 0 else categorical over f32 logits [B, V],
    optionally truncated: ``top_k`` keeps the k highest logits,
    ``top_p`` the smallest nucleus whose probability mass reaches p
    (both static → baked into the jitted step; combined, top-k applies
    first, standard sampler order). top-k is a ``lax.top_k`` threshold;
    top-p sorts the (possibly top-k-truncated) row once — O(V log V) on
    the VPU per step, negligible against the weight stream."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    l = logits.astype(jnp.float32) / temperature
    neg = jnp.finfo(jnp.float32).min
    if top_k and top_k < l.shape[-1]:
        kth = jax.lax.top_k(l, top_k)[0][..., -1:]
        l = jnp.where(l < kth, neg, l)
    if top_p < 1.0:
        srt = jnp.sort(l, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        # keep a sorted token while the mass BEFORE it is < p (so the
        # nucleus always contains at least the argmax)
        keep = (jnp.cumsum(probs, axis=-1) - probs) < top_p
        thresh = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                         keepdims=True)
        l = jnp.where(l < thresh, neg, l)
    return jax.random.categorical(key, l, axis=-1).astype(jnp.int32)


def generate(params, cfg: DecoderConfig, input_ids, attention_mask,
             max_new: int, *, eos_id: int, pad_id: int = 0,
             temperature: float = 0.0, top_k: int = 0, top_p: float = 1.0,
             rng_seed: int = 0,
             cache_dtype=jnp.float32,
             first_token: Optional[jnp.ndarray] = None,
             budgets: Optional[jnp.ndarray] = None,
             cache=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prefill + ``max_new`` lockstep decode steps under ``lax.scan``.

    Returns (tokens [B, max_new] int32, done [B] bool). Rows emit
    ``pad_id`` after their EOS. ``budgets`` [B] (traced, so no recompile)
    caps each row's emitted tokens below ``max_new`` — rows past their
    budget emit ``pad_id``. Jit this whole function (donate ``cache`` if
    passed) — shapes are static in (B, P, max_new).
    """
    b, p = input_ids.shape
    lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=1)
    if budgets is None:
        budgets = jnp.full((b,), max_new, jnp.int32)
    if cache is None:
        cache = init_cache(cfg, b, p + max_new, cache_dtype)
    logits0, cache = prefill(params, cfg, input_ids, attention_mask, cache)
    key = jax.random.key(rng_seed)
    tok0 = (first_token if first_token is not None
            else sample_token(logits0, jax.random.fold_in(key, 0),
                              temperature, top_k, top_p))
    done0 = (tok0 == eos_id) | (budgets <= 1)
    tok0 = jnp.where(budgets <= 0, pad_id, tok0)

    def step(carry, t):
        cache, tok, done, key = carry
        logits, cache = decode_step(params, cfg, cache, tok, lengths, p, t)
        nxt = sample_token(logits, jax.random.fold_in(key, t + 1),
                           temperature, top_k, top_p)
        nxt = jnp.where(done, pad_id, nxt)
        # emitting index t+1 (0-based); a row is done once it has emitted
        # budget tokens, i.e. after index budget-1
        done = done | (nxt == eos_id) | (t + 2 >= budgets)
        return (cache, nxt, done, key), nxt

    if max_new <= 1:
        return tok0[:, None], done0
    (cache, _, done, _), rest = jax.lax.scan(
        step, (cache, tok0, done0, key), jnp.arange(max_new - 1))
    tokens = jnp.concatenate([tok0[:, None], rest.T], axis=1)
    # mask everything after the first eos to pad
    after = jnp.cumsum((tokens == eos_id).astype(jnp.int32), axis=1)
    keep = (after == 0) | ((tokens == eos_id) & (after == 1))
    return jnp.where(keep, tokens, pad_id), done


# ---------------------------------------------------------------------------
# HF checkpoint import (LlamaForCausalLM / Qwen3ForCausalLM state dicts)
# ---------------------------------------------------------------------------

def params_from_torch_causal_lm(state_dict, cfg: DecoderConfig,
                                dtype=jnp.float32) -> Dict:
    """Map a HF llama/qwen3 causal-LM state dict to our pytree."""

    def get(name):
        for prefix in ("", "model."):
            if prefix + name in state_dict:
                t = state_dict[prefix + name]
                return np.asarray(
                    t.detach().cpu().float().numpy()
                    if hasattr(t, "detach") else t, dtype=np.float32)
        raise KeyError(name)

    def w(name):  # torch Linear stores [out, in]; we want [in, out]
        return jnp.asarray(get(name).T, dtype)

    params = {
        "embed": jnp.asarray(get("embed_tokens.weight"), dtype),
        "ln_f": jnp.asarray(get("norm.weight"), dtype),
        "layers": [],
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = w("lm_head.weight")
    for i in range(cfg.num_layers):
        e = f"layers.{i}"
        layer = {
            "ln1": jnp.asarray(get(f"{e}.input_layernorm.weight"), dtype),
            "ln2": jnp.asarray(
                get(f"{e}.post_attention_layernorm.weight"), dtype),
            "wq": w(f"{e}.self_attn.q_proj.weight"),
            "wk": w(f"{e}.self_attn.k_proj.weight"),
            "wv": w(f"{e}.self_attn.v_proj.weight"),
            "wo": w(f"{e}.self_attn.o_proj.weight"),
            "gate": w(f"{e}.mlp.gate_proj.weight"),
            "up": w(f"{e}.mlp.up_proj.weight"),
            "down": w(f"{e}.mlp.down_proj.weight"),
        }
        if cfg.qk_norm:
            layer["q_norm"] = jnp.asarray(
                get(f"{e}.self_attn.q_norm.weight"), dtype)
            layer["k_norm"] = jnp.asarray(
                get(f"{e}.self_attn.k_norm.weight"), dtype)
        params["layers"].append(layer)
    return params


def config_from_hf(hf_config) -> DecoderConfig:
    """DecoderConfig from a HF LlamaConfig / Qwen3Config."""
    head_dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads)
    scaling = None
    rs = getattr(hf_config, "rope_scaling", None)
    if rs:
        kind = rs.get("rope_type", rs.get("type"))
        if kind == "llama3":
            scaling = (rs["factor"], rs["low_freq_factor"],
                       rs["high_freq_factor"],
                       rs["original_max_position_embeddings"])
        elif kind not in (None, "default"):
            # silently using plain RoPE would generate garbage beyond the
            # original context window — refuse loudly
            raise ValueError(
                f"unsupported rope_scaling type {kind!r} (supported: "
                "llama3, default); the checkpoint needs a frequency "
                "schedule this decoder does not implement yet")
    return DecoderConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads", None)
        or hf_config.num_attention_heads,
        head_dim=head_dim,
        intermediate_size=hf_config.intermediate_size,
        rms_eps=hf_config.rms_norm_eps,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        qk_norm=type(hf_config).__name__.startswith("Qwen3"),
        tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        rope_scaling=scaling,
    )


def init_decoder_params(key, cfg: DecoderConfig, dtype=jnp.float32) -> Dict:
    """Deterministic random init (demo/test weights)."""
    keys = iter(jax.random.split(key, 4 + 11 * cfg.num_layers))

    def mat(shape, scale=None):
        s = scale if scale is not None else 1.0 / math.sqrt(shape[0])
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * s).astype(dtype)

    params = {
        "embed": mat((cfg.vocab_size, cfg.hidden_size), 0.02),
        "ln_f": jnp.ones((cfg.hidden_size,), dtype),
        "layers": [],
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = mat((cfg.hidden_size, cfg.vocab_size))
    for _ in range(cfg.num_layers):
        layer = {
            "ln1": jnp.ones((cfg.hidden_size,), dtype),
            "ln2": jnp.ones((cfg.hidden_size,), dtype),
            "wq": mat((cfg.hidden_size, cfg.q_dim)),
            "wk": mat((cfg.hidden_size, cfg.kv_dim)),
            "wv": mat((cfg.hidden_size, cfg.kv_dim)),
            "wo": mat((cfg.q_dim, cfg.hidden_size)),
            "gate": mat((cfg.hidden_size, cfg.intermediate_size)),
            "up": mat((cfg.hidden_size, cfg.intermediate_size)),
            "down": mat((cfg.intermediate_size, cfg.hidden_size)),
        }
        if cfg.qk_norm:
            layer["q_norm"] = jnp.ones((cfg.head_dim,), dtype)
            layer["k_norm"] = jnp.ones((cfg.head_dim,), dtype)
        params["layers"].append(layer)
    return params
