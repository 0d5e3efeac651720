"""Fused Pallas GQA decode-attention over the (optionally int8) KV cache.

STATUS: REFUTED DESIGN, kept as the measured record that closes the
decode-attention kernel axis (with ``scripts/bench_decode_attn.py``,
the harness that produced the numbers). It is wired to nothing in the
serving path — the engines keep the XLA einsum in ``llm.model._attend``.

The premise (BENCHMARKS.md's earlier two-point fit: "KV read at
65-81% of SoL, ≤0.8 ms/step headroom") does not survive direct
measurement. Isolated differential timing on the v5e chip (one layer,
B=32, S=640, Qwen3-0.6B heads, int8 KV + per-(pos,head) scales; 27 ms
tunnel floor cancelled by differencing 100- vs 500-iteration scans):

    XLA ``_attend`` einsum path   68.2 µs/layer  (77% of floor)
    this kernel (folded planes)   82.6 µs/layer  (64%)
    HBM read-once floor           52.8 µs/layer  (39.5 MB @ 819 GB/s)

The kernel is COMPUTE-bound, not HBM-bound: per batch-row block the
DMA is 1.65 µs but the in-VMEM work — int8→bf16 converts of both
[S, Hkv*Dh] planes (~1.4 µs), the two MXU dots (~1.4 µs at M=H=16),
softmax + scale expansion + 8 strided sublane extractions — totals
~2.5 µs, and grid pipelining cannot hide compute behind a smaller DMA.
Eliminating the K convert via an int8×int8 scores dot gets compute to
~2.1 µs ≈ exactly XLA's 68 µs; beating it further requires quantizing
the attention weights for the int8 ctx dot, which breaks the
fused==XLA exactness gate this package requires. A full-model A/B
agreed: prompt 512 / 128 new / B=32 / int8 KV on the 28-layer
Qwen3-0.6B shape ran 4.292 ms/step (XLA, head-form cache), 4.609
(this kernel + folded cache), 9.011 (XLA forced onto the folded
layout — the [B,S,Hkv*Dh]→[B,S,Hkv,Dh] unfold is a physical
sublane/lane transpose XLA must materialize per layer per step, which
is also why the engines keep the head-form cache). Axis closed: the
XLA lowering of grouped-query decode attention with score-side dequant
is within ~23% of the read-once floor and no Pallas design we found
gets closer without changing the math.

The design itself, for the record — the WHOLE per-layer decode
attention (q·K^T, int8 dequant score scaling, mask, softmax, value
scaling, att·V) in one VMEM-resident pass per batch row, every cache
byte crossing HBM exactly once:

* grid ``(B,)``: one block per batch row streams that row's full
  ``[S, Hkv*Dh]`` K and V planes (contiguous in the ``[L,B,S,Hkv,Dh]``
  cache layout — no layout change anywhere else in the engine);
* per kv-head: ``q_g [G,Dh] · K_h [S,Dh]^T`` via the MXU transposed-B
  form (the same ``TRANS_B`` dimension numbers the reference flash
  kernels use), f32 softmax on the VPU, then ``att [G,S] · V_h [S,Dh]``;
* int8 cache codes convert to bf16 IN REGISTER (integers ≤127 are exact
  in bf16) and the per-(position, head) dequant scales fold into the
  score matrix exactly as in ``llm.model._attend`` — never into the
  operands, so no dequantized copy of the cache ever exists;
* compute dtype mirrors ``utils.precision`` policy: bf16 operands with
  f32 accumulation on TPU (what ``Precision.DEFAULT`` does to f32 dots
  anyway), full f32 in interpret mode so the CPU parity test is
  bit-comparable to the XLA reference path.

``RAGROUTE_DECODE_ATTN=fused`` lets ``fused_ok`` approve it off-TPU
(interpret mode) so the exactness gates in
``tests/test_decode_attention.py`` keep pinning the design against
``_attend``'s math.

Reference behavior this targeted: the decode half of HF
``LlamaAttention.forward`` (the reference delegates generation to an
Ollama daemon, ``/root/reference/ragroute/http_server.py:309-327``; the
jax decoder replaces it on-chip — see ``llm/model.py``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget shared with the other kernels in this package (16 MB
# scoped limit, headroom for compiler temporaries). The K/V blocks are
# double-buffered by the pipeline, hence the ×2 in _fits_vmem.
_VMEM_BUDGET = 13 * 1024 * 1024

_TRANS_B = (((1,), (1,)), ((), ()))
_STD = (((1,), (0,)), ((), ()))


def _kernel(q_ref, k_ref, v_ref, ok_ref, ks_ref, vs_ref, out_ref,
            qbd_ref, *, hkv: int, groups: int, head_dim: int,
            scale: float, quant: bool, compute_dtype):
    """Per-head work is reformulated as ONE full-width matmul per plane
    so every VPU/MXU op runs at [H, S] / [S, Hkv*Dh] shapes: the
    per-head-loop form (8 tiny [G, Dh] dots + [G, S] softmaxes per
    block) measured 1.09 ms/step vs XLA's 0.65 at L=2/B=32 — with
    G = 2 every vector op wasted 6/8 sublanes and every dot paid its
    fixed cost 8×. Instead the query heads scatter into a BLOCK-
    DIAGONAL [H, Hkv*Dh] scratch (zeros off-diagonal), so
    ``qbd · K_plane^T`` computes exactly the per-head scores in one
    MXU pass, and ``att · V_plane`` computes per-head contexts plus
    cross-head blocks that the diagonal extraction simply ignores —
    the extra MACs ride an otherwise idle MXU (the kernel is
    HBM/VPU-bound)."""
    neg = jnp.finfo(jnp.float32).min
    g, dh = groups, head_dim
    qbd_ref[:] = jnp.zeros_like(qbd_ref)
    for h in range(hkv):
        qbd_ref[h * g:(h + 1) * g, h * dh:(h + 1) * dh] = (
            q_ref[0, h * g:(h + 1) * g, :].astype(compute_dtype))
    kk = k_ref[0, 0].astype(compute_dtype)           # [S, Hkv*Dh]
    att = jax.lax.dot_general(
        qbd_ref[:], kk, _TRANS_B,
        preferred_element_type=jnp.float32)          # [H, S]
    if quant:
        att = att * _expand_heads(ks_ref[0, 0].T, g)
    att = att * scale
    att = jnp.where(ok_ref[0] > 0, att, neg)
    att = jax.nn.softmax(att, axis=-1)
    if quant:
        att = att * _expand_heads(vs_ref[0, 0].T, g)
    vv = v_ref[0, 0].astype(compute_dtype)           # [S, Hkv*Dh]
    ctx = jax.lax.dot_general(
        att.astype(compute_dtype), vv, _STD,
        preferred_element_type=jnp.float32)          # [H, Hkv*Dh]
    for h in range(hkv):
        out_ref[0, h * g:(h + 1) * g, :] = (
            ctx[h * g:(h + 1) * g, h * dh:(h + 1) * dh])


def _expand_heads(s, groups: int):
    """[Hkv, S] per-kv-head rows -> [H, S] per-q-head rows."""
    if groups == 1:
        return s
    hkv, width = s.shape
    return jnp.broadcast_to(s[:, None, :], (hkv, groups, width)).reshape(
        hkv * groups, width)


def fused_ok(num_heads: int, num_kv_heads: int, head_dim: int,
             kplane: jnp.ndarray) -> bool:
    """Whether the fused kernel can serve this decode-attention call.

    Gates: env override, backend (Mosaic on tpu/axon; ``fused`` forces
    interpret elsewhere), lane-aligned head extraction (the kernel
    slices the context matrix at ``h*head_dim`` lane offsets), and the
    double-buffered K+V block fitting the VMEM budget (big-S continuous
    caches fall back to the XLA path rather than risk a Mosaic OOM).
    ``kplane`` is the folded cache plane ``[L, B, S, Hkv*Dh]``."""
    mode = os.environ.get("RAGROUTE_DECODE_ATTN", "auto")
    if mode == "xla":
        return False
    if mode != "fused" and jax.default_backend() not in ("tpu", "axon"):
        return False
    if head_dim % 128 or num_heads % num_kv_heads:
        return False
    s = kplane.shape[2]
    plane = s * num_kv_heads * head_dim * kplane.dtype.itemsize
    return 2 * 2 * plane <= _VMEM_BUDGET


@functools.partial(jax.jit,
                   static_argnames=("li", "num_kv_heads", "head_dim"))
def decode_attention(q, k, v, ok, *, li: int, num_kv_heads: int,
                     head_dim: int, k_scale=None,
                     v_scale=None) -> jnp.ndarray:
    """One-token GQA attention for layer ``li``, one HBM pass over the
    cache, ZERO cache copies: the whole folded plane is the operand and
    the layer is chosen by the block index map, so XLA never has to
    materialize a per-layer slice for the custom call (handing it
    ``k[li]`` instead costs a ~40 MB copy per layer per step at
    B=32/S=640 — measured, it erased the entire kernel win).

    Args:
      q: ``[B, H, Dh]`` query (compute dtype).
      k, v: ``[L, B, S, Hkv*Dh]`` folded cache planes — f32/bf16, or
        int8 codes (then ``k_scale``/``v_scale`` carry dequant scales).
      ok: ``[B, S]`` key-validity mask (bool or 0/1).
      k_scale, v_scale: ``[L, B, S, Hkv]`` f32 per-(position, head)
        scales for an int8 cache; applied to the score matrix (see
        module doc).

    Returns ``[B, H, Dh]`` f32 context.
    """
    b, h, dh = q.shape
    nl, _, s, hkvdh = k.shape
    hkv = num_kv_heads
    assert dh == head_dim and hkvdh == hkv * dh, (q.shape, k.shape)
    assert 0 <= li < nl
    groups = h // hkv
    quant = k_scale is not None
    on_tpu = jax.default_backend() in ("tpu", "axon")
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    ok3 = ok.astype(jnp.float32).reshape(b, 1, s)
    if not quant:  # placeholder operands keep the kernel arity static
        k_scale = jnp.zeros((1, b, 1, 1), jnp.float32)
        v_scale = k_scale
    ss, sh = k_scale.shape[2], k_scale.shape[3]

    kern = functools.partial(
        _kernel, hkv=hkv, groups=groups, head_dim=dh,
        scale=1.0 / (dh ** 0.5), quant=quant, compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, s, hkvdh), lambda i: (li, i, 0, 0)),
            pl.BlockSpec((1, 1, s, hkvdh), lambda i: (li, i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, ss, sh),
                         lambda i: (li if quant else 0, i, 0, 0)),
            pl.BlockSpec((1, 1, ss, sh),
                         lambda i: (li if quant else 0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, dh), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, dh), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, hkvdh), compute_dtype)],
        # the CPU test mesh has no Mosaic backend; interpret there
        interpret=not on_tpu,
    )(q, k, v, ok3, k_scale, v_scale)
    return out
