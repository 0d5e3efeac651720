"""Fused decode-attention kernel vs the XLA ``_attend`` reference.

The kernel (``ops/decode_attention``) is a REFUTED design kept as the
measured record closing the decode-attention axis (see its module
doc); it serves no engine. These gates still pin it — in interpret
mode on the CPU test mesh — against the exact ``llm.model._attend``
math (same score-scale folding, mask semantics, softmax), so the
recorded A/B numbers stay attached to a provably-equivalent kernel
and any future revival starts from a correct base. The kernel reads a
FOLDED ``[L, B, S, Hkv*Dh]`` plane with the layer baked into its
index map; layer selection is gated too.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ragroute_tpu.llm.model import DecoderConfig, _attend, quant_kv
from ragroute_tpu.ops.decode_attention import decode_attention, fused_ok


def _cfg(h=4, hkv=2, dh=128, layers=2):
    return DecoderConfig(
        vocab_size=64, hidden_size=h * dh, num_layers=layers, num_heads=h,
        num_kv_heads=hkv, head_dim=dh, intermediate_size=32)


def _rand(key, b=3, s=256, h=4, hkv=2, dh=128, layers=2):
    kq, kk, kv, km = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, 1, h, dh), jnp.float32)
    k = jax.random.normal(kk, (layers, b, s, hkv, dh), jnp.float32)
    v = jax.random.normal(kv, (layers, b, s, hkv, dh), jnp.float32)
    # ragged validity: row i attends [start_i, end_i] with end >= start
    start = jax.random.randint(km, (b,), 0, s // 2)
    end = start + jax.random.randint(jax.random.fold_in(km, 1),
                                     (b,), 1, s // 2)
    iota = jnp.arange(s)
    kmask = ((iota[None] >= start[:, None])
             & (iota[None] <= end[:, None]))[:, None, :]
    return q, k, v, kmask


def _fold(x):
    return x.reshape(*x.shape[:-2], -1)


def test_fused_matches_xla_f32_per_layer():
    cfg = _cfg()
    q, k, v, kmask = _rand(jax.random.key(0))
    for li in range(2):
        ref = _attend(q, k[li], v[li], kmask, cfg)
        got = decode_attention(q[:, 0], _fold(k), _fold(v), kmask[:, 0],
                               li=li, num_kv_heads=cfg.num_kv_heads,
                               head_dim=cfg.head_dim)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref[:, 0].reshape(got.shape)),
            rtol=1e-5, atol=1e-5)


def test_fused_matches_xla_int8_scales():
    cfg = _cfg(h=8, hkv=2)
    q, k, v, kmask = _rand(jax.random.key(1), h=8, hkv=2)
    kq, ks = quant_kv(k)
    vq, vs = quant_kv(v)
    ref = _attend(q, kq[1], vq[1], kmask, cfg, k_scale=ks[1],
                  v_scale=vs[1])
    got = decode_attention(q[:, 0], _fold(kq), _fold(vq), kmask[:, 0],
                           li=1, num_kv_heads=cfg.num_kv_heads,
                           head_dim=cfg.head_dim, k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref[:, 0].reshape(got.shape)),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_xla_mha():
    # Hkv == H (no grouping) exercises groups == 1
    cfg = _cfg(h=2, hkv=2)
    q, k, v, kmask = _rand(jax.random.key(2), h=2, hkv=2)
    ref = _attend(q, k[0], v[0], kmask, cfg)
    got = decode_attention(q[:, 0], _fold(k), _fold(v), kmask[:, 0],
                           li=0, num_kv_heads=cfg.num_kv_heads,
                           head_dim=cfg.head_dim)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref[:, 0].reshape(got.shape)),
                               rtol=1e-5, atol=1e-5)


def test_fused_single_valid_key():
    # degenerate mask: exactly one attendable key -> ctx == that value row
    b, s = 2, 128
    k = jax.random.normal(jax.random.key(4), (1, b, s, 2, 128),
                          jnp.float32)
    v = jax.random.normal(jax.random.key(5), (1, b, s, 2, 128),
                          jnp.float32)
    q = jax.random.normal(jax.random.key(3), (b, 4, 128), jnp.float32)
    ok = jnp.broadcast_to(jnp.arange(s)[None] == 7, (b, s))
    got = decode_attention(q, _fold(k), _fold(v), ok, li=0,
                           num_kv_heads=2, head_dim=128)
    want = jnp.repeat(v[0, :, 7], 2, axis=-2).reshape(b, 4, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_ok_gates():
    k8 = jnp.zeros((2, 2, 64, 2 * 128), jnp.int8)
    # off-backend default: xla path unless forced
    if jax.default_backend() not in ("tpu", "axon"):
        assert not fused_ok(4, 2, 128, k8)
    os.environ["RAGROUTE_DECODE_ATTN"] = "fused"
    try:
        assert fused_ok(4, 2, 128, k8)
        # lane-misaligned head_dim and oversized S fall back
        assert not fused_ok(4, 2, 64, jnp.zeros((2, 2, 64, 128),
                                                jnp.int8))
        big = jnp.zeros((1, 1, 8192, 8 * 128), jnp.float32)
        assert not fused_ok(8, 8, 128, big)
        os.environ["RAGROUTE_DECODE_ATTN"] = "xla"
        assert not fused_ok(4, 2, 128, k8)
    finally:
        del os.environ["RAGROUTE_DECODE_ATTN"]
