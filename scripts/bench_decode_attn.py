"""A/B the fused decode-attention kernel variants against XLA on chip.

Isolates ONE layer's decode attention (B=32, S=640, Qwen3-0.6B heads,
int8 KV) and times it the way this environment requires (CLAUDE.md):
N iterations inside one jitted ``lax.scan`` over DISTINCT inputs, so
the 27 ms tunnel dispatch floor amortizes away.

Variants:
  xla     — the committed ``llm.model._attend`` einsum path on the
            head-form ``[B, S, Hkv, Dh]`` plane.
  folded  — ``ops.decode_attention`` on a folded ``[L, B, S, Hkv*Dh]``
            plane (storage-layout change).
  head    — the kernel reading the head-form plane and folding
            in-register (no storage-layout change anywhere).

    python scripts/bench_decode_attn.py [--iters 50] [--seq 640]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ragroute_tpu.llm.model import DecoderConfig, _attend, quant_kv

B, HKV, H, DH = 32, 8, 16, 128


def _mk(seq, layers):
    cfg = DecoderConfig(vocab_size=64, hidden_size=H * DH,
                        num_layers=layers, num_heads=H, num_kv_heads=HKV,
                        head_dim=DH, intermediate_size=64)
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (B, 1, H, DH), jnp.bfloat16)
    k = jax.random.normal(kk, (layers, B, seq, HKV, DH), jnp.float32)
    v = jax.random.normal(kv, (layers, B, seq, HKV, DH), jnp.float32)
    kq8, ks = quant_kv(k)
    vq8, vs = quant_kv(v)
    kmask = jnp.ones((B, 1, seq), bool)
    return cfg, q, kq8, ks, vq8, vs, kmask


def timed(fn, q, iters):
    """Differential timing: the 27 ms tunnel dispatch floor rides on
    EVERY host-observed call, so one scan of N iters measures
    floor + N·t. Run two scans (N and 5N) and difference them — the
    floor (and any loop-invariant setup XLA hoists) cancels."""

    def run_n(n):
        @jax.jit
        def run(q0):
            def body(c, i):
                qi = q0 + (i.astype(jnp.bfloat16) * 1e-3)
                return c + fn(qi).astype(jnp.float32).sum(), ()

            tot, _ = jax.lax.scan(body, 0.0, jnp.arange(n))
            return tot

        float(run(q))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(q))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_small, t_big = run_n(iters), run_n(5 * iters)
    return (t_big - t_small) / (4 * iters) * 1e6  # us/call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--seq", type=int, default=640)
    ap.add_argument("--layers", type=int, default=2)
    args = ap.parse_args()
    cfg, q, k8, ks, v8, vs, kmask = _mk(args.seq, args.layers)
    li = args.layers - 1
    out = {}

    out["xla_us"] = timed(
        lambda qi: _attend(qi, k8[li], v8[li], kmask, cfg,
                           k_scale=ks[li], v_scale=vs[li]), q, args.iters)

    from ragroute_tpu.ops import decode_attention as da

    fold = lambda a: a.reshape(*a.shape[:-2], -1)  # noqa: E731
    kf, vf = fold(k8), fold(v8)
    out["folded_us"] = timed(
        lambda qi: da.decode_attention(
            qi[:, 0], kf, vf, kmask[:, 0], li=li, num_kv_heads=HKV,
            head_dim=DH, k_scale=ks, v_scale=vs), q, args.iters)

    if hasattr(da, "decode_attention_headform"):
        out["head_us"] = timed(
            lambda qi: da.decode_attention_headform(
                qi[:, 0], k8, v8, kmask[:, 0], li=li, num_kv_heads=HKV,
                head_dim=DH, k_scale=ks, v_scale=vs), q, args.iters)

    bytes_layer = 2 * (B * args.seq * HKV * DH + B * args.seq * HKV * 4)
    out["hbm_floor_us"] = bytes_layer / 819e9 * 1e6
    print({k: round(v, 2) for k, v in out.items()})


if __name__ == "__main__":
    main()
