"""A/B prefill attention: XLA ``_attend`` vs the TPU flash kernel.

Prefill at B=32/P=512 measures ~221 ms net of the tunnel floor against
a ~90 ms matmul floor, and the P-scaling sweep (prefill 27.6 / 91 /
221 ms at P=128/256/512, `scripts/bench_llm.py --max-new 2`) shows the
excess is superlinear — the attention stage. This harness times ONE
layer's prefill attention three ways on the real chip, with the
pad semantics the engine needs (pads excluded via SegmentIds; causal
within the row): the XLA ``_attend`` einsum, the shipped
``pallas.ops.tpu.flash_attention`` (online softmax, K/V broadcast to
H heads), and ``splash_attention`` (MQA kernel, vmapped over B×Hkv).

MEASURED VERDICT (see BENCHMARKS.md "the PREFILL attention axis"):
XLA wins at every point — 2.43 / 9.10 ms per layer at (P=512,B=32) /
(P=2048,B=8) vs flash 3.78 / 11.68 and splash 4.09 / 13.35. The flash
kernels save only the ~0.5-1 GB materialized score tensor but pay
``[B,P,H,Dh] → [B,H,P,Dh]`` transposes + the GQA K/V broadcast, a net
loss on this engine's token-major activations. Axis closed; harness
kept for re-measurement if the activation layout ever changes.
(The splash variant's output also mismatches — its vmap mapping was
never debugged past the point of being measurably slower.)

    python scripts/bench_prefill_attn.py [--prompt 512] [--batch 32]
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

from ragroute_tpu.llm.model import DecoderConfig, _attend

B, HKV, H, DH = 32, 8, 16, 128


def timed(fn, x, iters=20):
    """Differential scan timing (see bench_decode_attn.timed)."""

    def run_n(n):
        @jax.jit
        def run(x0):
            def body(c, i):
                xi = x0 + (i.astype(x0.dtype) * 1e-3)
                return c + fn(xi).astype(jnp.float32).sum(), ()

            tot, _ = jax.lax.scan(body, 0.0, jnp.arange(n))
            return tot

        float(run(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t5 = run_n(iters), run_n(5 * iters)
    return (t5 - t1) / (4 * iters) * 1e3  # ms/call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--batch", type=int, default=B)
    args = ap.parse_args()
    b, p = args.batch, args.prompt
    cfg = DecoderConfig(vocab_size=64, hidden_size=H * DH, num_layers=1,
                        num_heads=H, num_kv_heads=HKV, head_dim=DH,
                        intermediate_size=64)
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (b, p, H, DH), jnp.bfloat16)
    k = jax.random.normal(kk, (b, p, HKV, DH), jnp.bfloat16)
    v = jax.random.normal(kv, (b, p, HKV, DH), jnp.bfloat16)
    # left-padded rows: row i has lens[i] real tokens at the END
    lens = jnp.asarray(
        np.random.default_rng(0).integers(p // 2, p + 1, (b,)))
    valid = jnp.arange(p)[None] >= (p - lens[:, None])  # [B, P]
    causal = jnp.tril(jnp.ones((p, p), bool))
    kmask = causal[None] & valid[:, None, :]

    out = {}
    out["xla_ms"] = timed(
        lambda qi: _attend(qi, k, v, kmask, cfg), q)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    groups = H // HKV
    seg = valid.astype(jnp.int32)  # pads = 0, real = 1
    sids = SegmentIds(q=seg, kv=seg)

    def flash(qi):
        qh = qi.transpose(0, 2, 1, 3)                       # [B,H,P,D]
        kh = jnp.repeat(k.transpose(0, 2, 1, 3), groups, 1)  # [B,H,P,D]
        vh = jnp.repeat(v.transpose(0, 2, 1, 3), groups, 1)
        o = flash_attention(qh, kh, vh, segment_ids=sids, causal=True,
                            sm_scale=1.0 / (DH ** 0.5))
        return o.transpose(0, 2, 1, 3)                      # [B,P,H,D]

    out["flash_ms"] = timed(flash, q)

    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)

    mask = sm.MultiHeadMask([sm.CausalMask((p, p)) for _ in range(groups)])
    kernel = sk.make_splash_mqa_single_device(mask=mask)
    ssids = sk.SegmentIds(q=seg, kv=seg)
    # kernel wants q [G, P, D]; k, v [P, D]; vmap over kv-heads then batch
    per_head = jax.vmap(kernel, in_axes=(0, 0, 0, None))
    per_batch = jax.vmap(per_head, in_axes=(0, 0, 0, 0))

    def splash(qi):
        qg = qi.reshape(b, p, HKV, groups, DH).transpose(0, 2, 3, 1, 4)
        kh = k.transpose(0, 2, 1, 3)   # [B, Hkv, P, D]
        vh = v.transpose(0, 2, 1, 3)
        o = per_batch(qg, kh, vh, ssids)      # [B, Hkv, G, P, D]
        return o.transpose(0, 3, 1, 2, 4).reshape(b, p, H, DH)

    out["splash_ms"] = timed(splash, q)
    refs = _attend(q, k, v, kmask, cfg).reshape(b, p, H, DH)
    ds = jnp.abs(refs.astype(jnp.float32) - splash(q).astype(jnp.float32))
    ds = jnp.where(valid[:, :, None, None], ds, 0.0)
    out["splash_max_abs_diff"] = float(ds.max())

    # exactness on the valid positions (pad-q rows differ; engine
    # discards them)
    ref = _attend(q, k, v, kmask, cfg).reshape(b, p, H, DH)
    got = flash(q)
    d = jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))
    d = jnp.where(valid[:, :, None, None], d, 0.0)
    out["max_abs_diff_valid"] = float(d.max())
    print({kk_: round(vv, 4) for kk_, vv in out.items()})


if __name__ == "__main__":
    main()
