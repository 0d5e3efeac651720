"""Where does prefill time go? On-chip decomposition.

Prefill at B=32/P=512 on the Qwen3-0.6B shape measures ~221 ms net of
the tunnel floor — ~40% MFU against the ~90 ms matmul floor; the
P-scaling sweep and the per-layer attention A/B
(`bench_prefill_attn.py`) attribute the superlinear excess to the
attention stage, which itself is within ~2.5× of its own FLOP+traffic
floor and beats both shipped Pallas flash kernels (see BENCHMARKS.md
"the PREFILL attention axis"). Variants:

  body        — transformer layers only (no cache stack/write/quant,
                no final logits)
  logits      — body + the last-position vocab head
  prefill_bf16/prefill_int8 — the shipped ``llm.model.prefill``
                (cache fill; int8 adds quant_kv)

NOTE: wrapping the 28-layer prefill in a long `lax.scan` for the
differential harness overflows the remote-compile service on this
backend — so this script times single dispatches and subtracts the
measured floor (adequate at ~200 ms/call; see ``timed_floor``).

    python scripts/bench_prefill.py [--batch 32] [--prompt 512]
"""

import argparse
import time
import sys

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ragroute_tpu.llm.model import (DecoderConfig, _attend, _dot,
                                    _embed_lookup, _inv_freq, _logits,
                                    _mlp, _qkv, _rms, init_cache,
                                    init_decoder_params, prefill)


def timed_floor(fn, args_fn, reps, floor_s):
    """Single-dispatch timing minus the measured tunnel floor. The
    scan-differencing harness (bench_decode_attn.timed) is the right
    tool for µs-scale ops, but wrapping a 28-layer prefill in a long
    scan overflows the remote-compile service; at ~200 ms/call a
    direct measurement minus the ~23-27 ms floor is accurate to a few
    percent."""
    import numpy as np

    jfn = jax.jit(fn)
    np.asarray(jfn(*args_fn()))  # compile + warm
    ts = []
    for _ in range(reps):
        a = args_fn()
        t0 = time.perf_counter()
        np.asarray(jfn(*a))
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - floor_s, 0.0)


def measure_floor():
    import numpy as np
    x = jnp.ones((8, 128))
    f = jax.jit(lambda a: (a * 2).sum())
    float(f(x))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

QWEN3_06B = DecoderConfig(
    vocab_size=151936, hidden_size=1024, num_layers=28, num_heads=16,
    num_kv_heads=8, head_dim=128, intermediate_size=3072,
    rope_theta=1e6, qk_norm=True, tie_embeddings=True)


def _body(params, cfg, input_ids, attention_mask, with_logits):
    b, p = input_ids.shape
    inv_freq = jnp.asarray(_inv_freq(cfg))
    mask = attention_mask.astype(jnp.int32)
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
    causal = jnp.tril(jnp.ones((p, p), bool))
    kmask = causal[None] & (mask[:, None, :] > 0)
    h = _embed_lookup(params, input_ids)
    for layer in params["layers"]:
        x = _rms(h, layer["ln1"], cfg.rms_eps)
        q, k, v = _qkv(layer, cfg, x, positions, inv_freq)
        h = h + _dot(_attend(q, k, v, kmask, cfg), layer["wo"])
        h = h + _mlp(layer, _rms(h, layer["ln2"], cfg.rms_eps))
    if with_logits:
        return _logits(params, cfg, h[:, -1:])[:, 0]
    return h[:, -1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated variant subset "
                         "(body,logits,prefill_bf16,prefill_int8)")
    args = ap.parse_args()
    cfg = QWEN3_06B
    if args.layers:
        cfg = DecoderConfig(**{**cfg.__dict__, "num_layers": args.layers})
    params = init_decoder_params(jax.random.key(0), cfg,
                                 dtype=jnp.bfloat16)
    b, p = args.batch, args.prompt
    mask = jnp.ones((b, p), jnp.int32)
    import numpy as np
    rng = np.random.default_rng(0)

    def fresh_ids():
        return (jnp.asarray(rng.integers(1, cfg.vocab_size, (b, p)),
                            jnp.int32),)

    floor = measure_floor()
    variants = {
        "body": lambda: timed_floor(
            lambda i: _body(params, cfg, i, mask, False), fresh_ids,
            args.iters, floor) * 1e3,
        "logits": lambda: timed_floor(
            lambda i: _body(params, cfg, i, mask, True), fresh_ids,
            args.iters, floor) * 1e3,
    }
    for tag, cdt in (("bf16", jnp.bfloat16), ("int8", "int8")):
        cache = init_cache(cfg, b, p + 128, cdt)
        variants[f"prefill_{tag}"] = (
            lambda cache=cache: timed_floor(
                lambda i: prefill(params, cfg, i, mask,
                                  {k: v for k, v in cache.items()})[0],
                fresh_ids, args.iters, floor) * 1e3)

    out = {"floor_ms": floor * 1e3}
    for name in (args.only.split(",") if args.only else variants):
        out[f"{name}_ms"] = variants[name]()

    toks = b * p
    flops = 2 * sum(x.size for x in jax.tree.leaves(params["layers"])
                    ) * toks
    out["matmul_floor_ms"] = flops / 197e12 * 1e3
    print({k: round(v, 2) for k, v in out.items()})


if __name__ == "__main__":
    main()
