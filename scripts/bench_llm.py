"""Decode/prefill throughput of the pure-JAX decoder on the real chip.

Builds a registry-shaped decoder with RANDOM bf16 weights (weight values
don't affect speed; the image has no network to fetch real checkpoints)
and measures the jitted generate path the way this environment requires
(CLAUDE.md): the whole prefill+decode is ONE dispatch through the
tunnel, and timing brackets a host fetch of the output tokens.

Default shape = Qwen3-0.6B (the registry's smallest real serving
target: 28 layers, d=1024, 16/8 heads, head_dim 128, tied 151k vocab).

    python scripts/bench_llm.py [--batch 8] [--prompt 512] [--max-new 128]
    python scripts/bench_llm.py --sweep-batch 1 4 8 16

Speed-of-light reference: each decode step must stream every weight
byte from HBM once (batch ≪ the arithmetic-intensity knee), so
steps/s ≤ HBM_BW / param_bytes; tokens/s ≈ B × steps/s until the MXU
knee. The JSON line reports measured tokens/s next to that bound.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ragroute_tpu.llm.model import (DecoderConfig, generate,
                                    init_decoder_params)

QWEN3_06B = DecoderConfig(
    vocab_size=151936, hidden_size=1024, num_layers=28, num_heads=16,
    num_kv_heads=8, head_dim=128, intermediate_size=3072,
    rope_theta=1e6, qk_norm=True, tie_embeddings=True)

HBM_GBPS = 819.0  # v5e chip spec


def param_bytes(params):
    # itemsize covers packed int4 too: QuantW4 leaves are the packed
    # int8 [in/2, out] bytes plus the (small) group-scale tables
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def run_point(params, cfg, batch, prompt_len, max_new, reps,
              cache_dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    gen = jax.jit(lambda pr, i, m: generate(
        pr, cfg, i, m, max_new, eos_id=-1, pad_id=0, rng_seed=0,
        cache_dtype=cache_dtype)[0])

    def one():
        # distinct prompts every call (tunnel rule: bracket a host fetch)
        ids = jnp.asarray(rng.integers(
            1, cfg.vocab_size, (batch, prompt_len)), jnp.int32)
        mask = jnp.ones((batch, prompt_len), jnp.int32)
        t0 = time.perf_counter()
        np.asarray(gen(params, ids, mask))
        return time.perf_counter() - t0

    one()  # compile + warm
    times = [one() for _ in range(reps)]
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sweep-batch", type=int, nargs="*", default=None)
    ap.add_argument("--layers", type=int, default=None,
                    help="override layer count (smaller = faster compile)")
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 quantization (halves the "
                         "decode weight stream)")
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8 KV cache (per-(position,head) scales) — "
                         "halves the KV read stream that dominates "
                         "decode at large batch")
    ap.add_argument("--int4", action="store_true",
                    help="weight-only int4 quantization (group-128 "
                         "scales, Pallas dequant matmul — halves the "
                         "weight stream again over int8)")
    args = ap.parse_args()

    cfg = QWEN3_06B
    if args.layers:
        cfg = DecoderConfig(**{**cfg.__dict__, "num_layers": args.layers})
    params = init_decoder_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    if args.int8 or args.int4:
        from ragroute_tpu.llm.model import quantize_decoder_params

        params = quantize_decoder_params(
            params, cfg, bits=(4 if args.int4 else 8))
    pbytes = param_bytes(params)
    sol_steps = HBM_GBPS * 1e9 / pbytes  # decode steps/s bound

    batches = args.sweep_batch or [args.batch]
    rows = []
    for b in batches:
        # decode-dominated run and a prefill-only run to split the two
        cdt = "int8" if args.kv_int8 else jnp.bfloat16
        t_full = run_point(params, cfg, b, args.prompt, args.max_new,
                           args.reps, cache_dtype=cdt)
        t_pre = run_point(params, cfg, b, args.prompt, 1, args.reps,
                          cache_dtype=cdt)
        dec_s = max(t_full - t_pre, 1e-9)
        rows.append({
            "batch": b,
            "prefill_ms": round(t_pre * 1e3, 1),
            "decode_ms_per_step": round(dec_s / (args.max_new - 1) * 1e3, 3),
            "decode_tok_s": round(b * (args.max_new - 1) / dec_s, 1),
            "e2e_tok_s": round(b * args.max_new / t_full, 1),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)

    best = max(rows, key=lambda r: r["decode_tok_s"])
    print(json.dumps({
        "model": f"qwen3-0.6B-shape(L={cfg.num_layers})",
        "param_gb": round(pbytes / 2**30, 2),
        "prompt_len": args.prompt,
        "max_new": args.max_new,
        "rows": rows,
        "sol_decode_steps_s": round(sol_steps, 1),
        "best_decode_tok_s": best["decode_tok_s"],
        "sol_fraction": round(
            best["decode_tok_s"] / (best["batch"] * sol_steps), 3),
    }))


if __name__ == "__main__":
    main()
