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

from ragroute_tpu.llm.model import (DecoderConfig, QuantW, QuantW4,
                                    _int4_group, generate,
                                    init_decoder_params)

QWEN3_06B = DecoderConfig(
    vocab_size=151936, hidden_size=1024, num_layers=28, num_heads=16,
    num_kv_heads=8, head_dim=128, intermediate_size=3072,
    rope_theta=1e6, qk_norm=True, tie_embeddings=True)

# the two 8B-class registry targets (config.py LLM_MODELS; shapes pinned
# from the HF configs the reference serves through Ollama)
QWEN3_8B = DecoderConfig(
    vocab_size=151936, hidden_size=4096, num_layers=36, num_heads=32,
    num_kv_heads=8, head_dim=128, intermediate_size=12288,
    rope_theta=1e6, qk_norm=True, tie_embeddings=False)
LLAMA31_8B = DecoderConfig(
    vocab_size=128256, hidden_size=4096, num_layers=32, num_heads=32,
    num_kv_heads=8, head_dim=128, intermediate_size=14336,
    rope_theta=500000.0, rope_scaling=(8.0, 1.0, 4.0, 8192))

SHAPES = {"qwen3-0.6b": QWEN3_06B, "qwen3-8b": QWEN3_8B,
          "llama31-8b": LLAMA31_8B}

HBM_GBPS = 819.0  # v5e chip spec


def random_quant_params(cfg: DecoderConfig, bits: int,
                        group: int = 128) -> dict:
    """Random already-quantized weights, built leaf-by-leaf on the host
    and shipped straight to the device. The bf16 master of an 8B model
    (16.4 GB) does not fit v5e HBM, and random VALUES don't affect
    speed — so for the 8B-shape benches we synthesize the quantized
    form directly: random int8 codes (any byte is a valid nibble pair)
    with constant scales sized so activations stay O(1)
    (codes ~U[-127,127] have std ≈73; scale = 1/(73·sqrt(in)) recovers
    the 1/sqrt(in) init std). Mirrors quantize_decoder_params' layout
    exactly (per-channel int8 / group-wise packed int4, embed head-form
    for int4)."""
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    def q8(in_dim, out_dim, scale_axis_len=None):
        codes = rng.integers(-127, 128, (in_dim, out_dim), np.int8)
        scale = np.full((scale_axis_len or out_dim,),
                        1.0 / (73.0 * in_dim ** 0.5), np.float32)
        return QuantW(jax.device_put(codes, dev),
                      jax.device_put(scale, dev))

    def q4(in_dim, out_dim):
        g = _int4_group(in_dim, group)
        codes = rng.integers(-128, 128, (in_dim // 2, out_dim), np.int8)
        scale = np.full((in_dim // g, out_dim),
                        1.0 / (7.5 * in_dim ** 0.5), np.float32)
        return QuantW4(jax.device_put(codes, dev),
                       jax.device_put(scale, dev))

    qmat = (lambda i, o: q8(i, o)) if bits == 8 else q4
    d, v = cfg.hidden_size, cfg.vocab_size
    if bits == 8:
        # [V, D] with per-ROW scales (axis=1), like quantize(axis=1)
        codes = rng.integers(-127, 128, (v, d), np.int8)
        scale = np.full((v,), 0.02 / 73.0, np.float32)
        embed = QuantW(jax.device_put(codes, dev),
                       jax.device_put(scale, dev))
    else:
        embed = q4(d, v)  # head-form [D/2, V]
    params = {"embed": embed,
              "ln_f": jax.device_put(np.ones((d,), "bfloat16"), dev),
              "layers": []}
    if not cfg.tie_embeddings:
        params["lm_head"] = qmat(d, v)
    ones = lambda n: jax.device_put(np.ones((n,), "bfloat16"), dev)
    for _ in range(cfg.num_layers):
        layer = {
            "ln1": ones(d), "ln2": ones(d),
            "wq": qmat(d, cfg.q_dim), "wk": qmat(d, cfg.kv_dim),
            "wv": qmat(d, cfg.kv_dim), "wo": qmat(cfg.q_dim, d),
            "gate": qmat(d, cfg.intermediate_size),
            "up": qmat(d, cfg.intermediate_size),
            "down": qmat(cfg.intermediate_size, d),
        }
        if cfg.qk_norm:
            layer["q_norm"] = ones(cfg.head_dim)
            layer["k_norm"] = ones(cfg.head_dim)
        params["layers"].append(layer)
    return params


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
    ap.add_argument("--model", choices=sorted(SHAPES), default="qwen3-0.6b",
                    help="registry shape to bench; the 8B shapes "
                         "require --int8 or --int4 (a bf16 8B master "
                         "exceeds v5e HBM) and build random quantized "
                         "weights directly (see random_quant_params)")
    args = ap.parse_args()

    cfg = SHAPES[args.model]
    if args.layers:
        cfg = DecoderConfig(**{**cfg.__dict__, "num_layers": args.layers})
    big = cfg.hidden_size > 2048
    if big and not (args.int8 or args.int4):
        ap.error(f"--model {args.model} needs --int8 or --int4 "
                 "(bf16 master exceeds v5e HBM)")
    if big:
        params = random_quant_params(cfg, bits=(4 if args.int4 else 8))
    else:
        params = init_decoder_params(jax.random.key(0), cfg,
                                     dtype=jnp.bfloat16)
    if (args.int8 or args.int4) and not big:
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
        "model": f"{args.model}-shape(L={cfg.num_layers})",
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
