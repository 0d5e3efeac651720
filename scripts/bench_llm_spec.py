"""Speculative-decode mechanics on the real chip: cost ratio + ceiling.

Prompt-lookup speedup = E[tokens per verify step] / (verify-step cost /
plain-step cost). Acceptance depends on the checkpoint and workload
(RAG answers quoting context accept heavily; see the prompt-lookup /
LLMA literature), so this harness measures the two MECHANICAL numbers
on the qwen3-0.6B-shaped decoder:

* cost ratio: wall time of a spec chunk (window W) vs a plain chunk,
  same slots, same steps — the price of verifying W tokens at once;
* full-acceptance ceiling: tokens/s with a degenerate always-copy
  model (every verify commits its whole window) vs plain decode.

    python scripts/bench_llm_spec.py [--layers 28] [--slots 4]
        [--windows 4 8] [--steps 32]
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

from ragroute_tpu.llm.continuous import admit, decode_chunk
from ragroute_tpu.llm.model import (DecoderConfig, init_cache,
                                    init_decoder_params)
from ragroute_tpu.llm.speculative import spec_decode_chunk


def fresh_state(cfg, slots, cache_len, params, prompt_len=64):
    cache = init_cache(cfg, slots, cache_len, jnp.bfloat16)
    state = (cache, jnp.zeros((slots,), jnp.int32),
             jnp.zeros((slots,), jnp.int32), jnp.zeros((slots,), bool),
             jnp.zeros((slots,), jnp.int32), jnp.zeros((), jnp.int32),
             jnp.zeros((slots, cache_len), jnp.int32))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size,
                                   (slots, prompt_len)), jnp.int32)
    lens = jnp.full((slots,), prompt_len, jnp.int32)
    state, _ = jax.jit(
        lambda p, s: admit(p, cfg, s, ids, lens,
                           jnp.arange(slots, dtype=jnp.int32),
                           jnp.full((slots,), 10 ** 6, jnp.int32),
                           0.0, -1, 0))(params, state)
    return state


def timed(fn, params, state, reps):
    state, *out = fn(params, state)          # compile + warm
    jax.tree.map(np.asarray, out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, *out = fn(params, state)
        jax.tree.map(np.asarray, out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), state, out


def copying_params(cfg, c=42):
    params = init_decoder_params(jax.random.key(0), cfg, jnp.bfloat16)
    head = jnp.zeros((cfg.hidden_size, cfg.vocab_size), jnp.bfloat16)
    return {
        "embed": jnp.ones_like(params["embed"]),
        "ln_f": params["ln_f"],
        "layers": jax.tree.map(jnp.zeros_like, params["layers"]),
        "lm_head": head.at[:, c].set(1.0),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--windows", type=int, nargs="+", default=[4, 8])
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cache-len", type=int, default=1024)
    args = ap.parse_args()

    from scripts.bench_llm import QWEN3_06B

    cfg = DecoderConfig(**{**QWEN3_06B.__dict__,
                           "num_layers": args.layers,
                           "tie_embeddings": False})
    rnd = init_decoder_params(jax.random.key(0), cfg, jnp.bfloat16)
    cpy = copying_params(cfg)

    plain = jax.jit(lambda p, s: decode_chunk(
        p, cfg, s, args.steps, 0.0, -1, 0), donate_argnums=(1,))
    t_plain, _, _ = timed(plain, rnd, fresh_state(
        cfg, args.slots, args.cache_len, rnd), args.reps)
    plain_tok_s = args.slots * args.steps / t_plain
    report = {
        "model": f"qwen3-0.6B-shape(L={cfg.num_layers})",
        "slots": args.slots, "chunk_steps": args.steps,
        "plain_ms_per_step": round(t_plain / args.steps * 1e3, 3),
        "plain_tok_s": round(plain_tok_s, 1),
        "windows": {},
    }
    for w in args.windows:
        spec = jax.jit(lambda p, s, w=w: spec_decode_chunk(
            p, cfg, s, args.steps, w, -1, 0), donate_argnums=(1,))
        t_spec, _, _ = timed(spec, rnd, fresh_state(
            cfg, args.slots, args.cache_len, rnd), args.reps)
        # ceiling: copying model commits the full window every step
        _, _, out = timed(spec, cpy, fresh_state(
            cfg, args.slots, args.cache_len, cpy), args.reps)
        n_emit = np.asarray(out[1])
        cost = t_spec / t_plain
        mean_emit = float(n_emit.mean())
        report["windows"][w] = {
            "verify_cost_ratio": round(cost, 3),
            "breakeven_accept": round(cost, 2),
            "ceiling_mean_emit": round(mean_emit, 2),
            "ceiling_tok_s": round(
                args.slots * args.steps * mean_emit / t_spec, 1),
            "ceiling_speedup": round(mean_emit / cost, 2),
        }
        print(json.dumps({"window": w, **report["windows"][w]}),
              file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
