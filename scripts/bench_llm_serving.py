"""Lockstep vs continuous-batching generation serving under staggered load.

Drives both GenerationService (decode-to-completion micro-batches) and
ContinuousGenerationService (slot-based, requests join at chunk
boundaries) with the same Poisson-ish arrival pattern on the
qwen3-0.6B-shaped bf16 decoder (random weights), and reports per-request
latency percentiles. The interesting number is the LATE-ARRIVAL penalty:
under lockstep, a request that lands just after a batch starts waits out
that batch's whole decode; under continuous batching it waits at most
one chunk.

    python scripts/bench_llm_serving.py [--requests 12] [--gap-ms 120]
        [--max-new 192] [--layers 28]

Tunnel note: each decode chunk is one dispatch (~27 ms floor through
the remote-TPU tunnel), so chunked decode pays floor*chunks overhead
that a colocated host would not; --chunk-steps trades that against join
latency. Numbers below in BENCHMARKS.md were taken at chunk=32.
"""

import argparse
import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
# no egress in this environment: without these the first tokenizer load
# burns ~minutes in huggingface_hub connect retries before falling back
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax.numpy as jnp
import numpy as np

import jax

from ragroute_tpu.llm.continuous import ContinuousGenerationService
from ragroute_tpu.llm.model import DecoderConfig, init_decoder_params
from ragroute_tpu.llm.service import ByteTokenizer, GenerationService


def build(args):
    from scripts.bench_llm import QWEN3_06B  # reuse the registry shape

    cfg = QWEN3_06B
    if args.layers:
        cfg = DecoderConfig(**{**cfg.__dict__, "num_layers": args.layers})
    params = init_decoder_params(jax.random.key(0), cfg,
                                 dtype=jnp.bfloat16)
    return params, cfg


async def drive(svc, n, gap_s, warm_burst, msgs_fn=None):
    if msgs_fn is None:
        def msgs_fn(i):
            return [{"role": "user", "content": f"request {i} " * 4}]
    # warm EVERY compile bucket outside the measured window: bursts of
    # each batch/admit bucket size (a cold bucket mid-run costs seconds
    # of XLA compile and poisons the latency percentiles)
    for burst in sorted({1, 2, warm_burst}):
        await asyncio.gather(*[
            svc.chat(msgs_fn(i)) for i in range(burst)])
    warm_toks = svc.generated_tokens
    lats = []
    # realistic answer-length spread: most answers are short, some run to
    # the cap — THE case continuous batching exists for (lockstep holds
    # every row of a batch until its longest member finishes)
    rng = np.random.default_rng(0)
    lengths = rng.integers(8, svc.max_new_tokens + 1, n)

    async def one(i):
        await asyncio.sleep(i * gap_s)
        t0 = time.perf_counter()
        await svc.chat(msgs_fn(i), max_new=int(lengths[i]))
        lats.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    await asyncio.gather(*[one(i) for i in range(n)])
    wall = time.perf_counter() - t0
    await svc.stop()
    a = np.sort(lats)
    return {
        "p50_ms": round(float(a[len(a) // 2]) * 1e3, 1),
        "p95_ms": round(float(a[int(len(a) * 0.95) - 1]) * 1e3, 1),
        "max_ms": round(float(a[-1]) * 1e3, 1),
        "wall_s": round(wall, 2),
        "tok_s": round((svc.generated_tokens - warm_toks) / wall, 1),
    }


def run_everything(args):
    """The everything-on composition table (round-5 VERDICT item #6).

    Continuous serving at the Qwen3-8B shape with int4 weights
    (random codes — value-independent speed, scripts/bench_llm.py's
    argument), staggered load, REAL MedRAG serving prompts whose gold
    answers quote a retrieved document (the prompt-lookup regime).
    Rows ablate shared-prefix KV, speculation W in {4, 8}, and int8 KV
    — each previously measured alone; the point is their COMPOSITION.

    Speculation semantics with random weights: greedy outputs are not
    quote-continuations, so acceptance sits near the 1-token floor and
    the spec rows price the VERIFY OVERHEAD inside the composition
    (the real-acceptance speedup number lives in
    bench_llm_spec_real.py's trained-checkpoint harness — run both).
    """
    from scripts.bench_llm import SHAPES, random_quant_params
    from ragroute_tpu.engine.prompts import generate_llm_message
    from ragroute_tpu.index.synthetic import make_synthetic_world
    from ragroute_tpu.llm.continuous import shared_prefix_ids

    registry_name = {"qwen3-8b": "qwen3-8B",
                     "llama31-8b": "llama3.1-8B-instruct"}[args.shape]
    cfg = SHAPES[args.shape]
    if args.layers:
        cfg = DecoderConfig(**{**cfg.__dict__, "num_layers": args.layers})
    params = random_quant_params(cfg, bits=4)
    tok = ByteTokenizer()
    gap = args.gap_ms / 1e3

    # held-out quoting prompts: the SAME builder the serving path uses,
    # answers quote one retrieved doc (bench_llm_spec_real's corpus
    # recipe, eval split)
    syn = make_synthetic_world("medrag", docs_per_source=64,
                               num_queries=args.requests + 2, seed=11)
    payloads = [p for src in syn.world.sources
                for p in syn.doc_payloads[src.name]]
    rng = np.random.default_rng(11)
    prompts = []
    for q in syn.questions:
        docs = [payloads[rng.integers(0, len(payloads))]
                for _ in range(2)]
        msgs, _ = generate_llm_message(
            "medrag", q["question"], docs, q["options"],
            registry_name)
        prompts.append(msgs)
    sys_txt = prompts[0][0]["content"] if prompts[0][0][
        "role"] == "system" else None
    pre = shared_prefix_ids(tok, sys_txt) if sys_txt else []

    def msgs_fn(i):
        return prompts[i % len(prompts)]

    rows = [
        ("continuous", {}),
        ("prefix", dict(prefix=True)),
        ("spec4", dict(spec=4)),
        ("int8kv", dict(kv=True)),
        ("prefix_spec4_int8kv", dict(prefix=True, spec=4, kv=True)),
        ("prefix_spec8_int8kv", dict(prefix=True, spec=8, kv=True)),
    ]
    out = {"model": f"{args.shape}-shape(L={cfg.num_layers}, "
                    "int4 weights)",
           "requests": args.requests, "gap_ms": args.gap_ms,
           "max_new": args.max_new, "chunk_steps": args.chunk_steps,
           "slots": args.slots, "prefix_tokens": len(pre),
           "rows": {}}
    prompt_bucket = 1024
    for name, feat in rows:
        svc = ContinuousGenerationService(
            params, cfg, tok, slots=args.slots,
            prompt_buckets=(prompt_bucket,),
            cache_len=prompt_bucket + (len(pre) if not feat.get("prefix")
                                       else 0) + args.max_new + 32,
            chunk_steps=args.chunk_steps,
            cache_dtype=("int8" if feat.get("kv") else jnp.bfloat16),
            spec_window=feat.get("spec", 0),
            prefix_ids=(pre if feat.get("prefix") else None),
            max_new_tokens=args.max_new,
            eos_id=tok.eos_id, pad_id=tok.pad_id)
        res = asyncio.run(drive(svc, args.requests, gap, args.slots,
                                msgs_fn=msgs_fn))
        if feat.get("spec") and svc.spec_steps:
            res["accept_tok_per_step"] = round(
                svc.spec_emitted / svc.spec_steps, 3)
        out["rows"][name] = res
        print(f"  {name}: {res}", file=sys.stderr, flush=True)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--gap-ms", type=float, default=120.0)
    ap.add_argument("--max-new", type=int, default=192)
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--chunk-steps", type=int, default=32)
    ap.add_argument("--shape", type=str, default="qwen3-8b",
                    choices=["qwen3-8b", "llama31-8b"],
                    help="registry shape for --everything")
    ap.add_argument("--everything", action="store_true",
                    help="the composition table: continuous + prefix + "
                         "spec{4,8} + int8 KV at the Qwen3-8B int4 "
                         "shape, one run, per-feature ablation rows")
    ap.add_argument("--prefix-tokens", type=int, default=0,
                    help="A/B the shared-prefix KV instead: every "
                         "request opens with the same N-token system "
                         "head (the RAG regime); compares continuous "
                         "serving with prefix_ids vs the same prompts "
                         "prefilled in full per slot")
    ap.add_argument("--spec-window", type=int, default=0,
                    help="A/B prompt-lookup speculation instead: "
                         "continuous vs continuous+spec under the same "
                         "staggered load (random weights => acceptance "
                         "~1, so this measures the verify overhead in "
                         "SERVING; for real acceptance/speedup use "
                         "bench_llm_spec_real.py's trained checkpoint)")
    args = ap.parse_args()

    if args.everything:
        return run_everything(args)

    params, cfg = build(args)
    tok = ByteTokenizer()
    gap = args.gap_ms / 1e3

    if args.prefix_tokens:
        from ragroute_tpu.llm.continuous import shared_prefix_ids

        # ByteTokenizer: 1 byte = 1 token; the rendered head adds
        # bos + "<|system|>\n" + "\n<|user|>\n" = 22 tokens around the
        # system text, so size the text to hit the requested total
        if args.prefix_tokens <= 23:
            ap.error("--prefix-tokens must be > 23 (render overhead "
                     "is 22 tokens and the system text must be "
                     "non-empty)")
        sys_txt = "x" * (args.prefix_tokens - 22)
        sys_msgs = [{"role": "system", "content": sys_txt}]
        pre = shared_prefix_ids(tok, sys_txt)

        def msgs_fn(i):
            return sys_msgs + [
                {"role": "user", "content": f"request {i} " * 4}]

        kw = dict(max_new_tokens=args.max_new, chunk_steps=args.chunk_steps,
                  slots=args.slots, cache_dtype=jnp.bfloat16,
                  eos_id=tok.eos_id, pad_id=tok.pad_id)
        full = ContinuousGenerationService(
            params, cfg, tok, prompt_buckets=(len(pre) + 128,),
            cache_len=len(pre) + 128 + args.max_new + 16, **kw)
        shared = ContinuousGenerationService(
            params, cfg, tok, prompt_buckets=(128,),
            cache_len=128 + args.max_new + 16, prefix_ids=pre, **kw)
        res_full = asyncio.run(drive(full, args.requests, gap,
                                     args.slots, msgs_fn))
        res_shared = asyncio.run(drive(shared, args.requests, gap,
                                       args.slots, msgs_fn))
        print(json.dumps({
            "model": f"qwen3-0.6B-shape(L={cfg.num_layers})",
            "requests": args.requests, "gap_ms": args.gap_ms,
            "max_new": args.max_new, "chunk_steps": args.chunk_steps,
            "prefix_tokens": len(pre), "slots": args.slots,
            "full_prefill": res_full, "shared_prefix": res_shared,
        }))
        return

    kw = dict(max_new_tokens=args.max_new, prompt_buckets=(128,),
              eos_id=tok.eos_id, pad_id=tok.pad_id)

    if args.spec_window:
        mk = lambda w: ContinuousGenerationService(  # noqa: E731
            params, cfg, tok, slots=args.slots, cache_len=384,
            chunk_steps=args.chunk_steps, cache_dtype=jnp.bfloat16,
            spec_window=w, **kw)
        plain = mk(0)
        spec = mk(args.spec_window)
        res_plain = asyncio.run(drive(plain, args.requests, gap,
                                      args.slots))
        res_spec = asyncio.run(drive(spec, args.requests, gap,
                                     args.slots))
        acc = (spec.spec_emitted / spec.spec_steps
               if spec.spec_steps else None)
        print(json.dumps({
            "model": f"qwen3-0.6B-shape(L={cfg.num_layers})",
            "requests": args.requests, "gap_ms": args.gap_ms,
            "max_new": args.max_new, "chunk_steps": args.chunk_steps,
            "spec_window": args.spec_window,
            "continuous": res_plain, "continuous_spec": res_spec,
            "accept_tok_per_step": acc and round(acc, 3),
        }))
        return

    lock = GenerationService(params, cfg, tok,
                             batch_buckets=(1, args.slots),
                             cache_dtype=jnp.bfloat16, **kw)
    cont = ContinuousGenerationService(
        params, cfg, tok, slots=args.slots, cache_len=384,
        chunk_steps=args.chunk_steps, cache_dtype=jnp.bfloat16, **kw)

    res_lock = asyncio.run(drive(lock, args.requests, gap, args.slots))
    res_cont = asyncio.run(drive(cont, args.requests, gap, args.slots))
    print(json.dumps({
        "model": f"qwen3-0.6B-shape(L={cfg.num_layers})",
        "requests": args.requests, "gap_ms": args.gap_ms,
        "max_new": args.max_new, "chunk_steps": args.chunk_steps,
        "lockstep": res_lock, "continuous": res_cont,
    }))


if __name__ == "__main__":
    main()
