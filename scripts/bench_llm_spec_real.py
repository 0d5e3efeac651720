"""REAL speculative-decoding data point (round 4, VERDICT item #3).

The round-3 table measured only the mechanical ceiling (a degenerate
always-copy model). This harness produces the missing real number:

1. TRAIN the demo byte decoder to answer RAG prompts by QUOTING the
   retrieved context (the regime prompt-lookup drafting targets): the
   corpus is real serving prompts from the MedRAG message builder
   (engine/prompts.py) whose gold answers quote a retrieved document,
   loss masked to the answer region. A 2-layer byte model learns the
   copy behavior (induction) in a few hundred steps.
2. MEASURE prompt-lookup acceptance (mean tokens emitted per verify
   step, the service's spec_emitted/spec_steps counters) and net
   tokens/s of `--llm-spec-window W` vs plain decode on HELD-OUT
   prompts, through the production ContinuousGenerationService.

Greedy-exactness means the emitted streams are identical with and
without speculation (gated in tests/test_llm_speculative.py); this
harness only quantifies the speed.

  python scripts/bench_llm_spec_real.py [--steps 400] [--windows 4 8]
      [--eval-prompts 8] [--max-new 96] [--save CKPT.npz] [--load CKPT.npz]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_corpus(n, *, seed, tok, max_len):
    """(messages, prompt_ids, answer_ids) triples: real MedRAG serving
    prompts whose answers quote one retrieved document.

    The prompt is rendered with the SAME `_render_prompt` the
    production service applies inside `chat()` and is never truncated,
    so training and serving see byte-identical context — an earlier
    version of this harness pre-templated + tail-truncated for
    training but let `chat()` re-wrap the string in a second template,
    and the distribution shift cost the model its learned quote
    behavior on held-out prompts (0/8 emitted the constant answer
    prefix despite answer-CE 0.07)."""
    from ragroute_tpu.engine.prompts import generate_llm_message
    from ragroute_tpu.index.synthetic import make_synthetic_world
    from ragroute_tpu.llm.service import _render_prompt

    syn = make_synthetic_world("medrag", docs_per_source=256,
                               num_queries=n, seed=seed)
    triples = []
    rng = np.random.default_rng(seed)
    payloads = [p for src in syn.world.sources
                for p in syn.doc_payloads[src.name]]
    for qi, q in enumerate(syn.questions):
        docs = [payloads[rng.integers(0, len(payloads))] for _ in range(3)]
        messages, _ = generate_llm_message(
            "medrag", q["question"], docs, q["options"],
            "llama3.1-8B-instruct")
        prompt = _render_prompt(tok, messages)
        quote = docs[0]["content"]
        answer = f'The context states: "{quote}" {{"answer_choice": "A"}}'
        p_ids = tok.encode(prompt)
        a_ids = list(answer.encode("utf-8")) + [tok.eos_id]
        if len(p_ids) + len(a_ids) > max_len:
            raise SystemExit(
                f"prompt+answer {len(p_ids) + len(a_ids)} exceeds "
                f"--max-len {max_len}; raise it (prompts are never "
                f"truncated so train == serve)")
        triples.append((messages, p_ids, a_ids))
    return triples


def train(cfg, pairs, steps, lr, seed, log):
    import jax
    import jax.numpy as jnp
    import optax

    from ragroute_tpu.llm.model import (_embed_lookup, _inv_freq, _logits,
                                        init_decoder_params,
                                        prefill_layers)

    inv_freq = _inv_freq(cfg)
    pairs = [(p, a) for _, p, a in pairs]
    seq_len = max(len(p) + len(a) for p, a in pairs)
    seq_len = -(-seq_len // 64) * 64
    n = len(pairs)
    ids = np.full((n, seq_len), 256, np.int32)        # pad_id
    tgt = np.full((n, seq_len), -1, np.int32)         # -1 = unmasked out
    for i, (p, a) in enumerate(pairs):
        row = (p + a)[:seq_len]
        ids[i, :len(row)] = row
        # loss on the answer region only (next-token: target at position
        # j predicts ids[j + 1])
        a0 = len(p) - 1
        a1 = min(len(p) + len(a) - 1, seq_len - 1)
        tgt[i, a0:a1] = ids[i, a0 + 1:a1 + 1]
    ids_d, tgt_d = jnp.asarray(ids), jnp.asarray(tgt)
    causal = jnp.tril(jnp.ones((seq_len, seq_len), bool))

    def loss_fn(params, bi):
        x, y = ids_d[bi], tgt_d[bi]
        h = _embed_lookup(params, x)
        pos = jnp.broadcast_to(jnp.arange(seq_len), x.shape)
        kmask = jnp.broadcast_to(causal, (x.shape[0],) + causal.shape)
        h, _, _ = prefill_layers(params, cfg, h, pos, kmask,
                                 inv_freq=inv_freq)
        logits = _logits(params, cfg, h).astype(jnp.float32)
        mask = y >= 0
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.maximum(y, 0))
        return (ce * mask).sum() / jnp.maximum(mask.sum(), 1)

    params = init_decoder_params(jax.random.key(seed), cfg)
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, bi):
        l, g = jax.value_and_grad(loss_fn)(params, bi)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, l

    rng = np.random.default_rng(seed)
    bsz = min(8, n)
    for s in range(steps):
        bi = jnp.asarray(rng.choice(n, bsz, replace=False))
        params, opt, l = step(params, opt, bi)
        if s % 50 == 0 or s == steps - 1:
            log(f"train step {s}: answer-CE {float(l):.4f}")
    return params


def measure(params, cfg, tok, pairs, window, max_new, log,
            kv_int8=False):
    """tokens/s + acceptance through the production continuous service.

    ``kv_int8=True`` runs the same config over the int8-quantized KV
    cache — the real-acceptance composition row (spec x int8-KV) that
    the 8B-shape random-weights table cannot provide (its acceptance is
    template-driven); quote-rate doubles as the quality probe for the
    quantized cache."""
    import asyncio

    import jax.numpy as jnp

    from ragroute_tpu.llm.continuous import ContinuousGenerationService

    bucket = max(-(-max(len(p) for _, p, _ in pairs) // 256) * 256, 512)
    svc = ContinuousGenerationService(
        params, cfg, tok, slots=4, max_new_tokens=max_new,
        prompt_buckets=(bucket,), cache_len=bucket + max_new + 16,
        chunk_steps=8, cache_dtype=("int8" if kv_int8 else jnp.bfloat16),
        eos_id=tok.eos_id, pad_id=tok.pad_id, spec_window=window)

    async def run():
        outs = []
        t0 = None
        base_tokens = base_steps = base_emitted = 0
        for msgs, _, _ in pairs:  # warm compile on the first prompt
            # raw messages: chat() renders the SAME template training saw
            if t0 is None:
                await svc.chat(msgs)
                t0 = time.perf_counter()
                base_tokens = svc.generated_tokens
                # acceptance must cover the same prompt set as tok/s —
                # snapshot the spec counters past the warm-up prompt too
                base_steps = getattr(svc, "spec_steps", 0)
                base_emitted = getattr(svc, "spec_emitted", 0)
                continue
            outs.append(await svc.chat(msgs))
        dt = time.perf_counter() - t0
        toks = svc.generated_tokens - base_tokens
        steps = getattr(svc, "spec_steps", 0) - base_steps
        acc = ((svc.spec_emitted - base_emitted) / steps
               if steps else None)
        await svc.stop()
        return outs, toks, dt, acc

    outs, toks, dt, acc = asyncio.run(run())
    quote_hit = sum('The context states: "' in o for o in outs)
    log(f"W={window}{' +int8kv' if kv_int8 else ''}: {toks} tokens in "
        f"{dt:.2f}s = {toks / dt:.1f} tok/s"
        + (f", acceptance {acc:.2f} tok/verify-step" if acc else "")
        + f"; {quote_hit}/{len(outs)} answers open with the quote form")
    return {"window": window, "kv_int8": kv_int8,
            "tok_per_s": round(toks / dt, 1),
            "accept_tok_per_step": None if acc is None else round(acc, 3),
            "quote_form": f"{quote_hit}/{len(outs)}"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--train-prompts", type=int, default=48)
    ap.add_argument("--eval-prompts", type=int, default=9)
    ap.add_argument("--max-new", type=int, default=96)
    ap.add_argument("--windows", type=int, nargs="+", default=[0, 4, 8])
    ap.add_argument("--save", type=str, default=None)
    ap.add_argument("--load", type=str, default=None)
    ap.add_argument("--with-int8-kv", action="store_true",
                    help="also measure every window over the int8 KV "
                         "cache (real-acceptance spec x int8-KV "
                         "composition + quantized-cache quote quality)")
    ap.add_argument("--max-len", type=int, default=1408,
                    help="training seq cap; prompts are NEVER truncated "
                         "(train == serve), the build errors if exceeded")
    args = ap.parse_args()
    # the byte tokenizer needs no hub metadata; skip the ~30 s of
    # connect retries the prompt builder's tokenizer probe would pay
    os.environ.setdefault("HF_HUB_OFFLINE", "1")

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    from ragroute_tpu.llm.model import DecoderConfig
    from ragroute_tpu.llm.service import ByteTokenizer
    from ragroute_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    tok = ByteTokenizer()
    cfg = DecoderConfig(
        vocab_size=tok.vocab_size, hidden_size=args.hidden,
        num_layers=args.layers, num_heads=8, num_kv_heads=8,
        head_dim=args.hidden // 8, intermediate_size=2 * args.hidden)

    eval_pairs = build_corpus(args.eval_prompts, seed=91, tok=tok,
                              max_len=args.max_len)
    if args.load and not os.path.exists(args.load):
        raise SystemExit(f"--load {args.load}: no such checkpoint "
                         f"(refusing to silently retrain fresh weights)")
    if args.load:
        import pickle

        with open(args.load, "rb") as f:
            params = pickle.load(f)
        log(f"loaded trained params from {args.load}")
    else:
        train_pairs = build_corpus(args.train_prompts, seed=5, tok=tok,
                                   max_len=args.max_len)
        log(f"training {args.layers}x{args.hidden} byte decoder on "
            f"{len(train_pairs)} RAG echo prompts...")
        params = train(cfg, train_pairs, args.steps, args.lr, 0, log)
        if args.save:
            import pickle

            import jax

            with open(args.save, "wb") as f:
                pickle.dump(jax.tree.map(np.asarray, params), f)
            log(f"saved trained params to {args.save}")

    rows = [measure(params, cfg, tok, eval_pairs, w, args.max_new, log)
            for w in args.windows]
    if args.with_int8_kv:
        rows += [measure(params, cfg, tok, eval_pairs, w, args.max_new,
                         log, kv_int8=True) for w in args.windows]
    print(json.dumps({"spec_real": rows}, indent=1))


if __name__ == "__main__":
    main()
