"""Prompt-lookup speculative decoding (ragroute_tpu.llm.speculative).

The load-bearing property is GREEDY EXACTNESS: speculative decode must
emit the identical token stream as plain decode — drafts shortcut
computation, never change it — for any draft quality (matching,
garbage, or absent).
"""

import asyncio

import numpy as np

import jax
import jax.numpy as jnp

from ragroute_tpu.llm.continuous import (
    admit, decode_chunk, demo_continuous_service,
)
from ragroute_tpu.llm.model import (
    DecoderConfig, init_cache, init_decoder_params,
)
from ragroute_tpu.llm.speculative import draft_from_history, spec_decode_chunk

CFG = DecoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                    num_heads=4, num_kv_heads=2, head_dim=8,
                    intermediate_size=64)


def test_draft_from_history_finds_latest_bigram():
    #               0  1  2  3  4  5  6  7  8
    toks = np.array([[5, 9, 7, 3, 5, 9, 4, 5, 9]], np.int32)
    counts = jnp.asarray([8], jnp.int32)   # current bigram = (5, 9) at 7,8
    # matches at j=0 and j=4 (both strictly before 7) -> latest is 4;
    # drafts copy toks[6:6+3] = [4, 5, 9]
    drafts = draft_from_history(jnp.asarray(toks), counts, window=4)
    np.testing.assert_array_equal(np.asarray(drafts), [[4, 5, 9]])
    # no match: bigram (3, 5) at (3, 4)... appears only once
    counts2 = jnp.asarray([4], jnp.int32)
    d2 = draft_from_history(jnp.asarray(toks), counts2, window=3)
    assert np.asarray(d2).shape == (1, 2)  # arbitrary tokens, just shaped


def _fresh_state(slots, cache_len, params_key=7):
    params = init_decoder_params(jax.random.key(params_key), CFG)
    cache = init_cache(CFG, slots, cache_len, jnp.float32)
    state = (cache, jnp.zeros((slots,), jnp.int32),
             jnp.zeros((slots,), jnp.int32), jnp.zeros((slots,), bool),
             jnp.zeros((slots,), jnp.int32), jnp.zeros((), jnp.int32),
             jnp.zeros((slots, cache_len), jnp.int32))
    return params, state


def test_spec_chunk_exact_vs_plain_chunk():
    """Spec and plain decode must emit identical streams — run both from
    the same admitted state, with a REPETITIVE prompt (drafts hit) and a
    random prompt (drafts miss)."""
    rng = np.random.default_rng(5)
    rep = np.tile([7, 11, 13], 6)[:16].astype(np.int32)   # repetitive
    rnd = rng.integers(1, CFG.vocab_size, 16).astype(np.int32)
    ids = np.stack([rep, rnd])
    lens = jnp.asarray([16, 16], jnp.int32)
    budget = 21

    streams = {}
    for mode in ("plain", "spec"):
        params, state = _fresh_state(2, 64)
        state, tok0 = admit(params, CFG, state, jnp.asarray(ids), lens,
                            jnp.asarray([0, 1], jnp.int32),
                            jnp.full((2,), budget - 1, jnp.int32),
                            0.0, -1, 0)
        rows = [[int(t)] for t in np.asarray(tok0)]
        if mode == "plain":
            for _ in range(3):
                state, toks, _ = decode_chunk(params, CFG, state, 8, 0.0,
                                              -1, 0)
                t = np.asarray(toks)
                for b in range(2):
                    rows[b].extend(int(x) for x in t[:, b])
        else:
            for _ in range(3):
                state, toks, n = spec_decode_chunk(params, CFG, state, 8,
                                                   4, -1, 0)
                t, nn = np.asarray(toks), np.asarray(n)
                for b in range(2):
                    for s in range(t.shape[0]):
                        rows[b].extend(int(x) for x in t[s, b, :nn[s, b]])
        streams[mode] = [r[:budget] for r in rows]

    assert streams["spec"] == streams["plain"]


def test_spec_service_matches_plain_service():
    prompts = ["abcabcabcabcabc", "tell me something new", "xyxyxyxyxy"]
    plain = demo_continuous_service(max_new_tokens=24, slots=2,
                                    chunk_steps=4)
    spec = demo_continuous_service(max_new_tokens=24, slots=2,
                                   chunk_steps=4, spec_window=4)

    def chat_all(svc):
        async def run():
            outs = await asyncio.gather(*[
                svc.chat([{"role": "user", "content": t}])
                for t in prompts])
            await svc.stop()
            return outs
        return asyncio.run(run())

    ref = chat_all(plain)
    got = chat_all(spec)
    assert got == ref


def _copying_model(cfg, c: int):
    """A decoder that deterministically predicts token ``c`` at every
    position: all layer weights zero (h = embed), all-ones embedding
    (rms-normalizes to ones), LM head = one-hot column c — so greedy
    output is c c c …, the self-repeating stream prompt-lookup drafts
    perfectly. Full acceptance by construction."""
    params = init_decoder_params(jax.random.key(0), cfg)
    zeroed = jax.tree.map(jnp.zeros_like, params["layers"])
    head = jnp.zeros((cfg.hidden_size, cfg.vocab_size))
    head = head.at[:, c].set(1.0)
    return {
        "embed": jnp.ones_like(params["embed"]),
        "ln_f": params["ln_f"],
        "layers": zeroed,
        "lm_head": head,
    }


def test_spec_full_acceptance_on_copying_model():
    """On a stream that repeats (the regime prompt-lookup exists for),
    every verify step must commit the whole window."""
    c = 42
    params = _copying_model(CFG, c)
    _, state = _fresh_state(1, 64)
    ids = jnp.asarray(np.array([[1, 2, 3, 4]], np.int32))
    state, tok0 = admit(params, CFG, state, ids,
                        jnp.asarray([4], jnp.int32),
                        jnp.asarray([0], jnp.int32),
                        jnp.asarray([30], jnp.int32), 0.0, -1, 0)
    assert int(np.asarray(tok0)[0]) == c
    state, toks, n = spec_decode_chunk(params, CFG, state, 8, 4, -1, 0)
    n = np.asarray(n)[:, 0]
    # acceptance ramps while the c-stream grows long enough for a match
    # with a fully-known continuation (j + window <= counts), then every
    # verify step commits its whole window
    assert (n[5:] == 4).all(), f"acceptance per step: {n.tolist()}"
    assert (np.asarray(toks)[5:, 0] == c).all()


def test_spec_respects_per_request_max_new():
    spec = demo_continuous_service(max_new_tokens=32, slots=1,
                                   chunk_steps=4, spec_window=4)
    plain = demo_continuous_service(max_new_tokens=32, slots=1,
                                    chunk_steps=4)

    async def run(svc):
        out = await svc.chat(
            [{"role": "user", "content": "ababab"}], max_new=5)
        await svc.stop()
        return out

    a = asyncio.run(run(spec))
    b = asyncio.run(run(plain))
    assert a == b
    # emitted-token accounting (text length can't be re-encoded: invalid
    # bytes decode to U+FFFD which re-encodes to 3 bytes)
    assert spec.generated_tokens <= 5
    assert spec.generated_tokens == plain.generated_tokens


def test_spec_real_harness_smoke(monkeypatch):
    """scripts/bench_llm_spec_real.py end-to-end at toy scale: the
    corpus builder renders with the service's own template (train ==
    serve — the round-4 harness guarantee), training runs, and measure()
    reports tok/s + acceptance through the production continuous
    service. Gates the harness against API drift in llm/ and prompts."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_llm_spec_real",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "bench_llm_spec_real.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from ragroute_tpu.llm.model import DecoderConfig
    from ragroute_tpu.llm.service import ByteTokenizer

    tok = ByteTokenizer()
    triples = mod.build_corpus(3, seed=11, tok=tok, max_len=2048)
    assert len(triples) == 3
    msgs, p_ids, a_ids = triples[0]
    assert isinstance(msgs, list) and msgs[0]["role"] == "system"
    # prompts are rendered with the exact template chat() applies
    from ragroute_tpu.llm.service import _render_prompt

    assert p_ids == tok.encode(_render_prompt(tok, msgs))
    assert a_ids[-1] == tok.eos_id

    cfg = DecoderConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_layers=1, num_heads=4, num_kv_heads=4,
                        head_dim=8, intermediate_size=64)
    params = mod.train(cfg, triples, steps=2, lr=1e-3, seed=0,
                       log=lambda *a: None)
    row = mod.measure(params, cfg, tok, triples, window=2, max_new=8,
                      log=lambda *a: None)
    assert row["window"] == 2 and row["tok_per_s"] > 0
    assert row["accept_tok_per_step"] is None or \
        row["accept_tok_per_step"] >= 1.0
