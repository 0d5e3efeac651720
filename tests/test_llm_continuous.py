"""Continuous-batching generation service (ragroute_tpu.llm.continuous).

The invariant under test: slot-based continuous decode produces EXACTLY
the same greedy completions as the lockstep GenerationService on the
same weights — under staggered arrivals, slot contention (more requests
than slots), early-eos slot reuse, and mid-flight admission.
"""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragroute_tpu.llm.continuous import (
    ContinuousGenerationService, admit, decode_chunk,
    demo_continuous_service, prefill_rows,
)
from ragroute_tpu.llm.model import (
    DecoderConfig, generate, init_cache, init_decoder_params, prefill,
)
from ragroute_tpu.llm.service import demo_service

CFG = DecoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                    num_heads=4, num_kv_heads=2, head_dim=8,
                    intermediate_size=64)


def _params():
    return init_decoder_params(jax.random.key(7), CFG)


def test_prefill_rows_matches_left_padded_prefill():
    """Right-padded slot prefill and left-padded lockstep prefill must
    produce identical last-token logits."""
    params = _params()
    lens = [9, 4]
    rng = np.random.default_rng(3)
    p = 9
    right = np.zeros((2, p), np.int32)
    left = np.zeros((2, p), np.int32)
    lmask = np.zeros((2, p), np.int32)
    for b, n in enumerate(lens):
        toks = rng.integers(1, CFG.vocab_size, n)
        right[b, :n] = toks
        left[b, p - n:] = toks
        lmask[b, p - n:] = 1
    got, _, _ = prefill_rows(params, CFG, jnp.asarray(right),
                             jnp.asarray(lens, jnp.int32))
    ref, _ = prefill(params, CFG, jnp.asarray(left), jnp.asarray(lmask),
                     init_cache(CFG, 2, p + 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_slot_decode_matches_lockstep_generate():
    """admit + decode_chunk over slots == model.generate, token for
    token (greedy)."""
    params = _params()
    lens = [8, 5, 3]
    max_new = 7
    rng = np.random.default_rng(11)
    p = 8
    right = np.zeros((3, p), np.int32)
    left = np.zeros((3, p), np.int32)
    lmask = np.zeros((3, p), np.int32)
    for b, n in enumerate(lens):
        toks = rng.integers(1, CFG.vocab_size, n)
        right[b, :n] = toks
        left[b, p - n:] = toks
        lmask[b, p - n:] = 1

    ref, _ = generate(params, CFG, jnp.asarray(left), jnp.asarray(lmask),
                      max_new, eos_id=-1, pad_id=0)
    ref = np.asarray(ref)

    slots = 4
    cache = init_cache(CFG, slots, 32, jnp.float32)
    state = (cache, jnp.zeros((slots,), jnp.int32),
             jnp.zeros((slots,), jnp.int32), jnp.zeros((slots,), bool),
             jnp.zeros((slots,), jnp.int32), jnp.zeros((), jnp.int32),
             jnp.zeros((slots, 32), jnp.int32))
    state, tok0 = admit(params, CFG, state, jnp.asarray(right),
                        jnp.asarray(lens, jnp.int32),
                        jnp.asarray([0, 1, 2], jnp.int32),
                        jnp.full((3,), max_new - 1, jnp.int32),
                        0.0, -1, 0)
    np.testing.assert_array_equal(np.asarray(tok0), ref[:, 0])
    # two chunks of different sizes to cross a chunk boundary mid-stream
    state, t1, _ = decode_chunk(params, CFG, state, 4, 0.0, -1, 0)
    state, t2, _ = decode_chunk(params, CFG, state, 4, 0.0, -1, 0)
    got = np.concatenate([np.asarray(t1), np.asarray(t2)], axis=0).T
    np.testing.assert_array_equal(got[:3, :max_new - 1], ref[:, 1:])


def _chat_all(svc, prompts, stagger_s=0.0):
    async def run():
        async def one(i, text):
            if stagger_s:
                await asyncio.sleep(i * stagger_s)
            return await svc.chat([{"role": "user", "content": text}])
        outs = await asyncio.gather(*[one(i, t) for i, t in
                                      enumerate(prompts)])
        await svc.stop()
        return outs
    return asyncio.run(run())


def test_continuous_matches_lockstep_service():
    prompts = [f"question number {i}, please answer" for i in range(5)]
    lock = demo_service(max_new_tokens=12, flush_interval_s=0.0,
                        batch_buckets=(1,), cache_dtype=jnp.float32)
    ref = _chat_all(lock, prompts)
    cont = demo_continuous_service(max_new_tokens=12, slots=3,
                                   chunk_steps=5)
    got = _chat_all(cont, prompts, stagger_s=0.02)
    assert got == ref
    # slot contention happened (5 requests over 3 slots) and decode ran
    # in chunks, i.e. this really was continuous batching
    assert cont.admissions >= 2
    assert cont.chunks >= 3


def test_continuous_slot_reuse_many_requests():
    cont = demo_continuous_service(max_new_tokens=6, slots=2,
                                   chunk_steps=4)
    prompts = [f"p{i}" for i in range(9)]
    outs = _chat_all(cont, prompts)
    assert len(outs) == 9 and all(isinstance(o, str) for o in outs)
    # determinism: same prompt again on a FRESH service gives same answer
    cont2 = demo_continuous_service(max_new_tokens=6, slots=2,
                                    chunk_steps=4)
    outs2 = _chat_all(cont2, [prompts[4]])
    assert outs2[0] == outs[4]


def test_continuous_eos_frees_slot_early():
    """A request whose first sampled token is eos completes immediately
    and its slot is reusable."""
    from ragroute_tpu.llm.service import _render_prompt

    cont = demo_continuous_service(max_new_tokens=8, slots=1,
                                   chunk_steps=4)
    # compute the model's greedy first token for this prompt directly,
    # then declare THAT token the eos on a fresh service
    msgs = [{"role": "user", "content": "zz"}]
    ids = cont.tokenizer.encode(_render_prompt(cont.tokenizer, msgs))
    logits, _, _ = prefill_rows(
        cont.params, cont.cfg,
        jnp.asarray(np.asarray(ids, np.int32)[None]),
        jnp.asarray([len(ids)], jnp.int32))
    eos = int(np.argmax(np.asarray(logits)[0]))

    cont2 = demo_continuous_service(max_new_tokens=8, slots=1,
                                    chunk_steps=4)
    cont2.eos_id = eos
    outs = _chat_all(cont2, ["zz", "zz"])
    assert outs == ["", ""]   # eos fired at token 0 for both
    assert all(r is None for r in cont2._slot_req)


def test_mid_flight_admission_does_not_corrupt_running_slot():
    """Admit request B while A is mid-generation; A's text must equal
    A's text when run alone."""
    alone = demo_continuous_service(max_new_tokens=16, slots=2,
                                    chunk_steps=3)
    ref = _chat_all(alone, ["tell me about alpha"])

    both = demo_continuous_service(max_new_tokens=16, slots=2,
                                   chunk_steps=3)
    got = _chat_all(both, ["tell me about alpha", "and beta too"],
                    stagger_s=0.05)
    assert got[0] == ref[0]


def test_per_request_max_new_both_services():
    """chat(max_new=n) caps that request only — and the two services
    agree on the capped text."""
    lock = demo_service(max_new_tokens=16, flush_interval_s=0.01,
                        batch_buckets=(1, 4), cache_dtype=jnp.float32)
    cont = demo_continuous_service(max_new_tokens=16, slots=2,
                                   chunk_steps=4)

    async def run(svc):
        outs = await asyncio.gather(
            svc.chat([{"role": "user", "content": "alpha"}], max_new=3),
            svc.chat([{"role": "user", "content": "alpha"}]),
        )
        await svc.stop()
        return outs

    short_l, full_l = asyncio.run(run(lock))
    short_c, full_c = asyncio.run(run(cont))
    assert short_l == short_c and full_l == full_c
    assert full_l.startswith(short_l) and short_l != full_l


# ---------------------------------------------------------------------------
# Failure-path regressions (round-3 review findings)
# ---------------------------------------------------------------------------

def test_capacity_stop_finishes_request_instead_of_hanging():
    """A slot that hits cache capacity before eos/budget must complete
    (truncated), not hang the awaiting caller."""
    import jax.numpy as jnp2
    from ragroute_tpu.llm.continuous import ContinuousGenerationService
    from ragroute_tpu.llm.model import init_decoder_params
    from ragroute_tpu.llm.service import DEMO_CFG, ByteTokenizer

    tok = ByteTokenizer()
    params = init_decoder_params(jax.random.key(0), DEMO_CFG)
    svc = ContinuousGenerationService(
        params, DEMO_CFG, tok, slots=1, cache_len=48, max_new_tokens=64,
        prompt_buckets=(32,), chunk_steps=8, cache_dtype=jnp2.float32,
        eos_id=tok.eos_id, pad_id=tok.pad_id)

    async def run():
        return await asyncio.wait_for(
            svc.chat([{"role": "user", "content": "xyz"}]), timeout=120)

    out = asyncio.run(run())
    assert isinstance(out, str)
    assert all(r is None for r in svc._slot_req)


def test_worker_failure_propagates_to_callers():
    """A device/jit error mid-serve must raise in every awaiting chat()
    call (not hang), and the worker must survive for later requests."""
    svc = demo_continuous_service(max_new_tokens=8, slots=2,
                                  chunk_steps=3)

    boom = RuntimeError("synthetic device failure")
    real_run_admit = svc._run_admit
    svc._run_admit = lambda group: (_ for _ in ()).throw(boom)

    async def run():
        with pytest.raises(RuntimeError, match="synthetic device"):
            await asyncio.wait_for(
                svc.chat([{"role": "user", "content": "a"}]), timeout=60)
        # worker alive: restore the device path and serve again
        svc._run_admit = real_run_admit
        out = await asyncio.wait_for(
            svc.chat([{"role": "user", "content": "a"}]), timeout=120)
        await svc.stop()
        return out

    assert isinstance(asyncio.run(run()), str)


def test_stream_delta_withholds_partial_utf8():
    """A multibyte character split across chunks must NOT emit U+FFFD
    mid-stream; the joined deltas stay a strict prefix of the final."""
    svc = demo_continuous_service(max_new_tokens=8, slots=1)
    q = asyncio.Queue()
    req = {"tokens": [ord("h"), 0xC3], "stream": q, "streamed": "",
           "max_new": 8}
    svc._push_stream_delta(req)        # trailing partial 'é' byte
    assert req["streamed"] == "h"      # only the complete prefix went out
    req["tokens"].append(0xA9)         # completes 'é'
    svc._push_stream_delta(req)
    assert req["streamed"] == "hé"
    deltas = []
    while not q.empty():
        deltas.append(q.get_nowait())
    assert deltas == ["h", "é"]


def test_stop_cancels_waiters():
    svc = demo_continuous_service(max_new_tokens=8, slots=1,
                                  chunk_steps=2)

    async def run():
        # enqueue without letting the worker start processing
        req = svc._make_request([{"role": "user", "content": "x"}], None)
        await svc._queue.put(req)
        await svc.stop()
        with pytest.raises(asyncio.CancelledError):
            await req["future"]

    asyncio.run(run())


def test_spec_window_validation():
    with pytest.raises(ValueError):
        demo_continuous_service(spec_window=-1)
    with pytest.raises(ValueError):
        demo_continuous_service(spec_window=1)
    with pytest.raises(ValueError):
        # prompt bucket must leave a decode-window margin below cache_len
        demo_continuous_service(prompt_buckets=(128, 766), cache_len=768,
                                spec_window=4)


def test_worker_recovers_after_device_failure():
    """A failed jitted step donates/poisons the device state; the worker
    must fail the in-flight callers AND rebuild a fresh state so the
    NEXT request serves normally (not 'Array has been deleted' forever)."""
    svc = demo_continuous_service(max_new_tokens=6, slots=2,
                                  chunk_steps=2)
    ref = demo_continuous_service(max_new_tokens=6, slots=2,
                                  chunk_steps=2)

    async def run():
        msgs = [{"role": "user", "content": "hello"}]
        # sabotage exactly one chunk call
        orig = svc._run_chunk
        calls = {"n": 0}

        def boom():
            calls["n"] += 1
            # consume (donate) the state like the real jit would, then die
            svc._state = None
            raise RuntimeError("injected device failure")

        svc._run_chunk = boom
        try:
            await svc.chat(msgs)
            raise AssertionError("sabotaged request succeeded")
        except RuntimeError as e:
            assert "injected" in str(e)
        svc._run_chunk = orig
        assert svc._state is not None  # rebuilt by the failure handler
        got = await svc.chat(msgs)
        want = await ref.chat(msgs)
        assert got == want  # fresh state serves bit-identical output
        await svc.stop()
        await ref.stop()

    asyncio.run(run())


def test_streamed_failure_reports_error_in_band():
    """A device failure on a STREAMED request must surface as an error
    final event (ok=False through engine.llm), not a successful empty
    answer, and must not strand an un-retrieved future exception."""
    from ragroute_tpu.engine.llm import LLMClient

    svc = demo_continuous_service(max_new_tokens=6, slots=1,
                                  chunk_steps=2)

    async def run():
        def boom():
            svc._state = None
            raise RuntimeError("injected stream failure")

        svc._run_chunk = boom
        client = LLMClient(backend="jax", service=svc)
        items = []
        async for item in client.chat_stream(
                "demo", [{"role": "user", "content": "hi"}]):
            items.append(item)
        final = items[-1]
        assert final.ok is False
        assert "injected stream failure" in final.answer
        assert final.answer.startswith("Error generating response")
        await svc.stop()

    asyncio.run(run())


def test_finish_keeps_pad_aliased_tokens():
    """Credited tokens are already alive-filtered, so _finish must not
    strip trailing tokens that merely EQUAL pad_id (under tokenizers
    where pad aliases a real token, stripping deletes answer text and
    breaks the deltas-prefix-of-final contract)."""
    svc = demo_continuous_service(max_new_tokens=8, slots=1)

    async def run():
        loop = asyncio.get_running_loop()
        req = {"tokens": [65, 66, svc.pad_id],
               "max_new": 8, "future": loop.create_future()}
        svc._finish(req)
        text = req["future"].result()
        assert text == svc.tokenizer.decode([65, 66, svc.pad_id])

    asyncio.run(run())


def test_continuous_int8_kv_cache_matches_lockstep_int8():
    """With BOTH services on the int8 KV cache, continuous decode must
    still be token-exact vs the lockstep service (the cache stores the
    same quantized values either way), and the spec-window engine must
    stay greedy-exact vs plain continuous decode."""
    lock = demo_service(max_new_tokens=10, cache_dtype="int8")
    cont = demo_continuous_service(max_new_tokens=10, slots=2,
                                   chunk_steps=4, cache_dtype="int8")
    spec = demo_continuous_service(max_new_tokens=10, slots=2,
                                   chunk_steps=4, cache_dtype="int8",
                                   spec_window=4)

    async def run(svc):
        msgs = [[{"role": "user", "content": "hello"}],
                [{"role": "user", "content": "federated search"}]]
        outs = await asyncio.gather(*[svc.chat(m) for m in msgs])
        await svc.stop()
        return outs

    a = asyncio.run(run(lock))
    b = asyncio.run(run(cont))
    c = asyncio.run(run(spec))
    assert a == b == c


# ---------------------------------------------------------------------------
# shared-prefix KV
# ---------------------------------------------------------------------------

SYS = "You are a careful medical QA assistant. Answer from the context."


def _sys_msgs(user: str):
    return [{"role": "system", "content": SYS},
            {"role": "user", "content": user}]


def test_shared_prefix_ids_is_a_true_common_prefix():
    from ragroute_tpu.llm.continuous import shared_prefix_ids
    from ragroute_tpu.llm.service import ByteTokenizer, _render_prompt

    tok = ByteTokenizer()
    pre = shared_prefix_ids(tok, SYS)
    assert len(pre) > 10
    # every render with this system head starts with the prefix — and
    # the prefix covers the whole head (next token differs per content)
    for user in ("hello", "zzz", "What causes anemia?"):
        ids = tok.encode(_render_prompt(tok, _sys_msgs(user)))
        assert ids[:len(pre)] == pre
        assert len(ids) > len(pre)


def test_prefix_sharing_token_exact_vs_no_prefix():
    """Continuous decode with the shared-prefix KV must emit EXACTLY the
    tokens of the same service without it (same full prompts): the
    concatenated-softmax attention is algebraically the same as having
    the prefix in every slot's cache. Covers plain and speculative
    engines, plus mid-flight admission (4 requests, 2 slots)."""
    from ragroute_tpu.llm.continuous import shared_prefix_ids
    from ragroute_tpu.llm.service import ByteTokenizer

    pre = shared_prefix_ids(ByteTokenizer(), SYS)
    msgs = [_sys_msgs(u) for u in
            ("hello", "federated search", "anemia?", "qq")]

    async def run(svc):
        outs = await asyncio.gather(*[svc.chat(m) for m in msgs])
        await svc.stop()
        return outs

    base = asyncio.run(run(demo_continuous_service(
        max_new_tokens=12, slots=2, chunk_steps=4)))
    shared = asyncio.run(run(demo_continuous_service(
        max_new_tokens=12, slots=2, chunk_steps=4, prefix_ids=pre)))
    spec = asyncio.run(run(demo_continuous_service(
        max_new_tokens=12, slots=2, chunk_steps=4, prefix_ids=pre,
        spec_window=4)))
    assert base == shared == spec


def test_prefix_mismatch_raises():
    from ragroute_tpu.llm.continuous import shared_prefix_ids
    from ragroute_tpu.llm.service import ByteTokenizer

    pre = shared_prefix_ids(ByteTokenizer(), SYS)
    svc = demo_continuous_service(max_new_tokens=8, slots=2,
                                  prefix_ids=pre)

    async def run():
        with pytest.raises(ValueError, match="shared prefix"):
            await svc.chat([{"role": "user", "content": "no system"}])
        await svc.stop()

    asyncio.run(run())
    # a prompt that stops AT the prefix (empty suffix) must also refuse
    # (the suffix prefill needs at least one real token per row)
    class _ExactPrefix(ByteTokenizer):
        def encode(self, text):
            return list(pre)

    svc.tokenizer = _ExactPrefix()
    with pytest.raises(ValueError, match="shared prefix"):
        svc._encode_request(_sys_msgs("anything"))


def test_prefix_sharing_composes_with_int8_kv_cache():
    """Prefix sharing + int8 KV cache: the prefix block stays bf16/f32
    (computed once, never quantized) while slot rows quantize — the two
    features compose, and plain vs speculative engines stay token-exact
    vs each other on the composed configuration."""
    from ragroute_tpu.llm.continuous import shared_prefix_ids
    from ragroute_tpu.llm.service import ByteTokenizer

    pre = shared_prefix_ids(ByteTokenizer(), SYS)
    msgs = [_sys_msgs(u) for u in ("hello", "federated")]

    async def run(svc):
        outs = await asyncio.gather(*[svc.chat(m) for m in msgs])
        await svc.stop()
        return outs

    plain = asyncio.run(run(demo_continuous_service(
        max_new_tokens=10, slots=2, chunk_steps=4, prefix_ids=pre,
        cache_dtype="int8")))
    spec = asyncio.run(run(demo_continuous_service(
        max_new_tokens=10, slots=2, chunk_steps=4, prefix_ids=pre,
        cache_dtype="int8", spec_window=4)))
    assert plain == spec
    assert all(isinstance(o, str) and o for o in plain)


def test_continuous_service_with_tp_sharded_params():
    """Continuous serving over TENSOR-PARALLEL weights: hand the service
    TP-sharded params on the (dp=2, idx=4) virtual mesh and it must
    emit exactly the tokens of the unsharded service — GSPMD inserts
    the per-layer collectives inside the jitted admit/decode steps; the
    KV cache state inherits the head sharding from the computation."""
    from jax.sharding import Mesh, NamedSharding
    from ragroute_tpu.llm.service import ByteTokenizer
    from ragroute_tpu.llm.sharding import shard_decoder_params

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = DecoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=8, num_kv_heads=4, head_dim=8,
                        intermediate_size=64)
    params = init_decoder_params(jax.random.key(5), cfg)
    tok = ByteTokenizer()
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("dp", "idx"))
    sharded = shard_decoder_params(params, cfg, mesh, axis="idx")

    def svc(p):
        return ContinuousGenerationService(
            p, cfg, tok, slots=2, cache_len=256, max_new_tokens=10,
            prompt_buckets=(128,), chunk_steps=4,
            cache_dtype=jnp.float32, eos_id=tok.eos_id,
            pad_id=tok.pad_id)

    msgs = [[{"role": "user", "content": u}]
            for u in ("hello tp", "sharded decode")]

    async def run(s):
        outs = await asyncio.gather(*[s.chat(m) for m in msgs])
        await s.stop()
        return outs

    ref = asyncio.run(run(svc(params)))
    got = asyncio.run(run(svc(sharded)))
    assert got == ref
