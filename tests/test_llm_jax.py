"""Parity gates for the pure-JAX llama-family decoder (ragroute_tpu.llm).

Oracles are real ``transformers`` causal-LM modules built in-process with
tiny random-weight configs — the same strategy as tests/test_encoders.py.
Covers: Llama logits (incl. left-padded ragged batches and Llama-3.1 rope
rescaling), Qwen3 logits (qk-norm, decoupled head_dim, tied embeddings),
greedy generation vs ``model.generate``, and KV-cache internal
consistency (decode_step == re-prefill at every step).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ragroute_tpu.llm.model import (  # noqa: E402
    DecoderConfig, config_from_hf, decode_step, generate, init_cache,
    init_decoder_params, params_from_torch_causal_lm, prefill,
)


def _tiny_llama(rope_scaling=None, seed=0):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    hf_cfg = LlamaConfig(
        vocab_size=97, hidden_size=48, intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0,
        rms_norm_eps=1e-6, rope_scaling=rope_scaling,
        attn_implementation="eager")
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params = params_from_torch_causal_lm(model.state_dict(), cfg)
    return model, cfg, params


def _tiny_qwen3(seed=1):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(seed)
    hf_cfg = Qwen3Config(
        vocab_size=83, hidden_size=40, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,  # decoupled: != hidden/heads
        max_position_embeddings=64, rope_theta=1e6, rms_norm_eps=1e-6,
        tie_word_embeddings=True, attn_implementation="eager")
    model = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.qk_norm and cfg.tie_embeddings and cfg.head_dim == 16
    params = params_from_torch_causal_lm(model.state_dict(), cfg)
    return model, cfg, params


def _left_padded_batch(vocab, lengths, p, seed=3):
    rng = np.random.default_rng(seed)
    ids = np.zeros((len(lengths), p), np.int32)
    mask = np.zeros((len(lengths), p), np.int32)
    for b, n in enumerate(lengths):
        ids[b, p - n:] = rng.integers(1, vocab, n)
        mask[b, p - n:] = 1
    return ids, mask


def _torch_logits(model, ids, mask):
    pos = np.maximum(np.cumsum(mask, axis=1) - 1, 0)
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids, dtype=torch.long),
                    attention_mask=torch.tensor(mask, dtype=torch.long),
                    position_ids=torch.tensor(pos, dtype=torch.long))
    return out.logits.numpy()


@pytest.mark.parametrize("rope_scaling", [
    None,
    {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 16},
])
def test_jax_llama_logits_match_torch(rope_scaling):
    model, cfg, params = _tiny_llama(rope_scaling)
    ids, mask = _left_padded_batch(cfg.vocab_size, [12, 7, 12], 12)
    ref = _torch_logits(model, ids, mask)
    cache = init_cache(cfg, ids.shape[0], ids.shape[1] + 1)
    logits, _ = prefill(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                        cache)
    np.testing.assert_allclose(np.asarray(logits), ref[:, -1], rtol=2e-4,
                               atol=2e-4)


def test_jax_qwen3_logits_match_torch():
    model, cfg, params = _tiny_qwen3()
    ids, mask = _left_padded_batch(cfg.vocab_size, [9, 4], 9)
    ref = _torch_logits(model, ids, mask)
    cache = init_cache(cfg, ids.shape[0], ids.shape[1] + 2)
    logits, _ = prefill(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                        cache)
    np.testing.assert_allclose(np.asarray(logits), ref[:, -1], rtol=2e-4,
                               atol=2e-4)


def test_greedy_generate_matches_torch_generate():
    model, cfg, params = _tiny_llama()
    lengths = [8, 3, 6]
    p, max_new = 8, 10
    ids, mask = _left_padded_batch(cfg.vocab_size, lengths, p, seed=11)
    eos = cfg.vocab_size - 1  # unlikely to fire on random weights
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            max_new_tokens=max_new, do_sample=False,
            eos_token_id=eos, pad_token_id=0)
    ref_new = ref[:, p:].numpy()
    toks, _ = jax.jit(
        lambda pr, i, m: generate(pr, cfg, i, m, max_new, eos_id=eos,
                                  pad_id=0))(params, jnp.asarray(ids),
                                             jnp.asarray(mask))
    toks = np.asarray(toks)
    # compare up to each row's eos (HF pads after eos with pad_token_id=0,
    # ours emits pad_id=0 as well → directly comparable)
    np.testing.assert_array_equal(toks, ref_new[:, :max_new])


def test_decode_step_consistent_with_prefill():
    """Decoding token-by-token through the KV cache must equal running a
    fresh full forward over the extended sequence at every step."""
    _, cfg, params = _tiny_qwen3(seed=5)
    lengths = [6, 2]
    p, steps = 6, 5
    ids, mask = _left_padded_batch(cfg.vocab_size, lengths, p, seed=7)
    cache = init_cache(cfg, 2, p + steps)
    logits, cache = prefill(params, cfg, jnp.asarray(ids),
                            jnp.asarray(mask), cache)
    lens = jnp.asarray(lengths, jnp.int32)

    cur_ids, cur_mask = ids.copy(), mask.copy()
    tok = np.asarray(jnp.argmax(logits, -1), np.int32)
    for t in range(steps):
        # oracle: extend the left-padded sequence and re-prefill
        cur_ids = np.concatenate([cur_ids, tok[:, None]], axis=1)
        cur_mask = np.concatenate(
            [cur_mask, np.ones((2, 1), np.int32)], axis=1)
        oracle_cache = init_cache(cfg, 2, cur_ids.shape[1])
        oracle_logits, _ = prefill(params, cfg, jnp.asarray(cur_ids),
                                   jnp.asarray(cur_mask), oracle_cache)
        step_logits, cache = decode_step(
            params, cfg, cache, jnp.asarray(tok), lens, p,
            jnp.asarray(t, jnp.int32))
        np.testing.assert_allclose(np.asarray(step_logits),
                                   np.asarray(oracle_logits),
                                   rtol=2e-4, atol=2e-4)
        tok = np.asarray(jnp.argmax(step_logits, -1), np.int32)


def test_generate_stops_at_eos_and_pads():
    cfg = DecoderConfig(vocab_size=31, hidden_size=32, num_layers=1,
                        num_heads=2, num_kv_heads=2, head_dim=16,
                        intermediate_size=48)
    params = init_decoder_params(jax.random.key(0), cfg)
    # sample (temperature 1, fixed seed) so tokens vary; declare eos = the
    # first token whose value has not appeared before it, then re-run with
    # that eos: the sequence must match up to it and pad after it.
    ids = jnp.asarray(np.full((1, 4), 5, np.int32))
    mask = jnp.ones((1, 4), jnp.int32)
    kw = dict(eos_id=-1, pad_id=0, temperature=1.0, rng_seed=9)
    toks = np.asarray(generate(params, cfg, ids, mask, 6, **kw)[0])[0]
    j, eos = next((j, int(t)) for j, t in enumerate(toks)
                  if int(t) not in toks[:j])
    kw["eos_id"] = eos
    toks2, done = generate(params, cfg, ids, mask, 6, **kw)
    toks2 = np.asarray(toks2)[0]
    np.testing.assert_array_equal(toks2[:j + 1], toks[:j + 1])
    assert toks2[j] == eos
    assert (toks2[j + 1:] == 0).all()
    assert bool(np.asarray(done)[0])


# ---------------------------------------------------------------------------
# GenerationService (batched async front-end)
# ---------------------------------------------------------------------------

import asyncio  # noqa: E402

from ragroute_tpu.llm.service import (  # noqa: E402
    ByteTokenizer, GenerationService, demo_service,
)


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    for text in ("hello", "ünïcödé ✓", ""):
        ids = tok.encode(text)
        assert ids[0] == tok.bos_id
        assert tok.decode(ids) == text
    tmpl = tok.apply_chat_template(
        [{"role": "system", "content": "s"}, {"role": "user", "content": "u"}])
    assert tmpl.endswith("<|assistant|>\n") and "<|user|>" in tmpl


def test_generation_service_batches_concurrent_calls():
    svc = demo_service(max_new_tokens=8, flush_interval_s=0.01)

    async def run():
        msgs = [[{"role": "user", "content": f"question {i}?"}]
                for i in range(5)]
        outs = await asyncio.gather(*[svc.chat(m) for m in msgs])
        await svc.stop()
        return outs

    outs = asyncio.run(run())
    assert len(outs) == 5
    assert all(isinstance(o, str) for o in outs)
    # 5 concurrent calls must have shared batches, not run 5 singles
    assert svc.batches < 5
    # deterministic: same prompt -> same completion (greedy, fixed weights)
    svc2 = demo_service(max_new_tokens=8, flush_interval_s=0.01)

    async def rerun():
        out = await svc2.chat([{"role": "user", "content": "question 0?"}])
        await svc2.stop()
        return out

    assert asyncio.run(rerun()) == outs[0]


def test_generation_service_prompt_truncation_keeps_tail():
    svc = demo_service(max_new_tokens=4, flush_interval_s=0.0)
    long = "x" * 4096 + " FINAL"

    async def run():
        out = await svc.chat([{"role": "user", "content": long}])
        await svc.stop()
        return out

    assert isinstance(asyncio.run(run()), str)
    # the encoded prompt was clipped to the largest bucket from the LEFT
    assert max(svc._compiled)[0] == svc.prompt_buckets[-1]


def test_llm_client_jax_backend_timeout_contract():
    from ragroute_tpu.engine.llm import LLMClient

    svc = demo_service(max_new_tokens=4, flush_interval_s=0.0)
    client = LLMClient("jax", service=svc)

    async def run():
        res = await client.chat("llama3.1-8B-instruct",
                                [{"role": "user", "content": "hi"}])
        await svc.stop()
        return res

    res = asyncio.run(run())
    assert res.ok and res.generate_time >= 0
    assert isinstance(res.answer, str)


def test_server_e2e_with_jax_llm_backend():
    """Full HTTP path with generation ON via the TPU-native backend: the
    answer field is produced by the jax decoder (demo weights)."""
    import sys

    sys.path.insert(0, "tests")
    from test_server import make_server, query_server
    from ragroute_tpu.engine.llm import LLMClient

    svc = demo_service(max_new_tokens=8, flush_interval_s=0.0)

    async def run():
        syn, server = make_server(
            disable_llm=False, llm=LLMClient("jax", service=svc))
        await server.start()
        try:
            q = syn.questions[0]
            status, body = await query_server(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert status == 200
            assert isinstance(body["answer"], str)
            assert body["metadata"]["generate_time"] > 0
            assert len(body["metadata"]["top_docs"]) == syn.world.k
        finally:
            await server.stop()
            await svc.stop()

    asyncio.run(run())


# ---------------------------------------------------------------------------
# Tensor-parallel generation over the virtual mesh
# ---------------------------------------------------------------------------

def test_tp_sharded_generate_matches_single_device():
    """(dp=2, idx=4) mesh: TP-sharded weights + dp-sharded batch must
    produce the same greedy tokens as the unsharded single-device run."""
    from jax.sharding import Mesh, NamedSharding
    from ragroute_tpu.llm.sharding import (data_spec, decoder_param_specs,
                                           shard_decoder_params)

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = DecoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=8, num_kv_heads=4, head_dim=8,
                        intermediate_size=64)
    params = init_decoder_params(jax.random.key(2), cfg)
    ids, mask = _left_padded_batch(cfg.vocab_size, [8, 3, 6, 8], 8, seed=13)
    max_new = 6

    ref, _ = jax.jit(lambda pr, i, m: generate(
        pr, cfg, i, m, max_new, eos_id=-1, pad_id=0))(
        params, jnp.asarray(ids), jnp.asarray(mask))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "idx"))
    sharded = shard_decoder_params(params, cfg, mesh, axis="idx")
    dspec = data_spec(mesh)
    ds = NamedSharding(mesh, dspec)
    toks, _ = jax.jit(
        lambda pr, i, m: generate(pr, cfg, i, m, max_new, eos_id=-1,
                                  pad_id=0),
        in_shardings=(jax.tree.map(
            lambda s: NamedSharding(mesh, s), decoder_param_specs(cfg)),
            ds, ds))(sharded, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


# ---------------------------------------------------------------------------
# int8 weight-only quantization
# ---------------------------------------------------------------------------

def test_int8_quantized_decoder_close_to_f32():
    """Weight-only int8 (per-channel scales) must track the f32 logits
    within ~1% relative error and generate without shape/dtype issues,
    for both tied (quantized embed doubles as the head) and untied
    heads."""
    from ragroute_tpu.llm.model import quantize_decoder_params

    for tied in (False, True):
        cfg = DecoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                            num_heads=4, num_kv_heads=2, head_dim=8,
                            intermediate_size=64, tie_embeddings=tied,
                            qk_norm=tied)
        params = init_decoder_params(jax.random.key(4), cfg)
        qparams = quantize_decoder_params(params, cfg)
        ids, mask = _left_padded_batch(cfg.vocab_size, [10, 5], 10, seed=21)
        ref, _ = prefill(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                         init_cache(cfg, 2, 12))
        got, _ = prefill(qparams, cfg, jnp.asarray(ids), jnp.asarray(mask),
                         init_cache(cfg, 2, 12))
        ref, got = np.asarray(ref), np.asarray(got)
        err = np.abs(got - ref) / (np.abs(ref).max() + 1e-9)
        # tiny RANDOM weights are the worst case for int8 (no structure,
        # d=32 gives no error averaging); real checkpoints sit far lower
        assert err.max() < 0.06, f"tied={tied}: max rel err {err.max()}"
        assert err.mean() < 0.01, f"tied={tied}: mean rel err {err.mean()}"
        toks, _ = generate(qparams, cfg, jnp.asarray(ids),
                           jnp.asarray(mask), 4, eos_id=-1, pad_id=0)
        assert np.asarray(toks).shape == (2, 4)


# ---------------------------------------------------------------------------
# int4 weight-only quantization (Pallas group-dequant matmul)
# ---------------------------------------------------------------------------

def test_int4_matmul_kernel_exact():
    """The Pallas kernel must reproduce the reference dequant matmul
    exactly (f32 activations) across batch/shape/group variations,
    including padding edges (odd batch, non-tile out dims)."""
    from ragroute_tpu.ops.int4_matmul import (dequant_int4, int4_matmul,
                                              quantize_int4)

    rng = np.random.default_rng(0)
    for (b, din, dout, group) in [(1, 256, 384, 64), (37, 512, 1000, 128),
                                  (8, 64, 200, 16), (300, 256, 131, 128)]:
        w = rng.standard_normal((din, dout)).astype(np.float32)
        x = rng.standard_normal((b, din)).astype(np.float32)
        packed, scale = quantize_int4(w, group=group)
        ref = x @ dequant_int4(packed, scale, group)
        got = np.asarray(int4_matmul(
            jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scale),
            group=group))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 1e-5, (b, din, dout, group, rel)


def test_int4_pack_roundtrip():
    from ragroute_tpu.ops.int4_matmul import dequant_int4, quantize_int4

    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 40)).astype(np.float32)
    packed, scale = quantize_int4(w, group=16)
    assert packed.shape == (32, 40) and packed.dtype == np.int8
    assert scale.shape == (4, 40)
    wd = dequant_int4(packed, scale, 16)
    # quantization error bounded by half a step per group
    step = np.repeat(scale, 16, axis=0)
    assert (np.abs(wd - w) <= 0.5 * step + 1e-6).all()


def test_int4_quantized_decoder_close_to_f32():
    """int4 group-scaled weights must track the f32 logits through the
    full decoder pipeline for both tied and untied heads. Round-to-
    nearest int4 on TINY unstructured random weights is the worst case
    (no error averaging, no channel structure — measured r~0.92 here vs
    the near-exact behavior real checkpoints with group-128 scales
    show), so the gate is a correlation + mean-error bound, not the
    int8-style pointwise bound; the KERNEL itself is exact w.r.t. the
    stored codes (test_int4_matmul_kernel_exact)."""
    from ragroute_tpu.llm.model import quantize_decoder_params

    for tied in (False, True):
        cfg = DecoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                            num_heads=4, num_kv_heads=2, head_dim=8,
                            intermediate_size=64, tie_embeddings=tied,
                            qk_norm=tied)
        params = init_decoder_params(jax.random.key(4), cfg)
        qparams = quantize_decoder_params(params, cfg, bits=4)
        ids, mask = _left_padded_batch(cfg.vocab_size, [10, 5], 10,
                                       seed=21)
        ref, _ = prefill(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                         init_cache(cfg, 2, 12))
        got, _ = prefill(qparams, cfg, jnp.asarray(ids),
                         jnp.asarray(mask), init_cache(cfg, 2, 12))
        ref, got = np.asarray(ref), np.asarray(got)
        r = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
        err = np.abs(got - ref) / (np.abs(ref).max() + 1e-9)
        assert r > 0.9, f"tied={tied}: logit correlation {r}"
        assert err.mean() < 0.15, f"tied={tied}: mean rel err {err.mean()}"
        toks, _ = generate(qparams, cfg, jnp.asarray(ids),
                           jnp.asarray(mask), 4, eos_id=-1, pad_id=0)
        assert np.asarray(toks).shape == (2, 4)


def test_int4_embed_lookup_matches_dequant():
    """The head-form int4 embedding lookup (gather + XLA unpack) must
    equal dequantizing the full table and indexing it."""
    from ragroute_tpu.llm.model import QuantW4, _embed_lookup
    from ragroute_tpu.ops.int4_matmul import dequant_int4

    rng = np.random.default_rng(2)
    v, d = 50, 32
    table = rng.standard_normal((v, d)).astype(np.float32)
    e = QuantW4.quantize(table.T, group=16)   # head-form [D/2, V]
    full = dequant_int4(np.asarray(e.q), np.asarray(e.scale), 16).T
    params = {"embed": e, "ln_f": jnp.ones((d,), jnp.float32)}
    ids = jnp.asarray(rng.integers(0, v, (3, 5)), jnp.int32)
    got = np.asarray(_embed_lookup(params, ids))
    want = full[np.asarray(ids)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# int8 KV cache
# ---------------------------------------------------------------------------

def test_quant_kv_roundtrip():
    from ragroute_tpu.llm.model import quant_kv

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 7, 4, 16)) * 3.0, jnp.float32)
    q, s = quant_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 7, 4)
    back = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    # error bounded by half a step per (pos, head)
    step = np.asarray(s)[..., None]
    assert (np.abs(back - np.asarray(x)) <= 0.5 * step + 1e-6).all()


def test_int8_kv_cache_generate_close_to_f32():
    """generate(cache_dtype='int8') must produce near-identical logits
    to the f32 cache (per-(position,head) scales are near-lossless for
    attention) and agree on almost every greedy token."""
    cfg = DecoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=4, num_kv_heads=2, head_dim=8,
                        intermediate_size=64)
    params = init_decoder_params(jax.random.key(4), cfg)
    ids, mask = _left_padded_batch(cfg.vocab_size, [10, 5], 10, seed=21)
    ref, _ = generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                      16, eos_id=-1, pad_id=0)
    got, _ = generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                      16, eos_id=-1, pad_id=0, cache_dtype="int8")
    agree = (np.asarray(ref) == np.asarray(got)).mean()
    assert agree > 0.9, f"greedy token agreement {agree}"


def test_int8_kv_cache_structure():
    from ragroute_tpu.llm.model import init_cache

    cfg = DecoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=4, num_kv_heads=2, head_dim=8,
                        intermediate_size=64)
    c = init_cache(cfg, 3, 20, "int8")
    assert c["k"].dtype == jnp.int8 and c["ks"].shape == (2, 3, 20, 2)
    import pytest

    with pytest.raises(ValueError, match="cache dtype"):
        init_cache(cfg, 3, 20, "int2")


# ---------------------------------------------------------------------------
# torch->JAX conversion cache
# ---------------------------------------------------------------------------

def test_params_cache_roundtrip_and_invalidation(tmp_path):
    from ragroute_tpu.llm.service import (load_params_cache,
                                          save_params_cache)

    cfg = DecoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=4, num_kv_heads=2, head_dim=8,
                        intermediate_size=64)
    params = init_decoder_params(jax.random.key(9), cfg,
                                 dtype=jnp.bfloat16)
    f = str(tmp_path / "cache.npz")
    save_params_cache(f, params, "fp-1")
    got = load_params_cache(f, "fp-1")
    assert got is not None
    assert jax.tree.all(jax.tree.map(
        lambda a, b: a.dtype == b.dtype and bool(jnp.all(a == b)),
        params, got))
    # wrong fingerprint -> stale -> None
    assert load_params_cache(f, "fp-2") is None
    # corrupt file -> graceful None, not a crash
    with open(f, "wb") as fh:
        fh.write(b"not an npz")
    assert load_params_cache(f, "fp-1") is None


def test_from_checkpoint_uses_conversion_cache(tmp_path, monkeypatch):
    """Second boot must come from the npz cache: torch model loading is
    POISONED after the first call and from_checkpoint still serves
    identical weights."""
    import transformers

    from ragroute_tpu.llm.service import ByteTokenizer, GenerationService

    model, cfg, _ = _tiny_llama(seed=5)
    d = str(tmp_path / "ckpt")
    model.save_pretrained(d)
    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        staticmethod(lambda *a, **k: ByteTokenizer()))

    svc1 = GenerationService.from_checkpoint(d)
    cache = os.path.join(d, "ragroute_jax_params.npz")
    assert os.path.exists(cache)

    def boom(*a, **k):
        raise AssertionError("torch conversion ran despite a valid cache")

    monkeypatch.setattr(transformers.AutoModelForCausalLM,
                        "from_pretrained", staticmethod(boom))
    svc2 = GenerationService.from_checkpoint(d)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)), svc1.params, svc2.params))

    # touching the weights invalidates the cache -> conversion re-runs
    # (and here, the poisoned loader proves it by raising)
    weights = [n for n in os.listdir(d)
               if n.endswith((".safetensors", ".bin"))]
    p = os.path.join(d, weights[0])
    os.utime(p, (os.path.getatime(p), os.path.getmtime(p) + 7))
    with pytest.raises(AssertionError, match="torch conversion ran"):
        GenerationService.from_checkpoint(d)


# ---------------------------------------------------------------------------
# sampling controls (temperature / top-k / top-p)
# ---------------------------------------------------------------------------

def test_sample_token_top_k_membership_and_top_p_nucleus():
    from ragroute_tpu.llm.model import sample_token

    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0, -1.0, -2.0, 0.5]])
    keys = [jax.random.key(i) for i in range(300)]

    # top_k=3 -> only the 3 highest-logit tokens {4, 3, 2} ever appear
    draws = {int(sample_token(logits, k, 1.0, top_k=3)[0]) for k in keys}
    assert draws <= {4, 3, 2} and len(draws) >= 2

    # top_k=1 == greedy at any temperature
    assert all(int(sample_token(logits, k, 5.0, top_k=1)[0]) == 4
               for k in keys[:20])

    # a dominant token (prob ~0.98) with top_p=0.5 -> nucleus is just it
    dom = jnp.asarray([[8.0, 1.0, 1.0, 1.0]])
    assert all(int(sample_token(dom, k, 1.0, top_p=0.5)[0]) == 0
               for k in keys[:50])

    # near-uniform row, top_p=0.5 -> roughly half the tokens reachable,
    # and the argmax is always in the nucleus
    uni = jnp.asarray([[0.02, 0.01, 0.0, -0.01, -0.02, -0.03, -0.04,
                        -0.05]])
    draws = {int(sample_token(uni, k, 1.0, top_p=0.5)[0]) for k in keys}
    assert 0 in draws and draws <= {0, 1, 2, 3, 4}

    # no truncation == plain categorical (same key, same draw)
    for k in keys[:10]:
        a = int(sample_token(logits, k, 0.7)[0])
        b = int(sample_token(logits, k, 0.7, top_k=0, top_p=1.0)[0])
        assert a == b


def test_generate_with_sampling_deterministic_per_seed():
    cfg = DecoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=4, num_kv_heads=2, head_dim=8,
                        intermediate_size=64)
    params = init_decoder_params(jax.random.key(4), cfg)
    ids, mask = _left_padded_batch(cfg.vocab_size, [10, 5], 10, seed=21)
    kw = dict(eos_id=-1, pad_id=0, temperature=0.8, top_k=8, top_p=0.9)
    a, _ = generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask), 12,
                    rng_seed=3, **kw)
    b, _ = generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask), 12,
                    rng_seed=3, **kw)
    c, _ = generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask), 12,
                    rng_seed=4, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (np.asarray(a) != np.asarray(c)).any()
    assert (np.asarray(a) < cfg.vocab_size).all()


def test_degenerate_sampling_params_rejected_at_construction():
    """top_p=0 (would silently emit token id 0 forever) and negative
    top_k (would crash every admission) must be rejected when the
    service is BUILT, not at first decode."""
    from ragroute_tpu.llm.continuous import demo_continuous_service
    from ragroute_tpu.llm.service import demo_service

    with pytest.raises(ValueError, match="top_p"):
        demo_service(temperature=0.8, top_p=0.0)
    with pytest.raises(ValueError, match="top_k"):
        demo_service(temperature=0.8, top_k=-1)
    with pytest.raises(ValueError, match="top_p"):
        demo_continuous_service(temperature=0.8, top_p=-0.5)
