"""Encoder parity: the pure-JAX BERT vs torch transformers BertModel."""

import numpy as np
import pytest

import jax.numpy as jnp

from ragroute_tpu.encoders.bert import (
    BertConfig,
    bert_encode,
    config_from_hf,
    params_from_torch_bert,
    pool,
)
from ragroute_tpu.encoders.registry import ENCODER_SPECS
from ragroute_tpu.encoders.zoo import EncoderZoo, HashEncoder


@pytest.fixture(scope="module")
def tiny_torch_bert():
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    hf_cfg = HFBertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2)
    model = BertModel(hf_cfg)
    model.eval()
    return model, hf_cfg


def test_bert_matches_torch(tiny_torch_bert, rng):
    import torch

    model, hf_cfg = tiny_torch_bert
    cfg = config_from_hf(hf_cfg)
    params = params_from_torch_bert(model.state_dict(), cfg)

    bsz, seq = 3, 16
    ids = rng.integers(0, 128, (bsz, seq)).astype(np.int64)
    # ragged attention masks incl. fully padded tail
    mask = np.ones((bsz, seq), np.int64)
    mask[0, 10:] = 0
    mask[1, 5:] = 0
    types = rng.integers(0, 2, (bsz, seq)).astype(np.int64)

    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            token_type_ids=torch.from_numpy(types))
    outs = bert_encode(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), jnp.asarray(types, jnp.int32))

    got_h = np.asarray(outs["last_hidden"])
    want_h = want.last_hidden_state.numpy()
    # only compare unmasked positions (masked positions are unused
    # downstream and torch computes them with different padding effects)
    for b in range(bsz):
        n = mask[b].sum()
        np.testing.assert_allclose(
            got_h[b, :n], want_h[b, :n], rtol=1e-3, atol=1e-4)

    got_p = np.asarray(outs["pooler"])
    np.testing.assert_allclose(
        got_p, want.pooler_output.numpy(), rtol=1e-3, atol=1e-4)


def test_pooling_modes(rng):
    bsz, seq, h = 2, 8, 4
    hid = rng.standard_normal((bsz, seq, h)).astype(np.float32)
    mask = np.ones((bsz, seq), np.int32)
    mask[0, 5:] = 0
    outs = {"last_hidden": jnp.asarray(hid), "cls": jnp.asarray(hid[:, 0])}
    m = jnp.asarray(mask)

    np.testing.assert_allclose(
        np.asarray(pool(outs, m, "cls")), hid[:, 0], rtol=1e-6)

    want_mean0 = hid[0, :5].mean(0)
    np.testing.assert_allclose(
        np.asarray(pool(outs, m, "mean"))[0], want_mean0, rtol=1e-5)

    # weightedmean: position weights 1..n (SGPT scheme)
    w = np.arange(1, 6)[:, None]
    want_wm0 = (hid[0, :5] * w).sum(0) / w.sum()
    np.testing.assert_allclose(
        np.asarray(pool(outs, m, "weightedmean"))[0], want_wm0, rtol=1e-5)

    # lasttoken: last unmasked position
    np.testing.assert_allclose(
        np.asarray(pool(outs, m, "lasttoken"))[0], hid[0, 4], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pool(outs, m, "lasttoken"))[1], hid[1, 7], rtol=1e-6)


def test_registry_covers_all_world_encoders():
    from ragroute_tpu.config import WORLDS

    for world in WORLDS.values():
        for src in world.sources:
            spec = ENCODER_SPECS[src.encoder]
            assert spec.dim == src.embed_dim, (src.name, src.encoder)


def test_zoo_hash_fallback_offline():
    """With no weights downloadable, the zoo degrades to hash embeddings
    with correct dims and flags the backend."""
    from ragroute_tpu.config import get_world

    world = get_world("medrag")
    zoo = EncoderZoo(world, prefer="hash")
    embs = zoo.encode_query("what is diabetes")
    assert set(embs) == set(world.encoders)
    for enc, v in embs.items():
        assert v.shape == (ENCODER_SPECS[enc].dim,)
    assert all(b == "hash" for b in zoo.backends.values())
    # deterministic
    embs2 = zoo.encode_query("what is diabetes")
    np.testing.assert_array_equal(embs[world.encoders[0]],
                                  embs2[world.encoders[0]])


def test_hash_encoder_normalization():
    spec = ENCODER_SPECS["e5-base"]
    enc = HashEncoder(spec)
    v = enc.encode(["a", "b"])
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# MPNet (JAX) vs torch MPNetModel
# ---------------------------------------------------------------------------

def test_mpnet_matches_torch(rng):
    import torch
    from transformers import MPNetConfig as HFMPNetConfig, MPNetModel

    from ragroute_tpu.encoders import mpnet as mp

    torch.manual_seed(1)
    hf_cfg = HFMPNetConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, relative_attention_num_buckets=32)
    model = MPNetModel(hf_cfg)
    model.eval()

    cfg = mp.config_from_hf(hf_cfg)
    params = mp.params_from_torch_mpnet(model.state_dict(), cfg)

    bsz, seq = 3, 18
    ids = rng.integers(2, 120, (bsz, seq)).astype(np.int64)
    mask = np.ones((bsz, seq), np.int64)
    mask[0, 12:] = 0
    mask[1, 7:] = 0
    ids[mask == 0] = 1  # pad token id (MPNet padding_idx)

    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask))
    outs = mp.mpnet_encode(params, cfg, jnp.asarray(ids, jnp.int32),
                           jnp.asarray(mask, jnp.int32))
    got_h = np.asarray(outs["last_hidden"])
    want_h = want.last_hidden_state.numpy()
    for b in range(bsz):
        n = mask[b].sum()
        np.testing.assert_allclose(
            got_h[b, :n], want_h[b, :n], rtol=1e-3, atol=1e-4)


def test_mpnet_relative_position_bucket_matches_hf():
    import torch
    from transformers.models.mpnet.modeling_mpnet import MPNetEncoder

    from ragroute_tpu.encoders.mpnet import relative_position_bucket

    rel = np.arange(-300, 301).reshape(1, -1)
    want = MPNetEncoder.relative_position_bucket(
        torch.from_numpy(rel), num_buckets=32, max_distance=128).numpy()
    got = np.asarray(relative_position_bucket(jnp.asarray(rel), 32, 128))
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# SGPT specb scheme + INSTRUCTOR masked pooling (reference
# custom_models.py:183-229, instructor/instructor_model.py:223-386)
# ---------------------------------------------------------------------------

def _make_local_tokenizer(with_eos: bool = False):
    """Byte-level BPE built offline (no network) as a stand-in HF tokenizer."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<pad>", "</s>", "<unk>"])
    corpus = ["what is diabetes", "the [quick] {brown} fox",
              "represent the question for retrieving documents",
              "a b c d e f g h i j k l m n o p q r s t u v w x y z"] * 4
    tok.train_from_iterator(corpus, trainer)
    if with_eos:
        tok.post_processor = TemplateProcessing(
            single="$A </s>", pair="$A </s> $B </s>",
            special_tokens=[("</s>", tok.token_to_id("</s>"))])
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", eos_token="</s>",
        unk_token="<unk>")


def test_sgpt_specb_token_scheme():
    from ragroute_tpu.encoders.custom import specb_bracket_ids, specb_tokenize

    tok = _make_local_tokenizer()
    qo, qc, do, dc = specb_bracket_ids(tok)
    assert len({qo, qc, do, dc}) == 4

    batch = specb_tokenize(tok, ["what is diabetes", "fox"], is_query=True)
    ids, mask = batch["input_ids"], batch["attention_mask"]
    for r in range(2):
        n = mask[r].sum()
        assert ids[r, 0] == qo              # leading "[" token
        assert ids[r, n - 1] == qc          # trailing "]" token
        # interior equals the plain tokenization (no bracket merging)
        inner = tok.encode(["what is diabetes", "fox"][r],
                           add_special_tokens=False)
        assert ids[r, 1:n - 1].tolist() == inner

    dbatch = specb_tokenize(tok, ["doc text"], is_query=False)
    n = dbatch["attention_mask"][0].sum()
    assert dbatch["input_ids"][0, 0] == do
    assert dbatch["input_ids"][0, n - 1] == dc


def test_sgpt_encoder_weighted_mean(rng):
    import torch
    from transformers import GPT2Config, GPT2Model

    from ragroute_tpu.encoders.custom import SGPTEncoder, specb_tokenize
    from ragroute_tpu.encoders.registry import EncoderSpec

    tok = _make_local_tokenizer()
    torch.manual_seed(2)
    model = GPT2Model(GPT2Config(
        vocab_size=tok.vocab_size + 10, n_positions=64, n_embd=16,
        n_layer=1, n_head=2))
    spec = EncoderSpec("sgpt-tiny-specb", "gpt", "local", 16,
                       "weightedmean", normalize=False)
    enc = SGPTEncoder(spec, model=model, tokenizer=tok)
    emb = enc.encode(["what is diabetes", "fox"])
    assert emb.shape == (2, 16)

    # independent recomputation of the SGPT formula
    batch = specb_tokenize(tok, ["what is diabetes", "fox"])
    with torch.no_grad():
        h = model(input_ids=torch.from_numpy(batch["input_ids"]),
                  attention_mask=torch.from_numpy(batch["attention_mask"])
                  ).last_hidden_state.numpy()
    m = batch["attention_mask"]
    for r in range(2):
        n = m[r].sum()
        w = np.arange(1, n + 1, dtype=np.float64)[:, None]
        want = (h[r, :n] * w).sum(0) / w.sum()
        np.testing.assert_allclose(emb[r], want, rtol=1e-4, atol=1e-5)


def test_instructor_context_mask_semantics():
    from ragroute_tpu.encoders.custom import instructor_tokenize

    tok = _make_local_tokenizer(with_eos=True)
    instruction = "represent the question for retrieving documents "
    batch = instructor_tokenize(tok, instruction, ["what is diabetes"])
    # reference semantics: context_len = sum(attn(tok(instruction))) - 1
    ctx_ids = tok([instruction], return_tensors="np")
    want_ctx = int(ctx_ids["attention_mask"].sum()) - 1
    pool, attn = batch["pool_mask"][0], batch["attention_mask"][0]
    assert pool[:want_ctx].sum() == 0          # instruction masked out
    assert (pool[want_ctx:] == attn[want_ctx:]).all()
    assert attn[:want_ctx].sum() == want_ctx   # model still SEES it


def test_instructor_encoder(rng):
    import torch
    from transformers import T5Config, T5EncoderModel

    from ragroute_tpu.encoders.custom import (
        InstructorEncoder,
        instructor_instruction,
        masked_mean_pool,
    )
    from ragroute_tpu.encoders.registry import EncoderSpec

    # the vendored instruction table has all 3 instructor model sizes and
    # the feb4rag datasets, query+corpus sides
    ins = instructor_instruction("hkunlp/instructor-large",
                                 "trec-covid", "query")
    assert ins.startswith("Represent the")
    assert instructor_instruction("instructor-xl", "scifact", "corpus")

    tok = _make_local_tokenizer(with_eos=True)
    torch.manual_seed(3)
    model = T5EncoderModel(T5Config(
        vocab_size=tok.vocab_size + 10, d_model=16, d_kv=8, d_ff=32,
        num_layers=1, num_heads=2))
    spec = EncoderSpec("instructor-tiny", "t5", "hkunlp/instructor-large",
                       16, "mean", normalize=True)
    enc = InstructorEncoder(spec, model=model, tokenizer=tok)
    emb = enc.encode(["what is diabetes", "fox"], dataset="nq")
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)

    # pooled value excludes instruction tokens: recompute independently
    from ragroute_tpu.encoders.custom import instructor_tokenize

    instruction = instructor_instruction(
        "hkunlp/instructor-large", "nq", "query")
    batch = instructor_tokenize(tok, instruction, ["what is diabetes"])
    with torch.no_grad():
        h = model(input_ids=torch.from_numpy(batch["input_ids"]),
                  attention_mask=torch.from_numpy(batch["attention_mask"])
                  ).last_hidden_state.numpy()
    want = masked_mean_pool(h, batch["pool_mask"])[0]
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(emb[0], want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# GPT-J (JAX) vs torch GPTJModel / T5 encoder (JAX) vs torch T5EncoderModel
# ---------------------------------------------------------------------------

def test_gptj_matches_torch(rng):
    import torch
    from transformers import GPTJConfig as HFGPTJConfig, GPTJModel

    from ragroute_tpu.encoders import gptj as gj

    torch.manual_seed(4)
    hf_cfg = HFGPTJConfig(
        vocab_size=96, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        rotary_dim=4, n_inner=None, activation_function="gelu_new",
        attn_pdrop=0.0, resid_pdrop=0.0, embd_pdrop=0.0)
    model = GPTJModel(hf_cfg)
    model.eval()
    cfg = gj.config_from_hf(hf_cfg)
    params = gj.params_from_torch_gptj(model.state_dict(), cfg)

    bsz, seq = 3, 12
    ids = rng.integers(0, 96, (bsz, seq)).astype(np.int64)
    mask = np.ones((bsz, seq), np.int64)
    mask[0, 8:] = 0
    mask[1, 5:] = 0

    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask))
    outs = gj.gptj_encode(params, cfg, jnp.asarray(ids, jnp.int32),
                          jnp.asarray(mask, jnp.int32))
    got_h = np.asarray(outs["last_hidden"])
    want_h = want.last_hidden_state.numpy()
    for b in range(bsz):
        n = mask[b].sum()
        np.testing.assert_allclose(
            got_h[b, :n], want_h[b, :n], rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("gated", [True, False])
def test_t5_encoder_matches_torch(rng, gated):
    import torch
    from transformers import T5Config as HFT5Config, T5EncoderModel

    from ragroute_tpu.encoders import t5 as t5m

    torch.manual_seed(5)
    hf_cfg = HFT5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        is_encoder_decoder=False)
    model = T5EncoderModel(hf_cfg)
    model.eval()
    cfg = t5m.config_from_hf(hf_cfg)
    assert cfg.gated_act == gated
    params = t5m.params_from_torch_t5(model.state_dict(), cfg)

    bsz, seq = 3, 14
    ids = rng.integers(0, 96, (bsz, seq)).astype(np.int64)
    mask = np.ones((bsz, seq), np.int64)
    mask[0, 9:] = 0
    mask[2, 4:] = 0

    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask))
    outs = t5m.t5_encode(params, cfg, jnp.asarray(ids, jnp.int32),
                         jnp.asarray(mask, jnp.int32))
    got_h = np.asarray(outs["last_hidden"])
    want_h = want.last_hidden_state.numpy()
    for b in range(bsz):
        n = mask[b].sum()
        np.testing.assert_allclose(
            got_h[b, :n], want_h[b, :n], rtol=1e-3, atol=1e-4)


def test_jax_sgpt_matches_torch_sgpt(rng):
    """JaxSGPTEncoder (pure-JAX GPT-J + specb + weightedmean) vs the torch
    SGPTEncoder on the SAME tiny checkpoint: independent stacks, same
    embeddings."""
    import torch
    from transformers import GPTJConfig as HFGPTJConfig, GPTJModel

    from ragroute_tpu.encoders import gptj as gj
    from ragroute_tpu.encoders.custom import JaxSGPTEncoder, SGPTEncoder
    from ragroute_tpu.encoders.registry import EncoderSpec

    tok = _make_local_tokenizer()
    torch.manual_seed(6)
    model = GPTJModel(HFGPTJConfig(
        vocab_size=tok.vocab_size + 10, n_positions=64, n_embd=16,
        n_layer=1, n_head=2, rotary_dim=4, activation_function="gelu_new",
        attn_pdrop=0.0, resid_pdrop=0.0, embd_pdrop=0.0))
    model.eval()
    spec = EncoderSpec("sgpt-tiny-specb", "gpt", "local", 16,
                       "weightedmean", normalize=False)

    torch_enc = SGPTEncoder(spec, model=model, tokenizer=tok)
    cfg = gj.config_from_hf(model.config)
    params = gj.params_from_torch_gptj(model.state_dict(), cfg)
    jax_enc = JaxSGPTEncoder(spec, params, cfg, tok, pad_to=32)

    texts = ["what is diabetes", "the [quick] {brown} fox"]
    np.testing.assert_allclose(
        jax_enc.encode(texts), torch_enc.encode(texts),
        rtol=1e-3, atol=1e-4)
    # doc-side brackets too
    np.testing.assert_allclose(
        jax_enc.encode(texts, is_query=False),
        torch_enc.encode(texts, is_query=False), rtol=1e-3, atol=1e-4)


def test_jax_instructor_matches_torch_instructor(rng):
    import torch
    from transformers import T5Config as HFT5Config, T5EncoderModel

    from ragroute_tpu.encoders import t5 as t5m
    from ragroute_tpu.encoders.custom import (
        InstructorEncoder,
        JaxInstructorEncoder,
    )
    from ragroute_tpu.encoders.registry import EncoderSpec

    tok = _make_local_tokenizer(with_eos=True)
    torch.manual_seed(7)
    model = T5EncoderModel(HFT5Config(
        vocab_size=tok.vocab_size + 10, d_model=16, d_kv=8, d_ff=32,
        num_layers=1, num_heads=2, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False))
    model.eval()
    spec = EncoderSpec("instructor-tiny", "t5", "hkunlp/instructor-large",
                       16, "mean", normalize=True)

    torch_enc = InstructorEncoder(spec, model=model, tokenizer=tok)
    cfg = t5m.config_from_hf(model.config)
    params = t5m.params_from_torch_t5(model.state_dict(), cfg)
    jax_enc = JaxInstructorEncoder(spec, params, cfg, tok, pad_to=48)

    texts = ["what is diabetes", "fox"]
    np.testing.assert_allclose(
        jax_enc.encode(texts, dataset="nq"),
        torch_enc.encode(texts, dataset="nq"), rtol=1e-3, atol=1e-4)


def test_serving_cast_bf16_fidelity(tmp_path):
    """Zoo loaders cast f32 weights to the serving compute dtype (bf16
    by default — measured 15.4x at B=1 on the v5e) and the pooled,
    normalized embedding stays f32 with cos ~ 1 vs the f32 forward.
    RAGROUTE_ENCODER_DTYPE=float32 restores bit-parity loading."""
    import torch
    from transformers import (AutoTokenizer, BertConfig as HFBertConfig,
                              BertModel, BertTokenizer)

    import jax.numpy as jnp
    from ragroute_tpu.encoders.registry import EncoderSpec
    from ragroute_tpu.encoders.zoo import _load_jax_bert

    d = str(tmp_path / "tiny_bert")
    torch.manual_seed(5)
    model = BertModel(HFBertConfig(
        vocab_size=40, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2))
    model.eval()
    model.save_pretrained(d)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        chr(ord("a") + i) for i in range(26)]
    with open(f"{d}/vocab.txt", "w") as f:
        f.write("\n".join(vocab))
    BertTokenizer(f"{d}/vocab.txt").save_pretrained(d)

    spec = EncoderSpec(name="tiny", family="bert", hf_name=d, dim=32,
                       pooling="mean", normalize=True, max_length=16)

    import ragroute_tpu.config as cfg_mod

    old = cfg_mod.ENCODER_COMPUTE_DTYPE
    try:
        cfg_mod.ENCODER_COMPUTE_DTYPE = "float32"
        enc_f32 = _load_jax_bert(spec)
        cfg_mod.ENCODER_COMPUTE_DTYPE = "bfloat16"
        enc_bf16 = _load_jax_bert(spec)
    finally:
        cfg_mod.ENCODER_COMPUTE_DTYPE = old

    assert enc_f32.params["embeddings"]["word"].dtype == jnp.float32
    assert enc_bf16.params["embeddings"]["word"].dtype == jnp.bfloat16

    texts = ["a b c", "d e f g"]
    a = enc_f32.encode(texts)
    b = enc_bf16.encode(texts)
    assert a.dtype == np.float32 and b.dtype == np.float32
    cos = (a * b).sum(-1)  # both normalized
    assert (cos > 0.999).all()
