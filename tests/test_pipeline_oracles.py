"""Pipeline-level encoder oracles: the REAL sentence-transformers stacks.

The hand-rebuilt-module tests in ``test_encoders.py`` verify architecture
parity (JAX forward == torch forward). These tests verify the LAYER ABOVE:
tiny random-weight checkpoints run through the actual
``sentence_transformers`` pipeline (Transformer→Pooling→[Dense]→Normalize
— the reference's own execution model for the BEIR SentenceBERT models,
``model_zoo.py:58-118``, and the stack shape of the instructor-* models,
``instructor/instructor_model.py:388-576``) as oracle, so prompt /
pooling / normalization / projection drift at the pipeline level is
caught.

Not oracle-testable here (documented, not skipped silently): the SGPT
specb scheme and INSTRUCTOR context masking are custom tokenize overrides
that exist only inside the reference's subclasses / the unpackaged
InstructorEmbedding library — their token-level semantics are pinned by
``test_sgpt_specb_token_scheme`` / ``test_instructor_context_mask_semantics``
and the torch-fallback encoders mirror the reference execution model.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp


def _write_bert_tokenizer(d: str):
    """Minimal offline WordPiece vocab + BertTokenizer saved to ``d``."""
    from transformers import BertTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "what", "is", "diabetes", "fox", "the", "quick", "brown",
             "query", ":", "passage", "represent", "this", "sentence",
             "for", "searching", "relevant", "passages", "a", "##s",
             "jump", "##ed", "over", "lazy", "dog", "medical", "question"]
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    tok = BertTokenizer(os.path.join(d, "vocab.txt"))
    tok.save_pretrained(d)
    return tok


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    """Tiny random BERT checkpoint + tokenizer saved HF-style."""
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel

    d = str(tmp_path_factory.mktemp("tiny_bert"))
    _write_bert_tokenizer(d)
    torch.manual_seed(3)
    model = BertModel(HFBertConfig(
        vocab_size=31, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2))
    model.eval()
    model.save_pretrained(d)
    return d


def _jax_encoder_for(d: str, spec):
    from transformers import AutoConfig, AutoModel, AutoTokenizer

    from ragroute_tpu.encoders.bert import (
        config_from_hf, params_from_torch_bert)
    from ragroute_tpu.encoders.zoo import JaxBertEncoder

    hf_cfg = AutoConfig.from_pretrained(d)
    model = AutoModel.from_pretrained(d)
    cfg = config_from_hf(hf_cfg)
    params = params_from_torch_bert(model.state_dict(), cfg)
    return JaxBertEncoder(spec, params, cfg,
                          AutoTokenizer.from_pretrained(d))


def _st_pipeline(d: str, dim: int, pooling_mode: str):
    from sentence_transformers import SentenceTransformer, models

    transformer = models.Transformer(d, max_seq_length=32)
    poolm = models.Pooling(dim, pooling_mode=pooling_mode)
    return SentenceTransformer(modules=[transformer, poolm,
                                        models.Normalize()])


TEXTS = ["what is diabetes", "the quick brown fox", "a medical question"]


def test_st_pipeline_oracle_mean_normalize(tiny_bert_dir):
    """JaxBertEncoder(mean, normalize) == the real ST pipeline."""
    from ragroute_tpu.encoders.registry import EncoderSpec

    st = _st_pipeline(tiny_bert_dir, 32, "mean")
    want = st.encode(TEXTS, convert_to_numpy=True,
                     show_progress_bar=False)

    spec = EncoderSpec("tiny-st", "bert", tiny_bert_dir, 32,
                       "mean", normalize=True, max_length=32)
    got = _jax_encoder_for(tiny_bert_dir, spec).encode(TEXTS)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_st_pipeline_oracle_e5_query_prefix(tiny_bert_dir):
    """E5 semantics at the pipeline level: our spec auto-prefixes
    "query: " (custom_models.py:89-152); the oracle is the ST pipeline
    fed the manually prefixed text."""
    from ragroute_tpu.encoders.registry import EncoderSpec

    st = _st_pipeline(tiny_bert_dir, 32, "mean")
    want = st.encode(["query: " + t for t in TEXTS],
                     convert_to_numpy=True, show_progress_bar=False)

    spec = EncoderSpec("tiny-e5", "bert", tiny_bert_dir, 32,
                       "mean", normalize=True, query_prefix="query: ",
                       max_length=32)
    got = _jax_encoder_for(tiny_bert_dir, spec).encode(TEXTS)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    # and the prefix MATTERS (a stripped prefix would silently pass
    # the comparison above if the tokenizer ignored it)
    bare = st.encode(TEXTS, convert_to_numpy=True,
                     show_progress_bar=False)
    assert np.abs(bare - want).max() > 1e-3


def test_st_pipeline_oracle_angle_cls_prompt(tiny_bert_dir):
    """AnglE semantics: CLS pooling + normalize + the byte-exact
    retrieval prompt with NO separator (custom_models.py:19-86)."""
    from ragroute_tpu.encoders.registry import (
        ANGLE_QUERY_PROMPT, EncoderSpec)

    st = _st_pipeline(tiny_bert_dir, 32, "cls")
    want = st.encode([ANGLE_QUERY_PROMPT.format(text=t) for t in TEXTS],
                     convert_to_numpy=True, show_progress_bar=False)

    spec = EncoderSpec("tiny-angle", "bert", tiny_bert_dir, 32,
                       "cls", normalize=True,
                       query_template=ANGLE_QUERY_PROMPT, max_length=32)
    got = _jax_encoder_for(tiny_bert_dir, spec).encode(TEXTS)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_st_dense_module_semantics():
    """Our Dense application (pooled @ kernel + bias, identity
    activation) matches sentence_transformers.models.Dense — the module
    the instructor-* checkpoints ship as ``2_Dense``."""
    import torch
    from sentence_transformers import models

    torch.manual_seed(11)
    dense = models.Dense(16, 8, bias=True,
                         activation_function=torch.nn.Identity())
    pooled = torch.randn(3, 16)
    want = dense({"sentence_embedding": pooled})[
        "sentence_embedding"].detach().numpy()

    w = dense.linear.weight.detach().numpy()   # torch [out, in]
    b = dense.linear.bias.detach().numpy()
    got = pooled.numpy() @ w.T + b             # our loader's layout
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_find_instructor_dense_and_jax_application(tmp_path):
    """_find_instructor_dense reads a checkpoint-style 2_Dense dir and
    JaxInstructorEncoder applies it to the pooled embedding before
    normalization."""
    import torch
    from transformers import T5Config as HFT5Config, T5EncoderModel

    from ragroute_tpu.encoders import t5 as t5m
    from ragroute_tpu.encoders.custom import JaxInstructorEncoder
    from ragroute_tpu.encoders.registry import EncoderSpec
    from ragroute_tpu.encoders.zoo import _find_instructor_dense
    from tests.test_encoders import _make_local_tokenizer

    ckpt = tmp_path / "instructor-ckpt"
    (ckpt / "2_Dense").mkdir(parents=True)
    torch.manual_seed(5)
    w = torch.randn(8, 16)   # torch Linear layout [out, in]
    b = torch.randn(8)
    torch.save({"linear.weight": w, "linear.bias": b},
               str(ckpt / "2_Dense" / "pytorch_model.bin"))

    dense = _find_instructor_dense(str(ckpt))
    assert dense is not None
    kernel, bias = dense
    assert kernel.shape == (16, 8)
    np.testing.assert_allclose(kernel, w.numpy().T)
    np.testing.assert_allclose(bias, b.numpy())
    # a checkpoint without a Dense module yields None
    assert _find_instructor_dense(str(tmp_path / "nope")) is None

    tok = _make_local_tokenizer(with_eos=True)
    torch.manual_seed(7)
    model = T5EncoderModel(HFT5Config(
        vocab_size=tok.vocab_size + 10, d_model=16, d_kv=8, d_ff=32,
        num_layers=1, num_heads=2, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False))
    model.eval()
    spec = EncoderSpec("instructor-tiny", "t5", "hkunlp/instructor-large",
                       8, "mean", normalize=True)
    cfg = t5m.config_from_hf(model.config)
    params = t5m.params_from_torch_t5(model.state_dict(), cfg)

    with_dense = JaxInstructorEncoder(
        spec, params, cfg, tok, pad_to=48, dense=dense)

    texts = ["what is diabetes", "fox"]
    got = with_dense.encode(texts, dataset="nq")
    assert got.shape == (2, 8)
    # oracle: pooled (un-normalized) @ dense, then normalize — recompute
    # from the plain encoder with normalization effects removed
    spec_nonorm = EncoderSpec("instructor-tiny", "t5",
                              "hkunlp/instructor-large", 16, "mean",
                              normalize=False)
    pooled = JaxInstructorEncoder(
        spec_nonorm, params, cfg, tok, pad_to=48).encode(
            texts, dataset="nq")
    want = pooled @ kernel + bias
    want = want / np.maximum(
        np.linalg.norm(want, axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_st_pipeline_oracle_t5_dense(tmp_path):
    """Full instructor-shaped ST stack (T5 Transformer → mean Pooling →
    Dense → Normalize) as oracle for the JAX T5 path with the Dense
    hook and an empty instruction (context mask = attention mask)."""
    import torch
    from sentence_transformers import SentenceTransformer, models

    from ragroute_tpu.encoders import t5 as t5m
    from ragroute_tpu.encoders.custom import JaxInstructorEncoder
    from ragroute_tpu.encoders.registry import EncoderSpec
    from transformers import T5Config as HFT5Config, T5EncoderModel
    from tests.test_encoders import _make_local_tokenizer

    d = str(tmp_path / "tiny_t5")
    tok = _make_local_tokenizer(with_eos=True)
    torch.manual_seed(9)
    model = T5EncoderModel(HFT5Config(
        vocab_size=tok.vocab_size + 10, d_model=16, d_kv=8, d_ff=32,
        num_layers=1, num_heads=2, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False))
    model.eval()
    model.save_pretrained(d)
    tok.save_pretrained(d)

    try:
        transformer = models.Transformer(
            d, max_seq_length=48,
            # the local test tokenizer emits token_type_ids, which the
            # T5 encoder forward rejects
            tokenizer_args={
                "model_input_names": ["input_ids", "attention_mask"]})
    except Exception as e:  # ST lacking T5-encoder support in this env
        pytest.skip(f"sentence_transformers cannot load T5 encoder: {e}")
    dense_mod = models.Dense(16, 8, bias=True,
                             activation_function=torch.nn.Identity())
    st = SentenceTransformer(modules=[
        transformer, models.Pooling(16, pooling_mode="mean"), dense_mod,
        models.Normalize()])
    texts = ["what is diabetes", "fox jumped"]
    want = st.encode(texts, convert_to_numpy=True,
                     show_progress_bar=False)

    spec = EncoderSpec("instructor-tiny", "t5", "hkunlp/instructor-large",
                       8, "mean", normalize=True)
    cfg = t5m.config_from_hf(model.config)
    params = t5m.params_from_torch_t5(model.state_dict(), cfg)
    kernel = dense_mod.linear.weight.detach().numpy().T.copy()
    bias = dense_mod.linear.bias.detach().numpy()
    enc = JaxInstructorEncoder(spec, params, cfg, tok, pad_to=48,
                               dense=(kernel, bias))
    # instruction-free comparison: monkey-free empty instruction via the
    # tokenize helper (context_len <= 1 -> 0, i.e. pool over everything)
    from ragroute_tpu.encoders.custom import instructor_tokenize

    batch = instructor_tokenize(tok, "", texts, max_length=48, pad_to=48)
    got = np.asarray(enc._encode(
        params,
        jnp.asarray(batch["input_ids"], jnp.int32),
        jnp.asarray(batch["attention_mask"], jnp.int32),
        jnp.asarray(batch["pool_mask"], jnp.int32)), np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
