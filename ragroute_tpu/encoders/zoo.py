"""EncoderZoo: load and run the query encoders for a world.

Load order per encoder (replacing the reference's CustomModel/BeirModels
loader split, ``model_zoo.py:12-118``):

1. **JAX path** (BERT-family): HF checkpoint from the local cache →
   :func:`ragroute_tpu.encoders.bert.params_from_torch_bert` → jitted
   encode on the default backend. This is the TPU-native path.
2. **torch fallback** (MPNet/GPT/T5 families, or if 1 fails):
   sentence-transformers / transformers on host CPU, mirroring the
   reference's own execution model.
3. **hash stub**: deterministic text-hash embeddings (offline dev /
   simulation; clearly flagged via ``EncoderZoo.backends``).
"""

from __future__ import annotations

import hashlib
import logging
from typing import Dict, List, Optional

import numpy as np

from ragroute_tpu.config import WorldConfig
from ragroute_tpu.encoders.bert import (
    BertConfig,
    bert_encode,
    config_from_hf,
    params_from_torch_bert,
    pool,
)
from ragroute_tpu.encoders.registry import ENCODER_SPECS, EncoderSpec

logger = logging.getLogger("encoders")


class HashEncoder:
    """Deterministic stand-in when no weights are available."""

    backend = "hash"

    def __init__(self, spec: EncoderSpec):
        self.spec = spec

    def encode(self, texts: List[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.spec.dim), np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(
                hashlib.sha256(f"{self.spec.name}::{t}".encode())
                .digest()[:8], "little")
            rng = np.random.default_rng(seed)
            out[i] = rng.standard_normal(self.spec.dim).astype(np.float32)
        if self.spec.normalize:
            out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True),
                              1e-12)
        return out

    def encode_corpus(self, texts: List[str]) -> np.ndarray:
        # doc-side formatting salted in so query/passage spaces differ
        # exactly when the real prefixes differ
        return self.encode([self.spec.format_passage(t) for t in texts])


class JaxBertEncoder:
    """BERT-family encoder running in JAX (jitted, static seq length)."""

    backend = "jax"

    def __init__(self, spec: EncoderSpec, params, cfg: BertConfig, tokenizer):
        import functools

        import jax
        import jax.numpy as jnp

        self.spec = spec
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer

        @functools.partial(jax.jit, static_argnames=())
        def _encode(params, ids, mask, type_ids):
            outs = bert_encode(params, cfg, ids, mask, type_ids)
            # pool + normalize in f32 whatever the compute dtype (the
            # embedding feeds the scoring/routing paths, which are f32)
            emb = pool(outs, mask, spec.pooling).astype(jnp.float32)
            if spec.normalize:
                emb = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            return emb

        self._encode = _encode

    def _run(self, texts: List[str]) -> np.ndarray:
        batch = self.tokenizer(
            texts, return_tensors="np", padding="max_length",
            truncation=True, max_length=self.spec.max_length)
        import jax.numpy as jnp

        emb = self._encode(
            self.params,
            jnp.asarray(batch["input_ids"], jnp.int32),
            jnp.asarray(batch["attention_mask"], jnp.int32),
            jnp.asarray(batch.get(
                "token_type_ids",
                np.zeros_like(batch["input_ids"])), jnp.int32),
        )
        return np.asarray(emb)

    def encode(self, texts: List[str]) -> np.ndarray:
        return self._run([self.spec.format_query(t) for t in texts])

    def encode_corpus(self, texts: List[str]) -> np.ndarray:
        """Doc-side encode (E5 "passage: " prefix, raw for the rest —
        custom_models.py:47-53,113-116)."""
        return self._run([self.spec.format_passage(t) for t in texts])


class TorchEncoder:
    """Host-side torch fallback (the reference's own execution model)."""

    backend = "torch"

    def __init__(self, spec: EncoderSpec):
        self.spec = spec
        from sentence_transformers import SentenceTransformer

        self.model = SentenceTransformer(spec.hf_name)
        self.model.eval()

    def encode(self, texts: List[str]) -> np.ndarray:
        emb = self.model.encode(
            [self.spec.format_query(t) for t in texts],
            show_progress_bar=False, convert_to_numpy=True,
            normalize_embeddings=self.spec.normalize)
        return np.asarray(emb, np.float32)

    def encode_corpus(self, texts: List[str]) -> np.ndarray:
        emb = self.model.encode(
            [self.spec.format_passage(t) for t in texts],
            show_progress_bar=False, convert_to_numpy=True,
            normalize_embeddings=self.spec.normalize)
        return np.asarray(emb, np.float32)


def _serving_cast(params):
    """Cast loaded f32 encoder weights to the serving compute dtype
    (config.ENCODER_COMPUTE_DTYPE, default bf16 — the MXU-native path:
    measured 15.4x at B=1 for bert-base on the v5e at cos > 0.999999 vs
    f32, ``scripts/bench_embed.py``). Test paths that construct the
    encoder classes directly keep their given dtype."""
    from ragroute_tpu.config import ENCODER_COMPUTE_DTYPE

    if ENCODER_COMPUTE_DTYPE in ("float32", "f32"):
        return params
    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(ENCODER_COMPUTE_DTYPE)
    return jax.tree.map(
        lambda x: (x.astype(dt)
                   if getattr(x, "dtype", None) == np.float32 else x),
        params)


def _load_jax_bert(spec: EncoderSpec) -> JaxBertEncoder:
    from transformers import AutoConfig, AutoModel, AutoTokenizer

    hf_cfg = AutoConfig.from_pretrained(spec.hf_name, local_files_only=True)
    tok = AutoTokenizer.from_pretrained(spec.hf_name, local_files_only=True)
    model = AutoModel.from_pretrained(spec.hf_name, local_files_only=True)
    cfg = config_from_hf(
        hf_cfg if hf_cfg.model_type == "bert" else hf_cfg)
    params = _serving_cast(params_from_torch_bert(model.state_dict(), cfg))
    return JaxBertEncoder(spec, params, cfg, tok)


class JaxMPNetEncoder:
    """MPNet encoder running in JAX (relative-position-bias attention)."""

    backend = "jax"

    def __init__(self, spec: EncoderSpec, params, cfg, tokenizer):
        import jax
        import jax.numpy as jnp

        from ragroute_tpu.encoders.mpnet import mpnet_encode

        self.spec = spec
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer

        @jax.jit
        def _encode(params, ids, mask):
            outs = mpnet_encode(params, cfg, ids, mask)
            emb = pool(outs, mask, spec.pooling).astype(jnp.float32)
            if spec.normalize:
                emb = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            return emb

        self._encode = _encode

    def _run(self, texts: List[str]) -> np.ndarray:
        import jax.numpy as jnp

        batch = self.tokenizer(
            texts, return_tensors="np", padding="max_length",
            truncation=True, max_length=self.spec.max_length)
        emb = self._encode(
            self.params,
            jnp.asarray(batch["input_ids"], jnp.int32),
            jnp.asarray(batch["attention_mask"], jnp.int32))
        return np.asarray(emb)

    def encode(self, texts: List[str]) -> np.ndarray:
        return self._run([self.spec.format_query(t) for t in texts])

    def encode_corpus(self, texts: List[str]) -> np.ndarray:
        return self._run([self.spec.format_passage(t) for t in texts])


def _load_jax_mpnet(spec: EncoderSpec) -> JaxMPNetEncoder:
    from transformers import AutoConfig, AutoModel, AutoTokenizer

    from ragroute_tpu.encoders import mpnet as mp

    hf_cfg = AutoConfig.from_pretrained(spec.hf_name, local_files_only=True)
    tok = AutoTokenizer.from_pretrained(spec.hf_name, local_files_only=True)
    model = AutoModel.from_pretrained(spec.hf_name, local_files_only=True)
    cfg = mp.config_from_hf(hf_cfg)
    params = _serving_cast(mp.params_from_torch_mpnet(model.state_dict(),
                                                      cfg))
    return JaxMPNetEncoder(spec, params, cfg, tok)


def _load_jax_gptj(spec: EncoderSpec):
    from transformers import AutoModel, AutoTokenizer

    from ragroute_tpu.encoders import gptj as gj
    from ragroute_tpu.encoders.custom import JaxSGPTEncoder

    tok = AutoTokenizer.from_pretrained(spec.hf_name, local_files_only=True)
    model = AutoModel.from_pretrained(spec.hf_name, local_files_only=True)
    cfg = gj.config_from_hf(model.config)
    params = _serving_cast(gj.params_from_torch_gptj(model.state_dict(),
                                                     cfg))
    return JaxSGPTEncoder(spec, params, cfg, tok)


def _find_instructor_dense(hf_name: str):
    """Locate the sentence-transformers ``2_Dense`` module shipped with an
    instructor-* checkpoint (stack Transformer→Pooling→Dense; skipping it
    would silently serve a different embedding space). Returns
    ``(kernel [d_in, d_out], bias | None)`` as numpy, or ``None`` when the
    checkpoint has no Dense module."""
    import os

    import torch

    sd = None
    candidates = ("2_Dense/pytorch_model.bin", "2_Dense/model.safetensors")
    if os.path.isdir(hf_name):
        paths = [os.path.join(hf_name, c) for c in candidates]
    else:
        paths = []
        try:
            from transformers.utils.hub import cached_file

            for c in candidates:
                try:
                    p = cached_file(hf_name, c, local_files_only=True)
                    if p:
                        paths.append(p)
                except Exception:
                    continue
        except Exception:
            return None
    for p in paths:
        if not os.path.exists(p):
            continue
        if p.endswith(".safetensors"):
            from safetensors.torch import load_file

            sd = load_file(p)
        else:
            sd = torch.load(p, map_location="cpu", weights_only=True)
        break
    if sd is None:
        return None
    w = sd["linear.weight"].float().numpy()          # torch [out, in]
    b = sd.get("linear.bias")
    return w.T.copy(), (None if b is None else b.float().numpy())


def _load_jax_t5(spec: EncoderSpec):
    from transformers import AutoTokenizer, T5EncoderModel

    from ragroute_tpu.encoders import t5 as t5m
    from ragroute_tpu.encoders.custom import JaxInstructorEncoder

    tok = AutoTokenizer.from_pretrained(spec.hf_name, local_files_only=True)
    model = T5EncoderModel.from_pretrained(spec.hf_name,
                                           local_files_only=True)
    cfg = t5m.config_from_hf(model.config)
    params = _serving_cast(t5m.params_from_torch_t5(model.state_dict(),
                                                    cfg))
    dense = _find_instructor_dense(spec.hf_name)
    return JaxInstructorEncoder(spec, params, cfg, tok, dense=dense)


def load_encoder(spec: EncoderSpec, prefer: str = "jax"):
    """Load ONE encoder at the best available backend (JAX forward →
    torch fallback → hash stub). Shared by the zoo and the corpus-ingest
    path (scripts/import_real_data.py --encode-from-jsonl)."""
    if prefer == "hash":
        return HashEncoder(spec)
    if prefer == "jax":
        loader = {"bert": _load_jax_bert,
                  "mpnet": _load_jax_mpnet,
                  "gpt": _load_jax_gptj,
                  "t5": _load_jax_t5}.get(spec.family)
        if loader is not None:
            try:
                return loader(spec)
            except Exception as e:
                logger.warning("JAX load failed for %s (%s)",
                               spec.name, e)
    try:
        if spec.family == "gpt" and "specb" in spec.name:
            from ragroute_tpu.encoders.custom import SGPTEncoder

            return SGPTEncoder(spec)
        if spec.family == "t5":
            from ragroute_tpu.encoders.custom import InstructorEncoder

            # the torch fallback must apply the checkpoint's 2_Dense too
            # (identity activation -> applying it to token hiddens before
            # mean pooling equals applying it to the pooled vector), or
            # the two backends would serve different embedding spaces
            dense_mod = None
            dnp = _find_instructor_dense(spec.hf_name)
            if dnp is not None:
                import torch

                w, b = dnp  # kernel [d_in, d_out], bias
                lin = torch.nn.Linear(w.shape[0], w.shape[1],
                                      bias=b is not None)
                with torch.no_grad():
                    lin.weight.copy_(torch.from_numpy(w.T.copy()))
                    if b is not None:
                        lin.bias.copy_(torch.from_numpy(b.copy()))
                lin.eval()
                dense_mod = lin
            return InstructorEncoder(spec, dense=dense_mod)
        return TorchEncoder(spec)
    except Exception as e:
        logger.warning(
            "no weights for %s (%s); using hash embeddings "
            "(retrieval quality is meaningless for this encoder)",
            spec.name, e)
        return HashEncoder(spec)


def encode_corpus_batched(enc, texts, batch_size: int = 32) -> np.ndarray:
    """Doc-side encode in batches with whatever corpus semantics the
    encoder carries (falls back to query-side encode for encoders with
    no doc/query asymmetry). Shared by EncoderZoo.encode_corpus and the
    raw-jsonl ingest path (scripts/import_real_data.py)."""
    fn = getattr(enc, "encode_corpus", enc.encode)
    outs = [fn(texts[i:i + batch_size])
            for i in range(0, len(texts), batch_size)]
    return np.concatenate(outs, axis=0)


def resolve_spec(enc_name: str, dim: int = 768) -> EncoderSpec:
    """Registry spec for a name, or a synthesized mean-pool default."""
    spec = ENCODER_SPECS.get(enc_name)
    if spec is None:
        spec = EncoderSpec(enc_name, "unknown", enc_name, dim,
                           "mean", False)
    return spec


class EncoderZoo:
    """All distinct encoders for a world, best-available backend each."""

    def __init__(self, world: WorldConfig, *, prefer: str = "jax"):
        self.world = world
        self.encoders: Dict[str, object] = {}
        self.backends: Dict[str, str] = {}
        for enc_name in world.encoders:
            dim = next(s.embed_dim for s in world.sources
                       if s.encoder == enc_name)
            enc = load_encoder(resolve_spec(enc_name, dim), prefer)
            self.encoders[enc_name] = enc
            self.backends[enc_name] = enc.backend
        logger.info("encoder backends: %s", self.backends)

    def encode_query(self, text: str) -> Dict[str, np.ndarray]:
        """One query through every encoder (reference router.py:285-303)."""
        return {name: enc.encode([text])[0]
                for name, enc in self.encoders.items()}

    def encode_queries(self, texts: List[str]) -> Dict[str, np.ndarray]:
        return {name: enc.encode(texts)
                for name, enc in self.encoders.items()}

    def encode_corpus(self, enc_name: str, texts: List[str],
                      batch_size: int = 32) -> np.ndarray:
        """Doc-side encode with one named encoder (ingest path): E5
        "passage: " prefixes, SGPT brace brackets, instructor corpus-side
        instructions — each encoder class carries its own doc semantics
        (reference ``custom_models.py`` encode_corpus methods)."""
        return encode_corpus_batched(self.encoders[enc_name], texts,
                                     batch_size)
