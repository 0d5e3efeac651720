"""SGPT-specb and INSTRUCTOR encoder semantics.

Two reference encoders need more than (pooling, prefix, normalize) specs:

* **SGPT specb** (reference ``custom_models.py:183-229``): queries are
  wrapped in bracket TOKENS — token ids ``[ "[" ] + ids(text) + [ "]" ]``,
  NOT string concatenation (the reference prepends a ``[SOS]`` placeholder
  and swaps its id for ``[``'s id precisely so the bracket cannot merge
  with adjacent text during BPE). Docs use ``{`` / ``}``. Pooling is the
  SGPT position-weighted mean (weights 1..L over unmasked tokens).

* **INSTRUCTOR** (reference ``instructor/instructor_model.py:223-386``):
  queries are (instruction, text) pairs; the model runs on the tokenized
  CONCATENATION while mean pooling masks out the instruction's tokens:
  ``context_len = sum(attn(tok(instruction))) - 1`` (dropping the
  instruction-only tokenization's trailing EOS; floored to 0 when <= 1),
  then ``attention_mask[:context_len] = 0``. Instructions per (model,
  dataset, side) live in ``instructor_instructions.json`` (extracted
  behavioral constants from ``instructor/instructor_definitions.py``).

Both are implemented as tokenizer-level transforms + the shared pooling
math so the same semantics serve the torch fallback AND any JAX forward.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_INSTRUCTIONS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "instructor_instructions.json")


@functools.lru_cache(maxsize=1)
def instructor_instructions() -> Dict:
    with open(_INSTRUCTIONS_PATH) as f:
        return json.load(f)


def instructor_instruction(model: str, dataset: str, side: str) -> str:
    """Instruction string for (model, dataset, query|corpus)."""
    table = instructor_instructions()
    model_key = model if model in table else f"hkunlp/{model}"
    return table[model_key][dataset][side]


# ---------------------------------------------------------------------------
# SGPT specb token scheme
# ---------------------------------------------------------------------------

def specb_bracket_ids(tokenizer) -> Tuple[int, int, int, int]:
    """(query_open, query_close, doc_open, doc_close) single-token ids."""
    def one(tok: str) -> int:
        ids = tokenizer.encode(tok, add_special_tokens=False)
        return ids[0]

    return one("["), one("]"), one("{"), one("}")


def specb_tokenize(
    tokenizer, texts: Sequence[str], *, is_query: bool = True,
    max_length: int = 512, pad_to: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Tokenize with the specb bracket scheme, padded to the batch max
    (or to a fixed ``pad_to`` length for jit-stable shapes).

    Returns ``{"input_ids", "attention_mask"}`` numpy int arrays.
    """
    q_open, q_close, d_open, d_close = specb_bracket_ids(tokenizer)
    open_id, close_id = (q_open, q_close) if is_query else (d_open, d_close)

    limit = min(max_length, pad_to) if pad_to else max_length
    seqs = []
    for t in texts:
        ids = tokenizer.encode(t, add_special_tokens=False,
                               truncation=True, max_length=limit - 2)
        seqs.append([open_id] + list(ids) + [close_id])

    longest = pad_to or max(len(s) for s in seqs)
    pad_id = tokenizer.pad_token_id
    if pad_id is None:
        pad_id = 0
    input_ids = np.full((len(seqs), longest), pad_id, np.int64)
    mask = np.zeros((len(seqs), longest), np.int64)
    for i, s in enumerate(seqs):
        input_ids[i, :len(s)] = s
        mask[i, :len(s)] = 1
    return {"input_ids": input_ids, "attention_mask": mask}


def weighted_mean_pool(hidden: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """SGPT position-weighted mean: weights 1..L over unmasked tokens."""
    m = mask.astype(np.float32)[:, :, None]
    w = np.arange(1, hidden.shape[1] + 1,
                  dtype=np.float32)[None, :, None] * m
    return (hidden * w).sum(1) / np.maximum(w.sum(1), 1e-9)


# ---------------------------------------------------------------------------
# INSTRUCTOR instruction-masked pooling
# ---------------------------------------------------------------------------

def instructor_tokenize(
    tokenizer, instruction: str, texts: Sequence[str], *,
    max_length: int = 512, pad_to: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Tokenize instruction+text pairs with per-row context masks.

    Returns ``{"input_ids", "attention_mask", "pool_mask"}`` where
    ``pool_mask`` is the attention mask with the instruction's tokens
    zeroed (what mean pooling must use). ``attention_mask`` (instruction
    visible) is what the model forward must use.
    """
    joined = [instruction + t.strip() for t in texts]
    pad = ("max_length" if pad_to else True)
    batch = tokenizer(joined, padding=pad, truncation=True,
                      max_length=pad_to or max_length, return_tensors="np")
    ctx = tokenizer([instruction], padding=True, truncation=True,
                    max_length=max_length, return_tensors="np")
    context_len = int(ctx["attention_mask"].sum()) - 1
    if context_len <= 1:
        context_len = 0
    pool_mask = np.array(batch["attention_mask"], np.int64)
    pool_mask[:, :context_len] = 0
    return {
        "input_ids": np.asarray(batch["input_ids"], np.int64),
        "attention_mask": np.asarray(batch["attention_mask"], np.int64),
        "pool_mask": pool_mask,
    }


def masked_mean_pool(hidden: np.ndarray, pool_mask: np.ndarray) -> np.ndarray:
    m = pool_mask.astype(np.float32)[:, :, None]
    return (hidden * m).sum(1) / np.maximum(m.sum(1), 1e-9)


# ---------------------------------------------------------------------------
# torch encoder classes (fallback execution, mirrors the reference's own
# host-side execution model)
# ---------------------------------------------------------------------------

class JaxSGPTEncoder:
    """TPU-native SGPT: pure-JAX GPT-J forward + specb scheme +
    position-weighted mean pooling, all jitted at a fixed length."""

    backend = "jax"

    def __init__(self, spec, params, cfg, tokenizer, pad_to: int = 128):
        import jax
        import jax.numpy as jnp

        from ragroute_tpu.encoders.gptj import gptj_encode

        self.spec = spec
        self.params = params
        self.tokenizer = tokenizer
        self.pad_to = pad_to

        @jax.jit
        def _encode(params, ids, mask):
            outs = gptj_encode(params, cfg, ids, mask)
            from ragroute_tpu.encoders.bert import pool

            emb = pool(outs, mask, "weightedmean").astype(jnp.float32)
            if spec.normalize:
                emb = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            return emb

        self._encode = _encode

    def encode(self, texts: List[str], *, is_query: bool = True) -> np.ndarray:
        import jax.numpy as jnp

        batch = specb_tokenize(self.tokenizer, texts, is_query=is_query,
                               max_length=self.spec.max_length,
                               pad_to=self.pad_to)
        emb = self._encode(self.params,
                           jnp.asarray(batch["input_ids"], jnp.int32),
                           jnp.asarray(batch["attention_mask"], jnp.int32))
        return np.asarray(emb, np.float32)

    def encode_corpus(self, texts: List[str]) -> np.ndarray:
        """Doc-side encode: {SOS}/{EOS} brace brackets
        (custom_models.py:183-229 doc scheme)."""
        return self.encode(texts, is_query=False)


class JaxInstructorEncoder:
    """TPU-native INSTRUCTOR: pure-JAX T5 encoder + instruction-masked
    mean pooling (model attends to the instruction; pooling excludes it),
    plus the sentence-transformers ``2_Dense`` projection when the
    checkpoint ships one (the instructor-* stacks are
    Transformer→Pooling→Dense→(normalize); omitting a checkpoint's Dense
    would silently change the embedding space,
    ``instructor/instructor_model.py:388-576``)."""

    backend = "jax"

    def __init__(self, spec, params, cfg, tokenizer,
                 default_dataset: str = "msmarco", pad_to: int = 128,
                 dense=None):
        import jax
        import jax.numpy as jnp

        from ragroute_tpu.encoders.t5 import t5_encode

        self.spec = spec
        self.params = params
        self.tokenizer = tokenizer
        self.default_dataset = default_dataset
        self.pad_to = pad_to
        # dense: optional (kernel [d_in, d_out], bias [d_out] | None)
        # applied to the POOLED embedding (identity activation, the
        # instructor-* stacks' 2_Dense config); jnp arrays
        self.dense = None
        if dense is not None:
            w, b = dense
            self.dense = (jnp.asarray(w, jnp.float32),
                          None if b is None else jnp.asarray(b, jnp.float32))
        dense_ = self.dense

        @jax.jit
        def _encode(params, ids, attn_mask, pool_mask):
            outs = t5_encode(params, cfg, ids, attn_mask)
            m = pool_mask.astype(jnp.float32)[:, :, None]
            emb = (outs["last_hidden"] * m).sum(1) / jnp.maximum(
                m.sum(1), 1e-9)
            if dense_ is not None:
                emb = emb @ dense_[0]
                if dense_[1] is not None:
                    emb = emb + dense_[1]
            if spec.normalize:
                emb = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            return emb

        self._encode = _encode

    def encode(self, texts: List[str], *, dataset: Optional[str] = None,
               side: str = "query") -> np.ndarray:
        import jax.numpy as jnp

        instruction = instructor_instruction(
            self.spec.hf_name, dataset or self.default_dataset, side)
        batch = instructor_tokenize(self.tokenizer, instruction, texts,
                                    max_length=self.spec.max_length,
                                    pad_to=self.pad_to)
        emb = self._encode(self.params,
                           jnp.asarray(batch["input_ids"], jnp.int32),
                           jnp.asarray(batch["attention_mask"], jnp.int32),
                           jnp.asarray(batch["pool_mask"], jnp.int32))
        return np.asarray(emb, np.float32)

    def encode_corpus(self, texts: List[str], *,
                      dataset: Optional[str] = None) -> np.ndarray:
        """Doc-side encode with the corpus-side instruction
        (instructor_definitions per-(model, dataset, side) table)."""
        return self.encode(texts, dataset=dataset, side="corpus")


class SGPTEncoder:
    """GPT-family encoder with the specb scheme + weighted-mean pooling."""

    backend = "torch-sgpt"

    def __init__(self, spec, model=None, tokenizer=None):
        self.spec = spec
        if model is None or tokenizer is None:
            from transformers import AutoModel, AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                spec.hf_name, local_files_only=True)
            model = AutoModel.from_pretrained(
                spec.hf_name, local_files_only=True)
        model.eval()
        self.model = model
        self.tokenizer = tokenizer

    def encode(self, texts: List[str], *, is_query: bool = True) -> np.ndarray:
        import torch

        batch = specb_tokenize(self.tokenizer, texts, is_query=is_query,
                               max_length=self.spec.max_length)
        with torch.no_grad():
            out = self.model(
                input_ids=torch.from_numpy(batch["input_ids"]),
                attention_mask=torch.from_numpy(batch["attention_mask"]))
        emb = weighted_mean_pool(out.last_hidden_state.float().numpy(),
                                 batch["attention_mask"])
        if self.spec.normalize:
            emb /= np.maximum(
                np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        return emb.astype(np.float32)

    def encode_corpus(self, texts: List[str]) -> np.ndarray:
        """Doc-side encode: {SOS}/{EOS} brace brackets
        (custom_models.py:183-229 doc scheme)."""
        return self.encode(texts, is_query=False)


class InstructorEncoder:
    """T5-encoder with instruction-masked mean pooling (+ optional dense
    projection, as in the instructor-* sentence-transformers stacks)."""

    backend = "torch-instructor"

    def __init__(self, spec, model=None, tokenizer=None, dense=None,
                 default_dataset: str = "msmarco"):
        self.spec = spec
        self.default_dataset = default_dataset
        if model is None or tokenizer is None:
            from transformers import AutoTokenizer, T5EncoderModel

            tokenizer = AutoTokenizer.from_pretrained(
                spec.hf_name, local_files_only=True)
            model = T5EncoderModel.from_pretrained(
                spec.hf_name, local_files_only=True)
        model.eval()
        self.model = model
        self.tokenizer = tokenizer
        self.dense = dense  # optional torch nn.Linear-like projection

    def encode(self, texts: List[str], *, dataset: Optional[str] = None,
               side: str = "query") -> np.ndarray:
        import torch

        instruction = instructor_instruction(
            self.spec.hf_name, dataset or self.default_dataset, side)
        batch = instructor_tokenize(self.tokenizer, instruction, texts,
                                    max_length=self.spec.max_length)
        with torch.no_grad():
            out = self.model(
                input_ids=torch.from_numpy(batch["input_ids"]),
                attention_mask=torch.from_numpy(batch["attention_mask"]))
            hidden = out.last_hidden_state
            if self.dense is not None:
                hidden = self.dense(hidden)
        emb = masked_mean_pool(hidden.float().numpy(), batch["pool_mask"])
        if self.spec.normalize:
            emb /= np.maximum(
                np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        return emb.astype(np.float32)

    def encode_corpus(self, texts: List[str], *,
                      dataset: Optional[str] = None) -> np.ndarray:
        """Doc-side encode with the corpus-side instruction
        (instructor_definitions per-(model, dataset, side) table)."""
        return self.encode(texts, dataset=dataset, side="corpus")
