"""Query-encoder zoo: host/TPU-side text → embedding models.

The reference encodes queries with a zoo of HF torch models spread across
four wrapper layers (``ragroute/models/**`` — MedCPT CLS-pooling sentence
transformer, DPR, and the FeB4RAG zoo of AnglE/E5/SGPT/Instructor/SBERT
models, ~1.6k LoC incl. a vendored INSTRUCTOR). Here the BERT-family
models (MedCPT, DPR, E5, GTE, ember, UAE — the encoders behind 10 of the
13 FeB4RAG sources plus both medrag/wikipedia worlds) run as ONE pure-JAX
encoder with per-model pooling/prefix/normalization specs and HF weight
import; non-BERT architectures (SGPT 5.8B: GPT-family; Instructor: T5)
fall back to their torch implementations when installed, else to
deterministic hash embeddings (clearly flagged).
"""

from ragroute_tpu.encoders.registry import ENCODER_SPECS, EncoderSpec
from ragroute_tpu.encoders.zoo import EncoderZoo

__all__ = ["EncoderZoo", "ENCODER_SPECS", "EncoderSpec"]
