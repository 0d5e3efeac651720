"""Query embedding providers for the serving path.

The reference router encodes each query at serve time with per-corpus HF
torch models (``router.py:285-303``), or random vectors in simulation mode
(``router.py:286-288``). Encoding is a host-side stage here; providers are
pluggable:

* :class:`PrecomputedEmbeddings` — lookup by qid (benchmark runs over
  frozen query sets; mirrors the reference training scripts' cached ``.npy``
  query embeddings, ``train_medrag_router.py:123``).
* :class:`HashEmbeddings`   — deterministic pseudo-embeddings derived from
  the query text (the offline/simulation stand-in; unlike the reference's
  ``np.random`` embeddings these are reproducible).
* :class:`EncoderZooEmbeddings` — real encoder models via
  :mod:`ragroute_tpu.encoders` (requires model weights).
"""

from __future__ import annotations

import hashlib
from typing import Dict, Mapping, Optional

import numpy as np

from ragroute_tpu.config import WorldConfig


class PrecomputedEmbeddings:
    """qid -> {encoder: [d]} lookup table.

    Unknown qids fall back to the ``fallback`` provider (hash embeddings by
    default) instead of failing: the reference encodes whatever text
    arrives and never rejects a query for being unknown.
    """

    def __init__(self, world: WorldConfig,
                 table: Mapping[str, Dict[str, np.ndarray]],
                 fallback=None):
        self.world = world
        self.table = dict(table)
        self.fallback = fallback or HashEmbeddings(world)

    @classmethod
    def from_synthetic(cls, syn) -> "PrecomputedEmbeddings":
        table = {}
        for qi, q in enumerate(syn.questions):
            table[q["qid"]] = {
                enc: syn.query_embs[enc][qi] for enc in syn.world.encoders
            }
        return cls(syn.world, table)

    def embed(self, query: str, qid: str) -> Dict[str, np.ndarray]:
        if qid not in self.table:
            return self.fallback.embed(query, qid)
        return self.table[qid]


class HashEmbeddings:
    """Deterministic text-hash embeddings (simulation-mode stand-in)."""

    def __init__(self, world: WorldConfig):
        self.world = world
        self._dims = {s.encoder: s.embed_dim for s in world.sources}

    def embed(self, query: str, qid: str) -> Dict[str, np.ndarray]:
        out = {}
        for enc in self.world.encoders:
            seed = int.from_bytes(
                hashlib.sha256(f"{enc}::{query}".encode()).digest()[:8],
                "little")
            rng = np.random.default_rng(seed)
            out[enc] = rng.standard_normal(self._dims[enc]).astype(np.float32)
        return out


class EncoderZooEmbeddings:
    """Real query encoders (host-side model zoo)."""

    # A live model forward per query — the server dispatches blocking
    # providers to an executor so the event loop (and the micro-batcher)
    # keeps running while a query encodes.
    blocking = True

    def __init__(self, world: WorldConfig, zoo=None):
        from ragroute_tpu.encoders import EncoderZoo

        self.world = world
        self.zoo = zoo or EncoderZoo(world)

    def embed(self, query: str, qid: str) -> Dict[str, np.ndarray]:
        return self.zoo.encode_query(query)
