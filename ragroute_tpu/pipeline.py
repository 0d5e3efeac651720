"""Offline single-process pipeline: encode → route → retrieve → rerank →
prompt → (optionally) generate, as one synchronous call.

The library-API equivalent of the reference's monolithic prototypes
(``med_rag.py``, ``mmlu.py``, ``feb4rag.py`` — single-process versions of
the whole system used for offline evaluation), built on the same engine as
the server so results are identical to the HTTP path.

    pipe = OfflinePipeline.from_data_root(root, "medrag")
    out = pipe.run("What causes diabetes?", {"A": ...}, qid="q1")
    out["top_docs"], out["data_sources"], out["messages"]
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ragroute_tpu.config import WorldConfig, get_world
from ragroute_tpu.engine.engine import FederatedSearchEngine
from ragroute_tpu.engine.prompts import (
    generate_llm_message,
    generate_llm_message_wikipedia,
)
from ragroute_tpu.engine.rerank import rerank_feb4rag


class OfflinePipeline:
    def __init__(
        self,
        engine: FederatedSearchEngine,
        embedding_provider,
        doc_store=None,
        *,
        strategy: str = "ragroute",
        relevance_data: Optional[Dict] = None,
        model: str = "llama3.1-8B-instruct",
    ):
        self.engine = engine
        self.world: WorldConfig = engine.world
        self.provider = embedding_provider
        self.doc_store = doc_store
        self.strategy = strategy
        self.relevance_data = relevance_data or {}
        self.model = model

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_data_root(cls, root: str, dataset: str, *,
                       strategy: str = "ragroute", **kw) -> "OfflinePipeline":
        from ragroute_tpu.system import load_world_artifacts

        world = get_world(dataset)
        (shard_set, params, bank, provider, doc_store, relevance,
         threshold) = load_world_artifacts(root, world)
        engine = FederatedSearchEngine(shard_set, params, bank,
                                       threshold=threshold)
        return cls(engine, provider, doc_store, strategy=strategy,
                   relevance_data=relevance, **kw)

    @classmethod
    def from_synthetic(cls, dataset: str, *, strategy: str = "ragroute",
                       docs_per_source: int = 2048, num_queries: int = 64,
                       seed: int = 0, **kw) -> "OfflinePipeline":
        import jax
        import jax.numpy as jnp

        from ragroute_tpu.engine.embedding import PrecomputedEmbeddings
        from ragroute_tpu.index import ShardSet, make_synthetic_world
        from ragroute_tpu.index.store import MemoryDocStore
        from ragroute_tpu.router import RouterBank, init_router_params

        syn = make_synthetic_world(dataset, docs_per_source=docs_per_source,
                                   num_queries=num_queries, seed=seed)
        shard_set = ShardSet.build(syn.world, syn.embeddings,
                                   doc_ids=syn.doc_ids)
        params = init_router_params(jax.random.key(0),
                                    syn.world.router_input_dim)
        bank = RouterBank.create(syn.world, syn.centroids)
        engine = FederatedSearchEngine(shard_set, params, bank)
        return cls(engine, PrecomputedEmbeddings.from_synthetic(syn),
                   MemoryDocStore.from_synthetic(syn), strategy=strategy,
                   **kw)

    # -- main entry --------------------------------------------------------

    def run(self, question: str, options, qid: str = "") -> Dict:
        """Process one question end to end; returns the same fields as the
        HTTP response metadata plus the built LLM messages."""
        world = self.world
        if world.name == "wikipedia":
            formatted = "\n".join([question, " | ".join(options)])
        else:
            formatted = question
        embs = self.provider.embed(formatted, qid)
        batch = {enc: np.asarray(v)[None, :] for enc, v in embs.items()}
        out = self.engine.search(batch, strategy=self.strategy)

        selected = [world.sources[i].name
                    for i in range(world.num_sources) if out.mask[0, i]]

        top_docs: List = []
        if world.name == "feb4rag":
            all_ids, all_docs = [], []
            for si, src in enumerate(world.sources):
                if not out.mask[0, si]:
                    continue
                id_table = self.engine.shard_set.doc_ids.get(src.name)
                for r in range(out.shard_ids.shape[2]):
                    local = int(out.shard_ids[0, si, r])
                    all_ids.append(id_table[local] if id_table else local)
                    all_docs.append(self.doc_store.get(src.name, local)
                                    if self.doc_store else None)
            top_docs, _ = rerank_feb4rag(all_ids, all_docs, qid, world.k,
                                         self.relevance_data)
        else:
            for j in range(out.merged_shard.shape[1]):
                si = int(out.merged_shard[0, j])
                if si < 0:
                    continue
                src = world.sources[si]
                local = int(out.merged_local[0, j])
                top_docs.append(self.doc_store.get(src.name, local)
                                if self.doc_store else
                                {"source": src.name, "index": local})

        if world.name == "wikipedia":
            messages, docs_tokens = generate_llm_message_wikipedia(
                question, top_docs, options, self.model)
        else:
            messages, docs_tokens = generate_llm_message(
                world.name, question, top_docs, options, self.model)

        return {
            "question": question,
            "data_sources": selected,
            "probs": out.probs[0].tolist(),
            "top_docs": top_docs,
            "merged_scores": out.merged_score[0].tolist(),
            "messages": messages,
            "docs_tokens": docs_tokens,
            "selection_time": out.selection_time,
            "doc_select_time": out.doc_select_time,
        }
