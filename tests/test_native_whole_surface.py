"""Native front-end whole-surface parity (round 4): live generation with
SSE streaming through chunked fe_stream frames, /docs/* live updates,
/admin/snapshot, and --simulate — all through the C++ IO plane, matching
the asyncio front-end's bodies/semantics (the round-3 native plane
hard-refused all of these)."""

import json
import sys
import time
from urllib.parse import quote

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragroute_tpu.engine.batcher import QueryBatcher
from ragroute_tpu.engine.embedding import (HashEmbeddings,
                                           PrecomputedEmbeddings)
from ragroute_tpu.engine.engine import FederatedSearchEngine
from ragroute_tpu.engine.llm import LLMClient
from ragroute_tpu.engine.native_frontend import (
    NativeFederationServer, native_frontend_available)
from ragroute_tpu.engine.server import FederationServer
from ragroute_tpu.index import ShardSet, make_synthetic_world
from ragroute_tpu.index.store import MemoryDocStore
from ragroute_tpu.llm.continuous import demo_continuous_service
from ragroute_tpu.router import RouterBank, init_router_params

sys.path.insert(0, "tests")
from test_native_frontend import http_get, http_post, query_path  # noqa: E402

pytestmark = pytest.mark.skipif(
    not native_frontend_available(),
    reason="native frontend unavailable (g++ missing)")


def build_server(*, mutable=False, reserve=0, llm=None, simulate=False,
                 data_root=None, strategy="all"):
    syn = make_synthetic_world("medrag", docs_per_source=600,
                               num_queries=6, seed=1)
    shard_set = ShardSet.build(
        syn.world, syn.embeddings, doc_ids=syn.doc_ids, dtype=jnp.float32,
        mutable=mutable, reserve_docs=reserve)
    params = init_router_params(jax.random.key(0),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    engine = FederatedSearchEngine(shard_set, params, bank, impl="exact")
    provider = (HashEmbeddings(syn.world) if mutable
                else PrecomputedEmbeddings.from_synthetic(syn))
    server = FederationServer(
        engine, strategy=strategy, embedding_provider=provider,
        doc_store=MemoryDocStore.from_synthetic(syn),
        disable_llm=llm is None, llm=llm, simulate=simulate,
        port=0, warmup=False, data_root=data_root,
        batcher=QueryBatcher(engine, strategy=strategy, window_ms=5.0,
                             buckets=(8,)))
    return syn, server


def test_native_sse_generation_streams_deltas():
    """stream=1 with a LIVE jax generation service: chunked SSE framing,
    incremental delta events, final event matching the non-stream body's
    schema and answer (the asyncio test_query_sse_roundtrip contract)."""
    svc = demo_continuous_service(max_new_tokens=12, slots=2,
                                  chunk_steps=3)
    syn, server = build_server(llm=LLMClient("jax", service=svc))
    ns = NativeFederationServer(server)
    ns.start(thread=True)
    try:
        q = syn.questions[0]
        path = query_path(q["question"], q["options"], q["qid"],
                          extra="&stream=1")
        status, headers, body = http_get(ns.bound_port, path)
        assert status == 200
        assert headers["Content-Type"].startswith("text/event-stream")
        assert headers.get("Transfer-Encoding") == "chunked"
        events = [line[len("data: "):]
                  for line in body.decode().split("\n\n")
                  if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        final = json.loads(events[-2])
        deltas = [json.loads(e)["delta"] for e in events[:-2]]
        assert len(deltas) >= 2, "deltas must stream incrementally"
        assert final["answer"].startswith("".join(deltas))

        # plain (non-stream) query for schema/answer parity
        status, _, plain_body = http_get(
            ns.bound_port, query_path(q["question"], q["options"],
                                      q["qid"]))
        assert status == 200
        plain = json.loads(plain_body)
        assert set(final) == set(plain)
        assert final["answer"] == plain["answer"]
        assert len(final["metadata"]["top_docs"]) == len(
            plain["metadata"]["top_docs"])
        assert plain["metadata"]["generate_time"] >= 0
    finally:
        ns.stop()


def test_native_live_updates_and_snapshot(tmp_path):
    """/docs/add + query + /docs/delete + /admin/snapshot through the
    C++ plane (mirrors test_served_live_updates_http)."""
    syn, server = build_server(mutable=True, reserve=16,
                               data_root=str(tmp_path))
    ns = NativeFederationServer(server)
    ns.start(thread=True)
    try:
        port = ns.bound_port
        name = syn.world.sources[0].name
        src = syn.world.sources[0]
        q_text = "find the freshly added doc"
        provider = server.provider
        emb = provider.embed(q_text, "fresh")[src.encoder]
        doc_emb = (emb / max(float(np.linalg.norm(emb)), 1e-9)) * 1e3
        add = {"source": name, "docs": [{
            "id": "fresh-doc-1", "embedding": doc_emb.tolist(),
            "payload": {"id": "fresh-doc-1", "title": "Fresh",
                        "content": "hello"}}]}
        status, body = http_post(port, "/docs/add", json.dumps(add))
        assert status == 200, body
        res = json.loads(body)
        assert res["added"] == 1 and res["live_docs"] == 601

        path = query_path(q_text, ["x"], "fresh")
        status, _, body = http_get(port, path)
        assert status == 200
        top = json.loads(body)["metadata"]["top_docs"][0]
        assert top["title"] == "Fresh"

        status, body = http_post(port, "/admin/snapshot", "")
        assert status == 200, body
        snap = json.loads(body)
        assert snap["sources"][name]["live_docs"] == 601
        import os

        assert os.path.exists(
            str(tmp_path) + f"/medrag/{name}/embeddings.npy")

        status, body = http_post(
            port, "/docs/delete",
            json.dumps({"source": name, "ids": ["fresh-doc-1"]}))
        assert status == 200, body
        assert json.loads(body)["live_docs"] == 600
        status, _, body = http_get(port, path)
        titles = [d.get("title")
                  for d in json.loads(body)["metadata"]["top_docs"]]
        assert "Fresh" not in titles

        # bad source → 400 with the error text
        status, body = http_post(
            port, "/docs/add", json.dumps({"source": "nope", "docs": []}))
        assert status == 400
    finally:
        ns.stop()


def test_native_immutable_guard_and_batch_generation():
    """Immutable server: /docs/add 400s with the --mutable hint; and a
    /query/batch request with generation ON returns whole answers per
    member through the finisher thread."""
    svc = demo_continuous_service(max_new_tokens=8, slots=2,
                                  chunk_steps=3)
    syn, server = build_server(llm=LLMClient("jax", service=svc))
    ns = NativeFederationServer(server)
    ns.start(thread=True)
    try:
        port = ns.bound_port
        status, body = http_post(
            port, "/docs/add",
            json.dumps({"source": "pubmed", "docs": [{"embedding": [0]}]}))
        assert status == 400 and b"--mutable" in body

        qs = [{"q": q["question"], "choices": json.dumps(q["options"]),
               "qid": q["qid"]} for q in syn.questions[:3]]
        status, body = http_post(port, "/query/batch",
                                 json.dumps({"queries": qs}))
        assert status == 200
        results = json.loads(body)["results"]
        assert len(results) == 3
        for r in results:
            assert r["answer"], "generation must fill every answer"
            assert r["metadata"]["generate_time"] >= 0
    finally:
        ns.stop()


def test_native_simulate_mode():
    """--simulate through the native plane: routes to all sources, canned
    pipeline live, per-query LLM_DELAY applied off the serving loop."""
    import argparse

    from ragroute_tpu.system import ServingSystem

    args = argparse.Namespace(
        dataset="medrag", routing="ragroute", disable_llm=True,
        simulate=True, model="llama3.1-8B-instruct", data_root=None,
        port=0, dtype="float32", impl="exact", buckets=(4,),
        frontend="native")
    system = ServingSystem(args)
    system.build()
    server = system.server
    server.warmup = False
    ns = NativeFederationServer(server)
    ns.start(thread=True)
    try:
        t0 = time.time()
        status, _, body = http_get(
            ns.bound_port, query_path("sim question", {"A": "x"}, "s1"))
        dt = time.time() - t0
        assert status == 200
        data = json.loads(body)
        md = data["metadata"]
        # simulate routes to all sources (reference router.py:222-223)
        assert sorted(md["data_sources"]) == sorted(
            s.name for s in system.world.sources)
        assert dt >= 1.0, "simulate must apply the LLM_DELAY stage"
    finally:
        ns.stop()


def test_native_hostrefine_pipelined():
    """The capacity tier through the C++ plane with PIPELINE mode on by
    default (dispatch/complete engines): wait() runs the host exact
    rescore while the next batch's device scan executes. Responses must
    match the reference schema and the flat engine's winners."""
    from ragroute_tpu.engine.streamed import StreamedSearchEngine
    from ragroute_tpu.index.streamed import StreamedShardSet

    syn = make_synthetic_world("medrag", docs_per_source=1200,
                               num_queries=6, seed=2)
    row_b = 768 + 8
    sset = StreamedShardSet.build(
        syn.world, syn.embeddings, doc_ids=syn.doc_ids, dtype=jnp.int8,
        tier="hostrefine", hbm_budget_bytes=4 * 512 * row_b)
    assert any(s.host is not None for s in sset.sources)
    params = init_router_params(jax.random.key(0),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    engine = StreamedSearchEngine(sset, params, bank)
    server = FederationServer(
        engine, strategy="all",
        embedding_provider=PrecomputedEmbeddings.from_synthetic(syn),
        doc_store=MemoryDocStore.from_synthetic(syn),
        disable_llm=True, port=0, warmup=False,
        batcher=QueryBatcher(engine, strategy="all", window_ms=5.0,
                             buckets=(8,)))
    ns = NativeFederationServer(server)
    assert ns.pipeline, "hostrefine engines default pipeline ON"
    ns.start(thread=True)
    try:
        for q in syn.questions[:3]:
            status, _, body = http_get(
                ns.bound_port, query_path(q["question"], q["options"],
                                          q["qid"]))
            assert status == 200
            md = json.loads(body)["metadata"]
            assert len(md["top_docs"]) == syn.world.k
            assert sorted(md["data_sources"]) == sorted(
                s.name for s in syn.world.sources)
    finally:
        ns.stop()
