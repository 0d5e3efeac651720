"""Served federation over a device mesh (BASELINE config #5).

The reference's whole point is a *running federation*
(``ragroute/ragroute.py:43-54``); these tests drive real HTTP queries
through :class:`FederationServer` with :class:`ShardedSearch` as the
engine on the virtual 8-device CPU mesh — the servable multi-chip
configuration, not just the library-level sharded step.
"""

import asyncio
import json

import numpy as np

import jax
import jax.numpy as jnp
import aiohttp

from ragroute_tpu.engine import FederatedSearchEngine
from ragroute_tpu.engine.batcher import QueryBatcher
from ragroute_tpu.engine.embedding import PrecomputedEmbeddings
from ragroute_tpu.engine.server import FederationServer
from ragroute_tpu.index import ShardSet, make_synthetic_world
from ragroute_tpu.index.store import MemoryDocStore
from ragroute_tpu.parallel import ShardedSearch, make_mesh
from ragroute_tpu.router import RouterBank, init_router_params


def make_mesh_server(world_name="medrag", strategy="all", dp=2, idx=4,
                     **kw):
    syn = make_synthetic_world(
        world_name, docs_per_source=600, num_queries=8, seed=1)
    shard_set = ShardSet.build(
        syn.world, syn.embeddings, doc_ids=syn.doc_ids, dtype=jnp.float32)
    params = init_router_params(jax.random.key(0),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    mesh = make_mesh(dp=dp, idx=idx)
    engine = ShardedSearch(shard_set, params, bank, mesh, impl="exact")
    server = FederationServer(
        engine,
        strategy=strategy,
        embedding_provider=PrecomputedEmbeddings.from_synthetic(syn),
        doc_store=MemoryDocStore.from_synthetic(syn),
        disable_llm=True,
        port=0,
        warmup=False,  # single-core CPU CI: compile lazily per test
        batcher=QueryBatcher(engine, strategy=strategy, window_ms=5.0,
                             buckets=(8,)),
        **kw,
    )
    return syn, shard_set, params, bank, server


def test_mesh_device_msg_base_matches_host_estimator():
    """The mesh engine's device-computed response sizes must match the
    host estimator over the same shard ids (same gate as the single-chip
    engine; the [B, N, k] fetch it replaces crosses ICI+PCIe here)."""
    import os

    os.environ["RAGROUTE_DEVICE_MSG_SIZE"] = "1"  # default OFF on CPU
    try:
        syn, shard_set, params, bank, server = make_mesh_server()
    finally:
        del os.environ["RAGROUTE_DEVICE_MSG_SIZE"]
    engine = server.engine
    assert engine._ptables is not None
    dims = {s.encoder: s.embed_dim for s in syn.world.sources}
    rng = np.random.default_rng(3)
    embs = {e: rng.standard_normal((8, d)).astype(np.float32)
            for e, d in dims.items()}
    out_ids = engine.search(embs, strategy="all", fetch_candidates=True)
    out_msg = engine.search(embs, strategy="all", fetch_candidates=False)
    assert out_msg.shard_ids is None and out_msg.msg_base is not None
    qid = "q" * 36
    host = server._estimate_message_sizes_chunk(out_ids.shard_ids, len(qid))
    np.testing.assert_array_equal(
        out_msg.msg_base.astype(np.int64) + len(qid), host)


async def query_server(port, q, choices, qid):
    async with aiohttp.ClientSession() as session:
        enc_q = aiohttp.helpers.quote(q)
        enc_c = aiohttp.helpers.quote(json.dumps(choices))
        url = (f"http://127.0.0.1:{port}/query?"
               f"q={enc_q}&choices={enc_c}&qid={qid}")
        async with session.get(url) as resp:
            return resp.status, await (resp.json() if resp.status == 200
                                       else resp.text())


def test_mesh_served_query_matches_single_chip():
    """An HTTP query served over the mesh returns the same winner docs as
    the single-chip engine (same world, same router params)."""
    async def run():
        syn, shard_set, params, bank, server = make_mesh_server()
        await server.start()
        try:
            q = syn.questions[0]
            status, body = await query_server(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert status == 200
            md = body["metadata"]
            assert set(body) == {"query_id", "query", "answer", "metadata"}
            assert sorted(md["data_sources"]) == sorted(
                s.name for s in syn.world.sources)  # strategy=all
            assert len(md["top_docs"]) == syn.world.k

            ref_engine = FederatedSearchEngine(
                shard_set, params, bank, impl="exact")
            embs = {e: syn.query_embs[e][:1] for e in syn.world.encoders}
            ref = ref_engine.search(embs, strategy="all")
            want = {syn.doc_payloads[syn.world.sources[s].name][l]["id"]
                    for s, l in zip(ref.merged_shard[0],
                                    ref.merged_local[0]) if s >= 0}
            got = {d["id"] for d in md["top_docs"]}
            # winner SETS match (near-ties at the k boundary may swap)
            assert len(got & want) >= int(0.95 * syn.world.k)
        finally:
            await server.stop()

    asyncio.run(run())


def test_mesh_zero_routed_query_completes():
    """strategy=none on the mesh: the reference completes zero-routed
    queries immediately with no sources (http_server.py:212-214) — the
    served mesh must return 200 with empty sources/docs, not hang."""
    async def run():
        syn, _, _, _, server = make_mesh_server(strategy="none")
        await server.start()
        try:
            q = syn.questions[0]
            status, body = await asyncio.wait_for(
                query_server(server.bound_port, q["question"],
                             q["options"], q["qid"]),
                timeout=120)
            assert status == 200
            md = body["metadata"]
            assert md["data_sources"] == []
            assert md["top_docs"] == []
            assert md["data_sources_stats"] == {}
            assert body["answer"] == ""  # disable_llm
        finally:
            await server.stop()

    asyncio.run(run())


def test_mesh_serving_system_boot():
    """python main.py --mesh 2x4 equivalent: ServingSystem constructs the
    sharded engine and serves HTTP over it end to end."""
    import argparse

    from ragroute_tpu.system import ServingSystem

    args = argparse.Namespace(
        dataset="medrag", routing="all", disable_llm=True, simulate=True,
        model="llama3.1-8B-instruct", data_root=None, port=0,
        dtype="float32", impl="exact", buckets=(8,), mesh="2x4")

    async def run():
        system = ServingSystem(args)
        await system.start()
        try:
            assert isinstance(system.server.engine, ShardedSearch)
            assert dict(system.server.engine.mesh.shape) == {
                "dp": 2, "idx": 4}
            port = system.server.bound_port
            async with aiohttp.ClientSession() as s:
                enc_c = aiohttp.helpers.quote(json.dumps({"A": "x"}))
                async with s.get(
                    f"http://127.0.0.1:{port}/query?q=test&choices={enc_c}"
                ) as r:
                    assert r.status == 200
                    body = await r.json()
                    assert len(body["metadata"]["data_sources"]) == 4
        finally:
            await system.stop()

    asyncio.run(run())


def test_mesh_spec_parsing():
    from ragroute_tpu.system import parse_mesh_spec

    assert parse_mesh_spec("2x4") == (2, 4)
    assert parse_mesh_spec("1X8") == (1, 8)
    import pytest

    with pytest.raises(ValueError):
        parse_mesh_spec("8")
    with pytest.raises(ValueError):
        parse_mesh_spec("0x4")


def test_mesh_native_frontend_serves():
    """--mesh + --frontend native: the C++ IO plane over ShardedSearch.

    ShardedSearch implements only the blocking ``search`` (no deferred
    ``search_submit``); the native loop must fall back to the blocking
    call rather than 500 every query (regression: the pipelined-loop
    refactor briefly assumed search_submit on every engine)."""
    import http.client
    import pytest
    from ragroute_tpu.engine.native_frontend import (
        NativeFederationServer, native_frontend_available)
    from urllib.parse import quote

    if not native_frontend_available():
        pytest.skip("native frontend unavailable (g++ missing)")

    syn, shard_set, params, bank, server = make_mesh_server()
    assert not hasattr(server.engine, "search_submit")
    ns = NativeFederationServer(server)
    ns.start(thread=True)
    try:
        q = syn.questions[0]
        conn = http.client.HTTPConnection("127.0.0.1", ns.bound_port,
                                          timeout=300)
        conn.request("GET", (f"/query?q={quote(q['question'])}"
                             f"&choices={quote(json.dumps(q['options']))}"
                             f"&qid={q['qid']}"))
        r = conn.getresponse()
        body = r.read()
        conn.close()
        assert r.status == 200, body[:200]
        data = json.loads(body)
        assert len(data["metadata"]["top_docs"]) == syn.world.k
        assert sorted(data["metadata"]["data_sources"]) == sorted(
            s.name for s in syn.world.sources)
    finally:
        ns.stop()
