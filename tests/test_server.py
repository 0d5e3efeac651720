"""End-to-end HTTP federation protocol tests (synthetic world, CPU)."""

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
from ragroute_tpu.router import RouterBank, init_router_params


def make_server(world_name="medrag", strategy="all", **kw):
    syn = make_synthetic_world(
        world_name, docs_per_source=600, num_queries=8, seed=1)
    shard_set = ShardSet.build(
        syn.world, syn.embeddings, doc_ids=syn.doc_ids, dtype=jnp.float32)
    params = init_router_params(jax.random.key(0), syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    engine = FederatedSearchEngine(shard_set, params, bank, impl="exact")
    server = FederationServer(
        engine,
        strategy=strategy,
        embedding_provider=PrecomputedEmbeddings.from_synthetic(syn),
        doc_store=MemoryDocStore.from_synthetic(syn),
        disable_llm=kw.pop("disable_llm", True),
        port=0,
        warmup=False,  # single-core CPU CI: compile lazily per test
        batcher=QueryBatcher(engine, strategy=strategy, window_ms=5.0,
                             buckets=(8,)),
        **kw,
    )
    return syn, server


async def query_server(port, q, choices, qid):
    async with aiohttp.ClientSession() as session:
        enc_q = aiohttp.helpers.quote(q)
        enc_c = aiohttp.helpers.quote(json.dumps(choices))
        url = (f"http://127.0.0.1:{port}/query?"
               f"q={enc_q}&choices={enc_c}&qid={qid}")
        async with session.get(url) as resp:
            return resp.status, await (resp.json() if resp.status == 200
                                       else resp.text())


def test_query_roundtrip_schema():
    async def run():
        syn, server = make_server()
        await server.start()
        try:
            q = syn.questions[0]
            status, body = await query_server(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert status == 200
            # reference response schema (http_server.py:274-339)
            assert set(body) == {"query_id", "query", "answer", "metadata"}
            md = body["metadata"]
            for field in ["data_sources", "embedding_time", "selection_time",
                          "doc_select_time", "generate_time", "e2e_time",
                          "docs_tokens", "llm", "top_docs",
                          "data_sources_stats"]:
                assert field in md, field
            assert body["answer"] == ""  # disable_llm parity
            assert md["generate_time"] == 0
            assert sorted(md["data_sources"]) == sorted(
                s.name for s in syn.world.sources)  # strategy=all
            assert len(md["top_docs"]) == syn.world.k
            assert md["top_docs"][0]["title"].endswith(
                f"article {md['top_docs'][0]['id'].split('_')[-1]}")
            for name, stats in md["data_sources_stats"].items():
                assert stats["message_size"] > 0
                assert stats["duration"] >= 0
        finally:
            await server.stop()

    asyncio.run(run())


def test_query_validation_errors():
    async def run():
        syn, server = make_server()
        await server.start()
        try:
            port = server.bound_port
            async with aiohttp.ClientSession() as s:
                async with s.get(f"http://127.0.0.1:{port}/query") as r:
                    assert r.status == 400
                    assert await r.text() == "Please provide a query"
                async with s.get(
                        f"http://127.0.0.1:{port}/query?q=x") as r:
                    assert r.status == 400
                    assert await r.text() == "Please provide choices"
                async with s.get(
                        f"http://127.0.0.1:{port}/query?q=x&choices=[bad"
                ) as r:
                    assert r.status == 400
                    assert await r.text() == "Invalid choices format"
        finally:
            await server.stop()

    asyncio.run(run())


def test_batched_concurrent_queries():
    """Many concurrent requests ride one (or few) device batches."""
    async def run():
        syn, server = make_server(strategy="all")
        await server.start()
        try:
            port = server.bound_port
            tasks = [
                query_server(port, q["question"], q["options"], q["qid"])
                for q in syn.questions
            ]
            results = await asyncio.gather(*tasks)
            assert all(status == 200 for status, _ in results)
            batch_sizes = [body["metadata"]["batch_size"]
                           for _, body in results]
            assert max(batch_sizes) > 1  # batching actually happened
        finally:
            await server.stop()

    asyncio.run(run())


def test_bulk_query_endpoint():
    """POST /query/batch: per-item /query semantics, input order, and the
    whole bulk request riding the micro-batcher as one device batch."""
    async def run():
        syn, server = make_server(strategy="all")
        await server.start()
        try:
            port = server.bound_port
            items = [
                {"q": q["question"], "choices": q["options"],
                 "qid": q["qid"]}
                for q in syn.questions[:4]
            ]
            # per-item validation errors must not fail the whole request
            items.append({"q": "", "choices": {"A": "x"}, "qid": "bad0"})
            items.append({"q": "no choices", "choices": "", "qid": "bad1"})
            items.append({"q": "bad json choices", "choices": "[oops",
                          "qid": "bad2"})
            async with aiohttp.ClientSession() as s:
                async with s.post(f"http://127.0.0.1:{port}/query/batch",
                                  json={"queries": items}) as r:
                    assert r.status == 200
                    body = await r.json()
                results = body["results"]
                assert len(results) == len(items)
                for res, q in zip(results[:4], syn.questions[:4]):
                    assert set(res) == {"query_id", "query", "answer",
                                        "metadata"}
                    assert res["query"] == q["question"]  # input order kept
                    md = res["metadata"]
                    assert len(md["top_docs"]) == syn.world.k
                    assert sorted(md["data_sources"]) == sorted(
                        src.name for src in syn.world.sources)
                # one bulk request -> one micro-batch for the valid items
                assert max(r["metadata"]["batch_size"]
                           for r in results[:4]) >= 2
                assert results[4] == {"error": "Please provide a query"}
                assert results[5] == {"error": "Please provide choices"}
                assert results[6] == {"error": "Invalid choices format"}

                # malformed envelopes
                async with s.post(f"http://127.0.0.1:{port}/query/batch",
                                  data=b"not json") as r:
                    assert r.status == 400
                async with s.post(f"http://127.0.0.1:{port}/query/batch",
                                  json={"queries": []}) as r:
                    assert r.status == 400
        finally:
            await server.stop()

    asyncio.run(run())


def test_llm_echo_backend():
    async def run():
        syn, server = make_server(disable_llm=False)
        await server.start()
        try:
            q = syn.questions[0]
            status, body = await query_server(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert status == 200
            assert '"answer_choice": "A"' in body["answer"]
            assert body["metadata"]["generate_time"] > 0
            assert body["metadata"]["docs_tokens"] > 0
        finally:
            await server.stop()

    asyncio.run(run())


def test_feb4rag_requires_qid_and_oracle_rerank():
    async def run():
        syn, server = make_server(world_name="feb4rag", strategy="all")
        # attach qrels that prefer a specific doc for q "syn0"
        target_id = syn.doc_ids["arguana"][5]
        server.relevance_data = {"syn0": [(target_id, "3")]}
        await server.start()
        try:
            port = server.bound_port
            async with aiohttp.ClientSession() as s:
                enc_q = aiohttp.helpers.quote("anything")
                enc_c = aiohttp.helpers.quote(json.dumps(["x"]))
                async with s.get(
                    f"http://127.0.0.1:{port}/query?q={enc_q}&choices={enc_c}"
                ) as r:
                    assert r.status == 400
                    assert "question ID" in await r.text()
            q = syn.questions[0]
            status, body = await query_server(
                port, q["question"], ["x"], q["qid"])
            assert status == 200
            top = body["metadata"]["top_docs"]
            assert len(top) == syn.world.k
            # if the qrels doc was among candidates it must be ranked first
            cand_ids = {d["_id"] for d in top if d}
            if target_id in cand_ids:
                assert top[0]["_id"] == target_id
        finally:
            await server.stop()

    asyncio.run(run())


def test_wikipedia_world_server():
    """Wikipedia world: choices joined into the encoded query
    (http_server.py:147-150), l2-ascending top docs, (title, text) payloads."""
    async def run():
        syn, server = make_server(world_name="wikipedia", strategy="all")
        await server.start()
        try:
            q = syn.questions[0]
            status, body = await query_server(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert status == 200
            md = body["metadata"]
            assert len(md["data_sources"]) == 10
            top = md["top_docs"]
            assert len(top) == syn.world.k
            # (title, text) pairs serialize as 2-lists
            assert len(top[0]) == 2 and "page" in top[0][0]
            # per-source scores are squared L2 distances (non-negative)
            stats = md["data_sources_stats"]
            assert len(stats) == 10
        finally:
            await server.stop()

    asyncio.run(run())


def test_stats_endpoint_aggregates():
    async def run():
        syn, server = make_server(strategy="all")
        await server.start()
        try:
            port = server.bound_port
            for q in syn.questions[:3]:
                await query_server(port, q["question"], q["options"],
                                   q["qid"])
            async with aiohttp.ClientSession() as s:
                async with s.get(f"http://127.0.0.1:{port}/stats") as r:
                    stats = await r.json()
            assert stats["num_queries"] == 3
            assert stats["stages_s"]["e2e"]["count"] == 3
            assert stats["stages_s"]["doc_select"]["p50"] > 0
            assert stats["batch_size"]["count"] == 3
            # present on every backend; a dict of per-device HBM stats
            # where exposed (TPU), None on CPU
            assert "device_memory" in stats
        finally:
            await server.stop()

    asyncio.run(run())


def test_profile_capture_endpoint(tmp_path):
    """POST /admin/profile captures a jax.profiler trace around live
    queries and returns a loadable trace directory."""
    import os

    async def run():
        syn, server = make_server(strategy="all")
        await server.start()
        try:
            port = server.bound_port
            async with aiohttp.ClientSession() as s:
                body = {"seconds": 0.4, "dir": str(tmp_path / "trace")}
                task = asyncio.create_task(
                    s.post(f"http://127.0.0.1:{port}/admin/profile",
                           json=body))
                # give the profiler a real device step to record
                await asyncio.sleep(0.05)
                q = syn.questions[0]
                await query_server(port, q["question"], q["options"],
                                   q["qid"])
                r = await task
                assert r.status == 200, await r.text()
                res = await r.json()
                # trace files land under <dir>/plugins/profile/<run>/
                found = []
                for root, _, files in os.walk(res["trace_dir"]):
                    found.extend(files)
                assert found, f"no trace files under {res['trace_dir']}"

                async with s.post(
                        f"http://127.0.0.1:{port}/admin/profile",
                        json={"seconds": 0}) as r:
                    assert r.status == 400
        finally:
            await server.stop()

    asyncio.run(run())


def test_batcher_bounded_queue():
    """The batcher queue is bounded like the reference's router queue
    (MAX_QUEUE_SIZE=100, config.py:13); submit blocks rather than grows."""
    from ragroute_tpu.engine.batcher import QueryBatcher

    async def run():
        syn, server = make_server(strategy="all")
        b = QueryBatcher(server.engine, strategy="all", max_queue=2)
        assert b.queue.maxsize == 2
        # without a worker running, the 3rd put must block
        import numpy as np
        embs = {e: np.zeros(768, np.float32)
                for e in syn.world.encoders}
        await b.queue.put((embs, None))
        await b.queue.put((embs, None))
        assert b.queue.full()

    asyncio.run(run())


def test_reuse_port_two_servers_one_port():
    """SO_REUSEPORT front-end: two FederationServers bind the SAME port
    (kernel balances connections across them — the multi-process
    front-end, ragroute_tpu.system.run_workers)."""
    import socket

    async def run():
        syn, s1 = make_server()
        s1.reuse_port = True
        # pick a free port first (reuse_port needs a concrete port)
        probe = socket.socket()
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()
        s1.port = port
        _, s2 = make_server()
        s2.reuse_port = True
        s2.port = port
        await s1.start()
        await s2.start()
        try:
            ok = 0
            for _ in range(4):
                q = syn.questions[0]
                status, _body = await query_server(
                    port, q["question"], q["options"], q["qid"])
                ok += status == 200
            assert ok == 4
        finally:
            await s1.stop()
            await s2.stop()

    asyncio.run(run())


def test_raw_splice_matches_parsed_encoding():
    """The raw-doc splice fast path (disable_llm: on-disk jsonl lines
    spliced verbatim into the response body) must be semantically
    identical to the parsed encoder — including under the bulk endpoint
    and under a splice-token collision in request text (fallback)."""
    async def run():
        syn, server = make_server()
        assert server._get_raw is not None  # raw mode active
        await server.start()
        try:
            q = syn.questions[0]
            status, body_raw = await query_server(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert status == 200

            # same query through the parsed path
            server._get_raw = None
            status, body_parsed = await query_server(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert status == 200
            assert body_raw["metadata"]["top_docs"] == \
                body_parsed["metadata"]["top_docs"]
            assert set(body_raw) == set(body_parsed)
        finally:
            await server.stop()
    asyncio.run(run())


def test_raw_splice_token_collision_falls_back():
    async def run():
        syn, server = make_server()
        await server.start()
        try:
            q = syn.questions[0]
            # a query containing the exact splice token: the split-count
            # guard must detect it and rebuild via the parsed encoder
            evil = f"what about {server._raw_token} eh"
            status, body = await query_server(
                server.bound_port, evil, q["options"], q["qid"])
            assert status == 200
            assert body["query"] == evil
            docs = body["metadata"]["top_docs"]
            assert len(docs) == syn.world.k
            assert all(isinstance(d, dict) for d in docs)
        finally:
            await server.stop()
    asyncio.run(run())


def test_bulk_endpoint_raw_splice():
    async def run():
        syn, server = make_server()
        assert server._get_raw is not None
        await server.start()
        try:
            items = [{"q": q["question"], "choices": q["options"],
                      "qid": q["qid"]} for q in syn.questions[:4]]
            items.append({"choices": {"A": "x"}})     # error row: missing q
            async with aiohttp.ClientSession() as session:
                url = f"http://127.0.0.1:{server.bound_port}/query/batch"
                async with session.post(url, json={"queries": items}) as r:
                    assert r.status == 200
                    body = await r.json()
            res = body["results"]
            assert len(res) == 5
            assert res[4] == {"error": "Please provide a query"}
            for r in res[:4]:
                docs = r["metadata"]["top_docs"]
                assert len(docs) == syn.world.k
                assert all(isinstance(d, dict) for d in docs)
                assert "__rawdocs__" not in r
        finally:
            await server.stop()
    asyncio.run(run())


def test_batcher_stop_fails_pending_futures():
    """stop() must resolve queued + in-flight futures with an error so
    graceful shutdown never strands a handler until the query timeout."""
    async def run():
        syn, server = make_server(strategy="all")
        b = QueryBatcher(server.engine, strategy="all", window_ms=5.0,
                         buckets=(8,))
        embs = {e: np.zeros(
            next(s.embed_dim for s in syn.world.sources if s.encoder == e),
            np.float32) for e in syn.world.encoders}
        # no worker started: submits stay queued
        t1 = asyncio.create_task(b.submit(embs))
        t2 = asyncio.create_task(b.submit(embs))
        await asyncio.sleep(0.01)
        await b.stop()
        for t in (t1, t2):
            try:
                await t
                raise AssertionError("stranded future resolved silently")
            except RuntimeError as e:
                assert "stopped" in str(e)

    asyncio.run(run())


def test_batcher_demux_failure_fails_remaining_futures():
    """A failure while demultiplexing a batch result must deliver the
    exception to the batch's unresolved futures, not kill the worker with
    them stranded (they'd hang the full 300 s query timeout)."""
    async def run():
        syn, server = make_server(strategy="all")
        b = QueryBatcher(server.engine, strategy="all", window_ms=5.0,
                         buckets=(8,))

        class Broken:
            """SearchOutput stand-in whose slicing raises."""
            def __getattr__(self, name):
                raise ValueError("malformed output")

        b._run_batch = lambda batch: (Broken(), len(batch))
        await b.start()
        embs = {e: np.zeros(
            next(s.embed_dim for s in syn.world.sources if s.encoder == e),
            np.float32) for e in syn.world.encoders}
        try:
            with_err = None
            try:
                await asyncio.wait_for(b.submit(embs), timeout=10)
            except ValueError as e:
                with_err = e
            assert with_err is not None and "malformed" in str(with_err)
            # the worker survived and still serves the next batch's error
            try:
                await asyncio.wait_for(b.submit(embs), timeout=10)
            except ValueError:
                pass
        finally:
            await b.stop()

    asyncio.run(run())


def test_message_size_ignores_padding_ids():
    """Padded/negative shard ids must not numpy-wrap into real doc rows
    when estimating per-source message sizes (parity metric)."""
    import dataclasses as dc

    syn, server = make_server(strategy="all")
    k = syn.world.k
    base = dict(
        probs=np.ones(syn.world.num_sources, np.float32),
        mask=np.ones(syn.world.num_sources, bool),
        shard_scores=None,
        merged_score=np.zeros((1, k), np.float32),
        merged_shard=np.zeros((1, k), np.int32),
        merged_local=np.zeros((1, k), np.int32),
        merged_valid=k, selection_time=0.0, doc_select_time=0.0,
        batch_size=1)
    from ragroute_tpu.engine.batcher import QueryResult
    res_pad = QueryResult(
        shard_ids=np.full((syn.world.num_sources, k), -1, np.int32), **base)
    res_real = QueryResult(
        shard_ids=np.zeros((syn.world.num_sources, k), np.int32), **base)
    s_pad = server._estimate_message_size(res_pad, 0, "q" * 36)
    s_real = server._estimate_message_size(res_real, 0, "q" * 36)
    # all-padding rows estimate only envelope + fallback bytes — strictly
    # less than rows resolving real ids/docs
    assert s_pad < s_real


def test_device_msg_base_matches_host_estimator():
    """Device-computed [B, N] response sizes (msg_base) must equal the
    host numpy estimator over the same shard ids — the serving path
    swaps a [B, N, k] shard_ids fetch for msg_base, so any divergence
    silently corrupts the message_size parity metric."""
    import os

    os.environ["RAGROUTE_DEVICE_MSG_SIZE"] = "1"  # default is OFF on CPU
    try:
        syn, server = make_server(strategy="all")
    finally:
        del os.environ["RAGROUTE_DEVICE_MSG_SIZE"]
    engine = server.engine
    # forced on: the server built device tables for this immutable world
    assert engine._ptables is not None
    dims = {s.encoder: s.embed_dim for s in syn.world.sources}
    rng = np.random.default_rng(7)
    embs = {e: rng.standard_normal((8, d)).astype(np.float32)
            for e, d in dims.items()}
    out_ids = engine.search(embs, strategy="all", fetch_candidates=True)
    out_msg = engine.search(embs, strategy="all", fetch_candidates=False)
    assert out_msg.shard_ids is None and out_msg.msg_base is not None
    qid = "q" * 36
    host = server._estimate_message_sizes_chunk(out_ids.shard_ids, len(qid))
    np.testing.assert_array_equal(
        out_msg.msg_base.astype(np.int64) + len(qid), host)

    # crafted ids: pads (-1), boundaries (0, n-1) and out-of-range rows
    # must all match the host estimator's per-table range guards
    from ragroute_tpu.engine.engine import payload_base

    n0 = engine.shard_set.shards[0].n_docs
    k = syn.world.k
    ids = np.zeros((2, syn.world.num_sources, k), np.int32)
    ids[0, :, 0] = -1
    ids[0, :, 1] = n0 - 1
    ids[1, :, 0] = n0          # out of range
    ids[1, :, 1] = n0 + 5
    dev = np.asarray(payload_base(engine._ptables, jnp.asarray(ids)))
    host2 = server._estimate_message_sizes_chunk(ids, 0)
    np.testing.assert_array_equal(dev.astype(np.int64), host2)


def test_run_workers_rejects_mutable():
    """--workers N + --mutable would serve inconsistent indexes (each
    worker owns an independent copy); must fail loudly at startup."""
    import argparse

    import pytest

    from ragroute_tpu.system import run_workers

    args = argparse.Namespace(mutable=True)
    with pytest.raises(ValueError, match="mutable"):
        run_workers(args, 2)


def test_embedding_batcher_batches_and_demuxes():
    """Concurrent submits share one embed_many call per bucket window,
    padded to a bucket size; rows demux to the right callers and
    failures/stop follow QueryBatcher semantics."""
    from ragroute_tpu.engine.embedding import EmbeddingBatcher

    calls = []

    class FakeProvider:
        blocking = True

        def embed_many(self, queries, qids):
            calls.append((list(queries), list(qids)))
            return [{"enc": np.full(4, float(len(q)), np.float32)}
                    for q in queries]

    async def run():
        b = EmbeddingBatcher(FakeProvider(), window_ms=20.0,
                             buckets=(1, 4))
        await b.start()
        outs = await asyncio.gather(
            b.submit("aa", "q0"), b.submit("bbb", "q1"),
            b.submit("c", "q2"))
        assert [float(o["enc"][0]) for o in outs] == [2.0, 3.0, 1.0]
        # all three rode one forward, padded to bucket 4 by repeating
        # the final entry
        grouped = [c for c in calls if len(c[0]) > 1]
        assert grouped and len(grouped[0][0]) == 4
        assert grouped[0][0][-1] == grouped[0][0][-2]

        # a failing batch delivers to its waiters, worker survives
        def boom(queries, qids):
            raise RuntimeError("encoder down")

        b.provider.embed_many = boom
        try:
            await asyncio.wait_for(b.submit("x", "q3"), timeout=10)
            raise AssertionError("failure swallowed")
        except RuntimeError as e:
            assert "encoder down" in str(e)
        b.provider.embed_many = FakeProvider().embed_many
        again = await asyncio.wait_for(b.submit("yy", "q4"), timeout=10)
        assert float(again["enc"][0]) == 2.0

        # stop() fails queued submits instead of stranding them
        b2 = EmbeddingBatcher(FakeProvider(), window_ms=5.0, buckets=(2,))
        t = asyncio.create_task(b2.submit("z", "q5"))
        await asyncio.sleep(0.01)
        await b2.stop()
        try:
            await t
            raise AssertionError("stranded submit resolved")
        except RuntimeError as e:
            assert "stopped" in str(e)
        await b.stop()

    asyncio.run(run())


def test_served_zoo_embedding_batches():
    """--embedder zoo serving: concurrent HTTP queries share encoder
    forwards through the EmbeddingBatcher, and results are identical to
    the unbatched provider.embed path."""
    from ragroute_tpu.engine.embedding import EncoderZooEmbeddings

    async def run():
        syn, _ = make_server(strategy="all")
        provider = EncoderZooEmbeddings(syn.world)  # hash-backend zoo
        shard_set = ShardSet.build(
            syn.world, syn.embeddings, doc_ids=syn.doc_ids,
            dtype=jnp.float32)
        params = init_router_params(
            jax.random.key(0), syn.world.router_input_dim)
        bank = RouterBank.create(syn.world, syn.centroids)
        engine = FederatedSearchEngine(shard_set, params, bank,
                                       impl="exact")
        server = FederationServer(
            engine, strategy="all", embedding_provider=provider,
            doc_store=MemoryDocStore.from_synthetic(syn),
            disable_llm=True, port=0, warmup=False,
            batcher=QueryBatcher(engine, strategy="all", window_ms=5.0,
                                 buckets=(8,)))
        assert server.embed_batcher is not None
        await server.start()
        try:
            qs = syn.questions[:6]
            res = await asyncio.gather(*[
                query_server(server.bound_port, q["question"],
                             q["options"], q["qid"]) for q in qs])
            assert all(st == 200 for st, _ in res)
            assert server.embed_batcher.batches >= 1
            # grouping happened: fewer forwards than queries
            assert (server.embed_batcher.batches
                    < server.embed_batcher.batched_queries)
            # batch-size independence: the same question served alone
            # (batch of 1) returns the same docs as the concurrent run
            st, alone = await query_server(
                server.bound_port, qs[0]["question"], qs[0]["options"],
                qs[0]["qid"])
            assert st == 200
            ids = [d["id"] for d in alone["metadata"]["top_docs"]]
            ids_concurrent = [d["id"]
                              for d in res[0][1]["metadata"]["top_docs"]]
            assert ids == ids_concurrent
            # stats surface the batching counters
            async with aiohttp.ClientSession() as s:
                async with s.get(
                        f"http://127.0.0.1:{server.bound_port}/stats"
                ) as resp:
                    stats = await resp.json()
            assert stats["embedding"]["batched_queries"] == len(qs) + 1
        finally:
            await server.stop()

    asyncio.run(run())


def test_rows_fast_path_matches_dense_path():
    """Device query-table rows path == dense [B, d] upload, byte-for-byte.

    A table-backed provider wires engine.set_query_table at server init;
    known qids then travel as int32 row indices and the engine gathers
    the embeddings on device. The served response must be identical to
    the dense path (same vectors, same step program)."""
    async def run():
        syn, server = make_server()
        assert server._rows_wired  # PrecomputedEmbeddings auto-wires
        await server.start()
        try:
            q = syn.questions[0]
            st, via_rows = await query_server(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert st == 200
            server._rows_wired = False  # force the dense provider path
            st, via_dense = await query_server(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert st == 200
            for body in (via_rows, via_dense):
                for f in ("query_id", "embedding_time", "e2e_time",
                          "selection_time", "doc_select_time"):
                    body.pop(f, None)
                    body["metadata"].pop(f, None)
                for stats in body["metadata"]["data_sources_stats"].values():
                    stats.pop("duration", None)
            assert via_rows == via_dense

            # unknown qid: falls back to hash embeddings and still serves
            st, body = await query_server(
                server.bound_port, q["question"], q["options"],
                "no-such-qid")
            assert st == 200
            assert len(body["metadata"]["top_docs"]) == syn.world.k
        finally:
            await server.stop()

    asyncio.run(run())


def test_batcher_mixed_rows_and_dense_batch():
    """A batch mixing table rows and dense embeddings falls back to the
    dense stacking path and matches the all-dense result exactly."""
    syn, server = make_server()
    provider = server.provider
    batcher = server.batcher
    engine = server.engine

    dense = [provider.embed(q["question"], q["qid"])
             for q in syn.questions[:3]]
    rows = [provider.row_of(q["qid"]) for q in syn.questions[:3]]
    assert all(r is not None for r in rows)

    mixed = [({"__row__": rows[0]}, None), (dense[1], None),
             ({"__row__": rows[2]}, None)]
    all_dense = [(d, None) for d in dense]
    all_rows = [({"__row__": r}, None) for r in rows]

    out_mixed, n1 = batcher._run_batch(mixed)
    out_dense, n2 = batcher._run_batch(all_dense)
    out_rows, n3 = batcher._run_batch(all_rows)
    assert n1 == n2 == n3 == 3
    # compare live rows only: pad rows differ by design (rows path
    # pads with table row 0, dense pads with zero vectors; both are
    # dropped at demux)
    np.testing.assert_array_equal(out_mixed.merged_shard[:3],
                                  out_dense.merged_shard[:3])
    np.testing.assert_array_equal(out_mixed.merged_local[:3],
                                  out_dense.merged_local[:3])
    np.testing.assert_array_equal(out_rows.merged_shard[:3],
                                  out_dense.merged_shard[:3])
    np.testing.assert_array_equal(out_rows.merged_local[:3],
                                  out_dense.merged_local[:3])
    np.testing.assert_allclose(out_rows.merged_score[:3],
                               out_dense.merged_score[:3], rtol=0, atol=0)

    # engine-level: gathered device embeddings == uploaded dense rows
    got = engine._device_embs({"__rows__": np.asarray(rows, np.int32)})
    for enc in syn.world.encoders:
        want = np.stack([d[enc] for d in dense])
        np.testing.assert_array_equal(np.asarray(got[enc]), want)
