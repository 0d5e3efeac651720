"""Snapshot persistence for mutable worlds: POST /admin/snapshot and
ShardSet.snapshot write the LIVE corpus (embeddings, doc ids, payloads)
back to the data root so a fresh boot serves the mutated index.

Beyond-reference capability closing the durability loop opened by the
live-update endpoints (the reference's FAISS indexes are read-only once
loaded, ``data_source.py:69-80``, and it has no write-back of any kind).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragroute_tpu.engine import FederatedSearchEngine
from ragroute_tpu.index import ShardSet, make_synthetic_world
from ragroute_tpu.router import RouterBank, init_router_params


def _mutable_world(dtype=jnp.float32, docs=400, seed=11):
    syn = make_synthetic_world(
        "medrag", docs_per_source=docs, num_queries=8, seed=seed)
    shard_set = ShardSet.build(
        syn.world, syn.embeddings, doc_ids=syn.doc_ids, dtype=dtype,
        mutable=True, reserve_docs=32)
    return syn, shard_set


def _churn(syn, shard_set, rng):
    """Delete a few build-time docs, add a few new ones (some into the
    recycled slots), in every source; returns the expected live corpus
    as {source: (emb_rows, ids)} in snapshot (ascending-slot) order."""
    expected = {}
    for si, src in enumerate(syn.world.sources):
        name = src.name
        ids = list(syn.doc_ids[name])
        # delete 3 docs from the middle (slots 5,6,7)
        dead = [ids[5], ids[6], ids[7]]
        shard_set.delete_docs(name, doc_ids=dead)
        # add 5 fresh docs: 3 reuse the freed slots, 2 land in reserve
        fresh = rng.standard_normal((5, src.embed_dim)).astype(np.float32)
        fresh_ids = [f"fresh-{name}-{i}" for i in range(5)]
        shard_set.add_docs(name, fresh, doc_ids=fresh_ids)

        n = len(ids)
        cap = shard_set.shards[si].capacity
        slot_rows, slot_ids = {}, {}
        for s in range(n):
            if s in (5, 6, 7):
                continue
            slot_rows[s] = np.asarray(syn.embeddings[name][s], np.float32)
            slot_ids[s] = ids[s]
        free = list(range(cap - 1, n - 1, -1))  # build-time free stack
        # add_docs pops the free stack: reserve slots first is WRONG —
        # delete pushed 5,6,7 on top, so adds reuse those, then reserve
        free.extend([5, 6, 7])
        for i in range(5):
            s = free.pop()
            slot_rows[s] = fresh[i]
            slot_ids[s] = fresh_ids[i]
        order = sorted(slot_rows)
        expected[name] = (np.stack([slot_rows[s] for s in order]),
                          [slot_ids[s] for s in order])
    return expected


def test_snapshot_roundtrip_exact(tmp_path):
    """Churn → snapshot → ShardSet.load gives byte-identical f32 rows and
    doc ids to the live set's expected state; reloading the SNAPSHOT and
    searching matches searching the LIVE mutated set exactly (f32)."""
    syn, live = _mutable_world(jnp.float32)
    expected = _churn(syn, live, np.random.default_rng(0))

    root = str(tmp_path)
    report = live.snapshot(root)
    for name, (rows, ids) in expected.items():
        assert report[name]["live_docs"] == rows.shape[0]
        d = ShardSet.source_dir(root, "medrag", name)
        got = np.load(os.path.join(d, "embeddings.npy"))
        np.testing.assert_array_equal(got, rows)
        with open(os.path.join(d, "doc_ids.json")) as f:
            assert json.load(f) == ids

    # reload and compare search winners (ids) on both engines
    reloaded = ShardSet.load(root, syn.world, dtype=jnp.float32)
    params = init_router_params(
        jax.random.key(0), syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    e_live = FederatedSearchEngine(live, params, bank, impl="exact")
    e_new = FederatedSearchEngine(reloaded, params, bank, impl="exact")
    o_live = e_live.search(syn.query_embs, strategy="all", staged=False)
    o_new = e_new.search(syn.query_embs, strategy="all", staged=False)
    for qi in range(o_live.merged_shard.shape[0]):
        def ids_of(out, ss):
            got = []
            for j in range(out.merged_shard.shape[1]):
                s = int(out.merged_shard[qi, j])
                if s < 0:
                    continue
                tbl = ss.doc_ids[syn.world.sources[s].name]
                got.append((s, str(tbl[int(out.merged_local[qi, j])])))
            return got
        assert ids_of(o_live, live) == ids_of(o_new, reloaded)


def test_snapshot_lossy_dtype_rounds_once(tmp_path):
    """bf16: snapshot stores f32 host rows, so reload rounds exactly once
    (same as a cold build) — winner sets must match the live engine's."""
    syn, live = _mutable_world(jnp.bfloat16)
    _churn(syn, live, np.random.default_rng(1))
    root = str(tmp_path)
    live.snapshot(root)
    reloaded = ShardSet.load(root, syn.world, dtype=jnp.bfloat16)
    for si, src in enumerate(syn.world.sources):
        a, b = live.shards[si], reloaded.shards[si]
        live_slots = live.live_slots(src.name)
        da = np.asarray(a.docs)[live_slots]
        db = np.asarray(b.docs)[: len(live_slots)]
        # build-time centering means recomputed on the mutated corpus →
        # stored residuals differ by (mu_old - mu_new); compare decentered
        ca = np.asarray(a.center) if a.center is not None else 0.0
        cb = np.asarray(b.center) if b.center is not None else 0.0
        # each side carries ONE bf16 rounding (ulp = |x| * 2^-8 at these
        # magnitudes), plus the centering shift reconstruction
        tol = 2.0 * 2.0 ** -8 * float(np.abs(da.astype(np.float32)).max()
                                      + np.abs(np.asarray(ca)).max())
        np.testing.assert_allclose(
            da.astype(np.float32) + ca, db.astype(np.float32) + cb,
            atol=tol)


def test_snapshot_requires_mutable(tmp_path):
    syn = make_synthetic_world("medrag", docs_per_source=64,
                               num_queries=2, seed=1)
    ss = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32)
    with pytest.raises(ValueError, match="mutable"):
        ss.snapshot(str(tmp_path))


def test_served_snapshot_http(tmp_path):
    """Full loop over HTTP: add a doc with a payload, POST
    /admin/snapshot, then boot a SECOND server from the snapshot root —
    the fresh boot returns the added doc with its payload."""
    import asyncio
    import urllib.parse

    import aiohttp

    from ragroute_tpu.engine.batcher import QueryBatcher
    from ragroute_tpu.engine.embedding import HashEmbeddings
    from ragroute_tpu.engine.server import FederationServer
    from ragroute_tpu.index.store import JsonlDirDocStore, MemoryDocStore

    syn = make_synthetic_world(
        "medrag", docs_per_source=300, num_queries=4, seed=7)
    root = str(tmp_path)
    live = ShardSet.build(
        syn.world, syn.embeddings, doc_ids=syn.doc_ids,
        dtype=jnp.float32, mutable=True, reserve_docs=16)
    params = init_router_params(
        jax.random.key(0), syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    provider = HashEmbeddings(syn.world)
    src = syn.world.sources[0]
    q_text = "query that finds the fresh doc"
    emb = provider.embed(q_text, "qid-f")[src.encoder]
    doc_emb = (emb / max(float(np.linalg.norm(emb)), 1e-9)) * 1e3

    def make_server(shard_set, store, data_root):
        eng = FederatedSearchEngine(shard_set, params, bank, impl="exact")
        return FederationServer(
            eng, strategy="all", embedding_provider=provider,
            doc_store=store, disable_llm=True, port=0, warmup=False,
            data_root=data_root,
            batcher=QueryBatcher(eng, strategy="all", window_ms=5.0,
                                 buckets=(4,)))

    async def run():
        server = make_server(live, MemoryDocStore.from_synthetic(syn), root)
        await server.start()
        try:
            port = server.bound_port
            async with aiohttp.ClientSession() as s:
                add = {"source": src.name, "docs": [{
                    "id": "fresh-1", "embedding": doc_emb.tolist(),
                    "payload": {"id": "fresh-1", "title": "FreshSnap",
                                "content": "persisted"}}]}
                async with s.post(f"http://127.0.0.1:{port}/docs/add",
                                  json=add) as r:
                    assert r.status == 200, await r.text()
                async with s.post(
                        f"http://127.0.0.1:{port}/admin/snapshot") as r:
                    assert r.status == 200, await r.text()
                    body = await r.json()
                assert body["sources"][src.name]["live_docs"] == 301
        finally:
            await server.stop()

        # fresh boot from the snapshot (as main.py would)
        reloaded = ShardSet.load(root, syn.world, dtype=jnp.float32)
        assert reloaded.shards[0].n_docs == 301
        store2 = JsonlDirDocStore(
            os.path.join(root, "medrag", "payloads"))
        server2 = make_server(reloaded, store2, None)
        await server2.start()
        try:
            port = server2.bound_port
            url = (f"http://127.0.0.1:{port}/query?"
                   f"q={urllib.parse.quote(q_text)}"
                   f"&choices=%5B%22x%22%5D&qid=qid-f")
            async with aiohttp.ClientSession() as s:
                async with s.get(url) as r:
                    assert r.status == 200
                    res = await r.json()
            top = res["metadata"]["top_docs"][0]
            assert top["title"] == "FreshSnap"

            # snapshot on a rootless immutable server → 400s
            async with aiohttp.ClientSession() as s:
                async with s.post(
                        f"http://127.0.0.1:{port}/admin/snapshot") as r:
                    assert r.status == 400
        finally:
            await server2.stop()

    asyncio.run(run())
