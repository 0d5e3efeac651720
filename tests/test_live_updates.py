"""Live index updates: add/delete documents on a serving shard set.

Beyond-reference capability (the reference's FAISS indexes are read-only
once loaded, ``data_source.py:69-80``): mutable shards carry liveness in
the per-row gain bias, so updates are donated device scatters with no
recompile, and the next engine step sees the new corpus.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragroute_tpu.engine import FederatedSearchEngine
from ragroute_tpu.index import ShardSet, make_synthetic_world
from ragroute_tpu.oracle import exact_oracle
from ragroute_tpu.router import RouterBank, init_router_params


def _world(world_name="medrag", docs=600, holdout=40, seed=3):
    """Synthetic world split into (served part, held-out docs per source)."""
    syn = make_synthetic_world(
        world_name, docs_per_source=docs, num_queries=16, seed=seed)
    base_emb, held_emb = {}, {}
    base_ids, held_ids = {}, {}
    for name, emb in syn.embeddings.items():
        base_emb[name] = emb[:-holdout]
        held_emb[name] = emb[-holdout:]
        ids = syn.doc_ids[name]
        base_ids[name] = list(ids[:-holdout])
        held_ids[name] = list(ids[-holdout:])
    return syn, base_emb, held_emb, base_ids, held_ids


def _engine(syn, embeddings, doc_ids, dtype, **build_kw):
    shard_set = ShardSet.build(
        syn.world, embeddings, doc_ids=doc_ids, dtype=dtype, **build_kw)
    params = init_router_params(
        jax.random.key(0), syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    return shard_set, FederatedSearchEngine(
        shard_set, params, bank, impl="exact")


def _key(payload):
    """Hashable view of a doc-id payload (medrag ids are dicts)."""
    return str(payload)


def _winner_ids(world, shard_set, out):
    """Merged winners as {(source_idx, doc_id_key)} per query."""
    res = []
    for qi in range(out.merged_shard.shape[0]):
        got = set()
        for j in range(out.merged_shard.shape[1]):
            si = int(out.merged_shard[qi, j])
            if si < 0:
                continue
            table = shard_set.doc_ids[world.sources[si].name]
            got.add((si, _key(table[int(out.merged_local[qi, j])])))
        res.append(got)
    return res


def _oracle_ids(world, embeddings, doc_ids, query_embs, k):
    want = exact_oracle(world, embeddings, query_embs, k)
    out = []
    for s in want:
        out.append({(si, _key(doc_ids[world.sources[si].name][li]))
                    for si, li in s})
    return out


def test_add_docs_exact_f32_matches_full_build_oracle():
    """After adding the held-out docs, f32 search equals the oracle over
    the FULL corpus — and the adds triggered zero new engine compiles."""
    syn, base_emb, held_emb, base_ids, held_ids = _world()
    shard_set, engine = _engine(
        syn, base_emb, base_ids, jnp.float32,
        mutable=True, reserve_docs=64)

    out0 = engine.search(syn.query_embs, strategy="all", staged=False)
    base_oracle = _oracle_ids(
        syn.world, base_emb, base_ids, syn.query_embs, syn.world.k)
    got0 = _winner_ids(syn.world, shard_set, out0)
    assert got0 == base_oracle

    compiles0 = engine._full_step._cache_size()
    for name in base_emb:
        slots = shard_set.add_docs(name, held_emb[name], held_ids[name])
        assert len(slots) == len(held_ids[name])
        assert shard_set.live_docs(name) == len(base_emb[name]) + len(slots)

    out1 = engine.search(syn.query_embs, strategy="all", staged=False)
    assert engine._full_step._cache_size() == compiles0  # no recompile
    full_emb = {n: np.concatenate([base_emb[n], held_emb[n]])
                for n in base_emb}
    full_ids = {n: base_ids[n] + held_ids[n] for n in base_emb}
    full_oracle = _oracle_ids(
        syn.world, full_emb, full_ids, syn.query_embs, syn.world.k)
    got1 = _winner_ids(syn.world, shard_set, out1)
    assert got1 == full_oracle
    assert got1 != base_oracle  # held-out docs actually changed winners


def test_delete_docs_removes_and_recycles_slots():
    syn, base_emb, held_emb, base_ids, held_ids = _world()
    shard_set, engine = _engine(
        syn, base_emb, base_ids, jnp.float32, mutable=True, reserve_docs=8)
    name = syn.world.sources[0].name

    # delete the 10 docs most likely to win for query 0
    out0 = engine.search(syn.query_embs, strategy="all", staged=False)
    victim_slots = sorted({
        int(l)
        for s, l in zip(out0.merged_shard[0], out0.merged_local[0])
        if int(s) == 0})[:10]
    victims = [base_ids[name][sl] for sl in victim_slots]
    victim_keys = {_key(v) for v in victims}
    free0 = shard_set.free_slots(name)
    shard_set.delete_docs(name, doc_ids=victims)
    assert shard_set.free_slots(name) == free0 + len(victims)
    assert shard_set.live_docs(name) == len(base_ids[name]) - len(victims)

    out1 = engine.search(syn.query_embs, strategy="all", staged=False)
    for got in _winner_ids(syn.world, shard_set, out1):
        assert not {(0, v) for v in victim_keys} & got

    # deleted slots are reused by the next add, and the oracle over the
    # post-churn corpus still matches exactly
    kept = [i for i in range(len(base_ids[name])) if i not in victim_slots]
    slots = shard_set.add_docs(name, held_emb[name][:10], held_ids[name][:10])
    assert set(slots) & set(victim_slots)
    emb = dict(base_emb)
    ids = dict(base_ids)
    emb[name] = np.concatenate(
        [base_emb[name][kept], held_emb[name][:10]])
    ids[name] = [base_ids[name][i] for i in kept] + held_ids[name][:10]
    out2 = engine.search(syn.query_embs, strategy="all", staged=False)
    assert _winner_ids(syn.world, shard_set, out2) == _oracle_ids(
        syn.world, emb, ids, syn.query_embs, syn.world.k)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8, "int4"])
def test_add_docs_lossy_dtypes_top1_selfmatch(dtype):
    """Lossy shards: an added doc must be the top-1 hit for its own
    embedding as the query (dot mode; self-similarity dominates)."""
    syn, base_emb, held_emb, base_ids, held_ids = _world()
    shard_set, engine = _engine(
        syn, base_emb, base_ids, dtype, mutable=True, reserve_docs=64)
    name = syn.world.sources[0].name
    src = syn.world.sources[0]
    # large-norm adds: |d_self|^2 then dominates any cross dot product,
    # making top-1 self-retrieval the expected exact answer even after
    # bf16/int8 rounding (dot scores are linear in q, so scaling the
    # QUERY alone could never force a self-match)
    corpus_max = max(np.linalg.norm(e, axis=1).max()
                     for e in base_emb.values())
    big = held_emb[name] / np.linalg.norm(
        held_emb[name], axis=1, keepdims=True) * (8.0 * corpus_max)
    shard_set.add_docs(name, big, held_ids[name])

    nq = 8
    qe = {enc: np.zeros((nq, d), np.float32)
          for enc, d in {s.encoder: s.embed_dim
                         for s in syn.world.sources}.items()}
    qe[src.encoder][:] = big[:nq]
    out = engine.search(qe, strategy="all", staged=False)
    table = shard_set.doc_ids[name]
    for qi in range(nq):
        assert int(out.merged_shard[qi, 0]) == 0
        assert table[int(out.merged_local[qi, 0])] == held_ids[name][qi]


def test_add_docs_l2_world_centered():
    """Wikipedia world (l2, mean-centered lossy shards): an added doc is
    an exact-distance-0 match for itself."""
    syn, base_emb, held_emb, base_ids, held_ids = _world("wikipedia")
    shard_set, engine = _engine(
        syn, base_emb, base_ids, jnp.bfloat16, mutable=True,
        reserve_docs=64)
    name = syn.world.sources[0].name
    src = syn.world.sources[0]
    assert shard_set.shards[0].center is not None  # centering active
    shard_set.add_docs(name, held_emb[name], held_ids[name])

    nq = 8
    qe = {enc: np.zeros((nq, d), np.float32)
          for enc, d in {s.encoder: s.embed_dim
                         for s in syn.world.sources}.items()}
    qe[src.encoder][:] = held_emb[name][:nq]
    out = engine.search(qe, strategy="all", staged=False)
    table = shard_set.doc_ids[name]
    for qi in range(nq):
        assert int(out.merged_shard[qi, 0]) == 0
        assert table[int(out.merged_local[qi, 0])] == held_ids[name][qi]
        # |d-d|^2 ~ 0 up to bf16 rounding, which scales with |d|^2
        tol = 5e-3 * float((held_emb[name][qi] ** 2).sum())
        assert abs(float(out.merged_score[qi, 0])) < tol


def test_served_live_updates_http():
    """POST /docs/add + /docs/delete over a live HTTP federation: the
    added doc wins its self-query, resolves its payload, then vanishes
    after the delete."""
    import asyncio

    import aiohttp

    from ragroute_tpu.engine.batcher import QueryBatcher
    from ragroute_tpu.engine.embedding import HashEmbeddings
    from ragroute_tpu.engine.server import FederationServer
    from ragroute_tpu.index.store import MemoryDocStore

    syn = make_synthetic_world(
        "medrag", docs_per_source=600, num_queries=4, seed=5)
    shard_set = ShardSet.build(
        syn.world, syn.embeddings, doc_ids=syn.doc_ids, dtype=jnp.float32,
        mutable=True, reserve_docs=16)
    params = init_router_params(
        jax.random.key(0), syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    engine = FederatedSearchEngine(shard_set, params, bank, impl="exact")
    provider = HashEmbeddings(syn.world)
    name = syn.world.sources[0].name
    src = syn.world.sources[0]

    async def run():
        server = FederationServer(
            engine, strategy="all", embedding_provider=provider,
            doc_store=MemoryDocStore.from_synthetic(syn),
            disable_llm=True, port=0, warmup=False,
            batcher=QueryBatcher(engine, strategy="all", window_ms=5.0,
                                 buckets=(4,)))
        await server.start()
        try:
            port = server.bound_port
            q_text = "find the freshly added doc"
            # the hash provider embeds deterministically per query text:
            # make the new doc's embedding a big multiple of the query's
            emb = provider.embed(q_text, "fresh")[src.encoder]
            doc_emb = (emb / max(float(np.linalg.norm(emb)), 1e-9)) * 1e3
            async with aiohttp.ClientSession() as s:
                add = {"source": name, "docs": [{
                    "id": "fresh-doc-1",
                    "embedding": doc_emb.tolist(),
                    "payload": {"id": "fresh-doc-1",
                                "title": "Fresh", "content": "hello"},
                }]}
                async with s.post(f"http://127.0.0.1:{port}/docs/add",
                                  json=add) as r:
                    assert r.status == 200, await r.text()
                    body = await r.json()
                assert body["added"] == 1
                assert body["live_docs"] == 601

                import urllib.parse
                url = (f"http://127.0.0.1:{port}/query?"
                       f"q={urllib.parse.quote(q_text)}"
                       f"&choices=%5B%22x%22%5D&qid=fresh")
                async with s.get(url) as r:
                    assert r.status == 200
                    res = await r.json()
                top = res["metadata"]["top_docs"][0]
                assert top["title"] == "Fresh"  # overlay payload resolved

                async with s.post(f"http://127.0.0.1:{port}/docs/delete",
                                  json={"source": name,
                                        "ids": ["fresh-doc-1"]}) as r:
                    assert r.status == 200, await r.text()
                    body = await r.json()
                assert body["deleted"] == 1 and body["live_docs"] == 600

                async with s.get(url) as r:
                    res = await r.json()
                titles = [d.get("title")
                          for d in res["metadata"]["top_docs"]]
                assert "Fresh" not in titles

                # immutable-server guard: error body names the fix
                async with s.post(f"http://127.0.0.1:{port}/docs/add",
                                  json={"source": "nope",
                                        "docs": []}) as r:
                    assert r.status == 400
        finally:
            await server.stop()

    asyncio.run(run())


def test_update_guards():
    syn, base_emb, _, base_ids, _ = _world()
    # immutable set refuses updates
    ss_imm = ShardSet.build(syn.world, base_emb, doc_ids=base_ids,
                            dtype=jnp.float32)
    with pytest.raises(ValueError, match="mutable"):
        ss_imm.add_docs(syn.world.sources[0].name,
                        np.zeros((1, syn.world.sources[0].embed_dim)))
    # capacity overflow fails loudly
    ss = ShardSet.build(syn.world, base_emb, doc_ids=base_ids,
                        dtype=jnp.float32, mutable=True, reserve_docs=0)
    name = syn.world.sources[0].name
    cap = ss.free_slots(name)
    with pytest.raises(ValueError, match="free slots"):
        ss.add_docs(name, np.zeros(
            (cap + 1, syn.world.sources[0].embed_dim), np.float32))
    # delete validation
    with pytest.raises(ValueError, match="exactly one"):
        ss.delete_docs(name)
    with pytest.raises(KeyError):
        ss.delete_docs(name, doc_ids=["no-such-doc"])
    ss.delete_docs(name, slots=[0])
    with pytest.raises(ValueError, match="invalid/free/duplicate"):
        ss.delete_docs(name, slots=[0])  # already free
    # mutable + IVF is rejected at build
    with pytest.raises(ValueError, match="IVF"):
        ShardSet.build(syn.world, base_emb, dtype=jnp.float32,
                       mutable=True, ivf_clusters=8)
    # mutable sets don't go on a mesh
    from ragroute_tpu.parallel import ShardedSearch, make_mesh

    params = init_router_params(
        jax.random.key(0), syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    ss2 = ShardSet.build(syn.world, base_emb, dtype=jnp.float32,
                         mutable=True)
    mesh = make_mesh(dp=2, idx=4, devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="mesh"):
        ShardedSearch(ss2, params, bank, mesh)


def test_id_table_materialization_skips_pre_table_deletes():
    """Deleting by slot BEFORE any id table exists, then adding with ids,
    must not resurrect local-index ids for the dead slots (a resurrected
    id would make delete-by-id target a free — or worse, recycled —
    slot)."""
    syn, base_emb, held_emb, _, _ = _world()
    name = syn.world.sources[0].name
    # no doc_ids at build: docs are identified by local index only
    ss = ShardSet.build(syn.world, base_emb, dtype=jnp.float32,
                        mutable=True, reserve_docs=0)
    ss.delete_docs(name, slots=[3, 5])
    # one add with an explicit id materializes the table; the free stack
    # pops slot 5 for it, slot 3 stays dead
    got = ss.add_docs(name, held_emb[name][:1], doc_ids=["fresh"])
    assert got == [5]
    table = ss.doc_ids[name]
    assert table[5] == "fresh"
    assert table[3] is None          # dead slot must NOT carry id 3
    assert table[0] == 0             # live build rows keep local-index ids
    with pytest.raises(KeyError):
        ss.delete_docs(name, doc_ids=[3])


def test_add_docs_honors_normalize_cos_false():
    """add_docs must apply the build's normalize_cos setting — a
    normalize_cos=False build stores raw rows, so added rows must stay
    raw too (else they'd score on a different scale than the corpus)."""
    import dataclasses

    from ragroute_tpu.config import SourceSpec

    syn, base_emb, held_emb, _, _ = _world()
    # rebuild the world with cos scoring on source 0
    srcs = tuple(
        dataclasses.replace(s, score_mode="cos") if i == 0 else s
        for i, s in enumerate(syn.world.sources))
    world = dataclasses.replace(syn.world, sources=srcs)
    name = srcs[0].name
    v = held_emb[name][:1] * 3.0     # deliberately unnormalized row

    for norm in (False, True):
        ss = ShardSet.build(world, base_emb, dtype=jnp.float32,
                            mutable=True, reserve_docs=8,
                            normalize_cos=norm)
        (slot,) = ss.add_docs(name, v)
        row = np.asarray(ss.shards[0].docs[slot])
        want = (v[0] / np.linalg.norm(v[0])) if norm else v[0]
        np.testing.assert_allclose(row, want, rtol=1e-6)


def test_late_id_table_keeps_earlier_idless_docs():
    """Adding WITH doc_ids after earlier id-LESS adds must not null the
    earlier live docs' identities: the materialized table keeps their
    local-index ids (reserve slots >= n_docs included)."""
    syn, base_emb, held_emb, _, _ = _world()
    name = syn.world.sources[0].name
    ss = ShardSet.build(syn.world, base_emb, dtype=jnp.float32,
                        mutable=True, reserve_docs=8)
    n0 = ss.shards[[s.name for s in syn.world.sources].index(name)].n_docs

    idless = ss.add_docs(name, held_emb[name][:2])
    assert idless == [n0, n0 + 1]  # reserve slots beyond the base corpus
    # delete one base doc pre-table: its slot must stay None in the table
    ss.delete_docs(name, slots=[3])

    withid = ss.add_docs(name, held_emb[name][2:3], doc_ids=["late-id"])
    table = ss.doc_ids[name]
    assert table[idless[0]] == idless[0]
    assert table[idless[1]] == idless[1]
    assert withid == [3]  # the freed slot is recycled for the new doc
    assert table[3] == "late-id"
    # and earlier base docs keep local-index identity
    assert table[0] == 0 and table[n0 - 1] == n0 - 1
