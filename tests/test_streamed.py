"""Host-RAM capacity tiers: parity gates against the single-chip engine.

``tier="stream"`` scans the SAME quantized bytes as the resident engine
(shared ``encode_rows``), so its output must match the flat engine
EXACTLY — winners, ordering, scores. ``tier="hostrefine"`` takes a
coarse top-k' cut before the exact rescore (impl="lowrank" semantics),
so its gate is high recall + exact scores on every returned winner.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ragroute_tpu.engine import FederatedSearchEngine
from ragroute_tpu.engine.streamed import StreamedSearchEngine
from ragroute_tpu.index import ShardSet, make_synthetic_world
from ragroute_tpu.index.streamed import RowSource, StreamedShardSet
from ragroute_tpu.router import RouterBank, init_router_params

import jax


def _world(world_name, dtype, tier, *, seed=5, docs=2560, queries=24,
           budget_rows=0, slab_rows_bytes=None):
    syn = make_synthetic_world(world_name, docs_per_source=docs,
                               num_queries=queries, seed=seed,
                               with_payloads=False)
    ref_set = ShardSet.build(syn.world, syn.embeddings, dtype=dtype)
    params = init_router_params(jax.random.key(0),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    ref = FederatedSearchEngine(ref_set, params, bank)

    # budget sized to keep ~budget_rows rows resident per source -> the
    # overflow spans multiple slabs (slab_bytes small to force >= 3)
    d0 = syn.world.sources[0].embed_dim
    row_b = (d0 // 2 if dtype == "int4" else
             d0 * jnp.dtype(dtype).itemsize) + 8
    n_src = syn.world.num_sources
    sset = StreamedShardSet.build(
        syn.world, syn.embeddings, dtype=dtype, tier=tier,
        hbm_budget_bytes=budget_rows * row_b * n_src,
        slab_bytes=slab_rows_bytes or (512 * row_b))
    eng = StreamedSearchEngine(sset, params, bank)
    return syn, ref, eng


def _outputs_equal(a, b, *, ids_exact=True):
    np.testing.assert_array_equal(a.mask, b.mask)
    ok = a.merged_shard >= 0
    if ids_exact:
        np.testing.assert_array_equal(a.merged_shard, b.merged_shard)
        np.testing.assert_array_equal(  # invalid entries carry junk ids
            np.where(ok, a.merged_local, -1),
            np.where(ok, b.merged_local, -1))
    np.testing.assert_array_equal(a.merged_valid, b.merged_valid)
    np.testing.assert_allclose(
        np.where(ok, a.merged_score, 0.0),
        np.where(ok, b.merged_score, 0.0), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("world_name,dtype", [
    ("medrag", jnp.int8),          # dot, mean-centered int8
    ("medrag", "int4"),            # packed nibbles through the slab scan
    ("wikipedia", jnp.int8),       # l2 (centered queries, exact bias)
    ("feb4rag", jnp.bfloat16),     # heterogeneous dims, cos+dot, qrels k
])
def test_stream_tier_matches_flat_engine(world_name, dtype):
    syn, ref, eng = _world(world_name, dtype, "stream")
    assert any(s.n_slabs >= 2 for s in eng.shard_set.sources), \
        "test must exercise multiple slabs"
    embs = {e: np.asarray(v) for e, v in syn.query_embs.items()}
    for strategy in ("ragroute", "all"):
        a = ref.search(embs, strategy=strategy, staged=False)
        b = eng.search(embs, strategy=strategy)
        _outputs_equal(a, b)


def test_stream_tier_per_shard_candidates_match(recwarn):
    """fetch_candidates path: per-source [B, N, k] lists match the flat
    engine (feb4rag's qrels rerank consumes them)."""
    syn, ref, eng = _world("feb4rag", jnp.bfloat16, "stream")
    embs = {e: np.asarray(v) for e, v in syn.query_embs.items()}
    a = ref.search(embs, strategy="all", staged=False,
                   fetch_candidates=True)
    b = eng.search(embs, strategy="all", fetch_candidates=True)
    # routing=all: every source is live, so per-source lists are defined
    np.testing.assert_array_equal(a.shard_ids, b.shard_ids)
    np.testing.assert_allclose(a.shard_scores, b.shard_scores,
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("world_name,dtype", [
    ("medrag", jnp.int8),
    ("wikipedia", jnp.int8),
])
def test_hostrefine_recall_and_exact_scores(world_name, dtype):
    """The coarse cut loses little on the rank-structured corpus; every
    RETURNED winner's score must equal the flat engine's exact stored-
    form score for that document (the refine is exact, not approximate).
    """
    syn, ref, eng = _world(world_name, dtype, "hostrefine",
                           budget_rows=0)
    assert any(s.coarse_docs is not None for s in eng.shard_set.sources)
    embs = {e: np.asarray(v) for e, v in syn.query_embs.items()}
    a = ref.search(embs, strategy="all", staged=False,
                   fetch_candidates=True)
    b = eng.search(embs, strategy="all", fetch_candidates=False)

    hits = tot = 0
    exact = {}
    for q in range(a.merged_shard.shape[0]):
        ra = {(int(s), int(l)) for s, l in
              zip(a.merged_shard[q], a.merged_local[q]) if s >= 0}
        rb = {(int(s), int(l)) for s, l in
              zip(b.merged_shard[q], b.merged_local[q]) if s >= 0}
        hits += len(ra & rb)
        tot += len(ra)
    recall = hits / tot
    assert recall >= 0.95, f"hostrefine recall {recall:.4f}"

    # exact-score gate: look each returned (shard, local) up in the flat
    # engine's per-shard candidate lists where present
    for q in range(b.merged_shard.shape[0]):
        for j in range(b.merged_shard.shape[1]):
            si, li = int(b.merged_shard[q, j]), int(b.merged_local[q, j])
            if si < 0:
                continue
            ref_pos = np.nonzero(a.shard_ids[q, si] == li)[0]
            if len(ref_pos):
                np.testing.assert_allclose(
                    b.merged_score[q, j],
                    a.shard_scores[q, si, ref_pos[0]],
                    rtol=2e-4, atol=2e-4)


def test_hostrefine_per_source_mode_feb4rag():
    """feb4rag (qrels world) uses per-source candidates + per-source
    refine; per-source top-k recall vs the flat engine must be high."""
    syn, ref, eng = _world("feb4rag", jnp.bfloat16, "hostrefine",
                           budget_rows=0)
    embs = {e: np.asarray(v) for e, v in syn.query_embs.items()}
    a = ref.search(embs, strategy="all", staged=False,
                   fetch_candidates=True)
    b = eng.search(embs, strategy="all", fetch_candidates=True)
    hits = tot = 0
    for q in range(a.shard_ids.shape[0]):
        for si in range(a.shard_ids.shape[1]):
            ra = set(a.shard_ids[q, si].tolist())
            rb = set(b.shard_ids[q, si].tolist())
            hits += len(ra & rb)
            tot += len(ra)
    assert hits / tot >= 0.95, f"per-source recall {hits / tot:.4f}"


def test_streamed_mixed_residency():
    """Sources small enough for the budget stay fully resident (exact);
    larger ones stream — both in one world, outputs still match."""
    syn = make_synthetic_world("medrag", docs_per_source_map={
        "pubmed": 4096, "statpearls": 512, "textbooks": 512,
        "wikipedia": 1024}, docs_per_source=512, num_queries=16, seed=7,
        with_payloads=False)
    ref_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.int8)
    params = init_router_params(jax.random.key(0),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    ref = FederatedSearchEngine(ref_set, params, bank)
    row_b = 768 + 8
    sset = StreamedShardSet.build(
        syn.world, syn.embeddings, dtype=jnp.int8, tier="stream",
        hbm_budget_bytes=(512 * 3 + 1024) * row_b,
        slab_bytes=512 * row_b)
    assert any(s.host is None for s in sset.sources), "want resident srcs"
    assert any(s.host is not None for s in sset.sources), "want streamed"
    eng = StreamedSearchEngine(sset, params, bank)
    embs = {e: np.asarray(v) for e, v in syn.query_embs.items()}
    a = ref.search(embs, strategy="all", staged=False)
    b = eng.search(embs, strategy="all")
    _outputs_equal(a, b)


def test_hostrefine_mixed_residency():
    """hostrefine with BOTH fully-resident (exact) and coarse sources in
    one world: resident sources join the global mode-A merge through the
    need-filtered pk/pi fetch (`engine.streamed._search_hostrefine`) and
    their winners carry exact scores, coarse sources refine as usual.
    Guards the resident-join branch of `_merge_global` — the large
    capacity worlds set n_res=0 everywhere, so without this world that
    code path never runs in CI."""
    syn = make_synthetic_world("medrag", docs_per_source_map={
        "pubmed": 4096, "statpearls": 512, "textbooks": 512,
        "wikipedia": 1024}, docs_per_source=512, num_queries=16, seed=7,
        with_payloads=False)
    ref_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.int8)
    params = init_router_params(jax.random.key(0),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    ref = FederatedSearchEngine(ref_set, params, bank)
    row_b = 768 + 8
    sset = StreamedShardSet.build(
        syn.world, syn.embeddings, dtype=jnp.int8, tier="hostrefine",
        hbm_budget_bytes=(512 * 3 + 1024) * row_b)
    res = [s.coarse_docs is None for s in sset.sources]
    assert any(res) and not all(res), \
        "world must mix fully-resident and coarse sources"
    eng = StreamedSearchEngine(sset, params, bank)
    assert any(eng._has_res) and any(eng._has_coarse)
    embs = {e: np.asarray(v) for e, v in syn.query_embs.items()}
    for strategy in ("all", "ragroute"):
        a = ref.search(embs, strategy=strategy, staged=False,
                       fetch_candidates=True)
        b = eng.search(embs, strategy=strategy, fetch_candidates=False)
        np.testing.assert_array_equal(a.mask, b.mask)
        hits = tot = 0
        for q in range(a.merged_shard.shape[0]):
            ra = {(int(s), int(l)) for s, l in
                  zip(a.merged_shard[q], a.merged_local[q]) if s >= 0}
            rb = {(int(s), int(l)) for s, l in
                  zip(b.merged_shard[q], b.merged_local[q]) if s >= 0}
            hits += len(ra & rb)
            tot += len(ra)
        assert hits / max(tot, 1) >= 0.95, \
            f"{strategy}: mixed hostrefine recall {hits / tot:.4f}"
        # exact-score gate on every returned winner (resident AND coarse)
        for q in range(b.merged_shard.shape[0]):
            for j in range(b.merged_shard.shape[1]):
                si = int(b.merged_shard[q, j])
                li = int(b.merged_local[q, j])
                if si < 0:
                    continue
                ref_pos = np.nonzero(a.shard_ids[q, si] == li)[0]
                if len(ref_pos):
                    np.testing.assert_allclose(
                        b.merged_score[q, j],
                        a.shard_scores[q, si, ref_pos[0]],
                        rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("impl,mesh", [
    ("stream", None),
    ("hostrefine", None),
    ("hostrefine", "2x4"),   # capacity tier x mesh (streamed_mesh.py)
])
def test_streamed_served_e2e(tmp_path_factory, impl, mesh):
    """The whole serving stack (server + batcher + doc store) over the
    capacity tiers: one real HTTP query end-to-end, reference response
    schema intact."""
    import argparse
    import asyncio
    import json as _json
    import os
    import urllib.parse
    import urllib.request

    from ragroute_tpu.index.synthetic import save_world
    from ragroute_tpu.system import ServingSystem

    root = str(tmp_path_factory.mktemp("sdata"))
    syn = make_synthetic_world("medrag", docs_per_source=1200,
                               num_queries=6, seed=2)
    save_world(syn, root)
    row_b = 768 + 8
    args = argparse.Namespace(
        dataset="medrag", routing="all", disable_llm=True, simulate=False,
        model="llama3.1-8B-instruct", data_root=root, port=0,
        dtype="int8", impl=impl, buckets=(8,), mesh=mesh,
        hbm_budget_gb=(4 * 512 * row_b) / 1e9)  # force host overflow

    async def run():
        system = ServingSystem(args)
        await system.start()
        try:
            port = system.server.bound_port
            sset = system.server.engine.shard_set
            assert any(s.host is not None for s in sset.sources)
            if mesh:
                from ragroute_tpu.parallel import MeshStreamedEngine
                assert isinstance(system.server.engine,
                                  MeshStreamedEngine)
            q = syn.questions[0]
            url = (f"http://127.0.0.1:{port}/query?"
                   f"q={urllib.parse.quote(q['question'])}"
                   f"&choices={urllib.parse.quote(_json.dumps(q['options']))}"
                   f"&qid={q['qid']}")
            loop = asyncio.get_running_loop()
            body = await loop.run_in_executor(
                None,
                lambda: _json.load(urllib.request.urlopen(url, timeout=120)))
            return body
        finally:
            await system.stop()

    body = asyncio.run(run())
    md = body["metadata"]
    assert sorted(md["data_sources"]) == sorted(
        s.name for s in syn.world.sources)
    assert len(md["top_docs"]) == syn.world.k
    assert all(k in md for k in (
        "embedding_time", "selection_time", "doc_select_time",
        "generate_time", "e2e_time", "docs_tokens",
        "data_sources_stats"))


def test_hostrefine_clustered_coarse_recall():
    """Probed coarse scan (cluster_coarse=True): full probe must match
    the flat-coarse hostrefine output nearly exactly (same codes
    permuted into slots), and the default partial probe must clear the
    tier's recall gate vs the exact engine on a TOPICAL corpus
    (subclusters > 1 — cluster-probing's serving regime; the
    single-blob world is its documented worst case, BENCHMARKS.md)."""
    syn = make_synthetic_world("medrag", docs_per_source=2560,
                               num_queries=32, seed=5,
                               with_payloads=False, subclusters=16)
    ref_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.int8)
    params = init_router_params(jax.random.key(0),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    ref = FederatedSearchEngine(ref_set, params, bank)
    sset_cl = StreamedShardSet.build(
        syn.world, syn.embeddings, dtype=jnp.int8, tier="hostrefine",
        hbm_budget_bytes=0, cluster_coarse=True)
    assert all(s.coarse_cl is not None for s in sset_cl.sources
               if s.host is not None)
    assert all(s.coarse_docs is None for s in sset_cl.sources
               if s.coarse_cl is not None), "flat slab should be dropped"
    embs = {e: np.asarray(v) for e, v in syn.query_embs.items()}

    def merged_sets(out):
        return [{(int(s), int(l)) for s, l in
                 zip(out.merged_shard[q], out.merged_local[q]) if s >= 0}
                for q in range(out.merged_shard.shape[0])]

    a = ref.search(embs, strategy="all", staged=False)
    ref_sets = merged_sets(a)

    # full probe == flat coarse candidates -> same refined winners
    c_max = max(s.coarse_cl.n_clusters for s in sset_cl.sources
                if s.coarse_cl is not None)
    # kappa >= k': the full-probe equivalence needs the per-pair cap to
    # not truncate a cluster that holds a query's whole candidate list
    # (toy geometry; see test_grouped_topk.py's same pin)
    eng_full = StreamedSearchEngine(sset_cl, params, bank,
                                    nprobe=c_max, kappa=512)
    b = eng_full.search(embs, strategy="all", fetch_candidates=False)
    hits = sum(len(r & g) for r, g in zip(ref_sets, merged_sets(b)))
    tot = sum(len(r) for r in ref_sets)
    assert hits / tot >= 0.95, f"full-probe recall {hits / tot:.4f}"

    # partial probe at C/4 — this toy world has ~4 clusters per topic,
    # so the production divisor (C/8, tuned at C=4096 with ~64 clusters
    # per topic) under-probes here; the gate pins the geometry-matched
    # depth instead
    eng_p = StreamedSearchEngine(sset_cl, params, bank, kappa=64,
                                 nprobe=max(s.coarse_cl.n_clusters
                                            for s in sset_cl.sources
                                            if s.coarse_cl) // 4)
    c = eng_p.search(embs, strategy="all", fetch_candidates=False)
    hits = sum(len(r & g) for r, g in zip(ref_sets, merged_sets(c)))
    assert hits / tot >= 0.9, f"partial-probe recall {hits / tot:.4f}"
    # per-source candidate mode runs the same probed scan
    d = eng_p.search(embs, strategy="all", fetch_candidates=True)
    hits = sum(len(r & g) for r, g in zip(ref_sets, merged_sets(d)))
    assert hits / tot >= 0.9


def test_hostrefine_pipelined_dispatch_complete():
    """dispatch/complete split (the pipelined serving loop): two
    in-flight batches complete with outputs identical to sequential
    search()."""
    syn, ref, eng = _world("medrag", jnp.int8, "hostrefine",
                           budget_rows=0, queries=16)
    embs = {e: np.asarray(v) for e, v in syn.query_embs.items()}
    half = {e: v[:8] for e, v in embs.items()}
    other = {e: v[8:] for e, v in embs.items()}
    seq_a = eng.search(half, strategy="all", fetch_candidates=False)
    seq_b = eng.search(other, strategy="all", fetch_candidates=False)
    h1 = eng.dispatch_hostrefine(half, strategy="all",
                                 fetch_candidates=False)
    h2 = eng.dispatch_hostrefine(other, strategy="all",
                                 fetch_candidates=False)
    out_a = eng.complete_hostrefine(h1)
    out_b = eng.complete_hostrefine(h2)
    for seq, out in ((seq_a, out_a), (seq_b, out_b)):
        np.testing.assert_array_equal(seq.merged_shard, out.merged_shard)
        np.testing.assert_array_equal(seq.merged_local, out.merged_local)
        ok = seq.merged_shard >= 0
        np.testing.assert_allclose(
            np.where(ok, seq.merged_score, 0.0),
            np.where(ok, out.merged_score, 0.0), rtol=1e-5, atol=1e-5)


def test_hostrefine_refine_depth_exceeds_slab():
    """k' > a source's coarse slab height must clamp per source (pad
    with never-wins sentinels) instead of failing lax.top_k at trace
    time — a just-over-512-doc source with a large --refine-mult.
    Regression for the round-4 advisor finding."""
    syn = make_synthetic_world("medrag", docs_per_source_map={
        "pubmed": 2048, "statpearls": 512, "textbooks": 512,
        "wikipedia": 512}, docs_per_source=512, num_queries=12, seed=9,
        with_payloads=False)
    ref_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.int8)
    params = init_router_params(jax.random.key(0),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    ref = FederatedSearchEngine(ref_set, params, bank)
    sset = StreamedShardSet.build(
        syn.world, syn.embeddings, dtype=jnp.int8, tier="hostrefine",
        hbm_budget_bytes=0)
    # every coarse slab of the 512-doc sources is 512 rows < k'=600
    eng = StreamedSearchEngine(sset, params, bank, k_refine=600)
    embs = {e: np.asarray(v) for e, v in syn.query_embs.items()}
    for fetch in (False, True):   # global merge AND per-source refine
        b = eng.search(embs, strategy="all", fetch_candidates=fetch)
        a = ref.search(embs, strategy="all", staged=False)
        # k' >= every slab height => the coarse cut keeps everything and
        # the exact rescore must reproduce the flat engine bit-for-bit
        _outputs_equal(a, b)


def test_hostrefine_mesh_composition():
    """Capacity tier x mesh (parallel/streamed_mesh.py): the hostrefine
    engine with its coarse slabs row-sharded over an idx axis must
    reproduce the single-chip tier's winners (the mesh oversamples the
    candidate cut, so recall vs the exact engine can only improve) and
    carry exact scores on every returned winner."""
    from ragroute_tpu.parallel import MeshStreamedEngine, make_mesh

    syn, ref, eng1 = _world("medrag", jnp.int8, "hostrefine",
                            budget_rows=0)
    sset = eng1.shard_set
    mesh = make_mesh(dp=2, idx=4, devices=jax.devices()[:8])
    # a fresh build for the mesh engine: MeshStreamedEngine consumes
    # (drops) the single-device arrays when sharding them
    sset_m = StreamedShardSet.build(
        syn.world, syn.embeddings, dtype=jnp.int8, tier="hostrefine",
        hbm_budget_bytes=0, cluster_coarse=False)
    eng_m = MeshStreamedEngine(sset_m, eng1.params, eng1.bank, mesh)

    embs = {e: np.asarray(v) for e, v in syn.query_embs.items()}

    def merged_sets(out):
        return [{(int(s), int(l)) for s, l in
                 zip(out.merged_shard[q], out.merged_local[q]) if s >= 0}
                for q in range(out.merged_shard.shape[0])]

    a = ref.search(embs, strategy="all", staged=False,
                   fetch_candidates=True)
    ref_sets = merged_sets(a)
    for strategy in ("all", "ragroute"):
        if strategy == "ragroute":
            a = ref.search(embs, strategy=strategy, staged=False,
                           fetch_candidates=True)
            ref_sets = merged_sets(a)
        for fetch in (False, True):
            b = eng_m.search(embs, strategy=strategy,
                             fetch_candidates=fetch)
            np.testing.assert_array_equal(a.mask, b.mask)
            hits = sum(len(r & g)
                       for r, g in zip(ref_sets, merged_sets(b)))
            tot = sum(len(r) for r in ref_sets)
            assert hits / max(tot, 1) >= 0.95, (
                f"{strategy}/fetch={fetch}: mesh hostrefine recall "
                f"{hits / tot:.4f}")
            # exact-score gate on every returned winner
            for q in range(b.merged_shard.shape[0]):
                for j in range(b.merged_shard.shape[1]):
                    si = int(b.merged_shard[q, j])
                    li = int(b.merged_local[q, j])
                    if si < 0:
                        continue
                    pos = np.nonzero(a.shard_ids[q, si] == li)[0]
                    if len(pos):
                        np.testing.assert_allclose(
                            b.merged_score[q, j],
                            a.shard_scores[q, si, pos[0]],
                            rtol=2e-4, atol=2e-4)


def test_row_source_generator_blocks():
    """Generator-backed RowSource (the capacity bench path) builds the
    same tier as the in-RAM array."""
    syn = make_synthetic_world("medrag", docs_per_source=1024,
                               num_queries=8, seed=3,
                               with_payloads=False)
    name = syn.world.sources[0].name
    arr = syn.embeddings[name]
    gen = RowSource(n_docs=arr.shape[0], dim=arr.shape[1],
                    get=lambda a, b: np.asarray(arr[a:b], np.float32))
    row_sources = dict(syn.embeddings)
    row_sources[name] = gen
    a = StreamedShardSet.build(syn.world, syn.embeddings, dtype=jnp.int8,
                               tier="stream", hbm_budget_bytes=10 << 20)
    b = StreamedShardSet.build(syn.world, row_sources, dtype=jnp.int8,
                               tier="stream", hbm_budget_bytes=10 << 20)
    sa, sb = a.sources[0], b.sources[0]
    np.testing.assert_array_equal(np.asarray(sa.res_docs),
                                  np.asarray(sb.res_docs))
    if sa.host is not None:
        np.testing.assert_array_equal(sa.host.codes, sb.host.codes)
