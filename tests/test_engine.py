"""End-to-end engine tests on synthetic worlds (CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragroute_tpu.config import get_world
from ragroute_tpu.engine import FederatedSearchEngine
from ragroute_tpu.index import ShardSet, make_synthetic_world
from ragroute_tpu.router import RouterBank, init_router_params


def build_engine(world_name, docs_per_source=1536, num_queries=8, seed=0,
                 dtype=jnp.float32):
    syn = make_synthetic_world(
        world_name, docs_per_source=docs_per_source,
        num_queries=num_queries, seed=seed, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype=dtype)
    params = init_router_params(jax.random.key(3), syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    eng = FederatedSearchEngine(shard_set, params, bank, impl="chunked")
    return syn, eng


def brute_force_global(syn, k, selected=None):
    """Numpy replication of per-shard search + reference score merge."""
    world = syn.world
    nq = next(iter(syn.query_embs.values())).shape[0]
    winners = []
    for qi in range(nq):
        cands = []
        for si, src in enumerate(world.sources):
            if selected is not None and not selected[qi, si]:
                continue
            q = syn.query_embs[src.encoder][qi]
            docs = syn.embeddings[src.name]
            if src.score_mode == "cos":
                dn = docs / np.linalg.norm(docs, axis=1, keepdims=True)
                qn = q / max(np.linalg.norm(q), 1e-12)
                s = dn @ qn
                order = np.argsort(-s, kind="stable")[:k]
                gain = s[order]
            elif src.score_mode == "l2":
                d2 = ((docs - q) ** 2).sum(1)
                order = np.argsort(d2, kind="stable")[:k]
                gain = -d2[order]
            else:
                s = docs @ q
                order = np.argsort(-s, kind="stable")[:k]
                gain = s[order]
            for rank, (g, li) in enumerate(zip(gain, order)):
                cands.append((g, si, int(li)))
        cands.sort(key=lambda t: -t[0])
        winners.append(cands[:k])
    return winners


@pytest.mark.parametrize("world_name", ["medrag", "wikipedia"])
def test_strategy_all_matches_bruteforce(world_name):
    syn, eng = build_engine(world_name)
    out = eng.search(syn.query_embs, strategy="all")
    k = syn.world.k
    want = brute_force_global(syn, k)
    nq = out.mask.shape[0]
    assert out.mask.all()
    for qi in range(nq):
        got = set(zip(out.merged_shard[qi].tolist(),
                      out.merged_local[qi].tolist()))
        exp = set((si, li) for _, si, li in want[qi])
        # set-based comparison (near-ties may swap at the k boundary)
        overlap = len(got & exp) / k
        assert overlap >= 0.95, f"q{qi}: overlap {overlap}"
        # score ordering semantics: l2 ascending, dot descending
        s = out.merged_score[qi]
        if syn.world.sources[0].score_mode == "l2":
            assert (np.diff(s) >= -1e-4).all()
        else:
            assert (np.diff(s) <= 1e-4).all()


def test_strategy_none_returns_nothing():
    syn, eng = build_engine("medrag", docs_per_source=600, num_queries=4)
    out = eng.search(syn.query_embs, strategy="none")
    assert not out.mask.any()
    assert (out.merged_valid == 0).all()
    assert (out.merged_shard == -1).all()


def test_strategy_random_respects_mask():
    syn, eng = build_engine("medrag", docs_per_source=600, num_queries=16)
    out = eng.search(syn.query_embs, strategy="random")
    world = syn.world
    np.testing.assert_array_equal(
        out.mask.sum(axis=1), np.full(16, world.random_subset))
    for qi in range(16):
        used = set(out.merged_shard[qi][out.merged_shard[qi] >= 0].tolist())
        allowed = set(np.where(out.mask[qi])[0].tolist())
        assert used <= allowed


def test_strategy_ragroute_gates_merge():
    syn, eng = build_engine("medrag", docs_per_source=600, num_queries=16)
    out = eng.search(syn.query_embs, strategy="ragroute")
    np.testing.assert_array_equal(
        out.mask, out.probs > syn.world.router_threshold)
    for qi in range(16):
        used = set(out.merged_shard[qi][out.merged_shard[qi] >= 0].tolist())
        allowed = set(np.where(out.mask[qi])[0].tolist())
        assert used <= allowed
        # number of merged results == min(k, k * selected)
        n_sel = out.mask[qi].sum()
        assert out.merged_valid[qi] == min(syn.world.k,
                                           syn.world.k * n_sel)


def test_merged_matches_masked_bruteforce():
    syn, eng = build_engine("medrag", docs_per_source=800, num_queries=8)
    out = eng.search(syn.query_embs, strategy="random")
    want = brute_force_global(syn, syn.world.k, selected=out.mask)
    for qi in range(8):
        got = [
            (si, li) for si, li in zip(out.merged_shard[qi],
                                       out.merged_local[qi]) if si >= 0
        ]
        exp = [(si, li) for _, si, li in want[qi]]
        overlap = len(set(got) & set(exp)) / max(len(exp), 1)
        assert overlap >= 0.95


def test_feb4rag_heterogeneous_dims():
    """13 shards with 768/1024/4096-d encoders in one step."""
    syn, eng = build_engine("feb4rag", docs_per_source=520, num_queries=4)
    out = eng.search(syn.query_embs, strategy="all")
    assert out.shard_scores.shape == (4, 13, 10)
    assert out.merged_valid.min() == 10
    # merged scores sorted descending (dot/cos world); note feb4rag's
    # score-merge is informational only — the real rerank is qrels-oracle
    # (reference returns empty scores, data_source.py:163)
    assert (np.diff(out.merged_score, axis=1) <= 1e-4).all()


def test_resolve_doc_ids():
    syn = make_synthetic_world("medrag", docs_per_source=600, num_queries=2)
    shard_set = ShardSet.build(
        syn.world, syn.embeddings, doc_ids=syn.doc_ids, dtype=jnp.float32)
    params = init_router_params(jax.random.key(3), syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    eng = FederatedSearchEngine(shard_set, params, bank, impl="exact")
    out = eng.search(syn.query_embs, strategy="all")
    resolved = eng.resolve_doc_ids(out, 0)
    assert len(resolved) == syn.world.k
    src_name, payload = resolved[0]
    assert payload == {"source": f"{src_name}_chunk0",
                       "index": int(out.merged_local[0, 0])}


def test_compaction_matches_uncompacted():
    """Bucketed batch compaction must not change any routed query's results."""
    from ragroute_tpu.index import ShardSet, make_synthetic_world
    from ragroute_tpu.router import RouterBank, init_router_params

    syn = make_synthetic_world("medrag", docs_per_source=700,
                               num_queries=32, seed=11, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32)
    params = init_router_params(jax.random.key(2),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)

    eng_on = FederatedSearchEngine(shard_set, params, bank, impl="exact",
                                   compaction=True, seed=7)
    eng_off = FederatedSearchEngine(shard_set, params, bank, impl="exact",
                                    compaction=False, seed=7)
    a = eng_on.search(syn.query_embs, strategy="ragroute")
    b = eng_off.search(syn.query_embs, strategy="ragroute")
    np.testing.assert_array_equal(a.mask, b.mask)
    # some shard must have actually taken the compact path
    assert (a.mask.sum(axis=0) <= 16).any(), a.mask.sum(axis=0)
    np.testing.assert_array_equal(a.merged_shard, b.merged_shard)
    np.testing.assert_array_equal(a.merged_local, b.merged_local)
    np.testing.assert_allclose(a.merged_score, b.merged_score, rtol=1e-6)


def test_quarter_tier_compaction_wikipedia():
    """Wikipedia random routing (2 of 10) lands in the B/4 tier and must
    match the uncompacted engine exactly."""
    from ragroute_tpu.index import ShardSet, make_synthetic_world
    from ragroute_tpu.router import RouterBank, init_router_params

    syn = make_synthetic_world("wikipedia", docs_per_source=600,
                               num_queries=64, seed=13, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32)
    params = init_router_params(jax.random.key(2),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)

    eng_on = FederatedSearchEngine(shard_set, params, bank, impl="exact",
                                   compaction=True, seed=3)
    eng_off = FederatedSearchEngine(shard_set, params, bank, impl="exact",
                                    compaction=False, seed=3)
    a = eng_on.search(syn.query_embs, strategy="random")
    b = eng_off.search(syn.query_embs, strategy="random")
    np.testing.assert_array_equal(a.mask, b.mask)
    # 2-of-10 routing at B=64: per-shard counts ~12-14 <= 16 (quarter tier)
    assert (a.mask.sum(axis=0) <= 16).any(), a.mask.sum(axis=0)
    np.testing.assert_array_equal(a.merged_shard, b.merged_shard)
    np.testing.assert_array_equal(a.merged_local, b.merged_local)


def test_fused_step_matches_staged():
    """staged=False (one fused dispatch) returns the same results as the
    two-call staged mode; only the timing attribution differs."""
    syn, eng = build_engine("medrag", docs_per_source=600, num_queries=8,
                            seed=21)
    a = eng.search(syn.query_embs, strategy="all", staged=True)
    b = eng.search(syn.query_embs, strategy="all", staged=False)
    np.testing.assert_array_equal(a.merged_shard, b.merged_shard)
    np.testing.assert_array_equal(a.merged_local, b.merged_local)
    assert b.selection_time == 0.0  # fused: stages not separable
    assert b.doc_select_time > 0.0


def test_search_missing_encoder_errors():
    syn, eng = build_engine("medrag", docs_per_source=600, num_queries=2)
    with pytest.raises(KeyError, match="missing query embeddings"):
        eng.search({}, strategy="all")


def test_engine_int8_index():
    """Full engine over an int8-quantized index: near-f32 winners."""
    syn = make_synthetic_world("medrag", docs_per_source=1024,
                               num_queries=8, seed=23, with_payloads=False)
    params = init_router_params(jax.random.key(1),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    ss_f32 = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32)
    ss_int8 = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.int8)
    assert ss_int8.index_bytes < ss_f32.index_bytes / 2
    a = FederatedSearchEngine(ss_f32, params, bank, impl="exact").search(
        syn.query_embs, strategy="all")
    b = FederatedSearchEngine(ss_int8, params, bank, impl="exact").search(
        syn.query_embs, strategy="all")
    k = syn.world.k
    recalls = []
    for qi in range(8):
        got = set(zip(b.merged_shard[qi].tolist(),
                      b.merged_local[qi].tolist()))
        want = set(zip(a.merged_shard[qi].tolist(),
                       a.merged_local[qi].tolist()))
        recalls.append(len(got & want) / k)
    assert np.mean(recalls) >= 0.95, recalls


def test_search_submit_matches_blocking_search():
    """Pipelined submit/wait == blocking search, field for field.

    The pipelined serving loop dispatches batch N+1 before fetching
    batch N (engine.search_submit / PendingSearch.wait); the deferred
    fetch must return exactly what the blocking path returns, including
    with two searches in flight at once."""
    syn, eng = build_engine("medrag")

    for strategy in ("ragroute", "all"):
        want = eng.search(syn.query_embs, strategy=strategy)
        got = eng.search_submit(syn.query_embs, strategy=strategy).wait()
        np.testing.assert_array_equal(got.mask, want.mask)
        np.testing.assert_array_equal(got.merged_shard, want.merged_shard)
        np.testing.assert_array_equal(got.merged_local, want.merged_local)
        np.testing.assert_allclose(got.merged_score, want.merged_score,
                                   rtol=0, atol=0)
        np.testing.assert_array_equal(got.merged_valid, want.merged_valid)

    # two in flight, drained out of submit order
    p1 = eng.search_submit(syn.query_embs, strategy="all")
    p2 = eng.search_submit(syn.query_embs, strategy="ragroute")
    o2, o1 = p2.wait(), p1.wait()
    base_all = eng.search(syn.query_embs, strategy="all")
    base_rr = eng.search(syn.query_embs, strategy="ragroute")
    np.testing.assert_array_equal(o1.merged_shard, base_all.merged_shard)
    np.testing.assert_array_equal(o2.merged_shard, base_rr.merged_shard)

    # a handle yields its result exactly once
    with pytest.raises(RuntimeError):
        p1.wait()
