"""Balanced-IVF build + cluster-probed approximate search.

The exactness anchor: with ``nprobe == n_clusters`` every query scores
every document (the grouped-GEMM dispatch never drops pairs), so
ivf_topk must reproduce the exact oracle; smaller nprobe trades recall
for FLOPs (measured here on clustered data).
"""

import numpy as np
import jax.numpy as jnp

from ragroute_tpu.index.ivf import build_ivf, default_n_clusters
from ragroute_tpu.ops.ivf_topk import ivf_topk
from ragroute_tpu.ops.topk import exact_topk

K = 16


def _clustered(n, d, n_blobs, seed=0, spread=0.25):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_blobs, d)).astype(np.float32) * 2.0
    which = rng.integers(0, n_blobs, n)
    x = centers[which] + spread * rng.standard_normal((n, d)).astype(
        np.float32)
    return x.astype(np.float32)


def _recall(ids_a, ids_b):
    hits = sum(
        len(set(map(int, a)) & set(map(int, b)))
        for a, b in zip(ids_a, ids_b))
    return hits / ids_a.size


def test_build_is_a_partition():
    emb = _clustered(3000, 32, 12)
    ivf = build_ivf(emb, "dot", dtype=jnp.float32, n_clusters=64, seed=1)
    assert ivf.docs.shape == (64, 32, ivf.capacity)   # [C, d, S]
    assert 64 * ivf.capacity >= 3000
    valid = np.asarray(ivf.bias) > -np.inf
    perm = np.asarray(ivf.perm)
    seen = perm[valid]
    assert seen.size == 3000
    assert sorted(seen.tolist()) == list(range(3000))  # each doc once
    # stored columns match the source embedding they claim to be
    c, s = np.nonzero(valid)
    np.testing.assert_allclose(
        np.asarray(ivf.docs)[c[:50], :, s[:50]], emb[seen[:50]], rtol=1e-6)


def test_default_sizing_monotone():
    assert default_n_clusters(1000) <= default_n_clusters(100000)
    for n in (100, 5000, 1 << 20):
        c = default_n_clusters(n)
        assert 1 <= c <= max(16, n // 32) or c == 16


def test_exact_when_probing_every_cluster():
    emb = _clustered(2000, 48, 8, seed=2)
    q = _clustered(64, 48, 8, seed=3)
    ivf = build_ivf(emb, "dot", dtype=jnp.float32, n_clusters=32, seed=2)
    s_ref, i_ref = exact_topk(jnp.asarray(q), jnp.asarray(emb), K)
    s_ivf, i_ivf = ivf_topk(
        jnp.asarray(q), ivf, K, mode="dot", nprobe=32)
    np.testing.assert_allclose(
        np.asarray(s_ivf), np.asarray(s_ref), rtol=1e-5, atol=1e-5)
    assert _recall(np.asarray(i_ivf), np.asarray(i_ref)) == 1.0


def test_exact_full_probe_cos_and_l2():
    for mode in ("cos", "l2"):
        emb = _clustered(1500, 24, 6, seed=4)
        if mode == "cos":
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        q = _clustered(32, 24, 6, seed=5)
        ivf = build_ivf(emb, mode, dtype=jnp.float32, n_clusters=16, seed=4)
        s_ref, i_ref = exact_topk(jnp.asarray(q), jnp.asarray(emb), K,
                                  mode=mode)
        s_ivf, i_ivf = ivf_topk(jnp.asarray(q), ivf, K, mode=mode,
                                nprobe=16)
        assert _recall(np.asarray(i_ivf), np.asarray(i_ref)) == 1.0, mode
        np.testing.assert_allclose(
            np.asarray(s_ivf), np.asarray(s_ref), rtol=1e-4, atol=1e-4)
        if mode == "l2":  # natural form ascending
            sv = np.asarray(s_ivf)
            assert (np.diff(sv, axis=1) >= -1e-5).all()


def test_partial_probe_recall_on_clustered_data():
    emb = _clustered(6000, 32, 24, seed=6)
    q = _clustered(64, 32, 24, seed=7)
    ivf = build_ivf(emb, "dot", dtype=jnp.float32, n_clusters=48, seed=6)
    _, i_ref = exact_topk(jnp.asarray(q), jnp.asarray(emb), K)
    _, i_ivf = ivf_topk(jnp.asarray(q), ivf, K, mode="dot", nprobe=12)
    r = _recall(np.asarray(i_ivf), np.asarray(i_ref))
    assert r >= 0.9, f"recall@{K} {r} with nprobe=12/48 on clustered data"
    # fewer probes -> can only lose recall (same build)
    _, i_few = ivf_topk(jnp.asarray(q), ivf, K, mode="dot", nprobe=2)
    assert _recall(np.asarray(i_few), np.asarray(i_ref)) <= r + 1e-9


def test_int8_ivf():
    emb = _clustered(2000, 32, 8, seed=8)
    q = _clustered(32, 32, 8, seed=9)
    ivf = build_ivf(emb, "dot", dtype=jnp.int8, n_clusters=16, seed=8)
    assert ivf.docs.dtype == jnp.int8 and ivf.scale is not None
    _, i_ref = exact_topk(jnp.asarray(q), jnp.asarray(emb), K)
    _, i_ivf = ivf_topk(jnp.asarray(q), ivf, K, mode="dot", nprobe=16)
    assert _recall(np.asarray(i_ivf), np.asarray(i_ref)) >= 0.9


def test_int4_ivf_full_probe_matches_flat_int4_scan():
    """int4 IVF uses the flat shard's quantizer on the slot rows, so a
    doc's codes are identical to its flat-shard codes — the full-probe
    IVF result must reproduce the flat packed-int4 scan."""
    from ragroute_tpu.index.shard import _pack_int4, _quantize_sym
    from ragroute_tpu.ops.topk import shard_topk

    emb = _clustered(2000, 32, 8, seed=8)
    q = _clustered(32, 32, 8, seed=9)
    # mean-center like the production build path (ShardSet centers
    # lossy-dtype dot shards; q.(d-mu) ordering == q.d per query) — on
    # uncentered clustered data the common component eats most of the
    # 4-bit budget and the quantizer itself, not the IVF, loses recall
    emb = emb - emb.mean(axis=0)
    ivf = build_ivf(emb, "dot", dtype="int4", n_clusters=16, seed=8)
    assert ivf.packed4 and ivf.docs.dtype == jnp.int8
    assert ivf.docs.shape == (16, 16, ivf.capacity)     # d//2 byte rows
    assert ivf.scale is not None and ivf.scale.shape == (16, ivf.capacity)

    codes, s_row = _quantize_sym(emb, 7, mse_opt=True)
    s_flat, i_flat = shard_topk(
        jnp.asarray(q), jnp.asarray(_pack_int4(codes)), K, mode="dot",
        valid_docs=emb.shape[0], scale=jnp.asarray(s_row), packed4=True)
    s_ivf, i_ivf = ivf_topk(jnp.asarray(q), ivf, K, mode="dot", nprobe=16)
    assert _recall(np.asarray(i_ivf), np.asarray(i_flat)) >= 0.99
    np.testing.assert_allclose(
        np.sort(np.asarray(s_ivf), axis=1),
        np.sort(np.asarray(s_flat), axis=1), rtol=1e-2, atol=1e-2)
    # IVF adds no recall loss beyond the 4-bit quantization itself: its
    # f32-oracle recall matches the flat int4 scan's (this tiny d=32
    # blob corpus sits far below the 4-bit information limit, so the
    # absolute number is low for BOTH paths — the parity is the gate)
    _, i_ref = exact_topk(jnp.asarray(q), jnp.asarray(emb), K)
    r_flat = _recall(np.asarray(i_flat), np.asarray(i_ref))
    r_ivf = _recall(np.asarray(i_ivf), np.asarray(i_ref))
    assert r_ivf >= r_flat - 0.02, (r_ivf, r_flat)


def test_int4_ivf_l2_and_cos_full_probe_match_flat_scan():
    """int4 IVF parity beyond dot: the l2 gain pairs the dequant scale
    with a bias computed from the UNQUANTIZED rows (norm-corrected
    scales make the dequantized dot exact in expectation, the stored
    -|d|^2 bias exactly), and cos runs the quantizer on normalized rows
    — both must reproduce the flat packed-int4 scan at full probe."""
    from ragroute_tpu.index.shard import _pack_int4, _quantize_sym
    from ragroute_tpu.ops.topk import shard_topk

    for mode in ("l2", "cos"):
        emb = _clustered(2000, 32, 8, seed=8)
        q = _clustered(32, 32, 8, seed=9)
        if mode == "cos":
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
        else:
            # production centers lossy l2 shards; |q-d|^2 is unchanged
            # when both shift, so center queries with the same mean
            mu = emb.mean(axis=0)
            emb = emb - mu
            q = q - mu
        ivf = build_ivf(emb, mode, dtype="int4", n_clusters=16, seed=8)
        assert ivf.packed4

        codes, s_row = _quantize_sym(emb, 7, mse_opt=True)
        bias = (jnp.asarray(-np.sum(emb * emb, axis=1))
                if mode == "l2" else None)
        s_flat, i_flat = shard_topk(
            jnp.asarray(q), jnp.asarray(_pack_int4(codes)), K, mode=mode,
            valid_docs=emb.shape[0], scale=jnp.asarray(s_row),
            bias=bias, packed4=True)
        s_ivf, i_ivf = ivf_topk(jnp.asarray(q), ivf, K, mode=mode,
                                nprobe=16)
        assert _recall(np.asarray(i_ivf), np.asarray(i_flat)) >= 0.99, mode
        np.testing.assert_allclose(
            np.sort(np.asarray(s_ivf), axis=1),
            np.sort(np.asarray(s_flat), axis=1), rtol=1e-2, atol=1e-2,
            err_msg=mode)


def test_build_ivf_precomputed_codes_bit_identical():
    """ShardSet.build hands its flat int4 codes to build_ivf (quantize
    once); the resulting layout must be bit-identical to build_ivf's own
    quantization of the slot rows."""
    from ragroute_tpu.index.shard import _pack_int4, _quantize_sym

    emb = _clustered(1500, 32, 8, seed=11)
    emb = emb - emb.mean(axis=0)
    a = build_ivf(emb, "dot", dtype="int4", n_clusters=16, seed=3)
    codes, s_row = _quantize_sym(emb, 7, mse_opt=True)
    b = build_ivf(emb, "dot", dtype="int4", n_clusters=16, seed=3,
                  packed_rows=_pack_int4(codes), row_scales=s_row)
    assert b.packed4 and b.capacity == a.capacity
    np.testing.assert_array_equal(np.asarray(a.docs), np.asarray(b.docs))
    np.testing.assert_array_equal(np.asarray(a.perm), np.asarray(b.perm))
    np.testing.assert_array_equal(np.asarray(a.scale),
                                  np.asarray(b.scale))
    np.testing.assert_array_equal(np.asarray(a.bias), np.asarray(b.bias))


def test_int4_ivf_engine_end_to_end():
    """ShardSet.build(dtype='int4', ivf_clusters=...) + impl='ivf' at
    full probe matches the exact engine over the SAME int4 shards (same
    codes, so only merge/accumulation order may differ)."""
    import jax

    from ragroute_tpu.engine.engine import FederatedSearchEngine
    from ragroute_tpu.index import ShardSet, make_synthetic_world
    from ragroute_tpu.router import RouterBank, init_router_params

    syn = make_synthetic_world(
        "medrag", docs_per_source=1024, num_queries=16, seed=13)
    shard_set = ShardSet.build(
        syn.world, syn.embeddings, dtype="int4", ivf_clusters=16)
    params = init_router_params(
        jax.random.key(0), syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)

    exact = FederatedSearchEngine(shard_set, params, bank, impl="exact")
    ivf_full = FederatedSearchEngine(
        shard_set, params, bank, impl="ivf", nprobe=16)
    embs = {e: syn.query_embs[e] for e in syn.world.encoders}
    o_ref = exact.search(embs, strategy="all")
    o_ivf = ivf_full.search(embs, strategy="all")
    hits = total = 0
    for b in range(16):
        ref = {(int(s), int(l)) for s, l in zip(
            o_ref.merged_shard[b], o_ref.merged_local[b]) if s >= 0}
        got = {(int(s), int(l)) for s, l in zip(
            o_ivf.merged_shard[b], o_ivf.merged_local[b]) if s >= 0}
        hits += len(ref & got)
        total += len(ref)
    assert hits / total >= 0.98, f"int4 ivf full-probe recall {hits/total}"


def test_engine_ivf_impl_end_to_end():
    import jax

    from ragroute_tpu.engine.engine import FederatedSearchEngine
    from ragroute_tpu.index import ShardSet, make_synthetic_world
    from ragroute_tpu.router import RouterBank, init_router_params

    syn = make_synthetic_world(
        "medrag", docs_per_source=1024, num_queries=16, seed=11)
    shard_set = ShardSet.build(
        syn.world, syn.embeddings, dtype=jnp.float32, ivf_clusters=16)
    params = init_router_params(
        jax.random.key(0), syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)

    exact = FederatedSearchEngine(shard_set, params, bank, impl="exact")
    # full probe == exact engine results
    ivf_full = FederatedSearchEngine(
        shard_set, params, bank, impl="ivf", nprobe=16)
    embs = {e: syn.query_embs[e] for e in syn.world.encoders}
    o_ref = exact.search(embs, strategy="all")
    o_ivf = ivf_full.search(embs, strategy="all")
    for b in range(16):
        ref_pairs = {(int(s), int(l)) for s, l in zip(
            o_ref.merged_shard[b], o_ref.merged_local[b]) if s >= 0}
        ivf_pairs = {(int(s), int(l)) for s, l in zip(
            o_ivf.merged_shard[b], o_ivf.merged_local[b]) if s >= 0}
        assert len(ref_pairs & ivf_pairs) / len(ref_pairs) == 1.0

    # partial probe: valid output shape/ids, decent overlap
    ivf_part = FederatedSearchEngine(
        shard_set, params, bank, impl="ivf", nprobe=4)
    o_p = ivf_part.search(embs, strategy="ragroute")
    assert o_p.merged_local.shape == o_ref.merged_local.shape
    assert (o_p.merged_local >= 0).all()
    assert (o_p.merged_local < 1024).all()


def test_engine_ivf_requires_layout():
    import jax
    import pytest

    from ragroute_tpu.engine.engine import FederatedSearchEngine
    from ragroute_tpu.index import ShardSet, make_synthetic_world
    from ragroute_tpu.router import RouterBank, init_router_params

    syn = make_synthetic_world(
        "medrag", docs_per_source=256, num_queries=4, seed=12)
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32)
    params = init_router_params(
        jax.random.key(0), syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    with pytest.raises(ValueError, match="ivf_clusters"):
        FederatedSearchEngine(shard_set, params, bank, impl="ivf")


def test_topical_generator_preserves_world_semantics():
    """subclusters>1 keeps source-level statistics and schema intact while
    adding the within-source topical structure the IVF mode exploits."""
    from ragroute_tpu.index import make_synthetic_world

    blob = make_synthetic_world(
        "medrag", docs_per_source=2000, num_queries=32, seed=5)
    topical = make_synthetic_world(
        "medrag", docs_per_source=2000, num_queries=32, seed=5,
        subclusters=32)
    for src in blob.world.sources:
        a = blob.embeddings[src.name]
        b = topical.embeddings[src.name]
        assert a.shape == b.shape
        # per-source mean and total variance preserved (within sampling
        # noise): scatter^2 + local^2 == noise^2 by construction
        np.testing.assert_allclose(
            np.linalg.norm(a.mean(0)), np.linalg.norm(b.mean(0)),
            rtol=0.25, atol=0.5)
        np.testing.assert_allclose(a.var(), b.var(), rtol=0.2)
    # ground-truth relevance schema intact
    assert topical.relevant.shape == (32, blob.world.num_sources)
    assert topical.relevant.any(axis=1).all()
    # default path is bit-identical to the pre-subclusters generator
    blob2 = make_synthetic_world(
        "medrag", docs_per_source=2000, num_queries=32, seed=5,
        subclusters=1)
    np.testing.assert_array_equal(
        blob.embeddings["pubmed"], blob2.embeddings["pubmed"])


def test_ivf_layout_cache_roundtrip(tmp_path):
    """save_ivf/load_ivf roundtrip (incl. bf16 bit view and int8 scales)
    and ShardSet.load's cache: second load reuses the npz instead of
    rebuilding."""
    import os

    import jax

    from ragroute_tpu.index import ShardSet, make_synthetic_world
    from ragroute_tpu.index.ivf import load_ivf, save_ivf
    from ragroute_tpu.index.synthetic import save_world

    emb = _clustered(1200, 24, 6, seed=13)
    for dtype in (jnp.float32, jnp.bfloat16, jnp.int8, "int4"):
        ivf = build_ivf(emb, "dot", dtype=dtype, n_clusters=16, seed=13)
        name = dtype if isinstance(dtype, str) else jnp.dtype(dtype).name
        p = str(tmp_path / f"ivf_{name}.npz")
        save_ivf(ivf, p)
        back = load_ivf(p)
        assert back.docs.dtype == ivf.docs.dtype
        assert back.packed4 == ivf.packed4
        np.testing.assert_array_equal(
            np.asarray(back.perm), np.asarray(ivf.perm))
        np.testing.assert_array_equal(
            np.asarray(back.docs).view(np.uint8),
            np.asarray(ivf.docs).view(np.uint8))
        q = _clustered(8, 24, 6, seed=14)
        s_a, i_a = ivf_topk(jnp.asarray(q), ivf, 8, mode="dot", nprobe=16)
        s_b, i_b = ivf_topk(jnp.asarray(q), back, 8, mode="dot", nprobe=16)
        np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))

    # disk cache through ShardSet.load
    syn = make_synthetic_world(
        "medrag", docs_per_source=512, num_queries=4, seed=15)
    root = str(tmp_path / "root")
    save_world(syn, root)
    ss1 = ShardSet.load(root, syn.world, dtype=jnp.float32,
                        ivf_clusters=16)
    caches = [os.path.join(root, "medrag", s.name,
                           "ivf_16_float32_s0.npz")
              for s in syn.world.sources]
    assert all(os.path.exists(c) for c in caches)
    mtimes = [os.path.getmtime(c) for c in caches]
    ss2 = ShardSet.load(root, syn.world, dtype=jnp.float32,
                        ivf_clusters=16)
    assert [os.path.getmtime(c) for c in caches] == mtimes  # reused
    np.testing.assert_array_equal(
        np.asarray(ss1.shards[0].ivf.perm),
        np.asarray(ss2.shards[0].ivf.perm))

    # a DIFFERENT seed gets its own cache file (parameter in the key)
    ShardSet.load(root, syn.world, dtype=jnp.float32, ivf_clusters=16,
                  ivf_seed=1)
    assert os.path.exists(os.path.join(
        root, "medrag", "pubmed", "ivf_16_float32_s1.npz"))

    # regenerating same-shape embeddings invalidates the cache: the npz
    # stores the source-content fingerprint (the slabs hold the VECTORS,
    # so a silent hit would serve a stale corpus)
    emb_path = os.path.join(root, "medrag", "pubmed", "embeddings.npy")
    stale = np.load(emb_path)
    rng = np.random.default_rng(99)
    np.save(emb_path,
            rng.standard_normal(stale.shape).astype(np.float32))
    ss3 = ShardSet.load(root, syn.world, dtype=jnp.float32,
                        ivf_clusters=16)
    assert os.path.getmtime(caches[0]) > mtimes[0]  # rebuilt, not reused


def test_engine_hybrid_impl(monkeypatch):
    """hybrid == exact on small shards (flat branch statically chosen);
    with thresholds forced open it statically chooses the ivf branch."""
    import jax

    import ragroute_tpu.config as cfg
    from ragroute_tpu.engine.engine import FederatedSearchEngine
    from ragroute_tpu.index import ShardSet, make_synthetic_world
    from ragroute_tpu.router import RouterBank, init_router_params

    syn = make_synthetic_world(
        "medrag", docs_per_source=1024, num_queries=8, seed=21)
    shard_set = ShardSet.build(
        syn.world, syn.embeddings, dtype=jnp.float32, ivf_clusters=16)
    params = init_router_params(
        jax.random.key(0), syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    embs = {e: syn.query_embs[e] for e in syn.world.encoders}

    exact = FederatedSearchEngine(shard_set, params, bank, impl="exact")
    o_ref = exact.search(embs, strategy="all")

    # small shards: hybrid statically picks the flat path == exact
    hyb = FederatedSearchEngine(shard_set, params, bank, impl="hybrid")
    o_h = hyb.search(embs, strategy="all")
    np.testing.assert_array_equal(o_h.merged_local, o_ref.merged_local)
    np.testing.assert_array_equal(o_h.merged_shard, o_ref.merged_shard)

    # force the ivf regime: every shard qualifies, full probe == exact sets
    monkeypatch.setattr(cfg, "IVF_HYBRID_MIN_DOCS", 1)
    monkeypatch.setattr(cfg, "IVF_HYBRID_MAX_BATCH", 1024)
    hyb2 = FederatedSearchEngine(shard_set, params, bank, impl="hybrid",
                                 nprobe=16)
    o_h2 = hyb2.search(embs, strategy="all")
    for b in range(8):
        ref_pairs = {(int(s), int(l)) for s, l in zip(
            o_ref.merged_shard[b], o_ref.merged_local[b]) if s >= 0}
        hyb_pairs = {(int(s), int(l)) for s, l in zip(
            o_h2.merged_shard[b], o_h2.merged_local[b]) if s >= 0}
        assert ref_pairs == hyb_pairs
