"""Low-rank coarse index build + two-stage scan-and-refine search.

The exactness anchor: the synthetic worlds live in a rank-64 latent
space (``index/synthetic.py:LATENT_DIM``), so a rank-128 projection is
lossless and the two-stage search must reproduce the exact oracle's
indices bit-for-bit. Flat (full-rank isotropic) spectra exercise the
build's refusal policy and the engine's per-shard exact-scan fallback.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ragroute_tpu.index.lowrank import (LowRankData, build_lowrank,
                                        load_lowrank, save_lowrank,
                                        select_rank)
from ragroute_tpu.index.shard import ShardSet
from ragroute_tpu.ops.lowrank_topk import lowrank_topk
from ragroute_tpu.ops.topk import exact_topk, shard_topk

K = 16


def _planted(n, d, lat=64, seed=0, n_blobs=6, spread=0.35):
    """Rank-``lat`` docs + queries near the doc clusters (the synthetic
    worlds' generative shape)."""
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((lat, d)).astype(np.float32) / np.sqrt(lat)
    centers = 2.0 * rng.standard_normal((n_blobs, lat)).astype(np.float32)
    z = centers[rng.integers(0, n_blobs, n)] + spread * rng.standard_normal(
        (n, lat)).astype(np.float32)
    return (z @ proj).astype(np.float32), proj, centers


def _queries(proj, centers, m, seed=1, spread=0.2):
    rng = np.random.default_rng(seed)
    z = centers[rng.integers(0, centers.shape[0], m)]
    z = z + spread * rng.standard_normal(z.shape).astype(np.float32)
    return (z @ proj).astype(np.float32)


# -- build ------------------------------------------------------------------

def test_select_rank_energy_rule():
    # spectrum with 90% energy in the first 100 of 512 dims
    w = np.concatenate([np.full(100, 9.0), np.full(412, 100 * 1.0 / 412)])
    assert select_rank(w, 0.85) == 128          # rounds up to the multiple
    assert select_rank(w, 0.999) is None        # needs > d/2 -> refuse
    assert select_rank(w, 0.85, rank=77) == 77  # explicit override wins


def test_build_planted_rank_is_lossless():
    emb, _, _ = _planted(3000, 512)
    lr = build_lowrank(emb, n_pad=3072)
    assert lr is not None
    assert lr.rank == 128 and lr.energy > 0.999999
    assert lr.docs_lr.shape == (3072, 128)
    # orthonormal basis
    b = np.asarray(lr.basis)
    np.testing.assert_allclose(b.T @ b, np.eye(128), atol=1e-5)
    # lossless: projected dots reproduce the CENTERED full dots (the
    # coarse slab is mean-centered — a per-query constant score shift —
    # and bf16-stored, ~0.4%/element rounding, hence the scaled atol)
    q = emb[:8]
    full = q @ (emb[:100] - emb.mean(axis=0)).T
    coarse = (q @ b) @ np.asarray(lr.docs_lr[:100], np.float32).T
    np.testing.assert_allclose(coarse, full,
                               atol=0.02 * np.abs(full).max())


def test_build_refuses_flat_spectrum():
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((2000, 256)).astype(np.float32)
    assert build_lowrank(emb, n_pad=2048) is None
    # explicit rank overrides the refusal policy
    lr = build_lowrank(emb, n_pad=2048, rank=64)
    assert lr is not None and lr.rank == 64 and lr.energy < 0.5


# -- op ---------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_lowrank_topk_matches_exact_on_planted_rank(mode):
    emb, proj, centers = _planted(4000, 384, seed=4)
    q = _queries(proj, centers, 32, seed=5)
    lr = build_lowrank(emb, n_pad=4096)
    assert lr is not None and lr.energy > 0.999999
    docs = jnp.asarray(np.pad(emb, ((0, 96), (0, 0))))
    bias = None
    if mode == "l2":
        bias = jnp.asarray(np.pad(
            -np.einsum("nd,nd->n", emb, emb), (0, 96),
            constant_values=-np.inf))
    else:
        bias = jnp.asarray(np.pad(
            np.zeros(4000, np.float32), (0, 96), constant_values=-np.inf))
    s_ref, i_ref = exact_topk(jnp.asarray(q), docs, K, mode=mode,
                              valid_docs=4000, bias=bias)
    s_lr, i_lr = lowrank_topk(jnp.asarray(q), lr, docs, K, mode=mode,
                              valid_docs=4000, bias=bias, k_refine=4 * K)
    np.testing.assert_array_equal(np.asarray(i_lr), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s_lr), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def test_lowrank_cos_concentrated_beats_bf16_scan():
    """cos on tight clusters concentrates scores below bf16 resolution
    (k->2k gap ~5e-4 at |score| ~0.99): the bf16-stored coarse slab can
    only order candidates to bf16 precision, so correctness comes from
    refine oversampling + exact rescore from the unrounded store. At the
    DEFAULT candidate depth (4k) the two-stage result must beat what the
    production bf16 exhaustive scan scores on the same corpus (~0.94),
    and deepening k' must drive it to 1.0."""
    emb, proj, centers = _planted(4000, 384, seed=4)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    q = _queries(proj, centers, 32, seed=5)
    lr = build_lowrank(emb, n_pad=4096)
    docs = jnp.asarray(np.pad(emb, ((0, 96), (0, 0))))
    bias = jnp.asarray(np.pad(np.zeros(4000, np.float32), (0, 96),
                              constant_values=-np.inf))
    _, i_ref = exact_topk(jnp.asarray(q), docs, K, mode="cos",
                          valid_docs=4000, bias=bias)
    ref_sets = [set(map(int, r)) for r in np.asarray(i_ref)]

    def recall(k_refine):
        _, i = lowrank_topk(jnp.asarray(q), lr, docs, K, mode="cos",
                            valid_docs=4000, bias=bias, k_refine=k_refine)
        return np.mean([len(set(map(int, a)) & b) / K
                        for a, b in zip(np.asarray(i), ref_sets)])

    assert recall(4 * K) >= 0.99
    assert recall(8 * K) == 1.0


def test_lowrank_topk_int8_refine_matches_int8_exact():
    """Refine rescoring runs on the QUANTIZED store: results must equal
    the exhaustive scan over the same int8 shard (dequant included)."""
    from ragroute_tpu.index.shard import _quantize_sym

    emb, proj, centers = _planted(3000, 256, seed=6)
    q = _queries(proj, centers, 16, seed=7)
    codes, scales = _quantize_sym(np.pad(emb, ((0, 72), (0, 0))), 127)
    docs = jnp.asarray(codes)
    scale = jnp.asarray(scales)
    lr = build_lowrank(emb, n_pad=3072)
    s_ref, i_ref = exact_topk(jnp.asarray(q), docs, K, mode="dot",
                              valid_docs=3000, scale=scale)
    s_lr, i_lr = lowrank_topk(jnp.asarray(q), lr, docs, K, mode="dot",
                              valid_docs=3000, scale=scale, k_refine=2 * K)
    np.testing.assert_array_equal(np.asarray(i_lr), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s_lr), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def test_lowrank_topk_duplicate_ties_lowest_index_first():
    emb, proj, centers = _planted(1000, 256, seed=8)
    emb[500:510] = emb[100:110]          # exact duplicates across the slab
    q = _queries(proj, centers, 8, seed=9)
    lr = build_lowrank(emb, n_pad=1024, rank=128)
    docs = jnp.asarray(np.pad(emb, ((0, 24), (0, 0))))
    s_ref, i_ref = exact_topk(jnp.asarray(q), docs, K, mode="dot",
                              valid_docs=1000)
    s_lr, i_lr = lowrank_topk(jnp.asarray(q), lr, docs, K, mode="dot",
                              valid_docs=1000, k_refine=4 * K)
    np.testing.assert_array_equal(np.asarray(i_lr), np.asarray(i_ref))


def test_lowrank_topk_small_shard_fewer_valid_than_krefine():
    emb, proj, centers = _planted(40, 128, seed=10)
    q = _queries(proj, centers, 4, seed=11)
    lr = build_lowrank(emb, n_pad=512, rank=64)
    docs = jnp.asarray(np.pad(emb, ((0, 472), (0, 0))))
    bias = jnp.asarray(np.pad(np.zeros(40, np.float32), (0, 472),
                              constant_values=-np.inf))
    s_lr, i_lr = lowrank_topk(jnp.asarray(q), lr, docs, K, mode="dot",
                              valid_docs=40, bias=bias, k_refine=128)
    s_ref, i_ref = exact_topk(jnp.asarray(q), docs, K, mode="dot",
                              valid_docs=40, bias=bias)
    np.testing.assert_array_equal(np.asarray(i_lr), np.asarray(i_ref))


# -- persistence --------------------------------------------------------------

def test_lowrank_cache_roundtrip_and_fingerprint(tmp_path):
    emb, _, _ = _planted(800, 256, seed=12)
    lr = build_lowrank(emb, n_pad=1024)
    path = str(tmp_path / "lr.npz")
    save_lowrank(lr, path, fingerprint="fp-a")
    back = load_lowrank(path, expect_fingerprint="fp-a")
    assert back is not None and back.rank == lr.rank
    np.testing.assert_array_equal(np.asarray(back.basis),
                                  np.asarray(lr.basis))
    np.testing.assert_array_equal(
        np.asarray(back.docs_lr).view(np.uint16),
        np.asarray(lr.docs_lr).view(np.uint16))
    assert load_lowrank(path, expect_fingerprint="fp-b") is None


# -- ShardSet + engine ---------------------------------------------------------

def _tiny_world(monkeypatch_root=None, dtype=jnp.bfloat16, lowrank=-1):
    from ragroute_tpu.index.synthetic import make_synthetic_world

    syn = make_synthetic_world("medrag", docs_per_source=512, num_queries=16,
                               seed=21)
    ss = ShardSet.build(syn.world, syn.embeddings, doc_ids=syn.doc_ids,
                        dtype=dtype, lowrank=lowrank)
    return syn, ss


def test_shardset_builds_lr_and_engine_matches_exact():
    from ragroute_tpu.engine.engine import FederatedSearchEngine

    syn, ss = _tiny_world(dtype=jnp.float32)
    assert ss.lowrank_built and all(s.lr is not None for s in ss.shards)
    assert all(s.lr.rank == 128 for s in ss.shards)

    ss_exact = ShardSet.build(syn.world, syn.embeddings,
                              doc_ids=syn.doc_ids, dtype=jnp.float32)
    e_lr = FederatedSearchEngine(ss, None, None, impl="lowrank")
    e_ex = FederatedSearchEngine(ss_exact, None, None, impl="exact")
    out_lr = e_lr.search(syn.query_embs, strategy="all", staged=False)
    out_ex = e_ex.search(syn.query_embs, strategy="all", staged=False)
    np.testing.assert_array_equal(out_lr.merged_shard, out_ex.merged_shard)
    np.testing.assert_array_equal(out_lr.merged_local, out_ex.merged_local)
    np.testing.assert_allclose(out_lr.merged_score, out_ex.merged_score,
                               rtol=2e-4, atol=2e-4)


def test_engine_lowrank_requires_built_shards():
    from ragroute_tpu.engine.engine import FederatedSearchEngine

    syn, _ = _tiny_world()
    ss = ShardSet.build(syn.world, syn.embeddings, doc_ids=syn.doc_ids)
    with pytest.raises(ValueError, match="lowrank"):
        FederatedSearchEngine(ss, None, None, impl="lowrank")


def test_engine_falls_back_on_refused_shards():
    """A flat-spectrum shard gets lr=None at build; impl='lowrank' must
    still serve it (exact-scan fallback), not crash."""
    from ragroute_tpu.engine.engine import FederatedSearchEngine
    from ragroute_tpu.index.synthetic import make_synthetic_world

    syn = make_synthetic_world("medrag", docs_per_source=512,
                               num_queries=8, seed=22)
    rng = np.random.default_rng(23)
    # overwrite one source with full-rank isotropic noise
    flat_src = syn.world.sources[0].name
    syn.embeddings[flat_src] = rng.standard_normal(
        syn.embeddings[flat_src].shape).astype(np.float32)
    ss = ShardSet.build(syn.world, syn.embeddings, doc_ids=syn.doc_ids,
                        dtype=jnp.float32, lowrank=-1)
    assert ss.shards[0].lr is None
    assert any(s.lr is not None for s in ss.shards[1:])
    eng = FederatedSearchEngine(ss, None, None, impl="lowrank")
    ss_exact = ShardSet.build(syn.world, syn.embeddings,
                              doc_ids=syn.doc_ids, dtype=jnp.float32)
    e_ex = FederatedSearchEngine(ss_exact, None, None, impl="exact")
    out_lr = eng.search(syn.query_embs, strategy="all", staged=False)
    out_ex = e_ex.search(syn.query_embs, strategy="all", staged=False)
    np.testing.assert_array_equal(out_lr.merged_shard, out_ex.merged_shard)
    np.testing.assert_array_equal(out_lr.merged_local, out_ex.merged_local)


def test_mutable_lowrank_rejected():
    syn, _ = _tiny_world()
    with pytest.raises(ValueError, match="mutable"):
        ShardSet.build(syn.world, syn.embeddings, doc_ids=syn.doc_ids,
                       lowrank=-1, mutable=True)


def test_shardset_load_uses_lr_cache(tmp_path):
    from ragroute_tpu.index.synthetic import make_synthetic_world, save_world

    syn = make_synthetic_world("medrag", docs_per_source=512, num_queries=8,
                               seed=24)
    root = str(tmp_path)
    save_world(syn, root)
    ss1 = ShardSet.load(root, syn.world, lowrank=-1)
    caches = [os.path.join(root, "medrag", s.name)
              for s in syn.world.sources]
    assert all(any(f.startswith("lr_") for f in os.listdir(c))
               for c in caches)
    ss2 = ShardSet.load(root, syn.world, lowrank=-1)   # cache hit
    for a, b in zip(ss1.shards, ss2.shards):
        np.testing.assert_array_equal(
            np.asarray(a.lr.docs_lr).view(np.uint16),
            np.asarray(b.lr.docs_lr).view(np.uint16))
