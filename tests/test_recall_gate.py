"""CI recall gate: the engine's retrieval quality vs the exact f32 oracle.

BASELINE.md demands recall parity with the reference's FAISS flat search.
This gate FAILS the suite if:

* float32 winner-set recall drops below 1.0 (exactness — the f32 engine is
  bit-parity with brute force) on any world x strategy, or
* bfloat16 recall@k drops below 0.99, or
* int8 (per-doc symmetric quantization) recall@k drops below 0.95, or
* int4 (packed pairs, per-group MSE-opt scales) drops below 0.90, or
* int4 + lowrank (coarse-authoritative bf16 slab ordering — the
  recommended high-dim int4 serving config) drops below 0.95.

Every run also emits a JSON artifact (all worlds x dtypes x strategies) to
``$RAGROUTE_RECALL_ARTIFACT`` if set (the per-round RECALL_r{N}.json),
else to the pytest tmp dir.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from ragroute_tpu.engine import FederatedSearchEngine
from ragroute_tpu.index import ShardSet, make_synthetic_world
from ragroute_tpu.oracle import engine_recall, exact_oracle
from ragroute_tpu.router import RouterBank, init_router_params

WORLDS = ["medrag", "feb4rag", "wikipedia"]
DTYPES = {"float32": (jnp.float32, 1.0),
          "bfloat16": (jnp.bfloat16, 0.99),
          "int8": (jnp.int8, 0.95),
          # int4 packed (two codes/byte, per-GROUP MSE-optimal clipped +
          # norm-corrected scales, config.INT4_GROUP_DIMS): 4x capacity
          # over bf16. 768-d dot/l2 worlds measure >= 0.95; the floor is
          # feb4rag's 4096-d cos shards under sparse routing (0.90 with
          # group scales; per-doc scales measured 0.892, group-64 0.921,
          # LS-iterated scales WORSE — the uniform 4-bit/dim information
          # limit on isotropic data; serve int4+lowrank to clear it, see
          # test_recall_gate_int4_lowrank)
          "int4": ("int4", 0.90)}
STRATEGIES = ["all", "ragroute", "random", "none"]

_results = {}


@pytest.fixture(scope="module", params=WORLDS)
def world_fixture(request):
    syn = make_synthetic_world(request.param, docs_per_source=1024,
                               num_queries=24, seed=21, with_payloads=False)
    params = init_router_params(__import__("jax").random.key(3),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    return syn, params, bank


@pytest.mark.parametrize("dtype_name", list(DTYPES))
def test_recall_gate(world_fixture, dtype_name):
    syn, params, bank = world_fixture
    dtype, floor = DTYPES[dtype_name]
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype=dtype)
    engine = FederatedSearchEngine(shard_set, params, bank)

    for strategy in STRATEGIES:
        out = engine.search(syn.query_embs, strategy=strategy)
        mask = out.mask if strategy != "all" else None
        oracle = exact_oracle(syn.world, syn.embeddings, syn.query_embs,
                              syn.world.k, mask=mask)
        r = engine_recall(syn.world, out, oracle)
        _results[f"{syn.world.name}/{dtype_name}/{strategy}"] = round(r, 4)
        assert r >= floor, (
            f"{syn.world.name} {dtype_name} strategy={strategy}: "
            f"recall@{syn.world.k} = {r:.4f} < gate {floor}")


# ---------------------------------------------------------------------------
# Adversarial corpora: the gate above uses isotropic single-blob synthetic
# data; these distributions attack the places lossy dtypes and tie-breaking
# actually fail (duplicates at the k boundary, topical clustering, score
# concentration from a large common component, anisotropic dims).
# ---------------------------------------------------------------------------


def _gate_engine(syn, embeddings, dtype, strategy="all", query_embs=None):
    query_embs = query_embs or syn.query_embs
    shard_set = ShardSet.build(syn.world, embeddings, dtype=dtype)
    engine = FederatedSearchEngine(shard_set, None, None)
    out = engine.search(query_embs, strategy=strategy)
    oracle = exact_oracle(syn.world, embeddings, query_embs,
                          syn.world.k)
    return engine_recall(syn.world, out, oracle)


@pytest.mark.parametrize("dtype_name", list(DTYPES))
def test_recall_gate_duplicates_at_k_boundary(dtype_name):
    """Exact duplicate docs in blocks of ~k force ties that straddle the
    k boundary; f32 must still match the oracle's lowest-index tie-break
    exactly (FAISS flat parity) and lossy dtypes must hold their gates
    (duplicates quantize identically, so ties survive rounding)."""
    dtype, floor = DTYPES[dtype_name]
    syn = make_synthetic_world("medrag", docs_per_source=1024,
                               num_queries=16, seed=33,
                               with_payloads=False)
    emb = {n: np.array(v, np.float32, copy=True)
           for n, v in syn.embeddings.items()}
    k = syn.world.k
    for n in emb:
        e = emb[n]
        # three duplicated blocks of k copies each, sources spread so
        # some block lands near the boundary for most queries
        for base, start in ((5, 200), (17, 400), (29, 700)):
            e[start:start + k] = e[base]
    r = _gate_engine(syn, emb, dtype)
    _results[f"adversarial-duplicates/medrag/{dtype_name}/all"] = round(r, 4)
    assert r >= floor, f"duplicates: {dtype_name} recall {r:.4f} < {floor}"


def test_recall_gate_all_rows_tied():
    """Degenerate corpus where EVERY doc of a source is identical: every
    score ties, and the winner set must be exactly the lowest-index k
    (the FAISS flat tie order the oracle pins)."""
    syn = make_synthetic_world("medrag", docs_per_source=512,
                               num_queries=8, seed=34,
                               with_payloads=False)
    emb = {n: np.array(v, np.float32, copy=True)
           for n, v in syn.embeddings.items()}
    first = syn.world.sources[0].name
    emb[first][:] = emb[first][0]
    r = _gate_engine(syn, emb, jnp.float32)
    _results["adversarial-all-tied/medrag/float32/all"] = round(r, 4)
    assert r == 1.0, f"all-tied tie-break drifted: recall {r:.4f}"


@pytest.mark.parametrize("dtype_name", list(DTYPES))
def test_recall_gate_clustered_world(dtype_name):
    """Topical/clustered corpora (--subclusters): scores concentrate
    inside the query's home cluster, shrinking winner margins."""
    dtype, floor = DTYPES[dtype_name]
    syn = make_synthetic_world("medrag", docs_per_source=1024,
                               num_queries=16, seed=35,
                               with_payloads=False, subclusters=8)
    r = _gate_engine(syn, syn.embeddings, dtype)
    _results[f"adversarial-clustered/medrag/{dtype_name}/all"] = round(r, 4)
    assert r >= floor, f"clustered: {dtype_name} recall {r:.4f} < {floor}"


@pytest.mark.parametrize("dtype_name", ["bfloat16", "int8"])
@pytest.mark.parametrize("world_name", ["medrag", "wikipedia"])
def test_recall_gate_concentrated_scores(world_name, dtype_name):
    """A large common component dominates every vector (queries AND
    docs — one encoder produces both, so a corpus-wide bias appears on
    both sides), leaving the discriminating residual in lossy dtypes'
    low-order bits — the classic quantization adversary. Mean-centering
    at build (ShardSet.build: l2 shifts queries, dot restores the q·mu
    constant) is the defense this pins: without it bf16 measured 0.984
    on the dot world."""
    dtype, floor = DTYPES[dtype_name]
    syn = make_synthetic_world(world_name, docs_per_source=1024,
                               num_queries=16, seed=36,
                               with_payloads=False)
    emb = {}
    for n, v in syn.embeddings.items():
        # +12 per dim ~ 12x the unit per-dim signal variance
        emb[n] = np.array(v, np.float32, copy=True) + 12.0
    qe = {e: np.asarray(q, np.float32) + 12.0
          for e, q in syn.query_embs.items()}
    r = _gate_engine(syn, emb, dtype, query_embs=qe)
    _results[
        f"adversarial-concentrated/{world_name}/{dtype_name}/all"
    ] = round(r, 4)
    assert r >= floor, (
        f"concentrated {world_name}: {dtype_name} recall {r:.4f} < {floor}")


@pytest.mark.parametrize("dtype_name", ["bfloat16", "int8"])
def test_recall_gate_anisotropic_dims(dtype_name):
    """Per-dimension scales spanning 4 orders of magnitude: int8's
    per-DOC symmetric scale must still resolve the low-magnitude dims
    that carry part of the signal."""
    dtype, floor = DTYPES[dtype_name]
    syn = make_synthetic_world("medrag", docs_per_source=1024,
                               num_queries=16, seed=37,
                               with_payloads=False)
    emb = {}
    rng = np.random.default_rng(99)
    for n, v in syn.embeddings.items():
        v = np.array(v, np.float32, copy=True)
        d = v.shape[1]
        scales = np.logspace(0, -4, d).astype(np.float32)
        rng.shuffle(scales)
        emb[n] = v * scales[None, :]
    r = _gate_engine(syn, emb, dtype)
    _results[f"adversarial-anisotropic/medrag/{dtype_name}/all"] = round(r, 4)
    assert r >= floor, (
        f"anisotropic: {dtype_name} recall {r:.4f} < {floor}")


def test_recall_gate_int4_lowrank(world_fixture):
    """int4 + lowrank (coarse-authoritative): the 4x-capacity store with
    the bf16 rank-r slab deciding the order. This is the recommended
    high-dimension int4 serving config — it clears the >= 0.95 gate the
    plain int4 scan cannot reach on 4096-d cos shards under sparse
    routing (uniform-4-bit information limit; measured 0.90 with group
    scales, 0.9958 here)."""
    syn, params, bank = world_fixture
    shard_set = ShardSet.build(syn.world, syn.embeddings, dtype="int4",
                               lowrank=-1)
    engine = FederatedSearchEngine(shard_set, params, bank,
                                   impl="lowrank")
    for strategy in STRATEGIES:
        out = engine.search(syn.query_embs, strategy=strategy)
        mask = out.mask if strategy != "all" else None
        oracle = exact_oracle(syn.world, syn.embeddings, syn.query_embs,
                              syn.world.k, mask=mask)
        r = engine_recall(syn.world, out, oracle)
        _results[f"{syn.world.name}/int4+lowrank/{strategy}"] = round(r, 4)
        assert r >= 0.95, (
            f"{syn.world.name} int4+lowrank strategy={strategy}: "
            f"recall@{syn.world.k} = {r:.4f} < gate 0.95")


def test_emit_artifact(tmp_path):
    """Write the aggregated recall table (runs last in file order)."""
    assert _results, "gate tests must have populated results"
    path = os.environ.get("RAGROUTE_RECALL_ARTIFACT",
                          str(tmp_path / "recall.json"))
    payload = {
        "k": "per-world (medrag 32, feb4rag/wikipedia 10)",
        "oracle": "exact f32 brute force (ragroute_tpu.oracle)",
        "num_queries": 24,
        "docs_per_source": 1024,
        "gates": {d: g for d, (_, g) in DTYPES.items()},
        "recall": dict(sorted(_results.items())),
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    # int4 is the capacity tier and carries its own (lower) gate; every
    # serving-default dtype must stay >= 0.95 across all cells, and the
    # int4+lowrank config must clear 0.95 too (see its gate test)
    assert min(v for cell, v in _results.items()
               if "/int4" not in cell) >= 0.95
    assert min(v for cell, v in _results.items()
               if "/int4/" in cell) >= 0.90
    lr_cells = [v for cell, v in _results.items()
                if "/int4+lowrank/" in cell]
    assert lr_cells and min(lr_cells) >= 0.95

