"""CI recall gate: the engine's retrieval quality vs the exact f32 oracle.

BASELINE.md demands recall parity with the reference's FAISS flat search.
This gate FAILS the suite if:

* float32 winner-set recall drops below 1.0 (exactness — the f32 engine is
  bit-parity with brute force) on any world x strategy, or
* bfloat16 recall@k drops below 0.99, or
* int8 (per-doc symmetric quantization) recall@k drops below 0.95.

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
          "int8": (jnp.int8, 0.95)}
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
    assert min(_results.values()) >= 0.95
