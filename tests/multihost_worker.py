"""Subprocess worker for tests/test_multihost.py — NOT a pytest module.

Each worker is one "host" of a 2-process JAX distributed cluster
(CPU platform, 4 virtual devices per process, gloo collectives). It
builds the same tiny synthetic medrag world from a fixed seed,
constructs :class:`ShardedSearch` over the GLOBAL (dp=2, idx=4) mesh —
``dp`` spanning the two processes, ``idx`` within each process, the
multi-host layout of ``make_multihost_mesh`` — runs searches, and
verifies:

* strategy=all in f32 matches the exact numpy oracle bit-for-bit
  (same winner sets);
* strategy=ragroute produces identical routing masks and winners on
  both processes (printed digest compared by the test);
* one :class:`LockstepEngine` round trip (process 0 leads a broadcast
  batch, process 1 follows, stop flag releases the follower).

Prints one JSON verdict line per process on success.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ragroute_tpu.parallel.multihost import (
        LockstepEngine, initialize, make_multihost_mesh)

    initialize(f"localhost:{port}", nproc, pid, local_device_count=4)
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import numpy as np
    import jax.numpy as jnp

    from ragroute_tpu.engine.engine import SearchOutput  # noqa: F401
    from ragroute_tpu.index import ShardSet, make_synthetic_world
    from ragroute_tpu.oracle import engine_recall, exact_oracle
    from ragroute_tpu.parallel import ShardedSearch
    from ragroute_tpu.router import RouterBank, init_router_params

    mesh = make_multihost_mesh(dp=nproc, idx=4)
    # the multi-host layout promise: each idx row sits within one process
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, (
            "idx group crosses processes")

    syn = make_synthetic_world("medrag", docs_per_source=512,
                               num_queries=8, seed=5, with_payloads=False)
    shard_set = ShardSet.build(syn.world, syn.embeddings,
                               dtype=jnp.float32)
    params = init_router_params(jax.random.key(1),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    sharded = ShardedSearch(shard_set, params, bank, mesh, impl="exact")

    # --- exact-f32 oracle parity over the multi-process mesh ----------
    out = sharded.search(syn.query_embs, strategy="all")
    oracle = exact_oracle(syn.world, syn.embeddings, syn.query_embs,
                          syn.world.k)
    r_all = engine_recall(syn.world, out, oracle)
    assert r_all == 1.0, f"f32 strategy=all recall {r_all} != 1.0"

    # --- learned routing: every process must agree bit-for-bit --------
    out_r = sharded.search(syn.query_embs, strategy="ragroute")
    oracle_r = exact_oracle(syn.world, syn.embeddings, syn.query_embs,
                            syn.world.k, mask=out_r.mask)
    r_routed = engine_recall(syn.world, out_r, oracle_r)
    assert r_routed == 1.0, f"f32 ragroute recall {r_routed} != 1.0"
    digest_src = np.concatenate([
        out_r.mask.astype(np.int32).ravel(),
        out_r.merged_shard.ravel(), out_r.merged_local.ravel(),
        out_r.merged_valid.ravel()])
    import hashlib

    digest = hashlib.sha256(digest_src.tobytes()).hexdigest()[:16]

    # --- serving lockstep: broadcast-fed step on all processes --------
    feed = LockstepEngine(sharded, buckets=(8,), leader=pid == 0)
    if pid == 0:
        led = feed.search(syn.query_embs, strategy="all")
        assert engine_recall(syn.world, led, oracle) == 1.0
        feed.stop()
    else:
        feed.follow()

    print(json.dumps({"pid": pid, "ok": True, "digest": digest,
                      "recall_all": r_all, "recall_ragroute": r_routed}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
