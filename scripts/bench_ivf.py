"""Flat-vs-IVF single-shard device benchmark: the crossover table.

Reproduces the BENCHMARKS.md "where it wins" table: per-batch device
time of the exhaustive fused kernel vs the balanced-IVF pipeline on one
shard of the topical synthetic corpus, across batch sizes.

    python scripts/bench_ivf.py [--docs 734003] [--k 32]
        [--nprobe 128] [--batches 8 32 128 512 1024] [--reps 16]
        [--subclusters 64] [--recall]

(embedding dim is the medrag world's 768)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=734003)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--nprobe", type=int, default=128)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[8, 32, 128, 512, 1024])
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--subclusters", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "int8", "int4"])
    ap.add_argument("--recall", action="store_true",
                    help="also report IVF recall@k vs the exact path")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_ragroute"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from ragroute_tpu.index.ivf import build_ivf
    from ragroute_tpu.index.synthetic import make_synthetic_world
    from ragroute_tpu.ops.ivf_topk import ivf_topk
    from ragroute_tpu.ops.pallas_topk import pallas_topk

    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
          "int8": jnp.int8, "int4": "int4"}[args.dtype]
    syn = make_synthetic_world(
        "medrag", docs_per_source_map={"pubmed": args.docs},
        docs_per_source=2048, num_queries=max(args.batches), seed=0,
        with_payloads=False, subclusters=args.subclusters)
    emb = syn.embeddings["pubmed"]
    # the flat comparison always runs bf16 for int8 (the flat int8 path
    # needs per-doc scales, which ShardSet owns; this script is per-op)
    flat = jnp.asarray(
        emb, jnp.bfloat16 if args.dtype in ("int8", "int4") else dt)
    t0 = time.time()
    ivf = build_ivf(emb, "dot", dtype=dt)
    print(f"ivf build {time.time()-t0:.0f}s: C={ivf.n_clusters} "
          f"S={ivf.capacity}", file=sys.stderr)

    rng = np.random.default_rng(1)
    q0 = syn.query_embs["ncbi/MedCPT-Query-Encoder"]

    def run(kind, b):
        qs = jnp.asarray(np.stack([
            q0[:b] + 0.01 * rng.standard_normal(
                q0[:b].shape).astype(np.float32)
            for _ in range(args.reps)]))

        @jax.jit
        def loop(qs, flat, ivf):
            def body(carry, q):
                if kind == "flat":
                    s, i = pallas_topk(q, flat, args.k, mode="dot",
                                       valid_docs=args.docs)
                else:
                    s, i = ivf_topk(q, ivf, args.k, mode="dot",
                                    nprobe=args.nprobe)
                return carry + s.sum() + i.sum().astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0), qs)
            return out

        float(loop(qs, flat, ivf))
        t0 = time.time()
        float(loop(qs, flat, ivf))
        el = time.time() - t0
        return el * 1e3 / args.reps

    if args.recall:
        from ragroute_tpu.ops.topk import chunked_topk

        b = min(512, max(args.batches))
        q = jnp.asarray(q0[:b], jnp.float32)
        _, i_ref = chunked_topk(q, flat, args.k, mode="dot",
                                valid_docs=args.docs)
        _, i_ivf = ivf_topk(q, ivf, args.k, mode="dot",
                            nprobe=args.nprobe)
        i_ref, i_ivf = np.asarray(i_ref), np.asarray(i_ivf)
        hits = sum(len(set(a.tolist()) & set(bb.tolist()))
                   for a, bb in zip(i_ivf, i_ref))
        print(f"recall@{args.k} at nprobe={args.nprobe}: "
              f"{hits / i_ref.size:.4f}")

    print(f"{'B':>6s} {'flat ms':>9s} {'ivf ms':>9s} {'speedup':>8s}")
    for b in args.batches:
        f_ms = run("flat", b)
        i_ms = run("ivf", b)
        print(f"{b:6d} {f_ms:9.2f} {i_ms:9.2f} {f_ms / i_ms:7.2f}x")


if __name__ == "__main__":
    main()
