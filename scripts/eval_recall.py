"""Recall-parity evaluation: engine vs exact f32 brute force.

The acceptance gate from SURVEY §4/BASELINE.md: recall@k of the TPU engine
(bf16 index + fused kernel) measured against an exact float32 brute-force
oracle over the same corpus, per routing strategy. Prints a JSON report.

    python scripts/eval_recall.py --dataset medrag --strategies all ragroute
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from ragroute_tpu.oracle import engine_recall, exact_oracle


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="medrag")
    parser.add_argument("--data-root", default=None)
    parser.add_argument("--strategies", nargs="+",
                        default=["all", "ragroute", "random"])
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32", "int8"])
    parser.add_argument("--num-queries", type=int, default=128)
    parser.add_argument("--impl", default="auto",
                        choices=["auto", "exact", "chunked", "pallas",
                                 "ivf"],
                        help="'ivf' measures the cluster-probed "
                             "approximate mode against the same oracle")
    parser.add_argument("--ivf-clusters", type=int, default=-1,
                        help="clusters per shard for --impl ivf "
                             "(-1 = ~4*sqrt(n) default)")
    parser.add_argument("--nprobe", type=int, default=0,
                        help="clusters probed per query (0 = C/8)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from ragroute_tpu.config import data_root, get_world
    from ragroute_tpu.engine import FederatedSearchEngine
    from ragroute_tpu.system import load_world_artifacts

    root = args.data_root or data_root()
    world = get_world(args.dataset)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
             "int8": jnp.int8}[args.dtype]
    (shard_set, params, bank, provider, _, _, threshold) = \
        load_world_artifacts(
            root, world, dtype=dtype,
            ivf_clusters=args.ivf_clusters if args.impl == "ivf" else None)
    engine = FederatedSearchEngine(shard_set, params, bank,
                                   threshold=threshold, impl=args.impl,
                                   nprobe=args.nprobe or None)

    # raw embeddings for the oracle + the precomputed query table
    wroot = os.path.join(root, world.name)
    embeddings = {
        s.name: np.load(os.path.join(wroot, s.name, "embeddings.npy"),
                        mmap_mode="r")
        for s in world.sources
    }
    qids = sorted(provider.table)[: args.num_queries]
    query_embs = {
        enc: np.stack([provider.table[q][enc] for q in qids])
        for enc in world.encoders
    }

    report = {"dataset": world.name, "k": world.k, "dtype": args.dtype,
              "impl": args.impl, "num_queries": len(qids), "recall": {}}
    if args.impl == "ivf":
        from ragroute_tpu.config import IVF_NPROBE_DIVISOR

        report["ivf"] = {
            s.name: {"C": s.ivf.n_clusters, "S": s.ivf.capacity,
                     "nprobe": args.nprobe or max(
                         1, s.ivf.n_clusters // IVF_NPROBE_DIVISOR)}
            for s in shard_set.shards}
    for strategy in args.strategies:
        out = engine.search(query_embs, strategy=strategy)
        mask = out.mask if strategy != "all" else None
        oracle = exact_oracle(world, embeddings, query_embs, world.k,
                              mask=mask)
        report["recall"][strategy] = round(
            engine_recall(world, out, oracle), 4)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
