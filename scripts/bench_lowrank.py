"""Microbenchmark for the two-stage low-rank coarse scan + exact refine.

Times the three device pieces of ``impl="lowrank"`` separately at the
headline bench point, each inside one jitted ``lax.scan`` over R DISTINCT
query batches (single dispatch — the remote tunnel costs ~27 ms/dispatch):

1. coarse: fused matmul+top-k' over the rank-r slab ``[N, r]``;
2. refine: row gather ``docs[idx]`` of the k' candidates from the full
   ``[N, d]`` slab + exact rescore (batched dot) + final top-k;
3. full:   the production exhaustive kernel over ``[N, d]`` (baseline).

The decision rule for the production dispatch comes from these numbers:
lowrank wins when coarse(r) + refine(k') < full(d).

Usage:
    python scripts/bench_lowrank.py [--docs 1048576] [--batch 2048]
        [--rank 128] [--krefine 128] [--k 32] [--dim 768]
        [--dtype bfloat16] [--reps 8] [--stage all|coarse|refine|full]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1048576)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--krefine", type=int, default=128)
    ap.add_argument("--rank", type=int, default=128)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "int8"])
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--stage", default="all",
                    choices=["all", "coarse", "refine", "full", "gather",
                             "rescore"])
    ap.add_argument("--clustered", action="store_true",
                    help="bench-world-like docs/queries (latent cluster "
                    "mixture) instead of random — the kernel's tile-skip "
                    "fires on this distribution, random is its worst case")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_ragroute"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from ragroute_tpu.ops.pallas_topk import pallas_topk

    rng = np.random.default_rng(0)
    dt = {"bfloat16": jnp.bfloat16, "int8": jnp.int8}[args.dtype]
    n, d, r, b, kr = args.docs, args.dim, args.rank, args.batch, args.krefine

    if args.clustered:
        # bench-world shape: rank-64 latent cluster mixture (see
        # index/synthetic.py) — docs concentrate, queries sit near a few
        # cluster centers, and the streaming kernel's tile-skip fires
        lat = 64
        proj = rng.standard_normal((lat, d)).astype(np.float32) / 8.0
        centers = 2.0 * rng.standard_normal((4, lat)).astype(np.float32)
        zc = centers[rng.integers(0, 4, n)]
        docs_f = (zc + 0.35 * rng.standard_normal((n, lat)).astype(
            np.float32)) @ proj
        zq = centers[rng.integers(0, 4, args.reps * b)]
        qs_f = (zq + 0.18 * rng.standard_normal(
            (args.reps * b, lat)).astype(np.float32)) @ proj
        # coarse slab: top-r right-singular basis of the docs
        sub = docs_f[:: max(1, n // 131072)]
        _, v = np.linalg.eigh((sub.T @ sub).astype(np.float64))
        basis = np.ascontiguousarray(v[:, ::-1][:, :r]).astype(np.float32)
        docs_lr = jnp.asarray(docs_f @ basis, dtype=jnp.bfloat16)
        qs_lr = jnp.asarray((qs_f @ basis).reshape(args.reps, b, r),
                            dtype=jnp.float32)
        qs = jnp.asarray(qs_f.reshape(args.reps, b, d), dtype=jnp.float32)
    else:
        docs_f = rng.standard_normal((n, d)).astype(np.float32)
        qs = jnp.asarray(rng.standard_normal((args.reps, b, d)),
                         dtype=jnp.float32)
        qs_lr = jnp.asarray(rng.standard_normal((args.reps, b, r)),
                            dtype=jnp.float32)
        docs_lr = jnp.asarray(
            rng.standard_normal((n, r)), dtype=jnp.bfloat16)
    scale = None
    if args.dtype == "int8":
        s = np.abs(docs_f).max(axis=1, keepdims=True) / 127.0
        docs = jnp.asarray(np.round(docs_f / s).astype(np.int8))
        scale = jnp.asarray(s[:, 0].astype(np.float32))
    else:
        docs = jnp.asarray(docs_f, dtype=dt)
    del docs_f
    # plausible candidate indices: clustered but distinct per query
    idxs = np.sort(rng.integers(0, n, (args.reps, b, kr)), axis=-1)
    idxs = jnp.asarray(idxs.astype(np.int32))

    def timed(name, fn, *xs, flops=None):
        t0 = time.time()
        float(fn(*xs))
        comp = time.time() - t0
        t0 = time.time()
        float(fn(*xs))
        el = time.time() - t0
        per = el * 1e3 / args.reps
        msg = f"{name}: {per:.3f} ms/call ({args.reps * b / el:.0f} q/s"
        if flops:
            msg += f", {flops * args.reps / el / 1e12:.1f} TFLOPS"
        print(msg + f")  [compile {comp:.1f}s]")
        return per

    res = {}
    if args.stage in ("all", "coarse"):
        @jax.jit
        def run_coarse(qs_lr, docs_lr):
            def body(c, q):
                s, i = pallas_topk(q, docs_lr, kr, mode="dot", valid_docs=n)
                return c + s.sum() + i.sum(), None
            out, _ = jax.lax.scan(body, jnp.float32(0), qs_lr)
            return out
        res["coarse"] = timed("coarse", run_coarse, qs_lr, docs_lr,
                              flops=2.0 * b * n * r)

    if args.stage in ("all", "refine"):
        @jax.jit
        def run_refine(qs, docs, scale, idxs):
            def body(c, qi):
                q, idx = qi
                rows = jnp.take(docs, idx.reshape(-1), axis=0,
                                unique_indices=False, indices_are_sorted=False
                                ).reshape(b, kr, d)
                rows = rows.astype(jnp.float32)
                if scale is not None:
                    srow = jnp.take(scale, idx.reshape(-1), axis=0
                                    ).reshape(b, kr)
                    g = jnp.einsum("bd,bkd->bk", q, rows,
                                   preferred_element_type=jnp.float32)
                    g = g * srow
                else:
                    g = jnp.einsum("bd,bkd->bk", q, rows,
                                   preferred_element_type=jnp.float32)
                s, pos = jax.lax.top_k(g, args.k)
                i = jnp.take_along_axis(idx, pos, axis=-1)
                return c + s.sum() + i.sum(), None
            out, _ = jax.lax.scan(body, jnp.float32(0), (qs, idxs))
            return out
        res["refine"] = timed("refine", run_refine, qs, docs, scale, idxs,
                              flops=2.0 * b * kr * d)

    if args.stage == "gather":
        @jax.jit
        def run_gather(docs, idxs):
            def body(c, idx):
                rows = jnp.take(docs, idx.reshape(-1), axis=0)
                return c + rows.astype(jnp.float32).sum(), None
            out, _ = jax.lax.scan(body, jnp.float32(0), idxs)
            return out
        timed("gather", run_gather, docs, idxs)

    if args.stage == "rescore":
        rows_pre = jnp.asarray(
            rng.standard_normal((args.reps, b, kr, d)), dtype=jnp.bfloat16)

        @jax.jit
        def run_rescore(qs, rows_pre):
            def body(c, qr):
                q, rows = qr
                g = jnp.einsum("bd,bkd->bk", q, rows.astype(jnp.float32),
                               preferred_element_type=jnp.float32)
                s, pos = jax.lax.top_k(g, args.k)
                return c + s.sum() + pos.sum(), None
            out, _ = jax.lax.scan(body, jnp.float32(0), (qs, rows_pre))
            return out
        timed("rescore", run_rescore, qs, rows_pre)

    if args.stage in ("all", "full"):
        @jax.jit
        def run_full(qs, docs, scale):
            def body(c, q):
                s, i = pallas_topk(q, docs, args.k, mode="dot",
                                   valid_docs=n, scale=scale)
                return c + s.sum() + i.sum(), None
            out, _ = jax.lax.scan(body, jnp.float32(0), qs)
            return out
        res["full"] = timed("full", run_full, qs, docs, scale,
                            flops=2.0 * b * n * d)

    if len(res) == 3:
        two = res["coarse"] + res["refine"]
        print(f"two-stage total {two:.3f} ms vs full {res['full']:.3f} ms "
              f"-> {res['full'] / two:.2f}x")


if __name__ == "__main__":
    main()
