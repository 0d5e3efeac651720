"""Microbenchmark for the fused matmul+top-k kernel at the headline point.

Times ``pallas_topk`` on [B, d] queries vs [N, d] docs inside one jitted
``lax.scan`` over R DISTINCT query batches (single dispatch — the remote
tunnel costs ~27 ms/dispatch), reporting us/grid-step and effective TFLOPS
the same way as the tuning notes in ``ops/pallas_topk.py``.

Usage:
    python scripts/bench_kernel.py [--docs 734003] [--batch 1024] [--k 32]
        [--dim 768] [--dtype bfloat16] [--mode dot] [--reps 8]
        [--matmul-floor]   # time the bare matmul at identical tiling
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=734003)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "int8"])
    ap.add_argument("--mode", default="dot", choices=["dot", "cos", "l2"])
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--matmul-floor", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_ragroute"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from ragroute_tpu.ops.pallas_topk import _pick_tiles, _round_up, pallas_topk

    rng = np.random.default_rng(0)
    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
          "int8": jnp.int8}[args.dtype]
    docs_np = rng.standard_normal((args.docs, args.dim)).astype(np.float32)
    scale = None
    if args.dtype == "int8":
        s = np.abs(docs_np).max(axis=1, keepdims=True) / 127.0
        docs = jnp.asarray(np.round(docs_np / s).astype(np.int8))
        scale = jnp.asarray(s[:, 0].astype(np.float32))
    else:
        docs = jnp.asarray(docs_np, dtype=dt)
    qs = jnp.asarray(
        rng.standard_normal((args.reps, args.batch, args.dim)),
        dtype=jnp.float32)

    tq, td = _pick_tiles(_round_up(args.batch, 8), args.dim,
                         jnp.dtype(dt).itemsize)
    n_i = _round_up(args.batch, tq) // tq
    n_j = _round_up(max(args.docs, td), td) // td
    steps = n_i * n_j
    print(f"tiles: tq={tq} td={td} grid=({n_i},{n_j}) steps={steps} "
          f"backend={jax.default_backend()}", file=sys.stderr)

    # docs/scale MUST be jit arguments, not closure captures: captured
    # device arrays become HLO constants, and the remote-compile request
    # then ships the entire index (413 over ~hundreds of MB).
    if args.matmul_floor:
        # bare matmul at identical tiling via a k=1 max (XLA reduces over
        # the same [B, N] product without materializing it)
        @jax.jit
        def run(qs, docs, scale):
            def body(c, q):
                qq = q.astype(docs.dtype) if args.dtype != "int8" \
                    else q.astype(jnp.bfloat16)
                dd = docs.astype(jnp.bfloat16) if args.dtype == "int8" \
                    else docs
                g = jax.lax.dot_general(
                    qq, dd, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return c + g.max(axis=1).sum(), None
            out, _ = jax.lax.scan(body, jnp.float32(0), qs)
            return out
    else:
        @jax.jit
        def run(qs, docs, scale):
            def body(c, q):
                s, i = pallas_topk(q, docs, args.k, mode=args.mode,
                                   valid_docs=args.docs, scale=scale)
                return c + s.sum() + i.sum(), None
            out, _ = jax.lax.scan(body, jnp.float32(0), qs)
            return out

    t0 = time.time()
    float(run(qs, docs, scale))
    print(f"compiled in {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    float(run(qs, docs, scale))
    el = time.time() - t0

    us_per_step = el * 1e6 / (args.reps * steps)
    flops = 2.0 * args.batch * args.docs * args.dim * args.reps
    print(f"{el * 1e3 / args.reps:.3f} ms/call  {us_per_step:.2f} us/step  "
          f"{flops / el / 1e12:.1f} TFLOPS  "
          f"({args.reps * args.batch / el:.0f} q/s)")


if __name__ == "__main__":
    main()
