"""Cluster-probed approximate top-k as a grouped-GEMM (MoE) program.

Beyond-reference capability (the reference scans its FAISS flat indexes
exhaustively, ``ragroute/data_source.py:158``): probe only the ``nprobe``
nearest balanced clusters per query, for ~``C/nprobe``-fold fewer scoring
FLOPs at a measured recall cost.

The TPU framing: queries are tokens and clusters are experts, so probing
is MoE routing and scoring is the MoE expert matmul. The (query, probed
cluster) pairs are stably sorted by cluster and scored with
``jax.lax.ragged_dot`` — the grouped-GEMM primitive XLA provides for
MoE — against the dense ``[C, d, S]`` cluster slabs:

1. **Probe** — a tiny ``[B, C]`` matmul against the centroids (gain form,
   so dot/cos/l2 all reduce to top-``nprobe``).
2. **Sort** — flatten the ``[B, nprobe]`` probe lists, stable-sort by
   cluster id; per-cluster pair counts become ragged_dot group sizes.
   No per-cluster capacity and NO dropped pairs: an earlier design
   dispatched into fixed ``[C, Qc]`` query slots (classic capacity-factor
   MoE), but real query streams concentrate on hot topics and the
   overflow drops crushed recall (0.45 -> 0.87 at nprobe=16/512 on the
   topical synthetic corpus just by lifting the caps).
3. **Score** — ``ragged_dot`` computes each pair row against its own
   cluster slab (bias/dequant epilogues gathered per row).
4. **Collect** — per-row ``top_k`` over the slab, scatter rows back to
   ``[B, nprobe, k]``, final ``top_k``, and remap winners through the
   cluster permutation to original local doc ids.

Exactness property: with ``nprobe == C`` every query scores every
document, so results match the exact path (gated by
``tests/test_ivf.py``); smaller ``nprobe`` trades recall for speed.

Tuning history (v5e, 734k-doc shard, B=1024, k=32, nprobe=128, bf16,
C=4096; flat fused kernel on the same data: 20.5 ms/batch):
  * all-XLA pipeline (top_k probe + ragged_dot + per-slab top_k +
    scatter collect): 26.2 ms — ragged_dot alone ~10 ms (~30x its
    useful FLOPs), the sort-based top_ks ~10 ms;
  * + streaming-merge collect (pallas_stream_topk over the gathered
    [B, P*S] gains) and Pallas probe: 22.0 ms;
  * + grouped-GEMM scoring kernel (this design): 19.3 ms; lane-aligned
    S (capped at 15% padding): 18.3 ms — faster than exhaustive at
    every batch size (B=8: 2.8 vs 8.2 ms);
  * probe via the Pallas kernel at P=128: 6.1 ms vs XLA sort 4.5 ms
    (insert ladders scale with k) — hence the p<=64 heuristic;
  * scatter-free dispatch bookkeeping (argsort inverse + searchsorted +
    per-row table gathers): +15 ms — XLA TPU 1-D gathers lower far
    worse than the two scatters they replaced; REVERTED.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ragroute_tpu.index.ivf import IVFData
from ragroute_tpu.ops.topk import NEG_INF, _prepare_queries, _validate, \
    gain_to_natural

# rows per grouped-GEMM block: pairs of each cluster are padded up to a
# multiple of this, so every grid step is one dense [TE, d] x [d, S]
# matmul against a single cluster slab (64 rows = half MXU row
# utilization, but halving the per-cluster padding vs 128 wins at the
# measured ~32 pairs/cluster mean load)
_GROUP_ROWS = 64


def _grouped_kernel(tab_ref, qd_ref, docs_ref, bias_ref, *rest, scaled,
                    packed4):
    scale_ref = rest[0] if scaled else None
    out_ref = rest[-1]
    docs = docs_ref[0]
    if packed4:
        # int4 slab: [d/2, S] bytes, two codes each (byte row j = dim j
        # low nibble, dim j + d/2 high — index.shard._pack_int4, same
        # layout the flat kernel unpacks). Two arithmetic shifts +
        # sublane concat on the VPU restore natural dim order; dequant
        # rides the per-slot scale epilogue like int8.
        x = docs.astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(x, 28), 28)  # sign-extended
        hi = jnp.right_shift(x, 4)
        docs = jnp.concatenate([lo, hi], axis=0).astype(qd_ref.dtype)
    elif docs.dtype == jnp.int8:
        docs = docs.astype(qd_ref.dtype)
    from ragroute_tpu.utils.precision import scoring_precision

    gains = jax.lax.dot_general(
        qd_ref[:], docs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=scoring_precision(docs.dtype),
        preferred_element_type=jnp.float32)
    if scaled:
        gains = gains * scale_ref[0]
    out_ref[:] = gains + bias_ref[0]


def _grouped_gains(qd_pad, docs, bias, scale, blk_cluster, packed4=False):
    """Dense gains for cluster-aligned pair blocks.

    ``qd_pad [Ep, d]`` holds the sorted (query, probe) pairs padded so
    each cluster's rows fill whole ``_GROUP_ROWS`` blocks;
    ``blk_cluster [G]`` (scalar-prefetched) names each block's cluster,
    so the block index maps stream exactly the probed slabs HBM->VMEM.
    This replaces ``jax.lax.ragged_dot``, whose TPU lowering measured
    ~30x its useful FLOPs at the bench point (see BENCHMARKS.md).
    """
    ep, d = qd_pad.shape
    c, ds, s = docs.shape                  # ds = d//2 when int4-packed
    g = ep // _GROUP_ROWS
    scaled = scale is not None

    # bias/scale as [C, 1, S]: a (1, 1, S) block satisfies Mosaic's
    # last-two-dims tiling rule (sublane dim equals the array dim)
    in_specs = [
        pl.BlockSpec((_GROUP_ROWS, d), lambda i, tab: (i, 0)),
        pl.BlockSpec((1, ds, s), lambda i, tab: (tab[i], 0, 0)),
        pl.BlockSpec((1, 1, s), lambda i, tab: (tab[i], 0, 0)),
    ]
    args = [qd_pad, docs, bias[:, None, :]]
    if scaled:
        in_specs.append(
            pl.BlockSpec((1, 1, s), lambda i, tab: (tab[i], 0, 0)))
        args.append(scale[:, None, :])
    dbytes = docs.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_grouped_kernel, scaled=scaled, packed4=packed4),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((_GROUP_ROWS, s), lambda i, tab: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((ep, s), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * ep * s * d,
            bytes_accessed=ep * d * 2 + g * s * (ds * dbytes + 4)
            + ep * s * 4,
            transcendentals=0),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(blk_cluster, *args)


@functools.partial(jax.jit, static_argnames=("k", "mode", "nprobe"))
def ivf_topk(
    queries: jnp.ndarray,
    ivf: IVFData,
    k: int,
    *,
    mode: str = "dot",
    nprobe: int = 8,
    center: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate top-k over a balanced-IVF shard.

    Returns ``(scores [B, k], indices [B, k])`` in natural score form with
    ORIGINAL local doc indices (same contract as
    :func:`ragroute_tpu.ops.topk.shard_topk`). Entries beyond the number
    of reachable docs come back with -inf gain (+inf distance for l2).
    """
    _validate(mode)
    dot_restore = None
    if center is not None:
        # l2: shift queries (distance invariant); dot: score ordering is
        # invariant under doc-side centering, restore the per-query
        # constant q.mu on the way out (see ops.topk.shard_topk)
        if mode == "l2":
            queries = queries.astype(jnp.float32) - center
        elif mode == "dot":
            dot_restore = queries.astype(jnp.float32) @ center
    bsz = queries.shape[0]
    c, _, s = ivf.docs.shape      # middle axis is d//2 when int4-packed
    k1 = min(k, s)
    p = int(min(max(nprobe, -(-k // k1)), c))

    q = _prepare_queries(queries, mode)                    # [B, d] f32

    # 1. probe: nearest clusters in gain form. For small nprobe the flat
    # Pallas kernel against the centroid bank wins (no [B, C]
    # materialization); for deep probes the streaming insert ladder costs
    # more than XLA's sort (measured at B=1024, C=4096: Pallas 6.1 ms vs
    # sort 4.5 ms at P=128, Pallas faster below ~64).
    from ragroute_tpu.ops.pallas_topk import pallas_topk

    if p <= 64:
        _, probe = pallas_topk(queries, ivf.centroids, p, mode=mode)
    else:
        cg = q @ ivf.centroids.T + ivf.cbias[None, :]
        _, probe = jax.lax.top_k(cg, p)
        probe = probe.astype(jnp.int32)

    # 2. sort pairs by cluster; pad each cluster's run of rows up to
    # whole _GROUP_ROWS blocks (cluster-aligned block-diagonal layout).
    # The two scatters (.at[].set) ARE the fast formulation here: a
    # scatter-free rewrite via argsort(order) + searchsorted + [Ep]-sized
    # table gathers measured +15 ms/batch at B=1024 (XLA TPU lowers those
    # 1-D gathers far worse than these scatters).
    e = bsz * p
    te = _GROUP_ROWS
    flat_c = probe.reshape(e)
    order = jnp.argsort(flat_c, stable=True)
    sc = flat_c[order]                                     # [E] sorted
    gs_counts = jnp.zeros((c,), jnp.int32).at[flat_c].add(1)
    pair_q = (order // p).astype(jnp.int32)                # query per row
    iota = jnp.arange(e, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sc[1:] != sc[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, iota, 0))
    pos_in = iota - run_start                              # rank in cluster
    nblk = -(-gs_counts // te)                             # blocks/cluster
    blk_hi = jnp.cumsum(nblk).astype(jnp.int32)            # [C] inclusive
    base_rows = (blk_hi - nblk) * te                       # padded starts
    pad_pos = base_rows[sc] + pos_in                       # [E] padded row
    n_blocks = e // te + min(e, c)  # static bound on sum(ceil(count/te))
    ep = n_blocks * te
    blk_cluster = jnp.clip(
        jnp.searchsorted(blk_hi, jnp.arange(n_blocks, dtype=jnp.int32),
                         side="right"), 0, c - 1).astype(jnp.int32)

    # 3. grouped GEMM (Pallas): each block is one dense matmul against
    # its cluster's slab; padding rows recompute some query against the
    # block's slab and are never collected (step 4 gathers only pad_pos)
    docs = ivf.docs
    qdtype = jnp.bfloat16 if docs.dtype == jnp.int8 else docs.dtype
    pair_q_pad = jnp.zeros((ep,), jnp.int32).at[pad_pos].set(pair_q)
    qd_pad = q.astype(qdtype)[pair_q_pad]                  # [Ep, d]
    gains = _grouped_gains(qd_pad, docs, ivf.bias, ivf.scale, blk_cluster,
                           packed4=ivf.packed4)

    # 4. collect: gather each query's probe rows into one [B, P*S] gain
    # matrix and run the streaming Pallas top-k over it — one fused pass
    # replaces XLA's sort-based per-slab top_k + scatter + final top_k
    # (measured ~10 ms/batch of the ~26 ms XLA pipeline at B=1024).
    from ragroute_tpu.ops.pallas_topk import pallas_stream_topk

    row_of = jnp.zeros((e,), jnp.int32).at[order].set(pad_pos)
    gq = gains[row_of.reshape(bsz, p)]                     # [B, P, S]
    gf, pos = pallas_stream_topk(gq.reshape(bsz, p * s), k)
    pp, slot = pos // s, pos % s
    cl = jnp.take_along_axis(probe, pp, axis=1)            # [B, k]
    idx = ivf.perm.reshape(-1)[cl * s + slot]
    idx = jnp.where(gf > NEG_INF, idx, 0)
    out_scores = gain_to_natural(gf, queries, mode)
    if dot_restore is not None:
        out_scores = jnp.where(gf > NEG_INF,
                               out_scores + dot_restore[:, None],
                               out_scores)
    return out_scores, idx
