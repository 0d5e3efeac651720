"""Probed coarse scan: grouped-GEMM + fused streaming top-k.

The hostrefine capacity tier's cost law (BENCHMARKS.md, round-4
forensics) is that the exhaustive rank-r coarse scan pays a fixed
epilogue cost PER GAIN — 30.9 ms per 1M docs at B=2048 — so the only
lever left is FEWER GAINS. This module prunes the coarse slab with
cluster probing (the reference's FAISS indexes are exhaustive flat
scans, ``/root/reference/ragroute/data_source.py:158`` — this is a
beyond-reference capability like ``impl="ivf"``):

* the coarse rows are k-means-clustered at build time into a dense
  cluster-major slab ``[C, r, S]`` (int8 codes, the same per-doc scales
  and gain biases as the flat coarse slab, permuted into slots);
* per query, a tiny ``[B, C]`` probe ranks clusters and keeps the top
  ``nprobe``;
* the (query, probed-cluster) pairs are laid out block-diagonally by
  cluster — WITHOUT a sort: probe membership is a dense ``[B, C]``
  mask, so pair positions fall out of an exclusive cumsum over the
  batch axis (a sort-based dispatch like :mod:`ops.ivf_topk`'s costs
  O(E log E) at E = B*nprobe ~ 2M pairs; the cumsum is O(B*C));
* a Pallas kernel runs each pair block as a dense ``[TE, r] x [r, S]``
  grouped GEMM against its cluster's slab, S-chunked, with a
  RANK-CAPPED top extraction fused in (see ``_grouped_topk_kernel``'s
  docstring for why the flat kernel's exact merge is the wrong
  epilogue here — its cold-start inserts measured 8x slower than the
  scan it replaces). Gains are never materialized to HBM (an
  ``ivf_topk``-style materialize-then-gather pipeline would need
  ``B * nprobe * S * 4`` bytes ≈ 45 GB at the 25M-doc bench point —
  structurally refuted);
* per-pair ``[E, kappa]`` winners are gathered per query and merged to
  the final ``[B, k']`` with :func:`ops.pallas_topk.pallas_stream_topk`.

Recall property: the probe drops clusters (nprobe/C) and the rank cap
drops within-tile concentration beyond ``ranks`` per tile; with
``nprobe == C`` and ``kappa >= kp`` the candidate set matches the flat
coarse scan's up to rank-cap concentration (gated in
tests/test_grouped_topk.py); the hostrefine exact rescore is unchanged
downstream, so the recall gates (CI + full-scale oracle) bound the
total loss.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ragroute_tpu.ops.pallas_topk import _round_up, pallas_stream_topk
from ragroute_tpu.ops.topk import NEG_INF

# rows per grouped-GEMM block. Pair runs per cluster average
# E/C ~ B * probe_fraction (hundreds at serving batch sizes). 256
# halves the grid-step count vs 128 (the 25M bench point ran ~100k
# grid steps at 128 — fixed per-step overhead was a measurable slice
# of the 2.0 s device step) at ~2x the block-padding rows.
_PAIR_ROWS = int(__import__("os").environ.get("RAGROUTE_PAIR_ROWS",
                                              "256"))


@struct.dataclass
class ClusteredCoarse:
    """Cluster-major layout of a hostrefine coarse slab."""

    centroids: jnp.ndarray   # [C, r] f32 probe targets (projected space)
    cbias: jnp.ndarray       # [C] f32 mean gain bias per cluster
    docs: jnp.ndarray        # [C, r, S] int8 codes (ragged-dot rhs form)
    bias: jnp.ndarray        # [C, S] f32 gain bias, -inf at empty slots
    scale: jnp.ndarray       # [C, S] f32 per-doc dequant factors
    perm: jnp.ndarray        # [C, S] int32 global row id per slot
    n_clusters: int = struct.field(pytree_node=False)
    capacity: int = struct.field(pytree_node=False)


def _grouped_topk_kernel(tab_ref, qd_ref, docs_ref, bias_ref, scale_ref,
                         out_g_ref, out_i_ref, run_g, run_i,
                         *, k: int, tds: int, n_s_tiles: int,
                         ranks: int):
    """Grouped GEMM + RANK-CAPPED top extraction.

    Unlike the flat kernel's exact streaming merge
    (``pallas_topk._merge_gains_tile``), each pair block here starts
    its running top list COLD — an exact per-block top-k would pay ~k
    full-width extract passes per block (the flat scan amortizes
    inserts over thousands of tiles; a pair block has only
    ``n_s_tiles``). Measured at the 25M-doc bench point that cold-start
    cost made the probed scan 8x SLOWER than the flat scan it replaces
    (round 5: 6.78 s vs 0.73 s device step with the exact merge). The
    epilogue therefore keeps at most ``ranks`` winners per (row, tile)
    via the statically-unrolled fast ladder ONLY — no stash, no
    slow-path drain, ~3*ranks wide passes per tile. Per-pair
    candidates = ranks * n_s_tiles (= the out width ``k``, sorted);
    losses require more than ``ranks`` of a row's true winners inside
    ONE ``tds``-slot tile — bounded by the recall gates
    (tests/test_streamed.py + the full-scale oracle row).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        run_g[:] = jnp.full_like(run_g, NEG_INF)
        run_i[:] = jnp.zeros_like(run_i)

    from ragroute_tpu.utils.precision import scoring_precision

    docs = docs_ref[0]                       # [r, tds] int8
    q = qd_ref[:]                            # [TE, r] bf16
    gains = jax.lax.dot_general(
        q, docs.astype(q.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=scoring_precision(docs.dtype),
        preferred_element_type=jnp.float32)  # [TE, tds]
    gains = gains * scale_ref[0] + bias_ref[0]

    te = gains.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (te, tds), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (te, k), 1)

    def insert_one(m, gid, do_ins):
        # predicated sorted insert (tie order: index-ascending — the
        # doc axis streams in slot order, FAISS parity like the flat
        # kernel)
        cur_g = run_g[:]
        cur_i = run_i[:]
        pos = jnp.sum((cur_g >= m[:, None]).astype(jnp.int32), axis=1)
        sh_g = jnp.concatenate([cur_g[:, :1], cur_g[:, :-1]], axis=1)
        sh_i = jnp.concatenate([cur_i[:, :1], cur_i[:, :-1]], axis=1)
        new_g = jnp.where(
            lane < pos[:, None], cur_g,
            jnp.where(lane == pos[:, None], m[:, None], sh_g))
        new_i = jnp.where(
            lane < pos[:, None], cur_i,
            jnp.where(lane == pos[:, None], gid[:, None], sh_i))
        run_g[:] = jnp.where(do_ins[:, None], new_g, cur_g)
        run_i[:] = jnp.where(do_ins[:, None], new_i, cur_i)

    m, excl = jnp.max(gains, axis=1), None
    for r in range(ranks):
        tie_cols = jnp.where(gains == m[:, None], col, tds)
        if excl is not None:
            tie_cols = jnp.where(excl, tds, tie_cols)
        a = jnp.min(tie_cols, axis=1)
        insert_one(m, a + j * tds, m > run_g[:, k - 1])
        if r < ranks - 1:
            hit = col == a[:, None]
            excl = hit if excl is None else (excl | hit)
            m = jnp.max(jnp.where(excl, NEG_INF, gains), axis=1)

    @pl.when(j == n_s_tiles - 1)
    def _emit():
        out_g_ref[:] = run_g[:]
        out_i_ref[:] = run_i[:]


def _grouped_pair_topk(qd_pad: jnp.ndarray, cc: ClusteredCoarse,
                       blk_cluster: jnp.ndarray, kappa: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pair-row top-``kappa`` over each row's cluster slab.

    ``qd_pad [Ep, r]`` bf16 pair rows (block-diagonal by cluster),
    ``blk_cluster [G]`` names each _PAIR_ROWS block's cluster (scalar
    prefetch). Returns ``(gains [Ep, kappa] f32, slots [Ep, kappa]
    int32)`` — slot indices within the row's cluster.
    """
    ep, r = qd_pad.shape
    c, _, s = cc.docs.shape
    g = ep // _PAIR_ROWS
    # tds 1024: at the 25M bench point S ~ 4700, so 1024 bounds the
    # slab padding at <=21% (2048 padded 30%); per-gain ladder cost is
    # tds-independent (passes scale with the tile area)
    tds = min(_round_up(s, 128), 1024)
    s_pad = _round_up(s, tds)
    n_s = s_pad // tds
    ranks = max(1, -(-int(kappa) // n_s))
    kw = ranks * n_s                    # out width (sorted run length)
    docs, bias, scale = cc.docs, cc.bias, cc.scale
    if s_pad != s:
        docs = jnp.pad(docs, ((0, 0), (0, 0), (0, s_pad - s)))
        bias = jnp.pad(bias, ((0, 0), (0, s_pad - s)),
                       constant_values=NEG_INF)
        scale = jnp.pad(scale, ((0, 0), (0, s_pad - s)),
                        constant_values=1e-12)

    kernel = functools.partial(_grouped_topk_kernel, k=kw, tds=tds,
                               n_s_tiles=n_s, ranks=ranks)
    out_g, out_i = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g, n_s),
            in_specs=[
                pl.BlockSpec((_PAIR_ROWS, r), lambda i, j, tab: (i, 0)),
                pl.BlockSpec((1, r, tds),
                             lambda i, j, tab: (tab[i], 0, j)),
                pl.BlockSpec((1, 1, tds),
                             lambda i, j, tab: (tab[i], 0, j)),
                pl.BlockSpec((1, 1, tds),
                             lambda i, j, tab: (tab[i], 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((_PAIR_ROWS, kw),
                             lambda i, j, tab: (i, 0)),
                pl.BlockSpec((_PAIR_ROWS, kw),
                             lambda i, j, tab: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((_PAIR_ROWS, kw), jnp.float32),
                pltpu.VMEM((_PAIR_ROWS, kw), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ep, kw), jnp.float32),
            jax.ShapeDtypeStruct((ep, kw), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ep * s_pad * r,
            bytes_accessed=(ep * r * 2 + g * s_pad * (r + 8)
                            + ep * kw * 8),
            transcendentals=0),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(blk_cluster, qd_pad, docs, bias[:, None, :], scale[:, None, :])
    return out_g, out_i


@functools.partial(jax.jit, static_argnames=("kp", "nprobe", "kappa"))
def coarse_probe_topk(
    qt: jnp.ndarray,
    cc: ClusteredCoarse,
    kp: int,
    *,
    nprobe: int,
    kappa: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Probed top-``kp`` over a clustered coarse slab.

    Args:
      qt: ``[B, r]`` f32 projected queries (the same rows the flat
        coarse scan feeds ``shard_topk``).
      kp: candidate depth per query (the hostrefine k').
      nprobe: clusters probed per query.
      kappa: target per-(query, cluster) winner cap, realized as
        ``ceil(kappa / n_tiles)`` ranks per slab tile (see the kernel
        docstring); losses require winner concentration beyond the cap
        inside one cluster tile.

    Returns ``(keys [B, kp] f32 gain form, ids [B, kp] int32 global row
    ids, -1 where invalid)`` — same contract as the flat coarse scan's
    ``shard_topk`` output fed through the gid map.
    """
    bsz, r = qt.shape
    c, _, s = cc.docs.shape
    p = int(min(max(nprobe, 1), c))
    kappa = int(min(kappa, s, kp))

    # 1. probe: gain-form cluster ranking. Deep p wants XLA's sort-based
    # top_k (insert ladders scale with k — ops/ivf_topk tuning notes).
    cg = (qt @ cc.centroids.T).astype(jnp.float32) + cc.cbias[None, :]
    _, probe = jax.lax.top_k(cg, p)
    probe = probe.astype(jnp.int32)                       # [B, P]

    # 2. sort-free block-diagonal dispatch: probe membership as a dense
    # [B, C] mask; position of pair (b, c) within cluster c's run is an
    # exclusive cumsum over the batch axis.
    b_iota = jnp.arange(bsz, dtype=jnp.int32)
    mask = jnp.zeros((bsz, c), jnp.int32).at[
        b_iota[:, None], probe].set(1)
    counts = mask.sum(axis=0)                             # [C]
    pos = jnp.cumsum(mask, axis=0) - mask                 # [B, C] excl.
    nblk = -(-counts // _PAIR_ROWS)                       # blocks/cluster
    blk_hi = jnp.cumsum(nblk).astype(jnp.int32)           # [C] inclusive
    base_rows = (blk_hi - nblk) * _PAIR_ROWS              # [C]
    # static bound: sum(ceil(count/TE)) <= E/TE + C
    n_blocks = (bsz * p) // _PAIR_ROWS + min(bsz * p, c)
    ep = n_blocks * _PAIR_ROWS
    pair_pos = (base_rows[probe]
                + jnp.take_along_axis(pos, probe, axis=1))  # [B, P]
    pair_q = jnp.zeros((ep,), jnp.int32).at[
        pair_pos.reshape(-1)].set(jnp.repeat(b_iota, p))
    blk_cluster = jnp.clip(
        jnp.searchsorted(blk_hi, jnp.arange(n_blocks, dtype=jnp.int32),
                         side="right"), 0, c - 1).astype(jnp.int32)

    # 3. fused grouped GEMM + rank-capped per-row top extraction
    qd_pad = qt.astype(jnp.bfloat16)[pair_q]              # [Ep, r]
    og, oi = _grouped_pair_topk(qd_pad, cc, blk_cluster, kappa)
    kw = og.shape[1]                 # realized per-pair width

    # 4. collect: each query's P pair rows -> [B, P*kw] -> top-kp
    row_of = pair_pos.reshape(-1)
    pg = og[row_of].reshape(bsz, p * kw)
    pi = oi[row_of].reshape(bsz, p * kw)
    kp_eff = min(kp, p * kw)
    keys, posk = pallas_stream_topk(pg, kp_eff)
    slot = jnp.take_along_axis(pi, posk, axis=1)          # [B, kp]
    cl = jnp.take_along_axis(probe, posk // kw, axis=1)
    gid = cc.perm[cl, slot]
    valid = keys > NEG_INF
    gid = jnp.where(valid, gid, -1)
    if kp_eff < kp:
        keys = jnp.pad(keys, ((0, 0), (0, kp - kp_eff)),
                       constant_values=NEG_INF)
        gid = jnp.pad(gid, ((0, 0), (0, kp - kp_eff)),
                      constant_values=-1)
    return keys, gid


def cluster_coarse_slab(
    codes: np.ndarray,
    scales: np.ndarray,
    bias: np.ndarray,
    row0: int,
    *,
    n_clusters: Optional[int] = None,
    capacity_slack: float = 1.1,
    kmeans_iters: int = 10,
    seed: int = 0,
) -> ClusteredCoarse:
    """Build the cluster-major layout from an existing coarse slab.

    ``codes [n, r]`` int8 / ``scales [n]`` / ``bias [n]`` are the flat
    coarse arrays (:meth:`index.streamed.StreamedShardSet._build_coarse`
    output, host copies); ``row0`` is the global row id of codes[0].
    k-means runs on DEQUANTIZED rows (quantization noise is far below
    cluster geometry) with the device Lloyd iterations from
    :mod:`index.ivf`; codes/scales/biases are then permuted into slots
    unchanged, so a full probe scores the exact same values as the flat
    coarse scan.
    """
    from ragroute_tpu.index.ivf import (_balanced_assign, _kmeans_device,
                                        _top_r_choices, _upload_chunks,
                                        default_n_clusters)

    n, r = codes.shape
    deq = codes.astype(np.float32) * scales[:, None].astype(np.float32)
    c = int(max(1, min(n_clusters or default_n_clusters(n), n)))
    cap = max(-(-n // c), int(-(-n // c) * capacity_slack))
    cap = max(8, -(-cap // 8) * 8)

    if c == 1:
        cent = deq.mean(axis=0, keepdims=True).astype(np.float32)
        assign = np.zeros(n, np.int32)
    else:
        xc, wc, _ = _upload_chunks(deq, chunk=8192)
        cent = _kmeans_device(xc, wc, deq, c, kmeans_iters, seed)
        choices = _top_r_choices(xc, n, cent, min(8, c))
        del xc, wc
        assign = _balanced_assign(choices, c, cap)

    order = np.argsort(assign, kind="stable")
    cl_sorted = assign[order]
    docs = np.zeros((c, r, cap), np.int8)
    s_slab = np.full((c, cap), 1e-12, np.float32)
    b_slab = np.full((c, cap), -np.inf, np.float32)
    perm = np.full((c, cap), -1, np.int32)
    first = np.searchsorted(cl_sorted, np.arange(c), "left")
    last = np.searchsorted(cl_sorted, np.arange(c), "right")
    for ci in range(c):
        rows = order[first[ci]:last[ci]]
        m = rows.size
        docs[ci, :, :m] = codes[rows].T
        s_slab[ci, :m] = scales[rows]
        b_slab[ci, :m] = bias[rows]
        perm[ci, :m] = rows + row0
    # probe bias: per-cluster mean of real gain biases (l2 worlds carry
    # -|d|^2 here; dot/cos carry 0) so probe ranking sees the same
    # systematic offset the scan will
    finite = np.where(np.isfinite(b_slab), b_slab, 0.0)
    cnt = np.isfinite(b_slab).sum(axis=1).clip(min=1)
    cbias = (finite.sum(axis=1) / cnt).astype(np.float32)
    return ClusteredCoarse(
        centroids=jnp.asarray(cent, jnp.float32),
        cbias=jnp.asarray(cbias),
        docs=jnp.asarray(docs),
        bias=jnp.asarray(b_slab),
        scale=jnp.asarray(s_slab),
        perm=jnp.asarray(perm),
        n_clusters=c,
        capacity=cap,
    )
