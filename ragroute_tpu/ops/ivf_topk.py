"""Cluster-probed approximate top-k as an MoE-style dispatch program.

Beyond-reference capability (the reference scans its FAISS flat indexes
exhaustively, ``ragroute/data_source.py:158``): probe only the ``nprobe``
nearest balanced clusters per query, for ~``C/nprobe``-fold fewer scoring
FLOPs at a measured recall cost.

The TPU framing: queries are tokens, clusters are experts, ``nprobe`` is
the router top-k, and the per-cluster query slots are expert capacity.
One static-shape XLA program does:

1. **Probe** — a tiny ``[B, C]`` matmul against the centroids (gain form,
   so dot/cos/l2 all reduce to top-``nprobe``).
2. **Dispatch** — invert the ``[B, nprobe]`` probe lists into per-cluster
   query slots ``[C, Qc]`` with static capacity ``Qc`` (stable sort of
   the flattened pairs + a cummax run-start trick gives each pair its
   slot; pairs overflowing a cluster's capacity are dropped, counted,
   and bounded by the ``capacity_factor``).
3. **Score** — one batched ``einsum('cqd,csd->cqs')`` on the MXU over the
   dense ``[C, S, d]`` cluster slabs (bias/dequant fused as epilogues).
4. **Collect** — per-slot ``top_k`` over the slab, gather each query's
   ``nprobe`` candidate lists back, final ``top_k``, and remap winners
   through the cluster permutation to original local doc ids.

Exactness property: with ``nprobe == C`` and enough capacity every
query scores every document, so results match the exact path (gated by
``tests/test_ivf.py``); smaller ``nprobe`` trades recall for speed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ragroute_tpu.index.ivf import IVFData
from ragroute_tpu.ops.topk import NEG_INF, _prepare_queries, _validate, \
    gain_to_natural


def dispatch_capacity(bsz: int, nprobe: int, n_clusters: int,
                      capacity_factor: float = 2.0) -> int:
    """Static per-cluster query-slot count: mean load x capacity_factor."""
    mean = max(1, -(-bsz * nprobe // n_clusters))
    qc = int(mean * capacity_factor)
    return max(8, -(-qc // 8) * 8)


@functools.partial(
    jax.jit, static_argnames=("k", "mode", "nprobe", "capacity_factor"))
def ivf_topk(
    queries: jnp.ndarray,
    ivf: IVFData,
    k: int,
    *,
    mode: str = "dot",
    nprobe: int = 8,
    capacity_factor: float = 2.0,
    center: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate top-k over a balanced-IVF shard.

    Returns ``(scores [B, k], indices [B, k])`` in natural score form with
    ORIGINAL local doc indices (same contract as
    :func:`ragroute_tpu.ops.topk.shard_topk`). Entries beyond the number
    of reachable docs come back with -inf gain (nan natural score for l2).
    """
    _validate(mode)
    if center is not None:
        queries = queries.astype(jnp.float32) - center
    bsz = queries.shape[0]
    c, s, d = ivf.docs.shape
    p = int(min(max(nprobe, -(-k // min(k, s))), c))
    qc = dispatch_capacity(bsz, p, c, capacity_factor)
    qc = min(qc, bsz)
    k1 = min(k, s)

    q = _prepare_queries(queries, mode)                    # [B, d] f32

    # 1. probe: nearest clusters in gain form
    cg = q @ ivf.centroids.T + ivf.cbias[None, :]          # [B, C]
    _, probe = jax.lax.top_k(cg, p)                        # [B, P] int32

    # 2. dispatch: per-cluster query slots with static capacity
    e = bsz * p
    flat_c = probe.reshape(e)
    order = jnp.argsort(flat_c, stable=True)               # pairs by cluster
    sc = flat_c[order]
    iota = jnp.arange(e, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sc[1:] != sc[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, iota, 0))
    pos = iota - run_start                                 # slot in cluster
    ok = pos < qc
    pair_q = (order // p).astype(jnp.int32)                # query of pair
    disp_q = jnp.zeros((c, qc), jnp.int32).at[
        sc, jnp.where(ok, pos, qc)].set(pair_q, mode="drop")
    # map back to original pair order: slot + validity per (b, probe)
    pair_slot = jnp.zeros((e,), jnp.int32).at[order].set(pos).reshape(bsz, p)
    pair_ok = jnp.zeros((e,), bool).at[order].set(ok).reshape(bsz, p)

    # 3. score: one batched matmul over the probed slabs
    docs = ivf.docs
    if docs.dtype == jnp.int8:
        docs = docs.astype(jnp.bfloat16)
    qd = q.astype(docs.dtype)[disp_q]                      # [C, Qc, d]
    from ragroute_tpu.utils.precision import scoring_precision

    gains = jnp.einsum("cqd,csd->cqs", qd, docs,
                       precision=scoring_precision(docs.dtype),
                       preferred_element_type=jnp.float32)
    if ivf.scale is not None:
        gains = gains * ivf.scale[:, None, :]
    gains = gains + ivf.bias[:, None, :]                   # -inf pads

    # 4. collect: per-slot candidates -> per-query candidates -> top-k
    g1, s1 = jax.lax.top_k(gains, k1)                      # [C, Qc, k1]
    pg = g1[probe, pair_slot]                              # [B, P, k1]
    pg = jnp.where(pair_ok[:, :, None], pg, NEG_INF)
    ps = s1[probe, pair_slot]                              # slab slot ids
    gf, posf = jax.lax.top_k(pg.reshape(bsz, -1), k)
    cand_cluster = jnp.broadcast_to(
        probe[:, :, None], (bsz, p, k1)).reshape(bsz, -1)
    cl = jnp.take_along_axis(cand_cluster, posf, axis=1)   # [B, k]
    sl = jnp.take_along_axis(ps.reshape(bsz, -1), posf, axis=1)
    idx = ivf.perm.reshape(-1)[cl * s + sl]
    idx = jnp.where(gf > NEG_INF, idx, 0)
    return gain_to_natural(gf, queries, mode), idx
