"""Two-stage exact-rescored top-k: low-rank coarse scan + full refine.

The search op behind ``impl="lowrank"`` (see
:mod:`ragroute_tpu.index.lowrank` for the build and the design rationale).
Both stages are static-shape XLA/Pallas programs:

* coarse — the production fused matmul+top-k kernel over the ``[n, r]``
  projected slab (gain-form dot; the shard's existing bias carries the
  l2 ``-|d|^2`` term, which stays EXACT full-dimension, plus the -inf
  padding/liveness sentinel);
* refine — one row-gather of the ``k'`` candidates from the full-precision
  stored slab, exact rescore (dequant + dot + bias) in f32, final
  ``top_k``.

Score/tie semantics match the exhaustive kernels: refined scores are the
exact stored-dtype scores (natural form, FAISS parity like
``ops.topk.shard_topk``), and bit-equal duplicates order lowest-index
first — the coarse stage returns ties lowest-index-first, so they enter
the candidate list in index order and ``lax.top_k``'s first-position tie
break preserves it. Recall differs from the exhaustive scan only when a
true top-k document falls outside the coarse top-k'.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ragroute_tpu.index.lowrank import LowRankData
from ragroute_tpu.ops.topk import (NEG_INF, _prepare_queries,
                                   gain_to_natural, shard_topk, unpack_int4)


def lowrank_topk(
    queries: jnp.ndarray,
    lr: LowRankData,
    docs: jnp.ndarray,
    k: int,
    *,
    mode: str = "dot",
    valid_docs: Optional[int] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
    center: Optional[jnp.ndarray] = None,
    packed4: bool = False,
    k_refine: Optional[int] = None,
    coarse_impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage top-k over one shard; signature mirrors ``shard_topk``
    plus the coarse index and the candidate depth ``k_refine`` (default
    ``4 * k``, clamped to the slab).

    Returns ``(scores [B, k], indices [B, k])``, scores natural-form
    sorted best-first, exactly as the exhaustive implementations."""
    n_pad = docs.shape[0]
    kr = int(min(k_refine or 4 * k, n_pad))
    kr = max(kr, k)

    # center handling identical to shard_topk: l2 shifts queries into the
    # centered frame (distances unchanged); dot adds the q.mu constant
    # back to the returned scores (stored rows carry only the residual)
    dot_restore = None
    if center is not None:
        if mode == "l2":
            queries = queries.astype(jnp.float32) - center
        elif mode == "dot":
            dot_restore = queries.astype(jnp.float32) @ center

    q32 = _prepare_queries(queries, mode)          # gain-form [B, d]
    qp = q32 @ lr.basis                            # [B, r]

    # coarse: gain-form dot over the projected slab. The bias is the FULL
    # shard bias: exact -|d|^2 for l2 (so only the q.d cross term is
    # approximated) and the -inf pad/liveness sentinel for every mode.
    # The slab is mean-centered (build_lowrank), so coarse gains are the
    # true gains minus a per-query constant — ordering and the -inf
    # validity sentinel are unaffected, and that is all refine consumes.
    cg, cidx = shard_topk(
        qp, lr.docs_lr, kr, mode="dot", valid_docs=valid_docs, bias=bias,
        impl=coarse_impl)

    if packed4:
        # COARSE-AUTHORITATIVE mode for int4 stores: the lr slab is
        # projected from the PRE-quantization f32 rows, so on a corpus
        # the energy rule accepted (>= LOWRANK_ENERGY captured) its
        # scores are strictly closer to the f32 truth than a rescore
        # from 4-bit codes — the measured gate cell (feb4rag 4096-d cos,
        # sparse routing) goes 0.90 (int4 rescoring, any scale scheme)
        # -> >= 0.95 ordering by the coarse slab. Returned scores
        # restore the per-(query, shard) centering constant q_gain . mu
        # so cross-shard score merges stay comparable; they are
        # truncation-approximate, NOT the stored-int4 scores (int4's
        # own scores are a 4-bit approximation anyway — the f32 truth
        # is the recall referee, tests/test_recall_gate.py).
        restore = q32 @ lr.mu                          # [B]
        top_g, top_i = cg[:, :k] + restore[:, None], cidx[:, :k]
        top_g = jnp.where(cg[:, :k] > NEG_INF, top_g, NEG_INF)
        s = gain_to_natural(top_g, queries, mode)
        if dot_restore is not None:
            s = s + dot_restore[:, None]
        return s, top_i

    # refine: gather the candidates' stored rows and rescore exactly
    bsz = queries.shape[0]
    flat = cidx.reshape(-1)
    rows = jnp.take(docs, flat, axis=0)
    if packed4:
        rows = unpack_int4(rows)
    rows = rows.reshape(bsz, kr, -1).astype(jnp.float32)
    from ragroute_tpu.utils.precision import scoring_precision

    if scale is not None and scale.ndim == 2:
        # per-group int4 scales [n, G]: dequantize the gathered rows
        # up front (a per-candidate gather is tiny — k' rows per query)
        gsz = rows.shape[-1] // scale.shape[1]
        rows = rows * jnp.repeat(scale[flat].reshape(bsz, kr, -1),
                                 gsz, axis=-1)
        scale = None
    g = jnp.einsum("bd,bkd->bk", q32, rows,
                   precision=scoring_precision(jnp.float32),
                   preferred_element_type=jnp.float32)
    if scale is not None:
        g = g * scale[flat].reshape(bsz, kr)
    if bias is not None:
        g = g + bias[flat].reshape(bsz, kr)
    # a candidate slot the coarse stage could not fill (fewer valid docs
    # than k') carries a junk index — its coarse gain is -inf; keep it out
    g = jnp.where(cg > NEG_INF, g, NEG_INF)

    top_g, pos = jax.lax.top_k(g, k)
    top_i = jnp.take_along_axis(cidx, pos, axis=-1)
    # -inf gains map to the exhaustive kernels' worst-score sentinels
    # through the same arithmetic (+inf l2 distance, -inf dot/cos score)
    s = gain_to_natural(top_g, queries, mode)
    if dot_restore is not None:
        s = s + dot_restore[:, None]
    return s, top_i
