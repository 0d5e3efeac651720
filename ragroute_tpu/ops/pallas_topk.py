"""Fused matmul + streaming top-k Pallas TPU kernel.

This is the production scoring path: the TPU-native equivalent of a FAISS
flat-index search (reference ``ragroute/data_source.py:158,186,203``), fused
so the ``[B, N]`` score matrix never exists in HBM.

Kernel structure
----------------
Grid ``(n_query_tiles, n_doc_tiles)`` with the doc axis innermost: for a
fixed query tile the kernel streams document tiles HBM→VMEM, computes
``gains = q @ docs.T + bias`` on the MXU, and maintains a running sorted
top-k ``(gain, doc_index)`` list per query row in VMEM scratch.

Two properties make this fast:

* **Tile skip** — a doc tile is merged only if some query row's tile-max
  beats that row's current k-th best. After the first few tiles, almost all
  tiles fail this test on real data, so the steady-state cost is just the
  matmul (which is the irreducible scoring work).
* **Vectorized sorted insert** — when a tile does merge, we run k iterations
  of (row-max, first-argmax, masked sorted-insert), all as [TQ, K]-shaped
  VPU ops; no scalar loops, no host round-trips.

Ties break toward the lower document index (first-argmax + insert-after-
equals), matching FAISS flat-index ordering.

The wrapper handles score-mode transforms (dot / cos / l2) via the shared
gain-form convention in :mod:`ragroute_tpu.ops.topk`, pads shapes to tile
multiples, and masks padded docs so they can never win.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ragroute_tpu.ops.topk import (
    NEG_INF,
    _prepare_queries,
    _validate,
    doc_bias,
    gain_to_natural,
)

# Total VMEM budget for all kernel buffers (defaults to ~16 MB per core;
# keep headroom for the compiler's own staging).
_VMEM_BUDGET = 13 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tiles(b_pad: int, d: int, doc_bytes: int) -> Tuple[int, int]:
    """Pick (query tile TQ, doc tile TD) sizes under the VMEM budget.

    Accounting per grid step:
      query tile      TQ*d*4   (+ TQ*d*doc_bytes for the bf16 cast copy)
      doc tile        2 * TD*d*doc_bytes          (double-buffered)
      gains + buffer  2 * TQ*TD*4                 (value + merge scratch)
    """
    tq = min(b_pad, 512)
    while tq >= 64:
        q_bytes = tq * d * 4 + (tq * d * doc_bytes if doc_bytes != 4 else 0)
        q_bytes += tq * 128 * 8  # bin-view scratch (bm f32 + bc i32)
        avail = _VMEM_BUDGET - q_bytes
        per_td = 2 * d * doc_bytes + 2 * tq * 4
        td = avail // per_td if avail > 0 else 0
        if td >= 256:
            td = min(4096, 1 << (int(td).bit_length() - 1))
            return tq, td
        tq //= 2
    return tq, 256


def _topk_kernel(
    q_ref, docs_ref, bias_ref, out_g_ref, out_i_ref,
    run_g, run_i, gains_buf, bm_ref, bc_ref, done,
    *, k: int, td: int, n_doc_tiles: int, valid: int, n_pad: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        run_g[:] = jnp.full_like(run_g, NEG_INF)
        run_i[:] = jnp.zeros_like(run_i)

    q = q_ref[:]
    docs = docs_ref[:]
    if docs.dtype != q.dtype:
        q = q.astype(docs.dtype)
    # [TQ, TD] gains on the MXU; f32 accumulation regardless of input dtype.
    # Precision policy (utils.precision): HIGHEST for f32 on CPU parity
    # runs, single-pass DEFAULT on TPU / for bf16 operands.
    from ragroute_tpu.utils.precision import scoring_precision

    precision = scoring_precision(docs.dtype)
    gains = jax.lax.dot_general(
        q, docs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    gains = gains + bias_ref[:]

    tq = gains.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, td), 1)
    if valid < n_pad:
        # Padded / out-of-range documents can never win.
        gidx = col + j * td
        gains = jnp.where(gidx < valid, gains, NEG_INF)

    # --- Binned streaming merge -------------------------------------------
    #
    # Exact streaming top-k inserts ~k*ln(n_tiles) elements per row over a
    # scan, so merge work — not the matmul — dominates a naive design. The
    # trick: reduce the [TQ, TD] tile to a 128-lane bin-max view ONCE (bin
    # l holds max over columns ≡ l mod... here: col = w*128 + l, reduced
    # over w), then run the data-adaptive insert loop on the narrow
    # [TQ, 128] view; the wide buffer is touched only by one single-element
    # knockout pass per insert. A bin holding TWO top-k elements of the
    # same tile is handled by an outer repeat (rebuild the bin view from
    # the knocked-out buffer); the qualifying check makes this exact.
    #
    # Measured on v5e (735k docs x 768d, B=1024, k=32): 13.9 -> ~8 us/step
    # vs the wide-view merge; matmul-only floor is 4.3 us.
    w_bins = td // 128
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)

    def rebuild_bins():
        # static unrolled max over the W 128-lane column slices — each
        # slice is one natural vreg column tile, so this is pure VPU
        # elementwise work with no relayout. Strict > keeps the earliest
        # (lowest-col) winner on ties.
        bm = gains_buf[:, 0:128]
        bc = lane128
        for w in range(1, w_bins):
            blk = gains_buf[:, w * 128:(w + 1) * 128]
            upd = blk > bm
            bm = jnp.where(upd, blk, bm)
            bc = jnp.where(upd, lane128 + w * 128, bc)
        bm_ref[:] = bm
        bc_ref[:] = bc

    row_max = jnp.max(gains, axis=1)

    @pl.when(jnp.any(row_max > run_g[:, k - 1]))
    def _merge():
        gains_buf[:] = gains
        done[0] = 0
        rebuild_bins()

        def step(t, carry):
            @pl.when(done[0] == 0)
            def _():
                bm = bm_ref[:]
                bcol = bc_ref[:]
                cur_g = run_g[:]
                cur_i = run_i[:]
                m = jnp.max(bm, axis=1)                    # [TQ]
                kth = cur_g[:, k - 1]
                do_ins = m > kth

                @pl.when(jnp.logical_not(jnp.any(do_ins)))
                def _exhausted():
                    # narrow view spent; any qualifiers hidden behind
                    # consumed bins? (rare: needs 2 tile-top-k elements in
                    # one bin) — if so rebuild the view, else finish.
                    more = jnp.any(gains_buf[:] > kth[:, None])

                    @pl.when(more)
                    def _():
                        rebuild_bins()

                    @pl.when(jnp.logical_not(more))
                    def _():
                        done[0] = 1

                @pl.when(jnp.any(do_ins))
                def _ins():
                    # lowest-col among tied bins (FAISS tie-break parity;
                    # within-bin ties already resolved to min col)
                    am_col = jnp.min(
                        jnp.where(bm == m[:, None], bcol, td), axis=1)
                    # insert after equal-score entries (index-ascending)
                    pos = jnp.sum(
                        (cur_g >= m[:, None]).astype(jnp.int32), axis=1)
                    sh_g = jnp.concatenate(
                        [cur_g[:, :1], cur_g[:, :-1]], axis=1)
                    sh_i = jnp.concatenate(
                        [cur_i[:, :1], cur_i[:, :-1]], axis=1)
                    gid = am_col + j * td
                    new_g = jnp.where(
                        lane_k < pos[:, None], cur_g,
                        jnp.where(lane_k == pos[:, None], m[:, None], sh_g))
                    new_i = jnp.where(
                        lane_k < pos[:, None], cur_i,
                        jnp.where(lane_k == pos[:, None], gid[:, None], sh_i))
                    run_g[:] = jnp.where(do_ins[:, None], new_g, cur_g)
                    run_i[:] = jnp.where(do_ins[:, None], new_i, cur_i)
                    # single-element knockout in the wide buffer (the only
                    # full-width op per insert)
                    sel = jnp.logical_and(
                        col == am_col[:, None], do_ins[:, None])
                    gains_buf[:] = jnp.where(sel, NEG_INF, gains_buf[:])
                    # consume the winning bin in the narrow view
                    bsel = jnp.logical_and(
                        bcol == am_col[:, None], do_ins[:, None])
                    bm_ref[:] = jnp.where(bsel, NEG_INF, bm)

            return carry

        # bound: <= k insert iterations per row, plus at most one rebuild
        # per insert and a final exhausted check.
        jax.lax.fori_loop(0, 2 * k + 2, step, 0)

    @pl.when(j == n_doc_tiles - 1)
    def _emit():
        out_g_ref[:] = run_g[:]
        out_i_ref[:] = run_i[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "mode", "valid_docs"),
)
def pallas_topk(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    k: int,
    *,
    mode: str = "dot",
    valid_docs: Optional[int] = None,
    bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k of ``score(q, d)`` over a document shard, fused on-chip.

    Args:
      queries: ``[B, d]`` query embeddings (f32 or bf16).
      docs: ``[N, d]`` document embeddings. bf16 recommended for bandwidth.
      k: number of results per query.
      mode: "dot" | "cos" | "l2" (see :mod:`ragroute_tpu.ops.topk`).
      valid_docs: number of real (non-padding) rows in ``docs``.
      bias: optional precomputed gain-form per-doc bias ``[N]`` (for l2 this
        is ``-|d|^2``; pass it to avoid recomputing per call).

    Returns:
      ``(scores [B, k], indices [B, k])`` in natural score form, best-first.
    """
    _validate(mode)
    bsz, d = queries.shape
    n = docs.shape[0]
    valid = n if valid_docs is None else int(valid_docs)

    q = _prepare_queries(queries, mode)
    if bias is None:
        b = doc_bias(docs, mode)
        if b is None:
            b = jnp.zeros((n,), dtype=jnp.float32)
    else:
        b = bias.astype(jnp.float32)

    tq, td = _pick_tiles(bsz, d, docs.dtype.itemsize)
    b_pad = _round_up(bsz, tq)
    n_pad = _round_up(max(n, td), td)

    if b_pad != bsz:
        q = jnp.pad(q, ((0, b_pad - bsz), (0, 0)))
    if n_pad != n:
        docs = jnp.pad(docs, ((0, n_pad - n), (0, 0)))
        b = jnp.pad(b, (0, n_pad - n))
    bias2d = b.reshape(1, n_pad)

    n_i = b_pad // tq
    n_j = n_pad // td

    kernel = functools.partial(
        _topk_kernel, k=k, td=td, n_doc_tiles=n_j, valid=valid, n_pad=n_pad,
    )

    flops = 2 * b_pad * n_pad * d
    bytes_accessed = (
        b_pad * d * q.dtype.itemsize
        + n_pad * d * docs.dtype.itemsize
        + 4 * n_pad
        + 8 * b_pad * k
    )

    gains, idx = pl.pallas_call(
        kernel,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((tq, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((td, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, td), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, k), jnp.float32),
            pltpu.VMEM((tq, k), jnp.int32),
            pltpu.VMEM((tq, td), jnp.float32),   # gains buffer for merge
            pltpu.VMEM((tq, 128), jnp.float32),  # bin-max view
            pltpu.VMEM((tq, 128), jnp.int32),    # bin-winner cols
            pltpu.SMEM((1,), jnp.int32),          # early-exit flag
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        # The CPU test mesh has no Mosaic backend; interpret there so the
        # same code path is exercised everywhere.
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(q, docs, bias2d)

    gains = gains[:bsz]
    idx = idx[:bsz]
    return gain_to_natural(gains, queries, mode), idx
