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

Tuning notes (v5e, 734k docs x 768d, B=1024, k=32, bf16, measured via
scripts/bench_kernel.py --reps 32, one dispatch, random data; matmul-only
floor on the same harness is 4.82 us/step / 167 TFLOPS): this design runs
14.05 us/step / 57 TFLOPS. Round-2 A/B history on the identical harness:
  * round-1 kernel (stash every tile + iterative extract-insert,
    software-pipelined one grid step behind): 16.57 us/step;
  * + stashed per-row tile max to skip the merge's wide check read:
    17.09 us (skip never fires at TQ=512 — any-of-512-rows improves on
    nearly every tile — so it only added overhead);
  * in-step conditional stash (pl.when(improves) around stash+merge):
    16.89 us — predication also blocks epilogue fusion;
  * epilogue top-R ladder (this design) R=1: 14.54, R=2: 14.05 (best),
    R=3: 15.78; gating the ladder behind an improves-check: 16.15 us
    micro / 33.1k engine q/s (slower everywhere, see kernel body);
  * materializing the per-rank knocked-out [TQ, TD] copies OOMed scoped
    VMEM at td=1024 (16.16M > 16M) — hence the masked-reduce form;
  * folding padded-doc masking into a NEG_INF bias tail + skipping the
    bias add when identically zero (current form): 14.04 us — neutral on
    the micro (the iota+compare+where fused into existing traversals)
    but strictly fewer VPU ops, kept for the padded/l2 configs.
The merge is VMEM-bandwidth-bound, not ALU-bound: R=2 -> R=3 adds ~2
gains traversals and costs +1.7 us, i.e. ~2.4 TB/s effective VMEM read
rate; the design is already near the traversal minimum (matmul write +
max/argmax/next-max reads per rank), so further op-shaving inside the
epilogue does not move the total.
The remaining 9 us/step over the matmul floor is ~6 unavoidable wide VPU
traversals per tile (max/argmin per rank + next-max); Mosaic does not
overlap VPU merge work with the MXU matmul (pipelining the merge one grid
step behind measured +-2% in round 1 and +0.5 us here).
Round-1 alternatives, also MEASURED SLOWER and reverted:
  * 128-lane bin-max candidate view + narrow insert loop + exactness
    rebuild: 15.7 us (per-tile rebuild + extra scalar reductions eat the
    narrower iteration savings);
  * read-only lexicographic (value, col) cursor walk (zero VMEM writes):
    28.3 us (Mosaic copies large value carries through cond/fori);
  * unconditional masked body with a single scalar reduction: 15.7 us
    (the terminal wasted iteration costs more than the branch stalls);
  * 4 unrolled masked inserts per sync point (quartering the jnp.any
    vector->scalar stalls): 21.2 us — wide-pass VMEM traffic, not sync
    stalls, is the cost, so wasted unconditional extracts lose to the
    per-insert adaptive exit.
Merge cost is intrinsic: exact streaming top-k performs ~k*ln(n_tiles)
inserts per row (~300 here), and each insert is VPU passes over the tile.

ROUND-3 CLOSURE of the merge-design axis (the one untried family from
the round-2 review — "fuse max+argmax into one traversal via packed
monotone value/index encoding" — implemented as RAGROUTE_MERGE=packed
and MEASURED on the same harness):
  * ladder (production, exact):            14.03 us/step  (reproduces
    round-2's 14.05 within run noise)
  * packed single-reduction-per-rank:      13.86 us/step  (-1.2%)
The packed form is the CHEAPEST possible member of its family — one
int32 max per rank returns both the max and its lowest tied column, no
eq/where tie pass, no exclusion mask — and it is NOT exact (mantissa-
truncated values, truncated-tie ordering; ~0.6% score error). Even so
it buys 1.2%. Conclusion, with the supporting impossibility arguments:
  1. An EXACT single-reduction max+argmax cannot exist on this ISA: the
     reduction monoid needs (f32 value, index) = >32 bits of state per
     lane, Mosaic reductions are 32-bit, and pair-accumulator chunked
     scans need 5x [TQ,128] live accumulators (320 vregs at TQ=512)
     that spill, costing ~10 VMEM round trips per gains read — worse
     than the 2-pass extract they replace.
  2. The measured 0.17 us gap between "ladder with its eq/where tie
     passes" and "one packed reduction per rank" shows Mosaic already
     fuses the ladder's elementwise+reduce chains to near the one-pass
     floor; there is no ~2-pass-per-rank slack left to recover.
  3. Speed of light: matmul floor 4.82 us (167 TFLOPS, measured) + the
     merge's mandatory (R+1)=3 per-rank wide reductions, serialized
     after the MXU (Mosaic does not overlap the VPU epilogue with the
     next tile's matmul: pipelining measured +-2% in rounds 1-2). The
     packed variant IS that minimum-shape merge and lands at 13.86 us;
     an exact merge additionally needs the tie-resolution information
     the packed key cannot carry.
Axis closed: exact routing=all stays at ~14.0 us/step (57 TFLOPS,
~51k kernel-level q/s at B=1024); the 45k+ q/s target for this axis is
refuted for exact FAISS-parity semantics on this hardware generation.

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

# How many per-row tile maxima the fused epilogue extracts+inserts before
# falling back to the stash+iterate slow path (see kernel body).
EPILOGUE_RANKS = max(1, int(__import__("os").environ.get(
    "RAGROUTE_EPILOGUE_RANKS", "2")))

# Merge design selector (A/B measurement knob, see module docstring):
#   "ladder"  — the production exact design (default).
#   "packed"  — MEASUREMENT-ONLY: single packed uint32 key per element
#               (sortable gain bits with the low 16 mantissa bits
#               replaced by the complemented column) so max+argmax
#               collapse into ONE wide reduction per rank. NOT exact:
#               the extracted value is mantissa-truncated and ties are
#               broken on truncated gains, so it can both mis-rank
#               near-ties and return truncated scores (measured ~0.6%
#               score error, ~1% winner-set churn on random data). It
#               exists to measure the SPEED CEILING of the "fuse
#               max+argmax via monotone packed keys" family — if even
#               this inexact form does not beat the ladder, the family
#               is refuted without needing the (impossible on 32-bit
#               lanes) exact variant. Never use it for serving.
MERGE_DESIGN = __import__("os").environ.get("RAGROUTE_MERGE", "ladder")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tiles(b_pad: int, d: int, doc_bytes: int,
                k: int = 32, scale_row_bytes: int = 12) -> Tuple[int, int]:
    """Pick (query tile TQ, doc tile TD) sizes under the VMEM budget.

    Accounting per grid step:
      query tile      TQ*d*4   (+ TQ*d*doc_bytes for the bf16 cast copy)
      doc tile        2 * TD*d*doc_bytes          (double-buffered)
      gains + buffer  2 * TQ*TD*4                 (value + merge scratch)
      top-k state     4 * TQ*k*8                  (run_g/run_i scratch +
                      double-buffered out tiles — matters at deep k:
                      the k'=160 hostrefine coarse scan blew the scoped
                      16 MB limit by 1.8 MB when this was unbudgeted)
      scale rows      scale_row_bytes per doc row: 12 covers the flat
                      bias+scale case; the grouped int4 scheme carries a
                      [TD, G] f32 block (G*4 bytes/row, ~0.5 MB at
                      d=4096/td=4096) that must be budgeted explicitly
                      rather than ride the 13->16 MB headroom.
    """
    tq = min(b_pad, 512)
    while tq >= 64:
        # queries are pre-cast to the doc dtype in the wrapper, so only one
        # copy of the query tile lives in VMEM
        q_bytes = tq * d * doc_bytes + 4 * tq * k * 8
        avail = _VMEM_BUDGET - q_bytes
        # per doc-tile column: double-buffered docs + gains value + merge
        # buffer + one compiler temporary + the bias/scale rows
        per_td = 2 * d * doc_bytes + 3 * tq * 4 + scale_row_bytes
        td = avail // per_td if avail > 0 else 0
        if td >= 256:
            td = min(4096, 1 << (int(td).bit_length() - 1))
            return tq, td
        tq //= 2
    return tq, 256


def _merge_gains_tile(
    gains, j, out_g_ref, out_i_ref, run_g, run_i, gains_buf, done,
    *, k: int, td: int, n_doc_tiles: int,
):
    """Shared streaming-merge epilogue: fold one [TQ, TD] gains tile into
    the running sorted top-k scratch; emit on the last tile.

    Used by the fused matmul kernel below and by the gains-matrix
    streaming kernel (:func:`pallas_stream_topk`). The op order here is
    the A/B-tuned design from the module docstring — edit with a
    microbenchmark in hand."""
    tq = gains.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, td), 1)

    # --- Epilogue fast-path insert + rare full merge ---------------------
    #
    # In steady state a doc tile contributes AT MOST ONE new top-k entry
    # per query row (expected new entries at tile j ~ k/j), so the merge
    # is split:
    #
    # 1. Fast path, fused into the matmul epilogue on the LIVE gains
    #    value: per-row (max, lowest-index argmax, second-max) in three
    #    wide passes, then a single predicated [TQ, k] sorted insert of
    #    the max. No [TQ, TD] stash write, no re-read, one scalar sync.
    # 2. Slow path, only when some row's SECOND-best tile element still
    #    beats its (post-insert) k-th best: stash the knocked-out tile
    #    and run the iterative extract-insert loop (same algorithm as
    #    before; a fori_loop with a done flag over scratch refs — a
    #    while_loop carrying the [TQ, TD] tile compiles ~60x slower in
    #    Mosaic, and large value carries through cond/fori get copied per
    #    iteration, see module docstring).
    #
    # This cuts the per-tile VMEM traffic from ~5 wide passes (stash +
    # check read + ~3 insert passes) to the three fused epilogue passes
    # for ~all tiles.
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)

    def insert_one(m, gid, do_ins):
        """Predicated sorted insert of one (gain, global id) per row.

        Insert position is AFTER equal-score entries (index-ascending
        among ties — FAISS flat parity; gid of a tile max is always
        larger than any previously inserted tied id because the doc axis
        streams in index order)."""
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

    def merge_stashed(offset):
        """Iteratively drain gains_buf into run_g/run_i (slow path)."""
        done[0] = 0

        def insert_step(t, carry):
            @pl.when(done[0] == 0)
            def _():
                g = gains_buf[:]
                m = jnp.max(g, axis=1)                   # [TQ]
                do_ins = m > run_g[:, k - 1]             # [TQ]

                @pl.when(jnp.logical_not(jnp.any(do_ins)))
                def _stop():
                    done[0] = 1

                @pl.when(jnp.any(do_ins))
                def _ins():
                    # First (lowest-index) argmax — FAISS tie-break parity.
                    am = jnp.min(
                        jnp.where(g == m[:, None], col, td), axis=1)
                    insert_one(m, am + offset, do_ins)
                    # Knock out the taken element; mask rows that can no
                    # longer improve so they stop winning the row max.
                    g2 = jnp.where(col == am[:, None], NEG_INF, g)
                    gains_buf[:] = jnp.where(
                        do_ins[:, None], g2, NEG_INF)

            return carry

        # <= k iterations: each improving row inserts one element per
        # iteration and a row can absorb at most k new entries per tile.
        jax.lax.fori_loop(0, k, insert_step, 0)

    if MERGE_DESIGN == "packed":
        # ---- measurement-only packed-key ladder (see MERGE_DESIGN) ----
        # key = sortable(gain) & ~0xFFFF | (0xFFFF - col), all uint32:
        # ONE wide max per rank yields both the (mantissa-truncated) max
        # and its lowest tied column — the "fuse max+argmax via a packed
        # monotone key" design family, at its cheapest possible form.
        # all-int32 arithmetic (Mosaic has no unsigned reductions):
        # signed-sortable map s = bits >= 0 ? bits : bits ^ 0x7FFFFFFF
        bits = jax.lax.bitcast_convert_type(gains, jnp.int32)
        flip = jnp.int32(0x7FFFFFFF)
        s = jnp.where(bits < 0, bits ^ flip, bits)
        hi_mask = jnp.int32(~0xFFFF)                   # 0xFFFF0000
        lo = jnp.int32(0xFFFF) - col
        key = (s & hi_mask) | lo
        sentinel = jnp.int32(-0x80000000)              # < any real key
        for r in range(EPILOGUE_RANKS + 1):
            kmax = jnp.max(key, axis=1)
            a = jnp.int32(0xFFFF) - (kmax & jnp.int32(0xFFFF))
            sh = kmax & hi_mask
            mbits = jnp.where(sh < 0, sh ^ flip, sh)
            m = jax.lax.bitcast_convert_type(mbits, jnp.float32)
            if r < EPILOGUE_RANKS:
                insert_one(m, a + j * td, m > run_g[:, k - 1])
                key = jnp.where(col == a[:, None], sentinel, key)
            else:
                need = jnp.any(m > run_g[:, k - 1])

                @pl.when(need)
                def _merge_rest_packed():
                    gains_buf[:] = jnp.where(
                        key == sentinel, NEG_INF, gains)
                    merge_stashed(j * td)

        @pl.when(j == n_doc_tiles - 1)
        def _emit_packed():
            out_g_ref[:] = run_g[:]
            out_i_ref[:] = run_i[:]

        return

    # fast path (fused epilogue): statically-unrolled per-row top-R
    # extract+insert on the live gains value. R bounds how many new
    # top-k entries per row a tile can contribute before the slow path
    # kicks in (expected entries at tile j ~ k/j, so rows wanting > R
    # from one tile become vanishingly rare as the stream progresses).
    # Every rank is a masked reduce over the ORIGINAL gains with an
    # accumulated exclusion mask — no knocked-out [TQ, TD] copy is ever
    # materialized (each copy is 2 MB of scoped VMEM; materializing per
    # rank OOMed at td=1024), only the rare slow-path stash writes one.
    # The ladder runs unconditionally: gating it behind a did-any-row-
    # improve pl.when measured SLOWER on both random and clustered data
    # (16.2 vs 14.0 us/step micro, 33.1k vs 37.3k engine q/s) — Mosaic
    # predication forces the gains value to materialize and the check
    # rarely skips at TQ=512 (any-of-512-rows fires nearly every tile).
    m, excl = jnp.max(gains, axis=1), None
    for r in range(EPILOGUE_RANKS):
        tie_cols = jnp.where(gains == m[:, None], col, td)
        if excl is not None:
            tie_cols = jnp.where(excl, td, tie_cols)
        a = jnp.min(tie_cols, axis=1)
        insert_one(m, a + j * td, m > run_g[:, k - 1])
        hit = col == a[:, None]
        excl = hit if excl is None else (excl | hit)
        m = jnp.max(jnp.where(excl, NEG_INF, gains), axis=1)

    # slow path only if some row's (R+1)-th tile element still beats
    # its (post-inserts) k-th best
    need_more = jnp.any(m > run_g[:, k - 1])

    @pl.when(need_more)
    def _merge_rest():
        gains_buf[:] = jnp.where(excl, NEG_INF, gains)
        merge_stashed(j * td)

    @pl.when(j == n_doc_tiles - 1)
    def _emit():
        out_g_ref[:] = run_g[:]
        out_i_ref[:] = run_i[:]


def _topk_kernel(
    q_ref, docs_ref, *rest,
    k: int, td: int, n_doc_tiles: int, scaled: str, biased: bool,
    packed4: bool = False,
):
    bias_ref = scale_ref = None
    if biased:
        bias_ref, rest = rest[0], rest[1:]
    if scaled != "none":
        scale_ref, rest = rest[0], rest[1:]
    out_g_ref, out_i_ref, run_g, run_i, gains_buf, done = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        run_g[:] = jnp.full_like(run_g, NEG_INF)
        run_i[:] = jnp.zeros_like(run_i)

    q = q_ref[:]
    docs = docs_ref[:]
    if packed4:
        # int4 index: [TD, d/2] bytes, two codes each (low nibble = dim j,
        # high nibble = dim j + d/2 — index.shard._pack_int4). Unpack on
        # the VPU (two arithmetic shifts + concat; natural dim order, no
        # interleave), then the MXU runs the bf16 cast like int8. Halves
        # HBM traffic/capacity again vs int8; dequant rides the per-doc
        # scale epilogue, or (scaled="group") a per-(doc, group) multiply
        # fused into the unpack before the matmul.
        x = docs.astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(x, 28), 28)  # sign-extended
        hi = jnp.right_shift(x, 4)
        docs = jnp.concatenate([lo, hi], axis=1).astype(q.dtype)
        if scaled == "group":
            # per-group dequant BEFORE the MXU: each INT4_GROUP_DIMS
            # slice multiplies by its own [TD, 1] scale column (codes
            # are exact in bf16; the scale cast's ~0.4% rounding is far
            # under the int4 step). One wide FMA pass over [TD, d] —
            # small next to the unpack's shifts+concat+cast.
            sc = scale_ref[:].astype(docs.dtype)        # [TD, G]
            g = sc.shape[1]
            dg = docs.shape[1] // g
            docs = jnp.concatenate(
                [docs[:, i * dg:(i + 1) * dg] * sc[:, i:i + 1]
                 for i in range(g)], axis=1)
    elif docs.dtype == jnp.int8:
        # int8 index: halve HBM traffic/capacity; dequantize via the fused
        # per-doc scale epilogue below (MXU runs the bf16 cast of the tile)
        docs = docs.astype(q.dtype)
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
    if scaled == "doc":
        gains = gains * scale_ref[:]
    if biased:
        # The wrapper folds padded/invalid-doc masking into the bias
        # (NEG_INF tail), so no per-tile iota+compare+where runs here; a
        # dot/cos shard with no padding skips this add entirely.
        gains = gains + bias_ref[:]

    _merge_gains_tile(
        gains, j, out_g_ref, out_i_ref, run_g, run_i, gains_buf, done,
        k=k, td=td, n_doc_tiles=n_doc_tiles)


def _stream_kernel(g_ref, *rest, k: int, td: int, n_doc_tiles: int):
    """Streaming top-k over a PRECOMPUTED gain matrix (no matmul).

    Same tuned merge as the fused kernel; the per-tile input is a
    ``[TQ, TD]`` block of gains loaded from HBM instead of an MXU
    product. Used by the IVF path to turn per-candidate gains into
    per-query top-k without XLA's sort-based ``top_k``."""
    out_g_ref, out_i_ref, run_g, run_i, gains_buf, done = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        run_g[:] = jnp.full_like(run_g, NEG_INF)
        run_i[:] = jnp.zeros_like(run_i)

    _merge_gains_tile(
        g_ref[:], j, out_g_ref, out_i_ref, run_g, run_i, gains_buf, done,
        k=k, td=td, n_doc_tiles=n_doc_tiles)


@functools.partial(jax.jit, static_argnames=("k",))
def pallas_stream_topk(
    gains: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a dense gain-form score matrix ``[B, M]``.

    Returns ``(top_gains [B, k] f32, positions [B, k] int32)`` with
    positions indexing the M axis, ties broken toward the lower position
    (FAISS parity, same as :func:`pallas_topk`). Rows the caller wants
    ignored must carry ``NEG_INF`` gains (positions for -inf entries are
    not meaningful).
    """
    bsz, m = gains.shape
    tq = min(512, _round_up(bsz, 8))
    # per grid step, in [TQ, TD]-f32 equivalents: double-buffered input
    # tile (2) + merge buffer (1) + the ladder's materialized exclusion
    # mask and temporaries (~2; measured 16.43M scoped at td=2048/tq=512,
    # i.e. ~16 B/column-row)
    td = _VMEM_BUDGET // (5 * tq * 4 + 64)
    td = max(256, min(4096, 1 << (int(td).bit_length() - 1)))
    b_pad = _round_up(bsz, tq)
    m_pad = _round_up(max(m, td), td)
    g = gains.astype(jnp.float32)
    if b_pad != bsz or m_pad != m:
        g = jnp.pad(g, ((0, b_pad - bsz), (0, m_pad - m)),
                    constant_values=NEG_INF)
    n_i, n_j = b_pad // tq, m_pad // td

    kernel = functools.partial(
        _stream_kernel, k=k, td=td, n_doc_tiles=n_j)
    top_g, top_i = pl.pallas_call(
        kernel,
        grid=(n_i, n_j),
        in_specs=[pl.BlockSpec((tq, td), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
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
            pltpu.VMEM((tq, td), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=b_pad * m_pad * 4 + 8 * b_pad * k,
            transcendentals=0),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(g)
    return top_g[:bsz], top_i[:bsz]


@functools.partial(
    jax.jit,
    static_argnames=("k", "mode", "valid_docs", "packed4"),
)
def pallas_topk(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    k: int,
    *,
    mode: str = "dot",
    valid_docs: Optional[int] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
    packed4: bool = False,
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
      scale: optional per-doc dequantization factor ``[N]`` for int8 shards
        (gain = (q . d_q) * scale + bias), fused into the kernel epilogue.

    Returns:
      ``(scores [B, k], indices [B, k])`` in natural score form, best-first.
    """
    _validate(mode)
    bsz, d = queries.shape
    n = docs.shape[0]
    valid = n if valid_docs is None else int(valid_docs)
    if packed4:
        if docs.shape[1] * 2 != d:
            raise ValueError(
                f"packed4 docs width {docs.shape[1]} != d/2 = {d // 2}")
        if bias is None and mode == "l2":
            raise ValueError(
                "packed4 l2 shards must pass the precomputed bias "
                "(it cannot be derived from packed bytes)")

    q = _prepare_queries(queries, mode)
    if bias is None:
        b = None if packed4 else doc_bias(docs, mode)
    else:
        b = bias.astype(jnp.float32)

    # packed4 budgets as f32: the packed tile is tiny, but the unpack
    # materializes int32 + bf16 [TD, d] temporaries in VMEM
    scale_row_bytes = 12 + (scale.shape[1] * 4
                            if scale is not None and scale.ndim == 2
                            else 0)
    tq, td = _pick_tiles(bsz, d, 4 if packed4 else docs.dtype.itemsize,
                         k=k, scale_row_bytes=scale_row_bytes)
    b_pad = _round_up(bsz, tq)
    n_pad = _round_up(max(n, td), td)

    if b_pad != bsz:
        q = jnp.pad(q, ((0, b_pad - bsz), (0, 0)))
    if docs.dtype == jnp.int8:
        q = q.astype(jnp.bfloat16)      # kernel casts int8 docs to bf16
    elif docs.dtype != q.dtype:
        q = q.astype(docs.dtype)
    if n_pad != n:
        docs = jnp.pad(docs, ((0, n_pad - n), (0, 0)))
        if b is not None:
            b = jnp.pad(b, (0, n_pad - n))
        if scale is not None:
            scale = jnp.pad(
                scale, ((0, n_pad - n),) + ((0, 0),) * (scale.ndim - 1))
    if valid < n_pad:
        # Fold padded/invalid-doc masking into the bias: a NEG_INF tail
        # means those docs can never win, and the kernel's hot loop needs
        # no per-tile iota+compare+where (3 wide VPU ops saved per tile).
        if b is None:
            b = jnp.zeros((n_pad,), dtype=jnp.float32)
        b = jnp.where(jnp.arange(n_pad) < valid, b, NEG_INF)
    bias2d = None if b is None else b.reshape(1, n_pad)
    grouped = scale is not None and scale.ndim == 2
    if grouped and not packed4:
        raise ValueError("per-group scales are an int4 (packed4) format")
    if grouped:
        scale2d = scale.astype(jnp.float32)            # [n_pad, G]
    else:
        scale2d = None if scale is None else \
            scale.astype(jnp.float32).reshape(1, n_pad)

    n_i = b_pad // tq
    n_j = n_pad // td

    kernel = functools.partial(
        _topk_kernel, k=k, td=td, n_doc_tiles=n_j,
        scaled=("group" if grouped else
                "doc" if scale2d is not None else "none"),
        biased=bias2d is not None,
        packed4=packed4,
    )

    d_store = d // 2 if packed4 else d
    flops = 2 * b_pad * n_pad * d
    bytes_accessed = (
        b_pad * d * q.dtype.itemsize
        + n_pad * d_store * docs.dtype.itemsize
        + 4 * n_pad
        + 8 * b_pad * k
    )

    gains, idx = pl.pallas_call(
        kernel,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((tq, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((td, d_store), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((1, td), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)]
             if bias2d is not None else [])
          + ([pl.BlockSpec((td, scale2d.shape[1]), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)] if grouped else
             [pl.BlockSpec((1, td), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)]
             if scale2d is not None else []),
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
            pltpu.SMEM((1,), jnp.int32),          # early-exit flag
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        # The CPU test mesh has no Mosaic backend; interpret there so the
        # same code path is exercised everywhere.
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(*([q, docs] + [a for a in (bias2d, scale2d) if a is not None]))

    gains = gains[:bsz]
    idx = idx[:bsz]
    return gain_to_natural(gains, queries, mode), idx
