"""Search engines over the host-RAM capacity tiers (index/streamed.py).

Two engines behind the same interface as
:class:`~ragroute_tpu.engine.engine.FederatedSearchEngine` (``search()``
+ the ShardSet metadata surface), so the whole serving stack — batcher,
aiohttp server, native C++ front-end — runs unchanged on corpora bigger
than one chip's HBM:

* ``tier="stream"`` — route (device) -> resident-prefix exact scan
  (device, one dispatch) -> per-shard host-slab loop: upload slab j+P
  (``jax.device_put``, async) while the fused kernel scans slab j and
  folds it into a running per-shard top-k (donated buffers, no allocs)
  -> one finalize dispatch (mask gate + cross-shard merge + msg sizing).
  Shards with no routed query in the batch skip their slabs entirely
  (host-side mask check — the streaming tier's version of the routing
  saving). See index/streamed.py for the measured bandwidth envelope.

* ``tier="hostrefine"`` — ONE fused device dispatch runs routing, the
  exact scan of fully-resident sources, and the exhaustive rank-r coarse
  scan of every host source, then (score-merged worlds) a mask-gated
  GLOBAL coarse merge so only ``[B, k']`` (id, shard) candidates plus
  ``[B, N]`` stats sizes cross the wire; the host exact-rescored the
  candidates from its RAM rows (the same stored-form math the kernel
  uses) and merges. Per-source candidate mode (feb4rag's qrels rerank,
  or ``fetch_candidates=True``) refines per source instead.

Reference parity note: this replaces the reference's host-RAM FAISS
capacity story (``ragroute/data_source.py:69-80``) — same single-node
capacity bound (host RAM), with the scan FLOPs on the MXU instead of CPU.

Serving-metric semantics (``/stats`` + response metadata) for the
hostrefine tier differ from every other impl in two documented ways:

* ``selection_time`` is reported as 0 — routing is fused into the single
  device dispatch with the scans, so its cost is part of
  ``doc_select_time`` and cannot be split out without an extra dispatch.
* per-source ``message_size`` estimates derive from the COARSE-ordered
  top-k ids of each host source (the candidate traffic that actually
  crosses the wire), not the final refined winners — except per-source
  candidate mode (feb4rag / ``fetch_candidates=True``), where the
  refined per-source lists exist and the host estimator sizes from them
  (the device coarse-id sizing is skipped there).
"""

from __future__ import annotations

import functools
import logging
import threading
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ragroute_tpu.config import (HOSTREFINE_KAPPA,
                                 HOSTREFINE_NPROBE_DIVISOR,
                                 HOSTREFINE_REFINE_MULT, STREAM_PREFETCH,
                                 WorldConfig)
from ragroute_tpu.engine.engine import (QueryTableMixin, SearchOutput,
                                        _route_fn, build_payload_tables,
                                        gate_and_merge, payload_base)
from ragroute_tpu.index.streamed import StreamedShardSet
from ragroute_tpu.ops.topk import NEG_INF, shard_topk

logger = logging.getLogger("streamed_engine")


@functools.partial(
    jax.jit,
    static_argnames=("k", "mode", "packed4"),
    donate_argnums=(0, 1),
)
def _slab_merge(run_key, run_id, q, docs, bias, scale, offset, *,
                k: int, mode: str, packed4: bool):
    """Fold one uploaded slab into a running per-shard top-k.

    ``run_key``/``run_id`` are donated (in-place HBM update, no realloc
    per slab). Keys are monotone "higher is better" per query (natural
    score for dot/cos, negated l2) — constant per-query offsets (|q|^2,
    centering restores) cancel inside one shard, so the merge is exact.
    Tie-break: the concat keeps earlier slabs (lower global ids) first
    and ``top_k`` takes the lowest position among ties — FAISS parity.
    """
    s, idx = shard_topk(q, docs, k, mode=mode, bias=bias, scale=scale,
                        packed4=packed4)
    key = -s if mode == "l2" else s
    key = jnp.where(jnp.isnan(key), NEG_INF, key)
    gid = idx + offset
    kk = jnp.concatenate([run_key, key], axis=1)
    ii = jnp.concatenate([run_id, gid], axis=1)
    top, pos = jax.lax.top_k(kk, k)
    return top, jnp.take_along_axis(ii, pos, axis=1)


def _host_gate_and_merge(world: WorldConfig, k: int, mask: np.ndarray,
                         per_scores: List[np.ndarray],
                         per_ids: List[np.ndarray]):
    """Host-numpy mirror of :func:`engine.gate_and_merge` (same gating,
    same lowest-position tie-break via stable argsort)."""
    bsz = per_scores[0].shape[0]
    shard_scores = np.stack(per_scores, axis=1)          # [B, N, k]
    shard_ids = np.stack(per_ids, axis=1)
    l2 = world.sources[0].score_mode == "l2"
    key = -shard_scores if l2 else shard_scores
    key = np.where(np.isnan(key), -np.inf, key)
    gated = np.where(mask[:, :, None], key, -np.inf).reshape(bsz, -1)
    pos = np.argsort(-gated, axis=1, kind="stable")[:, :k]
    top_key = np.take_along_axis(gated, pos, axis=1)
    merged_shard = (pos // k).astype(np.int32)
    merged_local = np.take_along_axis(
        shard_ids.reshape(bsz, -1), pos, axis=1)
    valid = top_key > -np.inf
    merged_score = np.where(valid, -top_key if l2 else top_key, np.nan)
    merged_shard = np.where(valid, merged_shard, -1)
    merged_valid = valid.sum(axis=1).astype(np.int32)
    return (shard_scores, shard_ids, merged_score.astype(np.float32),
            merged_shard, merged_local.astype(np.int32), merged_valid)


class _PendingStreamed:
    """Deferred hostrefine completion (search_submit contract)."""

    __slots__ = ("_engine", "_handle", "_done")

    def __init__(self, engine, handle):
        self._engine = engine
        self._handle = handle
        self._done = False

    def wait(self) -> SearchOutput:
        if self._done:
            raise RuntimeError("wait() called twice")
        self._done = True
        out = self._engine.complete_hostrefine(self._handle)
        self._handle = None
        return out


class _DoneStreamed:
    """Already-finished search behind the search_submit contract."""

    __slots__ = ("_out",)

    def __init__(self, out):
        self._out = out

    def wait(self) -> SearchOutput:
        return self._out


class StreamedSearchEngine(QueryTableMixin):
    """Serve a :class:`StreamedShardSet` (either tier)."""

    def __init__(
        self,
        shard_set: StreamedShardSet,
        router_params,
        bank,
        *,
        threshold: Optional[float] = None,
        seed: int = 0,
        k_refine: Optional[int] = None,
        prefetch: int = STREAM_PREFETCH,
        nprobe: Optional[int] = None,
        kappa: Optional[int] = None,
    ):
        self.world: WorldConfig = shard_set.world
        self.shard_set = shard_set
        self.params = router_params
        self.bank = bank
        self.tier = shard_set.tier
        # the batcher's pipelined worker keys on this: only the
        # hostrefine tier has the dispatch/complete split
        self.supports_pipelined_dispatch = self.tier == "hostrefine"
        self.threshold = threshold
        self.prefetch = max(1, int(prefetch))
        self.k_refine = int(k_refine or
                            HOSTREFINE_REFINE_MULT * self.world.k)
        # clusters probed per query on clustered coarse slabs (None =
        # C // HOSTREFINE_NPROBE_DIVISOR per source); kappa = per-pair
        # winner cap (None = HOSTREFINE_KAPPA)
        self.nprobe = nprobe
        self.kappa = int(kappa or HOSTREFINE_KAPPA)
        self._key = jax.random.key(seed)
        self._step_lock = threading.Lock()
        self._ptables = None
        # centers uploaded ONCE (a per-search jnp.asarray would re-upload
        # [d] f32 per shard per batch through the tunnel)
        self._centers = tuple(
            None if s.center is None else jnp.asarray(s.center)
            for s in shard_set.sources)
        world, thr = self.world, threshold
        k = world.k

        @functools.partial(jax.jit, static_argnames=("strategy",))
        def route_step(params, bank, query_embs, rng, *, strategy: str):
            return _route_fn(world, strategy, params, bank, query_embs,
                             rng, thr)

        self._route_step = route_step
        self._build_device_steps()

    # -- compiled step construction -------------------------------------

    def _res_arrays(self):
        return tuple(
            (s.res_docs, s.res_bias, s.res_scale, self._centers[i])
            for i, s in enumerate(self.shard_set.sources))

    def _coarse_arrays(self):
        return tuple(
            (s.coarse_docs, s.coarse_scale, s.coarse_bias, s.basis,
             None if s.mu_lr is None else s.mu_lr, s.coarse_cl)
            for s in self.shard_set.sources)

    def _build_device_steps(self) -> None:
        world = self.world
        k = world.k
        kp = self.k_refine
        sources = self.shard_set.sources
        # per-source static facts
        res_packed = tuple(self.shard_set.packed4 for _ in sources)
        has_res = tuple(s.res_docs is not None for s in sources)
        has_coarse = tuple(s.coarse_docs is not None
                           or s.coarse_cl is not None for s in sources)
        nprobe_of = tuple(
            None if s.coarse_cl is None else int(min(
                s.coarse_cl.n_clusters,
                max(1, self.nprobe or s.coarse_cl.n_clusters
                    // HOSTREFINE_NPROBE_DIVISOR)))
            for s in sources)
        n_res = tuple(s.n_res for s in sources)
        modes = tuple(s.score_mode for s in sources)
        l2_world = world.sources[0].score_mode == "l2"

        def resident_lists(res_arrays, embs, bsz):
            """Exact per-source key-form top-k over resident rows (+ the
            per-shard l2-centered queries, reused by the slab loop)."""
            per_key, per_id, per_q = [], [], []
            for i, src in enumerate(world.sources):
                docs, bias, scale, center = res_arrays[i]
                q = embs[src.encoder]
                if center is not None and modes[i] == "l2":
                    q = q - center[None, :]
                per_q.append(q)
                if not has_res[i]:
                    per_key.append(jnp.full((bsz, k), NEG_INF, jnp.float32))
                    per_id.append(jnp.zeros((bsz, k), jnp.int32))
                    continue
                s, idx = shard_topk(
                    q, docs, k, mode=modes[i], bias=bias, scale=scale,
                    packed4=res_packed[i])
                key = -s if modes[i] == "l2" else s
                per_key.append(jnp.where(jnp.isnan(key), NEG_INF, key))
                per_id.append(idx)
            return per_key, per_id, per_q

        def finalize(mask, per_key, per_id, embs, res_arrays, ptables):
            """Convert per-shard key lists to natural form (with the dot
            centering restore, which matters only ACROSS shards) and run
            the shared gate+merge."""
            per_nat = []
            for i, src in enumerate(world.sources):
                key = per_key[i]
                center = res_arrays[i][3]
                if modes[i] == "dot" and center is not None:
                    key = key + (embs[src.encoder] @ center)[:, None]
                per_nat.append(-key if modes[i] == "l2" else key)
            scored = gate_and_merge(world, k, mask, per_nat, per_id)
            msg = (payload_base(ptables, scored[1])
                   if ptables is not None else None)
            return scored + (msg,)

        @jax.jit
        def resident_step(res_arrays, embs):
            bsz = embs[world.sources[0].encoder].shape[0]
            pk, pi, pq = resident_lists(res_arrays, embs, bsz)
            return tuple(pk), tuple(pi), tuple(pq)

        @jax.jit
        def finalize_step(mask, per_key, per_id, embs, res_arrays,
                          ptables):
            return finalize(mask, list(per_key), list(per_id), embs,
                            res_arrays, ptables)

        def coarse_queries(embs, coarse_arrays, res_arrays):
            """Per-source projected queries + per-query cross-shard
            constant (the centering/coarse-mean restores that make
            coarse keys comparable ACROSS shards)."""
            qt, const = [], []
            for i, src in enumerate(world.sources):
                basis, mu_lr = coarse_arrays[i][3], coarse_arrays[i][4]
                center = res_arrays[i][3]
                q = embs[src.encoder]
                if not has_coarse[i]:
                    qt.append(None)
                    const.append(None)
                    continue
                if modes[i] == "cos":
                    qn = q / jnp.maximum(
                        jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
                    qt.append(qn @ basis)
                    const.append(qn @ mu_lr)
                elif modes[i] == "l2":
                    qc = q - center[None, :] if center is not None else q
                    qt.append(2.0 * (qc @ basis))
                    # natural-comparable key needs -|q_c|^2 too
                    const.append(2.0 * (qc @ mu_lr)
                                 - jnp.sum(qc * qc, axis=1))
                else:
                    qt.append(q @ basis)
                    c = q @ mu_lr
                    if center is not None:
                        c = c + q @ center
                    const.append(c)
            return qt, const

        # NOTE (round 4, measured): the coarse scan is at the kernel's
        # per-gain merge-traffic bound, NOT a deep-k penalty — scanning
        # pubmed's 17.6M x 128 slab costs 0.472 s at k=32 vs 0.552 s at
        # k=128 (B=2048), and splitting the slab into kp/32 segments
        # scanned at k=32 changed nothing (device step 0.744 -> 0.730 s;
        # tried and reverted this round). The cost law is the one
        # BENCHMARKS.md's lowrank section records: epilogue traffic
        # scales with the NUMBER of gains (B*N), 30.9 ms per 1M docs at
        # this batch -> 25.17M docs predicts 0.78 s, measured 0.73 s.
        # Cutting it needs FEWER gains (probing/pruning the coarse
        # slab), not a cheaper merge.
        @functools.partial(jax.jit,
                           static_argnames=("strategy", "per_source"))
        def hostrefine_step(params, bank, res_arrays, coarse_arrays,
                            embs, rng, ptables, *, strategy: str,
                            per_source: bool):
            """The hostrefine tier's single fused dispatch."""
            probs, mask = _route_fn(world, strategy, params, bank, embs,
                                    rng, self.threshold)
            bsz = embs[world.sources[0].encoder].shape[0]
            pk, pi, _ = resident_lists(res_arrays, embs, bsz)
            qt, const = coarse_queries(embs, coarse_arrays, res_arrays)
            cand_src = []            # per host source [B, kp] ids
            stats_ids = []           # per source [B, k] ids (msg sizing)
            keys = []                # per host source [B, kp] global keys
            for i, src in enumerate(world.sources):
                if not has_coarse[i]:
                    stats_ids.append(pi[i])
                    cand_src.append(None)
                    keys.append(None)
                    continue
                cdocs, cscale, cbias, _, _, cl = coarse_arrays[i]
                if cl is not None:
                    # probed scan over the clustered coarse slab
                    from ragroute_tpu.ops.grouped_topk import \
                        coarse_probe_topk

                    cs, ci = coarse_probe_topk(
                        qt[i], cl, kp, nprobe=nprobe_of[i],
                        kappa=self.kappa)
                    # invalid candidates carry id -1 (excluded downstream)
                    stats_ids.append(jnp.maximum(ci[:, :k], 0))
                    cand_src.append(ci)
                    keys.append(cs + const[i][:, None])
                    continue
                # clamp to the slab height (a just-over-k source with a
                # large --refine-mult would fail lax.top_k at trace time,
                # mirroring lowrank_topk's kr clamp), then pad back to kp
                # with never-wins sentinels for the fixed-width concat
                kp_i = min(kp, cdocs.shape[0])
                cs, ci = shard_topk(qt[i], cdocs, kp_i, mode="dot",
                                    bias=cbias, scale=cscale)
                if kp_i < kp:
                    cs = jnp.pad(cs, ((0, 0), (0, kp - kp_i)),
                                 constant_values=jnp.nan)
                    ci = jnp.pad(ci, ((0, 0), (0, kp - kp_i)),
                                 constant_values=-1)
                stats_ids.append(ci[:, :k])
                cand_src.append(ci)
                keys.append(cs + const[i][:, None])
            msg = stats = None
            if ptables is not None and not per_source:
                msg = payload_base(ptables, jnp.stack(stats_ids, axis=1))
            elif not per_source:
                # no payload tables: the host estimator needs per-source
                # top-k ids (coarse-ordered for host sources — the
                # message-size observability metric, not the ranking).
                # per-source candidate mode never consumes these — the
                # refined per-source lists serve as shard_ids — so don't
                # build + fetch a [B, N, k] tensor it would discard
                stats = jnp.stack(stats_ids, axis=1)
            if per_source:
                cands = tuple(c for c in cand_src if c is not None)
                return (probs, mask, tuple(pk), tuple(pi), cands, msg,
                        None, stats)
            # score-merged worlds: mask-gated GLOBAL coarse cut so only
            # [B, kp] (id, shard) pairs cross the wire
            gk, gi, gs = [], [], []
            for i in range(len(world.sources)):
                if keys[i] is None:
                    continue
                kkey = jnp.where(jnp.isnan(keys[i]), NEG_INF, keys[i])
                gk.append(jnp.where(mask[:, i:i + 1], kkey, NEG_INF))
                gi.append(cand_src[i])
                gs.append(jnp.full(cand_src[i].shape, i, jnp.int32))
            gkc = jnp.concatenate(gk, axis=1)
            top, pos = jax.lax.top_k(gkc, kp)
            cand_id = jnp.take_along_axis(
                jnp.concatenate(gi, axis=1), pos, axis=1)
            cand_shard = jnp.take_along_axis(
                jnp.concatenate(gs, axis=1), pos, axis=1)
            cand_shard = jnp.where(top > NEG_INF, cand_shard, -1)
            return (probs, mask, tuple(pk), tuple(pi), None, msg,
                    (cand_id, cand_shard), stats)

        self._resident_step = resident_step
        self._finalize_step = finalize_step
        self._hostrefine_step = hostrefine_step
        self._n_res = n_res
        self._has_res = has_res
        self._has_coarse = has_coarse
        self._modes = modes
        self._l2_world = l2_world

    # -- ShardSet-compatible serving hooks ------------------------------

    def set_payload_tables(self, per_source, names) -> None:
        self._ptables = (None if per_source is None else
                         build_payload_tables(per_source, names,
                                              self.world.k))

    def _next_key(self, strategy: str) -> jax.Array:
        if strategy != "random":
            return self._key
        self._key, sub = jax.random.split(self._key)
        return sub

    def _router_inputs(self, strategy: str):
        if strategy == "ragroute":
            if self.params is None or self.bank is None:
                raise ValueError(
                    "routing strategy 'ragroute' needs router params + bank")
            return self.params, self.bank
        if self.params is not None and self.bank is not None:
            return self.params, self.bank
        from ragroute_tpu.router.features import RouterBank
        from ragroute_tpu.router.mlp import init_router_params

        if not hasattr(self, "_zero_params"):
            self._zero_params = init_router_params(
                jax.random.key(0), self.world.router_input_dim)
            self._zero_bank = RouterBank.create(
                self.world,
                {s.name: np.zeros(s.embed_dim, np.float32)
                 for s in self.world.sources})
        return self._zero_params, self._zero_bank

    # -- search ---------------------------------------------------------

    def search(
        self,
        query_embs: Dict[str, np.ndarray],
        *,
        strategy: str = "ragroute",
        staged: bool = True,
        fetch_candidates: bool = True,
    ) -> SearchOutput:
        if self.tier == "hostrefine":
            # dispatch takes the step lock itself; the host completion
            # phase runs outside it (pipelineable, see
            # dispatch_hostrefine)
            return self._search_hostrefine(
                query_embs, strategy=strategy,
                fetch_candidates=fetch_candidates)
        with self._step_lock:
            return self._search_stream(
                query_embs, strategy=strategy,
                fetch_candidates=fetch_candidates)

    # -- stream tier ----------------------------------------------------

    def _search_stream(self, query_embs, *, strategy: str,
                       fetch_candidates: bool) -> SearchOutput:
        embs = self._device_embs(query_embs)
        rng = self._next_key(strategy)
        params, bank = self._router_inputs(strategy)
        res_arrays = self._res_arrays()

        t0 = time.perf_counter()
        probs, mask = self._route_step(params, bank, embs, rng,
                                       strategy=strategy)
        mask_h = np.asarray(jax.device_get(mask))
        sel_t = time.perf_counter() - t0

        t0 = time.perf_counter()
        per_key, per_id, per_q = self._resident_step(res_arrays, embs)
        per_key, per_id = list(per_key), list(per_id)

        # host-slab loop with device_put prefetch: slabs of shard i are
        # skipped entirely when no query in the batch routed to i (the
        # reference's "don't query unselected sources" saving — here it
        # saves the dominant cost, the host->device stream)
        plan: List[Tuple[int, int]] = []
        for i, s in enumerate(self.shard_set.sources):
            if s.host is not None and mask_h[:, i].any():
                plan.extend((i, j) for j in range(s.n_slabs))
        puts: List = [None] * len(plan)

        def put(idx):
            i, j = plan[idx]
            codes, bias, scale, off = self.shard_set.sources[i].slab(j)
            return (jax.device_put(codes), jax.device_put(bias),
                    None if scale is None else jax.device_put(scale),
                    np.int32(off))

        for idx in range(min(self.prefetch, len(plan))):
            puts[idx] = put(idx)
        for idx, (i, j) in enumerate(plan):
            codes, bias, scale, off = puts[idx]
            puts[idx] = None
            src = self.shard_set.sources[i]
            per_key[i], per_id[i] = _slab_merge(
                per_key[i], per_id[i], per_q[i], codes, bias, scale, off,
                k=self.world.k, mode=src.score_mode,
                packed4=src.host.packed4)
            nxt = idx + self.prefetch
            if nxt < len(plan):
                puts[nxt] = put(nxt)

        scored = self._finalize_step(
            mask, tuple(per_key), tuple(per_id), embs, res_arrays,
            self._ptables)
        return self._fetch_output(probs, mask, scored,
                                  fetch_candidates=fetch_candidates,
                                  sel_t=sel_t, t0=t0)

    def _fetch_output(self, probs, mask, scored, *, fetch_candidates,
                      sel_t, t0) -> SearchOutput:
        msg_dev = scored[6]
        msg_base = None
        if fetch_candidates:
            (probs, mask, shard_scores, shard_ids, merged_score,
             merged_shard, merged_local, merged_valid) = jax.device_get(
                (probs, mask) + tuple(scored[:6]))
        elif msg_dev is not None:
            shard_scores = None
            shard_ids = None
            (probs, mask, merged_score, merged_shard, merged_local,
             merged_valid, msg_base) = jax.device_get(
                (probs, mask) + tuple(scored[2:7]))
        else:
            shard_scores = None
            (probs, mask, shard_ids, merged_score, merged_shard,
             merged_local, merged_valid) = jax.device_get(
                (probs, mask, scored[1]) + tuple(scored[2:6]))
        return SearchOutput(
            probs=probs, mask=np.asarray(mask),
            shard_scores=shard_scores, shard_ids=shard_ids,
            merged_score=merged_score, merged_shard=merged_shard,
            merged_local=merged_local, merged_valid=merged_valid,
            msg_base=msg_base, selection_time=sel_t,
            doc_select_time=time.perf_counter() - t0)

    # -- hostrefine tier -------------------------------------------------

    def dispatch_hostrefine(self, query_embs, *, strategy: str,
                            fetch_candidates: bool):
        """Enqueue one hostrefine device step WITHOUT fetching results.

        Returns an opaque handle for :meth:`complete_hostrefine`. The
        split exists so a serving/bench loop can PIPELINE batches: the
        host-side exact rescore of batch t (0.4+ s at the 25M bench
        point) runs while the device scans batch t+1 — the device and
        the host each become the only bound on their own phase.
        """
        world = self.world
        # a fully-resident world (every source fit the HBM budget) has
        # no coarse slabs: the global-cut branch would concatenate
        # nothing, so run the per-source path (exact resident merge)
        per_source = fetch_candidates or not any(self._has_coarse)
        with self._step_lock:
            embs = self._device_embs(query_embs)
            q_host = self._host_embs(query_embs)
            rng = self._next_key(strategy)
            params, bank = self._router_inputs(strategy)
            t0 = time.perf_counter()
            out = self._hostrefine_step(
                params, bank, self._res_arrays(), self._coarse_arrays(),
                embs, rng, self._ptables, strategy=strategy,
                per_source=per_source)
        return (out, q_host, fetch_candidates, per_source, t0)

    def complete_hostrefine(self, handle) -> SearchOutput:
        out, q_host, fetch_candidates, per_source, t0 = handle
        return self._complete_hostrefine(
            out, q_host, fetch_candidates=fetch_candidates,
            per_source=per_source, t0=t0)

    def _search_hostrefine(self, query_embs, *, strategy: str,
                           fetch_candidates: bool) -> SearchOutput:
        return self.complete_hostrefine(self.dispatch_hostrefine(
            query_embs, strategy=strategy,
            fetch_candidates=fetch_candidates))

    def search_submit(self, query_embs, *, strategy: str = "ragroute",
                      staged: bool = True, fetch_candidates: bool = True):
        """Deferred-completion search (the native front-end's pipelined
        loop contract, :class:`engine.engine.PendingSearch`): hostrefine
        returns immediately after the device dispatch; ``wait()`` runs
        the fetch + host exact rescore — so the C++ plane's pipeline
        mode overlaps batch N's refine with batch N+1's device scan,
        exactly like the asyncio batcher's pipelined worker. The stream
        tier's slab loop is inherently synchronous; it completes inline
        and wait() just hands the result over."""
        if self.tier == "hostrefine":
            return _PendingStreamed(self, self.dispatch_hostrefine(
                query_embs, strategy=strategy,
                fetch_candidates=fetch_candidates))
        return _DoneStreamed(self.search(
            query_embs, strategy=strategy, staged=staged,
            fetch_candidates=fetch_candidates))

    def _complete_hostrefine(self, out, q_host, *, fetch_candidates,
                             per_source, t0) -> SearchOutput:
        world = self.world
        k = world.k
        probs_d, mask_d, pk_d, pi_d, cands_d, msg_d, glob_d, stats_d = out
        if per_source:
            need = tuple(range(len(world.sources)))
        else:
            # score-merged mode consumes resident-exact lists only for
            # sources WITHOUT a coarse slab; every other pk/pi is -inf
            # placeholder padding — don't pay the (slow) host link for
            # it (4x [B, k] f32+i32 saved at the 25M-doc bench point)
            need = tuple(i for i in range(len(world.sources))
                         if self._has_res[i] and not self._has_coarse[i])
        fetch = (probs_d, mask_d,
                 tuple(pk_d[i] for i in need),
                 tuple(pi_d[i] for i in need))
        if per_source:
            fetch = fetch + (cands_d,)
        else:
            fetch = fetch + (glob_d,)
        if msg_d is not None:
            fetch = fetch + (msg_d,)
        elif stats_d is not None:
            fetch = fetch + (stats_d,)
        got = jax.device_get(fetch)
        t_fetch = time.perf_counter()
        probs, mask = got[0], np.asarray(got[1])
        pk, pi = got[2], got[3]
        extra = got[4]
        msg_base = got[5] if msg_d is not None else None
        stats_ids = (np.asarray(got[5], np.int32)
                     if msg_d is None and stats_d is not None else None)
        # routing is fused into the device dispatch above; see the module
        # docstring for the /stats semantics of this tier
        sel_t = 0.0
        t_refine = time.perf_counter()

        # natural-form per-source lists from the device keys (resident
        # exact sources; host sources hold -inf placeholders)
        per_scores: List[Optional[np.ndarray]] = \
            [None] * len(world.sources)
        per_ids: List[Optional[np.ndarray]] = [None] * len(world.sources)
        for j, i in enumerate(need):
            src = world.sources[i]
            key = np.asarray(pk[j], np.float32)
            if self._modes[i] == "dot" and \
                    self.shard_set.sources[i].center is not None \
                    and self._has_res[i]:
                key = key + (q_host[src.encoder] @
                             self.shard_set.sources[i].center)[:, None]
            nat = -key if self._modes[i] == "l2" else key
            nat = np.where(np.isinf(nat), np.nan, nat)
            per_scores[i] = nat
            per_ids[i] = np.asarray(pi[j], np.int32)

        if per_source:
            ci = 0
            for i, src in enumerate(world.sources):
                if not self._has_coarse[i]:
                    continue
                cand = np.asarray(extra[ci], np.int32)
                ci += 1
                if not mask[:, i].any():
                    continue
                s, ids = self.shard_set.refine(
                    i, q_host[src.encoder], cand, k)
                per_scores[i], per_ids[i] = s, np.where(ids < 0, 0, ids)
            (shard_scores, shard_ids, merged_score, merged_shard,
             merged_local, merged_valid) = _host_gate_and_merge(
                world, k, mask, per_scores, per_ids)
        else:
            cand_id, cand_shard = (np.asarray(extra[0], np.int32),
                                   np.asarray(extra[1], np.int32))
            (merged_score, merged_shard, merged_local,
             merged_valid) = self._merge_global(
                q_host, mask, per_scores, per_ids, cand_id, cand_shard, k)
            shard_scores = shard_ids = None
        # phase telemetry for /stats + the capacity bench: device step +
        # candidate fetch vs host-side refine/merge
        self.last_phases = {
            "device_and_fetch_s": round(t_fetch - t0, 4),
            "refine_merge_s": round(time.perf_counter() - t_refine, 4),
        }
        if not fetch_candidates:
            shard_scores = None
            if msg_base is not None:
                shard_ids = None
            elif shard_ids is None:
                shard_ids = stats_ids  # host msg-size estimator input
        return SearchOutput(
            probs=np.asarray(probs), mask=mask,
            shard_scores=shard_scores, shard_ids=shard_ids,
            merged_score=merged_score, merged_shard=merged_shard,
            merged_local=merged_local, merged_valid=merged_valid,
            msg_base=msg_base, selection_time=sel_t,
            doc_select_time=time.perf_counter() - t0)

    def _merge_global(self, q_host, mask, per_scores, per_ids, cand_id,
                      cand_shard, k: int):
        """Mode-A merge: exact-rescore the mask-gated GLOBAL candidate
        list on its flat layout (no per-source re-packing — the old
        max-width dense packing cost up to a 4x work blowup on skewed
        candidate distributions) and merge it with the resident-exact
        per-source lists into the final [B, k]. FAISS-parity ties:
        (key desc, shard asc, doc id asc) via one lexsort."""
        world = self.world
        bsz, kp = cand_id.shape
        l2 = self._l2_world
        flat_b = np.repeat(np.arange(bsz, dtype=np.int64), kp)
        flat_id = cand_id.reshape(-1)
        flat_sh = cand_shard.reshape(-1)
        nat_flat = np.full(bsz * kp, np.nan, np.float32)
        for i, src in enumerate(world.sources):
            if not self._has_coarse[i]:
                continue
            sel = np.flatnonzero(flat_sh == i)
            if not sel.size:
                continue
            nat_flat[sel] = self.shard_set.refine_flat(
                i, q_host[src.encoder], flat_id[sel], flat_b[sel])
        cols = [(nat_flat.reshape(bsz, kp), cand_shard, cand_id)]
        # resident-exact sources join as extra candidates (mask-gated)
        for i in range(len(world.sources)):
            if self._has_coarse[i] or not self._has_res[i]:
                continue
            s = np.where(mask[:, i:i + 1], per_scores[i], np.nan)
            cols.append((s, np.full_like(per_ids[i], i), per_ids[i]))
        nat = np.concatenate([c[0] for c in cols], axis=1)
        shard = np.concatenate([c[1] for c in cols], axis=1)
        ids = np.concatenate([c[2] for c in cols], axis=1)
        key = np.where(np.isnan(nat), -np.inf, -nat if l2 else nat)
        key = np.where(shard >= 0, key, -np.inf)
        order = np.lexsort(
            (ids, np.where(shard >= 0, shard, np.iinfo(np.int32).max),
             -key), axis=1)[:, :k]
        top_key = np.take_along_axis(key, order, axis=1)
        valid = top_key > -np.inf
        merged_score = np.where(
            valid, -top_key if l2 else top_key, np.nan).astype(np.float32)
        merged_shard = np.where(
            valid, np.take_along_axis(shard, order, axis=1), -1)
        merged_local = np.where(
            valid, np.take_along_axis(ids, order, axis=1), 0)
        return (merged_score, merged_shard.astype(np.int32),
                merged_local.astype(np.int32),
                valid.sum(axis=1).astype(np.int32))
