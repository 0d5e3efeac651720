"""Capacity tier x mesh: the hostrefine engine served over devices.

Round-4 left ``--impl hostrefine`` and ``--mesh`` mutually exclusive by
fiat — one chip + host RAM, or many chips, pick one. The reference's
federation scales by adding host-RAM nodes (one FAISS process per
source, ``/root/reference/ragroute/ragroute.py:49-54``); the TPU-native
analogue composes BOTH axes: every ``idx`` device owns a row slice of
each source's device-resident coarse slab (and of fully-resident
sources' exact rows), candidates all-gather over ICI exactly like the
flat mesh path, and the host exact-rescores the merged candidate ids
from its RAM rows. 8 devices x ~25M docs/chip of coarse capacity is the
~200M-docs-per-pod architecture; with the host tier bounded by host RAM
the corpus ceiling is per-HOST, not per-chip.

Design notes:

* The coarse scan IS :func:`parallel.sharded.sharded_shard_topk` run on
  the projected queries against the row-sharded coarse slab (mode
  "dot", per-doc int8 scales, stored gain biases) — per-device fused
  top-k' then an ``[idx, B/dp, k']`` candidate all-gather. No new
  collective machinery.
* Each device keeps ``k'`` candidates before the gather, so the mesh
  OVERSAMPLES the single-chip candidate depth by up to ``n_idx`` — the
  coarse cut's recall under sharding can only improve (same argument as
  the sharded lowrank path).
* The global mask-gated cut across sources and the exact rescore reuse
  the single-chip engine's host logic verbatim
  (:meth:`engine.streamed.StreamedSearchEngine._merge_global` /
  :meth:`index.streamed.StreamedShardSet.refine`).
* Clustered (probed) coarse slabs are a single-chip throughput
  optimization; the mesh path scans its flat slice exhaustively — the
  per-device gain count already divides by ``n_idx``, which is the
  same lever probing pulls. Build mesh worlds with
  ``cluster_coarse=False``.
* Multi-host meshes would need the host rows partitioned per process
  (per-host refine + a result allgather, ``parallel/multihost.py``);
  single-process meshes (one host, many chips — the v5e-8 box) are what
  this class serves and it refuses multi-process meshes loudly.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ragroute_tpu.engine.engine import SearchOutput, _route_fn
from ragroute_tpu.engine.streamed import (StreamedSearchEngine,
                                          _host_gate_and_merge)
from ragroute_tpu.index.streamed import StreamedShardSet
from ragroute_tpu.parallel.sharded import sharded_shard_topk


class MeshStreamedEngine(StreamedSearchEngine):
    """Hostrefine capacity tier over a ``(dp, idx)`` mesh.

    Same host-facing contract as :class:`StreamedSearchEngine` (the
    batcher/server stack runs unchanged — including the pipelined
    dispatch/complete serving loop: the host-side candidate rescore of
    batch t overlaps batch t+1's sharded device scans); the device
    work shards over the mesh.
    """

    def __init__(
        self,
        shard_set: StreamedShardSet,
        router_params,
        bank,
        mesh: Mesh,
        *,
        threshold: Optional[float] = None,
        seed: int = 0,
        k_refine: Optional[int] = None,
    ):
        if shard_set.tier != "hostrefine":
            raise ValueError(
                "MeshStreamedEngine serves tier='hostrefine' (the stream "
                "tier's per-batch slab upload is a single-chip design)")
        if any(s.coarse_cl is not None for s in shard_set.sources):
            raise ValueError(
                "clustered coarse slabs are single-chip; build the mesh "
                "world with cluster_coarse=False (each device scans its "
                "flat slice — the mesh already divides the gain count)")
        if any(d.process_index != jax.process_index()
               for d in np.asarray(mesh.devices).flat):
            raise ValueError(
                "multi-process meshes need per-host refine over "
                "partitioned host rows; MeshStreamedEngine serves "
                "single-process (one host, many chips) meshes")
        self.mesh = mesh
        self.dp = int(mesh.shape["dp"])
        self.n_idx = int(mesh.shape["idx"])
        super().__init__(shard_set, router_params, bank,
                         threshold=threshold, seed=seed,
                         k_refine=k_refine)

    # -- device-step construction (mesh variants) ------------------------

    def _build_device_steps(self) -> None:
        mesh = self.mesh
        world = self.world
        sources = self.shard_set.sources
        n_idx = self.n_idx
        repl = NamedSharding(mesh, P())
        rows_sh = NamedSharding(mesh, P("idx", None))
        vec_sh = NamedSharding(mesh, P("idx"))

        self._has_res = tuple(s.res_docs is not None for s in sources)
        self._has_coarse = tuple(s.coarse_docs is not None
                                 for s in sources)
        self._modes = tuple(s.score_mode for s in sources)
        self._l2_world = world.sources[0].score_mode == "l2"

        self.params = jax.device_put(self.params, repl)
        self.bank = jax.device_put(self.bank, repl)
        self._centers = tuple(
            None if s.center is None
            else jax.device_put(jnp.asarray(s.center), repl)
            for s in sources)

        def pad_rows(docs, bias, scale):
            n = docs.shape[0]
            pad = (-n) % n_idx
            if pad:
                docs = jnp.pad(docs, ((0, pad), (0, 0)))
                bias = jnp.pad(bias, (0, pad), constant_values=-jnp.inf)
                if scale is not None:
                    scale = jnp.pad(
                        scale,
                        ((0, pad),) + ((0, 0),) * (scale.ndim - 1))
            return docs, bias, scale

        # sharded copies; originals dropped (ShardedSearch discipline —
        # keeping both doubles HBM for the server's lifetime)
        self._res_sh = []
        self._coarse_sh = []
        for s in sources:
            if s.res_docs is not None:
                d, b, sc = pad_rows(s.res_docs, s.res_bias, s.res_scale)
                self._res_sh.append((
                    jax.device_put(d, rows_sh),
                    jax.device_put(b, vec_sh),
                    None if sc is None else jax.device_put(
                        sc, vec_sh if sc.ndim == 1 else rows_sh)))
                s.res_docs = s.res_bias = s.res_scale = None
            else:
                self._res_sh.append(None)
            if s.coarse_docs is not None:
                d, b, sc = pad_rows(s.coarse_docs, s.coarse_bias,
                                    s.coarse_scale)
                self._coarse_sh.append((
                    jax.device_put(d, rows_sh),
                    jax.device_put(b, vec_sh),
                    jax.device_put(sc, vec_sh),
                    jax.device_put(s.basis, repl),
                    jax.device_put(s.mu_lr, repl)))
                s.coarse_docs = s.coarse_bias = s.coarse_scale = None
                s.basis = s.mu_lr = None
            else:
                self._coarse_sh.append(None)

        import functools

        @functools.partial(jax.jit, static_argnames=("strategy",))
        def route_step(params, bank, query_embs, rng, *, strategy: str):
            return _route_fn(world, strategy, params, bank, query_embs,
                             rng, self.threshold)

        @jax.jit
        def project_step(coarse_params, embs):
            """Per-source projected queries + cross-shard key constants
            (the same math as the single-chip ``coarse_queries``)."""
            qt, const = [], []
            for i, src in enumerate(world.sources):
                if self._coarse_sh[i] is None:
                    qt.append(None)
                    const.append(None)
                    continue
                basis, mu_lr = coarse_params[i]
                center = self._centers[i]
                q = embs[src.encoder]
                if self._modes[i] == "cos":
                    qn = q / jnp.maximum(
                        jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
                    qt.append(qn @ basis)
                    const.append(qn @ mu_lr)
                elif self._modes[i] == "l2":
                    qc = q - center[None, :] if center is not None else q
                    qt.append(2.0 * (qc @ basis))
                    const.append(2.0 * (qc @ mu_lr)
                                 - jnp.sum(qc * qc, axis=1))
                else:
                    qt.append(q @ basis)
                    c = q @ mu_lr
                    if center is not None:
                        c = c + q @ center
                    const.append(c)
            return tuple(qt), tuple(const)

        self._route_step = route_step
        self._project_step = project_step
        self._q_sharding = NamedSharding(mesh, P("dp", None))

    # -- search ----------------------------------------------------------

    def search(self, query_embs, *, strategy: str = "ragroute",
               staged: bool = True,
               fetch_candidates: bool = True) -> SearchOutput:
        return self.complete_hostrefine(self.dispatch_hostrefine(
            query_embs, strategy=strategy,
            fetch_candidates=fetch_candidates))

    def _device_embs(self, query_embs):
        embs = super()._device_embs(query_embs)
        out = {}
        for enc, arr in embs.items():
            if arr.shape[0] % self.dp:
                raise ValueError(
                    f"batch {arr.shape[0]} not divisible by mesh "
                    f"dp={self.dp} (use dp-multiple batch buckets)")
            out[enc] = jax.device_put(arr, self._q_sharding)
        return out

    def dispatch_hostrefine(self, query_embs, *, strategy: str,
                            fetch_candidates: bool):
        """Enqueue the mesh device work without any host sync (same
        dispatch/complete contract as the single-chip tier, so the
        batcher's pipelined worker and the native plane's pipeline
        mode serve the mesh engine identically)."""
        world = self.world
        k = world.k
        kp = self.k_refine
        mesh = self.mesh
        with self._step_lock:
            embs = self._device_embs(query_embs)
            q_host = self._host_embs(query_embs)
            rng = self._next_key(strategy)
            params, bank = self._router_inputs(strategy)
            t0 = time.perf_counter()
            probs_d, mask_d = self._route_step(params, bank, embs, rng,
                                               strategy=strategy)
            coarse_params = tuple(
                None if c is None else (c[3], c[4])
                for c in self._coarse_sh)
            qt, const = self._project_step(coarse_params, embs)
            keys_dev, ids_dev = {}, {}
            res_dev = {}
            for i, src in enumerate(world.sources):
                if self._coarse_sh[i] is not None:
                    docs, bias, scale, _, _ = self._coarse_sh[i]
                    kp_i = min(kp, docs.shape[0] // self.n_idx)
                    keys_dev[i], ids_dev[i] = sharded_shard_topk(
                        mesh, qt[i], docs, bias, kp_i, mode="dot",
                        scale=scale)
                elif self._res_sh[i] is not None:
                    docs, bias, scale = self._res_sh[i]
                    res_dev[i] = sharded_shard_topk(
                        mesh, embs[src.encoder], docs, bias, k,
                        mode=self._modes[i], scale=scale,
                        center=self._centers[i],
                        packed4=self.shard_set.packed4)
        return ((probs_d, mask_d, keys_dev, ids_dev, res_dev, const),
                q_host, fetch_candidates, t0)

    def complete_hostrefine(self, handle) -> SearchOutput:
        dev, q_host, fetch_candidates, t0 = handle
        return self._complete_mesh(dev, q_host,
                                   fetch_candidates=fetch_candidates,
                                   t0=t0)

    def _complete_mesh(self, dev, q_host, *, fetch_candidates,
                       t0) -> SearchOutput:
        world = self.world
        k = world.k
        kp = self.k_refine
        probs_d, mask_d, keys_dev, ids_dev, res_dev, const_d = dev
        (probs, mask, keys_h, ids_h, res_h, const) = jax.device_get(
            (probs_d, mask_d, keys_dev, ids_dev, res_dev, const_d))
        mask = np.asarray(mask)
        sel_t = 0.0  # routing fused into the dispatch (module docstring)

        # host: per-source natural lists for resident-exact sources
        per_scores = [None] * len(world.sources)
        per_ids = [None] * len(world.sources)
        for i, (s, ids) in res_h.items():
            nat = np.asarray(s, np.float32)
            nat = np.where(np.isinf(nat), np.nan, nat)
            per_scores[i] = nat
            per_ids[i] = np.asarray(ids, np.int32)

        if fetch_candidates:
            # per-source candidate mode: refine each coarse source
            for i, src in enumerate(world.sources):
                if i not in keys_h or not mask[:, i].any():
                    continue
                cand = np.asarray(ids_h[i], np.int32)
                cand = np.where(np.asarray(keys_h[i]) > -np.inf, cand, -1)
                s, ids = self.shard_set.refine(
                    i, q_host[src.encoder], cand, k)
                per_scores[i] = s
                per_ids[i] = np.where(ids < 0, 0, ids)
            for i in range(len(world.sources)):
                if per_scores[i] is None:
                    bsz = mask.shape[0]
                    per_scores[i] = np.full((bsz, k), np.nan, np.float32)
                    per_ids[i] = np.zeros((bsz, k), np.int32)
            (shard_scores, shard_ids, merged_score, merged_shard,
             merged_local, merged_valid) = _host_gate_and_merge(
                world, k, mask, per_scores, per_ids)
        else:
            # mask-gated GLOBAL coarse cut (host mirror of the fused
            # single-chip step), then the shared flat-rescore merge
            gk, gi, gs = [], [], []
            for i in range(len(world.sources)):
                if i not in keys_h:
                    continue
                kk = (np.asarray(keys_h[i], np.float32)
                      + np.asarray(const[i], np.float32)[:, None])
                kk = np.where(np.isnan(kk), -np.inf, kk)
                gk.append(np.where(mask[:, i:i + 1], kk, -np.inf))
                gi.append(np.asarray(ids_h[i], np.int32))
                gs.append(np.full(gi[-1].shape, i, np.int32))
            gkc = np.concatenate(gk, axis=1)
            kp_cut = min(kp, gkc.shape[1])
            pos = np.argsort(-gkc, axis=1, kind="stable")[:, :kp_cut]
            top = np.take_along_axis(gkc, pos, axis=1)
            cand_id = np.take_along_axis(
                np.concatenate(gi, axis=1), pos, axis=1)
            cand_shard = np.where(
                top > -np.inf,
                np.take_along_axis(np.concatenate(gs, axis=1), pos,
                                   axis=1), -1)
            (merged_score, merged_shard, merged_local,
             merged_valid) = self._merge_global(
                q_host, mask, per_scores, per_ids, cand_id, cand_shard, k)
            shard_scores = None
            # msg-size estimator input: coarse-ordered top-k ids for
            # host sources, exact ids for resident ones (same /stats
            # semantics as the single-chip tier, see engine.streamed)
            bsz = mask.shape[0]
            stats = []
            for i in range(len(world.sources)):
                if i in keys_h:
                    stats.append(np.maximum(
                        np.asarray(ids_h[i], np.int32)[:, :k], 0))
                elif per_ids[i] is not None:
                    stats.append(per_ids[i])
                else:
                    stats.append(np.zeros((bsz, k), np.int32))
            shard_ids = np.stack(stats, axis=1)
        return SearchOutput(
            probs=np.asarray(probs), mask=mask,
            shard_scores=shard_scores, shard_ids=shard_ids,
            merged_score=merged_score, merged_shard=merged_shard,
            merged_local=merged_local, merged_valid=merged_valid,
            msg_base=None, selection_time=sel_t,
            doc_select_time=time.perf_counter() - t0)
