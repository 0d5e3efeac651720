"""Mesh-sharded federated search: the multi-chip scaling path.

The reference federates corpora across OS processes on one machine
(``ragroute/ragroute.py:49-54``) and cannot scale past one node (ZMQ
sockets hardcoded to localhost, ``config.py:3-10``). Here the scale-out
story is a ``jax.sharding.Mesh``:

* the document axis of every corpus is split across the ``idx`` mesh axis
  (a corpus bigger than one chip's HBM spans chips);
* the query batch is split across the ``dp`` axis;
* each device runs the fused local top-k kernel on its slice, then an
  ``all_gather`` over ICI moves only ``[idx, B/dp, k]`` candidate
  (score, id) pairs — never embeddings — and every device computes the
  identical global merge (SURVEY §7 "segmented top-k").

Communication per corpus per batch: ``idx * B/dp * k * 8`` bytes — for
B=512, k=32, 8 chips that's ~1 MB over ICI vs the reference's per-query
JSON-serialized float lists over TCP (``router.py:317-319``).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ragroute_tpu import config as cfg_mod
from ragroute_tpu.config import COMPACTION_MIN_ROWS, WorldConfig
from ragroute_tpu.engine.engine import (_route_fn, build_payload_tables,
                                        gate_and_merge, payload_base)
from ragroute_tpu.index.ivf import IVFData
from ragroute_tpu.index.shard import ShardSet
from ragroute_tpu.ops.topk import NEG_INF, _prepare_queries, shard_topk, \
    gain_to_natural, unpack_int4
from ragroute_tpu.router.features import RouterBank
from ragroute_tpu.router.mlp import CorpusRouterParams


def sharded_shard_topk(
    mesh: Mesh,
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    bias: jnp.ndarray,
    k: int,
    *,
    mode: str = "dot",
    impl: str = "auto",
    routed: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
    center: Optional[jnp.ndarray] = None,
    packed4: bool = False,
    lr=None,
    k_refine: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a doc-axis-sharded corpus.

    ``packed4``: docs is an int4-packed shard ``[N, d//2]`` int8 — the
    doc-axis sharding splits rows, so packing is orthogonal and flows
    straight to the per-device :func:`shard_topk`.

    ``queries [B, d]`` is split over ``dp`` (replicated over ``idx``);
    ``docs [N, d]`` / ``bias [N]`` are split over ``idx`` (replicated over
    ``dp``). Padding rows must carry ``-inf`` bias (ShardSet does this).
    ``routed [B] bool`` (dp-split) enables routing-aware compaction: when
    at most half of a device's local batch routes here, only a gathered
    half batch is scored (per-device ``lax.cond``; safe under SPMD since
    neither branch contains a collective — the all-gather merge runs
    unconditionally after). Returns globally-merged
    ``(scores [B, k], global_indices [B, k])``, batch-sharded over ``dp``.

    ``lr`` (a :class:`ragroute_tpu.index.lowrank.LowRankData` with
    ``docs_lr`` row-sharded over ``idx`` and the basis replicated) swaps
    the per-device exact scan for the two-stage coarse-scan+refine search
    at candidate depth ``k_refine`` PER DEVICE: the refine gather indexes
    only the device's own rows (coarse indices are local), so the only
    collective stays the final candidate all-gather. Per-device depth
    also means the mesh oversamples n_idx times more than one chip —
    recall can only improve under sharding.
    """
    n_idx = mesh.shape["idx"]
    dot_restore = None
    if center is not None:
        # mean-centered lossy-dtype shard (docs hold residuals, center
        # replicated). l2: shift queries once outside the mesh body
        # (|q-d|^2 invariant); dot: ordering of q.(d-mu) is invariant,
        # restore the per-query constant q.mu on the merged output.
        if mode == "l2":
            queries = queries.astype(jnp.float32) - center
        elif mode == "dot":
            dot_restore = queries.astype(jnp.float32) @ center
    n = docs.shape[0]
    if n % n_idx != 0:
        raise ValueError(f"doc axis {n} not divisible by idx={n_idx}")
    n_local = n // n_idx
    l2 = mode == "l2"
    worst = jnp.inf if l2 else -jnp.inf

    def local_topk(q_l, docs_l, bias_l, routed_l, scale_l, lr_l):
        def score(qq):
            if lr_l is not None:
                from ragroute_tpu.ops.lowrank_topk import lowrank_topk

                # center handling was already applied outside shard_map
                return lowrank_topk(
                    qq, lr_l, docs_l, k, mode=mode, bias=bias_l,
                    scale=scale_l, packed4=packed4, k_refine=k_refine,
                    coarse_impl=impl)
            return shard_topk(qq, docs_l, k, mode=mode, bias=bias_l,
                              scale=scale_l, impl=impl, packed4=packed4)

        if routed_l is None:
            return score(q_l)
        bsz_l = q_l.shape[0]
        half = bsz_l // 2

        def full():
            return score(q_l)

        def compact():
            order = jnp.argsort(jnp.logical_not(routed_l), stable=True)
            sel = order[:half]
            s_c, i_c = score(q_l[sel])
            s = jnp.full((bsz_l, k), worst,
                         dtype=jnp.float32).at[sel].set(s_c)
            idx = jnp.zeros((bsz_l, k), dtype=jnp.int32).at[sel].set(i_c)
            return s, idx

        if half < COMPACTION_MIN_ROWS:
            return full()
        return jax.lax.cond(routed_l.sum() <= half, compact, full)

    def local_fn(q_l, docs_l, bias_l, *extras):
        extras = list(extras)
        routed_l = extras.pop(0) if routed is not None else None
        scale_l = extras.pop(0) if scale is not None else None
        lr_l = extras.pop(0) if lr is not None else None
        s, i = local_topk(q_l, docs_l, bias_l, routed_l, scale_l, lr_l)
        key = -s if l2 else s
        gid = i + jax.lax.axis_index("idx") * n_local
        # all-gather candidate pairs over ICI: [idx, B/dp, k]
        keys = jax.lax.all_gather(key, "idx")
        gids = jax.lax.all_gather(gid, "idx")
        bsz_l = q_l.shape[0]
        keys = jnp.moveaxis(keys, 0, 1).reshape(bsz_l, n_idx * k)
        gids = jnp.moveaxis(gids, 0, 1).reshape(bsz_l, n_idx * k)
        top, pos = jax.lax.top_k(keys, k)
        gi = jnp.take_along_axis(gids, pos, axis=1)
        return (-top if l2 else top), gi

    in_specs = [P("dp", None), P("idx", None), P("idx")]
    args = [queries, docs, bias]
    if routed is not None:
        in_specs.append(P("dp"))
        args.append(routed)
    if scale is not None:
        # per-doc scales are [n]; the int4 per-group scheme is [n, G]
        in_specs.append(P("idx") if scale.ndim == 1 else P("idx", None))
        args.append(scale)
    if lr is not None:
        # basis + mu replicated (tiny), projected slab row-sharded
        in_specs.append(lr.replace(basis=P(), mu=P(),
                                   docs_lr=P("idx", None)))
        args.append(lr)
    scores, gids = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("dp", None), P("dp", None)),
        # outputs ARE replicated over idx (identical merge of the same
        # all-gathered candidates on every idx peer), but the static
        # varying-manual-axes checker can't prove it
        check_vma=False,
    )(*args)
    if dot_restore is not None:
        scores = scores + dot_restore[:, None]
    return scores, gids


def sharded_ivf_topk(
    mesh: Mesh,
    queries: jnp.ndarray,
    ivf: IVFData,
    k: int,
    *,
    mode: str = "dot",
    nprobe: int = 8,
    center: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster-probed approximate top-k with the CLUSTER axis sharded.

    The balanced-IVF layout shards naturally over the mesh: cluster slabs
    (docs/bias/perm) split over ``idx``, centroids replicated (they are
    ~1000x smaller than the corpus), batch split over ``dp``. Every idx
    peer computes the identical probe list, scores only the probed pairs
    whose clusters it owns (ragged grouped-GEMM on its local slabs), and
    an ``all_gather`` of the per-pair candidate lists — each (query,
    probe) slot is owned by exactly one peer — reassembles them for the
    final per-query top-k. Results match the single-chip
    :func:`ragroute_tpu.ops.ivf_topk.ivf_topk` at equal ``nprobe``
    (gated by ``tests/test_parallel.py``).
    """
    n_idx = mesh.shape["idx"]
    c, _, s = ivf.docs.shape      # middle axis is d//2 when int4-packed
    if c % n_idx != 0:
        raise ValueError(f"cluster axis {c} not divisible by idx={n_idx}")
    c_local = c // n_idx
    k1 = min(k, s)
    p = int(min(max(nprobe, -(-k // k1)), c))
    dot_restore = None
    if center is not None:
        if mode == "l2":
            queries = queries.astype(jnp.float32) - center
        elif mode == "dot":
            dot_restore = queries.astype(jnp.float32) @ center
    l2 = mode == "l2"

    def local_fn(q_l, cent, cbias, docs_l, bias_l, perm_l, scale_l=None):
        bsz_l = q_l.shape[0]
        qq = _prepare_queries(q_l, mode)
        cg = qq @ cent.T + cbias[None, :]
        _, probe = jax.lax.top_k(cg, p)                # [Bl, P] global ids
        dev = jax.lax.axis_index("idx")
        e = bsz_l * p
        flat = probe.reshape(e)
        loc = flat - dev * c_local
        owned = (loc >= 0) & (loc < c_local)
        key = jnp.where(owned, loc, c_local)           # foreign pairs last
        order = jnp.argsort(key, stable=True)
        sc = key[order]                                # [E], c_local = n/a
        gs = jnp.zeros((c_local + 1,), jnp.int32).at[key].add(1)[:c_local]
        pair_q = (order // p).astype(jnp.int32)
        docs_cast = docs_l
        if ivf.packed4:
            # int4 slabs [Cl, d/2, S]: unpack the local slabs whole to
            # bf16 before ragged_dot (layout: index.shard._pack_int4).
            # The single-chip path unpacks per probed block inside the
            # Pallas kernel; here the whole-slab XLA unpack rides the
            # same known perf gap as ragged_dot itself (see the note
            # below) and keeps the CPU-mesh CI exact. MEMORY: this
            # materializes a bf16 copy of the local slab each step
            # (2 B/dim on top of the 0.5 B/dim packed bytes — per-half
            # casts inside unpack_int4 bound the transient to one int32
            # half-slab), so int4's 4x capacity headroom does NOT apply
            # to the mesh-IVF combination; size meshes for ~2.5 B/dim
            # or use the flat mesh path, whose kernel unpacks per tile.
            docs_cast = unpack_int4(docs_cast, axis=1,
                                    out_dtype=jnp.bfloat16)
        if docs_cast.dtype == jnp.int8:
            docs_cast = docs_cast.astype(jnp.bfloat16)
        qd = qq.astype(docs_cast.dtype)[pair_q]
        # KNOWN PERF GAP, deliberately open: the single-chip path
        # replaced ragged_dot with the grouped-GEMM Pallas kernel
        # (ops/ivf_topk._grouped_gains) after measuring ragged_dot's TPU
        # lowering at ~30x its useful FLOPs (BENCHMARKS.md). The same
        # swap here needs the _GROUP_ROWS pair-padding + scalar-prefetch
        # block table rebuilt per device inside shard_map, and neither
        # leg is validatable today: the CPU-mesh CI cannot execute the
        # Mosaic kernel and no multi-chip TPU is available to measure
        # the win. Revisit with hardware; correctness is unaffected
        # (gated vs the single-chip ivf_topk in tests/test_parallel.py).
        gains = jax.lax.ragged_dot(
            qd, docs_cast, gs, preferred_element_type=jnp.float32)
        row_ok = sc < c_local
        sc_c = jnp.clip(sc, 0, c_local - 1)
        if scale_l is not None:                        # int8 dequant
            gains = gains * scale_l[sc_c]
        gains = jnp.where(row_ok[:, None],
                          gains + bias_l[sc_c], NEG_INF)
        g1, s1 = jax.lax.top_k(gains, k1)              # [E, k1]
        ids = perm_l.reshape(-1)[sc_c[:, None] * s + s1]
        ids = jnp.where(row_ok[:, None], ids, -1)
        pair_g = jnp.zeros((e, k1), g1.dtype).at[order].set(g1)
        pair_i = jnp.full((e, k1), -1, jnp.int32).at[order].set(ids)
        pair_own = owned  # already in original pair order (computed pre-sort)
        # each pair slot is owned by exactly one idx peer: gather every
        # peer's view plus an EXPLICIT ownership flag and select the
        # owner's row (selecting by argmax of gains would rely on the
        # owner's -inf pad entries out-tying foreign NEG_INF sentinels —
        # a fragile invariant if NEG_INF ever becomes finite)
        all_g = jax.lax.all_gather(
            pair_g.reshape(bsz_l, p, k1), "idx")       # [n, Bl, P, k1]
        all_i = jax.lax.all_gather(pair_i.reshape(bsz_l, p, k1), "idx")
        all_own = jax.lax.all_gather(
            pair_own.reshape(bsz_l, p), "idx")         # [n, Bl, P]
        own = jnp.argmax(all_own, axis=0)[..., None]   # [Bl, P, 1]
        gbest = jnp.take_along_axis(all_g, own[None], axis=0)[0]
        ibest = jnp.take_along_axis(all_i, own[None], axis=0)[0]
        # doc ids were resolved by each cluster's owner BEFORE the gather,
        # so the final top-k only reorders (gain, id) candidate pairs
        gf, posf = jax.lax.top_k(gbest.reshape(bsz_l, -1), k)
        idx = jnp.take_along_axis(ibest.reshape(bsz_l, -1), posf, axis=1)
        idx = jnp.where(gf > NEG_INF, idx, 0)
        return gain_to_natural(gf, q_l, mode), idx

    in_specs = [P("dp", None), P(), P(), P("idx", None, None),
                P("idx", None), P("idx", None)]
    args = [queries, ivf.centroids, ivf.cbias, ivf.docs, ivf.bias,
            ivf.perm]
    if ivf.scale is not None:
        in_specs.append(P("idx", None))
        args.append(ivf.scale)
    scores, idx = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )(*args)
    if dot_restore is not None:
        scores = scores + dot_restore[:, None]
    return scores, idx


class ShardedSearch:
    """Full federated search step over a ``(dp, idx)`` mesh.

    Same semantics — and the same host-facing interface — as
    :class:`ragroute_tpu.engine.FederatedSearchEngine` (route → score →
    gate → merge, ``search()`` → :class:`SearchOutput`), with every
    corpus's documents sharded over ``idx`` and the batch over ``dp``.
    Router params/bank are replicated (they are tiny). Drop-in engine for
    :class:`ragroute_tpu.engine.server.FederationServer` /
    :class:`ragroute_tpu.engine.batcher.QueryBatcher`: BASELINE config #5
    (the served multi-chip federation) is this class behind the HTTP
    front-end.

    ``impl="ivf"`` / ``"hybrid"`` serve the cluster-probed approximate
    mode over the mesh (cluster axis sharded over ``idx``,
    :func:`sharded_ivf_topk`) for shards built with a balanced-IVF
    layout; hybrid applies the same statically-known batch/shard-size
    rule as the single-chip engine.
    """

    def __init__(
        self,
        shard_set: ShardSet,
        params: CorpusRouterParams,
        bank: RouterBank,
        mesh: Mesh,
        *,
        impl: str = "auto",
        seed: int = 0,
        threshold: float = None,
        nprobe: Optional[int] = None,
        k_refine: Optional[int] = None,
    ):
        self.world: WorldConfig = shard_set.world
        self.shard_set = shard_set
        self.mesh = mesh
        self.impl = impl
        self.nprobe = nprobe
        self.k_refine = k_refine
        self.threshold = threshold
        self._key = jax.random.key(seed)
        if any(s.mutable for s in shard_set.shards):
            # the mesh engine re-device_puts sharded COPIES of the arrays
            # below; live scatters into the single-device originals would
            # silently never reach them
            raise ValueError(
                "mutable ShardSets are not servable over a mesh yet; "
                "build with mutable=False for --mesh (live updates are a "
                "single-chip capability)")
        n_idx = mesh.shape["idx"]
        self.dp = mesh.shape["dp"]
        # multi-host mesh: some shards live on other processes, so host
        # fetches must go through a collective (process_allgather) — a
        # plain device_get cannot read non-addressable shards
        self._multiprocess = any(
            d.process_index != jax.process_index()
            for d in np.asarray(mesh.devices).flat)

        repl = NamedSharding(mesh, P())
        docs_sh = NamedSharding(mesh, P("idx", None))
        bias_sh = NamedSharding(mesh, P("idx"))

        if impl == "ivf":
            missing = [s.name for s in shard_set.shards if s.ivf is None]
            if missing:
                raise ValueError(
                    f"impl='ivf' needs shards built with ivf_clusters; "
                    f"missing balanced-IVF layout for {missing}")
        if impl == "lowrank" and not shard_set.lowrank_built:
            raise ValueError(
                "impl='lowrank' needs shards built with lowrank= "
                "(e.g. lowrank=-1 for automatic rank selection)")

        self.params = jax.device_put(params, repl)
        self.bank = jax.device_put(bank, repl)
        self.arrays = []
        self.ivf_arrays = []
        self.lr_arrays = []

        def _pad_docs(a, pad):
            # host-staged sets (ShardSet.build(device="host")) carry numpy
            # arrays; padding those with jnp would commit the WHOLE slab
            # to the default device first — the exact staging this mode
            # exists to avoid
            xp = np if isinstance(a, np.ndarray) else jnp
            return xp.pad(a, ((0, pad), (0, 0)))

        def _pad_bias(a, pad):
            xp = np if isinstance(a, np.ndarray) else jnp
            return xp.pad(a, (0, pad), constant_values=-xp.inf)

        for i_s, s in enumerate(shard_set.shards):
            docs, bias, scale, center = s.docs, s.bias, s.scale, s.center
            lr = s.lr if impl == "lowrank" else None
            n = docs.shape[0]
            if n % n_idx != 0:
                # re-pad to the idx multiple; padding carries -inf bias
                pad = (-n) % n_idx
                docs = _pad_docs(docs, pad)
                bias = _pad_bias(bias, pad)
                if scale is not None:
                    xp = np if isinstance(scale, np.ndarray) else jnp
                    scale = xp.pad(scale, ((0, pad),) + ((0, 0),)
                                   * (scale.ndim - 1))
                if lr is not None:
                    lr = lr.replace(docs_lr=_pad_docs(lr.docs_lr, pad))
            self.arrays.append((
                jax.device_put(docs, docs_sh),
                jax.device_put(bias, bias_sh),
                None if scale is None else jax.device_put(
                    scale, bias_sh if scale.ndim == 1 else docs_sh),
                None if center is None else jax.device_put(center, repl),
            ))
            if lr is not None:
                lr = jax.device_put(lr, lr.replace(
                    basis=repl, mu=repl, docs_lr=docs_sh))
            self.lr_arrays.append(lr)
            ivf = s.ivf if impl in ("ivf", "hybrid") else None
            if ivf is not None:
                if ivf.n_clusters % n_idx != 0:
                    raise ValueError(
                        f"{s.name}: IVF cluster count {ivf.n_clusters} not "
                        f"divisible by mesh idx={n_idx}; rebuild with a "
                        f"power-of-two --ivf-clusters")
                # cluster-major slabs sharded over idx; tiny centroid
                # tables replicated (device_put over the matching
                # pytree-of-shardings)
                import dataclasses as _dc

                shardings = _dc.replace(
                    ivf,
                    centroids=repl, cbias=repl,
                    docs=NamedSharding(mesh, P("idx", None, None)),
                    bias=NamedSharding(mesh, P("idx", None)),
                    scale=(None if ivf.scale is None
                           else NamedSharding(mesh, P("idx", None))),
                    perm=NamedSharding(mesh, P("idx", None)),
                )
                ivf = jax.device_put(ivf, shardings)
            self.ivf_arrays.append(ivf)
            # Retire the pre-sharding originals: serving reads ONLY the
            # sharded copies, so keeping the single-device (or
            # host-staged) arrays alive through self.shard_set would
            # double HBM (or host RAM) for the server's lifetime. The
            # shard metadata (n_docs, name, score_mode) and host-side
            # doc-id tables stay; index_bytes keeps reporting the global
            # footprint.
            # layouts the chosen impl will never read are DROPPED, not
            # kept: writing back the original single-device IVF slabs
            # (~1.25x corpus bytes) or lowrank slab would be exactly the
            # double-residency this block exists to prevent
            d_sh, b_sh, sc_sh, c_sh = self.arrays[-1]
            shard_set.shards[i_s] = s.replace(
                docs=d_sh, bias=b_sh, scale=sc_sh, center=c_sh,
                ivf=ivf, lr=lr)

        world = self.world
        k = world.k
        mesh_ = mesh
        dp_ = self.dp
        impl__ = "auto" if impl in ("ivf", "hybrid", "lowrank") else impl
        from ragroute_tpu.config import LOWRANK_REFINE_MULT
        k_refine_ = k_refine or LOWRANK_REFINE_MULT * k
        n_docs = tuple(s.n_docs for s in shard_set.shards)
        packed = tuple(getattr(s, "packed4", False)
                       for s in shard_set.shards)
        nprobe_ = nprobe
        impl_mode = impl

        def _score(arrays, ivf_arrays, lr_arrays, query_embs, mask):
            bsz = query_embs[world.sources[0].encoder].shape[0]
            per_scores, per_ids = [], []
            for i, src in enumerate(world.sources):
                docs, bias, scale, center = arrays[i]
                ivf = ivf_arrays[i]
                lr = lr_arrays[i] if lr_arrays else None
                use_ivf = False
                if ivf is not None:
                    if impl_mode == "ivf":
                        use_ivf = True
                        np_i = nprobe_ or max(
                            1, ivf.n_clusters // cfg_mod.IVF_NPROBE_DIVISOR)
                    elif impl_mode == "hybrid":
                        # same static rule as the single-chip engine
                        # (batch size / shard size are trace-time
                        # consts), applied to PER-DEVICE work: the batch
                        # splits over dp and the doc axis over idx, and
                        # the crossover constants were measured on one
                        # chip handling exactly that slice
                        if (bsz // dp_ <= cfg_mod.IVF_HYBRID_MAX_BATCH
                                and (n_docs[i] // n_idx
                                     >= cfg_mod.IVF_HYBRID_MIN_DOCS)):
                            use_ivf = True
                            np_i = nprobe_ or max(
                                1, ivf.n_clusters
                                // cfg_mod.IVF_HYBRID_NPROBE_DIVISOR)
                if use_ivf:
                    s, gi = sharded_ivf_topk(
                        mesh_, query_embs[src.encoder], ivf, k,
                        mode=src.score_mode, nprobe=np_i, center=center)
                else:
                    s, gi = sharded_shard_topk(
                        mesh_, query_embs[src.encoder], docs, bias, k,
                        mode=src.score_mode, impl=impl__,
                        routed=mask[:, i], scale=scale, center=center,
                        packed4=packed[i], lr=lr, k_refine=k_refine_)
                per_scores.append(s)
                per_ids.append(gi)
            return gate_and_merge(world, k, mask, per_scores, per_ids)

        @functools.partial(jax.jit, static_argnames=("strategy",))
        def route_step(params, bank, query_embs, rng, *, strategy: str):
            return _route_fn(world, strategy, params, bank, query_embs,
                             rng, threshold)

        @jax.jit
        def score_step(arrays, ivf_arrays, lr_arrays, query_embs, mask,
                       ptables):
            scored = _score(arrays, ivf_arrays, lr_arrays, query_embs,
                            mask)
            msg = (payload_base(ptables, scored[1])
                   if ptables is not None else None)
            return scored + (msg,)

        def full_fn(params, bank, arrays, ivf_arrays, lr_arrays,
                    query_embs, rng, *, strategy: str):
            probs, mask = _route_fn(
                world, strategy, params, bank, query_embs, rng, threshold)
            return (probs, mask) + _score(
                arrays, ivf_arrays, lr_arrays, query_embs, mask)

        def served_step(params, bank, arrays, ivf_arrays, lr_arrays,
                        query_embs, rng, ptables, *, strategy: str):
            out = full_fn(params, bank, arrays, ivf_arrays, lr_arrays,
                          query_embs, rng, strategy=strategy)
            msg = (payload_base(ptables, out[3])
                   if ptables is not None else None)
            return out + (msg,)

        self._route_step = route_step
        self._score_step = score_step
        # unjitted full step, for composition (e.g. bench.py wraps it in
        # one lax.scan over distinct batches to amortize dispatch)
        self.full_fn = full_fn
        self._step = jax.jit(served_step, static_argnames=("strategy",))
        # device payload-size tables, same contract as the single-chip
        # engine (the server enables them on accelerator backends)
        self._ptables = None
        self._q_sharding = NamedSharding(mesh, P("dp", None))
        self._mask_sharding = NamedSharding(mesh, P("dp", None))

    def set_payload_tables(self, per_source, names) -> None:
        """Enable device-side response sizing (same contract as
        :meth:`FederatedSearchEngine.set_payload_tables`). The tables are
        deterministic host data (doc-store byte lengths), so every
        process of a multi-host mesh builds identical replicas."""
        self._ptables = (None if per_source is None else
                         build_payload_tables(per_source, names,
                                              self.world.k))

    def _fetch(self, tree):
        """Coalesced device->host fetch of an output pytree.

        Single-process: one ``jax.device_get``. Multi-process: every
        process joins a ``process_allgather`` (all processes call
        ``search`` in lockstep, so the collective is globally ordered)
        and receives the full global value of each leaf.
        """
        if self._multiprocess:
            from jax.experimental import multihost_utils as mhu

            return mhu.process_allgather(tree, tiled=True)
        return jax.device_get(tree)

    def _device_embs(self, query_embs: Dict[str, np.ndarray]):
        embs = {}
        for enc in self.world.encoders:
            if enc not in query_embs:
                raise KeyError(
                    f"missing query embeddings for encoder {enc!r}")
            arr = jnp.asarray(query_embs[enc], dtype=jnp.float32)
            if arr.shape[0] % self.dp != 0:
                raise ValueError(
                    f"batch size {arr.shape[0]} not divisible by mesh "
                    f"dp={self.dp}; pad the batch (the serving batcher "
                    f"uses dp-multiple buckets)")
            embs[enc] = jax.device_put(arr, self._q_sharding)
        return embs

    def search(self, query_embs: Dict[str, np.ndarray], *,
               strategy: str = "ragroute",
               staged: bool = False,
               fetch_candidates: bool = True) -> "SearchOutput":
        """Run one mesh-sharded search; same host-facing contract as
        :meth:`FederatedSearchEngine.search` (stage timings measured with
        a device->host sync, one coalesced fetch for the output pytree).
        """
        import time

        from ragroute_tpu.engine.engine import SearchOutput

        embs = self._device_embs(query_embs)
        self._key, sub = jax.random.split(self._key)
        if staged:
            t0 = time.perf_counter()
            probs, mask = self._route_step(
                self.params, self.bank, embs, sub, strategy=strategy)
            mask_h = self._fetch(mask)
            sel_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            scored = self._score_step(
                self.arrays, self.ivf_arrays, self.lr_arrays, embs, mask,
                self._ptables)
            if self._multiprocess:
                jax.block_until_ready(scored)
            else:
                np.asarray(scored[2])
            doc_t = time.perf_counter() - t0
        else:
            t0 = time.perf_counter()
            out = self._step(
                self.params, self.bank, self.arrays, self.ivf_arrays,
                self.lr_arrays, embs, sub, self._ptables,
                strategy=strategy)
            sel_t = 0.0
            probs, mask, scored = out[0], out[1], out[2:]
        msg_dev = scored[6]
        msg_base = None
        if fetch_candidates:
            (probs, mask, shard_scores, shard_ids, merged_score,
             merged_shard, merged_local, merged_valid) = self._fetch(
                (probs, mask) + tuple(scored[:6]))
        elif msg_dev is not None:
            # device-computed response sizes replace shard_ids' only
            # serving-path consumer (see the single-chip engine)
            shard_scores = None
            shard_ids = None
            (probs, mask, merged_score, merged_shard, merged_local,
             merged_valid, msg_base) = self._fetch(
                (probs, mask) + tuple(scored[2:7]))
        else:
            # skip the [B, N, k] per-shard score transfer (see the
            # single-chip engine's docstring; profile-measured win)
            shard_scores = None
            (probs, mask, shard_ids, merged_score, merged_shard,
             merged_local, merged_valid) = self._fetch(
                (probs, mask, scored[1]) + tuple(scored[2:6]))
        if not staged:
            doc_t = time.perf_counter() - t0
        return SearchOutput(
            probs=probs,
            mask=np.asarray(mask),
            shard_scores=shard_scores,
            shard_ids=shard_ids,
            merged_score=merged_score,
            merged_shard=merged_shard,
            merged_local=merged_local,
            merged_valid=merged_valid,
            msg_base=msg_base,
            selection_time=sel_t,
            doc_select_time=doc_t,
        )

    # host-side doc-id resolution is mesh-agnostic; reuse the single-chip
    # implementation verbatim (reads only .world/.shard_set and the output)
    from ragroute_tpu.engine.engine import \
        FederatedSearchEngine as _Engine  # noqa: E402
    resolve_doc_ids = _Engine.resolve_doc_ids
    del _Engine
