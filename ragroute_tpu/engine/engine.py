"""Federated search engine: the jitted route→score→merge device step.

This replaces the reference's whole multi-process hot path
(``http_server.py:105-341`` → ZMQ → ``router.py:305-333`` → ZMQ×S →
``data_source.py:98-134`` → ZMQ → ``rerank.py``): for a batch of queries,
ONE XLA program

1. builds router features and runs the gating MLP (batched, MXU),
2. converts the routing strategy into a boolean mask ``[B, N_sources]``,
3. scores every shard with the fused matmul+top-k kernel (a shard whose
   column of the mask is entirely off is skipped at runtime via
   ``lax.cond`` — the TPU analogue of "don't query unselected sources"),
4. gates per-shard results by the mask and merges them into the global
   top-k (the reference's ``rerank_medrag``/``rerank_wikipedia`` score
   merges, ``rerank.py:3-9,28-34``).

Only ``[B, k]`` winner (shard, local_index, score) triples plus the mask
and router probabilities leave the device. Doc-id/text resolution and the
qrels-oracle feb4rag rerank (``rerank.py:12-25`` — label lookups on
strings) stay host-side in :mod:`ragroute_tpu.engine.rerank`.
"""

from __future__ import annotations

import dataclasses
import functools
import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ragroute_tpu.config import COMPACTION_MIN_ROWS, WorldConfig
from ragroute_tpu.index.shard import ShardSet
from ragroute_tpu.ops.topk import NEG_INF, shard_topk
from ragroute_tpu.router.features import RouterBank, build_features
from ragroute_tpu.router.mlp import CorpusRouterParams, router_forward
from ragroute_tpu.router.strategies import routing_mask


@dataclasses.dataclass
class SearchOutput:
    """Host-side result of one engine step (numpy arrays)."""

    probs: np.ndarray           # [B, N] router probabilities
    mask: np.ndarray            # [B, N] routing decisions
    shard_scores: Optional[np.ndarray]  # [B, N, k] natural per-shard
    #                             scores; None when the search ran with
    #                             fetch_candidates=False (the serving
    #                             default for score-merged worlds)
    shard_ids: Optional[np.ndarray]  # [B, N, k] local doc indices; None
    #                             when payload tables are loaded and the
    #                             search ran with fetch_candidates=False
    #                             (msg_base replaces its only consumer)
    merged_score: np.ndarray    # [B, k] natural merged scores
    merged_shard: np.ndarray    # [B, k] winning shard index (-1 = invalid)
    merged_local: np.ndarray    # [B, k] local doc index within shard
    merged_valid: np.ndarray    # [B] number of valid merged entries
    msg_base: Optional[np.ndarray] = None  # [B, N] device-computed
    #                             serialized-response size per source,
    #                             minus the query-id length (host adds it)
    selection_time: float = 0.0   # router stage (s), staged mode only
    doc_select_time: float = 0.0  # scoring+merge stage (s)


class PendingSearch:
    """An in-flight batched search: dispatched, result fetch deferred.

    Produced by :meth:`FederatedSearchEngine.search_submit`; ``wait()``
    performs the one coalesced device->host fetch and returns the
    :class:`SearchOutput`. The pipelined serving loop keeps one of these
    in flight so the device computes batch N+1 while the host assembles
    batch N's responses.
    """

    __slots__ = ("_engine", "_probs", "_mask", "_scored", "_sel_t", "_t0",
                 "_fetch_candidates", "_done")

    def __init__(self, engine, probs, mask, scored, *, sel_t, t0,
                 fetch_candidates):
        self._engine = engine
        self._probs = probs
        self._mask = mask
        self._scored = scored
        self._sel_t = sel_t
        self._t0 = t0
        self._fetch_candidates = fetch_candidates
        self._done = False

    def wait(self) -> "SearchOutput":
        if self._done:
            raise RuntimeError("PendingSearch.wait() called twice")
        self._done = True
        out = self._engine._fetch_output(
            self._probs, self._mask, self._scored,
            fetch_candidates=self._fetch_candidates,
            sel_t=self._sel_t, doc_t=None, t0=self._t0)
        self._probs = self._mask = self._scored = None  # free device refs
        return out


def _route_fn(world: WorldConfig, strategy: str, params, bank, query_embs,
              rng, threshold=None):
    feats = build_features(world, bank, query_embs)
    logits = router_forward(params, feats)
    probs = jax.nn.sigmoid(logits)
    mask = routing_mask(world, strategy, probs, rng, threshold)
    return probs, mask


def gate_and_merge(world: WorldConfig, k: int, mask, per_scores, per_ids):
    """Gate per-shard top-k lists by the routing mask and merge globally.

    Shared by the single-chip engine and the mesh-sharded engine
    (:mod:`ragroute_tpu.parallel.sharded`).
    """
    bsz = per_scores[0].shape[0]
    shard_scores = jnp.stack(per_scores, axis=1)        # [B, N, k]
    shard_ids = jnp.stack(per_ids, axis=1)              # [B, N, k]

    # Merge in gain form (uniform max semantics within a world).
    l2 = world.sources[0].score_mode == "l2"
    key = -shard_scores if l2 else shard_scores
    gated = jnp.where(mask[:, :, None], key, NEG_INF)
    flat = gated.reshape(bsz, -1)                       # [B, N*k]
    top_key, pos = jax.lax.top_k(flat, k)
    merged_shard = (pos // k).astype(jnp.int32)
    merged_local = jnp.take_along_axis(
        shard_ids.reshape(bsz, -1), pos, axis=1)
    valid = top_key > NEG_INF
    merged_score = jnp.where(valid, -top_key if l2 else top_key, jnp.nan)
    merged_shard = jnp.where(valid, merged_shard, -1)
    merged_valid = valid.sum(axis=1).astype(jnp.int32)
    return shard_scores, shard_ids, merged_score, merged_shard, merged_local, merged_valid


def build_payload_tables(per_source, names, k: int):
    """Pack per-source doc-length tables into device arrays for
    :func:`payload_base`.

    ``per_source[i]`` is ``(rawl, idl)`` — int32 per-doc byte lengths of
    the raw doc-store line and the id string (either may be ``None``) —
    exactly the tables the server's host-side estimator uses
    (``server._size_tables``). Returns ``(tab [N, n_max] i32,
    inv [N] i32, const [N] i32)``: merged per-doc byte length, the
    contribution of an out-of-range (pad) id, and the per-source envelope
    constant (everything in ``server._estimate_message_size`` except the
    query-id length, which the host adds).
    """
    n_max = 1
    for rawl, idl in per_source:
        for t in (rawl, idl):
            if t is not None:
                n_max = max(n_max, len(t))
    n = len(per_source)
    tab = np.zeros((n, n_max), np.int32)
    inv = np.zeros((n,), np.int32)
    const = np.zeros((n,), np.int32)
    for i, (rawl, idl) in enumerate(per_source):
        const[i] = len(names[i]) + 96 + 20 * k
        if idl is not None:
            tab[i, :len(idl)] += idl
        if rawl is not None:
            tab[i, :len(rawl)] += rawl
            # pad ids under a raw table contribute the 4-byte "null";
            # ids past the table end match the host estimator's
            # (ids >= n) exclusion only through the validity mask, so
            # tab rows beyond len(rawl) stay 0 and inv covers them via
            # payload_base's explicit range check
            inv[i] = 4
            const[i] += 2 * k
    return (jnp.asarray(tab), jnp.asarray(inv), jnp.asarray(const),
            jnp.asarray(np.array([  # per-source valid-id horizon
                max((len(t) for t in pair if t is not None), default=0)
                for pair in per_source], np.int32)))


def payload_base(ptables, shard_ids):
    """Device-side ``[B, N]`` serialized-response size (sans qid length).

    Mirrors ``server._estimate_message_size`` exactly: valid local ids
    gather their per-doc byte length; pad/out-of-range ids contribute
    the per-source invalid constant. Replaces the host's only use of the
    ``[B, N, k]`` ``shard_ids`` fetch on the score-merged serving path —
    at B=512/N=9/k=32 that fetch is ~590 KB/step vs 18 KB for this.
    """
    tab, inv, const, nvalid = ptables
    ids = shard_ids                                     # [B, N, k]
    n_max = tab.shape[1]
    ok = (ids >= 0) & (ids < nvalid[None, :, None])
    gathered = jnp.take_along_axis(
        tab[None, :, :], jnp.clip(ids, 0, n_max - 1), axis=2)
    per = jnp.where(ok, gathered, inv[None, :, None])
    return const[None, :] + per.sum(axis=2, dtype=jnp.int32)


def _score_fn(
    world: WorldConfig,
    k: int,
    impl: str,
    n_docs: Tuple[int, ...],
    shard_arrays,
    query_embs,
    mask,
    compaction: bool = True,
    ivf_arrays=None,
    nprobe: Optional[int] = None,
    packed: Optional[Tuple[bool, ...]] = None,
    lr_arrays=None,
    k_refine: Optional[int] = None,
):
    """Score all shards and merge, with routing-aware batch compaction.

    The reference's routing SAVES WORK by not querying unselected sources;
    on TPU, masking alone doesn't (static shapes score everything). Two
    mechanisms restore the saving exactly:

    * a shard with no routed query in the batch is skipped entirely at
      runtime (``lax.cond``);
    * when at most half the batch routes to a shard, those queries are
      gathered into a half-size batch before the kernel and the results
      scattered back (selected-first stable ordering; unselected rows get
      worst-score placeholders, which the mask gating drops anyway). At
      the reference's medrag selectivity (2 of 4 sources per query) this
      halves the dominant matmul.

    ``impl="ivf"`` swaps the exact scan for the cluster-probed
    approximate search (:mod:`ragroute_tpu.ops.ivf_topk`) on shards that
    carry a balanced-IVF layout; ``impl="hybrid"`` does so only for the
    statically-known regime where it measured faster (small batch x
    large shard, config.IVF_HYBRID_*); ``impl="lowrank"`` swaps it for
    the two-stage coarse-scan+exact-refine search
    (:mod:`ragroute_tpu.ops.lowrank_topk`) on shards that carry a
    low-rank coarse index; compaction and skip compose unchanged.
    """
    some_enc = world.sources[0].encoder
    bsz = query_embs[some_enc].shape[0]

    per_scores: List[jnp.ndarray] = []
    per_ids: List[jnp.ndarray] = []
    for i, src in enumerate(world.sources):
        docs, bias, scale, center = shard_arrays[i]
        ivf = None
        ivf_nprobe = None
        if ivf_arrays and ivf_arrays[i] is not None:
            from ragroute_tpu.config import (
                IVF_HYBRID_MAX_BATCH, IVF_HYBRID_MIN_DOCS,
                IVF_HYBRID_NPROBE_DIVISOR, IVF_NPROBE_DIVISOR)

            if impl == "ivf":
                ivf = ivf_arrays[i]
                ivf_nprobe = nprobe or max(
                    1, ivf.n_clusters // IVF_NPROBE_DIVISOR)
            elif impl == "hybrid":
                # static per-compile choice: batch size and shard size
                # are both compile-time constants, so each batch bucket
                # gets the empirically faster path, with the shallower
                # latency-tuned probe depth (BENCHMARKS.md)
                if (bsz <= IVF_HYBRID_MAX_BATCH
                        and n_docs[i] >= IVF_HYBRID_MIN_DOCS):
                    ivf = ivf_arrays[i]
                    ivf_nprobe = nprobe or max(
                        1, ivf.n_clusters // IVF_HYBRID_NPROBE_DIVISOR)
        lr = None
        if impl == "lowrank" and lr_arrays and lr_arrays[i] is not None:
            lr = lr_arrays[i]
        q = query_embs[src.encoder]
        routed = mask[:, i]
        cnt = routed.sum()
        worst = jnp.inf if src.score_mode == "l2" else -jnp.inf

        def score(qq, docs=docs, bias=bias, scale=scale, src=src,
                  center=center, n=n_docs[i], ivf=ivf,
                  ivf_nprobe=ivf_nprobe, lr=lr,
                  p4=bool(packed[i]) if packed else False):
            if ivf is not None:
                from ragroute_tpu.ops.ivf_topk import ivf_topk

                return ivf_topk(
                    qq, ivf, k, mode=src.score_mode, center=center,
                    nprobe=ivf_nprobe)
            if lr is not None:
                from ragroute_tpu.ops.lowrank_topk import lowrank_topk

                return lowrank_topk(
                    qq, lr, docs, k, mode=src.score_mode, valid_docs=n,
                    bias=bias, scale=scale, center=center, packed4=p4,
                    k_refine=k_refine)
            return shard_topk(
                qq, docs, k, mode=src.score_mode, valid_docs=n,
                bias=bias, scale=scale, center=center,
                impl="auto" if impl in ("ivf", "hybrid", "lowrank")
                else impl, packed4=p4)

        def full(q=q, score=score):
            return score(q)

        def compact_to(cb, q=q, score=score, routed=routed, worst=worst):
            order = jnp.argsort(
                jnp.logical_not(routed), stable=True)        # routed first
            sel = order[:cb]
            s_c, i_c = score(q[sel])
            s = jnp.full((bsz, k), worst, dtype=jnp.float32).at[sel].set(s_c)
            idx = jnp.zeros((bsz, k), dtype=jnp.int32).at[sel].set(i_c)
            return s, idx

        def skipped(worst=worst):
            return (
                jnp.full((bsz, k), worst, dtype=jnp.float32),
                jnp.zeros((bsz, k), dtype=jnp.int32),
            )

        # compaction tiers: B/4 (e.g. wikipedia's 2-of-10 routing) and B/2
        # (medrag's 2-of-4); each tier is one extra compiled kernel variant
        # per shard shape.
        half, quarter = bsz // 2, bsz // 4
        if compaction and quarter >= COMPACTION_MIN_ROWS:
            s, idx = jax.lax.cond(
                cnt == 0, skipped,
                lambda: jax.lax.cond(
                    cnt <= quarter, lambda: compact_to(quarter),
                    lambda: jax.lax.cond(
                        cnt <= half, lambda: compact_to(half), full)))
        elif compaction and half >= COMPACTION_MIN_ROWS:
            s, idx = jax.lax.cond(
                cnt == 0, skipped,
                lambda: jax.lax.cond(
                    cnt <= half, lambda: compact_to(half), full))
        else:
            s, idx = jax.lax.cond(cnt > 0, full, skipped)
        per_scores.append(s)
        per_ids.append(idx)

    return gate_and_merge(world, k, mask, per_scores, per_ids)


class QueryTableMixin:
    """Device-resident query-table fast path, shared by every engine
    front (single-chip, mesh-sharded, streamed): known qids cross the
    host->device boundary as int32 row indices instead of [B, d] f32."""

    world: WorldConfig  # provided by the concrete engine

    def set_query_table(self, tables: Dict[str, np.ndarray]) -> None:
        """Upload a row-indexed query-embedding table ONCE.

        ``tables`` maps encoder name -> ``[Q, d]`` f32. Serving layers
        may then pass ``{"__rows__": int32 [B]}`` to :meth:`search`
        instead of dense ``[B, d]`` embeddings: the per-batch host cost
        drops from a blocking [B, d] f32 ``device_put`` (~20 ms per
        512-batch through the tunnel) to a [B] int32 upload + an async
        on-device gather.
        """
        import jax.numpy as jnp

        for enc in self.world.encoders:
            if enc not in tables:
                raise KeyError(f"query table missing encoder {enc!r}")
        self._qtable_host = {
            enc: np.ascontiguousarray(tables[enc], dtype=np.float32)
            for enc in self.world.encoders}
        self._qtable = {
            enc: jnp.asarray(t) for enc, t in self._qtable_host.items()}
        # ONE jitted dispatch for the whole gather (see engine docstring)
        self._qtable_gather = jax.jit(
            lambda tables, idx: {
                enc: jnp.take(t, idx, axis=0, mode="clip")
                for enc, t in tables.items()})

    def materialize_rows(self, row: int) -> Dict[str, np.ndarray]:
        """Host-side dense view of one query-table row (mixed-batch
        fallback: a batch with any non-table query runs the dense path)."""
        return {enc: t[row] for enc, t in self._qtable_host.items()}

    def warm_query_table(self, batch: int) -> None:
        """Compile the query-table gather for one batch bucket (warmup);
        a no-op when no table is set."""
        if getattr(self, "_qtable", None) is not None:
            self._qtable_gather(self._qtable, np.zeros(batch, np.int32))

    def _device_embs(self, query_embs: Dict[str, np.ndarray]):
        import jax.numpy as jnp

        rows = query_embs.get("__rows__")
        if rows is not None:
            if getattr(self, "_qtable", None) is None:
                raise ValueError(
                    "row-indexed search needs set_query_table() first")
            return self._qtable_gather(
                self._qtable, np.ascontiguousarray(rows, dtype=np.int32))
        out = {}
        for enc in self.world.encoders:
            if enc not in query_embs:
                raise KeyError(f"missing query embeddings for encoder {enc!r}")
            out[enc] = jnp.asarray(query_embs[enc], dtype=jnp.float32)
        return out

    def _host_embs(self, query_embs: Dict[str, np.ndarray]
                   ) -> Dict[str, np.ndarray]:
        """Host-side f32 per-encoder embeddings for the same batch (the
        hostrefine tier rescoring needs raw queries on the host)."""
        rows = query_embs.get("__rows__")
        if rows is not None:
            idx = np.clip(np.asarray(rows, np.int64), 0,
                          max(next(iter(self._qtable_host.values()))
                              .shape[0] - 1, 0))
            return {enc: t[idx] for enc, t in self._qtable_host.items()}
        return {enc: np.asarray(query_embs[enc], np.float32)
                for enc in self.world.encoders}


class FederatedSearchEngine(QueryTableMixin):
    """Holds device state (shards, router) and compiled search steps.

    Args:
      shard_set: HBM-resident corpus shards for one world.
      router_params: gating MLP parameters (imported or trained); may be
        ``None`` if only all/random/none strategies are used.
      bank: router feature bank (centroids, one-hots, scaler).
      impl: top-k implementation ("auto" → Pallas on TPU; "ivf" → the
        cluster-probed approximate search, requires shards built with
        ``ivf_clusters``).
      nprobe: clusters probed per query in ivf mode (default C/8 per
        shard).
    """

    def __init__(
        self,
        shard_set: ShardSet,
        router_params: Optional[CorpusRouterParams],
        bank: Optional[RouterBank],
        *,
        impl: str = "auto",
        seed: int = 0,
        threshold: float = None,
        compaction: bool = True,
        nprobe: Optional[int] = None,
        k_refine: Optional[int] = None,
    ):
        self.world: WorldConfig = shard_set.world
        self.shard_set = shard_set
        self.params = router_params
        self.bank = bank
        self.impl = impl
        self.threshold = threshold
        self.compaction = compaction
        self.nprobe = nprobe
        self.k_refine = k_refine
        self._key = jax.random.key(seed)
        # scan_docs == n_docs for immutable shards; capacity for mutable
        # ones (their liveness rides the per-row bias, so live adds and
        # deletes change no static shape and trigger no recompile here)
        n_docs = tuple(s.scan_docs for s in shard_set.shards)
        packed = tuple(getattr(s, "packed4", False)
                       for s in shard_set.shards)
        if impl == "ivf":
            missing = [s.name for s in shard_set.shards if s.ivf is None]
            if missing:
                raise ValueError(
                    f"impl='ivf' needs shards built with ivf_clusters; "
                    f"missing balanced-IVF layout for {missing}")
        if impl == "lowrank":
            if not shard_set.lowrank_built:
                raise ValueError(
                    "impl='lowrank' needs shards built with lowrank= "
                    "(e.g. lowrank=-1 for automatic rank selection)")
            refused = [s.name for s in shard_set.shards if s.lr is None]
            if refused:
                import logging

                logging.getLogger("engine").warning(
                    "lowrank: shards %s have no coarse index (flat "
                    "spectrum at build); they fall back to the exact "
                    "exhaustive scan", refused)

        world = self.world
        k = world.k
        impl_ = impl
        thr = threshold
        compaction_ = compaction
        nprobe_ = nprobe
        from ragroute_tpu.config import LOWRANK_REFINE_MULT
        k_refine_ = k_refine or LOWRANK_REFINE_MULT * k

        @functools.partial(jax.jit, static_argnames=("strategy",))
        def route_step(params, bank, query_embs, rng, *, strategy: str):
            return _route_fn(world, strategy, params, bank, query_embs, rng,
                             thr)

        @jax.jit
        def score_step(shard_arrays, ivf_arrays, lr_arrays, query_embs,
                       mask, ptables):
            scored = _score_fn(
                world, k, impl_, n_docs, shard_arrays, query_embs, mask,
                compaction_, ivf_arrays, nprobe_, packed, lr_arrays,
                k_refine_)
            msg = (payload_base(ptables, scored[1])
                   if ptables is not None else None)
            return scored + (msg,)

        @functools.partial(jax.jit, static_argnames=("strategy",))
        def full_step(params, bank, shard_arrays, ivf_arrays, lr_arrays,
                      query_embs, rng, ptables, *, strategy: str):
            probs, mask = _route_fn(
                world, strategy, params, bank, query_embs, rng, thr)
            scored = _score_fn(
                world, k, impl_, n_docs, shard_arrays, query_embs, mask,
                compaction_, ivf_arrays, nprobe_, packed, lr_arrays,
                k_refine_)
            msg = (payload_base(ptables, scored[1])
                   if ptables is not None else None)
            return (probs, mask) + scored + (msg,)

        self._route_step = route_step
        self._score_step = score_step
        self._full_step = full_step
        # device payload-size tables (set_payload_tables); None = host
        # falls back to its numpy estimator over fetched shard_ids
        self._ptables = None
        self._ivf = (shard_set.ivf_arrays()
                     if impl in ("ivf", "hybrid") else None)
        self._lr = (shard_set.lr_arrays() if impl == "lowrank" else None)
        # serializes live updates against in-flight search dispatches: a
        # donated update between arrays() read and dispatch would hand XLA
        # a deleted buffer (search itself is already serialized by the
        # batcher; updates come from a different handler thread)
        self._step_lock = threading.Lock()

    @property
    def _arrays(self):
        # read through to the ShardSet on every step: live add/delete
        # replaces the shard arrays (donated scatters), and a cached list
        # here would hand XLA deleted buffers
        return self.shard_set.arrays()

    def set_payload_tables(self, per_source, names) -> None:
        """Enable device-side response-size computation (``msg_base``).

        ``per_source``/``names`` as in :func:`build_payload_tables`; pass
        ``per_source=None`` to disable (host estimator over fetched
        shard_ids). The serving layer only enables this for immutable
        shard sets — live add/delete changes doc lengths, and the host
        tables are the source of truth there.
        """
        self._ptables = (None if per_source is None else
                         build_payload_tables(per_source, names,
                                              self.world.k))

    # ------------------------------------------------------------------

    def _next_key(self, strategy: str = "random") -> jax.Array:
        # Only the 'random' strategy consumes the key inside the step;
        # every other strategy gets the current key unadvanced, skipping
        # a per-batch jax.random.split dispatch (~9 ms of host time per
        # batch through the remote tunnel in the serving profile).
        if strategy != "random":
            return self._key
        self._key, sub = jax.random.split(self._key)
        return sub

    def _router_inputs(self):
        if self.params is None or self.bank is None:
            raise ValueError(
                "routing strategy 'ragroute' needs router params + bank")
        return self.params, self.bank

    def _dummy_router(self, input_dim: int):
        # all/random/none never read the MLP output, but the jitted step has
        # a fixed signature; reuse params if present else zeros-like tree.
        if self.params is not None and self.bank is not None:
            return self.params, self.bank
        from ragroute_tpu.router.mlp import init_router_params

        if not hasattr(self, "_zero_params"):
            self._zero_params = init_router_params(
                jax.random.key(0), input_dim)
            self._zero_bank = RouterBank.create(
                self.world,
                {s.name: np.zeros(s.embed_dim, np.float32)
                 for s in self.world.sources},
            )
        return self._zero_params, self._zero_bank

    def search(
        self,
        query_embs: Dict[str, np.ndarray],
        *,
        strategy: str = "ragroute",
        staged: bool = True,
        fetch_candidates: bool = True,
    ) -> SearchOutput:
        """Run one batched federated search.

        ``staged=True`` runs routing and scoring as two device calls and
        reports true per-stage wall times (reference ``selection_time`` /
        ``doc_select_time`` metadata, ``router.py:313-315`` /
        ``http_server.py:195-196,256``); ``staged=False`` fuses them into
        one dispatch (fastest; stage times are reported as one).

        ``fetch_candidates=False`` skips the device->host transfer of the
        per-shard score matrix (``shard_scores`` comes back ``None``):
        the score-merged serving worlds (medrag/wikipedia) never read
        per-source scores host-side, and that ``[B, N, k]`` f32 transfer
        was the single largest host cost in the serving profile
        (``jax.Array._value`` 5.1 s of a 21 s loaded window,
        scripts/profile_http.py --cprofile). feb4rag keeps the full
        fetch (its qrels-oracle rerank consumes per-source candidates).
        """
        with self._step_lock:
            return self._search_locked(
                query_embs, strategy=strategy, staged=staged,
                fetch_candidates=fetch_candidates)

    def _search_locked(
        self,
        query_embs: Dict[str, np.ndarray],
        *,
        strategy: str,
        staged: bool,
        fetch_candidates: bool,
    ) -> SearchOutput:
        embs = self._device_embs(query_embs)
        rng = self._next_key(strategy)
        if strategy == "ragroute":
            params, bank = self._router_inputs()
        else:
            params, bank = self._dummy_router(self.world.router_input_dim)

        # Timing sync: block_until_ready() does NOT synchronize through
        # the axon remote-TPU tunnel; a device->host transfer does. The
        # synced arrays are tiny ([B,N] bools / [B,k] scores).
        if staged:
            t0 = time.perf_counter()
            probs, mask = self._route_step(
                params, bank, embs, rng, strategy=strategy)
            mask = jax.device_get(mask)
            sel_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            scored = self._score_step(
                self._arrays, self._ivf, self._lr, embs, mask,
                self._ptables)
            np.asarray(scored[2])
            doc_t = time.perf_counter() - t0
        else:
            t0 = time.perf_counter()
            out = self._full_step(
                params, bank, self._arrays, self._ivf, self._lr, embs,
                rng, self._ptables, strategy=strategy)
            sel_t = 0.0
            probs, mask, scored = out[0], out[1], out[2:]

        return self._fetch_output(
            probs, mask, scored, fetch_candidates=fetch_candidates,
            sel_t=sel_t, doc_t=(doc_t if staged else None), t0=t0)

    def search_submit(
        self,
        query_embs: Dict[str, np.ndarray],
        *,
        strategy: str = "ragroute",
        staged: bool = False,
        fetch_candidates: bool = True,
    ) -> "PendingSearch":
        """Dispatch one batched search WITHOUT blocking on the result.

        Returns a :class:`PendingSearch`; call :meth:`PendingSearch.wait`
        for the :class:`SearchOutput`. Pipelined serving uses this to
        overlap host-side response assembly of batch N with device
        compute of batch N+1 (the dispatch is async; the coalesced
        device->host fetch is the only blocking part). The step lock is
        held only across the dispatch window — in-flight results are
        immutable output buffers, safe to fetch after a donated live
        update replaces the shard arrays.

        In ``staged`` mode the router stage is synced at submit (its
        timing contract needs a host round trip); only the scoring stage
        overlaps.
        """
        with self._step_lock:
            embs = self._device_embs(query_embs)
            rng = self._next_key(strategy)
            if strategy == "ragroute":
                params, bank = self._router_inputs()
            else:
                params, bank = self._dummy_router(self.world.router_input_dim)
            if staged:
                t0 = time.perf_counter()
                probs, mask = self._route_step(
                    params, bank, embs, rng, strategy=strategy)
                mask = jax.device_get(mask)
                sel_t = time.perf_counter() - t0
                t0 = time.perf_counter()
                scored = self._score_step(
                    self._arrays, self._ivf, self._lr, embs, mask,
                    self._ptables)
            else:
                t0 = time.perf_counter()
                out = self._full_step(
                    params, bank, self._arrays, self._ivf, self._lr, embs,
                    rng, self._ptables, strategy=strategy)
                sel_t = 0.0
                probs, mask, scored = out[0], out[1], out[2:]
        return PendingSearch(
            self, probs, mask, scored, sel_t=sel_t, t0=t0,
            fetch_candidates=fetch_candidates)

    def _fetch_output(
        self, probs, mask, scored, *, fetch_candidates: bool,
        sel_t: float, doc_t, t0: float,
    ) -> SearchOutput:
        # ONE device->host fetch for the whole output pytree: sequential
        # np.asarray per field costs a full round trip each (~27 ms on the
        # remote tunnel, x8 fields dominated serving latency); a single
        # device_get batches them into one transfer. In fused mode this
        # fetch IS the sync, so it closes the doc_select timer.
        msg_dev = scored[6]
        msg_base = None
        if fetch_candidates:
            (probs, mask, shard_scores, shard_ids, merged_score,
             merged_shard, merged_local, merged_valid) = jax.device_get(
                (probs, mask) + tuple(scored[:6]))
        elif msg_dev is not None:
            # device-computed response sizes replace shard_ids' only
            # serving-path consumer: fetch [B, N] i32 instead of [B, N, k]
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
        if doc_t is None:
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

    # -- live updates ---------------------------------------------------

    def add_docs(self, source: str, embeddings, doc_ids=None) -> List[int]:
        """Insert documents into a mutable shard (serialized against
        in-flight search steps); see :meth:`ShardSet.add_docs`."""
        with self._step_lock:
            return self.shard_set.add_docs(source, embeddings, doc_ids)

    def delete_docs(self, source: str, *, doc_ids=None,
                    slots=None) -> List[int]:
        with self._step_lock:
            return self.shard_set.delete_docs(
                source, doc_ids=doc_ids, slots=slots)

    @property
    def update_lock(self):
        """Lock serializing index mutations against search steps; callers
        that must see a mutation-consistent view across several reads
        (e.g. snapshot + payload compaction) hold it for the duration."""
        return self._step_lock

    # ------------------------------------------------------------------

    def resolve_doc_ids(
        self, out: SearchOutput, row: int
    ) -> List[Tuple[str, object]]:
        """Map one query's merged (shard, local) pairs to host doc ids.

        Returns ``[(source_name, doc_id_payload), ...]`` for valid entries.
        """
        res = []
        for j in range(out.merged_shard.shape[1]):
            si = int(out.merged_shard[row, j])
            if si < 0:
                continue
            src = self.world.sources[si]
            ids = self.shard_set.doc_ids.get(src.name)
            local = int(out.merged_local[row, j])
            payload = ids[local] if ids else local
            res.append((src.name, payload))
        return res
