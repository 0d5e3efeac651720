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

from ragroute_tpu.config import WorldConfig
from ragroute_tpu.engine.engine import _route_fn, gate_and_merge
from ragroute_tpu.index.ivf import IVFData
from ragroute_tpu.index.shard import ShardSet
from ragroute_tpu.ops.topk import NEG_INF, _prepare_queries, shard_topk, \
    gain_to_natural
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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a doc-axis-sharded corpus.

    ``queries [B, d]`` is split over ``dp`` (replicated over ``idx``);
    ``docs [N, d]`` / ``bias [N]`` are split over ``idx`` (replicated over
    ``dp``). Padding rows must carry ``-inf`` bias (ShardSet does this).
    ``routed [B] bool`` (dp-split) enables routing-aware compaction: when
    at most half of a device's local batch routes here, only a gathered
    half batch is scored (per-device ``lax.cond``; safe under SPMD since
    neither branch contains a collective — the all-gather merge runs
    unconditionally after). Returns globally-merged
    ``(scores [B, k], global_indices [B, k])``, batch-sharded over ``dp``.
    """
    n_idx = mesh.shape["idx"]
    if center is not None:
        # mean-centered l2 shard: shift queries once, outside the mesh body
        # (|q-d|^2 is invariant; center is replicated, docs hold residuals)
        queries = queries.astype(jnp.float32) - center
    n = docs.shape[0]
    if n % n_idx != 0:
        raise ValueError(f"doc axis {n} not divisible by idx={n_idx}")
    n_local = n // n_idx
    l2 = mode == "l2"
    worst = jnp.inf if l2 else -jnp.inf

    def local_topk(q_l, docs_l, bias_l, routed_l, scale_l):
        if routed_l is None:
            return shard_topk(q_l, docs_l, k, mode=mode, bias=bias_l,
                              scale=scale_l, impl=impl)
        bsz_l = q_l.shape[0]
        half = bsz_l // 2

        def full():
            return shard_topk(q_l, docs_l, k, mode=mode, bias=bias_l,
                              scale=scale_l, impl=impl)

        def compact():
            order = jnp.argsort(jnp.logical_not(routed_l), stable=True)
            sel = order[:half]
            s_c, i_c = shard_topk(q_l[sel], docs_l, k, mode=mode,
                                  bias=bias_l, scale=scale_l, impl=impl)
            s = jnp.full((bsz_l, k), worst,
                         dtype=jnp.float32).at[sel].set(s_c)
            idx = jnp.zeros((bsz_l, k), dtype=jnp.int32).at[sel].set(i_c)
            return s, idx

        if half < 8:
            return full()
        return jax.lax.cond(routed_l.sum() <= half, compact, full)

    def local_fn(q_l, docs_l, bias_l, *extras):
        extras = list(extras)
        routed_l = extras.pop(0) if routed is not None else None
        scale_l = extras.pop(0) if scale is not None else None
        s, i = local_topk(q_l, docs_l, bias_l, routed_l, scale_l)
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
        in_specs.append(P("idx"))
        args.append(scale)
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("dp", None), P("dp", None)),
        # outputs ARE replicated over idx (identical merge of the same
        # all-gathered candidates on every idx peer), but the static
        # varying-manual-axes checker can't prove it
        check_vma=False,
    )(*args)


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
    c, d, s = ivf.docs.shape
    if c % n_idx != 0:
        raise ValueError(f"cluster axis {c} not divisible by idx={n_idx}")
    c_local = c // n_idx
    k1 = min(k, s)
    p = int(min(max(nprobe, -(-k // k1)), c))
    if center is not None:
        queries = queries.astype(jnp.float32) - center
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
        if docs_cast.dtype == jnp.int8:
            docs_cast = docs_cast.astype(jnp.bfloat16)
        qd = qq.astype(docs_cast.dtype)[pair_q]
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
        # each pair slot is owned by exactly one idx peer: gather all
        # peers' views and keep the owner's (the only one above NEG_INF)
        all_g = jax.lax.all_gather(
            pair_g.reshape(bsz_l, p, k1), "idx")       # [n, Bl, P, k1]
        all_i = jax.lax.all_gather(pair_i.reshape(bsz_l, p, k1), "idx")
        own = jnp.argmax(all_g, axis=0)
        gbest = jnp.max(all_g, axis=0)                 # [Bl, P, k1]
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
    return scores, idx


class ShardedSearch:
    """Full federated search step over a ``(dp, idx)`` mesh.

    Same semantics as :class:`ragroute_tpu.engine.FederatedSearchEngine`
    (route → score → gate → merge) with every corpus's documents sharded
    over ``idx`` and the batch over ``dp``. Router params/bank are
    replicated (they are tiny).
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
    ):
        self.world: WorldConfig = shard_set.world
        self.mesh = mesh
        self.impl = impl
        self._key = jax.random.key(seed)
        n_idx = mesh.shape["idx"]

        repl = NamedSharding(mesh, P())
        docs_sh = NamedSharding(mesh, P("idx", None))
        bias_sh = NamedSharding(mesh, P("idx"))

        self.params = jax.device_put(params, repl)
        self.bank = jax.device_put(bank, repl)
        self.arrays = []
        for s in shard_set.shards:
            docs, bias, scale, center = s.docs, s.bias, s.scale, s.center
            n = docs.shape[0]
            if n % n_idx != 0:
                # re-pad to the idx multiple; padding carries -inf bias
                pad = (-n) % n_idx
                docs = jnp.pad(docs, ((0, pad), (0, 0)))
                bias = jnp.pad(bias, (0, pad), constant_values=-jnp.inf)
                if scale is not None:
                    scale = jnp.pad(scale, (0, pad))
            self.arrays.append((
                jax.device_put(docs, docs_sh),
                jax.device_put(bias, bias_sh),
                None if scale is None else jax.device_put(scale, bias_sh),
                None if center is None else jax.device_put(center, repl),
            ))

        world = self.world
        k = world.k
        mesh_ = mesh
        impl__ = impl

        @functools.partial(jax.jit, static_argnames=("strategy",))
        def step(params, bank, arrays, query_embs, rng, *, strategy: str):
            probs, mask = _route_fn(
                world, strategy, params, bank, query_embs, rng, threshold)
            per_scores, per_ids = [], []
            for i, src in enumerate(world.sources):
                docs, bias, scale, center = arrays[i]
                s, gi = sharded_shard_topk(
                    mesh_, query_embs[src.encoder], docs, bias, k,
                    mode=src.score_mode, impl=impl__, routed=mask[:, i],
                    scale=scale, center=center)
                per_scores.append(s)
                per_ids.append(gi)
            return (probs, mask) + gate_and_merge(
                world, k, mask, per_scores, per_ids)

        self._step = step
        self._q_sharding = NamedSharding(mesh, P("dp", None))

    def search(self, query_embs: Dict[str, np.ndarray], *,
               strategy: str = "ragroute"):
        """Run one sharded search; returns the same tuple layout as the
        single-chip full step (probs, mask, shard_scores, shard_ids,
        merged_score, merged_shard, merged_local, merged_valid)."""
        embs = {}
        for enc in self.world.encoders:
            arr = jnp.asarray(query_embs[enc], dtype=jnp.float32)
            embs[enc] = jax.device_put(arr, self._q_sharding)
        self._key, sub = jax.random.split(self._key)
        return self._step(
            self.params, self.bank, self.arrays, embs, sub,
            strategy=strategy)
