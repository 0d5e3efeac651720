"""Host-RAM corpus tiers: serve corpora bigger than one chip's HBM.

The reference's capacity story is FAISS-on-CPU-RAM — one node serves
pubmed-scale corpora bounded only by host memory
(``ragroute/data_source.py:69-80``). A single v5e chip's measured index
ceiling is ~6.5 GB (BENCHMARKS.md capacity table), i.e. ~8.4M docs at
int8/768-d. This module closes that gap on ONE chip with two tiers, both
built on the same host-resident stored-row format:

* ``impl="stream"`` — the resident prefix of every shard lives in HBM as
  usual; overflow rows live in host RAM as quantized slabs that the
  engine uploads (double-buffered ``jax.device_put`` prefetch) and scans
  with the same fused kernel, merging through a running top-k. This is
  the classic DMA-overlap design and the right shape for PCIe-attached
  production hosts (~25 GB/s effective H2D: a 13 GB overflow streams in
  ~0.5 s, fully hidden behind the MXU scan at serving batch sizes).
  MEASURED CAVEAT for this dev environment: the axon remote-TPU tunnel
  sustains only ~25 MB/s host->device (measured 64 MB/3.6 s,
  256 MB/8.0 s, 1024 MB/50 s — round 4), so per-batch slab streaming is
  bandwidth-refuted HERE (a 13 GB overflow would cost ~9 min/batch);
  the tier stays correctness-gated and the bench records the honest
  DMA-bound number and overlap fraction.

* ``impl="hostrefine"`` — the tier that actually serves >=24M docs at
  usable q/s over a ~25 MB/s link: a rank-``r`` int8 coarse projection
  of EVERY row stays device-resident ([24M, 64] int8 = 1.5 GB), the
  device scans it exhaustively (the MXU does all the heavy FLOPs) and
  returns only ``[B, k']`` int32 candidate ids per routed source; the
  host gathers those k' rows from its RAM store and rescores them
  EXACTLY (same stored-form math as the device kernel, incl. centering
  restore), then merges. Per batch only candidate ids cross the wire
  (~2.6 MB at B=2048/k'=160/2-of-4 routing). This is the two-stage
  ``impl="lowrank"`` design (ops/lowrank_topk.py) with the refine store
  moved off-chip — recall semantics are identical (coarse top-k' cut,
  exact rescore), so the lowrank recall gates carry over.

Sources small enough to fit their HBM budget share stay fully resident
and exact in both tiers (water-filling allocation, smallest first).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from ragroute_tpu.config import (HOSTREFINE_REFINE_MULT, LOWRANK_ENERGY,
                                 LOWRANK_MOMENT_SAMPLE_ROWS,
                                 SHARD_PAD_MULTIPLE, STREAM_HBM_BUDGET_GB,
                                 STREAM_SLAB_MB, WorldConfig)
from ragroute_tpu.index.shard import (_quantize_sym, encode_rows,
                                      parse_storage_dtype)

logger = logging.getLogger("streamed")

_BUILD_BLOCK = 1 << 18  # rows per host build block (f32 transient bound)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class RowSource:
    """Streaming access to one source's raw f32 rows.

    ``get(start, stop)`` returns rows ``[start:stop)`` as ``[m, d]``
    float32 — an in-RAM array slice, an ``np.load(mmap_mode='r')`` view,
    or a generator (the synthetic capacity bench materializes blocks on
    demand so a 24M-doc corpus never exists as one 70 GB f32 array)."""

    n_docs: int
    dim: int
    get: Callable[[int, int], np.ndarray]

    @classmethod
    def from_array(cls, arr) -> "RowSource":
        return cls(int(arr.shape[0]), int(arr.shape[1]),
                   lambda a, b: np.asarray(arr[a:b], dtype=np.float32))


def as_row_source(v) -> RowSource:
    return v if isinstance(v, RowSource) else RowSource.from_array(v)


def _unpack_int4_np(packed: np.ndarray) -> np.ndarray:
    """Host inverse of ``shard._pack_int4`` (low nibble = dim j, high =
    dim j + d//2): returns int8 codes ``[n, d]``."""
    x = packed.astype(np.int8)
    lo = ((x.astype(np.int16) << 12) >> 12).astype(np.int8)  # sign-extend
    hi = (x >> 4).astype(np.int8)
    return np.concatenate([lo, hi], axis=1)


@dataclasses.dataclass
class HostRows:
    """One source's stored-form rows resident in host RAM.

    ``codes`` is the same bytes a :class:`DeviceShard` would hold
    (f32 / bf16 / int8 codes / packed int4), produced by the shared
    :func:`ragroute_tpu.index.shard.encode_rows` so host-tier scoring can
    never drift from the device kernel's stored form."""

    codes: np.ndarray               # [n, d_store]
    bias: np.ndarray                # [n] f32 gain-form (l2: -|d|^2)
    scale: Optional[np.ndarray]     # [n] f32 dequant factors (int8/int4)
    packed4: bool

    @property
    def nbytes(self) -> int:
        return (self.codes.nbytes + self.bias.nbytes
                + (0 if self.scale is None else self.scale.nbytes))

    def rows_f32(self, ids: np.ndarray) -> np.ndarray:
        """Dequantized stored-form f32 rows for the given local ids
        (the exact values the device kernel scores against)."""
        raw = self.codes[ids]
        if self.packed4:
            raw = _unpack_int4_np(raw)
        out = np.asarray(raw, dtype=np.float32)
        if self.scale is not None:
            if self.scale.ndim == 2:   # per-group int4 scales [n, G]
                dg = out.shape[1] // self.scale.shape[1]
                out *= np.repeat(self.scale[ids], dg, axis=1)
            else:
                out *= self.scale[ids][:, None]
        return out


@dataclasses.dataclass
class StreamSource:
    """Per-source serving state for the host-RAM tiers."""

    name: str
    score_mode: str
    encoder: str
    embed_dim: int
    n_docs: int
    center: Optional[np.ndarray]          # corpus mean (lossy l2/dot)
    # device-resident exact rows (tier "stream": the prefix; fully-fitting
    # sources in either tier: everything). None fields where absent.
    res_docs = None                       # device [n_res_pad, d_store]
    res_bias = None                       # device [n_res_pad]
    res_scale = None                      # device or None
    n_res: int = 0                        # real rows resident
    # host overflow rows (rows [n_res, n_docs) — stream tier), or the
    # WHOLE corpus (hostrefine tier, for refine)
    host: Optional[HostRows] = None
    host_row0: int = 0                    # global row of host.codes[0]
    slab_rows: int = 0                    # uniform padded slab height
    n_slabs: int = 0
    # hostrefine coarse tier
    basis: Optional[np.ndarray] = None    # device [d, r] f32
    mu_lr: Optional[np.ndarray] = None    # device [d] f32 coarse center
    coarse_docs = None                    # device [n_pad, r] int8 (flat
    #                                       scan; None when clustered)
    coarse_scale = None                   # device [n_pad] f32
    coarse_bias = None                    # device [n_pad] f32
    coarse_cl = None                      # ops.grouped_topk.ClusteredCoarse
    #                                       (probed scan; replaces the flat
    #                                       slab above when built)
    rank: int = 0

    @property
    def device_bytes(self) -> int:
        tot = 0
        arrs = [self.res_docs, self.res_bias, self.res_scale,
                self.coarse_docs, self.coarse_scale, self.coarse_bias,
                self.basis]
        if self.coarse_cl is not None:
            cl = self.coarse_cl
            arrs += [cl.centroids, cl.cbias, cl.docs, cl.bias, cl.scale,
                     cl.perm]
        for a in arrs:
            if a is not None:
                tot += a.size * a.dtype.itemsize
        return tot

    def slab(self, j: int) -> Tuple[np.ndarray, np.ndarray,
                                    Optional[np.ndarray], int]:
        """(codes, bias, scale, global_offset) host views of slab ``j``."""
        a = j * self.slab_rows
        b = a + self.slab_rows
        return (self.host.codes[a:b], self.host.bias[a:b],
                None if self.host.scale is None else self.host.scale[a:b],
                self.host_row0 + a)


class _ShardMeta:
    """ShardSet-compatible per-source handle (server metadata surface)."""

    __slots__ = ("name", "n_docs", "score_mode")

    def __init__(self, name, n_docs, score_mode):
        self.name = name
        self.n_docs = n_docs
        self.score_mode = score_mode


def _water_fill(sizes: List[int], budget: int) -> List[int]:
    """Allocate ``budget`` bytes over sources, smallest fully first."""
    order = sorted(range(len(sizes)), key=lambda i: sizes[i])
    alloc = [0] * len(sizes)
    remaining = budget
    for pos, i in enumerate(order):
        share = remaining // (len(sizes) - pos)
        alloc[i] = min(sizes[i], share)
        remaining -= alloc[i]
    # second pass: hand leftover (from fully-fitting small sources) to the
    # still-starved large ones, largest share first
    for i in sorted(range(len(sizes)), key=lambda i: -sizes[i]):
        if remaining <= 0:
            break
        extra = min(sizes[i] - alloc[i], remaining)
        alloc[i] += extra
        remaining -= extra
    return alloc


@dataclasses.dataclass
class StreamedShardSet:
    """Host-RAM-backed shard set (interface-compatible with ShardSet
    where the serving stack reads it: ``world``, ``shards`` metadata,
    ``doc_ids``, ``total_docs``, ``index_bytes``, ``mutable``)."""

    world: WorldConfig
    sources: List[StreamSource]
    doc_ids: Dict[str, Optional[list]]
    tier: str                     # "stream" | "hostrefine"
    packed4: bool = False         # int4-packed stored rows (all sources)
    mutable: bool = False
    lowrank_built: bool = False

    @property
    def shards(self) -> List[_ShardMeta]:
        return [_ShardMeta(s.name, s.n_docs, s.score_mode)
                for s in self.sources]

    @property
    def total_docs(self) -> int:
        return sum(s.n_docs for s in self.sources)

    @property
    def index_bytes(self) -> int:
        """Device-resident bytes (the HBM footprint)."""
        return sum(s.device_bytes for s in self.sources)

    @property
    def host_bytes(self) -> int:
        return sum(s.host.nbytes for s in self.sources
                   if s.host is not None)

    # -- construction --------------------------------------------------------

    @classmethod
    def build(
        cls,
        world: WorldConfig,
        row_sources: Mapping[str, object],
        *,
        dtype="int8",
        tier: str = "stream",
        hbm_budget_bytes: Optional[int] = None,
        slab_bytes: Optional[int] = None,
        rank: Optional[int] = None,
        normalize_cos: bool = True,
        doc_ids: Optional[Mapping[str, Sequence]] = None,
        device=None,
        cluster_coarse: Optional[bool] = None,
    ) -> "StreamedShardSet":
        """Build the host tiers block-by-block (nothing ever materializes
        the full f32 corpus; peak host transient is one build block).

        ``dtype``: stored dtype for BOTH the device-resident rows and the
        host rows — jnp.int8 / "int4" recommended (the tiers exist for
        capacity). ``rank``: coarse projection rank for tier
        "hostrefine" (None/-1 = automatic by LOWRANK_ENERGY spectrum).
        ``cluster_coarse``: k-means-cluster the hostrefine coarse slab
        for probed scanning (ops/grouped_topk.py). None = automatic:
        cluster sources with more than HOSTREFINE_CLUSTER_MIN_DOCS host
        rows; True forces it at any size (tests); False keeps the flat
        exhaustive coarse scan."""
        import jax
        import jax.numpy as jnp

        if isinstance(dtype, str) and dtype in ("int8",):
            dtype = jnp.int8
        packed4 = parse_storage_dtype(dtype)
        if tier not in ("stream", "hostrefine"):
            raise ValueError(f"unknown streamed tier {tier!r}")
        budget = (int(STREAM_HBM_BUDGET_GB * 1e9)
                  if hbm_budget_bytes is None else int(hbm_budget_bytes))
        slab_b = (STREAM_SLAB_MB << 20) if slab_bytes is None \
            else int(slab_bytes)

        rs = {name: as_row_source(v) for name, v in row_sources.items()}
        srcs: List[StreamSource] = []
        ids: Dict[str, Optional[list]] = {}

        def store_width(d):
            if packed4:
                return d // 2
            return d * jnp.dtype(dtype).itemsize

        # water-fill the HBM budget over the EXACT-row bytes of each
        # source; coarse slabs (hostrefine) ride outside the fill (they
        # are ~d/r smaller and always resident)
        names = [s.name for s in world.sources]
        for s in world.sources:
            if s.name not in rs:
                raise KeyError(f"missing rows for source {s.name!r}")
        sizes = [rs[s.name].n_docs * (store_width(s.embed_dim) + 8)
                 for s in world.sources]
        alloc = _water_fill(sizes, budget)

        for si, src in enumerate(world.sources):
            source = rs[src.name]
            n, d = source.n_docs, source.dim
            if d != src.embed_dim:
                raise ValueError(
                    f"{src.name}: dim {d} != world {src.embed_dim}")
            if n < world.k:
                raise ValueError(
                    f"{src.name}: {n} docs < k={world.k}")
            row_b = store_width(d) + 8
            n_res = min(n, alloc[si] // row_b)
            # resident prefix: at least k rows, SHARD_PAD_MULTIPLE-aligned
            n_res = max(n_res, min(n, max(world.k, SHARD_PAD_MULTIPLE)))
            n_res = min(n, _round_up(n_res, SHARD_PAD_MULTIPLE)) \
                if n_res < n else n
            full_res = n_res >= n
            if tier == "hostrefine" and not full_res:
                n_res = 0  # coarse covers everything; host rows refine

            center = None
            if src.score_mode in ("l2", "dot") and dtype != jnp.float32:
                # corpus mean over the FULL source (build pass 1) — the
                # same centering ShardSet.build applies, computed
                # streaming in f64
                acc = np.zeros(d, np.float64)
                for a in range(0, n, _BUILD_BLOCK):
                    blk = source.get(a, min(a + _BUILD_BLOCK, n))
                    acc += blk.sum(axis=0, dtype=np.float64)
                center = (acc / n).astype(np.float32)

            st = StreamSource(
                name=src.name, score_mode=src.score_mode,
                encoder=src.encoder, embed_dim=d, n_docs=n, center=center)

            d_store = d // 2 if packed4 else d
            np_dtype = (np.int8 if packed4
                        else np.dtype(jnp.dtype(dtype).name))
            # scale shape: [n] for int8 / per-doc int4; [n, G] for the
            # per-group int4 scheme (shard.encode_rows picks it when the
            # dim divides INT4_GROUP_DIMS)
            from ragroute_tpu.config import INT4_GROUP_DIMS

            if packed4 and d % INT4_GROUP_DIMS == 0:
                s_shape = (d // INT4_GROUP_DIMS,)
            elif packed4 or dtype == jnp.int8:
                s_shape = ()
            else:
                s_shape = None

            # pass 2: encode blocks into (resident | host) destinations
            if n_res:
                n_res_pad = _round_up(n_res, SHARD_PAD_MULTIPLE)
                res_codes = np.zeros((n_res_pad, d_store), np_dtype)
                res_bias = np.full(n_res_pad, -np.inf, np.float32)
                res_scale = (np.full((n_res_pad,) + s_shape, 1e-12,
                                     np.float32)
                             if s_shape is not None else None)
            n_host = n - n_res
            if n_host:
                if tier == "hostrefine":
                    slab_rows = 0
                    n_host_pad = n_host
                else:
                    slab_rows = max(SHARD_PAD_MULTIPLE,
                                    _round_up(slab_b // max(row_b, 1),
                                              SHARD_PAD_MULTIPLE))
                    # never pad a small overflow up to a full slab
                    slab_rows = min(slab_rows,
                                    _round_up(n_host, SHARD_PAD_MULTIPLE))
                    n_host_pad = _round_up(n_host, slab_rows)
                h_codes = np.zeros((n_host_pad, d_store), np_dtype)
                h_bias = np.full(n_host_pad, -np.inf, np.float32)
                h_scale = (np.full((n_host_pad,) + s_shape, 1e-12,
                                   np.float32)
                           if s_shape is not None else None)
            for a in range(0, n, _BUILD_BLOCK):
                b = min(a + _BUILD_BLOCK, n)
                stored, bias, scale = encode_rows(
                    source.get(a, b), src.score_mode, dtype=dtype,
                    packed4=packed4, center=center,
                    norm_cos=normalize_cos)
                if b <= n_res:
                    res_codes[a:b], res_bias[a:b] = stored, bias
                    if scale is not None:
                        res_scale[a:b] = scale
                elif a >= n_res:
                    ha, hb = a - n_res, b - n_res
                    h_codes[ha:hb], h_bias[ha:hb] = stored, bias
                    if scale is not None:
                        h_scale[ha:hb] = scale
                else:  # block straddles the resident boundary
                    cut = n_res - a
                    res_codes[a:n_res] = stored[:cut]
                    res_bias[a:n_res] = bias[:cut]
                    h_codes[:b - n_res] = stored[cut:]
                    h_bias[:b - n_res] = bias[cut:]
                    if scale is not None:
                        res_scale[a:n_res] = scale[:cut]
                        h_scale[:b - n_res] = scale[cut:]

            if n_res:
                put = (lambda x: jax.device_put(x, device)) if device \
                    else jnp.asarray
                st.res_docs = put(res_codes)
                st.res_bias = put(res_bias)
                st.res_scale = None if res_scale is None else put(res_scale)
                st.n_res = n_res
                del res_codes, res_bias, res_scale
            if n_host:
                st.host = HostRows(codes=h_codes, bias=h_bias,
                                   scale=h_scale, packed4=packed4)
                st.host_row0 = n_res
                if tier == "stream":
                    st.slab_rows = slab_rows
                    st.n_slabs = n_host_pad // slab_rows

            if tier == "hostrefine" and n_host:
                from ragroute_tpu.config import HOSTREFINE_CLUSTER_MIN_DOCS
                do_cluster = (cluster_coarse if cluster_coarse is not None
                              else (HOSTREFINE_CLUSTER_MIN_DOCS > 0
                                    and n_host
                                    >= HOSTREFINE_CLUSTER_MIN_DOCS))
                cls._build_coarse(st, source, rank, normalize_cos,
                                  center, device, cluster=do_cluster)

            logger.info(
                "%s/%s: %d docs -> resident %d rows (%.2f GB), host %d "
                "rows (%.2f GB)%s", tier, src.name, n, st.n_res,
                st.device_bytes / 1e9, n_host,
                0 if st.host is None else st.host.nbytes / 1e9,
                f", coarse r={st.rank}" if st.rank else "")
            srcs.append(st)
            ids[src.name] = (list(doc_ids[src.name])
                             if doc_ids and src.name in doc_ids else None)
        return cls(world=world, sources=srcs, doc_ids=ids, tier=tier,
                   packed4=packed4)

    @staticmethod
    def _build_coarse(st: StreamSource, source: RowSource, rank,
                      normalize_cos: bool, center, device,
                      cluster: bool = False) -> None:
        """Rank-r int8 coarse projection of EVERY row (hostrefine tier).

        Basis = top eigenvectors of the stored-form covariance (sampled),
        exactly :func:`index.lowrank.build_lowrank`'s recipe; the coarse
        slab is centered by the sample mean (a per-query constant in
        every score mode, see lowrank.py's ordering argument) and int8
        per-doc quantized for HBM capacity."""
        import jax
        import jax.numpy as jnp

        from ragroute_tpu.index.lowrank import select_rank

        n, d = source.n_docs, source.dim
        step = max(1, n // LOWRANK_MOMENT_SAMPLE_ROWS)
        samples = []
        for a in range(0, n, _BUILD_BLOCK):
            b = min(a + _BUILD_BLOCK, n)
            blk = source.get(a, b)[::step]
            if st.score_mode == "cos" and normalize_cos:
                blk = blk / np.maximum(
                    np.linalg.norm(blk, axis=1, keepdims=True), 1e-12)
            if center is not None:
                blk = blk - center
            samples.append(np.asarray(blk, np.float32))
        sample = np.concatenate(samples, axis=0)
        del samples
        mu_lr = sample.mean(axis=0, dtype=np.float64).astype(np.float32)
        sample -= mu_lr
        moment = sample.T @ sample
        w, v = np.linalg.eigh(moment.astype(np.float64))
        w, v = w[::-1], v[:, ::-1]
        r = select_rank(np.maximum(w, 0.0), LOWRANK_ENERGY,
                        None if (rank is None or rank < 0) else rank)
        if r is None:
            # flat spectrum: a profitable projection does not exist; fall
            # back to half the dimension (capacity still 2x+ via int8 —
            # the tier must serve, unlike opt-in impl="lowrank")
            r = max(128, d // 4)
            logger.warning(
                "%s: flat spectrum; hostrefine coarse falls back to "
                "rank %d", st.name, r)
        basis = np.ascontiguousarray(v[:, :r]).astype(np.float32)
        del sample, moment

        n_pad = _round_up(n, SHARD_PAD_MULTIPLE)
        c_codes = np.zeros((n_pad, r), np.int8)
        c_scale = np.full(n_pad, 1e-12, np.float32)
        c_bias = np.full(n_pad, -np.inf, np.float32)
        for a in range(0, n, _BUILD_BLOCK):
            b = min(a + _BUILD_BLOCK, n)
            blk = source.get(a, b)
            if st.score_mode == "cos" and normalize_cos:
                blk = blk / np.maximum(
                    np.linalg.norm(blk, axis=1, keepdims=True), 1e-12)
            if center is not None:
                blk = blk - center
            proj = (np.asarray(blk, np.float32) - mu_lr) @ basis
            codes, scales = _quantize_sym(proj, 127)
            c_codes[a:b], c_scale[a:b] = codes, scales
            # l2 gain bias stays the EXACT full-dimension -|d|^2 (the
            # stored-form bias the host rows carry); dot/cos coarse run
            # bias-free apart from the -inf padding sentinel
            c_bias[a:b] = (st.host.bias[a - st.host_row0:b - st.host_row0]
                           if st.score_mode == "l2" else 0.0)
        put = (lambda x: jax.device_put(x, device)) if device \
            else jnp.asarray
        st.basis = put(basis)
        st.mu_lr = put(mu_lr)
        st.rank = r
        if cluster:
            # probed coarse: cluster-major slab replaces the flat one
            # (same codes/scales/biases permuted into slots — a full
            # probe scores the exact same values). Padded rows carry
            # -inf bias and were already excluded above (c_bias pads).
            from ragroute_tpu.ops.grouped_topk import cluster_coarse_slab

            st.coarse_cl = cluster_coarse_slab(
                c_codes[:n], c_scale[:n], c_bias[:n], 0)
            logger.info("%s: coarse clustered C=%d S=%d", st.name,
                        st.coarse_cl.n_clusters, st.coarse_cl.capacity)
        else:
            st.coarse_docs = put(c_codes)
            st.coarse_scale = put(c_scale)
            st.coarse_bias = put(c_bias)

    @classmethod
    def load(cls, root: str, world: WorldConfig, *, dtype="int8",
             tier: str = "stream", **kw) -> "StreamedShardSet":
        """Load a world from ``<root>/<world>/<source>/embeddings.npy``
        mmaps — rows stream from disk through the block encoder, so a
        corpus larger than host RAM in f32 still builds (the host keeps
        only the quantized bytes)."""
        from ragroute_tpu.index.shard import ShardSet

        row_sources = {}
        doc_ids = {}
        for src in world.sources:
            d = ShardSet.source_dir(root, world.name, src.name)
            emb_path = os.path.join(d, "embeddings.npy")
            if not os.path.exists(emb_path):
                raise FileNotFoundError(
                    f"no shard data for {world.name}/{src.name} under "
                    f"{root} (expected {emb_path})")
            row_sources[src.name] = RowSource.from_array(
                np.load(emb_path, mmap_mode="r"))
            ids_path = os.path.join(d, "doc_ids.json")
            if os.path.exists(ids_path):
                import json

                with open(ids_path) as f:
                    doc_ids[src.name] = json.load(f)
        return cls.build(world, row_sources, dtype=dtype, tier=tier,
                         doc_ids=doc_ids, **kw)

    # -- host-side exact rescoring (hostrefine tier) ------------------------

    def refine_flat(self, si: int, queries: np.ndarray,
                    flat_ids: np.ndarray, flat_q: np.ndarray,
                    chunk: int = 8192) -> np.ndarray:
        """Exact stored-form scores of a FLAT candidate list (the global
        hostrefine path): ``flat_ids[m]`` local row ids of source ``si``,
        ``flat_q[m]`` the query row of each candidate. Returns natural
        scores ``[m]`` f32.

        Hot-path notes (measured on the 25M-doc capacity bench): scales
        apply to the DOTS (per-doc) rather than the gathered rows — one
        [m] multiply instead of an [m, d] pass (-30% refine wall); the
        per-group int4 scheme still dequantizes rows (group scales
        cannot ride the dot). Work runs in fixed-size ``chunk`` blocks:
        the unchunked path allocated ~1.5 GB of one-shot temporaries per
        call ([m, d] query gather + int8 gather + f32 cast at m≈200k),
        which drove glibc into an alternating mmap/reclaim regime —
        identical consecutive batches measured 0.4 s vs 5.4 s for the
        SAME candidate list. Blocks must stay under glibc's dynamic
        mmap-threshold cap (32 MB) to recycle through the arena free
        lists: measured on the m=198k statpearls workload, 65536-row
        chunks (~200 MB f32 temps, always mmap+fault) run 490 ms/call
        vs 185 ms at 8192 rows (~25 MB temps, steady across reps)."""
        st = self.sources[si]
        host = st.host
        q = np.asarray(queries, np.float32)
        if st.score_mode == "cos":
            q = q / np.maximum(
                np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        if st.score_mode == "l2" and st.center is not None:
            q = q - st.center
        grouped = host.scale is not None and host.scale.ndim == 2
        m = flat_ids.size
        out = np.empty(m, np.float32)
        for a in range(0, m, chunk):
            b = min(a + chunk, m)
            # candidate ids are GLOBAL row ids; host rows start at
            # host_row0 (0 for hostrefine coarse sources today, n_res if
            # a resident prefix ever coexists) — shift + bounds-mask like
            # refine() so out-of-range ids score NaN instead of silently
            # reading the wrong row
            gids = flat_ids[a:b]
            ok = (gids >= st.host_row0) & (gids < st.n_docs)
            ids_c = np.where(ok, gids - st.host_row0, 0)
            qg = q[flat_q[a:b]]                           # [c, d]
            if grouped or host.packed4:
                rows = host.rows_f32(ids_c)
                dots = np.einsum("md,md->m", rows, qg)
            else:
                rows = host.codes[ids_c]
                if rows.dtype != np.float32:
                    rows = rows.astype(np.float32)
                dots = np.einsum("md,md->m", rows, qg)
                if host.scale is not None:
                    dots *= host.scale[ids_c]
            if st.score_mode == "l2":
                qsq = np.einsum("md,md->m", qg, qg)
                vals = qsq - (2.0 * dots + host.bias[ids_c])
            elif st.score_mode == "dot" and st.center is not None:
                vals = dots + qg @ st.center
            else:
                vals = dots
            out[a:b] = np.where(ok, vals, np.nan)
        return out

    def refine(self, si: int, queries: np.ndarray, cand: np.ndarray,
               k: int, chunk: int = 64
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact-rescore coarse candidates against the host rows.

        Args:
          si: source index. queries: ``[B, d]`` f32 raw query embeddings.
          cand: ``[B, k']`` int32 global row ids (coarse winners; ids < 0
            or >= n_docs are ignored). k: final depth.

        Returns ``(scores [B, k] natural-form, ids [B, k] int32)``,
        best-first with FAISS tie-breaking (lower id wins), invalid
        entries scored NaN/-1. The math mirrors the device kernel's
        stored-form gains exactly: stored rows are dequantized f32, l2
        uses the stored ``-|d|^2`` bias, dot restores ``q . center``.
        ``chunk`` keeps the [chunk*k', d] f32 row temporaries under
        glibc's 32 MB dynamic-mmap-threshold cap so they recycle via
        the arena instead of faulting fresh pages per chunk (same
        measurement as :meth:`refine_flat`'s docstring).
        """
        st = self.sources[si]
        host = st.host
        bsz, kp = cand.shape
        q = np.asarray(queries, np.float32)
        if st.score_mode == "cos":
            q = q / np.maximum(
                np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        restore = None
        if st.score_mode == "dot" and st.center is not None:
            restore = q @ st.center                     # [B]
        if st.score_mode == "l2" and st.center is not None:
            q = q - st.center
        l2 = st.score_mode == "l2"
        out_s = np.full((bsz, k), np.nan, np.float32)
        out_i = np.full((bsz, k), -1, np.int32)
        for a in range(0, bsz, chunk):
            b = min(a + chunk, bsz)
            ids = cand[a:b]
            ok = (ids >= st.host_row0) & (ids < st.n_docs)
            safe = np.where(ok, ids - st.host_row0, 0)
            flat = safe.reshape(-1)
            rows = host.rows_f32(flat).reshape(b - a, kp, -1)
            dots = np.einsum("bkd,bd->bk", rows, q[a:b],
                             optimize=True)
            if l2:
                qsq = np.einsum("bd,bd->b", q[a:b], q[a:b])
                # |q-d|^2 = |q|^2 - (2 q.d + bias)   (bias = -|d|^2)
                gain = 2.0 * dots + host.bias[flat].reshape(b - a, kp)
                nat = qsq[:, None] - gain
                key = -nat
            else:
                nat = dots
                if restore is not None:
                    nat = nat + restore[a:b, None]
                key = nat
            key = np.where(ok, key, -np.inf)
            # FAISS tie-break: among equal keys the LOWER id wins; sort
            # by (-key, id) lexicographically
            order = np.lexsort((np.where(ok, ids, np.iinfo(np.int32).max),
                                -key), axis=1)[:, :k]
            kk = np.take_along_axis(key, order, axis=1)
            valid = kk > -np.inf
            out_s[a:b] = np.where(valid, (-kk if l2 else kk), np.nan)
            out_i[a:b] = np.where(
                valid, np.take_along_axis(ids, order, axis=1), -1)
        return out_s, out_i
