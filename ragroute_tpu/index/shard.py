"""HBM-resident corpus embedding shards.

The TPU replacement for the reference's per-process FAISS indexes
(``ragroute/data_source.py:69-80``: ``faiss.read_index`` + id-map load).
A shard is a fixed-shape ``[n_pad, d]`` dense array of document embeddings
(bf16 by default for HBM bandwidth; f32 for strict parity runs), padded to
the scoring kernel's tile multiple, plus a precomputed gain-form per-doc
bias for l2 shards.

Document id/text lookup stays host-side (:mod:`ragroute_tpu.index.store`),
applied only to the final merged top-k — ids never ride the scoring path.

On-disk layout (relocatable, replaces reference NFS paths):

    <root>/<world>/<source>/embeddings.npy   # [n_docs, d] float32
    <root>/<world>/<source>/doc_ids.json     # list of doc id payloads
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import (TYPE_CHECKING, Dict, List, Mapping, Optional, Sequence,
                    Tuple)

if TYPE_CHECKING:  # annotation only; runtime import stays lazy
    from ragroute_tpu.index.ivf import IVFData
    from ragroute_tpu.index.lowrank import LowRankData

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ragroute_tpu.config import (SHARD_PAD_MULTIPLE, UPDATE_CHUNK,
                                 WorldConfig)

# Chunked-scatter note: short UPDATE_CHUNK chunks pad by repeating their
# last (slot, value) pair — duplicate same-value writes are idempotent,
# so the result is deterministic.


def _atomic_np_save(path: str, arr: np.ndarray) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # explicit handle: np.save(str) appends .npy
        np.save(f, arr)
    os.replace(tmp, path)


def _atomic_json_dump(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def parse_storage_dtype(dtype) -> bool:
    """True when ``dtype`` is the packed-int4 marker string ``"int4"``
    (which has no jnp dtype — storage is int8 bytes holding two codes);
    rejects any other string. jnp dtypes pass through as not-packed.
    Shared by :meth:`ShardSet.build` and :func:`index.ivf.build_ivf` so
    the two entry points cannot drift."""
    packed4 = isinstance(dtype, str) and dtype == "int4"
    if isinstance(dtype, str) and not packed4:
        raise ValueError(f"unknown dtype string {dtype!r} "
                         f"(only 'int4' is a string dtype)")
    return packed4


def _quantize_sym(emb: np.ndarray, levels: int,
                  mse_opt: bool = False
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-doc symmetric quantization to ``[-levels, levels]`` int codes:
    ``d_q = round(d / s)``, ``s = max|d| / levels``. Returns (codes int8,
    scales f32). levels=127 → int8 storage; levels=7 → int4 codes.

    ``mse_opt`` (the int4 path): with only 15 levels a max-scaled row
    wastes most of its resolution on one outlier dim, so (1) each doc
    picks the clip percentile (90/95/97/99/99.9/max) minimizing its own
    reconstruction MSE — values beyond the clip saturate — and (2) the
    scale is then corrected so the dequantized row's NORM is exact,
    removing the systematic magnitude shrink saturation causes. Measured
    on the synthetic gate corpora (seed 21, routing=ragroute — the
    hardest cell, where winners come from few shards so the k boundary
    sits deep in one ranking): feb4rag cos-4096d recall@10 0.779 →
    0.892, wikipedia/medrag unchanged-or-better. A random-rotation
    pre-transform was considered and rejected: it only helps structured
    outliers, and these corpora (like most dense-encoder embeddings) are
    near-isotropic — ~0.89 on 4096-d cos is close to the 4-bit/dim
    information limit. int8's 127 levels need none of this.
    """
    if not mse_opt:
        amax = np.abs(emb).max(axis=1)
        s_row = np.where(amax <= 0.0, 1.0, amax / float(levels))
        s_row = s_row.astype(np.float32)
        codes = np.clip(np.round(emb / s_row[:, None]),
                        -levels, levels).astype(np.int8)
        return codes, s_row
    best_err = best_codes = best_s = None
    for pct in (90.0, 95.0, 97.0, 99.0, 99.9, None):
        amax = (np.abs(emb).max(axis=1) if pct is None
                else np.percentile(np.abs(emb), pct, axis=1))
        s = np.maximum(amax / float(levels), 1e-12).astype(np.float32)
        codes = np.clip(np.round(emb / s[:, None]),
                        -levels, levels).astype(np.int8)
        err = ((codes.astype(np.float32) * s[:, None] - emb) ** 2).sum(1)
        if best_err is None:
            best_err, best_codes, best_s = err, codes, s
        else:
            m = err < best_err
            best_err = np.where(m, err, best_err)
            best_codes[m] = codes[m]
            best_s = np.where(m, s, best_s)
    deq_norm = np.linalg.norm(
        best_codes.astype(np.float32) * best_s[:, None], axis=1)
    true_norm = np.linalg.norm(emb, axis=1)
    fix = np.where(deq_norm > 0,
                   true_norm / np.maximum(deq_norm, 1e-12), 1.0)
    return best_codes, (best_s * fix).astype(np.float32)


def _quantize_sym_grouped(emb: np.ndarray, levels: int, group_dims: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-(doc, group) symmetric quantization: each ``group_dims``-wide
    slice of every row gets its own MSE-optimal clipped scale (the exact
    :func:`_quantize_sym` ``mse_opt`` recipe, run on the groups-as-rows
    reshape). Returns ``(codes [n, d] int8, scales [n, G] f32)``.

    Why: with only 15 int4 levels, ONE scale per 4096-d row wastes most
    of the resolution wherever magnitude varies along the vector — the
    measured feb4rag cos floor was 0.892 recall@10. Group scales quantize
    each 128-dim slice on its own range (recall gate >= 0.95,
    tests/test_recall_gate.py) for G extra f32 per doc (~3% at d=4096).
    """
    n, d = emb.shape
    if d % group_dims:
        raise ValueError(f"dim {d} not divisible by group {group_dims}")
    g = d // group_dims
    codes, scales = _quantize_sym(
        emb.reshape(n * g, group_dims), levels, mse_opt=True)
    return codes.reshape(n, d), scales.reshape(n, g)


def _pack_int4(codes: np.ndarray) -> np.ndarray:
    """Pack int4 codes ``[n, d]`` (values in [-7, 7]) into int8 bytes
    ``[n, d//2]``: byte j carries dim ``j`` in its low nibble and dim
    ``j + d//2`` in its high nibble (half-concat layout, so the kernel
    unpacks with two shifts + one concat — no lane interleave)."""
    n, d = codes.shape
    if d % 2:
        raise ValueError(f"int4 packing needs an even embed dim, got {d}")
    h = d // 2
    lo = codes[:, :h].astype(np.int16)
    hi = codes[:, h:].astype(np.int16)
    return (((hi << 4) | (lo & 0xF)) & 0xFF).astype(np.uint8).view(np.int8)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def encode_rows(emb: np.ndarray, score_mode: str, *, dtype, packed4: bool,
                center: Optional[np.ndarray] = None, norm_cos: bool = True
                ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Preprocess raw f32 rows into stored form: the exact build-time
    treatment (cos normalization, mean-centering, l2 gain bias, dtype
    quantization). Returns ``(stored, bias, scale)``.

    Shared by :meth:`ShardSet.add_docs` (live inserts) and the streamed
    HBM-overflow build (:mod:`ragroute_tpu.index.streamed`) so serve-time
    and host-tier rows can never drift from build-time rows."""
    emb = np.asarray(emb, dtype=np.float32)
    if score_mode == "cos" and norm_cos:
        emb = emb / np.maximum(
            np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    if center is not None:
        emb = emb - np.asarray(center, np.float32)
    if score_mode == "l2":
        bias = -np.einsum("nd,nd->n", emb, emb,
                          dtype=np.float32, optimize=True)
    else:
        bias = np.zeros(emb.shape[0], np.float32)
    scale = None
    if packed4:
        from ragroute_tpu.config import INT4_GROUP_DIMS

        if emb.shape[1] % INT4_GROUP_DIMS == 0:
            codes, scale = _quantize_sym_grouped(emb, 7, INT4_GROUP_DIMS)
        else:
            codes, scale = _quantize_sym(emb, 7, mse_opt=True)
        stored = _pack_int4(codes)
    elif dtype == jnp.int8:
        codes, scale = _quantize_sym(emb, 127)
        stored = codes
    else:
        stored = emb.astype(jnp.dtype(dtype).type, copy=False)
    return stored, bias.astype(np.float32), scale


import functools as _functools


@_functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter_rows(docs, bias, slots, rows, brows):
    return docs.at[slots].set(rows), bias.at[slots].set(brows)


@_functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_rows_scaled(docs, bias, scale, slots, rows, brows, srows):
    return (docs.at[slots].set(rows), bias.at[slots].set(brows),
            scale.at[slots].set(srows))


@_functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_bias(bias, slots, values):
    return bias.at[slots].set(values)


def _id_key(d):
    """Hashable key for a doc-id payload (payloads may be JSON objects)."""
    try:
        hash(d)
        return d
    except TypeError:
        return json.dumps(d, sort_keys=True, default=str)


def _pad_chunk_1d(slots, values):
    """Pad a (slots, values) pair to UPDATE_CHUNK with idempotent repeats."""
    m = len(slots)
    pad = UPDATE_CHUNK - m
    sl = np.asarray(list(slots) + [slots[-1]] * pad, dtype=np.int32)
    vals = np.concatenate(
        [values, np.repeat(values[-1:], pad, axis=0)]) if pad else values
    return jnp.asarray(sl), jnp.asarray(vals)


def _pad_chunk(slots, rows, brows, srows):
    m = len(slots)
    pad = UPDATE_CHUNK - m
    sl = np.asarray(list(slots) + [slots[-1]] * pad, dtype=np.int32)
    if pad:
        rows = np.concatenate([rows, np.repeat(rows[-1:], pad, axis=0)])
        brows = np.concatenate([brows, np.repeat(brows[-1:], pad)])
        if srows is not None:
            srows = np.concatenate(
                [srows, np.repeat(srows[-1:], pad, axis=0)])
    return jnp.asarray(sl), rows, brows, srows


@struct.dataclass
class DeviceShard:
    """One corpus shard resident on device (pytree of arrays + static meta)."""

    docs: jnp.ndarray                 # [n_pad, d] (f32 / bf16 / int8)
    bias: jnp.ndarray                 # [n_pad] f32 gain-form bias (zeros ok)
    scale: Optional[jnp.ndarray]      # [n_pad] f32 dequant factors (int8)
    center: Optional[jnp.ndarray]     # [d] f32 mean subtracted from docs
    ivf: Optional["IVFData"]          # balanced-IVF layout (approx mode)
    n_docs: int = struct.field(pytree_node=False)
    name: str = struct.field(pytree_node=False)
    score_mode: str = struct.field(pytree_node=False)
    mutable: bool = struct.field(pytree_node=False, default=False)
    # int4 mode: docs is int8 [n_pad, d//2] with two 4-bit codes per byte
    # (see _pack_int4); scale dequantizes per doc, like int8
    packed4: bool = struct.field(pytree_node=False, default=False)
    # low-rank coarse index for the two-stage scan+refine mode
    # (impl="lowrank"); None where not built or refused (flat spectrum)
    lr: Optional["LowRankData"] = None

    @property
    def scan_docs(self) -> int:
        """Static doc-count bound handed to the scoring kernels.

        Immutable shards bound the scan at the build-time doc count (the
        kernel folds rows >= scan_docs into a NEG_INF bias tail). Mutable
        shards scan the full capacity: liveness is carried ONLY by the
        per-row bias (-inf on free slots), so adds/deletes never change a
        static shape or trigger a recompile."""
        return self.docs.shape[0] if self.mutable else self.n_docs

    @property
    def capacity(self) -> int:
        return self.docs.shape[0]


@dataclasses.dataclass
class ShardSet:
    """All shards of a federated world + host-side doc id tables."""

    world: WorldConfig
    shards: List[DeviceShard]
    doc_ids: Dict[str, Optional[list]]  # source -> id payloads (host side)
    # True when build() was asked for low-rank coarse indexes (individual
    # shards may still have lr=None where the build refused a flat
    # spectrum — those fall back to the exact scan at search time)
    lowrank_built: bool = False
    # mutable-mode bookkeeping (set by build(mutable=True)):
    _live: Optional[Dict[str, int]] = None   # source -> live doc count
    _free: Optional[Dict[str, List[int]]] = None  # source -> free slot stack
    # snapshot support (mutable mode): the raw build-time embeddings per
    # source (possibly an mmap of embeddings.npy) and the raw f32 rows of
    # every live added doc, keyed by slot. The device arrays are lossy
    # (bf16/int8, centered, normalized), so an exact durable snapshot must
    # come from retained host-side rows, not from reading HBM back.
    _orig_emb: Optional[Dict[str, np.ndarray]] = None
    _added_rows: Optional[Dict[str, Dict[int, np.ndarray]]] = None
    # build-time normalize_cos flag, recorded so add_docs() applies the
    # SAME preprocessing as build() (a normalize_cos=False build must not
    # normalize added rows — they would live on a different score scale
    # than the corpus)
    _norm_cos: bool = True

    @classmethod
    def build(
        cls,
        world: WorldConfig,
        embeddings: Mapping[str, np.ndarray],
        *,
        doc_ids: Optional[Mapping[str, Sequence]] = None,
        dtype=jnp.bfloat16,
        normalize_cos: bool = True,
        device=None,
        ivf_clusters: Optional[int] = None,
        ivf_seed: int = 0,
        ivf_cache_dirs: Optional[Mapping[str, str]] = None,
        lowrank: Optional[int] = None,
        lowrank_energy: Optional[float] = None,
        mutable: bool = False,
        reserve_docs: int = 0,
    ) -> "ShardSet":
        """Upload per-source embedding matrices to HBM.

        Args:
          embeddings: source name -> ``[n_docs, d]`` float array (native dim).
          doc_ids: optional source name -> sequence of doc id payloads
            (the reference's ``metadatas``/``docids`` tables,
            ``data_source.py:73-78``).
          dtype: on-device storage dtype. bf16 halves HBM traffic and costs
            ~0.5% recall@32 (measured); use f32 for strict parity runs;
            jnp.int8 quantizes with per-doc symmetric scales (4x smaller
            than f32 — another ~2x capacity/bandwidth over bf16 at a
            further small recall cost).
          normalize_cos: L2-normalize docs of cos-mode shards at build time
            (the reference's cos_sim models index normalized embeddings).
          ivf_clusters: also build a balanced-IVF layout per shard for the
            approximate cluster-probed search mode (``impl="ivf"``).
            ``0``/``None`` skips it; ``-1`` uses the per-shard default
            cluster count (~4*sqrt(n)); any positive value is the cluster
            count C. The flat exact layout is always kept (the exact path
            and parity gates stay available).
          lowrank: also build a rank-``r`` coarse projection per shard for
            the two-stage scan+refine mode (``impl="lowrank"``). ``0`` /
            ``None`` skips it; ``-1`` picks the rank automatically by
            spectral energy (``lowrank_energy``, default
            config.LOWRANK_ENERGY); any positive value is the rank. A
            shard whose spectrum is too flat for a profitable projection
            gets no coarse index (``lr=None``) and falls back to the
            exact scan at search time.
          lowrank_energy: captured-variance fraction for automatic rank
            selection (only with ``lowrank=-1``).
          device: target device for the uploaded arrays (default: JAX's
            default device). The string ``"host"`` keeps every array as
            host-side numpy instead — for mesh serving, where
            :class:`~ragroute_tpu.parallel.ShardedSearch` device_puts
            sharded copies itself and a corpus bigger than one chip's
            HBM must never be staged whole on the default device.
          mutable: enable live document adds/deletes (:meth:`add_docs` /
            :meth:`delete_docs`). Row liveness then rides the per-row
            bias (-inf = free slot) instead of a static doc-count mask,
            so updates are donated device scatters with ZERO recompiles.
            Incompatible with ``ivf_clusters`` (a cluster layout would go
            stale on update; rebuild instead).
          reserve_docs: extra empty slots per shard for future adds
            (mutable mode; capacity = round_up(n + reserve_docs, 512)).
        """
        host = device == "host"
        if host and mutable:
            raise ValueError(
                "device='host' (mesh staging) and mutable live updates "
                "are incompatible — the update scatters are device ops")
        if mutable and ivf_clusters:
            raise ValueError(
                "mutable shards cannot carry a balanced-IVF layout "
                "(adds/deletes would leave the cluster slabs stale); "
                "build with ivf_clusters=None and rebuild the IVF layout "
                "offline when the corpus settles")
        if mutable and lowrank:
            raise ValueError(
                "mutable shards cannot carry a low-rank coarse index "
                "(adds/deletes would leave the projected slab stale); "
                "build with lowrank=None and rebuild offline when the "
                "corpus settles")
        packed4 = parse_storage_dtype(dtype)
        shards: List[DeviceShard] = []
        ids: Dict[str, Optional[list]] = {}
        for src in world.sources:
            if src.name not in embeddings:
                raise KeyError(f"missing embeddings for source {src.name!r}")
            emb = np.asarray(embeddings[src.name], dtype=np.float32)
            if emb.ndim != 2 or emb.shape[1] != src.embed_dim:
                raise ValueError(
                    f"{src.name}: embeddings shape {emb.shape} != "
                    f"[n, {src.embed_dim}]")
            if emb.shape[0] < world.k:
                # FAISS silently returns -1 ids when k > ntotal
                # (reference would then index metadatas[-1]); fail loudly.
                raise ValueError(
                    f"{src.name}: only {emb.shape[0]} docs but k={world.k}; "
                    f"a shard must hold at least k documents")
            if src.score_mode == "cos" and normalize_cos:
                norms = np.linalg.norm(emb, axis=1, keepdims=True)
                emb = emb / np.maximum(norms, 1e-12)
            center = None
            if src.score_mode in ("l2", "dot") and dtype != jnp.float32:
                # Mean-center lossy-dtype shards: score discrimination
                # lives in the residual around the corpus mean, and
                # bf16/int8 rounding error is relative to the FULL
                # magnitude. l2: |q-d|^2 == |(q-mu)-(d-mu)|^2 exactly
                # (queries shift by mu at search; measured on clustered
                # synthetic wikipedia: bf16 recall@10 0.97 -> 1.0, int8
                # 0.94 -> 0.997). dot: per-query ordering of q.(d-mu)
                # equals q.d, and the constant q.mu is added back to the
                # returned scores (FAISS raw-IP parity; defends the
                # score-concentration adversary in test_recall_gate —
                # bf16 0.984 -> gate-passing with centering). cos shards
                # stay uncentered (normalization is not shift-invariant);
                # f32 shards stay uncentered for bit-level
                # reproducibility of strict parity runs.
                mu = emb.mean(axis=0, dtype=np.float64).astype(np.float32)
                emb = emb - mu
                center = mu if host else jnp.asarray(mu)
            packed_rows = row_scales = None
            if packed4 and ivf_clusters:
                # quantize ONCE: build_ivf's slot rows are these same
                # centered vectors rearranged, so its 6-pass MSE-optimal
                # quantizer would reproduce these codes exactly — hand
                # them over instead of paying the dominant host-side
                # build cost twice (and the [C*S, d] f32 slot copy)
                codes, row_scales = _quantize_sym(emb, 7, mse_opt=True)
                packed_rows = _pack_int4(codes)
                del codes
            ivf = None
            if ivf_clusters:
                from ragroute_tpu.index.ivf import (
                    build_ivf, ivf_fingerprint, load_ivf, save_ivf)

                # layout cache: k-means over a production shard costs
                # minutes; a cached npz makes reboots instant. The key
                # carries every build parameter (cluster count, dtype,
                # seed) and the npz stores a content fingerprint of the
                # source embeddings, so neither a parameter change nor a
                # regenerated same-shape corpus can silently reuse a
                # stale layout.
                cache = None
                fp = None
                if ivf_cache_dirs and src.name in ivf_cache_dirs:
                    tag = ("auto" if ivf_clusters < 0
                           else str(ivf_clusters))
                    dname = ("int4" if packed4
                             else jnp.dtype(dtype).name)
                    cache = os.path.join(
                        ivf_cache_dirs[src.name],
                        f"ivf_{tag}_{dname}"
                        f"_s{ivf_seed}.npz")
                    fp = ivf_fingerprint(emb)
                if cache and os.path.exists(cache):
                    ivf = load_ivf(cache, expect_fingerprint=fp)
                if ivf is None:
                    ivf = build_ivf(
                        emb, src.score_mode, dtype=dtype,
                        n_clusters=(None if ivf_clusters < 0
                                    else ivf_clusters),
                        seed=ivf_seed,
                        packed_rows=packed_rows, row_scales=row_scales)
                    if cache:
                        save_ivf(ivf, cache, fingerprint=fp)
            n = emb.shape[0]
            n_pad = _round_up(max(n + (reserve_docs if mutable else 0),
                                  SHARD_PAD_MULTIPLE), SHARD_PAD_MULTIPLE)
            lr = None
            if lowrank:
                from ragroute_tpu.config import LOWRANK_ENERGY
                from ragroute_tpu.index.ivf import ivf_fingerprint
                from ragroute_tpu.index.lowrank import (
                    build_lowrank, load_lowrank, save_lowrank)

                energy = (LOWRANK_ENERGY if lowrank_energy is None
                          else lowrank_energy)
                cache = None
                fp = None
                if ivf_cache_dirs and src.name in ivf_cache_dirs:
                    tag = (f"auto{energy:g}" if lowrank < 0 else str(lowrank))
                    cache = os.path.join(
                        ivf_cache_dirs[src.name], f"lr_{tag}.npz")
                    fp = ivf_fingerprint(emb)
                loaded = False
                if cache and os.path.exists(cache):
                    lr = load_lowrank(cache, expect_fingerprint=fp)
                    loaded = lr is not None
                if not loaded:
                    lr = build_lowrank(
                        emb, n_pad=n_pad,
                        rank=(None if lowrank < 0 else lowrank),
                        energy=energy)
                    if cache and lr is not None:
                        save_lowrank(lr, cache, fingerprint=fp)
            if n_pad != n:
                emb = np.pad(emb, ((0, n_pad - n), (0, 0)))
            # gain-form bias computed in f32 BEFORE dtype downcast — on
            # the HOST: doc_bias(jnp.asarray(emb)) would stage the whole
            # padded f32 slab on device (17 GB transient for an 8M-doc
            # shard — device OOM long before the int8 bytes that actually
            # need to fit; surfaced as a deferred RESOURCE_EXHAUSTED at
            # first sync on the async tunnel)
            if src.score_mode == "l2":
                b_np = -np.einsum("nd,nd->n", emb, emb,
                                  dtype=np.float32, optimize=True)
            else:
                b_np = np.zeros(n_pad, np.float32)
            if n_pad != n:
                # -inf bias makes padding unselectable even on code paths
                # that cannot apply a static valid_docs mask (e.g. the
                # mesh-sharded search, where padding position is dynamic
                # relative to each device's local slice).
                b_np[n:] = -np.inf
            b = b_np if host else jnp.asarray(b_np)
            scale = None
            if packed4:
                # symmetric per-doc 4-bit quantization (levels ±7), two
                # codes packed per byte: 2x capacity over int8, dequant
                # via the same fused per-doc scale epilogue
                if packed_rows is not None:
                    # already quantized above (shared with build_ivf);
                    # pad rows carry code 0 / scale 1e-12 — bit-identical
                    # to quantizing the zero pad rows (mse_opt floor)
                    pad = n_pad - n
                    s_row = (np.pad(row_scales, (0, pad),
                                    constant_values=np.float32(1e-12))
                             if pad else row_scales)
                    emb = (np.pad(packed_rows, ((0, pad), (0, 0)))
                           if pad else packed_rows)
                else:
                    # per-GROUP scales (INT4_GROUP_DIMS) where the dim
                    # divides; shards built WITH an IVF layout keep
                    # per-doc scales (the grouped-GEMM IVF kernel and
                    # the flat scan must score identical bytes — see
                    # test_int4_ivf_full_probe_matches_flat_int4_scan)
                    from ragroute_tpu.config import INT4_GROUP_DIMS

                    if src.embed_dim % INT4_GROUP_DIMS == 0:
                        codes, s_row = _quantize_sym_grouped(
                            emb, 7, INT4_GROUP_DIMS)
                    else:
                        codes, s_row = _quantize_sym(emb, 7, mse_opt=True)
                    emb = _pack_int4(codes)
                scale = s_row if host else jnp.asarray(s_row)
            elif dtype == jnp.int8:
                # symmetric per-doc quantization: d_q = round(d / s),
                # s = max|d| / 127; dequant fused into the scoring kernel
                codes, s_row = _quantize_sym(emb, 127)
                scale = s_row if host else jnp.asarray(s_row)
                emb = codes
            else:
                # cast on the HOST so only the final bytes cross to the
                # device (int8 ships 4x less than the f32 working array;
                # ml_dtypes handles the numpy-side bf16 cast)
                emb = emb.astype(jnp.dtype(dtype).type, copy=False)
            docs = emb if host else jnp.asarray(emb)
            if host:
                # pull any device-built auxiliary layouts (IVF k-means /
                # low-rank SVD run on the accelerator) back to host numpy
                # so NOTHING of this corpus stays resident on one chip
                if ivf is not None:
                    ivf = jax.tree.map(np.asarray, ivf)
                if lr is not None:
                    lr = jax.tree.map(np.asarray, lr)
            elif device is not None:
                docs = jax.device_put(docs, device)
                b = jax.device_put(b, device)
                if scale is not None:
                    scale = jax.device_put(scale, device)
                if center is not None:
                    center = jax.device_put(center, device)
            shards.append(DeviceShard(
                docs=docs, bias=b, scale=scale, center=center, ivf=ivf,
                n_docs=n, name=src.name, score_mode=src.score_mode,
                mutable=mutable, packed4=packed4, lr=lr))
            ids[src.name] = (
                list(doc_ids[src.name]) if doc_ids and src.name in doc_ids
                else None)
        out = cls(world=world, shards=shards, doc_ids=ids,
                  lowrank_built=bool(lowrank))
        if mutable:
            out._norm_cos = normalize_cos
            out._live = {s.name: s.n_docs for s in shards}
            out._free = {s.name: list(range(s.capacity - 1, s.n_docs - 1, -1))
                         for s in shards}
            # keep the raw inputs for snapshot(): references only — under
            # ShardSet.load these are read-only mmaps of embeddings.npy,
            # so this costs no RAM for the build-time corpus
            out._orig_emb = {s.name: embeddings[s.name] for s in shards}
            out._added_rows = {s.name: {} for s in shards}
        return out

    @property
    def total_docs(self) -> int:
        if self._live is not None:
            return sum(self._live.values())
        return sum(s.n_docs for s in self.shards)

    @property
    def index_bytes(self) -> int:
        return sum(
            s.docs.size * s.docs.dtype.itemsize + s.bias.size * 4
            for s in self.shards)

    def arrays(self):
        """The device pytree to pass through jit (docs/bias/scale/center
        per shard; scale is None for non-quantized shards, center is None
        for non-centered shards)."""
        return [(s.docs, s.bias, s.scale, s.center) for s in self.shards]

    def ivf_arrays(self):
        """Per-shard balanced-IVF pytrees (None where not built); kept
        separate from :meth:`arrays` so exact-path callers never see a
        tuple-arity change."""
        return [s.ivf for s in self.shards]

    def lr_arrays(self):
        """Per-shard low-rank coarse-index pytrees (None where not built
        or where the build refused a flat-spectrum corpus)."""
        return [s.lr for s in self.shards]

    # -- live updates (mutable shards) --------------------------------------

    @property
    def mutable(self) -> bool:
        return self._free is not None

    def _mutable_index(self, source: str) -> int:
        if self._free is None:
            raise ValueError(
                "live updates need ShardSet.build(mutable=True); this set "
                "was built immutable")
        for si, s in enumerate(self.shards):
            if s.name == source:
                return si
        raise KeyError(f"unknown source {source!r}")

    def live_docs(self, source: str) -> int:
        """Current live doc count of a mutable shard."""
        si = self._mutable_index(source)
        return self._live[source] if self._live else self.shards[si].n_docs

    def free_slots(self, source: str) -> int:
        self._mutable_index(source)
        return len(self._free[source])

    def add_docs(
        self,
        source: str,
        embeddings: np.ndarray,
        doc_ids: Optional[Sequence] = None,
    ) -> List[int]:
        """Insert documents into a live shard; returns their slot indices.

        The rows get the exact build-time treatment (cos normalization,
        mean-centering with the shard's frozen build-time ``center``, l2
        gain bias, int8 per-doc quantization, host-side dtype cast) and are
        written into free slots with a donated device scatter — an
        in-place HBM update, no reallocation, no recompile (liveness is
        the per-row bias, see :attr:`DeviceShard.scan_docs`). Queries see
        the new documents on the next engine step.

        The reference has no equivalent (its FAISS indexes are read-only
        at serve time, ``data_source.py:69-80``); this is the production
        freshness path.
        """
        si = self._mutable_index(source)
        shard = self.shards[si]
        src = self.world.sources[si]
        emb = np.asarray(embeddings, dtype=np.float32)
        if emb.ndim != 2 or emb.shape[1] != src.embed_dim:
            raise ValueError(
                f"{source}: add shape {emb.shape} != [m, {src.embed_dim}]")
        m = emb.shape[0]
        if doc_ids is not None and len(doc_ids) != m:
            raise ValueError(
                f"{source}: {len(doc_ids)} doc_ids for {m} embeddings")
        free = self._free[source]
        if m > len(free):
            raise ValueError(
                f"{source}: adding {m} docs but only {len(free)} free "
                f"slots (capacity {shard.capacity}, live "
                f"{self._live[source]}); build with a larger reserve_docs "
                f"or delete first")
        raw = emb.copy()  # pre-preprocessing rows, retained for snapshot()

        # identical preprocessing to build() (shared helper)
        stored, brows, srows = encode_rows(
            emb, src.score_mode,
            dtype=(jnp.int8 if shard.docs.dtype == jnp.int8
                   else shard.docs.dtype),
            packed4=shard.packed4,
            center=(None if shard.center is None
                    else np.asarray(shard.center)),
            norm_cos=self._norm_cos)
        rows = stored.astype(shard.docs.dtype.type, copy=False)

        slots = [free.pop() for _ in range(m)]
        shard = self._scatter(shard, slots, rows,
                              brows.astype(np.float32), srows)
        self.shards[si] = shard
        for i, sl in enumerate(slots):
            self._added_rows[source][sl] = raw[i]

        table = self.doc_ids.get(source)
        if table is None and doc_ids is not None:
            # docs so far were identified by local index; materialize that
            # — but slots freed by deletes BEFORE the table existed must
            # stay None, or their old local-index ids would resurrect
            dead = set(free) | set(slots)
            table = [None if s in dead else s for s in range(shard.n_docs)]
            table.extend([None] * (shard.capacity - len(table)))
            # docs added id-less EARLIER live in the reserve area beyond
            # n_docs; they were (and must stay) identified by their slot
            # index — the blanket None tail would null live documents
            for s in self._added_rows[source]:
                if s not in dead and s >= shard.n_docs:
                    table[s] = s
            self.doc_ids[source] = table
        if table is not None:
            if len(table) < shard.capacity:
                table.extend([None] * (shard.capacity - len(table)))
            for sl, did in zip(
                    slots, doc_ids if doc_ids is not None else slots):
                table[sl] = did
        self._live[source] += m
        return slots

    def delete_docs(
        self,
        source: str,
        *,
        doc_ids: Optional[Sequence] = None,
        slots: Optional[Sequence[int]] = None,
    ) -> List[int]:
        """Remove documents from a live shard (by id payload or by slot).

        A delete writes ``-inf`` into the deleted rows' bias (one donated
        device scatter): the scoring kernels can then never select them,
        the slots return to the free list for reuse by :meth:`add_docs`.
        """
        si = self._mutable_index(source)
        shard = self.shards[si]
        table = self.doc_ids.get(source)
        if (doc_ids is None) == (slots is None):
            raise ValueError("pass exactly one of doc_ids= / slots=")
        if doc_ids is not None:
            if table is None:
                raise ValueError(
                    f"{source} has no doc-id table; delete by slots=")
            # id payloads may be arbitrary JSON (the reference's medrag
            # metadatas are dicts) — key them hashably
            pos = {_id_key(d): i for i, d in enumerate(table)
                   if d is not None}
            missing = [d for d in doc_ids if _id_key(d) not in pos]
            if missing:
                raise KeyError(f"{source}: unknown doc ids {missing[:5]}")
            slots = [pos[_id_key(d)] for d in doc_ids]
        slots = [int(s) for s in slots]
        free_set = set(self._free[source])
        bad = [s for s in slots
               if s < 0 or s >= shard.capacity or s in free_set]
        if bad or len(set(slots)) != len(slots):
            raise ValueError(
                f"{source}: invalid/free/duplicate slots in delete: "
                f"{(bad or 'duplicates')!r:.80s}")

        neg = np.full(len(slots), -np.inf, dtype=np.float32)
        for off in range(0, len(slots), UPDATE_CHUNK):
            sl = slots[off:off + UPDATE_CHUNK]
            vals = neg[:len(sl)]
            sl_a, vals = _pad_chunk_1d(sl, vals)
            bias = _scatter_bias(shard.bias, sl_a, vals)
            shard = shard.replace(bias=bias)
        self.shards[si] = shard
        self._free[source].extend(slots)
        if table is not None:
            for sl in slots:
                table[sl] = None
        added = self._added_rows[source]
        for sl in slots:
            added.pop(sl, None)
        self._live[source] -= len(slots)
        return slots

    def _scatter(self, shard: DeviceShard, slots: List[int],
                 rows: np.ndarray, brows: np.ndarray,
                 srows: Optional[np.ndarray]) -> DeviceShard:
        for off in range(0, len(slots), UPDATE_CHUNK):
            sl = slots[off:off + UPDATE_CHUNK]
            r = rows[off:off + UPDATE_CHUNK]
            b = brows[off:off + UPDATE_CHUNK]
            s = None if srows is None else srows[off:off + UPDATE_CHUNK]
            sl_a, r, b, s = _pad_chunk(sl, r, b, s)
            if shard.scale is not None:
                docs, bias, scale = _scatter_rows_scaled(
                    shard.docs, shard.bias, shard.scale, sl_a,
                    jnp.asarray(r), jnp.asarray(b), jnp.asarray(s))
                shard = shard.replace(docs=docs, bias=bias, scale=scale)
            else:
                docs, bias = _scatter_rows(
                    shard.docs, shard.bias, sl_a,
                    jnp.asarray(r), jnp.asarray(b))
                shard = shard.replace(docs=docs, bias=bias)
        return shard

    def live_slots(self, source: str) -> List[int]:
        """Ascending slot indices of every live document in a mutable
        shard (the compaction order used by :meth:`snapshot`)."""
        si = self._mutable_index(source)
        dead = set(self._free[source])
        cap = self.shards[si].capacity
        return [s for s in range(cap) if s not in dead]

    def snapshot(self, root: str) -> Dict[str, dict]:
        """Persist the LIVE state of a mutable world back to the data root.

        Writes ``<root>/<world>/<source>/embeddings.npy`` (float32 rows of
        every live document, compacted in ascending slot order) and
        ``doc_ids.json`` where an id table exists, atomically (tmp +
        rename), so the next :meth:`load` boots the mutated corpus. Rows
        come from retained host-side f32 inputs — build-time rows from the
        original (usually mmap'd) array, serve-time adds from
        :attr:`_added_rows` — NOT from reading lossy device bytes back, so
        a snapshot→reload round trip applies dtype rounding exactly once,
        same as a cold build. Returns ``{source: {"live_docs": n,
        "slots": [old slot of each new row, ascending]}}`` so callers can
        compact side tables (payload stores) in the same order.
        """
        if self._free is None:
            raise ValueError(
                "snapshot() needs ShardSet.build(mutable=True); immutable "
                "worlds are already durable in the data root")
        report: Dict[str, dict] = {}
        for si, shard in enumerate(self.shards):
            name = shard.name
            orig = self._orig_emb[name]
            added = self._added_rows[name]
            slots = self.live_slots(name)
            rows = np.empty((len(slots), self.world.sources[si].embed_dim),
                            np.float32)
            # One vectorized fancy-index for the build-time rows (snapshot
            # runs under the engine step lock — a Python per-row loop over
            # a million-doc mmap would stall serving for seconds), then
            # patch the (few) live added rows individually.
            build_pos = [i for i, s in enumerate(slots) if s not in added]
            if build_pos:
                build_slots = [slots[i] for i in build_pos]
                rows[build_pos] = np.asarray(
                    orig[build_slots], np.float32)
            for i, s in enumerate(slots):
                if s in added:
                    rows[i] = added[s]
            d = self.source_dir(root, self.world.name, name)
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, "embeddings.npy")
            _atomic_np_save(path, rows)
            table = self.doc_ids.get(name)
            if table is not None:
                ids_path = os.path.join(d, "doc_ids.json")
                _atomic_json_dump(ids_path, [table[s] for s in slots])
            report[name] = {"live_docs": len(slots), "slots": slots}
        return report

    # -- persistence --------------------------------------------------------

    @staticmethod
    def source_dir(root: str, world_name: str, source: str) -> str:
        return os.path.join(root, world_name, source)

    @classmethod
    def save_source(
        cls, root: str, world_name: str, source: str,
        embeddings: np.ndarray, doc_ids: Optional[Sequence] = None,
    ) -> None:
        d = cls.source_dir(root, world_name, source)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "embeddings.npy"),
                np.asarray(embeddings, np.float32))
        if doc_ids is not None:
            with open(os.path.join(d, "doc_ids.json"), "w") as f:
                json.dump(list(doc_ids), f)

    @classmethod
    def load(
        cls, root: str, world: WorldConfig, *, dtype=jnp.bfloat16, **kw
    ) -> "ShardSet":
        """Load every source of a world from ``<root>/<world>/<source>/``."""
        embeddings = {}
        doc_ids = {}
        cache_dirs = {}
        for src in world.sources:
            d = cls.source_dir(root, world.name, src.name)
            emb_path = os.path.join(d, "embeddings.npy")
            if not os.path.exists(emb_path):
                raise FileNotFoundError(
                    f"no shard data for {world.name}/{src.name} under {root} "
                    f"(expected {emb_path}); generate synthetic data with "
                    f"ragroute_tpu.index.synthetic or import real corpora")
            embeddings[src.name] = np.load(emb_path, mmap_mode="r")
            cache_dirs[src.name] = d
            ids_path = os.path.join(d, "doc_ids.json")
            if os.path.exists(ids_path):
                with open(ids_path) as f:
                    doc_ids[src.name] = json.load(f)
        kw.setdefault("ivf_cache_dirs", cache_dirs)
        return cls.build(world, embeddings, doc_ids=doc_ids, dtype=dtype, **kw)
