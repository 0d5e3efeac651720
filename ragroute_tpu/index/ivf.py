"""TPU-native IVF (cluster-probed approximate) index build.

Beyond-reference capability: the reference searches every FAISS flat
index exhaustively (``ragroute/data_source.py:158``). This module adds an
opt-in approximate mode that probes only the ``nprobe`` nearest document
clusters per query, cutting scoring FLOPs by ~``C/nprobe`` at a measured
recall cost (see ``tests/test_ivf.py`` and BENCHMARKS.md).

Design — a TPU-first re-think of FAISS IVF, not a port:

* FAISS keeps ragged inverted lists and scans them with per-query CPU
  loops. Ragged anything is poison for XLA, so the build here produces a
  dense ``[C, S, d]`` cluster-major layout with **balanced clusters**:
  k-means learns the centroids, then documents are assigned to their
  nearest cluster *subject to a fixed capacity* ``S ≈ (n/C) * slack``
  (greedy by preference rank, like capacity-constrained MoE routing).
  Every cluster fits the same static slab; padding slots carry a -inf
  gain bias so they can never win.
* Search (:mod:`ragroute_tpu.ops.ivf_topk`) then becomes an MoE-style
  dispatch problem — queries are tokens, clusters are experts — and the
  whole probe→score→merge runs as one static-shape XLA program on the
  MXU.

k-means runs on device (jitted Lloyd iterations, chunked assignment so
the ``[n, C]`` distance matrix never materializes); the capacity-greedy
assignment is a tiny host pass over the top-R cluster preferences.
"""

from __future__ import annotations

import functools
import logging
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

logger = logging.getLogger("ivf")


@struct.dataclass
class IVFData:
    """Device arrays of one balanced-IVF shard (cluster-major layout).

    ``docs`` is stored ``[C, d, S]`` — the rhs layout of
    ``jax.lax.ragged_dot`` (contract on the middle axis), so search never
    transposes the index."""

    centroids: jnp.ndarray            # [C, d] f32, gain-form probe targets
    cbias: jnp.ndarray                # [C] f32 (-|c|^2 for l2, zeros else)
    docs: jnp.ndarray                 # [C, d, S] f32 / bf16 / int8
    bias: jnp.ndarray                 # [C, S] f32 gain bias, -inf at pads
    scale: Optional[jnp.ndarray]      # [C, S] f32 dequant factors (int8)
    perm: jnp.ndarray                 # [C, S] int32 original local doc id
    n_clusters: int = struct.field(pytree_node=False)
    capacity: int = struct.field(pytree_node=False)
    # int4 mode: docs is int8 [C, d//2, S] with two 4-bit codes per byte
    # (byte row j = dim j low nibble, dim j + d//2 high — the flat
    # shard's half-concat layout, index.shard._pack_int4); scale
    # dequantizes per (cluster, slot) like int8
    packed4: bool = struct.field(pytree_node=False, default=False)


def default_n_clusters(n: int) -> int:
    """FAISS-style sizing: ~4*sqrt(n), a power of two (mesh-friendly:
    ``sharded_ivf_topk`` shards the cluster axis and requires C divisible
    by the idx axis), bounded so each cluster keeps a useful number of
    docs."""
    c = 1 << max(4, int(round(math.log2(4.0 * math.sqrt(max(n, 16))))))
    c = int(min(c, max(16, n // 32), 4096))
    return 1 << (c.bit_length() - 1)  # round the cap down to a power of 2


def _upload_chunks(emb: np.ndarray, chunk: int, mesh=None):
    """Upload the corpus ONCE as bf16 [n_chunks, chunk, d] + weights.

    bf16 halves the host->device transfer (the dominant build cost on a
    tunneled dev box); k-means quality is unaffected because all
    reductions accumulate in f32. One upload feeds both the Lloyd
    iterations and the preference-ranking pass.

    With ``mesh``, the chunk axis is padded to the device count and the
    numpy array is ``device_put`` DIRECTLY into the sharded layout —
    each device receives only its slice, so a corpus bigger than one
    chip's HBM never stages whole on the default device (the reason the
    mesh build exists).
    """
    import ml_dtypes

    n, d = emb.shape
    n_pad = -(-n // chunk) * chunk
    n_chunks = n_pad // chunk
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        n_chunks = -(-n_chunks // n_dev) * n_dev
        n_pad = n_chunks * chunk
    x = np.zeros((n_pad, d), ml_dtypes.bfloat16)
    x[:n] = emb
    wt = np.zeros((n_pad,), np.float32)
    wt[:n] = 1.0
    x = x.reshape(n_chunks, chunk, d)
    wt = wt.reshape(n_chunks, chunk)
    if mesh is None:
        return jnp.asarray(x), jnp.asarray(wt), n_pad
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)
    xc = jax.device_put(x, NamedSharding(mesh, P(axes, None, None)))
    wc = jax.device_put(wt, NamedSharding(mesh, P(axes, None)))
    return xc, wc, n_pad


def _kmeans_device(xc, wc, emb: np.ndarray, n_clusters: int, iters: int,
                   seed: int, mesh=None) -> np.ndarray:
    """Jitted Lloyd iterations; returns [C, d] float32 centroids.

    Assignment is chunked over documents (``lax.scan``) so peak memory is
    ``[chunk, C]`` scores instead of ``[n, C]``. With ``mesh``, the chunk
    axis is sharded over every mesh device and the per-iteration
    sums/counts are ``psum``'d over ICI — the build runs where the index
    will be served (a 10M+-doc corpus never sits on one chip).
    """
    d = emb.shape[1]
    rng = np.random.default_rng(seed)
    init = jnp.asarray(
        emb[rng.choice(emb.shape[0], n_clusters, replace=False)],
        jnp.float32)

    def assign_chunk(carry, xs):
        sums, counts, cent = carry
        xb, wb = xs
        # nearest centroid in l2 == argmax of x.c - |c|^2/2
        sc = jnp.dot(xb, cent.T.astype(xb.dtype),
                     preferred_element_type=jnp.float32)
        sc = sc - 0.5 * jnp.sum(cent * cent, axis=1)[None, :]
        a = jnp.argmax(sc, axis=1)
        onehot = (jax.nn.one_hot(a, n_clusters, dtype=jnp.bfloat16)
                  * wb[:, None].astype(jnp.bfloat16))
        sums = sums + jnp.dot(onehot.T, xb,
                              preferred_element_type=jnp.float32)
        counts = counts + onehot.sum(axis=0, dtype=jnp.float32)
        return (sums, counts, cent), None

    def make_lloyd(psum_axes):
        def lloyd(cent, xc_l, wc_l):
            (sums, counts, _), _ = jax.lax.scan(
                assign_chunk,
                (jnp.zeros((n_clusters, d), jnp.float32),
                 jnp.zeros((n_clusters,), jnp.float32), cent),
                (xc_l, wc_l))
            if psum_axes:
                sums = jax.lax.psum(sums, psum_axes)
                counts = jax.lax.psum(counts, psum_axes)
            return jnp.where(counts[:, None] > 0,
                             sums / jnp.maximum(counts, 1.0)[:, None],
                             cent)
        return lloyd

    # docs are jit ARGUMENTS: closure-captured device arrays become HLO
    # constants and the remote-compile request would ship the whole corpus
    if mesh is None:
        @functools.partial(jax.jit, static_argnames=("n_iters",))
        def run(cent0, xc, wc, n_iters):
            lloyd = make_lloyd(None)
            cent, _ = jax.lax.scan(
                lambda c, _: (lloyd(c, xc, wc), None), cent0, None,
                length=n_iters)
            return cent

        return np.asarray(run(init, xc, wc, iters), dtype=np.float32)

    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)
    # xc/wc arrive from _upload_chunks(mesh=...) already sharded over
    # the chunk axis (padded to the device count) — no re-put here

    def local_run(cent0, xc_l, wc_l):
        lloyd = make_lloyd(axes)
        cent, _ = jax.lax.scan(
            lambda c, _: (lloyd(c, xc_l, wc_l), None), cent0, None,
            length=iters)
        return cent

    run = jax.jit(jax.shard_map(
        local_run, mesh=mesh,
        in_specs=(P(), P(axes, None, None), P(axes, None)),
        out_specs=P(),
        check_vma=False))  # psum makes the output replicated
    cent = run(jax.device_put(init, NamedSharding(mesh, P())), xc, wc)
    return np.asarray(cent, dtype=np.float32)


def _top_r_choices(xc, n: int, cent: np.ndarray, r: int,
                   mesh=None) -> np.ndarray:
    """[n, r] cluster-preference ranking per doc (nearest first).

    Runs on device over the already-uploaded chunks — at production
    scale this is a multi-TFLOP matmul the 1-core host cannot afford.
    With ``mesh``, each device ranks its own chunk slice (embarrassingly
    parallel; the host gather reassembles doc order).
    """
    def step(carry, xb, cent, cb, rr):
        sc = jnp.dot(xb, cent.T.astype(xb.dtype),
                     preferred_element_type=jnp.float32)
        top = jax.lax.top_k(sc + cb[None, :], rr)[1]
        return carry, top.astype(jnp.int32)

    if mesh is None:
        @functools.partial(jax.jit, static_argnames=("rr",))
        def run(xc, cent, rr):
            cb = -0.5 * jnp.sum(cent * cent, axis=1)
            _, tops = jax.lax.scan(
                functools.partial(step, cent=cent, cb=cb, rr=rr), 0, xc)
            return tops.reshape(-1, rr)

        return np.asarray(run(xc, jnp.asarray(cent), r))[:n]

    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)
    # xc arrives pre-sharded over the chunk axis (see _upload_chunks)

    def local_run(xc_l, cent):
        cb = -0.5 * jnp.sum(cent * cent, axis=1)
        _, tops = jax.lax.scan(
            functools.partial(step, cent=cent, cb=cb, rr=r), 0, xc_l)
        return tops.reshape(-1, r)

    run = jax.jit(jax.shard_map(
        local_run, mesh=mesh,
        in_specs=(P(axes, None, None), P()),
        out_specs=P(axes, None),
        check_vma=False))
    tops = run(
        xc,
        jax.device_put(jnp.asarray(cent), NamedSharding(mesh, P())))
    return np.asarray(tops)[:n]


def _balanced_assign(choices: np.ndarray, n_clusters: int,
                     capacity: int) -> np.ndarray:
    """Capacity-constrained greedy assignment: every doc goes to its
    best-ranked cluster that still has room (rank by rank, vectorized
    per cluster); stragglers fill any remaining slots. Returns [n]
    cluster ids. Always succeeds because C*capacity >= n."""
    n, r = choices.shape
    assign = np.full(n, -1, np.int32)
    counts = np.zeros(n_clusters, np.int64)
    for rank in range(r):
        unass = np.flatnonzero(assign < 0)
        if unass.size == 0:
            break
        want = choices[unass, rank]
        order = np.argsort(want, kind="stable")
        docs_sorted = unass[order]
        want_sorted = want[order]
        first = np.searchsorted(want_sorted, np.arange(n_clusters), "left")
        last = np.searchsorted(want_sorted, np.arange(n_clusters), "right")
        room = np.minimum(last - first, capacity - counts[:n_clusters])
        # vectorized per-cluster take: a doc is taken iff its position
        # within its wanted cluster's contiguous run is below that
        # cluster's remaining room (no host loop over clusters)
        pos_in_cluster = np.arange(docs_sorted.size) - first[want_sorted]
        take_mask = pos_in_cluster < room[want_sorted]
        taken = docs_sorted[take_mask]
        assign[taken] = want_sorted[take_mask]
        np.add.at(counts, want_sorted[take_mask], 1)
    unass = np.flatnonzero(assign < 0)
    if unass.size:
        free = np.repeat(np.arange(n_clusters),
                         (capacity - counts).clip(min=0))
        assign[unass] = free[:unass.size]
    return assign


def build_ivf(
    emb: np.ndarray,
    mode: str,
    *,
    dtype=jnp.bfloat16,
    n_clusters: Optional[int] = None,
    capacity_slack: float = 1.25,
    kmeans_iters: int = 10,
    kmeans_rank: int = 8,
    seed: int = 0,
    mesh=None,
    packed_rows: Optional[np.ndarray] = None,
    row_scales: Optional[np.ndarray] = None,
) -> IVFData:
    """Build a balanced-IVF layout for one shard.

    Args:
      emb: ``[n, d]`` float32 document embeddings, already in the same
        space as the flat shard stores (cos-normalized / mean-centered).
      mode: "dot" | "cos" | "l2" — sets the gain-form probe bias and the
        per-doc gain bias, matching :mod:`ragroute_tpu.ops.topk`.
      dtype: on-device doc storage dtype (f32 / bf16 / int8-with-scales,
        or the string "int4" for packed-nibble codes — two per byte,
        the flat shard's half-concat layout, 2x capacity over int8).
      n_clusters: cluster count C (default ~4*sqrt(n), power of two).
      capacity_slack: S = ceil(n/C * slack); docs overflowing their
        nearest cluster spill to their next-preferred one (measured
        recall cost, tests/test_ivf.py).
      mesh: optional ``jax.sharding.Mesh`` — shard the k-means
        assignment/update and the preference-ranking matmuls over every
        mesh device (psum'd Lloyd updates), so a corpus too big for one
        chip builds where it will be served. The balanced-assign pass
        stays a (vectorized) host pass over [n, r] preferences.
      packed_rows / row_scales: optional precomputed int4 quantization of
        ``emb`` (``[n, d//2]`` packed bytes + ``[n]`` f32 scales, from
        ``index.shard._quantize_sym(levels=7, mse_opt=True)`` +
        ``_pack_int4``). When given with ``dtype="int4"`` the slab reuses
        these codes instead of re-running the MSE-optimal quantizer over
        the slot matrix — ``ShardSet.build`` passes its flat-shard codes
        here, halving the dominant host-side build cost.
    """
    from ragroute_tpu.index.shard import parse_storage_dtype

    packed4 = parse_storage_dtype(dtype)
    emb = np.asarray(emb, np.float32)
    n, d = emb.shape
    if packed4 and d % 2:
        raise ValueError(f"int4 packing needs an even embed dim, got {d}")
    use_pre = packed4 and packed_rows is not None
    if use_pre:
        packed_rows = np.asarray(packed_rows, np.int8)
        row_scales = np.asarray(row_scales, np.float32)
        if packed_rows.shape != (n, d // 2) or row_scales.shape != (n,):
            raise ValueError(
                f"packed_rows {packed_rows.shape} / row_scales "
                f"{row_scales.shape} do not match emb [{n}, {d}]")
    c = n_clusters or default_n_clusters(n)
    c = int(max(1, min(c, n)))
    cap = max(-(-n // c), int(-(-n // c) * capacity_slack))
    # lane-align the slab width when cheap: a 128-multiple S avoids
    # Mosaic relayouts in the grouped-GEMM search kernel, but alignment
    # measured only ~2.5% (S=232 vs 256 at the bench point) — never pay
    # more than 15% extra slots for it (S=160 -> 256 would be +60%
    # FLOPs/memory, worse than the relayout)
    cap8 = max(8, -(-cap // 8) * 8)
    cap128 = -(-cap // 128) * 128
    cap = cap128 if cap128 <= 1.15 * cap8 else cap8

    if c == 1:
        cent = emb.mean(axis=0, keepdims=True)
        assign = np.zeros(n, np.int32)
    else:
        xc, wc, _ = _upload_chunks(emb, chunk=8192, mesh=mesh)
        cent = _kmeans_device(xc, wc, emb, c, kmeans_iters, seed,
                              mesh=mesh)
        choices = _top_r_choices(xc, n, cent, min(kmeans_rank, c),
                                 mesh=mesh)
        del xc, wc
        assign = _balanced_assign(choices, c, cap)

    # cluster-major dense layout, docs transposed to ragged_dot's rhs form
    order = np.argsort(assign, kind="stable")
    cl_sorted = assign[order]
    # precomputed int4 codes fill the slab in the packed domain directly
    # (no [C, d, S] f32 slab, no re-quantization); empty slots keep code
    # 0 / scale 1e-12 — bit-identical to quantizing the zero pad rows
    if use_pre:
        docs = np.zeros((c, d // 2, cap), np.int8)
        s_slab = np.full((c, cap), 1e-12, np.float32)
    else:
        docs = np.zeros((c, d, cap), np.float32)
        s_slab = None
    bias = np.full((c, cap), -np.inf, np.float32)
    perm = np.zeros((c, cap), np.int32)
    first = np.searchsorted(cl_sorted, np.arange(c), "left")
    last = np.searchsorted(cl_sorted, np.arange(c), "right")
    for ci in range(c):
        rows = order[first[ci]:last[ci]]
        m = rows.size
        if use_pre:
            docs[ci, :, :m] = packed_rows[rows].T
            s_slab[ci, :m] = row_scales[rows]
        else:
            docs[ci, :, :m] = emb[rows].T
        perm[ci, :m] = rows
        if mode == "l2":
            bias[ci, :m] = -np.sum(emb[rows] * emb[rows], axis=1)
        else:
            bias[ci, :m] = 0.0

    scale = None
    if use_pre:
        scale = jnp.asarray(s_slab)
        dtype = jnp.int8
    elif packed4:
        # same per-doc quantizer as the flat int4 shard (MSE-optimal
        # clipped scales + norm correction, index.shard._quantize_sym) on
        # the slot rows, so a doc's codes are IDENTICAL to its flat-shard
        # codes — full-probe IVF therefore reproduces the flat int4 scan
        from ragroute_tpu.index.shard import _pack_int4, _quantize_sym

        rows = np.ascontiguousarray(
            docs.transpose(0, 2, 1).reshape(c * cap, d))
        codes, s_row = _quantize_sym(rows, 7, mse_opt=True)
        packed = _pack_int4(codes)                     # [C*S, d//2]
        docs = np.ascontiguousarray(
            packed.reshape(c, cap, d // 2).transpose(0, 2, 1))
        scale = jnp.asarray(s_row.reshape(c, cap), np.float32)
        dtype = jnp.int8
    elif dtype == jnp.int8:
        s_row = np.abs(docs).max(axis=1) / 127.0       # [C, S]
        s_row = np.where(s_row == 0.0, 1.0, s_row)
        docs = np.clip(np.round(docs / s_row[:, None, :]), -127, 127)
        scale = jnp.asarray(s_row, np.float32)

    cbias = (-np.sum(cent * cent, axis=1) if mode == "l2"
             else np.zeros(c, np.float32))
    logger.info("ivf build: n=%d C=%d S=%d (slack %.2f, %.0f%% pad)",
                n, c, cap, capacity_slack, 100.0 * (c * cap - n) / max(n, 1))
    return IVFData(
        centroids=jnp.asarray(cent, jnp.float32),
        cbias=jnp.asarray(cbias, jnp.float32),
        docs=jnp.asarray(docs, dtype=dtype),
        bias=jnp.asarray(bias, jnp.float32),
        scale=scale,
        perm=jnp.asarray(perm, jnp.int32),
        n_clusters=c,
        capacity=cap,
        packed4=packed4,
    )


# -- persistence -----------------------------------------------------------

def ivf_fingerprint(emb: np.ndarray) -> str:
    """Cheap content fingerprint of a source embedding matrix.

    The IVF npz cache stores the document VECTORS themselves, so a cache
    hit against regenerated embeddings of the same shape (different seed,
    ``--subclusters``, refreshed corpus) would silently serve stale
    vectors. Hashing the full matrix costs seconds at production scale;
    a deterministic row subsample (~1k rows spread across the matrix)
    plus shape catches any realistic regeneration while staying O(MB) —
    a global reduction would stream the whole (possibly mmapped) corpus
    per source per boot, the exact cost the cache exists to avoid.
    """
    import hashlib

    emb = np.asarray(emb)
    n = emb.shape[0]
    step = max(1, n // 1024)
    sample = np.ascontiguousarray(emb[::step], dtype=np.float32)
    h = hashlib.sha1()
    h.update(str(emb.shape).encode())
    h.update(sample.tobytes())
    h.update(np.float64(sample.sum(dtype=np.float64)).tobytes())
    return h.hexdigest()


def save_ivf(ivf: IVFData, path: str, *,
             fingerprint: Optional[str] = None) -> None:
    """Persist a balanced-IVF layout (npz). bf16 docs are stored as a
    uint16 bit view (npz has no native bfloat16). ``fingerprint``
    (from :func:`ivf_fingerprint`) binds the cache to its source
    embeddings."""
    docs = np.asarray(ivf.docs)
    dtype_name = "int4" if ivf.packed4 else str(ivf.docs.dtype)
    if dtype_name == "bfloat16":
        docs = docs.view(np.uint16)
    np.savez(
        path,
        centroids=np.asarray(ivf.centroids),
        cbias=np.asarray(ivf.cbias),
        docs=docs,
        dtype_name=np.asarray(dtype_name),
        bias=np.asarray(ivf.bias),
        scale=(np.zeros((0,), np.float32) if ivf.scale is None
               else np.asarray(ivf.scale)),
        perm=np.asarray(ivf.perm),
        fingerprint=np.asarray(fingerprint or ""),
    )


def load_ivf(path: str,
             expect_fingerprint: Optional[str] = None
             ) -> Optional[IVFData]:
    """Load a layout written by :func:`save_ivf`.

    With ``expect_fingerprint`` set, returns ``None`` (with a warning)
    when the stored fingerprint is absent or differs — the caller should
    rebuild. Caches written before fingerprints existed are treated as
    stale."""
    import ml_dtypes

    with np.load(path) as z:
        if expect_fingerprint is not None:
            stored = str(z["fingerprint"]) if "fingerprint" in z else ""
            if stored != expect_fingerprint:
                logger.warning(
                    "ivf cache %s does not match current embeddings "
                    "(stored fingerprint %r vs %r); rebuilding",
                    path, stored[:12], expect_fingerprint[:12])
                return None
        dtype_name = str(z["dtype_name"])
        docs = z["docs"]
        if dtype_name == "bfloat16":
            docs = docs.view(ml_dtypes.bfloat16)
        scale = z["scale"]
        c, _, cap = docs.shape
        return IVFData(
            centroids=jnp.asarray(z["centroids"]),
            cbias=jnp.asarray(z["cbias"]),
            docs=jnp.asarray(docs),
            bias=jnp.asarray(z["bias"]),
            scale=None if scale.size == 0 else jnp.asarray(scale),
            perm=jnp.asarray(z["perm"]),
            n_clusters=int(c),
            capacity=int(cap),
            packed4=dtype_name == "int4",
        )
