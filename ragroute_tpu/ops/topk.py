"""Brute-force top-k document scoring.

This is the TPU-native replacement for the per-process FAISS searches in the
reference system (``ragroute/data_source.py:158,186,203`` — ``index.search``
on ``faiss-cpu`` flat indexes). Corpus embedding shards are dense arrays
resident in HBM; scoring is a matmul on the MXU; top-k selection happens
on-device so only ``k`` (score, index) pairs per query ever leave the chip.

Three implementations, all exact (no ANN approximation, matching the
reference's flat indexes):

* :func:`exact_topk` — materializes the full ``[B, N]`` score matrix, then
  ``jax.lax.top_k``. Ground truth for tests; O(B*N) memory.
* :func:`chunked_topk` — ``lax.scan`` over document chunks with a running
  top-k carry. Memory-bounded XLA baseline; never materializes more than
  ``[B, chunk]`` scores.
* :func:`ragroute_tpu.ops.pallas_topk.pallas_topk` — fused Pallas kernel
  (matmul + streaming top-k in VMEM, tile-skip when a tile cannot beat the
  running k-th best). The production path.

Score semantics (reference parity):

* ``dot``  — inner product, higher is better (MedRAG MedCPT indexes;
  FeB4RAG models with dot score, ``model_zoo.py:25-32``).
* ``cos``  — cosine similarity; callers must pass L2-normalized docs (done at
  shard build time) and we normalize queries here.
* ``l2``   — squared L2 distance, LOWER is better (wikipedia world:
  L2-normalized FAISS index searched with normalized queries,
  ``data_source.py:196-205``; merged ascending, ``rerank.py:28-34``).

All implementations share one internal convention: scores are transformed so
that HIGHER is always better ("gain" form), selected, then mapped back to the
natural form. For ``l2``: gain = 2*q·d − |d|², and squared-L2 =
|q|² − gain.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ragroute_tpu.utils.precision import scoring_precision

NEG_INF = float("-inf")  # plain float: safe to close over inside kernels


def _validate(mode: str) -> None:
    if mode not in ("dot", "cos", "l2"):
        raise ValueError(f"Unknown score mode {mode!r}")


def _prepare_queries(queries: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Transform queries into gain-form: q' such that gain = q'·d + bias_d."""
    q = queries.astype(jnp.float32)
    if mode == "cos":
        norms = jnp.linalg.norm(q, axis=-1, keepdims=True)
        q = q / jnp.maximum(norms, 1e-12)
    elif mode == "l2":
        # gain = 2*q·d - |d|^2  (drop the per-query constant |q|^2)
        q = 2.0 * q
    return q


def unpack_int4(packed: jnp.ndarray, axis: int = -1,
                out_dtype=jnp.int8) -> jnp.ndarray:
    """Unpack int4 bytes (dim axis halved) into codes in natural order.

    Inverse of ``index.shard._pack_int4``: byte j holds dim ``j`` in its
    low nibble and dim ``j + d//2`` in its high nibble, so two arithmetic
    shifts + one concat along ``axis`` recover the natural dim order (no
    interleave). Each half is cast to ``out_dtype`` BEFORE the concat so
    the widest transient is one int32 half-array, not a full-width int32
    copy (matters when unpacking whole slabs under jit — e.g. the
    mesh-sharded IVF path). The canonical in-kernel (Pallas) copies of
    this trick live in ops/pallas_topk.py and ops/ivf_topk.py, where a
    helper cannot reach into the kernel body.
    """
    x = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(x, 28), 28)   # sign-extend low
    hi = jnp.right_shift(x, 4)                        # byte sign = hi sign
    return jnp.concatenate(
        [lo.astype(out_dtype), hi.astype(out_dtype)], axis=axis)


def doc_bias(docs: jnp.ndarray, mode: str) -> Optional[jnp.ndarray]:
    """Per-document additive bias in gain form (``-|d|^2`` for l2)."""
    if mode == "l2":
        d = docs.astype(jnp.float32)
        return -jnp.sum(d * d, axis=-1)
    return None


def gain_to_natural(
    gains: jnp.ndarray, queries: jnp.ndarray, mode: str
) -> jnp.ndarray:
    """Map internal gain scores back to the natural (FAISS-parity) scale."""
    if mode == "l2":
        q = queries.astype(jnp.float32)
        qsq = jnp.sum(q * q, axis=-1, keepdims=True)
        return qsq - gains
    return gains


def exact_topk(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    k: int,
    *,
    mode: str = "dot",
    valid_docs: Optional[int] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-materialization exact top-k (test oracle).

    ``scale``: optional per-doc multiplicative dequantization factor ``[N]``
    for int8-quantized shards (gain = (q . d_q) * scale + bias).

    Returns ``(scores [B, k], indices [B, k])`` with scores in natural form,
    sorted best-first (descending for dot/cos, ascending for l2).
    """
    _validate(mode)
    n = docs.shape[0]
    q = _prepare_queries(queries, mode)
    gains = jnp.dot(q, docs.T.astype(jnp.float32),
                    precision=scoring_precision(jnp.float32),
                    preferred_element_type=jnp.float32)
    if scale is not None:
        gains = gains * scale[None, :]
    b = doc_bias(docs, mode) if bias is None else bias
    if b is not None:
        gains = gains + b[None, :]
    if valid_docs is not None and valid_docs < n:
        col = jnp.arange(n)
        gains = jnp.where(col[None, :] < valid_docs, gains, NEG_INF)
    top_gain, top_idx = jax.lax.top_k(gains, k)
    return gain_to_natural(top_gain, queries, mode), top_idx


def merge_topk(
    gains_a: jnp.ndarray,
    idx_a: jnp.ndarray,
    gains_b: jnp.ndarray,
    idx_b: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two gain-form top-k lists into one (higher gain wins)."""
    gains = jnp.concatenate([gains_a, gains_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    top_gain, pos = jax.lax.top_k(gains, k)
    top_idx = jnp.take_along_axis(idx, pos, axis=-1)
    return top_gain, top_idx


def chunked_topk(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    k: int,
    *,
    mode: str = "dot",
    valid_docs: Optional[int] = None,
    chunk: int = 16384,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Memory-bounded exact top-k via ``lax.scan`` over document chunks.

    The carry is the running top-k (gain, index) per query; each step scores
    one ``[chunk, d]`` slab on the MXU and merges. HBM footprint is
    ``O(B * chunk)`` instead of ``O(B * N)``.
    """
    _validate(mode)
    bsz = queries.shape[0]
    n, d = docs.shape
    valid = n if valid_docs is None else valid_docs
    chunk = max(min(chunk, n), k)

    q = _prepare_queries(queries, mode)
    b = doc_bias(docs, mode) if bias is None else bias

    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    docs_p = jnp.pad(docs, ((0, n_pad - n), (0, 0)))
    bias_p = None if b is None else jnp.pad(b, (0, n_pad - n))
    docs_c = docs_p.reshape(n_chunks, chunk, d)
    bias_c = None if bias_p is None else bias_p.reshape(n_chunks, chunk)
    scale_c = None
    if scale is not None:
        scale_c = jnp.pad(scale, (0, n_pad - n)).reshape(n_chunks, chunk)
        if bias_c is None:
            bias_c = jnp.zeros((n_chunks, chunk), jnp.float32)

    col = jnp.arange(chunk, dtype=jnp.int32)

    def step(carry, xs):
        run_g, run_i = carry
        svec = None
        if scale_c is not None:
            slab, bvec, svec, offset = xs
        elif bias_c is not None:
            slab, bvec, offset = xs
        else:
            slab, offset = xs
            bvec = None
        gains = jnp.dot(q, slab.T.astype(q.dtype),
                        precision=scoring_precision(slab.dtype),
                        preferred_element_type=jnp.float32)
        if svec is not None:
            gains = gains * svec[None, :]
        if bvec is not None:
            gains = gains + bvec[None, :]
        gidx = offset + col
        gains = jnp.where(gidx[None, :] < valid, gains, NEG_INF)
        c_g, c_pos = jax.lax.top_k(gains, k)
        c_i = gidx[c_pos]
        return merge_topk(run_g, run_i, c_g, c_i, k), None

    init = (
        jnp.full((bsz, k), NEG_INF, dtype=jnp.float32),
        jnp.zeros((bsz, k), dtype=jnp.int32),
    )
    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    if scale_c is not None:
        xs = (docs_c, bias_c, scale_c, offsets)
    elif bias_c is not None:
        xs = (docs_c, bias_c, offsets)
    else:
        xs = (docs_c, offsets)
    (top_gain, top_idx), _ = jax.lax.scan(step, init, xs)
    return gain_to_natural(top_gain, queries, mode), top_idx


def shard_topk(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    k: int,
    *,
    mode: str = "dot",
    valid_docs: Optional[int] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
    center: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    chunk: int = 16384,
    packed4: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch to the best exact top-k implementation.

    ``packed4``: docs is an int4-packed shard ``[N, d//2]`` int8 (two
    codes per byte, see :func:`unpack_int4`); the Pallas kernel unpacks
    per tile, other impls unpack up front.

    ``impl``: "auto" | "exact" | "chunked" | "pallas". "auto" picks the
    Pallas kernel on TPU backends and the chunked scan elsewhere (e.g. the
    CPU test mesh), falling back to "exact" for tiny shards.

    ``center``: optional ``[d]`` mean that was subtracted from the stored
    docs at build time (mean-centered lossy-dtype shards, see
    ShardSet.build). l2: queries shift by the same amount — |q-d|^2 is
    unchanged. dot: queries pass through unchanged (ordering of
    q·(d-mu) equals q·d per query) and the per-query constant ``q·mu``
    is added back to the returned scores, restoring FAISS raw-IP score
    parity while the stored values carry only the discriminating
    residual (the score-concentration quantization adversary,
    tests/test_recall_gate.py::test_recall_gate_concentrated_scores).
    """
    dot_restore = None
    if center is not None:
        if mode == "l2":
            queries = queries.astype(jnp.float32) - center
        elif mode == "dot":
            dot_restore = queries.astype(jnp.float32) @ center
    if impl == "auto":
        n = docs.shape[0]
        if n <= 4096:
            impl = "exact"
        elif jax.default_backend() in ("tpu", "axon"):
            impl = "pallas"
        else:
            impl = "chunked"
    if packed4 and impl != "pallas":
        docs = unpack_int4(docs)    # int8 codes; scale dequant as for int8
        if scale is not None and scale.ndim == 2:
            # per-group int4 scales: dequantize up front (the exact and
            # chunked paths only fuse PER-DOC scales into their gains)
            g = scale.shape[1]
            dg = docs.shape[1] // g
            docs = (docs.astype(jnp.float32).reshape(-1, g, dg)
                    * scale[:, :, None].astype(jnp.float32)
                    ).reshape(docs.shape[0], -1)
            scale = None
    if impl == "exact":
        s, i = exact_topk(queries, docs, k, mode=mode,
                          valid_docs=valid_docs, bias=bias, scale=scale)
    elif impl == "chunked":
        s, i = chunked_topk(queries, docs, k, mode=mode,
                            valid_docs=valid_docs, chunk=chunk, bias=bias,
                            scale=scale)
    elif impl == "pallas":
        from ragroute_tpu.ops.pallas_topk import pallas_topk

        s, i = pallas_topk(queries, docs, k, mode=mode,
                           valid_docs=valid_docs, bias=bias, scale=scale,
                           packed4=packed4)
    else:
        raise ValueError(f"Unknown impl {impl!r}")
    if dot_restore is not None:
        s = s + dot_restore[:, None]
    return s, i
