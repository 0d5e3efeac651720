"""Low-rank coarse-scan index for two-stage exact retrieval.

Beyond-reference capability: the reference scans every FAISS flat index
exhaustively in full dimension (``ragroute/data_source.py:158``). This
module adds an opt-in two-stage mode (``impl="lowrank"``) that is
TPU-first by construction — both stages are dense matmuls:

1. **coarse**: score the whole shard against a rank-``r`` projection of
   the stored documents (``[n, r]`` slab, same fused matmul+top-k kernel),
   keeping ``k' = refine_mult * k`` candidates per query. FLOPs drop by
   ``d / r`` (6x at the 768-d bench point with r=128).
2. **refine**: gather the k' candidates' FULL-precision stored rows and
   rescore them exactly, then take the final top-k. The refine stage
   restores exact scores, so recall is lost only when a true top-k doc
   falls outside the coarse top-k'.

Contrast with IVF (the other approximate mode): IVF cuts the number of
candidate DOCS per query via a gather-heavy cluster dispatch; lowrank
cuts the DIMENSION of the exhaustive scan and keeps the memory access
pattern fully dense + streaming, which is the access pattern TPUs (HBM +
MXU) are built for. The two compose conceptually but are kept separate.

The basis comes from the eigendecomposition of the stored documents'
covariance: the rank-r orthonormal basis minimizing the expected squared
projection error of the score-relevant residual. The coarse slab is
ALWAYS mean-centered before projection, regardless of the store's own
centering policy: a per-query constant offset (``q . mu``) never changes
per-query ordering in any score mode (cos normalizes queries first; l2's
``-|d|^2`` bias stays the exact full-dimension value), while centering
removes the common component that otherwise dominates bf16 rounding
where scores concentrate (e.g. cos shards, whose STORE must stay
uncentered because normalization is not shift-invariant — the coarse
slab has no such constraint). Rank selection is energy-based: the
smallest lane-aligned (multiple-of-128) rank whose eigen-spectrum covers
``energy`` of the total variance. Corpora whose spectrum is too flat for
a profitable projection (rank would exceed half the dimension) return
``None`` — the engine then falls back to the exact exhaustive scan for
that shard, so ``impl="lowrank"`` is always safe to request.

Dense-encoder embeddings concentrate variance in few directions
(typically >=0.99 energy well under half the dimension), so real corpora
land in the profitable regime; the synthetic bench worlds have exactly
rank-64 structure (see ``index/synthetic.py``) and project losslessly.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ragroute_tpu.config import (LOWRANK_MAX_RANK_FRACTION as
                                 MAX_RANK_FRACTION,
                                 LOWRANK_MOMENT_SAMPLE_ROWS as
                                 MOMENT_SAMPLE_ROWS,
                                 LOWRANK_RANK_MULTIPLE as RANK_MULTIPLE)

logger = logging.getLogger("lowrank")


@struct.dataclass
class LowRankData:
    """Device arrays of one shard's low-rank coarse index.

    ``docs_lr`` is padded to the SAME row count as the shard's full slab,
    so the shard's gain bias (which carries both the l2 ``-|d|^2`` term
    and the -inf padding/liveness sentinel) applies to the coarse scan
    unchanged. ``mu`` is the mean subtracted before projection: coarse
    gains are true gains minus the per-(query, shard) constant
    ``q_gain . mu`` — harmless within a shard, restored explicitly when
    coarse scores are RETURNED (the packed4 coarse-authoritative mode,
    ops/lowrank_topk.py) so cross-shard merges stay comparable."""

    basis: jnp.ndarray          # [d, r] f32 orthonormal columns
    docs_lr: jnp.ndarray        # [n_pad, r] bf16 projected stored docs
    mu: jnp.ndarray             # [d] f32 projection centering mean
    rank: int = struct.field(pytree_node=False)
    energy: float = struct.field(pytree_node=False)  # captured variance frac


def select_rank(eigvals_desc: np.ndarray, energy: float,
                rank: Optional[int] = None) -> Optional[int]:
    """Smallest multiple-of-128 rank covering ``energy`` of the spectrum.

    ``rank`` overrides the energy rule (still clamped to the dimension).
    Returns ``None`` when the profitable-rank policy refuses (needed rank
    above ``MAX_RANK_FRACTION * d`` — a too-flat spectrum)."""
    d = int(eigvals_desc.shape[0])
    if rank is not None:
        return int(min(max(rank, 1), d))
    total = float(eigvals_desc.sum())
    if total <= 0.0:
        return None
    cum = np.cumsum(eigvals_desc) / total
    need = int(np.searchsorted(cum, energy) + 1)
    r = min(-(-need // RANK_MULTIPLE) * RANK_MULTIPLE, d)
    if r > MAX_RANK_FRACTION * d:
        return None
    return r


def build_lowrank(
    emb: np.ndarray,
    *,
    n_pad: int,
    rank: Optional[int] = None,
    energy: float = 0.99,
    chunk: int = 65536,
) -> Optional[LowRankData]:
    """Build the coarse index for one shard.

    Args:
      emb: ``[n, d]`` float32 STORED-form documents (already
        cos-normalized / mean-centered exactly as the full slab stores
        them, before any dtype quantization).
      n_pad: row count of the shard's padded full slab (docs_lr matches
        it so the shard bias applies unchanged).
      rank: explicit rank override; default picks by ``energy``.
      energy: captured-variance fraction for automatic rank selection.

    Returns ``None`` when the corpus spectrum is too flat for a
    profitable projection (see :func:`select_rank`)."""
    emb = np.asarray(emb, np.float32)
    n, d = emb.shape
    mu = emb.mean(axis=0, dtype=np.float64).astype(np.float32)
    step = max(1, n // MOMENT_SAMPLE_ROWS)
    sample = np.ascontiguousarray(emb[::step]) - mu
    moment = sample.T @ sample                        # [d, d], O(d^2) tiny
    w, v = np.linalg.eigh(moment.astype(np.float64))  # ascending
    w, v = w[::-1], v[:, ::-1]
    r = select_rank(np.maximum(w, 0.0), energy, rank)
    if r is None:
        logger.warning(
            "lowrank build refused: spectrum too flat (%.3f energy at "
            "rank %d of %d); shard will use the exact exhaustive scan",
            float(np.cumsum(np.maximum(w, 0.0))[int(MAX_RANK_FRACTION * d) - 1]
                  / max(w.sum(), 1e-30)),
            int(MAX_RANK_FRACTION * d), d)
        return None
    basis = np.ascontiguousarray(v[:, :r]).astype(np.float32)
    cap = float(np.maximum(w[:r], 0.0).sum() / max(w.sum(), 1e-30))

    import ml_dtypes

    docs_lr = np.zeros((n_pad, r), ml_dtypes.bfloat16)
    for off in range(0, n, chunk):
        end = min(off + chunk, n)
        docs_lr[off:end] = (emb[off:end] - mu) @ basis
    logger.info("lowrank build: n=%d d=%d rank=%d energy=%.4f "
                "(+%.0f%% index bytes, %.1fx coarse FLOP cut)",
                n, d, r, cap, 100.0 * 2 * r / (4.0 * d), d / r)
    return LowRankData(
        basis=jnp.asarray(basis),
        docs_lr=jnp.asarray(docs_lr),
        mu=jnp.asarray(mu),
        rank=r,
        energy=cap,
    )


# -- persistence -------------------------------------------------------------

def save_lowrank(lr: LowRankData, path: str, *,
                 fingerprint: Optional[str] = None) -> None:
    """Persist a coarse index (npz; bf16 stored as a uint16 bit view).
    ``fingerprint`` (``ivf.ivf_fingerprint`` of the source embeddings)
    binds the cache to its corpus."""
    np.savez(
        path,
        basis=np.asarray(lr.basis),
        docs_lr=np.asarray(lr.docs_lr).view(np.uint16),
        mu=np.asarray(lr.mu),
        energy=np.float64(lr.energy),
        fingerprint=np.asarray(fingerprint or ""),
    )


def load_lowrank(path: str,
                 expect_fingerprint: Optional[str] = None
                 ) -> Optional[LowRankData]:
    """Load a coarse index written by :func:`save_lowrank`; ``None`` (and
    a warning) on a fingerprint mismatch — the caller rebuilds."""
    import ml_dtypes

    with np.load(path) as z:
        if expect_fingerprint is not None:
            stored = str(z["fingerprint"]) if "fingerprint" in z else ""
            if stored != expect_fingerprint:
                logger.warning(
                    "lowrank cache %s does not match current embeddings "
                    "(stored fingerprint %r vs %r); rebuilding",
                    path, stored[:12], expect_fingerprint[:12])
                return None
        if "mu" not in z:   # pre-round-4 cache format: rebuild
            logger.warning("lowrank cache %s predates the mu field; "
                           "rebuilding", path)
            return None
        basis = z["basis"]
        return LowRankData(
            basis=jnp.asarray(basis),
            docs_lr=jnp.asarray(z["docs_lr"].view(ml_dtypes.bfloat16)),
            mu=jnp.asarray(z["mu"]),
            rank=int(basis.shape[1]),
            energy=float(z["energy"]),
        )
