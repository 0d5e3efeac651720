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
from typing import TYPE_CHECKING, Dict, List, Mapping, Optional, Sequence

if TYPE_CHECKING:  # annotation only; runtime import stays lazy
    from ragroute_tpu.index.ivf import IVFData

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ragroute_tpu.config import WorldConfig

# Shards are padded to a multiple of the kernel doc tile so the hot path
# never re-pads (see ops/pallas_topk._pick_tiles upper bound).
SHARD_PAD_MULTIPLE = 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


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


@dataclasses.dataclass
class ShardSet:
    """All shards of a federated world + host-side doc id tables."""

    world: WorldConfig
    shards: List[DeviceShard]
    doc_ids: Dict[str, Optional[list]]  # source -> id payloads (host side)

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
        """
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
                center = jnp.asarray(mu)
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
                    cache = os.path.join(
                        ivf_cache_dirs[src.name],
                        f"ivf_{tag}_{jnp.dtype(dtype).name}"
                        f"_s{ivf_seed}.npz")
                    fp = ivf_fingerprint(emb)
                if cache and os.path.exists(cache):
                    ivf = load_ivf(cache, expect_fingerprint=fp)
                if ivf is None:
                    ivf = build_ivf(
                        emb, src.score_mode, dtype=dtype,
                        n_clusters=(None if ivf_clusters < 0
                                    else ivf_clusters),
                        seed=ivf_seed)
                    if cache:
                        save_ivf(ivf, cache, fingerprint=fp)
            n = emb.shape[0]
            n_pad = _round_up(max(n, SHARD_PAD_MULTIPLE), SHARD_PAD_MULTIPLE)
            if n_pad != n:
                emb = np.pad(emb, ((0, n_pad - n), (0, 0)))
            # gain-form bias computed in f32 BEFORE dtype downcast — on
            # the HOST: doc_bias(jnp.asarray(emb)) would stage the whole
            # padded f32 slab on device (17 GB transient for an 8M-doc
            # shard — device OOM long before the int8 bytes that actually
            # need to fit; surfaced as a deferred RESOURCE_EXHAUSTED at
            # first sync on the async tunnel)
            if src.score_mode == "l2":
                b = jnp.asarray(
                    -np.einsum("nd,nd->n", emb, emb,
                               dtype=np.float32, optimize=True))
            else:
                b = jnp.zeros((n_pad,), jnp.float32)
            if n_pad != n:
                # -inf bias makes padding unselectable even on code paths
                # that cannot apply a static valid_docs mask (e.g. the
                # mesh-sharded search, where padding position is dynamic
                # relative to each device's local slice).
                b = b.at[n:].set(-jnp.inf)
            scale = None
            if dtype == jnp.int8:
                # symmetric per-doc quantization: d_q = round(d / s),
                # s = max|d| / 127; dequant fused into the scoring kernel
                s_row = np.abs(emb).max(axis=1) / 127.0
                s_row = np.where(s_row == 0.0, 1.0, s_row)
                emb = np.clip(np.round(emb / s_row[:, None]), -127, 127)
                scale = jnp.asarray(s_row, dtype=jnp.float32)
            # cast on the HOST so only the final bytes cross to the
            # device (int8 ships 4x less than the f32 working array;
            # ml_dtypes handles the numpy-side bf16 cast)
            emb = emb.astype(jnp.dtype(dtype).type, copy=False)
            docs = jnp.asarray(emb)
            if device is not None:
                docs = jax.device_put(docs, device)
                b = jax.device_put(b, device)
                if scale is not None:
                    scale = jax.device_put(scale, device)
                if center is not None:
                    center = jax.device_put(center, device)
            shards.append(DeviceShard(
                docs=docs, bias=b, scale=scale, center=center, ivf=ivf,
                n_docs=n, name=src.name, score_mode=src.score_mode))
            ids[src.name] = (
                list(doc_ids[src.name]) if doc_ids and src.name in doc_ids
                else None)
        return cls(world=world, shards=shards, doc_ids=ids)

    @property
    def total_docs(self) -> int:
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
