"""Router feature construction on device.

Reference semantics (``ragroute/router.py:241-271``): for each corpus the
router scores the feature vector

    [ pad(query_embedding) ‖ pad(corpus_centroid) ‖ one_hot(corpus_id) ]

where the query embedding comes from that corpus's own encoder, both
embeddings are zero-padded to the world's ``EMBEDDING_MAX_LENGTH``
(``config.py:92-96``), the one-hot id uses FEB4RAG_SOURCE_TO_ID /
MEDRAG_SOURCE_TO_ID / int(cluster) (``config.py:72-90``), and (medrag,
wikipedia only) a fitted StandardScaler whitens the result
(``router.py:269-270``).

Here the per-world constants live in a :class:`RouterBank` pytree of device
arrays, and :func:`build_features` assembles the full ``[B, N, D_in]``
feature tensor in one traced expression — no per-corpus host loop.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ragroute_tpu.config import WorldConfig


@struct.dataclass
class RouterBank:
    """Per-world constant tensors for router feature construction."""

    centroids: jnp.ndarray      # [N, pad] f32, zero-padded corpus centroids
    onehot: jnp.ndarray         # [N, onehot_dim] f32
    scaler_mean: jnp.ndarray    # [D_in] f32 (zeros when no scaler)
    scaler_scale: jnp.ndarray   # [D_in] f32 (ones when no scaler)

    @classmethod
    def create(
        cls,
        world: WorldConfig,
        centroids: Mapping[str, np.ndarray],
        scaler: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ) -> "RouterBank":
        """Build the bank from per-source centroid vectors (native dims).

        Args:
          world: the federated world config.
          centroids: source name -> centroid vector (native encoder dim,
            zero-padded here like reference ``router.py:149-151``).
          scaler: optional ``(mean, scale)`` of a fitted StandardScaler over
            the full feature vector (``transform = (x - mean)/scale``).
        """
        n = world.num_sources
        pad = world.embed_pad_len
        cent = np.zeros((n, pad), dtype=np.float32)
        for i, src in enumerate(world.sources):
            c = np.asarray(centroids[src.name], dtype=np.float32)
            cent[i, : c.shape[0]] = c
        onehot_dim = world.router_input_dim - 2 * pad
        oh = np.zeros((n, onehot_dim), dtype=np.float32)
        for i, src in enumerate(world.sources):
            oh[i, world.onehot_id(src.name)] = 1.0
        if scaler is None:
            mean = np.zeros((world.router_input_dim,), np.float32)
            scale = np.ones((world.router_input_dim,), np.float32)
        else:
            mean = np.asarray(scaler[0], np.float32)
            scale = np.asarray(scaler[1], np.float32)
            if mean.shape != (world.router_input_dim,):
                raise ValueError(
                    f"scaler mean shape {mean.shape} != "
                    f"({world.router_input_dim},)")
        return cls(
            centroids=jnp.asarray(cent),
            onehot=jnp.asarray(oh),
            scaler_mean=jnp.asarray(mean),
            scaler_scale=jnp.asarray(scale),
        )


def pad_queries(
    world: WorldConfig, query_embs: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """Zero-pad each encoder's ``[B, d_enc]`` queries to ``[B, pad]``."""
    out = {}
    for enc in world.encoders:
        q = query_embs[enc].astype(jnp.float32)
        d = q.shape[-1]
        if d > world.embed_pad_len:
            raise ValueError(
                f"encoder {enc} dim {d} exceeds pad {world.embed_pad_len}")
        out[enc] = jnp.pad(q, ((0, 0), (0, world.embed_pad_len - d)))
    return out


def build_features(
    world: WorldConfig,
    bank: RouterBank,
    query_embs: Dict[str, jnp.ndarray],
) -> jnp.ndarray:
    """Assemble scaled router features ``[B, N_sources, D_in]``.

    ``query_embs`` maps encoder name -> ``[B, d_enc]`` (one entry per
    distinct encoder in the world, like the reference's per-model embedding
    dict, ``router.py:285-303``).
    """
    padded = pad_queries(world, query_embs)
    bsz = next(iter(padded.values())).shape[0]

    per_source = []
    for i, src in enumerate(world.sources):
        q = padded[src.encoder]                                   # [B, pad]
        c = jnp.broadcast_to(bank.centroids[i], (bsz, bank.centroids.shape[1]))
        oh = jnp.broadcast_to(bank.onehot[i], (bsz, bank.onehot.shape[1]))
        per_source.append(jnp.concatenate([q, c, oh], axis=-1))
    x = jnp.stack(per_source, axis=1)                              # [B, N, D]
    return (x - bank.scaler_mean) / bank.scaler_scale
