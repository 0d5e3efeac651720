"""Routing strategies as boolean masks over federated sources.

Reference semantics (``ragroute/router.py:221-239``):

* ``ragroute`` — MLP gate: ``sigmoid(logit) > threshold`` (0.4924 for
  medrag, 0.5 otherwise, ``router.py:277-280``).
* ``all``      — every source.
* ``random``   — a uniform random subset of fixed size per query
  (2 of 4 medrag / 9 of 13 feb4rag / 2 of 10 wikipedia,
  ``router.py:229-235``).
* ``none``     — no sources (LLM-only ablation).

The reference scatters work to the selected source processes; here the
strategy is a ``[B, N]`` mask consumed inside the jitted search step —
"routing" becomes masking, so the program stays static-shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ragroute_tpu.config import ROUTING_STRATEGIES, WorldConfig


def routing_mask(
    world: WorldConfig,
    strategy: str,
    probs: jnp.ndarray,
    rng: jax.Array,
    threshold: float = None,
) -> jnp.ndarray:
    """Build the ``[B, N]`` boolean routing mask.

    Args:
      world: federated world (static).
      strategy: one of ``ragroute | all | random | none`` (static).
      probs: ``[B, N]`` router sigmoid probabilities (only used by
        ``ragroute``; pass anything of the right shape otherwise).
      rng: PRNG key (only used by ``random``).
      threshold: decision threshold override (e.g. the ROC-optimal value
        stored with a trained checkpoint); defaults to the world's pinned
        threshold (0.4924 medrag / 0.5, router.py:277-280).
    """
    if strategy not in ROUTING_STRATEGIES:
        raise ValueError(
            f"Unknown routing strategy: {strategy!r}; "
            f"expected one of {ROUTING_STRATEGIES}")
    bsz, n = probs.shape
    if n != world.num_sources:
        raise ValueError(f"probs last dim {n} != {world.num_sources} sources")

    if strategy == "ragroute":
        t = world.router_threshold if threshold is None else threshold
        return probs > t
    if strategy == "all":
        return jnp.ones((bsz, n), dtype=bool)
    if strategy == "none":
        return jnp.zeros((bsz, n), dtype=bool)
    # random: choose exactly `random_subset` sources per query, uniformly
    # without replacement (rank of iid uniforms < subset size).
    u = jax.random.uniform(rng, (bsz, n))
    kth = jnp.sort(u, axis=1)[:, world.random_subset - 1 : world.random_subset]
    return u <= kth
