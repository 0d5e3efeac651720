"""Matmul precision policy.

Parity-sensitive dots (shard scoring, router MLP) want full f32 fidelity;
but on the TPU backend in this environment, multi-pass f32 matmul modes
(``Precision.HIGH``/``HIGHEST``) compile ~200x slower than the native
single-pass bf16 mode (measured: 0.7s vs 179s for one [1024,1540]x
[1540,256] dot). Policy:

* CPU (tests, parity gates): ``HIGHEST`` — bit-comparable to numpy f32.
* TPU: ``DEFAULT`` (single-pass bf16 MXU) — ~1e-2 relative error, which
  costs ~0.6% recall@32 against exact f32 (same order as storing the index
  in bf16, which the production path does anyway).

Override with ``RAGROUTE_MATMUL_PRECISION=default|high|highest`` when a
TPU run must trade compile time for exactness.
"""

from __future__ import annotations

import os

import jax

_LEVELS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def scoring_precision(operand_dtype=None) -> jax.lax.Precision:
    """Precision for parity-sensitive f32 dots (bf16 operands ignore it)."""
    import jax.numpy as jnp

    if operand_dtype is not None and operand_dtype != jnp.float32:
        return jax.lax.Precision.DEFAULT
    env = os.environ.get("RAGROUTE_MATMUL_PRECISION")
    if env:
        return _LEVELS[env.lower()]
    if jax.default_backend() in ("tpu", "axon"):
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST
