"""The corpus-routing MLP ("CorpusRoutingNN") in pure JAX.

Architecture parity with the reference (``ragroute/router.py:37-55``):

    Linear(d, 256) -> LayerNorm -> ReLU -> Dropout(0.4)
    -> Linear(256, 128) -> LayerNorm -> ReLU -> Dropout(0.4)
    -> Linear(128, 1)

run once per (query, corpus) feature vector; at serve time dropout is
inactive and the output logit is sigmoided and thresholded
(``router.py:273-280``). Here the whole ``[B, N_sources]`` gate is one
batched forward on the MXU.

Parameters are a plain pytree (dict) so they flow through jit/pjit and can
be imported from the reference's torch checkpoints
(:mod:`ragroute_tpu.router.torch_import`) or trained natively
(:mod:`ragroute_tpu.train.train_router`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ragroute_tpu.utils.precision import scoring_precision

CorpusRouterParams = Dict[str, Dict[str, jnp.ndarray]]

HIDDEN1 = 256
HIDDEN2 = 128
DROPOUT_RATE = 0.4
LN_EPS = 1e-5  # torch nn.LayerNorm default


def init_router_params(
    rng: jax.Array, input_dim: int, dtype=jnp.float32
) -> CorpusRouterParams:
    """Kaiming-uniform init matching torch.nn.Linear defaults."""
    ks = jax.random.split(rng, 6)

    def linear(kw, kb, fan_in, fan_out):
        bound = 1.0 / jnp.sqrt(fan_in)
        w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
        b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
        return {"w": w, "b": b}

    def layernorm(dim):
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    return {
        "fc1": linear(ks[0], ks[1], input_dim, HIDDEN1),
        "ln1": layernorm(HIDDEN1),
        "fc2": linear(ks[2], ks[3], HIDDEN1, HIDDEN2),
        "ln2": layernorm(HIDDEN2),
        "fc3": linear(ks[4], ks[5], HIDDEN2, 1),
    }


def _layernorm(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    return y * p["scale"] + p["bias"]


def _dense(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return (
        jnp.dot(x, p["w"], precision=scoring_precision(x.dtype),
                preferred_element_type=jnp.float32)
        + p["b"]
    )


def router_forward(params: CorpusRouterParams, x: jnp.ndarray) -> jnp.ndarray:
    """Eval-mode forward: ``[..., input_dim] -> [...]`` logits.

    Dropout is identity at eval (torch ``model.eval()``, router.py:119).
    """
    h = jax.nn.relu(_layernorm(_dense(x, params["fc1"]), params["ln1"]))
    h = jax.nn.relu(_layernorm(_dense(h, params["fc2"]), params["ln2"]))
    return _dense(h, params["fc3"])[..., 0]


def router_apply_train(
    params: CorpusRouterParams, x: jnp.ndarray, rng: jax.Array
) -> jnp.ndarray:
    """Train-mode forward with inverted dropout (rate 0.4, router.py:42,46)."""
    k1, k2 = jax.random.split(rng)

    def dropout(h, key):
        keep = 1.0 - DROPOUT_RATE
        mask = jax.random.bernoulli(key, keep, h.shape)
        return jnp.where(mask, h / keep, 0.0)

    h = jax.nn.relu(_layernorm(_dense(x, params["fc1"]), params["ln1"]))
    h = dropout(h, k1)
    h = jax.nn.relu(_layernorm(_dense(h, params["fc2"]), params["ln2"]))
    h = dropout(h, k2)
    return _dense(h, params["fc3"])[..., 0]
