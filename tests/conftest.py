"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on
host-platform virtual devices (same XLA collectives, same shardings).
"""

import os

# Must be set before jax is imported anywhere. Force (not setdefault): the
# axon sitecustomize pre-sets JAX_PLATFORMS=axon, which would silently route
# every test through the remote-TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
# No network egress in CI: without these, the FIRST tokenizer load per
# process burns ~30 s in huggingface_hub connect retries before falling
# back (measured; the prompts layer then uses its whitespace fallback).
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize registers a remote-TPU PJRT plugin at interpreter
# start and pins jax_platforms; pin it back explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
