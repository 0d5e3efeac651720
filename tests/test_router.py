"""Router parity tests: MLP vs torch, feature construction, strategies."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragroute_tpu.config import get_world
from ragroute_tpu.router import (
    RouterBank,
    build_features,
    init_router_params,
    router_forward,
    routing_mask,
)
from ragroute_tpu.router.torch_import import (
    load_router_npz,
    params_from_torch_state_dict,
    save_router_npz,
)


def make_torch_router(input_dim, seed=0):
    """The reference CorpusRoutingNN (ragroute/router.py:37-55), rebuilt in
    torch for a bit-parity check of our JAX forward."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(seed)

    class CorpusRoutingNN(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.fc1 = nn.Linear(d, 256)
            self.ln1 = nn.LayerNorm(256)
            self.dropout1 = nn.Dropout(0.4)
            self.fc2 = nn.Linear(256, 128)
            self.ln2 = nn.LayerNorm(128)
            self.dropout2 = nn.Dropout(0.4)
            self.fc3 = nn.Linear(128, 1)

        def forward(self, x):
            x = F.relu(self.ln1(self.fc1(x)))
            x = self.dropout1(x)
            x = F.relu(self.ln2(self.fc2(x)))
            x = self.dropout2(x)
            return self.fc3(x)

    return CorpusRoutingNN(input_dim)


def test_mlp_matches_torch_eval(rng):
    import torch

    d = 1540  # medrag router input dim
    model = make_torch_router(d)
    model.eval()
    x = rng.standard_normal((8, d)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()[:, 0]

    params = params_from_torch_state_dict(model.state_dict())
    got = np.asarray(router_forward(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # decisions at the serve threshold match exactly
    want_dec = 1.0 / (1.0 + np.exp(-want)) > 0.4924
    got_dec = jax.nn.sigmoid(got) > 0.4924
    np.testing.assert_array_equal(np.asarray(got_dec), want_dec)


def test_router_npz_roundtrip(tmp_path):
    params = init_router_params(jax.random.key(0), 128)
    path = str(tmp_path / "router.npz")
    scaler = (np.arange(128, dtype=np.float32),
              np.ones(128, dtype=np.float32) * 2)
    save_router_npz(path, params, threshold=0.4924, scaler=scaler)
    p2, thr, sc = load_router_npz(path)
    assert thr == pytest.approx(0.4924)
    np.testing.assert_array_equal(sc[0], scaler[0])
    x = jnp.ones((2, 128))
    np.testing.assert_allclose(
        np.asarray(router_forward(params, x)),
        np.asarray(router_forward(p2, x)), rtol=1e-6)


def reference_features_numpy(world, centroids, scaler, query_embs):
    """Literal numpy port of reference feature building
    (ragroute/router.py:241-271) for one query."""
    pad = world.embed_pad_len
    padded_q = {
        name: np.pad(q, (0, pad - len(q))) for name, q in query_embs.items()
    }
    inputs = []
    n_onehot = world.router_input_dim - 2 * pad
    for src in world.sources:
        c = centroids[src.name]
        c = np.pad(c, (0, pad - len(c)))
        feats = np.concatenate([padded_q[src.encoder], c])
        onehot = np.eye(n_onehot)[world.onehot_id(src.name)]
        feats = np.concatenate([feats, onehot])
        inputs.append(feats)
    inputs = np.stack(inputs)
    if scaler is not None:
        inputs = (inputs - scaler[0]) / scaler[1]
    return inputs.astype(np.float32)


@pytest.mark.parametrize("world_name", ["medrag", "feb4rag", "wikipedia"])
def test_feature_builder_matches_reference(rng, world_name):
    world = get_world(world_name)
    centroids = {
        s.name: rng.standard_normal(s.embed_dim).astype(np.float32)
        for s in world.sources
    }
    scaler = None
    if world.uses_scaler:
        scaler = (
            rng.standard_normal(world.router_input_dim).astype(np.float32),
            rng.uniform(0.5, 2.0, world.router_input_dim).astype(np.float32),
        )
    bank = RouterBank.create(world, centroids, scaler)

    bsz = 3
    query_embs = {
        enc: rng.standard_normal(
            (bsz, next(s.embed_dim for s in world.sources if s.encoder == enc))
        ).astype(np.float32)
        for enc in world.encoders
    }
    got = np.asarray(build_features(
        world, bank, {k: jnp.asarray(v) for k, v in query_embs.items()}))
    assert got.shape == (bsz, world.num_sources, world.router_input_dim)

    for b in range(bsz):
        want = reference_features_numpy(
            world, centroids, scaler, {k: v[b] for k, v in query_embs.items()})
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("world_name", ["medrag", "feb4rag", "wikipedia"])
def test_routing_strategies(rng, world_name):
    world = get_world(world_name)
    bsz, n = 64, world.num_sources
    probs = jnp.asarray(rng.uniform(0, 1, (bsz, n)).astype(np.float32))
    key = jax.random.key(1)

    m = routing_mask(world, "ragroute", probs, key)
    np.testing.assert_array_equal(
        np.asarray(m), np.asarray(probs) > world.router_threshold)

    assert np.asarray(routing_mask(world, "all", probs, key)).all()
    assert not np.asarray(routing_mask(world, "none", probs, key)).any()

    r = np.asarray(routing_mask(world, "random", probs, key))
    # exactly `random_subset` sources per query (router.py:229-235)
    np.testing.assert_array_equal(r.sum(axis=1),
                                  np.full(bsz, world.random_subset))
    # different keys give different subsets (sanity of randomness)
    r2 = np.asarray(routing_mask(world, "random", probs, jax.random.key(2)))
    assert (r != r2).any()


def test_routing_mask_validates():
    world = get_world("medrag")
    probs = jnp.zeros((2, 4))
    with pytest.raises(ValueError):
        routing_mask(world, "bogus", probs, jax.random.key(0))
    with pytest.raises(ValueError):
        routing_mask(world, "all", jnp.zeros((2, 5)), jax.random.key(0))
