"""Router training tests: the optax recipe learns synthetic routing."""

import numpy as np
import pytest

import jax.numpy as jnp

from ragroute_tpu.index.synthetic import contribution_labels, make_synthetic_world
from ragroute_tpu.router import RouterBank, build_features, router_forward
from ragroute_tpu.train.train_router import (
    bce_with_logits,
    classification_metrics,
    cyclic_then_step_schedule,
    find_optimal_threshold,
    fit_scaler,
    train_router,
)


def test_schedule_shape():
    sched = cyclic_then_step_schedule(steps_per_epoch=10)
    # cyclic phase: within [1e-3, 5e-3]
    for step in [0, 25, 50, 500, 1000]:
        lr = float(sched(step))
        assert 1e-3 - 1e-9 <= lr <= 5e-3 + 1e-9, (step, lr)
    # after the switch at epoch 115: stepped decay from base
    lr_late = float(sched(116 * 10))
    assert lr_late == pytest.approx(1e-3 * 0.05, rel=1e-5)
    lr_later = float(sched((115 + 51) * 10))
    assert lr_later == pytest.approx(1e-3 * 0.05 ** 2, rel=1e-5)


def test_bce_matches_torch():
    import torch

    logits = np.array([-2.0, -0.1, 0.3, 4.0], np.float32)
    labels = np.array([0.0, 1.0, 1.0, 0.0], np.float32)
    for pw in [1.0, 5.0]:
        want = torch.nn.BCEWithLogitsLoss(
            pos_weight=torch.tensor(pw))(
            torch.from_numpy(logits), torch.from_numpy(labels)).item()
        got = float(bce_with_logits(
            jnp.asarray(logits), jnp.asarray(labels), pw))
        assert got == pytest.approx(want, rel=1e-5)


def test_find_optimal_threshold():
    # perfectly separable: any threshold between the classes is optimal
    logits = np.array([-5, -4, -3, 3, 4, 5], np.float32)
    labels = np.array([0, 0, 0, 1, 1, 1])
    t = find_optimal_threshold(logits, labels)
    probs = 1 / (1 + np.exp(-logits))
    assert ((probs > t) == labels.astype(bool)).mean() >= 5 / 6


def test_fit_scaler_matches_sklearn(rng):
    from sklearn.preprocessing import StandardScaler

    x = rng.standard_normal((100, 8)).astype(np.float32)
    mean, scale = fit_scaler(x)
    sk = StandardScaler().fit(x)
    np.testing.assert_allclose(mean, sk.mean_, rtol=1e-5)
    np.testing.assert_allclose(scale, sk.scale_, rtol=1e-4)


def test_classification_metrics():
    probs = np.array([0.9, 0.8, 0.3, 0.1])
    labels = np.array([1, 0, 1, 0])
    m = classification_metrics(probs, labels, threshold=0.5)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 1 and m["tn"] == 1
    assert m["accuracy"] == 0.5


def test_training_learns_synthetic_routing():
    """The trained router must beat chance clearly on held-out val data."""
    syn = make_synthetic_world("medrag", docs_per_source=512,
                               num_queries=200, seed=7, with_payloads=False)
    labels = contribution_labels(syn)
    bank = RouterBank.create(syn.world, syn.centroids)
    feats = np.asarray(build_features(
        syn.world, bank,
        {e: jnp.asarray(v) for e, v in syn.query_embs.items()}))
    x = feats.reshape(-1, syn.world.router_input_dim)
    y = labels.reshape(-1).astype(np.float32)

    res = train_router(x, y, use_scaler=True, num_epochs=25,
                       batch_size=128, seed=0)
    base_rate = max(y.mean(), 1 - y.mean())
    assert res.metrics["accuracy"] > base_rate + 0.1, res.metrics
    assert res.metrics["auc"] > 0.85, res.metrics
    assert 0.0 < res.threshold < 1.0
    assert res.scaler is not None
