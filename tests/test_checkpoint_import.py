"""Reference-artifact import paths: torch router checkpoints, sklearn
scalers, and the system-level router.pth loading branch."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ragroute_tpu.router import router_forward
from ragroute_tpu.router.torch_import import (
    load_sklearn_scaler,
    load_torch_router,
)


@pytest.fixture()
def torch_ckpt(tmp_path):
    import torch

    from tests.test_router import make_torch_router

    model = make_torch_router(1540, seed=4)
    path = str(tmp_path / "best_model.pth")
    torch.save(model.state_dict(), path)
    return model, path


def test_load_torch_router_file(torch_ckpt, rng):
    import torch

    model, path = torch_ckpt
    params = load_torch_router(path)
    x = rng.standard_normal((4, 1540)).astype(np.float32)
    model.eval()
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()[:, 0]
    got = np.asarray(router_forward(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_load_sklearn_scaler_variants(tmp_path, rng):
    import pickle

    from sklearn.preprocessing import StandardScaler

    x = rng.standard_normal((50, 16)).astype(np.float64)
    scaler = StandardScaler().fit(x)

    # bare scaler pickle (wikipedia layout, router.py:128-130)
    p1 = str(tmp_path / "scaler.pkl")
    with open(p1, "wb") as f:
        pickle.dump(scaler, f)
    mean, scale = load_sklearn_scaler(p1)
    np.testing.assert_allclose(mean, scaler.mean_, rtol=1e-6)

    # 5-tuple preprocessed_data.pkl (medrag layout, router.py:122-125)
    p2 = str(tmp_path / "preprocessed_data.pkl")
    with open(p2, "wb") as f:
        pickle.dump((None, None, None, scaler, None), f)
    mean2, scale2 = load_sklearn_scaler(p2)
    np.testing.assert_allclose(scale2, scaler.scale_, rtol=1e-6)


def test_system_loads_torch_pth(tmp_path, torch_ckpt, rng):
    """load_world_artifacts picks up a reference-format router.pth AND its
    companion scaler pickle; on uses_scaler worlds a bare pth without any
    scaler artifact must fail loudly (the MLP was trained on scaled
    features — identity scaling would silently mis-route)."""
    import pickle
    import shutil

    from sklearn.preprocessing import StandardScaler

    from ragroute_tpu.config import get_world
    from ragroute_tpu.index.synthetic import make_synthetic_world, save_world
    from ragroute_tpu.system import load_world_artifacts

    _, ckpt_path = torch_ckpt
    root = str(tmp_path / "data")
    syn = make_synthetic_world("medrag", docs_per_source=600, num_queries=2)
    save_world(syn, root)
    shutil.copy(ckpt_path, os.path.join(root, "medrag", "router.pth"))

    # medrag uses_scaler: pth without scaler artifact → loud failure
    with pytest.raises(FileNotFoundError, match="scaler"):
        load_world_artifacts(root, get_world("medrag"))

    scaler = StandardScaler().fit(
        rng.standard_normal((40, 1540)).astype(np.float64))
    with open(os.path.join(root, "medrag", "scaler.pkl"), "wb") as f:
        pickle.dump(scaler, f)
    (shard_set, params, bank, provider, store, rel, thr) = \
        load_world_artifacts(root, get_world("medrag"))
    assert thr is None  # pth carries no threshold; config default applies
    assert params["fc1"]["w"].shape == (1540, 256)
    np.testing.assert_allclose(
        np.asarray(bank.scaler_mean), scaler.mean_.astype(np.float32),
        rtol=1e-6)
