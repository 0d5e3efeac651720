"""Checkpoint import/export for the corpus router.

The reference trains its router in torch and serves torch checkpoints
(``best_model.pth`` / ``router_best_model.pt``, ``router.py:106-119``) plus
pickled sklearn StandardScalers (``router.py:121-130``). This module maps
those artifacts into the JAX parameter pytree so routing decisions are
reproducible bit-for-bit, and provides a native ``.npz`` format for
checkpoints trained with :mod:`ragroute_tpu.train.train_router`.

torch/sklearn are host-side, import-time-optional dependencies: they are
needed only when actually importing reference artifacts.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from ragroute_tpu.router.mlp import CorpusRouterParams

# torch Linear stores weight as [out_features, in_features]; ours is [in, out].
_TORCH_KEY_MAP = {
    "fc1.weight": ("fc1", "w", True),
    "fc1.bias": ("fc1", "b", False),
    "ln1.weight": ("ln1", "scale", False),
    "ln1.bias": ("ln1", "bias", False),
    "fc2.weight": ("fc2", "w", True),
    "fc2.bias": ("fc2", "b", False),
    "ln2.weight": ("ln2", "scale", False),
    "ln2.bias": ("ln2", "bias", False),
    "fc3.weight": ("fc3", "w", True),
    "fc3.bias": ("fc3", "b", False),
}


def params_from_torch_state_dict(state_dict) -> CorpusRouterParams:
    """Convert a torch ``CorpusRoutingNN`` state dict to JAX params."""
    import jax.numpy as jnp

    params: Dict[str, Dict[str, np.ndarray]] = {}
    for tkey, (layer, field, transpose) in _TORCH_KEY_MAP.items():
        if tkey not in state_dict:
            raise KeyError(
                f"torch checkpoint missing {tkey!r}; got {list(state_dict)}")
        arr = np.asarray(state_dict[tkey].detach().cpu().numpy()
                         if hasattr(state_dict[tkey], "detach")
                         else state_dict[tkey], dtype=np.float32)
        if transpose:
            arr = arr.T
        params.setdefault(layer, {})[field] = jnp.asarray(arr)
    return params


def load_torch_router(path: str) -> CorpusRouterParams:
    """Load a reference torch checkpoint (``router.py:117-118``)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return params_from_torch_state_dict(state)


def load_sklearn_scaler(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a pickled sklearn StandardScaler as ``(mean, scale)``.

    Handles both layouts the reference uses: a bare scaler pickle
    (wikipedia, ``router.py:128-130``) and the 5-tuple
    ``preprocessed_data.pkl`` whose 4th element is the scaler
    (medrag, ``router.py:122-125``).
    """
    import pickle

    with open(path, "rb") as f:
        obj = pickle.load(f)
    if isinstance(obj, tuple) and len(obj) == 5:
        obj = obj[3]
    mean = np.asarray(obj.mean_, dtype=np.float32)
    scale = np.asarray(obj.scale_, dtype=np.float32)
    return mean, scale


# ---------------------------------------------------------------------------
# Native checkpoint format (.npz)
# ---------------------------------------------------------------------------

def save_router_npz(
    path: str,
    params: CorpusRouterParams,
    *,
    threshold: Optional[float] = None,
    scaler: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> None:
    flat = {}
    for layer, fields in params.items():
        for field, arr in fields.items():
            flat[f"{layer}.{field}"] = np.asarray(arr)
    if threshold is not None:
        flat["__threshold__"] = np.float32(threshold)
    if scaler is not None:
        flat["__scaler_mean__"] = np.asarray(scaler[0], np.float32)
        flat["__scaler_scale__"] = np.asarray(scaler[1], np.float32)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_router_npz(path: str):
    """Returns ``(params, threshold_or_None, scaler_or_None)``."""
    import jax.numpy as jnp

    data = np.load(path)
    params: Dict[str, Dict[str, np.ndarray]] = {}
    threshold = None
    scaler_mean = scaler_scale = None
    for key in data.files:
        if key == "__threshold__":
            threshold = float(data[key])
        elif key == "__scaler_mean__":
            scaler_mean = data[key]
        elif key == "__scaler_scale__":
            scaler_scale = data[key]
        else:
            layer, field = key.split(".")
            params.setdefault(layer, {})[field] = jnp.asarray(data[key])
    scaler = None
    if scaler_mean is not None and scaler_scale is not None:
        scaler = (scaler_mean, scaler_scale)
    return params, threshold, scaler
