"""Corpus-router training in JAX/optax.

Recipe parity with the reference training scripts
(``scripts/train/train_medrag_router.py:285-506`` and the feb4rag/mmlu
variants, SURVEY §2/§3.4):

* features: serve-identical ``[pad(q) ‖ pad(centroid) ‖ one-hot]`` built by
  the same :func:`ragroute_tpu.router.features.build_features` used at
  inference (the reference trains and serves through two separate code
  paths; here they are one);
* labels: a source is positive iff it contributes ≥1 doc to the global
  top-k (``*_relevant_top_32.json`` semantics);
* StandardScaler fit on train (medrag/wikipedia, ``:350-354``);
* BCE-with-logits with optional ``pos_weight`` (feb4rag ``:123-124``,
  mmlu 5×, ``train_mmlu_router.py``);
* Adam + global-norm grad clip 1.0 (``:394-468``);
* CyclicLR(1e-3↔5e-3, triangular2) until epoch 115, then StepLR(50, 0.05)
  (``:394-414``), 150 epochs;
* best-validation-accuracy checkpointing;
* ROC threshold search argmax(tpr − fpr) on validation (``:157-184`` —
  the source of the serve-time 0.4924).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ragroute_tpu.router.mlp import (
    CorpusRouterParams,
    init_router_params,
    router_apply_train,
    router_forward,
)

# reference hyperparameters (train_medrag_router.py:394-414)
BASE_LR = 1e-3
MAX_LR = 5e-3
CYCLE_EPOCHS = 10           # CyclicLR step_size ~ a few epochs per half-cycle
SWITCH_EPOCH = 115
STEP_LR_EVERY = 50
STEP_LR_GAMMA = 0.05
NUM_EPOCHS = 150
GRAD_CLIP = 1.0


def cyclic_then_step_schedule(steps_per_epoch: int) -> optax.Schedule:
    """CyclicLR triangular2 (1e-3↔5e-3) until epoch 115, then StepLR
    decaying by 0.05 every 50 epochs from the base LR."""
    half = max(1, (CYCLE_EPOCHS * steps_per_epoch) // 2)
    switch_step = SWITCH_EPOCH * steps_per_epoch

    def schedule(step):
        step = jnp.asarray(step)
        # triangular2: amplitude halves every full cycle
        cycle = jnp.floor(1 + step / (2 * half))
        x = jnp.abs(step / half - 2 * cycle + 1)
        amp = (MAX_LR - BASE_LR) / jnp.power(2.0, cycle - 1)
        cyclic = BASE_LR + amp * jnp.maximum(0.0, 1 - x)
        # StepLR after the switch
        epochs_after = (step - switch_step) / steps_per_epoch
        n_decays = jnp.floor(epochs_after / STEP_LR_EVERY) + 1
        stepped = BASE_LR * jnp.power(STEP_LR_GAMMA, n_decays)
        return jnp.where(step < switch_step, cyclic, stepped)

    return schedule


def make_optimizer(steps_per_epoch: int) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(GRAD_CLIP),
        optax.adam(cyclic_then_step_schedule(steps_per_epoch)),
    )


def bce_with_logits(logits, labels, pos_weight: float = 1.0):
    """torch BCEWithLogitsLoss with pos_weight parity."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    return loss.mean()


def make_train_step(tx: optax.GradientTransformation, pos_weight: float = 1.0):
    """Jitted SGD step: works single-chip and under dp sharding (grads are
    mean-reduced over the batch; XLA inserts the psum when the batch is
    sharded over a mesh axis)."""

    @jax.jit
    def step(params, opt_state, x, y, rng):
        def loss_fn(p):
            logits = router_apply_train(p, x, rng)
            return bce_with_logits(logits, y, pos_weight)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        preds = router_forward(params, x) > 0.0
        acc = jnp.mean((preds == (y > 0.5)).astype(jnp.float32))
        return params, opt_state, loss, acc

    return step


@jax.jit
def _eval_logits(params, x):
    return router_forward(params, x)


def find_optimal_threshold(
    logits: np.ndarray, labels: np.ndarray
) -> float:
    """ROC argmax(tpr − fpr) threshold on sigmoid probabilities
    (reference train_medrag_router.py:157-184)."""
    probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float64)))
    labels = np.asarray(labels).astype(bool)
    order = np.argsort(-probs)
    p_sorted = probs[order]
    l_sorted = labels[order]
    tp = np.cumsum(l_sorted)
    fp = np.cumsum(~l_sorted)
    n_pos = max(int(labels.sum()), 1)
    n_neg = max(int((~labels).sum()), 1)
    tpr = tp / n_pos
    fpr = fp / n_neg
    j = np.argmax(tpr - fpr)
    return float(p_sorted[j])


def fit_scaler(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """sklearn StandardScaler parity: biased std, zeros-variance guard."""
    mean = x.mean(axis=0)
    scale = x.std(axis=0)
    scale = np.where(scale == 0.0, 1.0, scale)
    return mean.astype(np.float32), scale.astype(np.float32)


@dataclasses.dataclass
class TrainResult:
    params: CorpusRouterParams
    threshold: float
    scaler: Optional[Tuple[np.ndarray, np.ndarray]]
    metrics: Dict[str, float]


def classification_metrics(probs, labels, threshold=0.5) -> Dict[str, float]:
    """Accuracy / precision / recall / F1 / AUC (reference eval block,
    train_medrag_router.py:187-236)."""
    labels = np.asarray(labels).astype(bool)
    preds = np.asarray(probs) > threshold
    tp = int((preds & labels).sum())
    fp = int((preds & ~labels).sum())
    fn = int((~preds & labels).sum())
    tn = int((~preds & ~labels).sum())
    acc = (tp + tn) / max(len(labels), 1)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    # AUC via rank statistic
    order = np.argsort(np.asarray(probs))
    ranks = np.empty(len(order))
    ranks[order] = np.arange(1, len(order) + 1)
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    if n_pos and n_neg:
        auc = (ranks[labels].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    else:
        auc = float("nan")
    return {"accuracy": acc, "precision": prec, "recall": rec,
            "f1": f1, "auc": float(auc),
            "tp": tp, "fp": fp, "fn": fn, "tn": tn}


def train_router(
    features: np.ndarray,          # [M, D_in] raw (unscaled) features
    labels: np.ndarray,            # [M] 0/1
    *,
    use_scaler: bool = True,
    pos_weight: float = 1.0,
    num_epochs: int = NUM_EPOCHS,
    batch_size: int = 256,
    val_fraction: float = 0.2,
    seed: int = 0,
    verbose: bool = False,
    split_path: Optional[str] = None,
) -> TrainResult:
    """Full training loop with best-val checkpointing + threshold search.

    ``split_path``: persist/reuse the train/val split as JSON, mirroring the
    reference's frozen splits (``train_test_split_per_benchmark.json`` /
    ``split.json``, train_medrag_router.py:296-317) so retraining runs are
    comparable.
    """
    m, d_in = features.shape
    if split_path and os.path.exists(split_path):
        with open(split_path) as f:
            saved = json.load(f)
        val_idx = np.asarray(saved["val"], dtype=np.int64)
        train_idx = np.asarray(saved["train"], dtype=np.int64)
        if len(val_idx) + len(train_idx) != m:
            raise ValueError(
                f"persisted split at {split_path} covers "
                f"{len(val_idx) + len(train_idx)} examples, dataset has {m}")
    else:
        rng = np.random.default_rng(seed)
        perm = rng.permutation(m)
        n_val = max(1, int(m * val_fraction))
        val_idx, train_idx = perm[:n_val], perm[n_val:]
        if split_path:
            os.makedirs(os.path.dirname(os.path.abspath(split_path)),
                        exist_ok=True)
            with open(split_path, "w") as f:
                json.dump({"train": train_idx.tolist(),
                           "val": val_idx.tolist()}, f)

    x_train_raw = features[train_idx]
    scaler = fit_scaler(x_train_raw) if use_scaler else None
    if scaler is not None:
        mean, scale = scaler
        xf = (features - mean) / scale
    else:
        xf = features
    x_train = jnp.asarray(xf[train_idx], jnp.float32)
    y_train = jnp.asarray(labels[train_idx], jnp.float32)
    x_val = jnp.asarray(xf[val_idx], jnp.float32)
    y_val = np.asarray(labels[val_idx]) > 0.5

    steps_per_epoch = max(1, len(train_idx) // batch_size)
    tx = make_optimizer(steps_per_epoch)
    key = jax.random.key(seed)
    key, pkey = jax.random.split(key)
    params = init_router_params(pkey, d_in)
    opt_state = tx.init(params)
    step_fn = make_train_step(tx, pos_weight)

    best_val_acc = -1.0
    best_params = params
    n_train = len(train_idx)

    for epoch in range(num_epochs):
        key, ekey = jax.random.split(key)
        order = np.asarray(
            jax.random.permutation(ekey, n_train))
        for s in range(steps_per_epoch):
            sl = order[s * batch_size:(s + 1) * batch_size]
            key, skey = jax.random.split(key)
            params, opt_state, loss, _ = step_fn(
                params, opt_state, x_train[sl], y_train[sl], skey)
        val_logits = np.asarray(_eval_logits(params, x_val))
        val_acc = float(((val_logits > 0.0) == y_val).mean())
        if val_acc > best_val_acc:
            best_val_acc = val_acc
            best_params = jax.tree.map(lambda a: a.copy(), params)
        if verbose and (epoch % 10 == 0 or epoch == num_epochs - 1):
            print(f"epoch {epoch}: loss={float(loss):.4f} "
                  f"val_acc={val_acc:.4f} best={best_val_acc:.4f}")

    val_logits = np.asarray(_eval_logits(best_params, x_val))
    threshold = find_optimal_threshold(val_logits, y_val)
    probs = 1.0 / (1.0 + np.exp(-val_logits))
    metrics = classification_metrics(probs, y_val, threshold)
    metrics["best_val_acc"] = best_val_acc
    return TrainResult(best_params, threshold, scaler, metrics)
