"""Train a corpus router for a world and save it to the data root.

The TPU-native equivalent of the reference's
``scripts/train/train_{medrag,feb4rag,mmlu}_router.py``: one script for all
worlds, serve-identical features, contribution labels computed by exact
brute force over the indexed shards, and a checkpoint the serving system
picks up automatically (``<root>/<world>/router.npz`` with scaler +
ROC-optimal threshold baked in).

    python scripts/make_synthetic_data.py --dataset medrag
    python scripts/train_router.py --dataset medrag
    python main.py --dataset medrag --routing ragroute --disable-llm
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="medrag")
    parser.add_argument("--data-root", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=None,
                        help="override the reference's 150 epochs")
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--pos-weight", type=float, default=None,
                        help="default: 1.0 medrag/feb4rag, 5.0 wikipedia "
                             "(train_mmlu_router.py 5x pos_weight)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from ragroute_tpu.config import data_root, get_world
    from ragroute_tpu.router.features import RouterBank, build_features
    from ragroute_tpu.router.torch_import import save_router_npz
    from ragroute_tpu.train.train_router import NUM_EPOCHS, train_router

    root = args.data_root or data_root()
    world = get_world(args.dataset)
    wroot = os.path.join(root, world.name)

    # load artifacts: query embeddings, centroids, ground-truth labels
    qdir = os.path.join(wroot, "queries")
    with open(os.path.join(qdir, "encoders.json")) as f:
        encoders = json.load(f)
    query_embs = {
        enc: np.load(os.path.join(qdir, f"enc_{i}.npy"))
        for i, enc in enumerate(encoders)
    }
    with open(os.path.join(wroot, "centroids.json")) as f:
        centroids = {k: np.asarray(v, np.float32)
                     for k, v in json.load(f).items()}
    labels_path = os.path.join(wroot, "relevant.npy")
    if os.path.exists(labels_path):
        labels = np.load(labels_path)
    else:
        raise FileNotFoundError(
            f"{labels_path} missing; regenerate with make_synthetic_data.py "
            "or compute contribution labels from real retrieval logs")

    bank = RouterBank.create(world, centroids)
    feats = np.asarray(build_features(
        world, bank, {e: jnp.asarray(v) for e, v in query_embs.items()}))
    x = feats.reshape(-1, world.router_input_dim)
    y = labels.reshape(-1).astype(np.float32)
    print(f"training router: {x.shape[0]} examples, dim {x.shape[1]}, "
          f"positives {y.mean():.3f}")

    pos_weight = args.pos_weight
    if pos_weight is None:
        pos_weight = 5.0 if world.name == "wikipedia" else 1.0

    result = train_router(
        x, y,
        split_path=os.path.join(wroot, "split.json"),
        use_scaler=world.uses_scaler,
        pos_weight=pos_weight,
        num_epochs=args.epochs or NUM_EPOCHS,
        batch_size=args.batch_size,
        seed=args.seed,
        verbose=True,
    )
    print("validation metrics:", json.dumps(result.metrics, indent=2))

    out = os.path.join(wroot, "router.npz")
    save_router_npz(out, result.params, threshold=result.threshold,
                    scaler=result.scaler)
    print(f"saved {out} (threshold={result.threshold:.4f})")


if __name__ == "__main__":
    main()
