"""Add a clustered coarse layout to a cached hostrefine bench world.

The 24M+-doc hostrefine world takes a long single-core host build
(block-encode + quantize of every row), so ``bench.py`` caches the
result. This script upgrades such a cache IN PLACE for the probed
coarse scan (``ops/grouped_topk.py``): it k-means-clusters each cached
flat coarse slab and writes the ``cl_*`` arrays next to it, without
touching the host rows or re-encoding anything. Idempotent; ~minutes
per source (device k-means over the dequantized coarse rows).

Usage:
    python scripts/cluster_cached_world.py [cache_dir]
(default: every streamed-hostrefine-* dir under the bench world cache)
"""

import os
import sys
import time

import numpy as np


def upgrade(cache_dir: str, force: bool = False) -> None:
    from ragroute_tpu.ops.grouped_topk import cluster_coarse_slab

    for fn in sorted(os.listdir(cache_dir)):
        if not fn.endswith(".npz"):
            continue
        path = os.path.join(cache_dir, fn)
        with np.load(path) as z:
            if "coarse_docs" not in z:
                print(f"{fn}: no coarse slab; skipped")
                continue
            if "cl_docs" in z and not force:
                print(f"{fn}: already clustered; skipped")
                continue
            d = {k: z[k] for k in z.files}
        n = int(d["meta"][0])  # real rows (slab is padded)
        t0 = time.time()
        cl = cluster_coarse_slab(
            d["coarse_docs"][:n], d["coarse_scale"][:n],
            d["coarse_bias"][:n], 0)
        for f in ("centroids", "cbias", "docs", "bias", "scale", "perm"):
            d[f"cl_{f}"] = np.asarray(getattr(cl, f))
        tmp = path + ".tmp.npz"
        np.savez(tmp, **d)
        os.replace(tmp, path)
        print(f"{fn}: clustered C={cl.n_clusters} S={cl.capacity} "
              f"({n} rows) in {time.time() - t0:.0f}s")


def main() -> None:
    if len(sys.argv) > 1:
        dirs = sys.argv[1:]
    else:
        root = os.environ.get(
            "RAGROUTE_BENCH_WORLD_CACHE_DIR",
            os.path.expanduser("~/.cache/ragroute_bench_world"))
        dirs = [os.path.join(root, d) for d in sorted(os.listdir(root))
                if d.startswith("streamed-hostrefine-")]
    for cd in dirs:
        print(f"== {cd}")
        upgrade(cd)


if __name__ == "__main__":
    main()
