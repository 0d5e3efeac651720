"""Generate and persist synthetic world data under the data root.

Replaces the reference's unavailable NFS corpora (``config.py:16-24``) with
regenerable ground-truth data so the full system (serve + benchmark +
router training) runs anywhere:

    python scripts/make_synthetic_data.py --dataset medrag \
        --docs-per-source 100000 --num-queries 512
    python main.py --dataset medrag --routing all --disable-llm
    python run_benchmark.py --benchmark SYNTHETIC --routing all \
        --benchmark-path $RAGROUTE_DATA/medrag/benchmark
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ragroute_tpu.config import WORLDS, data_root
from ragroute_tpu.index.synthetic import make_synthetic_world, save_world


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="medrag",
                        choices=sorted(WORLDS))
    parser.add_argument("--docs-per-source", type=int, default=20000)
    parser.add_argument("--num-queries", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data-root", type=str, default=None)
    parser.add_argument("--subclusters", type=int, default=1,
                        help="within-source topic clusters (>1 makes the "
                             "corpus topically structured like real data; "
                             "used to evaluate the IVF approximate mode)")
    args = parser.parse_args(argv)

    root = args.data_root or data_root()
    print(f"Generating synthetic {args.dataset} world "
          f"({args.docs_per_source} docs/source, {args.num_queries} queries)")
    syn = make_synthetic_world(
        args.dataset,
        docs_per_source=args.docs_per_source,
        num_queries=args.num_queries,
        seed=args.seed,
        subclusters=args.subclusters,
    )
    out = save_world(syn, root)
    print(f"Saved to {out}")


if __name__ == "__main__":
    main()
