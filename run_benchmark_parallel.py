"""Striped parallel benchmark client (reference run_benchmark_parallel.py).

The striping lives in :mod:`run_benchmark` (``--shard``/``--num-shards``,
matching ``run_benchmark_parallel.py:104``'s
``question_items[shard::num_shards]``); this entry point exists for CLI
parity with the reference.
"""

from run_benchmark import main

if __name__ == "__main__":
    main()
