"""Device mesh construction.

The scaling axes of a federated index-and-query engine (SURVEY §5.7-5.8):

* ``dp``  — query-batch data parallelism (each device handles a slice of
  the incoming batch; the analogue of the reference's ``--parallel`` /
  ``--num-shards`` client striping, ``run_benchmark_parallel.py:104``).
* ``idx`` — index parallelism: the document axis of every corpus shard is
  split across devices (the reference's one-process-per-corpus federation
  generalized: a corpus larger than one chip's HBM spans chips; per-device
  local top-k then an all-gather merge over ICI).

Multi-host (DCN): everything in :mod:`ragroute_tpu.parallel` is plain
SPMD — ``shard_map`` bodies with ``all_gather``/``psum`` over named
axes — so a multi-host deployment only changes mesh construction and
batch feeding. Both live in :mod:`ragroute_tpu.parallel.multihost`
(initialize the distributed runtime, global mesh with ``idx`` inside
each host's ICI domain, lockstep broadcast serving) and are GATED by
``tests/test_multihost.py`` on a real 2-process gloo cluster. The
reference cannot do any of this — its ZMQ sockets are hardcoded to
localhost (``config.py:3-10``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: int = 1,
    idx: Optional[int] = None,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(dp, idx)`` mesh over the available devices.

    ``idx`` defaults to ``n_devices // dp``. Axis names are fixed
    ("dp", "idx") and used by :mod:`ragroute_tpu.parallel.sharded`.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if idx is None:
        if n % dp != 0:
            raise ValueError(f"{n} devices not divisible by dp={dp}")
        idx = n // dp
    if dp * idx != n:
        raise ValueError(f"dp*idx = {dp * idx} != {n} devices")
    arr = np.array(devs).reshape(dp, idx)
    return Mesh(arr, ("dp", "idx"))
