"""Multi-host (DCN) deployment: the federation spanning machines.

The reference cannot scale past one node — its ZMQ sockets are
hardcoded to ``localhost`` (``/root/reference/ragroute/config.py:3-10``)
and every corpus process must share the coordinator's filesystem. Here
multi-host is the same SPMD program as single-host: everything in
:mod:`ragroute_tpu.parallel` is ``shard_map`` bodies with
``all_gather``/``psum`` over named mesh axes, so a deployment spanning
hosts only changes *mesh construction* and *how the query batch reaches
every process*. This module provides exactly those two pieces plus the
serving lockstep:

* :func:`initialize` — join the JAX distributed runtime (TPU pods: the
  PJRT plugin handles transport; CPU test rigs: gloo collectives).
* :func:`make_multihost_mesh` — a ``(dp, idx)`` mesh over the *global*
  device list, laid out so the ``idx`` axis (which carries the candidate
  all-gather, the one hot collective in the search step) stays WITHIN
  each host's ICI domain whenever ``idx`` divides the local device
  count; only the collective-free ``dp`` axis crosses DCN.
* :class:`LockstepEngine` — serving: process 0 owns the HTTP front-end
  and broadcasts each padded batch bucket to the follower processes,
  which run :meth:`LockstepEngine.follow`'s step loop. Every process
  then enters the identical jitted search step (SPMD requires all
  processes to join every computation). Shapes stay static because the
  serving batcher already pads to fixed batch buckets.

Gated by ``tests/test_multihost.py``: a real 2-process × 4-device
cluster (subprocess workers, gloo) runs :class:`ShardedSearch` over the
global mesh and must match the single-process engine and the exact-f32
oracle bit-for-bit.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger("ragroute.multihost")


def initialize(
    coordinator: str,
    num_processes: int,
    process_id: int,
    *,
    local_device_count: Optional[int] = None,
) -> None:
    """Join the JAX distributed runtime.

    ``coordinator`` is ``host:port`` of process 0. On CPU platforms the
    cross-process collective implementation is pinned to gloo (the only
    one available); TPU pods ignore it (ICI/DCN transport comes from the
    PJRT plugin). ``local_device_count`` forces
    ``--xla_force_host_platform_device_count`` for CPU test rigs — it
    must be set BEFORE jax initializes its backends, so pass it only
    from a fresh process.
    """
    import os

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{local_device_count}").strip()
    platform = os.environ.get("JAX_PLATFORMS", "")
    if platform in ("cpu", ""):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # pragma: no cover - older jax
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info("joined distributed runtime: process %d/%d, %d local / %d "
             "global devices", process_id, num_processes,
             jax.local_device_count(), jax.device_count())


def make_multihost_mesh(dp: Optional[int] = None,
                        idx: Optional[int] = None) -> Mesh:
    """Build a ``(dp, idx)`` mesh over the global device list.

    Layout rule: devices are ordered process-major by
    ``jax.devices()``, so a row-major ``(dp, idx)`` reshape keeps each
    ``idx`` group contiguous. When ``idx`` divides the per-host device
    count, every ``idx`` group therefore sits within one host — the
    candidate all-gather rides ICI and only the collective-free ``dp``
    axis spans DCN. Defaults: ``idx`` = local device count (one ``idx``
    group per host), ``dp`` = number of processes.
    """
    n = jax.device_count()
    local = jax.local_device_count()
    if idx is None and dp is None:
        idx = local
        dp = n // local
    elif idx is None:
        if n % dp != 0:
            raise ValueError(f"{n} devices not divisible by dp={dp}")
        idx = n // dp
    elif dp is None:
        if n % idx != 0:
            raise ValueError(f"{n} devices not divisible by idx={idx}")
        dp = n // idx
    if dp * idx != n:
        raise ValueError(f"dp*idx = {dp * idx} != {n} global devices")
    if local % idx != 0 and idx % local != 0:
        log.warning(
            "idx=%d does not divide the local device count %d: candidate "
            "all-gathers will cross DCN — prefer idx that keeps each "
            "group within a host", idx, local)
    devs = np.array(jax.devices()).reshape(dp, idx)
    return Mesh(devs, ("dp", "idx"))


_STRATEGIES = ("ragroute", "all", "random", "none")


class LockstepEngine:
    """Broadcast-driven lockstep serving over a multi-process mesh.

    SPMD rule: every process must join every jitted computation, but
    the HTTP front-end (and hence the batch contents) lives only on
    process 0. This adapter wraps a mesh engine (normally
    :class:`~ragroute_tpu.parallel.ShardedSearch` over a multi-host
    mesh) with the SAME host-facing interface, so the whole serving
    stack (``FederationServer`` / ``QueryBatcher`` / warmup) runs
    unmodified on process 0; follower processes run :meth:`follow`.

    Every :meth:`search` on the leader broadcasts, per step (all
    fixed-shape collectives over DCN):

    1. header ``[4] int32`` = ``(bucket_index, strategy_index,
       flags, stop)`` — the bucket index selects the padded batch size
       from the static bucket list so followers allocate matching
       buffers; flags packs ``staged`` / ``fetch_candidates``;
    2. one ``[bucket, dim]`` f32 block per world encoder;

    then every process enters the identical jitted step. Followers
    discard the output — process 0 assembles the HTTP response (its
    coalesced ``device_get`` of the dp-sharded output pytree pulls the
    remote shards through the distributed runtime). The engine's rng
    key stays process-synchronized because every process performs the
    same ``split`` per step from the same seed.
    """

    def __init__(self, engine, buckets, *, leader: bool):
        from jax.experimental import multihost_utils as mhu

        self._mhu = mhu
        self.engine = engine
        self.buckets = tuple(int(b) for b in buckets)
        self.leader = leader
        # fail at CONSTRUCTION, not mid-protocol: a bucket the engine
        # would reject (dp-indivisible batch) must never reach search()
        # — by then the header broadcast is out and followers are parked
        # in DCN collectives with no timeout (full-cluster restart)
        dp = getattr(engine, "dp", 1)
        bad = [b for b in self.buckets if b % dp != 0]
        if bad:
            raise ValueError(
                f"buckets {bad} not divisible by mesh dp={dp}; "
                f"round them up (system.py does this for --mesh)")
        self.world = engine.world
        self.shard_set = engine.shard_set

    def __getattr__(self, name):
        return getattr(self.engine, name)

    # -- process 0 ----------------------------------------------------
    def search(self, query_embs, *, strategy: str = "ragroute",
               staged: bool = False, fetch_candidates: bool = True):
        """Broadcast one batch and run the step (process 0 only)."""
        assert self.leader, "search() must only run on process 0"
        # EVERY validation that can raise must run before the first
        # broadcast: once followers consume the header they enter the
        # encoder receives + the jitted step's DCN collectives, and a
        # leader that bailed mid-protocol leaves them blocked forever
        # (collectives have no timeout) — a full-cluster restart.
        missing = [e for e in self.world.encoders if e not in query_embs]
        if missing:
            raise KeyError(
                f"query_embs missing world encoders {missing}")
        b = query_embs[self.world.encoders[0]].shape[0]
        dims = {s.encoder: s.embed_dim for s in self.world.sources}
        for enc in self.world.encoders:
            shape = np.shape(query_embs[enc])
            if shape != (b, dims[enc]):
                raise ValueError(
                    f"query_embs[{enc!r}] shape {shape} != "
                    f"({b}, {dims[enc]}) — followers allocate exactly "
                    f"that buffer")
        header = np.array([
            self.buckets.index(b), _STRATEGIES.index(strategy),
            int(bool(staged)) | (int(bool(fetch_candidates)) << 1), 0,
        ], np.int32)
        self._mhu.broadcast_one_to_all(header)
        embs = {}
        for enc in self.world.encoders:
            embs[enc] = self._mhu.broadcast_one_to_all(
                np.ascontiguousarray(query_embs[enc], np.float32))
        return self.engine.search(
            embs, strategy=strategy, staged=staged,
            fetch_candidates=fetch_candidates)

    def stop(self):
        """Release follower processes (process 0, at shutdown)."""
        if self.leader:
            self._mhu.broadcast_one_to_all(np.array([0, 0, 0, 1], np.int32))

    # -- processes 1..N-1 ---------------------------------------------
    def follow(self):
        """Step loop for follower processes; returns on the stop flag."""
        assert not self.leader
        dims = {s.encoder: s.embed_dim for s in self.world.sources}
        while True:
            header = self._mhu.broadcast_one_to_all(np.zeros(4, np.int32))
            if int(header[3]):
                return
            b = self.buckets[int(header[0])]
            embs = {}
            for enc in self.world.encoders:
                embs[enc] = self._mhu.broadcast_one_to_all(
                    np.zeros((b, dims[enc]), np.float32))
            self.engine.search(
                embs, strategy=_STRATEGIES[int(header[1])],
                staged=bool(int(header[2]) & 1),
                fetch_candidates=bool(int(header[2]) & 2))
