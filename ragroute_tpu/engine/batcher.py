"""Micro-batching dispatcher: many concurrent HTTP queries → one device step.

The reference threads every query one-at-a-time through an asyncio queue in
the router process (``router.py:207-218``, 0.1 s idle poll) and scatters it
over ZMQ. On TPU the win comes from batching: the dispatcher collects
concurrent queries for at most ``window_ms`` (or until the largest batch
bucket fills), pads the batch to a fixed bucket size so XLA never
recompiles, runs ONE engine step, and demultiplexes per-query futures —
the device-side replacement for the reference's per-query future registry
(``http_server.py:136-146``).
"""

from __future__ import annotations

import asyncio
import dataclasses
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ragroute_tpu.config import BATCH_BUCKETS, BATCH_WINDOW_MS, MAX_QUEUE_SIZE
from ragroute_tpu.engine.engine import FederatedSearchEngine, SearchOutput


def fetch_candidates_policy(world) -> bool:
    """Whether serving fetches the per-shard candidate SCORE matrix.

    Only feb4rag reads per-source scores host-side (qrels-oracle
    rerank); the score-merged worlds skip the [B, N, k] f32 device->host
    transfer (the profile's top single host cost).
    ``RAGROUTE_FETCH_CANDIDATES=1`` forces the full fetch (A/B knob) —
    shared by the batcher and the server's warmup timing so the
    ``device_step_ms`` baseline measures the same path being served.
    """
    return (world.name == "feb4rag"
            or os.environ.get("RAGROUTE_FETCH_CANDIDATES") == "1")


def pack_query_embs(engine, rows, denses, padded):
    """Pack one device batch from per-query (row, dense) pairs.

    ``rows[i]`` is a query-table row index or None; ``denses[i]`` is a
    dense ``{encoder: [d]}`` dict or None (exactly one of the two per
    query). All-rows batches ship as ``{"__rows__": [padded] int32}``
    (gathered on device; pad entries gather table row 0 and are dropped
    at demux); any dense query makes the whole batch fall back to dense
    ``[padded, d]`` stacking (pad rows zero). Shared by the asyncio
    batcher and the native front-end so pad/mixed semantics can't drift
    between the two serving paths.
    """
    world = engine.world
    n = len(rows)
    if n and all(r is not None for r in rows):
        arr = np.zeros(padded, dtype=np.int32)
        arr[:n] = rows
        return {"__rows__": arr}
    dense = [engine.materialize_rows(r) if d is None else d
             for r, d in zip(rows, denses)]
    embs: Dict[str, np.ndarray] = {}
    for enc in world.encoders:
        dim = next(s.embed_dim for s in world.sources if s.encoder == enc)
        arr = np.zeros((padded, dim), dtype=np.float32)
        for i, qe in enumerate(dense):
            arr[i] = qe[enc]
        embs[enc] = arr
    return embs


@dataclasses.dataclass
class QueryResult:
    """One query's slice of a batched SearchOutput."""

    probs: np.ndarray          # [N]
    mask: np.ndarray           # [N]
    shard_scores: Optional[np.ndarray]  # [N, k]; None on the serving
    #                            path of score-merged worlds
    #                            (fetch_candidates_policy)
    shard_ids: Optional[np.ndarray]  # [N, k]; None when the engine
    #                            computed msg_base on device instead
    merged_score: np.ndarray   # [k]
    merged_shard: np.ndarray   # [k]
    merged_local: np.ndarray   # [k]
    merged_valid: int
    selection_time: float      # per-batch stage times (shared)
    doc_select_time: float
    batch_size: int
    msg_base: Optional[np.ndarray] = None  # [N] device-computed response
    #                            sizes minus the query-id length


class QueryBatcher:
    """Collects queries into padded device batches.

    The routing strategy is fixed per batcher instance, matching the
    reference where ``--routing`` is a server-level argument
    (``main.py:15``).
    """

    def __init__(
        self,
        engine: FederatedSearchEngine,
        *,
        strategy: str = "ragroute",
        window_ms: float = BATCH_WINDOW_MS,
        buckets: Sequence[int] = BATCH_BUCKETS,
        max_queue: Optional[int] = None,
        staged: Optional[bool] = None,
    ):
        self.engine = engine
        self.strategy = strategy
        self.window_s = window_ms / 1e3
        self.buckets = tuple(sorted(buckets))
        # Default: ONE fused device dispatch per batch (routing + scoring
        # in a single jitted step). Staged timing costs a second dispatch
        # per batch — ~27 ms each through the remote-TPU tunnel — so it is
        # opt-in for parity/measurement runs (RAGROUTE_STAGED_TIMING=1 or
        # staged=True); the warmup-measured per-bucket device times in
        # GET /stats cover the per-stage observability instead.
        if staged is None:
            staged = os.environ.get("RAGROUTE_STAGED_TIMING", "0") == "1"
        self.staged = staged
        # inbox bound: at least the reference's router-queue bound
        # (MAX_QUEUE_SIZE=100, config.py:13), but never smaller than two
        # full device batches — a 100-item bound would cap batch formation
        # below the largest bucket and throttle throughput.
        if max_queue is None:
            max_queue = max(MAX_QUEUE_SIZE, 2 * self.buckets[-1])
        self.queue: asyncio.Queue = asyncio.Queue(maxsize=max_queue)
        self._task: Optional[asyncio.Task] = None
        self._running = False

    # -- lifecycle -------------------------------------------------------

    async def start(self) -> None:
        self._running = True
        self._task = asyncio.create_task(self._worker())

    async def stop(self) -> None:
        self._running = False
        if self._task:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None
        # Fail anything still queued so handlers awaiting submit() see a
        # clean error instead of hanging until aiohttp force-closes their
        # connections (the worker is gone; nobody will resolve them).
        while True:
            try:
                _, fut = self.queue.get_nowait()
            except asyncio.QueueEmpty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("batcher stopped"))

    # -- submission ------------------------------------------------------

    async def submit(self, query_embs: Dict[str, np.ndarray]) -> QueryResult:
        """Submit one query's per-encoder embeddings; await its result."""
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        await self.queue.put((query_embs, fut))
        return await fut

    # -- worker ----------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    async def _collect(self, batch: List[Tuple[dict, asyncio.Future]]) -> None:
        """Fill ``batch`` in place (so a cancellation mid-collect leaves the
        already-popped items visible to the caller's cleanup)."""
        batch.append(await self.queue.get())
        deadline = time.monotonic() + self.window_s
        max_bucket = self.buckets[-1]
        while len(batch) < max_bucket:
            # Drain whatever is already queued without touching the event
            # loop's timer heap: under load nearly every item arrives via
            # get_nowait, and a wait_for timer is created only when the
            # queue momentarily runs dry (one timer per lull, not per
            # query — per-item wait_for was a measured host hot path:
            # ~3 timer-heap ops per request across submit+collect).
            try:
                while len(batch) < max_bucket:
                    batch.append(self.queue.get_nowait())
                break
            except asyncio.QueueEmpty:
                pass
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = await asyncio.wait_for(
                    self.queue.get(), timeout=remaining)
                batch.append(item)
            except asyncio.TimeoutError:
                break

    def _run_batch(self, batch) -> Tuple[SearchOutput, int]:
        rows = [qe.get("__row__") for qe, _ in batch]
        denses = [None if "__row__" in qe else qe for qe, _ in batch]
        embs = pack_query_embs(
            self.engine, rows, denses, self._bucket(len(batch)))
        out = self.engine.search(
            embs, strategy=self.strategy, staged=self.staged,
            fetch_candidates=fetch_candidates_policy(self.engine.world))
        return out, len(batch)

    def _demux(self, out: SearchOutput, batch, n: int) -> None:
        """Fan one SearchOutput back out to the batch's futures."""
        for i, (_, fut) in enumerate(batch):
            if fut.done():
                continue
            fut.set_result(QueryResult(
                probs=out.probs[i],
                mask=out.mask[i],
                shard_scores=(None if out.shard_scores is None
                              else out.shard_scores[i]),
                shard_ids=(None if out.shard_ids is None
                           else out.shard_ids[i]),
                merged_score=out.merged_score[i],
                merged_shard=out.merged_shard[i],
                merged_local=out.merged_local[i],
                merged_valid=int(out.merged_valid[i]),
                selection_time=out.selection_time,
                doc_select_time=out.doc_select_time,
                batch_size=n,
                msg_base=(None if out.msg_base is None
                          else out.msg_base[i]),
            ))

    async def _worker(self) -> None:
        if getattr(self.engine, "supports_pipelined_dispatch", False):
            await self._worker_pipelined()
            return
        loop = asyncio.get_running_loop()
        batch: List[Tuple[dict, asyncio.Future]] = []
        try:
            while self._running:
                batch = []
                await self._collect(batch)
                try:
                    # engine.search blocks on the device; keep the event
                    # loop live
                    out, n = await loop.run_in_executor(
                        None, self._run_batch, batch)
                    # Demux INSIDE the try: a slicing failure here (e.g. a
                    # SearchOutput shorter than the batch after an engine
                    # misconfiguration) must fail the remaining waiters,
                    # not kill the worker with futures stranded.
                    self._demux(out, batch, n)
                except Exception as e:  # deliver failures to every waiter
                    for _, fut in batch:
                        if not fut.done():
                            fut.set_exception(e)
                batch = []
        finally:
            # Cancellation (stop()) can land mid-_collect with items
            # already popped off the queue — fail them so their handlers
            # don't hang until the HTTP query timeout.
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(RuntimeError("batcher stopped"))

    # -- pipelined worker (hostrefine capacity tier) ---------------------

    def _dispatch_batch(self, batch):
        rows = [qe.get("__row__") for qe, _ in batch]
        denses = [None if "__row__" in qe else qe for qe, _ in batch]
        embs = pack_query_embs(
            self.engine, rows, denses, self._bucket(len(batch)))
        return self.engine.dispatch_hostrefine(
            embs, strategy=self.strategy,
            fetch_candidates=fetch_candidates_policy(self.engine.world))

    async def _worker_pipelined(self) -> None:
        """Two-phase serving loop for engines with a dispatch/complete
        split (the hostrefine capacity tier): batch t's host-side exact
        rescore runs while batch t+1's device step executes, so the
        steady-state rate is bounded by max(device, host) instead of
        their sum (measured +40% at the 25M-doc point, BENCHMARKS.md).
        At most one completion is in flight; light load degenerates to
        the sequential loop (dispatch -> complete immediately)."""
        loop = asyncio.get_running_loop()
        batch: List[Tuple[dict, asyncio.Future]] = []
        prev: Optional[asyncio.Task] = None

        async def complete(handle, cbatch, n):
            try:
                out = await loop.run_in_executor(
                    None, self.engine.complete_hostrefine, handle)
                self._demux(out, cbatch, n)
            except Exception as e:
                for _, fut in cbatch:
                    if not fut.done():
                        fut.set_exception(e)

        try:
            while self._running:
                batch = []
                await self._collect(batch)
                try:
                    handle = await loop.run_in_executor(
                        None, self._dispatch_batch, batch)
                except Exception as e:
                    for _, fut in batch:
                        if not fut.done():
                            fut.set_exception(e)
                    batch = []
                    continue
                if prev is not None:
                    await prev
                prev = loop.create_task(
                    complete(handle, batch, len(batch)))
                batch = []
        finally:
            if prev is not None:
                await prev
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(RuntimeError("batcher stopped"))
