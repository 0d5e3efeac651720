"""HTTP federation server: the reference protocol over the TPU engine.

Keeps the reference's external contract exactly (``http_server.py:105-166``):
``GET/POST /query`` with ``q`` (query text), ``choices`` (URL-encoded JSON),
``qid``; JSON response ``{query_id, query, answer, metadata}`` with the
same metadata schema (data_sources, embedding/selection/doc_select/
generate/e2e times, docs_tokens, llm, top_docs, data_sources_stats with
per-source duration and message_size) so the reference's benchmark clients
and R plots work unchanged.

What changed underneath: instead of ZMQ scatter/gather across a router
process and N data-source processes, queries are micro-batched onto one
jitted device step (:mod:`ragroute_tpu.engine.batcher`); per-source
durations are the (amortized) device scoring time, and message sizes are
the serialized size of the equivalent per-source response.
"""

from __future__ import annotations

import asyncio
import functools
import json
import logging
import os
import time
import uuid
from typing import Dict, List, Optional

import numpy as np
from aiohttp import web

from ragroute_tpu.config import (
    HTTP_HOST,
    HTTP_PORT,
    LLM_DELAY,
    QUERY_TIMEOUT_S,
    WorldConfig,
)
from ragroute_tpu.engine.batcher import QueryBatcher, QueryResult
from ragroute_tpu.engine.engine import FederatedSearchEngine
from ragroute_tpu.engine.llm import LLMClient
from ragroute_tpu.engine.prompts import (
    generate_llm_message,
    generate_llm_message_wikipedia,
)
from ragroute_tpu.engine.metrics import ServerMetrics
from ragroute_tpu.engine.rerank import rerank_feb4rag

logger = logging.getLogger("server")

# compact separators: responses embed k full doc payloads, so the default
# ", "/": " padding is measurable bytes+CPU at high load
_dumps = functools.partial(json.dumps, separators=(",", ":"))


def _device_memory_stats() -> Optional[dict]:
    """Per-device HBM stats (bytes in use / limit / peak) where the
    backend exposes them; None on backends without memory_stats (CPU)."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            st = d.memory_stats()
        except (RuntimeError, AttributeError, jax.errors.JaxRuntimeError):
            st = None
        if st:
            out[str(d)] = {k: st[k] for k in
                           ("bytes_in_use", "bytes_limit", "peak_bytes_in_use")
                           if k in st}
    return out or None


class FederationServer:
    """aiohttp front-end over the batched TPU engine."""

    def __init__(
        self,
        engine: FederatedSearchEngine,
        *,
        strategy: str = "ragroute",
        embedding_provider=None,
        doc_store=None,
        llm: Optional[LLMClient] = None,
        model: str = "llama3.1-8B-instruct",
        disable_llm: bool = False,
        simulate: bool = False,
        relevance_data: Optional[Dict] = None,
        batcher: Optional[QueryBatcher] = None,
        host: str = HTTP_HOST,
        port: int = HTTP_PORT,
        warmup: bool = True,
        reuse_port: bool = False,
        data_root: Optional[str] = None,
    ):
        self.engine = engine
        self.world: WorldConfig = engine.world
        self.strategy = strategy
        self.provider = embedding_provider
        # Live encoders (--embedder zoo) micro-batch through the device
        # like the search step does: concurrent arrivals share ONE padded
        # forward per encoder (EmbeddingBatcher) instead of each paying a
        # full forward alone in the executor.
        self.embed_batcher = None
        if (getattr(embedding_provider, "blocking", False)
                and hasattr(embedding_provider, "embed_many")):
            from ragroute_tpu.engine.embedding import EmbeddingBatcher

            self.embed_batcher = EmbeddingBatcher(embedding_provider)
        self.doc_store = doc_store
        self.llm = llm or LLMClient("echo", delay_s=LLM_DELAY if simulate else 0.0)
        self.model = model
        self.disable_llm = disable_llm
        self.simulate = simulate
        self.relevance_data = relevance_data or {}
        self.batcher = batcher or QueryBatcher(engine, strategy=strategy)
        # Device-resident query table: a table-backed provider (pre-
        # computed embeddings, the benchmark configuration) uploads its
        # whole table to the device ONCE; known qids then cross the
        # host->device boundary as int32 row indices instead of [B, d]
        # f32 vectors (engine gathers on device). Unknown qids keep the
        # dense fallback path per batch.
        self._rows_wired = False
        self._rows_provider = None
        if (os.environ.get("RAGROUTE_QUERY_TABLE", "1") != "0"
                and hasattr(self.provider, "row_of")
                and hasattr(self.provider, "tables")
                and hasattr(engine, "set_query_table")
                and getattr(self.provider, "table", None)):
            engine.set_query_table(self.provider.tables())
            self._rows_wired = True
            # the device table mirrors THIS provider; a later provider
            # swap must not serve row indices into the stale table
            self._rows_provider = self.provider
        self.host = host
        self.port = port
        self.reuse_port = reuse_port
        self.data_root = data_root
        self.app = web.Application()
        self.app.add_routes([
            web.get("/query", self.handle_query),
            web.post("/query", self.handle_query),
            web.post("/query/batch", self.handle_query_batch),
            web.post("/docs/add", self.handle_docs_add),
            web.post("/docs/delete", self.handle_docs_delete),
            web.post("/admin/snapshot", self.handle_snapshot),
            web.post("/admin/profile", self.handle_profile),
            web.get("/healthz", self.handle_health),
            web.get("/stats", self.handle_stats),
        ])
        if getattr(engine.shard_set, "mutable", False):
            # live updates need a writable payload overlay so docs added
            # at serve time resolve to their payloads (and recycled slots
            # never leak the base corpus's old payload)
            from ragroute_tpu.index.store import OverlayDocStore

            self.doc_store = doc_store = OverlayDocStore(doc_store)
        self.warmup = warmup
        self._runner: Optional[web.AppRunner] = None
        self._site: Optional[web.TCPSite] = None
        self.metrics = ServerMetrics()
        self._profiling = False
        self._size_cache: Dict[int, tuple] = {}
        # parsed-doc LRU: hot docs repeat across queries; parsing the same
        # jsonl line per query was a measured host hot path
        if doc_store is not None:
            self._get_doc = functools.lru_cache(maxsize=65536)(
                doc_store.get)
        else:
            self._get_doc = None
        # raw response splicing: with the LLM disabled nothing host-side
        # reads the parsed payloads (feb4rag's qrels rerank excepted), so
        # the k on-disk jsonl doc lines can be spliced VERBATIM into the
        # response body — no json.loads per cache-miss doc and no
        # iterencode over payload content, which the host profile showed
        # dominating the loaded response path (BENCHMARKS.md serving
        # notes). The metadata carries a 128-bit random token where
        # top_docs belongs; the encoder splits the serialized body on the
        # token and interleaves the raw fragments (one pass). Request
        # text cannot collide with the token except by guessing it; a
        # mismatch falls back to the parsed encoding.
        import secrets

        self._raw_token = "rawdocs" + secrets.token_hex(16)
        self._get_raw = None
        _graw = (getattr(doc_store, "get_raw", None)
                 if doc_store is not None else None)
        if (_graw is not None and disable_llm
                and self.world.name != "feb4rag"
                and os.environ.get("RAGROUTE_RAW_DOCS", "1") != "0"):
            @functools.lru_cache(maxsize=65536)
            def _raw_line(source, local):
                r = _graw(source, local)
                if isinstance(r, (bytes, bytearray)):
                    r = r.decode("utf-8", "replace")
                return r.strip() if r else None

            self._get_raw = _raw_line

        # Device-side response sizing: push the per-source message-size
        # estimate into the jitted step so the serving path fetches a
        # [B, N] i32 msg_base instead of the [B, N, k] shard_ids it fed
        # the host estimator (~590 KB vs 18 KB per 512-batch). Immutable
        # score-merged worlds only — live add/delete changes doc lengths
        # (host tables stay authoritative there), and feb4rag fetches
        # full candidates anyway. Enabled before warmup so the compiled
        # buckets include the msg_base computation. Default follows the
        # backend: ON for accelerators, where the fetch crosses a real
        # wire (v5e tunnel: 84.7 -> 81.8 ms/512-batch), OFF on the CPU
        # backend, where device_get is a memcpy and the extra XLA:CPU
        # gather measurably loses (~-7% q/s under the 512-client
        # profile); RAGROUTE_DEVICE_MSG_SIZE=1/0 forces either way.
        env = os.environ.get("RAGROUTE_DEVICE_MSG_SIZE")
        if env is not None:
            device_sizing = env == "1"
        else:
            import jax

            device_sizing = jax.default_backend() != "cpu"
        if (device_sizing
                and not getattr(engine.shard_set, "mutable", False)
                and self.world.name != "feb4rag"
                and hasattr(engine, "set_payload_tables")):
            per = [self._size_tables(si)
                   for si in range(self.world.num_sources)]
            names = [s.name for s in self.world.sources]
            engine.set_payload_tables(per, names)

    # -- lifecycle ---------------------------------------------------------

    def _warmup(self) -> None:
        """Compile the engine for every batch bucket before serving (the
        reference warms its router with a dummy forward, router.py:172-175;
        here a cold bucket would otherwise pay XLA compile inside a live
        query's timeout budget).

        The second, compile-free pass of each bucket is timed with a real
        device->host sync and recorded as that bucket's steady-state
        device step time. Live per-query timings necessarily include
        dispatch overhead (e.g. the remote-tunnel ~27 ms); GET /stats
        exposes both so serving metrics survive deployment comparisons."""
        dims = {s.encoder: s.embed_dim for s in self.world.sources}
        device_ms = {}
        for b in self.batcher.buckets:
            embs = {
                enc: np.zeros((b, d), dtype=np.float32)
                for enc, d in dims.items()
            }
            staged = self.batcher.staged  # compile the SERVING path
            from ragroute_tpu.engine.batcher import fetch_candidates_policy

            fetch = fetch_candidates_policy(self.world)
            self.engine.search(embs, strategy=self.strategy, staged=staged,
                               fetch_candidates=fetch)
            if self._rows_wired:
                # compile the device query-table gather for this bucket
                # too (the serving fast path); a cold gather would pay
                # its XLA compile inside a live query otherwise
                self.engine.warm_query_table(b)
            t0 = time.perf_counter()
            self.engine.search(embs, strategy=self.strategy, staged=staged,
                               fetch_candidates=fetch)
            device_ms[b] = (time.perf_counter() - t0) * 1e3
        self.metrics.set_device_step_ms(device_ms)
        logger.info("engine warmed for buckets %s (device step ms: %s)",
                    self.batcher.buckets,
                    {b: round(v, 2) for b, v in device_ms.items()})

    async def start(self) -> None:
        if self.warmup:
            loop = asyncio.get_running_loop()
            await loop.run_in_executor(None, self._warmup)
        await self.batcher.start()
        if self.embed_batcher is not None:
            await self.embed_batcher.start()
        # no per-request access-log line: formatting + stderr I/O per
        # request was a measured host cost at high load (reference serves
        # without aiohttp access logs too — it builds its own app runner
        # with default logging only at the app level)
        self._runner = web.AppRunner(self.app, access_log=None)
        await self._runner.setup()
        # SO_REUSEPORT lets N server processes share one port with
        # kernel-level load balancing (the multi-process front-end for
        # multi-core hosts; see ragroute_tpu.system.run_workers)
        self._site = web.TCPSite(self._runner, self.host, self.port,
                                 reuse_port=self.reuse_port or None)
        await self._site.start()
        logger.info("HTTP server started on http://%s:%s", self.host, self.port)

    @property
    def bound_port(self) -> int:
        """Actual bound port (useful with port=0 in tests)."""
        if self._site and self._site._server and self._site._server.sockets:
            return self._site._server.sockets[0].getsockname()[1]
        return self.port

    async def stop(self) -> None:
        # Drain the HTTP side first: cleanup() stops accepting connections
        # and waits for in-flight handlers, which need the batcher alive to
        # resolve their futures. Stopping the batcher first would strand
        # them until aiohttp's shutdown timeout force-closes the sockets.
        if self._runner:
            await self._runner.cleanup()
            self._runner = None
        await self.batcher.stop()
        if self.embed_batcher is not None:
            await self.embed_batcher.stop()
        logger.info("Server stopped")

    # -- handlers ----------------------------------------------------------

    async def handle_health(self, request):
        return web.json_response({
            "status": "ok",
            "world": self.world.name,
            "strategy": self.strategy,
            "total_docs": self.engine.shard_set.total_docs,
            "index_bytes": self.engine.shard_set.index_bytes,
        })

    async def handle_stats(self, request):
        snap = self.metrics.snapshot()
        snap["device_memory"] = _device_memory_stats()
        svc = getattr(self.llm, "service", None)
        if svc is not None:  # jax backend: generation service counters
            gen = {"generated_tokens": svc.generated_tokens,
                   "batches": getattr(svc, "batches", None),
                   "chunks": getattr(svc, "chunks", None),
                   "admissions": getattr(svc, "admissions", None)}
            steps = getattr(svc, "spec_steps", 0)
            if steps:  # speculative decoding: mean tokens per verify step
                gen["spec_mean_emit"] = round(
                    svc.spec_emitted / steps, 3)
            snap["llm"] = {k: v for k, v in gen.items() if v is not None}
        if self.embed_batcher is not None:
            eb = self.embed_batcher
            snap["embedding"] = {
                "batches": eb.batches,
                "batched_queries": eb.batched_queries,
                "mean_batch": (round(eb.batched_queries / eb.batches, 2)
                               if eb.batches else None),
            }
        return web.json_response(snap)

    async def handle_profile(self, request):
        """``POST /admin/profile``: capture a device+host profiler trace.

        Body (optional): ``{"seconds": 2.0, "dir": "/tmp/..."}``. Runs
        ``jax.profiler`` for the window and returns the trace directory
        (perfetto/tensorboard-loadable) — XLA-level visibility into the
        serving step that the reference's wall-clock metadata timers
        (``http_server.py:233-248``) cannot give: per-fusion device time,
        dispatch gaps, transfer cost.
        """
        try:
            data = await request.json() if request.can_read_body else {}
        except (json.JSONDecodeError, UnicodeDecodeError):
            return web.Response(text="Invalid JSON body", status=400)
        try:
            seconds = float(data.get("seconds", 2.0))
        except (TypeError, ValueError):
            return web.Response(text="'seconds' must be a number",
                                status=400)
        if not (0.0 < seconds <= 60.0):
            return web.Response(
                text="'seconds' must be in (0, 60]", status=400)
        logdir = data.get("dir") or os.path.join(
            "/tmp", f"ragroute_profile_{int(time.time())}")
        import jax

        if self._profiling:
            return web.Response(
                text="A profile capture is already running", status=409)
        self._profiling = True
        try:
            jax.profiler.start_trace(logdir)
            try:
                await asyncio.sleep(seconds)
            finally:
                jax.profiler.stop_trace()
        except RuntimeError as e:
            return web.Response(text=f"Profiler failed: {e}", status=500)
        finally:
            self._profiling = False
        return web.json_response({"trace_dir": logdir,
                                  "seconds": seconds}, dumps=_dumps)

    async def handle_query(self, request):
        if request.method == "GET":
            query = request.query.get("q", "")
            choices = request.query.get("choices", "")
            question_id = request.query.get("qid", "")
        else:
            data = await request.post()
            query = data.get("q", "")
            choices = data.get("choices", "")
            question_id = data.get("qid", "")

        # validation parity (http_server.py:117-130)
        if not query:
            return web.Response(text="Please provide a query", status=400)
        if not choices:
            return web.Response(text="Please provide choices", status=400)
        if self.world.name == "feb4rag" and not question_id:
            return web.Response(
                text="For FeB4RAG, please provide a question ID (qid)",
                status=400)
        try:
            choices = json.loads(choices)
        except json.JSONDecodeError:
            return web.Response(text="Invalid choices format", status=400)

        stream = request.query.get("stream", "") in ("1", "true")
        if stream:
            # Honoured with --disable-llm too: the client asked for SSE
            # framing, so it gets the final event + [DONE] (with no delta
            # events) rather than a silently different content type.
            return await self._handle_query_sse(
                request, query, choices, question_id)
        try:
            result = await asyncio.wait_for(
                self._process(query, choices, question_id),
                timeout=QUERY_TIMEOUT_S)
            return self._json_response(result)
        except asyncio.TimeoutError:
            logger.error("Query timed out")
            return web.Response(text="Search timed out", status=504)

    async def _handle_query_sse(self, request, query, choices,
                                question_id):
        """``/query?stream=1``: Server-Sent Events — ``{"delta": ...}``
        events as answer tokens decode (incremental only with the jax
        continuous service; one whole-answer delta otherwise), then one
        final event carrying the complete standard ``/query`` response
        body, then ``[DONE]``. Beyond-reference (the reference buffers
        the whole Ollama answer, ``http_server.py:309-327``)."""
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"})
        await resp.prepare(request)

        async def cb(delta: str):
            await resp.write(
                b"data: " + _dumps({"delta": delta}).encode() + b"\n\n")

        try:
            result = await asyncio.wait_for(
                self._process(query, choices, question_id, stream_cb=cb),
                timeout=QUERY_TIMEOUT_S)
            # The final event is the authoritative full response: raw doc
            # fragments (disable-llm fast path) must be spliced in here
            # exactly like the non-streamed body — dropping them would
            # leave the internal raw token where top_docs belongs.
            raw = result.pop("__rawdocs__", None)
            body = _dumps(result)
            if raw is not None:
                spliced = self._splice_raw(body, [raw], [result])
                body = spliced if spliced is not None else _dumps(result)
            await resp.write(b"data: " + body.encode() + b"\n\n")
        except asyncio.TimeoutError:
            await resp.write(
                b'data: {"error": "Search timed out"}\n\n')
        except Exception as e:
            # Headers already went out as 200/event-stream; the only way
            # to surface a failure is an in-band error event. Without this
            # the stream is torn down with no [DONE] and auto-reconnecting
            # EventSource clients retry forever.
            logger.exception("SSE query failed")
            await resp.write(
                b"data: " + _dumps({"error": str(e)}).encode() + b"\n\n")
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    async def handle_query_batch(self, request):
        """Bulk variant of ``/query``: many queries per HTTP request.

        The single-query protocol pays ~0.67 ms of host CPU per request in
        aiohttp parse/header/socket work (measured, BENCHMARKS.md) — a hard
        ~1.5k q/s ceiling on one core regardless of how fast the device is.
        ``POST /query/batch`` amortizes that per-request cost over the whole
        batch: body ``{"queries": [{"q", "choices", "qid"}, ...]}``, response
        ``{"results": [<per-query /query body or {"error": ...}>, ...]}``
        in input order. Per-item semantics (validation strings, metadata
        schema, timeout handling) match ``/query`` exactly; the queries ride
        the same micro-batcher, so one bulk request typically becomes one
        device step. Beyond-reference (the reference is strictly
        one-query-per-request), but its own clients stripe requests for the
        same reason (``run_benchmark_parallel.py``).
        """
        try:
            data = await request.json()
        except (json.JSONDecodeError, UnicodeDecodeError):
            return web.Response(text="Invalid JSON body", status=400)
        queries = data.get("queries") if isinstance(data, dict) else data
        if not isinstance(queries, list) or not queries:
            return web.Response(
                text="Provide a non-empty 'queries' list", status=400)

        async def one(item) -> dict:
            if not isinstance(item, dict):
                return {"error": "Each query must be an object"}
            query = item.get("q", "")
            choices = item.get("choices", "")
            question_id = str(item.get("qid", "") or "")
            # validation parity with /query (http_server.py:117-130)
            if not query:
                return {"error": "Please provide a query"}
            if not choices:
                return {"error": "Please provide choices"}
            if self.world.name == "feb4rag" and not question_id:
                return {"error":
                        "For FeB4RAG, please provide a question ID (qid)"}
            if isinstance(choices, str):  # bulk bodies may inline JSON
                try:
                    choices = json.loads(choices)
                except json.JSONDecodeError:
                    return {"error": "Invalid choices format"}
            try:
                return await asyncio.wait_for(
                    self._process(query, choices, question_id),
                    timeout=QUERY_TIMEOUT_S)
            except asyncio.TimeoutError:
                return {"error": "Search timed out"}

        results = await asyncio.gather(*[one(it) for it in queries])
        results = list(results)
        frags, owners = [], []
        for r in results:
            if isinstance(r, dict):
                raw = r.pop("__rawdocs__", None)
                if raw is not None:
                    frags.append(raw)
                    owners.append(r)
        if frags:
            body = self._splice_raw(
                _dumps({"results": results}), frags, owners)
            if body is not None:
                return web.Response(text=body,
                                    content_type="application/json")
        return web.json_response({"results": results}, dumps=_dumps)

    # -- live index updates ------------------------------------------------

    def _update_source_index(self, source: str) -> Optional[int]:
        for si, s in enumerate(self.world.sources):
            if s.name == source:
                return si
        return None

    def _invalidate_doc_caches(self, si: int) -> None:
        self._size_cache.pop(si, None)
        if self._get_doc is not None:
            self._get_doc.cache_clear()
        if self._get_raw is not None:
            self._get_raw.cache_clear()

    def docs_add_sync(self, data) -> tuple:
        """Sync core of ``POST /docs/add`` (shared with the native
        front-end loop): validates, scatters, sets payloads atomically.
        Returns ``(status, body)`` where body is a dict (200) or an
        error string."""
        if not getattr(self.engine.shard_set, "mutable", False):
            return 400, ("Index is immutable; start with --mutable to "
                         "enable live updates")
        if not isinstance(data, dict):
            return 400, "Invalid JSON body"
        source = data.get("source")
        docs = data.get("docs")
        si = self._update_source_index(source) if source else None
        if si is None:
            return 400, f"Unknown source {source!r}"
        if not isinstance(docs, list) or not docs:
            return 400, "Provide a non-empty 'docs' list"
        if any("embedding" not in d for d in docs):
            return 400, "Every doc needs an 'embedding'"
        try:
            embs = np.asarray([d["embedding"] for d in docs],
                              dtype=np.float32)
        except ValueError:
            return 400, "Malformed embeddings (ragged or non-numeric)"
        ids = ([d.get("id") for d in docs]
               if any("id" in d for d in docs) else None)
        try:
            # Slots + payloads must become visible atomically under the
            # update lock: a concurrent /admin/snapshot between the device
            # scatter and the payload writes would persist "null" lines
            # for the new docs, and a concurrent delete could recycle a
            # slot whose payload we then set on the wrong doc.
            with self.engine.update_lock:
                slots = self.engine.shard_set.add_docs(source, embs, ids)
                for sl, d in zip(slots, docs):
                    if "payload" in d:
                        self.doc_store.set(source, sl, d["payload"])
        except (ValueError, KeyError) as e:
            return 400, str(e)
        self._invalidate_doc_caches(si)
        return 200, {
            "added": len(slots),
            "slots": slots,
            "live_docs": self.engine.shard_set.live_docs(source),
            "free_slots": self.engine.shard_set.free_slots(source),
        }

    async def handle_docs_add(self, request):
        """``POST /docs/add``: insert documents into a live shard.

        Body: ``{"source": name, "docs": [{"embedding": [...], "id": ...,
        "payload": {...}}, ...]}``. Requires the server to run on a
        mutable ShardSet (``--mutable``); the embeddings get the shard's
        build-time treatment and are visible to the next device batch.
        """
        try:
            data = await request.json()
        except (json.JSONDecodeError, UnicodeDecodeError):
            return web.Response(text="Invalid JSON body", status=400)
        loop = asyncio.get_running_loop()
        status, body = await loop.run_in_executor(
            None, self.docs_add_sync, data)
        if status != 200:
            return web.Response(text=body, status=status)
        return web.json_response(body, dumps=_dumps)

    def docs_delete_sync(self, data) -> tuple:
        """Sync core of ``POST /docs/delete`` (shared with the native
        front-end loop)."""
        if not getattr(self.engine.shard_set, "mutable", False):
            return 400, ("Index is immutable; start with --mutable to "
                         "enable live updates")
        if not isinstance(data, dict):
            return 400, "Invalid JSON body"
        source = data.get("source")
        si = self._update_source_index(source) if source else None
        if si is None:
            return 400, f"Unknown source {source!r}"
        ids = data.get("ids")
        slots = data.get("slots")
        try:
            # Payload masking rides the same lock scope as the slot frees:
            # delete-then-set races with a concurrent /docs/add recycling
            # the slot would otherwise null the NEW doc's payload.
            with self.engine.update_lock:
                removed = self.engine.shard_set.delete_docs(
                    source, doc_ids=ids, slots=slots)
                for sl in removed:
                    self.doc_store.delete(source, sl)
        except (ValueError, KeyError) as e:
            return 400, str(e)
        self._invalidate_doc_caches(si)
        return 200, {
            "deleted": len(removed),
            "live_docs": self.engine.shard_set.live_docs(source),
            "free_slots": self.engine.shard_set.free_slots(source),
        }

    async def handle_docs_delete(self, request):
        """``POST /docs/delete``: remove documents from a live shard.

        Body: ``{"source": name, "ids": [...]}`` or
        ``{"source": name, "slots": [...]}``.
        """
        try:
            data = await request.json()
        except (json.JSONDecodeError, UnicodeDecodeError):
            return web.Response(text="Invalid JSON body", status=400)
        loop = asyncio.get_running_loop()
        status, body = await loop.run_in_executor(
            None, self.docs_delete_sync, data)
        if status != 200:
            return web.Response(text=body, status=status)
        return web.json_response(body, dumps=_dumps)

    def _raw_payload(self, source: str, slot: int) -> Optional[str]:
        """Serialized payload of one doc slot, preferring the store's raw
        bytes (native mmap / overlay) over parse-and-redump."""
        fn = getattr(self.doc_store, "get_raw", None)
        raw = fn(source, slot) if fn else None
        if raw is None:
            p = self.doc_store.get(source, slot)
            return None if p is None else _dumps(p)
        return raw.decode() if isinstance(raw, (bytes, bytearray)) else raw

    def _do_snapshot(self) -> Dict[str, dict]:
        """Persist index + payloads under the engine's update lock, so the
        embeddings and the payload jsonl compact the SAME slot view even
        while /docs/add traffic is in flight."""
        with self.engine.update_lock:
            report = self.engine.shard_set.snapshot(self.data_root)
            if self.doc_store is not None:
                pay_dir = os.path.join(
                    self.data_root, self.world.name, "payloads")
                os.makedirs(pay_dir, exist_ok=True)
                for name, info in report.items():
                    tmp = os.path.join(pay_dir, f"{name}.jsonl.tmp")
                    with open(tmp, "w") as f:
                        for s in info["slots"]:
                            raw = self._raw_payload(name, s)
                            f.write((raw if raw is not None else "null")
                                    + "\n")
                    os.replace(tmp,
                               os.path.join(pay_dir, f"{name}.jsonl"))
        return report

    def snapshot_sync(self) -> tuple:
        """Sync core of ``POST /admin/snapshot`` (shared with the native
        front-end loop). Returns ``(status, body)``."""
        if not getattr(self.engine.shard_set, "mutable", False):
            return 400, ("Index is immutable; start with --mutable to "
                         "enable live updates")
        if not self.data_root:
            return 400, ("Server was started without a data root; pass "
                         "data_root= (main.py wires --data-root / "
                         "$RAGROUTE_DATA automatically)")
        try:
            report = self._do_snapshot()
        except (OSError, ValueError) as e:
            return 500, f"Snapshot failed: {e}"
        return 200, {
            "data_root": self.data_root,
            "world": self.world.name,
            "sources": {n: {"live_docs": i["live_docs"]}
                        for n, i in report.items()},
        }

    async def handle_snapshot(self, request):
        """``POST /admin/snapshot``: persist the live index durably.

        Writes the mutated corpus (embeddings, doc ids, payload jsonl)
        back to the data root atomically, compacted to live docs, so the
        next boot of ``main.py`` serves exactly what this server is
        serving now — closing the CRUD durability loop that
        ``/docs/add`` + ``/docs/delete`` opened. The reference has no
        equivalent (its FAISS indexes are read-only at serve time).
        """
        loop = asyncio.get_running_loop()
        status, body = await loop.run_in_executor(None, self.snapshot_sync)
        if status != 200:
            return web.Response(text=body, status=status)
        return web.json_response(body, dumps=_dumps)

    # -- core pipeline -------------------------------------------------------

    async def _process(self, query: str, choices, question_id: str,
                       stream_cb=None) -> dict:
        query_id = str(uuid.uuid4())
        start = time.time()

        # wikipedia formats query+choices for encoding (http_server.py:147-150)
        if self.world.name == "wikipedia":
            formatted_query = "\n".join([query, " | ".join(choices)])
        else:
            formatted_query = query

        t0 = time.time()
        # re-check the provider identity on every request: tests (and
        # live swaps) may replace self.provider after init — a different
        # provider's row indices must not gather from the stale device
        # table, so any swap falls back to the dense embed path
        row_of = (self.provider.row_of
                  if self._rows_wired and self.provider is self._rows_provider
                  else None)
        if row_of is not None and (row := row_of(question_id)) is not None:
            # table-backed qid: ship a row index, gather on device
            embs = {"__row__": row}
        elif self.embed_batcher is not None:
            # Live encoders micro-batch: concurrent arrivals share one
            # padded [B, L] forward per encoder (weight-stream-bound at
            # small B, so B queries cost ~1 query's forward).
            embs = await self.embed_batcher.submit(
                formatted_query, question_id)
        elif getattr(self.provider, "blocking", False):
            # A blocking provider without batch support must not run on
            # the event loop: it would stall the batcher's collect loop
            # and serialize queries, degrading batches to size 1. Hash /
            # precomputed providers stay inline (microseconds; an executor
            # round-trip would cost more than it saves on the hot path).
            embs = await asyncio.get_running_loop().run_in_executor(
                None, self.provider.embed, formatted_query, question_id)
        else:
            embs = self.provider.embed(formatted_query, question_id)
        embedding_time = time.time() - t0

        t0 = time.time()
        res: QueryResult = await self.batcher.submit(embs)
        # queueing + batch formation overhead: submit->result wall time
        # minus the device step itself (host-profile stage, /stats)
        batch_wait = max(0.0, (time.time() - t0)
                         - res.selection_time - res.doc_select_time)
        t_assemble = time.time()

        selected, ds_stats, top_docs, raw_docs = self._assemble_pre(
            res, query_id, question_id)

        response = {
            "query_id": query_id,
            "query": query,
            "answer": "dummy",
        }

        docs_tokens = 0
        generate_time = 0.0
        llm_wall = 0.0  # wall time in the LLM stage (excluded from the
        #                 assemble host-profile metric; includes timeouts)
        if self.disable_llm:
            response["answer"] = ""
            if self.simulate:
                t0 = time.time()
                await asyncio.sleep(LLM_DELAY)
                llm_wall = time.time() - t0
        else:
            t0 = time.time()
            if self.world.name == "wikipedia":
                messages, docs_tokens = generate_llm_message_wikipedia(
                    query, top_docs, choices, self.model)
            else:
                messages, docs_tokens = generate_llm_message(
                    self.world.name, query, top_docs, choices, self.model)
            if stream_cb is not None:
                llm_res = None
                async for item in self.llm.chat_stream(self.model,
                                                       messages):
                    if isinstance(item, str):
                        await stream_cb(item)
                    else:
                        llm_res = item
            else:
                llm_res = await self.llm.chat(self.model, messages)
            generate_time = (
                llm_res.generate_time if llm_res.generate_time >= 0
                else -1)
            response["answer"] = llm_res.answer
            llm_wall = time.time() - t0

        return self._finalize(
            response, res, selected=selected, ds_stats=ds_stats,
            top_docs=top_docs, raw_docs=raw_docs,
            generate_time=generate_time, docs_tokens=docs_tokens,
            start=start, embedding_time=embedding_time,
            batch_wait=batch_wait, t_assemble=t_assemble,
            llm_wall=llm_wall)

    def _assemble_pre(self, res: QueryResult, query_id: str,
                      question_id: str, msg_sizes=None):
        """Everything between the device result and the LLM stage, sync
        (shared by the asyncio handlers and the native front-end loop):
        selected source names, per-source stats, merged top docs.

        Per-source stats carry serialized-response message sizes. For the
        score-merged worlds only the SIZE of the per-source response is
        needed (the docs themselves are resolved once, for the merged
        top-k) — raw line lengths from the doc store avoid k parses per
        source per query; feb4rag resolves fully because the qrels-oracle
        rerank consumes per-source candidates.
        """
        selected = [
            self.world.sources[i].name
            for i in range(self.world.num_sources) if res.mask[i]
        ]
        ds_stats = {}
        per_source_docs: Dict[str, List] = {}
        per_source_ids: Dict[str, List] = {}
        need_docs = self.world.name == "feb4rag"
        for si, src in enumerate(self.world.sources):
            if not res.mask[si]:
                continue
            if need_docs:
                ids, docs, scores = self._resolve_source(res, si)
                per_source_ids[src.name] = ids
                per_source_docs[src.name] = docs
                payload = {
                    "query_id": query_id, "client_id": si, "name": src.name,
                    "indices": ids, "docs": docs, "scores": scores,
                    "duration": res.doc_select_time,
                }
                msg_size = len(json.dumps(payload, default=str))
            elif msg_sizes is not None:
                msg_size = int(msg_sizes[si])
            elif res.msg_base is not None:
                # device-computed size; the host only adds the qid length
                msg_size = int(res.msg_base[si]) + len(query_id)
            else:
                msg_size = self._estimate_message_size(res, si, query_id)
            ds_stats[src.name] = {
                "duration": res.doc_select_time,
                "message_size": msg_size,
            }

        raw_docs = None
        if self._get_raw is not None:
            raw_docs = self._merge_top_docs_raw(res)
        # raw mode implies disable_llm, so nothing downstream reads the
        # parsed docs when the raw fragment exists
        top_docs = (None if raw_docs is not None else self._merge_top_docs(
            res, question_id, per_source_ids, per_source_docs))
        return selected, ds_stats, top_docs, raw_docs

    def _finalize(self, response: dict, res: QueryResult, *, selected,
                  ds_stats, top_docs, raw_docs, generate_time, docs_tokens,
                  start, embedding_time, batch_wait, t_assemble,
                  llm_wall=0.0) -> dict:
        """Attach the reference metadata schema + observe metrics (sync;
        shared by the asyncio handlers and the native front-end loop)."""
        e2e = time.time() - start
        self.metrics.observe_query(
            embedding=embedding_time, selection=res.selection_time,
            doc_select=res.doc_select_time, generate=generate_time,
            e2e=e2e, batch_size=res.batch_size,
            batch_wait=batch_wait,
            assemble=max(0.0, time.time() - t_assemble - llm_wall))
        response["metadata"] = {
            "data_sources": selected,
            "embedding_time": embedding_time,
            "selection_time": res.selection_time,
            "doc_select_time": res.doc_select_time,
            "generate_time": generate_time,
            "data_sources_stats": ds_stats,
            "top_docs": self._raw_token if raw_docs is not None else top_docs,
            "e2e_time": e2e,
            "docs_tokens": docs_tokens,
            "llm": self.model,
            # extra (non-reference) observability
            "batch_size": res.batch_size,
            "routing_strategy": self.strategy,
        }
        if raw_docs is not None:
            response["__rawdocs__"] = raw_docs
        return response

    def _size_tables(self, si: int):
        """Lazily-built per-source int32 length tables: raw doc line bytes
        and id-string bytes, indexed by local doc id. Turns the per-query
        message-size estimate into one numpy fancy-index instead of k
        doc-store calls (measured host hot path at high load)."""
        tab = self._size_cache.get(si)
        if tab is None:
            src = self.world.sources[si]
            n = self.engine.shard_set.shards[si].n_docs
            raw_lengths = getattr(self.doc_store, "raw_lengths", None)
            rawl = None
            if raw_lengths is not None:
                rawl = raw_lengths(src.name)
            if rawl is None and hasattr(self.doc_store, "get_raw"):
                get_raw = self.doc_store.get_raw
                rawl = np.fromiter(
                    (len(r) if (r := get_raw(src.name, i)) else 4
                     for i in range(n)), dtype=np.int32, count=n)
            id_table = self.engine.shard_set.doc_ids.get(src.name)
            idl = None
            if id_table:
                idl = np.fromiter(
                    (len(str(x)) + 4 for x in id_table),
                    dtype=np.int32, count=len(id_table))
            tab = (rawl, idl)
            self._size_cache[si] = tab
        return tab

    def _estimate_message_sizes_chunk(self, shard_ids_all: np.ndarray,
                                      qid_len: int) -> np.ndarray:
        """Vectorized ``[B, N]`` equivalent of `_estimate_message_size`:
        one numpy pass per source per CHUNK instead of ~8 small-array ops
        per (query, source) — the per-call numpy dispatch overhead
        measured ~70 µs under 512-client load (native-loop cProfile,
        BENCHMARKS.md)."""
        bsz, nsrc, k = shard_ids_all.shape
        out = np.zeros((bsz, nsrc), dtype=np.int64)
        for si, src in enumerate(self.world.sources):
            rawl, idl = self._size_tables(si)
            ids = shard_ids_all[:, si, :]
            size = np.full((bsz,), qid_len + len(src.name) + 96 + 20 * k,
                           dtype=np.int64)
            if idl is not None:
                n = idl.shape[0]
                clipped = np.clip(ids, 0, max(n - 1, 0))
                per = np.where((ids >= 0) & (ids < n), idl[clipped], 0)
                size += per.sum(axis=1)
            if rawl is not None:
                n = rawl.shape[0]
                clipped = np.clip(ids, 0, max(n - 1, 0))
                per = np.where((ids >= 0) & (ids < n), rawl[clipped], 4)
                size += per.sum(axis=1) + 2 * k
            out[:, si] = size
        return out

    def _estimate_message_size(self, res: QueryResult, si: int,
                               query_id: str) -> int:
        """Serialized size of the equivalent per-source response without
        parsing doc payloads: envelope + ids + scores + raw doc bytes."""
        src = self.world.sources[si]
        rawl, idl = self._size_tables(si)
        ids = res.shard_ids[si]
        k = ids.shape[0]
        size = len(query_id) + len(src.name) + 96 + 20 * k
        if idl is not None:
            # Same out-of-range guard as the rawl path: padded/negative
            # ids must not numpy-wrap into real rows (an id of -1 would
            # read the LAST doc's length and inflate the parity metric).
            n = idl.shape[0]
            clipped = np.clip(ids, 0, max(n - 1, 0))
            per = np.where((ids >= 0) & (ids < n), idl[clipped], 0)
            size += int(per.sum())
        if rawl is not None:
            n = rawl.shape[0]
            clipped = np.clip(ids, 0, max(n - 1, 0))
            per = np.where((ids >= 0) & (ids < n), rawl[clipped], 4)
            size += int(per.sum()) + 2 * k
        return size

    def _resolve_source(self, res: QueryResult, si: int):
        """One source's k candidates as (ids, docs, scores) — the data the
        reference data-source process returns (data_source.py:123-131)."""
        src = self.world.sources[si]
        id_table = self.engine.shard_set.doc_ids.get(src.name)
        ids, docs, scores = [], [], []
        for r in range(res.shard_ids.shape[1]):
            local = int(res.shard_ids[si, r])
            ids.append(id_table[local] if id_table else local)
            docs.append(self._get_doc(src.name, local)
                        if self._get_doc else None)
            scores.append(float(res.shard_scores[si, r]))
        if self.world.name == "feb4rag":
            scores = []  # parity: no scores for FeB4RAG (data_source.py:163)
        return ids, docs, scores

    def _merge_top_docs_raw(self, res: QueryResult) -> Optional[str]:
        """The merged top-k docs as ONE pre-serialized JSON array string,
        built from raw doc-store lines (no parse, no re-encode). Returns
        ``None`` when any doc has no raw form (e.g. overlay-deleted) —
        the caller then takes the parsed path for this query."""
        frags = []
        for j in range(res.merged_shard.shape[0]):
            si = int(res.merged_shard[j])
            if si < 0:
                continue
            raw = self._get_raw(self.world.sources[si].name,
                                int(res.merged_local[j]))
            if raw is None:
                return None
            frags.append(raw)
        return "[" + ",".join(frags) + "]"

    def _splice_raw(self, body: str, frags: List[str],
                    owners: List[dict]) -> str:
        """Replace each raw-token occurrence in ``body`` (in order) with
        its query's pre-serialized top_docs array — one split+join pass.
        On a count mismatch (the 128-bit token appeared in request text,
        i.e. someone guessed it) rebuild via the parsed encoder."""
        parts = body.split('"' + self._raw_token + '"')
        if len(parts) == len(frags) + 1:
            out = []
            for p, f in zip(parts, frags):
                out.append(p)
                out.append(f)
            out.append(parts[-1])
            return "".join(out)
        for owner, frag in zip(owners, frags):  # collision fallback
            owner["metadata"]["top_docs"] = json.loads(frag)
        return None

    def _json_response(self, result) -> web.Response:
        """Encode one /query result, splicing raw doc fragments if the
        fast path produced them."""
        raw = (result.pop("__rawdocs__", None)
               if isinstance(result, dict) else None)
        if raw is not None:
            body = self._splice_raw(_dumps(result), [raw], [result])
            if body is not None:
                return web.Response(text=body,
                                    content_type="application/json")
        return web.json_response(result, dumps=_dumps)

    def _merge_top_docs(self, res: QueryResult, question_id, per_ids, per_docs):
        """Global top-k docs, per world semantics."""
        if self.world.name == "feb4rag":
            # qrels-oracle rerank, host-side (rerank.py:12-25)
            all_ids, all_docs = [], []
            for name in per_ids:
                all_ids.extend(per_ids[name])
                all_docs.extend(per_docs[name])
            docs, _ = rerank_feb4rag(
                all_ids, all_docs, question_id, self.world.k,
                self.relevance_data)
            return docs
        # medrag / wikipedia: device merge already ordered correctly
        docs = []
        for j in range(res.merged_shard.shape[0]):
            si = int(res.merged_shard[j])
            if si < 0:
                continue
            src = self.world.sources[si]
            local = int(res.merged_local[j])
            docs.append(self._get_doc(src.name, local)
                        if self._get_doc else
                        {"source": src.name, "index": local})
        return docs


async def run_server(engine: FederatedSearchEngine, **kwargs) -> FederationServer:
    server = FederationServer(engine, **kwargs)
    await server.start()
    return server
