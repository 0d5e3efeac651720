"""Native (C++) HTTP front-end: ctypes bindings + the serving loop.

The measured host profile (BENCHMARKS.md, round 3) puts aiohttp's
per-request parse/header/socket work at ~0.67 ms of host CPU — a hard
~1.5k q/s ceiling on one core regardless of device speed. ``--frontend
native`` replaces the whole Python IO plane with ``native/frontend.cpp``:
an epoll event loop owns the sockets, parses HTTP/1.1 (keep-alive,
pipeline ordering), and writes responses; this module pulls PARSED
REQUESTS IN BATCHES and pushes complete response bodies. The batch pull
doubles as the serving micro-batcher (replacing the asyncio
``QueryBatcher``): requests that arrive while Python runs a device step
accumulate in C++ and are handed over as one batch, so batch formation
costs zero event-loop work.

Scope: the WHOLE serving surface (round 4). ``GET/POST /query`` (incl.
``stream=1`` SSE — with live generation the deltas stream through
chunked ``fe_stream_chunk`` frames as they decode), ``POST
/query/batch``, ``/docs/add``, ``/docs/delete``, ``/admin/snapshot``,
``/admin/profile``, ``/healthz``, ``/stats``, and ``--simulate``.
Generation and simulate's LLM_DELAY run on a dedicated finisher asyncio
loop in a side thread (the device serving loop never blocks on the LLM);
finished responses enter C++ through the thread-safe
``fe_respond``/``fe_begin_stream``/``fe_stream_*`` entry points.

Response assembly is SHARED with the asyncio server (the sync
``FederationServer._assemble_pre`` / ``_finalize`` helpers and the raw
doc-splice fast path), so the two front-ends return byte-compatible
bodies — gated by ``tests/test_native_frontend.py``.
"""

from __future__ import annotations

import ctypes
import functools
import json
import logging
import os
import subprocess
import threading
import time
import uuid
from typing import Dict, List, Optional
from urllib.parse import unquote_plus

import numpy as np

from ragroute_tpu.config import BATCH_WINDOW_MS
from ragroute_tpu.engine.batcher import (
    QueryResult, fetch_candidates_policy, pack_query_embs)
from ragroute_tpu.engine.server import FederationServer, _dumps

logger = logging.getLogger("native_frontend")


_UNQUOTE_CACHE_MAX_LEN = 2048  # bound by BYTES, not just entries: bodies
# can reach the frontend's 64 MB cap, and 8192 cached multi-MB uniques
# would pin gigabytes. Short values (qids, choices JSON) are the ones
# that repeat; long question bodies rarely do and skip the cache.


@functools.lru_cache(maxsize=8192)
def _unquote_cached_small(val: str) -> str:
    return unquote_plus(val, errors="replace")


def _unquote_cached(val: str) -> str:
    # stdlib unquote_plus costs ~47 µs per escaped value (cProfile under
    # the 512-client load, dominated by the choices JSON); hot serving
    # traffic repeats query strings, so a bounded decode cache turns the
    # repeat cost into a dict hit
    if len(val) <= _UNQUOTE_CACHE_MAX_LEN:
        return _unquote_cached_small(val)
    return unquote_plus(val, errors="replace")


def _parse_qs_first(qs: str, out: Dict[str, str]) -> Dict[str, str]:
    """First-value query-string parse into ``out`` (later dups ignored,
    matching the ``parse_qs(...)[key][0]`` reads this replaces). Decoding
    only runs when a value actually carries %xx/+ escapes — the stdlib
    parse_qs chain measured ~75 µs/request of pure dispatch overhead
    under load (native-loop cProfile, BENCHMARKS.md)."""
    for part in qs.split("&"):
        if not part:
            continue
        key, _, val = part.partition("=")
        if "%" in key or "+" in key:
            key = _unquote_cached(key)
        if key in out:
            continue
        if "%" in val:
            val = _unquote_cached(val)
        elif "+" in val:
            val = val.replace("+", " ")
        out[key] = val
    return out

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "frontend.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_LIB_DIR, "libfrontend.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


class _FeReq(ctypes.Structure):
    # must match FeReq in native/frontend.cpp
    _fields_ = [
        ("id", ctypes.c_uint64),
        ("method", ctypes.c_int32),
        ("path_len", ctypes.c_int32),
        ("qs_len", ctypes.c_int32),
        ("body_len", ctypes.c_int32),
        ("_pad", ctypes.c_int32),
        ("path", ctypes.c_void_p),
        ("qs", ctypes.c_void_p),
        ("body", ctypes.c_void_p),
    ]


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC, "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.warning("native frontend build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.fe_start.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.fe_start.restype = ctypes.c_void_p
        lib.fe_port.argtypes = [ctypes.c_void_p]
        lib.fe_port.restype = ctypes.c_int
        lib.fe_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(_FeReq),
                                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_int]
        lib.fe_next.restype = ctypes.c_int
        lib.fe_respond.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                   ctypes.c_int, ctypes.c_char_p,
                                   ctypes.c_char_p, ctypes.c_longlong]
        lib.fe_respond.restype = ctypes.c_int
        lib.fe_respond_many.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_longlong)]
        lib.fe_respond_many.restype = ctypes.c_int
        lib.fe_begin_stream.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                        ctypes.c_int, ctypes.c_char_p]
        lib.fe_begin_stream.restype = ctypes.c_int
        lib.fe_stream_chunk.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                        ctypes.c_char_p, ctypes.c_longlong]
        lib.fe_stream_chunk.restype = ctypes.c_int
        lib.fe_stream_end.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.fe_stream_end.restype = ctypes.c_int
        lib.fe_stat.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fe_stat.restype = ctypes.c_longlong
        lib.fe_shutdown.argtypes = [ctypes.c_void_p]
        lib.fe_shutdown.restype = None
        lib.fe_stop.argtypes = [ctypes.c_void_p]
        lib.fe_stop.restype = None
        _lib = lib
        return lib


def native_frontend_available() -> bool:
    return _load() is not None


class NativeFrontend:
    """Thin wrapper over the C front-end handle."""

    MAX_POP = 512  # default requests per fe_next call; the serving loop
    # sizes this to its largest batch bucket (a smaller pop padded up to
    # the bucket wastes device work: a 256-cap measured 917 q/s vs
    # aiohttp's 1052 because every 512-bucket step carried 50% padding)

    def __init__(self, host: str, port: int, reuse_port: bool = False,
                 max_pop: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native frontend unavailable (g++ missing?)")
        self._lib = lib
        self._h = lib.fe_start(host.encode(), port, int(reuse_port))
        if not self._h:
            raise OSError(f"fe_start failed to bind {host}:{port}")
        self.max_pop = int(max_pop) or self.MAX_POP
        self._buf = (_FeReq * self.max_pop)()

    @property
    def port(self) -> int:
        return int(self._lib.fe_port(self._h))

    def next(self, max_n: int, first_timeout_ms: int = 200,
             window_ms: int = 0, fill_n: int = 0, fill_ms: int = 0):
        """Pop up to ``max_n`` parsed requests as
        ``(id, method, path, qs, body)`` tuples (bytes); ``None`` when the
        front-end was shut down, ``[]`` on timeout. ``fill_n/fill_ms``:
        after the first request is in hand, keep waiting up to ``fill_ms``
        (from now) for ``fill_n`` requests to queue — fuller device
        batches at a small latency cost."""
        max_n = min(max_n, self.max_pop)
        n = self._lib.fe_next(self._h, self._buf, max_n,
                              first_timeout_ms, window_ms,
                              fill_n, fill_ms)
        if n < 0:
            return None
        out = []
        for i in range(n):
            r = self._buf[i]
            out.append((
                r.id, r.method,
                ctypes.string_at(r.path, r.path_len) if r.path_len else b"",
                ctypes.string_at(r.qs, r.qs_len) if r.qs_len else b"",
                ctypes.string_at(r.body, r.body_len) if r.body_len else b"",
            ))
        return out

    def respond(self, rid: int, status: int, body,
                ctype: bytes = b"application/json") -> None:
        if isinstance(body, str):
            body = body.encode()
        self._lib.fe_respond(self._h, rid, status, ctype, body, len(body))

    def respond_many(self, items) -> int:
        """Deliver ``[(rid, status, ctype, body), ...]`` in one native
        call: one inflight-map pass, one queue push, one eventfd wakeup
        (per-response calls each wake the IO thread, which preempts the
        serving thread on a shared core — measured 0.24 ms/response)."""
        n = len(items)
        if n == 0:
            return 0
        if n == 1:
            rid, status, ctype, body = items[0]
            self.respond(rid, status, body, ctype)
            return 1
        ids = (ctypes.c_uint64 * n)()
        sts = (ctypes.c_int32 * n)()
        cts = (ctypes.c_char_p * n)()
        bds = (ctypes.c_char_p * n)()
        lns = (ctypes.c_longlong * n)()
        bodies = []  # keep the encoded bytes alive through the call
        for i, (rid, status, ctype, body) in enumerate(items):
            if isinstance(body, str):
                body = body.encode()
            bodies.append(body)
            ids[i] = rid
            sts[i] = status
            cts[i] = ctype
            bds[i] = body
            lns[i] = len(body)
        return int(self._lib.fe_respond_many(
            self._h, n, ids, sts, cts, bds, lns))

    def begin_stream(self, rid: int, status: int = 200,
                     ctype: bytes = b"text/event-stream") -> bool:
        """Open a chunked streaming response (SSE generation). Safe from
        any thread, like :meth:`respond`."""
        return self._lib.fe_begin_stream(self._h, rid, status, ctype) == 0

    def stream_chunk(self, rid: int, data) -> bool:
        if isinstance(data, str):
            data = data.encode()
        return self._lib.fe_stream_chunk(self._h, rid, data,
                                         len(data)) == 0

    def stream_end(self, rid: int) -> bool:
        return self._lib.fe_stream_end(self._h, rid) == 0

    def stats(self) -> dict:
        names = ("accepted", "requests", "bad_requests", "responses",
                 "dropped_responses")
        return {n: int(self._lib.fe_stat(self._h, i))
                for i, n in enumerate(names)}

    def shutdown(self) -> None:
        """Wake any blocked fe_next; the loop thread then calls close()."""
        self._lib.fe_shutdown(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.fe_stop(self._h)
            self._h = None


class _DoneSearch:
    """Already-fetched SearchOutput behind the PendingSearch interface
    (engines that only implement blocking ``search``)."""

    __slots__ = ("_out",)

    def __init__(self, out):
        self._out = out

    def wait(self):
        return self._out


class _Work:
    __slots__ = ("rid", "query", "choices", "qid", "stream", "group",
                 "gidx", "start", "embs", "row", "embed_time", "t_submit")

    def __init__(self, rid, query, choices, qid, stream=False, group=None,
                 gidx=0):
        self.rid = rid
        self.query = query
        self.choices = choices
        self.qid = qid
        self.stream = stream
        self.group = group    # _Group for /query/batch members
        self.gidx = gidx
        self.start = time.time()
        self.embs = None
        self.row = None       # device query-table row (rows fast path)
        self.embed_time = 0.0
        self.t_submit = 0.0


class _Group:
    """One POST /query/batch request awaiting its member results.

    Members may complete on the serving thread (validation errors,
    retrieval-only) AND on the finisher thread (generation), so the
    counter rides a lock."""

    __slots__ = ("rid", "results", "remaining", "lock")

    def __init__(self, rid, n):
        self.rid = rid
        self.results: List = [None] * n
        self.remaining = n
        self.lock = threading.Lock()


class NativeFederationServer:
    """Serve a ``FederationServer``'s engine through the C++ front-end.

    The FederationServer is used purely as the (already-tested) assembly
    library — its aiohttp app and asyncio batcher are never started. One
    Python thread runs the loop: pop a request batch from C++, run the
    jitted engine step per bucket chunk, assemble responses with the
    shared sync helpers, push the bodies back to C++.
    """

    def __init__(self, server: FederationServer, *,
                 window_ms: float = BATCH_WINDOW_MS):
        if server.embed_batcher is not None:
            # zoo providers still work: embed_many() is called synchronously
            # per pop batch, which batches the encoder forward the same way
            server.embed_batcher = None
        self.server = server
        self.engine = server.engine
        self.world = server.world
        self.strategy = server.strategy
        self.provider = server.provider
        self.window_ms = int(window_ms)
        # min-fill wait: after the first request, wait up to this many ms
        # for the pop to reach the largest bucket — a padded 512-bucket
        # device step costs the same as a full one, so a few ms of
        # accumulation buys real rows. Engaged adaptively (serve_forever):
        # only after a ≥32-request pop, so light load never pays it.
        # A/B at 512 clients: 0 → 1567 q/s, 15 → 1796, 30 → 1349 (over-
        # waiting starves the device); 0 disables.
        self.fill_ms = int(os.environ.get("RAGROUTE_NATIVE_FILL_MS", "15"))
        self.buckets = tuple(sorted(server.batcher.buckets))
        self.staged = server.batcher.staged
        self._fetch = fetch_candidates_policy(self.world)
        self.fe: Optional[NativeFrontend] = None
        self._thread: Optional[threading.Thread] = None
        self._running = False
        # responses buffered during one _handle pass, delivered with a
        # single fe_respond_many call (serve_forever is single-threaded)
        self._out: List = []
        # device pipelining (double buffer): keep ONE submitted-but-not-
        # fetched batch in flight so the device computes batch N+1 while
        # the host assembles batch N's responses (engine.search_submit).
        # The loop polls non-blocking while a batch is pending and drains
        # it when no new work arrived.
        #
        # Default OFF — REFUTED on the remote-tunnel backend (512-client
        # closed loop, same session): ON 2150 q/s / p50 228 ms vs OFF
        # 2540 q/s / p50 194 ms. The tunnel executes RPCs in order, so
        # the fetch of batch N (enqueued AFTER batch N+1's dispatch)
        # completes only after N+1 finishes computing: doc_select p50
        # 47 ms -> 131 ms (~2 batch times), i.e. the "overlap" serializes
        # behind the next batch, and the eager non-blocking pops shrink
        # mean batch size 309 -> 257 on top. Kept as an opt-in for
        # locally-attached backends with out-of-order streams.
        # pipeline default: OFF for flat engines (the in-order tunnel
        # serializes the deferred fetch behind the next batch's compute,
        # measured -15%), ON for dispatch/complete engines (hostrefine:
        # wait() is host-CPU rescore work, which overlaps the next
        # device scan — the same +40% as the asyncio batcher's
        # pipelined worker). RAGROUTE_NATIVE_PIPELINE=0/1 forces.
        env = os.environ.get("RAGROUTE_NATIVE_PIPELINE")
        if env is not None:
            self.pipeline = env == "1"
        else:
            self.pipeline = getattr(
                server.engine, "supports_pipelined_dispatch", False)
        self._pending = None  # (chunk, PendingSearch)
        # post-retrieval finisher: generation (incl. SSE streaming) and
        # simulate's LLM_DELAY are async stages that must not block the
        # serving loop. They run on a dedicated asyncio loop in a side
        # thread; completed responses go straight to the (thread-safe)
        # fe_respond/fe_begin_stream/fe_stream_* entry points, bypassing
        # the serving thread's _out buffer.
        self._fin_loop: Optional[object] = None
        self._fin_thread: Optional[threading.Thread] = None
        self._needs_finisher = (not server.disable_llm) or server.simulate

    # -- lifecycle ---------------------------------------------------------

    def start(self, *, thread: bool = False) -> None:
        if self.server.warmup:
            self.server._warmup()
        if self._needs_finisher:
            import asyncio

            self._fin_loop = asyncio.new_event_loop()
            self._fin_thread = threading.Thread(
                target=self._fin_loop.run_forever,
                name="native-llm-finisher", daemon=True)
            self._fin_thread.start()
        # pop up to the largest bucket per batch: anything smaller pads
        # the device step with dead rows under closed-loop load
        self.fe = NativeFrontend(self.server.host, self.server.port,
                                 reuse_port=self.server.reuse_port,
                                 max_pop=max(NativeFrontend.MAX_POP,
                                             self.buckets[-1]))
        self._running = True
        logger.info("native HTTP front-end on http://%s:%s",
                    self.server.host, self.fe.port)
        if thread:
            self._thread = threading.Thread(
                target=self.serve_forever, name="native-frontend-loop",
                daemon=True)
            self._thread.start()

    @property
    def bound_port(self) -> int:
        return self.fe.port if self.fe else self.server.port

    def stop(self) -> None:
        self._running = False
        if self.fe is not None:
            self.fe.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None
        else:
            if self.fe is not None:
                self.fe.close()
                self.fe = None
        if self._fin_loop is not None:
            self._fin_loop.call_soon_threadsafe(self._fin_loop.stop)
            if self._fin_thread is not None:
                self._fin_thread.join(timeout=10)
                self._fin_thread = None
            self._fin_loop.close()
            self._fin_loop = None

    # -- loop --------------------------------------------------------------

    def serve_forever(self) -> None:
        last_n = 0
        try:
            while self._running:
                # the min-fill wait engages only under real load (the
                # previous pop was a multi-query batch): a lone request
                # must not pay fill_ms of latency waiting for company
                fill = self.fill_ms if last_n >= 32 else 0
                # with a device batch in flight, poll instead of block:
                # if no new work arrived, go drain the pending batch (the
                # blocking fetch) — new requests accumulate in C++ while
                # the host is busy, so this never spins hot
                pending = self._pending is not None
                reqs = self.fe.next(self.fe.max_pop,
                                    first_timeout_ms=0 if pending else 200,
                                    window_ms=self.window_ms,
                                    fill_n=self.buckets[-1] if fill else 0,
                                    fill_ms=fill)
                if reqs is None:
                    # shutdown: deliver the in-flight batch's responses
                    # before the IO plane closes rather than dropping them
                    self._drain_pending()
                    self._flush()
                    break
                if not reqs:
                    if pending:
                        self._drain_pending()
                        self._flush()
                    else:
                        last_n = 0
                    continue
                last_n = len(reqs)
                self._handle(reqs)
        finally:
            if self.fe is not None:
                self.fe.close()
                self.fe = None

    # -- request routing -----------------------------------------------------

    def _respond(self, rid: int, status: int, body,
                 ctype: bytes = b"application/json") -> None:
        self._out.append((rid, status, ctype, body))

    def _handle(self, reqs) -> None:
        work: List[_Work] = []
        try:
            for rid, method, path, qs, body in reqs:
                try:
                    self._route(rid, method, path, qs, body, work)
                except Exception as e:  # never kill the loop on one request
                    logger.exception("request handling failed")
                    self._respond(rid, 500, f"Internal error: {e}",
                                  ctype=b"text/plain; charset=utf-8")
            if work:
                self._run_queries(work)
            elif self._pending is not None:
                # a pop of pure non-query traffic must not strand the
                # in-flight batch (pipeline mode): its results are ready,
                # drain and deliver them with this pass's flush
                self._drain_pending()
        finally:
            self._flush()

    def _flush(self) -> None:
        out, self._out = self._out, []
        if out:
            self.fe.respond_many(out)

    def _route(self, rid, method, path, qs, body, work: List[_Work]) -> None:
        if path == b"/query":
            params: Dict[str, str] = {}
            if method == 1 and body:
                # POST /query: form-encoded fields override the query
                # string (reference parity) — parse the body first so its
                # first-occurrence values win
                _parse_qs_first(body.decode("utf-8", "replace"), params)
            _parse_qs_first(qs.decode("utf-8", "replace"), params)

            first = params.get

            query = first("q", "")
            choices = first("choices", "")
            question_id = first("qid", "")
            # validation parity (reference http_server.py:117-130)
            if not query:
                return self._respond(rid, 400, "Please provide a query",
                                       ctype=b"text/plain; charset=utf-8")
            if not choices:
                return self._respond(rid, 400, "Please provide choices",
                                       ctype=b"text/plain; charset=utf-8")
            if self.world.name == "feb4rag" and not question_id:
                return self._respond(
                    rid, 400,
                    "For FeB4RAG, please provide a question ID (qid)",
                    ctype=b"text/plain; charset=utf-8")
            try:
                choices = json.loads(choices)
            except json.JSONDecodeError:
                return self._respond(rid, 400, "Invalid choices format",
                                       ctype=b"text/plain; charset=utf-8")
            stream = first("stream") in ("1", "true")
            work.append(_Work(rid, query, choices, question_id,
                              stream=stream))
            return None

        if path == b"/query/batch" and method == 1:
            try:
                data = json.loads(body)
            except (json.JSONDecodeError, UnicodeDecodeError):
                return self._respond(rid, 400, "Invalid JSON body",
                                       ctype=b"text/plain; charset=utf-8")
            queries = data.get("queries") if isinstance(data, dict) else data
            if not isinstance(queries, list) or not queries:
                return self._respond(
                    rid, 400, "Provide a non-empty 'queries' list",
                    ctype=b"text/plain; charset=utf-8")
            group = _Group(rid, len(queries))
            for j, item in enumerate(queries):
                err = None
                if not isinstance(item, dict):
                    err = "Each query must be an object"
                else:
                    query = item.get("q", "")
                    choices = item.get("choices", "")
                    question_id = str(item.get("qid", "") or "")
                    if not query:
                        err = "Please provide a query"
                    elif not choices:
                        err = "Please provide choices"
                    elif self.world.name == "feb4rag" and not question_id:
                        err = ("For FeB4RAG, please provide a question ID "
                               "(qid)")
                    elif isinstance(choices, str):
                        try:
                            choices = json.loads(choices)
                        except json.JSONDecodeError:
                            err = "Invalid choices format"
                if err is not None:
                    self._group_done(group, j, {"error": err})
                else:
                    work.append(_Work(rid, query, choices, question_id,
                                      group=group, gidx=j))
            return None

        if path == b"/healthz":
            return self._respond(rid, 200, _dumps({
                "status": "ok",
                "world": self.world.name,
                "strategy": self.strategy,
                "total_docs": self.engine.shard_set.total_docs,
                "index_bytes": self.engine.shard_set.index_bytes,
            }))

        if path == b"/stats":
            snap = self.server.metrics.snapshot()
            snap["frontend"] = {"kind": "native", **self.fe.stats()}
            return self._respond(rid, 200, _dumps(snap))

        if path in (b"/docs/add", b"/docs/delete") and method == 1:
            # live index updates through the C++ plane: the sync cores
            # are shared with the asyncio handlers (engine update lock
            # serializes against in-flight search dispatches)
            try:
                data = json.loads(body) if body else {}
            except (json.JSONDecodeError, UnicodeDecodeError):
                return self._respond(rid, 400, "Invalid JSON body",
                                       ctype=b"text/plain; charset=utf-8")
            fn = (self.server.docs_add_sync if path == b"/docs/add"
                  else self.server.docs_delete_sync)
            status, res = fn(data)
            if status != 200:
                return self._respond(rid, status, res,
                                       ctype=b"text/plain; charset=utf-8")
            return self._respond(rid, 200, _dumps(res))

        if path == b"/admin/snapshot" and method == 1:
            status, res = self.server.snapshot_sync()
            if status != 200:
                return self._respond(rid, status, res,
                                       ctype=b"text/plain; charset=utf-8")
            return self._respond(rid, 200, _dumps(res))

        if path == b"/admin/profile" and method == 1:
            return self._profile(rid, body)

        self._respond(
            rid, 501,
            f"{path.decode('utf-8', 'replace')} is not implemented",
            ctype=b"text/plain; charset=utf-8")

    def _profile(self, rid: int, body: bytes) -> None:
        """``POST /admin/profile`` on the native plane: the capture
        window runs on a helper thread (the serving loop must keep
        draining batches during it) and responds via the thread-safe
        fe_respond."""
        try:
            data = json.loads(body) if body else {}
        except (json.JSONDecodeError, UnicodeDecodeError):
            return self._respond(rid, 400, "Invalid JSON body",
                                   ctype=b"text/plain; charset=utf-8")
        try:
            seconds = float(data.get("seconds", 2.0))
        except (TypeError, ValueError):
            return self._respond(rid, 400, "'seconds' must be a number",
                                   ctype=b"text/plain; charset=utf-8")
        if not (0.0 < seconds <= 60.0):
            return self._respond(rid, 400, "'seconds' must be in (0, 60]",
                                   ctype=b"text/plain; charset=utf-8")
        if self.server._profiling:
            return self._respond(rid, 409,
                                   "A profile capture is already running",
                                   ctype=b"text/plain; charset=utf-8")
        logdir = data.get("dir") or os.path.join(
            "/tmp", f"ragroute_profile_{int(time.time())}")
        self.server._profiling = True
        fe = self.fe

        def capture():
            import jax

            try:
                jax.profiler.start_trace(logdir)
                try:
                    time.sleep(seconds)
                finally:
                    jax.profiler.stop_trace()
            except RuntimeError as e:
                fe.respond(rid, 500, f"Profiler failed: {e}",
                           ctype=b"text/plain; charset=utf-8")
                return
            finally:
                self.server._profiling = False
            fe.respond(rid, 200, _dumps({"trace_dir": logdir,
                                         "seconds": seconds}))

        threading.Thread(target=capture, name="native-profile",
                         daemon=True).start()

    # -- query execution -----------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _embed(self, items: List[_Work]) -> List[_Work]:
        """Fill ``w.embs`` per item; failed items are responded to and
        dropped. Blocking providers with embed_many share ONE batched
        forward (the native-loop equivalent of EmbeddingBatcher)."""
        world = self.world
        texts = []
        for w in items:
            # wikipedia formats query+choices for encoding
            # (reference http_server.py:147-150)
            if world.name == "wikipedia":
                texts.append("\n".join([w.query, " | ".join(w.choices)]))
            else:
                texts.append(w.query)
        ok: List[_Work] = []
        if (getattr(self.provider, "blocking", False)
                and hasattr(self.provider, "embed_many") and len(items) > 1):
            t0 = time.time()
            try:
                many = self.provider.embed_many(
                    texts, [w.qid for w in items])
            except Exception as e:
                for w in items:
                    self._fail(w, e)
                return []
            dt = (time.time() - t0) / max(len(items), 1)
            for w, e in zip(items, many):
                w.embs, w.embed_time = e, dt
                ok.append(w)
            return ok
        rows_wired = self.server._rows_wired
        for w, text in zip(items, texts):
            t0 = time.time()
            try:
                if rows_wired:
                    w.row = self.provider.row_of(w.qid)
                if w.row is None:
                    w.embs = self.provider.embed(text, w.qid)
            except Exception as e:
                self._fail(w, e)
                continue
            w.embed_time = time.time() - t0
            ok.append(w)
        return ok

    def _run_queries(self, work: List[_Work]) -> None:
        items = self._embed(work)
        max_b = self.buckets[-1]
        for i in range(0, len(items), max_b):
            chunk = items[i:i + max_b]
            if not self.pipeline:
                # serial mode: fetch the previous chunk BEFORE dispatching
                # the next — on the in-order tunnel stream a fetch enqueued
                # after the next dispatch would wait for BOTH computations
                # (the measured pipelining regression, BENCHMARKS.md)
                self._drain_pending()
            submitted = None
            try:
                submitted = self._submit_chunk(chunk)
            except Exception as e:
                logger.exception("engine submit failed")
                for w in chunk:
                    self._fail(w, e)
            if self.pipeline:
                # drain the PREVIOUS batch while the device runs this one
                # — its responses flush in this _handle pass
                self._drain_pending()
            self._pending = submitted
        if not self.pipeline:
            self._drain_pending()

    def _drain_pending(self) -> None:
        pc, self._pending = self._pending, None
        if pc is None:
            return
        chunk, pending = pc
        try:
            out = pending.wait()
        except Exception as e:
            logger.exception("engine step failed")
            for w in chunk:
                self._fail(w, e)
            return
        try:
            self._finish_chunk(chunk, out)
        except Exception as e:
            logger.exception("response assembly failed")
            for w in chunk:
                self._fail(w, e)

    def _submit_chunk(self, chunk: List[_Work]):
        embs = pack_query_embs(
            self.engine, [w.row for w in chunk], [w.embs for w in chunk],
            self._bucket(len(chunk)))
        for w in chunk:
            w.t_submit = time.time()
        submit = getattr(self.engine, "search_submit", None)
        if submit is None:
            # engines without a deferred-fetch API (the mesh-sharded
            # ShardedSearch serves via --mesh --frontend native): run the
            # blocking search and wrap the finished output
            out = self.engine.search(
                embs, strategy=self.strategy, staged=self.staged,
                fetch_candidates=self._fetch)
            return chunk, _DoneSearch(out)
        return chunk, submit(
            embs, strategy=self.strategy, staged=self.staged,
            fetch_candidates=self._fetch)

    def _finish_chunk(self, chunk: List[_Work], out) -> None:
        n = len(chunk)
        t_done = time.time()
        srv = self.server
        query_ids = [str(uuid.uuid4()) for _ in chunk]
        # one vectorized [n, N] message-size pass for the whole chunk
        # (uuid4 strings all have one length; feb4rag sizes its payloads
        # from the resolved docs inside _assemble_pre instead)
        msg_sizes_all = None
        if out.msg_base is not None:
            # device-computed sizes: add the (uniform) qid length host-side
            msg_sizes_all = out.msg_base[:n] + len(query_ids[0])
        elif self.world.name != "feb4rag":
            msg_sizes_all = srv._estimate_message_sizes_chunk(
                out.shard_ids[:n], len(query_ids[0]))
        for i, w in enumerate(chunk):
            res = QueryResult(
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
            )
            batch_wait = max(0.0, (t_done - w.t_submit)
                             - res.selection_time - res.doc_select_time)
            t_assemble = time.time()
            query_id = query_ids[i]
            try:
                selected, ds_stats, top_docs, raw_docs = srv._assemble_pre(
                    res, query_id, w.qid,
                    msg_sizes=(None if msg_sizes_all is None
                               else msg_sizes_all[i]))
            except Exception as e:
                logger.exception("assembly failed")
                self._fail(w, e)
                continue
            if self._fin_loop is not None:
                # generation / simulate: the async tail runs on the
                # finisher loop and responds via the thread-safe fe calls
                import asyncio

                asyncio.run_coroutine_threadsafe(
                    self._finish_async(
                        w, res, query_id, selected, ds_stats, top_docs,
                        raw_docs, batch_wait, t_assemble),
                    self._fin_loop)
                continue
            try:
                result = srv._finalize(
                    {"query_id": query_id, "query": w.query, "answer": ""},
                    res, selected=selected, ds_stats=ds_stats,
                    top_docs=top_docs, raw_docs=raw_docs,
                    generate_time=0.0, docs_tokens=0, start=w.start,
                    embedding_time=w.embed_time, batch_wait=batch_wait,
                    t_assemble=t_assemble)
            except Exception as e:
                logger.exception("assembly failed")
                self._fail(w, e)
                continue
            self._deliver(w, result)

    async def _finish_async(self, w: _Work, res, query_id, selected,
                            ds_stats, top_docs, raw_docs, batch_wait,
                            t_assemble) -> None:
        """Post-retrieval tail on the finisher loop: the LLM stage
        (message build, generation with optional SSE deltas through the
        C++ plane, reference timeout discipline) or simulate's LLM_DELAY,
        then finalize + respond. Mirrors FederationServer._process's
        post-batcher half (server.py)."""
        import asyncio

        from ragroute_tpu.config import LLM_DELAY, QUERY_TIMEOUT_S
        from ragroute_tpu.engine.prompts import (
            generate_llm_message, generate_llm_message_wikipedia)

        srv = self.server
        fe = self.fe  # snapshot: serve_forever nulls self.fe at shutdown
        if fe is None:
            return
        streaming = False  # fe stream opened (headers already out)
        response = {"query_id": query_id, "query": w.query, "answer": ""}
        docs_tokens = 0
        generate_time = 0.0
        llm_wall = 0.0
        try:
            async def tail():
                nonlocal docs_tokens, generate_time, llm_wall, streaming
                if srv.disable_llm:
                    response["answer"] = ""
                    if srv.simulate:
                        t0 = time.time()
                        await asyncio.sleep(LLM_DELAY)
                        llm_wall = time.time() - t0
                    return
                t0 = time.time()
                if self.world.name == "wikipedia":
                    messages, ntok = generate_llm_message_wikipedia(
                        w.query, top_docs, w.choices, srv.model)
                else:
                    messages, ntok = generate_llm_message(
                        self.world.name, w.query, top_docs, w.choices,
                        srv.model)
                docs_tokens = ntok
                if w.stream and w.group is None:
                    streaming = True
                    fe.begin_stream(w.rid)
                    llm_res = None
                    async for item in srv.llm.chat_stream(srv.model,
                                                          messages):
                        if isinstance(item, str):
                            fe.stream_chunk(
                                w.rid, "data: "
                                + _dumps({"delta": item}) + "\n\n")
                        else:
                            llm_res = item
                else:
                    llm_res = await srv.llm.chat(srv.model, messages)
                generate_time = (llm_res.generate_time
                                 if llm_res.generate_time >= 0 else -1)
                response["answer"] = llm_res.answer
                llm_wall = time.time() - t0

            await asyncio.wait_for(tail(), timeout=QUERY_TIMEOUT_S)
            result = srv._finalize(
                response, res, selected=selected, ds_stats=ds_stats,
                top_docs=top_docs, raw_docs=raw_docs,
                generate_time=generate_time, docs_tokens=docs_tokens,
                start=w.start, embedding_time=w.embed_time,
                batch_wait=batch_wait, t_assemble=t_assemble,
                llm_wall=llm_wall)
        except asyncio.TimeoutError:
            return self._fail_direct(w, "Search timed out", streaming,
                                     status=504)
        except Exception as e:
            logger.exception("generation tail failed")
            return self._fail_direct(w, str(e), streaming)
        self._deliver_direct(w, result, streaming)

    def _fail_direct(self, w: _Work, msg: str, streaming: bool,
                     status: int = 500) -> None:
        """Failure delivery from the finisher thread (fe calls only)."""
        fe = self.fe
        if fe is None:
            return
        if streaming:
            # headers already out as 200/event-stream: in-band error
            # event then [DONE] (same as the asyncio SSE handler)
            fe.stream_chunk(
                w.rid, "data: " + _dumps({"error": msg}) + "\n\n")
            fe.stream_chunk(w.rid, "data: [DONE]\n\n")
            fe.stream_end(w.rid)
            return
        if w.group is not None:
            return self._group_done(w.group, w.gidx, {"error": msg},
                                    direct=True)
        fe.respond(w.rid, status,
                        (msg if status == 504
                         else f"Internal error: {msg}"),
                        ctype=b"text/plain; charset=utf-8")

    def _deliver_direct(self, w: _Work, result: dict,
                        streaming: bool) -> None:
        """Success delivery from the finisher thread."""
        fe = self.fe
        if fe is None:
            return
        if w.group is not None:
            return self._group_done(w.group, w.gidx, result, direct=True)
        if streaming:
            # final authoritative event (complete /query body) + [DONE]
            body = self._encode_single(result)
            fe.stream_chunk(w.rid, "data: " + body + "\n\n")
            fe.stream_chunk(w.rid, "data: [DONE]\n\n")
            fe.stream_end(w.rid)
            return
        body = self._encode_single(result)
        if w.stream:
            sse = "data: " + body + "\n\ndata: [DONE]\n\n"
            fe.respond(w.rid, 200, sse, ctype=b"text/event-stream")
        else:
            fe.respond(w.rid, 200, body)

    # -- response delivery ---------------------------------------------------

    def _fail(self, w: _Work, e: Exception) -> None:
        if w.group is not None:
            self._group_done(w.group, w.gidx, {"error": str(e)})
        else:
            self._respond(w.rid, 500, f"Internal error: {e}",
                            ctype=b"text/plain; charset=utf-8")

    def _encode_single(self, result: dict) -> str:
        raw = result.pop("__rawdocs__", None)
        if raw is not None:
            body = self.server._splice_raw(_dumps(result), [raw], [result])
            if body is not None:
                return body
        return _dumps(result)

    def _deliver(self, w: _Work, result: dict) -> None:
        if w.group is not None:
            self._group_done(w.group, w.gidx, result)
            return
        body = self._encode_single(result)
        if w.stream:
            # SSE framing parity: with the LLM disabled there are no delta
            # events — one final (authoritative) event, then [DONE]
            sse = "data: " + body + "\n\ndata: [DONE]\n\n"
            self._respond(w.rid, 200, sse, ctype=b"text/event-stream")
        else:
            self._respond(w.rid, 200, body)

    def _group_done(self, group: _Group, idx: int, result,
                    direct: bool = False) -> None:
        with group.lock:
            group.results[idx] = result
            group.remaining -= 1
            if group.remaining > 0:
                return
        results = group.results
        frags, owners = [], []
        for r in results:
            if isinstance(r, dict):
                raw = r.pop("__rawdocs__", None)
                if raw is not None:
                    frags.append(raw)
                    owners.append(r)
        body = _dumps({"results": results})
        if frags:
            spliced = self.server._splice_raw(body, frags, owners)
            body = (spliced if spliced is not None
                    else _dumps({"results": results}))
        if direct:  # finisher thread: the serving-thread _out buffer is
            #         off-limits; fe_respond is the thread-safe path
            self.fe.respond(group.rid, 200, body)
        else:
            self._respond(group.rid, 200, body)
