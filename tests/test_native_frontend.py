"""Native (C++) HTTP front-end: protocol conformance + parity with the
asyncio front-end (synthetic world, CPU backend).

The native front-end (``native/frontend.cpp`` +
``engine/native_frontend.py``) must return byte-compatible response
bodies with the aiohttp server for the retrieval surface it serves —
both paths share the sync assembly helpers, and these tests pin the
contract: validation strings, the reference metadata schema
(reference ``http_server.py:105-166``), raw doc splicing, bulk and SSE
framing, keep-alive and pipelined connections.
"""

import http.client
import json
import os
import socket
import sys
import threading
import time
from urllib.parse import quote

import pytest

from ragroute_tpu.engine.native_frontend import (
    NativeFederationServer,
    native_frontend_available,
)

sys.path.insert(0, "tests")
from test_server import make_server  # noqa: E402

pytestmark = pytest.mark.skipif(
    not native_frontend_available(),
    reason="native frontend unavailable (g++ missing)")

CHOICES = {"A": "opt a", "B": "opt b"}


def start_native(**kw):
    syn, server = make_server(**kw)
    ns = NativeFederationServer(server)
    ns.start(thread=True)
    return syn, server, ns


def http_get(port, path, headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", path, headers=headers or {})
    r = conn.getresponse()
    body = r.read()
    out = (r.status, dict(r.getheaders()), body)
    conn.close()
    return out


def http_post(port, path, body, ctype="application/json"):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", path, body=body, headers={"Content-Type": ctype})
    r = conn.getresponse()
    out = (r.status, r.read())
    conn.close()
    return out


def query_path(q, choices, qid, extra=""):
    return (f"/query?q={quote(q)}&choices={quote(json.dumps(choices))}"
            f"&qid={qid}{extra}")


def test_query_roundtrip_schema():
    syn, server, ns = start_native()
    try:
        q = syn.questions[0]
        status, headers, body = http_get(
            ns.bound_port,
            query_path(q["question"], q["options"], q["qid"]))
        assert status == 200
        assert headers["Content-Type"].startswith("application/json")
        data = json.loads(body)
        assert data["answer"] == ""
        assert data["query"] == q["question"]
        md = data["metadata"]
        for key in ("data_sources", "embedding_time", "selection_time",
                    "doc_select_time", "generate_time",
                    "data_sources_stats", "top_docs", "e2e_time",
                    "docs_tokens", "llm"):
            assert key in md, key
        assert isinstance(md["top_docs"], list)
        assert len(md["top_docs"]) > 0
        # raw splice fast path produced real parsed docs, not the token
        assert all(isinstance(d, dict) for d in md["top_docs"])
    finally:
        ns.stop()


def test_parity_with_aiohttp_frontend():
    """Same engine/world/query through both front-ends → identical docs,
    routing, and message sizes (volatile fields excluded)."""
    import asyncio

    import aiohttp

    async def aio_response(q):
        syn, server = make_server()
        await server.start()
        try:
            async with aiohttp.ClientSession() as session:
                url = (f"http://127.0.0.1:{server.bound_port}"
                       + query_path(q["question"], q["options"], q["qid"]))
                async with session.get(url) as resp:
                    assert resp.status == 200
                    return await resp.json()
        finally:
            await server.stop()

    syn, server, ns = start_native()
    try:
        q = syn.questions[1]
        status, _, body = http_get(
            ns.bound_port, query_path(q["question"], q["options"],
                                      q["qid"]))
        assert status == 200
        native = json.loads(body)
        aio = asyncio.run(aio_response(q))
    finally:
        ns.stop()

    def normalize(r):
        md = r["metadata"]
        return {
            "query": r["query"],
            "answer": r["answer"],
            "data_sources": md["data_sources"],
            "top_docs": md["top_docs"],
            "docs_tokens": md["docs_tokens"],
            "llm": md["llm"],
            "routing_strategy": md["routing_strategy"],
            "message_sizes": {k: v["message_size"]
                              for k, v in md["data_sources_stats"].items()},
        }

    assert normalize(native) == normalize(aio)


def test_validation_parity():
    syn, server, ns = start_native()
    try:
        port = ns.bound_port
        status, _, body = http_get(port, "/query?choices=%7B%7D")
        assert (status, body) == (400, b"Please provide a query")
        status, _, body = http_get(port, "/query?q=hello")
        assert (status, body) == (400, b"Please provide choices")
        status, _, body = http_get(port, "/query?q=hello&choices=notjson")
        assert (status, body) == (400, b"Invalid choices format")
        status, _, body = http_get(port, "/nope")
        assert status == 501
    finally:
        ns.stop()


def test_keepalive_and_sequential_requests():
    syn, server, ns = start_native()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", ns.bound_port,
                                          timeout=60)
        ids = []
        for i in range(3):
            q = syn.questions[i % len(syn.questions)]
            conn.request("GET", query_path(q["question"], q["options"],
                                           q["qid"]))
            r = conn.getresponse()
            assert r.status == 200
            assert r.getheader("Connection") == "keep-alive"
            ids.append(json.loads(r.read())["query_id"])
        conn.close()
        assert len(set(ids)) == 3  # three distinct responses, one socket
    finally:
        ns.stop()


def test_connection_close_honoured():
    syn, server, ns = start_native()
    try:
        q = syn.questions[0]
        status, headers, body = http_get(
            ns.bound_port, query_path(q["question"], q["options"],
                                      q["qid"]),
            headers={"Connection": "close"})
        assert status == 200
        assert headers["Connection"] == "close"
        json.loads(body)
    finally:
        ns.stop()


def test_post_form_encoded_query():
    syn, server, ns = start_native()
    try:
        q = syn.questions[0]
        form = (f"q={quote(q['question'])}"
                f"&choices={quote(json.dumps(q['options']))}"
                f"&qid={q['qid']}")
        status, body = http_post(ns.bound_port, "/query", form,
                                 ctype="application/x-www-form-urlencoded")
        assert status == 200
        assert json.loads(body)["query"] == q["question"]
    finally:
        ns.stop()


def test_bulk_endpoint_and_error_slots():
    syn, server, ns = start_native()
    try:
        q0, q1 = syn.questions[0], syn.questions[1]
        payload = {"queries": [
            {"q": q0["question"], "choices": json.dumps(q0["options"]),
             "qid": q0["qid"]},
            {"q": "", "choices": "{}", "qid": "x"},       # missing query
            {"q": q1["question"], "choices": q1["options"],
             "qid": q1["qid"]},                           # inline choices
            "not an object",
        ]}
        status, body = http_post(ns.bound_port, "/query/batch",
                                 json.dumps(payload))
        assert status == 200
        results = json.loads(body)["results"]
        assert len(results) == 4
        assert results[0]["query"] == q0["question"]
        assert isinstance(results[0]["metadata"]["top_docs"], list)
        assert results[1] == {"error": "Please provide a query"}
        assert results[2]["query"] == q1["question"]
        assert results[3] == {"error": "Each query must be an object"}

        # bulk member results match the single-query endpoint
        status, _, single = http_get(
            ns.bound_port, query_path(q0["question"], q0["options"],
                                      q0["qid"]))
        single = json.loads(single)
        assert (results[0]["metadata"]["top_docs"]
                == single["metadata"]["top_docs"])
    finally:
        ns.stop()


def test_sse_stream_framing():
    """stream=1 with --disable-llm: one authoritative final event (raw
    docs spliced in, never the internal token) then [DONE]."""
    syn, server, ns = start_native()
    try:
        q = syn.questions[0]
        status, headers, body = http_get(
            ns.bound_port, query_path(q["question"], q["options"],
                                      q["qid"], extra="&stream=1"))
        assert status == 200
        assert headers["Content-Type"].startswith("text/event-stream")
        events = [line[len("data: "):] for line in
                  body.decode().split("\n\n") if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        final = json.loads(events[-2])
        assert final["answer"] == ""
        docs = final["metadata"]["top_docs"]
        assert isinstance(docs, list) and all(
            isinstance(d, dict) for d in docs)
    finally:
        ns.stop()


def test_health_and_stats():
    syn, server, ns = start_native()
    try:
        q = syn.questions[0]
        status, _, _ = http_get(
            ns.bound_port, query_path(q["question"], q["options"],
                                      q["qid"]))
        assert status == 200
        status, _, body = http_get(ns.bound_port, "/healthz")
        assert status == 200
        health = json.loads(body)
        assert health["status"] == "ok"
        assert health["world"] == "medrag"
        status, _, body = http_get(ns.bound_port, "/stats")
        assert status == 200
        stats = json.loads(body)
        assert stats["frontend"]["kind"] == "native"
        assert stats["frontend"]["requests"] >= 2
        assert stats["num_queries"] >= 1
    finally:
        ns.stop()


def test_concurrent_load_batches():
    """Concurrent closed-loop clients all succeed, and the C++ pop loop
    actually forms multi-query device batches."""
    syn, server, ns = start_native()
    try:
        port = ns.bound_port
        ok = []
        errs = []

        def client(tid):
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=120)
            try:
                for i in range(6):
                    q = syn.questions[(tid + i) % len(syn.questions)]
                    conn.request("GET", query_path(
                        q["question"], q["options"], q["qid"]))
                    r = conn.getresponse()
                    data = r.read()
                    if r.status == 200:
                        json.loads(data)
                        ok.append(1)
                    else:
                        errs.append((r.status, data))
            finally:
                conn.close()

        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs[:3]
        assert len(ok) == 72
        snap = server.metrics.snapshot()
        assert snap["num_queries"] == 72
        # at least one device step carried more than one query
        assert snap["batch_size"]["max"] > 1
    finally:
        ns.stop()


def test_pipelined_requests_in_order():
    """Two requests written back-to-back on one socket come back in
    order (the C++ side preserves pipeline order even though Python may
    finish them in any order)."""
    syn, server, ns = start_native()
    try:
        q0, q1 = syn.questions[0], syn.questions[1]
        raw = b""
        for q in (q0, q1):
            raw += (f"GET {query_path(q['question'], q['options'], q['qid'])}"
                    f" HTTP/1.1\r\nHost: x\r\n\r\n").encode()
        s = socket.create_connection(("127.0.0.1", ns.bound_port),
                                     timeout=60)
        s.sendall(raw)
        buf = b""
        deadline = time.time() + 60
        while buf.count(b"HTTP/1.1 200") < 2 and time.time() < deadline:
            s.settimeout(max(0.1, deadline - time.time()))
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
        s.close()
        # split the two responses on their Content-Length framing
        first_hdr_end = buf.find(b"\r\n\r\n")
        assert first_hdr_end > 0
        hdr = buf[:first_hdr_end].decode()
        clen = int([ln.split(":")[1] for ln in hdr.split("\r\n")
                    if ln.lower().startswith("content-length")][0])
        body1 = buf[first_hdr_end + 4:first_hdr_end + 4 + clen]
        rest = buf[first_hdr_end + 4 + clen:]
        assert rest.startswith(b"HTTP/1.1 200")
        body2 = rest[rest.find(b"\r\n\r\n") + 4:]
        assert json.loads(body1)["query"] == q0["question"]
        assert json.loads(body2)["query"] == q1["question"]
    finally:
        ns.stop()


def test_accepts_llm_enabled_server():
    """Round 4: the native plane serves the WHOLE surface — an
    LLM-enabled server constructs (generation rides the finisher loop;
    e2e coverage in test_native_whole_surface.py)."""
    syn, server = make_server(disable_llm=False)
    ns = NativeFederationServer(server)
    assert ns._needs_finisher


def test_parser_robustness_fuzz():
    """Deterministic fuzz of the C++ HTTP parser: garbage bytes, huge
    headers, split writes, bogus Content-Length, unsupported
    Transfer-Encoding, early disconnects. The server must stay alive
    (every connection either gets an error status or a clean close) and
    still answer a well-formed query afterwards."""
    import random

    syn, server, ns = start_native()
    rng = random.Random(0xF00D)
    try:
        port = ns.bound_port
        cases = [
            b"\x00\x01\x02\xff\xfe garbage\r\n\r\n",
            b"GET\r\n\r\n",
            b"GET /query HTTP/1.1\r\n" + b"X-Pad: " + b"a" * 70000
            + b"\r\n\r\n",
            b"POST /query HTTP/1.1\r\nContent-Length: 999999999999\r\n\r\n",
            b"POST /query HTTP/1.1\r\nContent-Length: -5\r\n\r\nhello",
            b"POST /q HTTP/1.1\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"5\r\nhello\r\n0\r\n\r\n",
            b"GET /nope HTTP/1.1\r\nHost: x\r\n\r\n",
            bytes(rng.getrandbits(8) for _ in range(4096)),
            b"GET /query?q=a&choices=bad HTTP/1.0\r\n\r\n",
        ]
        for raw in cases:
            s = socket.create_connection(("127.0.0.1", port), timeout=30)
            try:
                # split writes exercise partial-read reassembly
                mid = len(raw) // 2
                s.sendall(raw[:mid])
                time.sleep(0.01)
                s.sendall(raw[mid:])
                # short timeout: an incomplete header legitimately gets
                # NO response (the parser waits for more bytes)
                s.settimeout(2)
                try:
                    s.recv(65536)  # response or clean close — both fine
                except socket.timeout:
                    pass
            except OSError:
                pass  # reset mid-write is an acceptable rejection
            finally:
                s.close()
        # a few abrupt disconnects mid-request
        for _ in range(5):
            s = socket.create_connection(("127.0.0.1", port), timeout=30)
            s.sendall(b"GET /query?q=a")
            s.close()
        # the server must still serve a valid query
        q0 = syn.questions[0]
        status, _, body = http_get(
            port, query_path(q0["question"], q0["options"], q0["qid"]))
        assert status == 200
        assert json.loads(body)["query"] == q0["question"]
    finally:
        ns.stop()


def test_malformed_pipelined_request_single_400():
    """A malformed request pipelined after a valid one gets exactly ONE
    400 and the connection closes — the parser must latch close_after
    immediately, not when the error response drains, or every further
    read event re-parses the same bad bytes and queues duplicate 400s
    (regression: observed as duplicate error responses under pipelining
    while the valid request was still in the Python device step)."""
    syn, server, ns = start_native()
    try:
        q0 = syn.questions[0]
        valid = (f"GET {query_path(q0['question'], q0['options'], q0['qid'])}"
                 f" HTTP/1.1\r\nHost: x\r\n\r\n").encode()
        s = socket.create_connection(("127.0.0.1", ns.bound_port),
                                     timeout=60)
        s.sendall(valid + b"BOGUS\r\n\r\n")
        time.sleep(0.1)
        try:
            # a second write forces another read event on the conn while
            # (possibly) the valid request is still being processed
            s.sendall(b"MORE JUNK\r\n\r\n")
        except OSError:
            pass  # already closed — fine
        buf = b""
        deadline = time.time() + 60
        while time.time() < deadline:
            s.settimeout(max(0.1, deadline - time.time()))
            try:
                chunk = s.recv(65536)
            except socket.timeout:
                break
            if not chunk:
                break  # server closed the conn, as it must
            buf += chunk
        s.close()
        assert buf.count(b"HTTP/1.1 200") == 1
        assert buf.count(b"HTTP/1.1 400") == 1
    finally:
        ns.stop()


def test_mixed_burst_batched_responses():
    """Valid queries and validation failures arriving in ONE pop batch
    are all answered correctly through the batched fe_respond_many path
    (errors queue into the same outbox as results)."""
    syn, server, ns = start_native()
    try:
        port = ns.bound_port
        results = {}

        def client(tid):
            q = syn.questions[tid % len(syn.questions)]
            if tid % 3 == 2:
                path = "/query?choices=%5B%5D"  # missing q -> 400
            else:
                path = query_path(q["question"], q["options"], q["qid"])
            status, _, body = http_get(port, path)
            results[tid] = (status, body)

        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(9)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for tid, (status, body) in results.items():
            if tid % 3 == 2:
                assert status == 400
                assert body == b"Please provide a query"
            else:
                assert status == 200
                assert json.loads(body)["metadata"]["top_docs"]
    finally:
        ns.stop()


def test_respond_many_skips_unknown_ids():
    """fe_respond_many returns the accepted count and ignores ids that
    are not in flight (e.g. a connection that died mid-step)."""
    syn, server, ns = start_native()
    try:
        port = ns.bound_port
        # a real request we answer manually alongside two bogus ids
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200
        r.read()
        conn.close()
        accepted = ns.fe.respond_many([
            (1 << 60, 200, b"application/json", b"{}"),
            ((1 << 60) + 1, 500, b"text/plain", b"nope"),
        ])
        assert accepted == 0
    finally:
        ns.stop()


def test_pipelined_serve_loop_parity():
    """RAGROUTE_NATIVE_PIPELINE=1 (double-buffered device batches) serves
    the same responses as the default serial loop under concurrent load.

    Default-off on the tunnel backend (measured regression — the
    in-order stream serializes the fetch behind the next batch's
    dispatch, BENCHMARKS.md), but the path must stay correct for
    out-of-order backends."""
    os.environ["RAGROUTE_NATIVE_PIPELINE"] = "1"
    try:
        syn, server, ns = start_native()
        assert ns.pipeline
    finally:
        del os.environ["RAGROUTE_NATIVE_PIPELINE"]
    try:
        port = ns.bound_port
        ok, errs = [], []

        def client(tid):
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=120)
            try:
                for i in range(4):
                    q = syn.questions[(tid + i) % len(syn.questions)]
                    conn.request("GET", query_path(
                        q["question"], q["options"], q["qid"]))
                    r = conn.getresponse()
                    data = r.read()
                    if r.status == 200:
                        ok.append(json.loads(data))
                    else:
                        errs.append((r.status, data))
            finally:
                conn.close()

        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs[:3]
        assert len(ok) == 32
        # drained pending batch: nothing left in flight after idle
        time.sleep(0.5)
        assert ns._pending is None
        # responses carry the full schema with real docs
        for data in ok[:4]:
            assert len(data["metadata"]["top_docs"]) == syn.world.k

        # single-query parity against the serial loop, volatile fields out
        q = syn.questions[2]
        status, _, body = http_get(
            port, query_path(q["question"], q["options"], q["qid"]))
        assert status == 200
        piped = json.loads(body)
    finally:
        ns.stop()

    syn2, server2, ns2 = start_native()
    try:
        assert not ns2.pipeline  # default stays serial
        status, _, body = http_get(
            ns2.bound_port, query_path(q["question"], q["options"],
                                       q["qid"]))
        assert status == 200
        serial = json.loads(body)
    finally:
        ns2.stop()

    def normalize(r):
        md = r["metadata"]
        return (r["query"], r["answer"], md["data_sources"],
                json.dumps(md["top_docs"], sort_keys=True))

    assert normalize(piped) == normalize(serial)
