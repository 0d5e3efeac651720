"""Token streaming: service async-generator + /query?stream=1 SSE path."""

import asyncio
import json
import sys

import pytest

aiohttp = pytest.importorskip("aiohttp")

from ragroute_tpu.engine.llm import LLMClient, LLMResult  # noqa: E402
from ragroute_tpu.llm.continuous import demo_continuous_service  # noqa: E402
from ragroute_tpu.llm.service import demo_service  # noqa: E402


def test_service_chat_stream_prefix_consistent():
    svc = demo_continuous_service(max_new_tokens=16, slots=2,
                                  chunk_steps=3)

    async def run():
        deltas, final = [], None
        async for item in svc.chat_stream(
                [{"role": "user", "content": "stream me"}]):
            if isinstance(item, dict):
                final = item["final"]
            else:
                deltas.append(item)
        # non-stream chat on a fresh service gives the same text
        svc2 = demo_continuous_service(max_new_tokens=16, slots=2,
                                       chunk_steps=3)
        ref = await svc2.chat([{"role": "user", "content": "stream me"}])
        await svc.stop()
        await svc2.stop()
        return deltas, final, ref

    deltas, final, ref = asyncio.run(run())
    assert final == ref
    joined = "".join(deltas)
    assert final.startswith(joined)
    assert len(deltas) >= 2  # actually incremental (several chunks)


def test_llm_client_stream_fallback_non_streaming_backend():
    """Backends without chat_stream emit one whole-answer delta then the
    LLMResult — the consumer loop is uniform."""
    client = LLMClient("echo")

    async def run():
        items = []
        async for item in client.chat_stream(
                "llama3.1-8B-instruct", [{"role": "user", "content": "x"}]):
            items.append(item)
        return items

    items = asyncio.run(run())
    assert len(items) == 2
    assert isinstance(items[0], str) and items[0]
    assert isinstance(items[1], LLMResult) and items[1].ok
    assert items[1].answer == items[0]


def test_query_sse_roundtrip():
    """/query?stream=1: delta events then the full response then [DONE];
    the final body matches the non-stream /query schema and answer."""
    sys.path.insert(0, "tests")
    from test_server import make_server, query_server

    svc = demo_continuous_service(max_new_tokens=12, slots=2,
                                  chunk_steps=3)

    async def run():
        syn, server = make_server(
            disable_llm=False, llm=LLMClient("jax", service=svc))
        await server.start()
        try:
            q = syn.questions[0]
            async with aiohttp.ClientSession() as session:
                enc_q = aiohttp.helpers.quote(q["question"])
                enc_c = aiohttp.helpers.quote(json.dumps(q["options"]))
                url = (f"http://127.0.0.1:{server.bound_port}/query?"
                       f"q={enc_q}&choices={enc_c}&qid={q['qid']}&stream=1")
                async with session.get(url) as resp:
                    assert resp.status == 200
                    assert resp.headers["Content-Type"].startswith(
                        "text/event-stream")
                    raw = (await resp.read()).decode()
            events = [line[len("data: "):]
                      for line in raw.split("\n\n")
                      if line.startswith("data: ")]
            assert events[-1] == "[DONE]"
            final = json.loads(events[-2])
            deltas = [json.loads(e)["delta"] for e in events[:-2]]

            # same query through the plain path for schema/answer parity
            status, plain = await query_server(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert status == 200
            return deltas, final, plain
        finally:
            await server.stop()
            await svc.stop()

    deltas, final, plain = asyncio.run(run())
    assert set(final) == set(plain)
    assert final["answer"] == plain["answer"]
    assert final["answer"].startswith("".join(deltas))
    assert len(final["metadata"]["top_docs"]) == len(
        plain["metadata"]["top_docs"])


def test_query_sse_disable_llm_and_error_events():
    """stream=1 is honoured with --disable-llm (SSE framing, empty answer),
    and an engine/provider failure mid-stream emits an in-band error event
    followed by [DONE] instead of tearing the connection down."""
    sys.path.insert(0, "tests")
    from test_server import make_server

    async def fetch_events(port, q, options, qid):
        async with aiohttp.ClientSession() as session:
            enc_q = aiohttp.helpers.quote(q)
            enc_c = aiohttp.helpers.quote(json.dumps(options))
            url = (f"http://127.0.0.1:{port}/query?"
                   f"q={enc_q}&choices={enc_c}&qid={qid}&stream=1")
            async with session.get(url) as resp:
                assert resp.status == 200
                assert resp.headers["Content-Type"].startswith(
                    "text/event-stream")
                raw = (await resp.read()).decode()
        return [line[len("data: "):] for line in raw.split("\n\n")
                if line.startswith("data: ")]

    async def run():
        syn, server = make_server()  # disable_llm=True default
        await server.start()
        try:
            q = syn.questions[0]
            events = await fetch_events(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert events[-1] == "[DONE]"
            final = json.loads(events[-2])
            assert final["answer"] == ""
            assert "top_docs" in final["metadata"]

            # now force a failure inside _process: the provider raises
            def boom(query, qid):
                raise RuntimeError("encoder exploded")

            server.provider = type("P", (), {"embed": staticmethod(boom)})()
            events = await fetch_events(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert events[-1] == "[DONE]"
            err = json.loads(events[-2])
            assert "encoder exploded" in err["error"]
        finally:
            await server.stop()

    asyncio.run(run())
