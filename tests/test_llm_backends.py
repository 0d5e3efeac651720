"""LLM backend protocol tests against mock daemons.

The reference demonstrably drives a live Ollama daemon
(``http_server.py:309-327``); no daemon exists in this image, so these
tests stand up protocol-faithful mock endpoints and drive the REAL
client code paths (the ollama backend speaks ``POST /api/chat``
non-streaming over aiohttp, honoring ``$OLLAMA_HOST``; the openai
backend speaks ``/v1/chat/completions``), covering the success,
timeout (``generate_time = -1`` parity) and error-wrap behaviors.
"""

import asyncio
import json

from aiohttp import web

from ragroute_tpu.config import LLM_MODELS
from ragroute_tpu.engine.llm import LLMClient

MODEL = next(iter(LLM_MODELS))


async def _start_mock(handler, route):
    app = web.Application()
    app.add_routes([web.post(route, handler)])
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", 0)
    await site.start()
    port = site._server.sockets[0].getsockname()[1]
    return runner, port


def test_ollama_backend_protocol():
    seen = {}

    async def handler(request):
        seen.update(await request.json())
        return web.json_response({
            "model": seen["model"], "done": True,
            "message": {"role": "assistant",
                        "content": "The best answer is B"},
        })

    async def run():
        runner, port = await _start_mock(handler, "/api/chat")
        try:
            llm = LLMClient("ollama",
                            endpoint=f"http://127.0.0.1:{port}")
            res = await llm.chat(MODEL, [
                {"role": "system", "content": "sys"},
                {"role": "user", "content": "q"}])
            assert res.ok
            assert res.answer == "The best answer is B"
            assert res.generate_time >= 0
            # request carried the reference's fields (ollama name,
            # messages, num_predict budget; http_server.py:311-318)
            assert seen["model"] == LLM_MODELS[MODEL]["ollama_name"]
            assert seen["stream"] is False
            assert seen["options"]["num_predict"] == \
                LLM_MODELS[MODEL]["max_tokens"]
            assert seen["messages"][0]["role"] == "system"
        finally:
            await runner.cleanup()

    asyncio.run(run())


def test_ollama_backend_env_host(monkeypatch):
    """$OLLAMA_HOST (with or without scheme) selects the daemon."""
    async def handler(request):
        return web.json_response(
            {"message": {"role": "assistant", "content": "ok"}})

    async def run():
        runner, port = await _start_mock(handler, "/api/chat")
        try:
            import os

            os.environ["OLLAMA_HOST"] = f"127.0.0.1:{port}"
            try:
                res = await LLMClient("ollama").chat(MODEL, [])
            finally:
                del os.environ["OLLAMA_HOST"]
            assert res.ok and res.answer == "ok"
        finally:
            await runner.cleanup()

    asyncio.run(run())


def test_ollama_timeout_parity():
    """240 s daemon timeout -> generate_time = -1 and an error answer
    (reference http_server.py:311-327), exercised with a hanging mock."""
    async def handler(request):
        await asyncio.sleep(5)
        return web.json_response({"message": {"content": "late"}})

    async def run():
        runner, port = await _start_mock(handler, "/api/chat")
        try:
            llm = LLMClient("ollama", endpoint=f"http://127.0.0.1:{port}",
                            timeout_s=0.3)
            res = await llm.chat(MODEL, [])
            assert not res.ok
            assert res.generate_time == -1.0
            assert "timed out" in res.answer
        finally:
            await runner.cleanup()

    asyncio.run(run())


def test_ollama_error_wrapped():
    """Daemon errors come back wrapped in the answer text (the reference
    wraps all generation errors rather than failing the query)."""
    async def handler(request):
        return web.Response(status=500, text="boom")

    async def run():
        runner, port = await _start_mock(handler, "/api/chat")
        try:
            llm = LLMClient("ollama", endpoint=f"http://127.0.0.1:{port}")
            res = await llm.chat(MODEL, [])
            assert not res.ok
            assert res.answer.startswith("Error generating response:")
            assert res.generate_time >= 0
        finally:
            await runner.cleanup()

    asyncio.run(run())


def test_openai_backend_protocol():
    seen = {}

    async def handler(request):
        seen.update(await request.json())
        return web.json_response({
            "choices": [{"message": {"role": "assistant",
                                     "content": "answer C"}}]})

    async def run():
        runner, port = await _start_mock(handler, "/v1/chat/completions")
        try:
            llm = LLMClient("openai", endpoint=f"http://127.0.0.1:{port}")
            res = await llm.chat(MODEL, [{"role": "user", "content": "q"}])
            assert res.ok and res.answer == "answer C"
            assert seen["model"] == LLM_MODELS[MODEL]["hf_name"]
            assert seen["max_tokens"] == LLM_MODELS[MODEL]["max_tokens"]
        finally:
            await runner.cleanup()

    asyncio.run(run())


def test_served_query_with_live_generation():
    """Full reference query path WITH generation enabled: HTTP /query ->
    route -> retrieve -> prompt build (token truncation) -> ollama-
    protocol chat -> answer in the response (the reference's complete
    flow, http_server.py:288-327, against the mock daemon)."""
    from tests.test_server import make_server, query_server

    async def handler(request):
        body = await request.json()
        # the prompt builder must have produced system+user messages
        roles = [m["role"] for m in body["messages"]]
        assert roles[0] == "system" and "user" in roles
        return web.json_response({
            "message": {"role": "assistant",
                        "content": '{"answer_choice": "A"}'}})

    async def run():
        runner, port = await _start_mock(handler, "/api/chat")
        syn, server = make_server(
            disable_llm=False,
            llm=LLMClient("ollama", endpoint=f"http://127.0.0.1:{port}"))
        await server.start()
        try:
            q = syn.questions[0]
            status, body = await query_server(
                server.bound_port, q["question"], q["options"], q["qid"])
            assert status == 200
            assert body["answer"] == '{"answer_choice": "A"}'
            md = body["metadata"]
            assert md["generate_time"] > 0
            assert md["docs_tokens"] > 0  # context actually built
        finally:
            await server.stop()
            await runner.cleanup()

    asyncio.run(run())
