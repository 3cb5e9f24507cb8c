"""Multi-host dispatcher tests: routing, broadcast fan-out, failover.

Backends are fake aiohttp apps (no models) — the dispatcher is pure host
plumbing, so this runs fast on CPU.
"""
import asyncio

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from chatterbox_tpu.serve.dispatcher import create_dispatcher_app


def _fake_backend(name: str, record: list):
    app = web.Application()

    async def tts(request: web.Request):
        record.append((name, "tts"))
        resp = web.StreamResponse(headers={"Content-Type": "audio/wav", "X-Backend": name})
        await resp.prepare(request)
        for piece in (b"RIFF", b"data-" + name.encode()):
            await resp.write(piece)
        await resp.write_eof()
        return resp

    async def voices_post(request: web.Request):
        record.append((name, "voices_post"))
        return web.json_response({"voice_id": "v.wav", "backend": name}, status=201)

    async def health(request: web.Request):
        return web.json_response({"status": "ok"})

    app.router.add_route("*", "/tts/generate", tts)
    app.router.add_post("/voices", voices_post)
    app.router.add_get("/health", health)
    return app


def test_dispatcher_routes_and_broadcasts():
    async def run():
        record = []
        b1 = TestServer(_fake_backend("b1", record))
        b2 = TestServer(_fake_backend("b2", record))
        await b1.start_server()
        await b2.start_server()
        disp_app = create_dispatcher_app(
            [f"http://127.0.0.1:{b1.port}", f"http://127.0.0.1:{b2.port}"]
        )
        client = TestClient(TestServer(disp_app))
        await client.start_server()
        try:
            # streaming requests fan over both backends
            used = set()
            for _ in range(4):
                r = await client.get("/tts/generate?text=hi&api_key=k")
                assert r.status == 200
                used.add(r.headers["X-Backend"])
                body = await r.read()
                assert body.startswith(b"RIFF")
            assert used == {"b1", "b2"}

            # control-plane broadcast hits every backend
            record.clear()
            r = await client.post("/voices", data=b"x")
            assert r.status == 201
            assert {(n, op) for n, op in record} == {("b1", "voices_post"), ("b2", "voices_post")}

            # dispatcher health/status endpoint
            r = await client.get("/dispatcher-status")
            status = await r.json()
            assert len(status["backends"]) == 2
        finally:
            await client.close()
            await b1.close()
            await b2.close()

    asyncio.run(run())


def test_dispatcher_failover():
    async def run():
        record = []
        b1 = TestServer(_fake_backend("b1", record))
        await b1.start_server()
        dead = "http://127.0.0.1:9"  # nothing listens there
        disp_app = create_dispatcher_app([dead, f"http://127.0.0.1:{b1.port}"])
        client = TestClient(TestServer(disp_app))
        await client.start_server()
        try:
            # first request may hit the dead backend (502) which marks it
            # unhealthy; subsequent requests must route to the live one.
            statuses = []
            for _ in range(3):
                r = await client.get("/tts/generate?text=hi")
                statuses.append(r.status)
                await r.read()
            assert statuses[-1] == 200
            assert 200 in statuses
        finally:
            await client.close()
            await b1.close()

    asyncio.run(run())
