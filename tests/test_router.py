"""Multi-host router tests: balancing, failover, health, and fan-out.

Backends are stub aiohttp apps (no engine needed) so these tests exercise
exactly the router logic in gsv_tts_tpu/serving/router.py.
"""
import asyncio
import json

import pytest

pytest.importorskip("aiohttp")

import aiohttp
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from gsv_tts_tpu.serving.router import create_router_app


def make_backend(name, fail_health=False, fail_tts=False):
    calls = {"tts": 0, "weights": 0}

    async def health(request):
        if fail_health:
            raise web.HTTPInternalServerError(text="down")
        return web.json_response({"status": "ok", "name": name})

    async def tts(request):
        calls["tts"] += 1
        if fail_tts:
            raise web.HTTPInternalServerError(text="boom")
        body = await request.json() if request.can_read_body else {}
        return web.json_response({"name": name, "echo": body})

    async def stream(request):
        calls["tts"] += 1
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream"})
        await resp.prepare(request)
        for i in range(3):
            await resp.write(f"event: audio\ndata: {name}-{i}\n\n".encode())
        await resp.write(b"event: done\ndata: {}\n\n")
        await resp.write_eof()
        return resp

    async def weights(request):
        calls["weights"] += 1
        return web.json_response({"message": "success", "name": name})

    app = web.Application()
    app.router.add_get("/health", health)
    app.router.add_post("/tts", tts)
    app.router.add_get("/tts", tts)
    app.router.add_post("/tts/stream", stream)
    app.router.add_get("/set_gpt_weights", weights)
    app["calls"] = calls
    return app


def run_async(coro_fn):
    return asyncio.run(coro_fn())


def test_router_balances_and_proxies():
    async def go():
        b1, b2 = make_backend("b1"), make_backend("b2")
        s1, s2 = TestServer(b1), TestServer(b2)
        await s1.start_server()
        await s2.start_server()
        app = create_router_app([str(s1.make_url("")), str(s2.make_url(""))],
                                health_interval=3600)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            names = set()
            for _ in range(4):
                r = await client.post("/tts", json={"text": "hi"})
                assert r.status == 200
                data = await r.json()
                names.add(data["name"])
                assert data["echo"]["text"] == "hi"
            # least-outstanding + round-robin must reach both backends
            assert names == {"b1", "b2"}
            assert b1["calls"]["tts"] == 2 and b2["calls"]["tts"] == 2
        finally:
            await client.close()
            await s1.close()
            await s2.close()

    run_async(go)


def test_router_streams_sse_through():
    async def go():
        b1 = make_backend("b1")
        s1 = TestServer(b1)
        await s1.start_server()
        app = create_router_app([str(s1.make_url(""))], health_interval=3600)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/tts/stream", json={})
            body = await r.text()
            assert r.status == 200
            assert "text/event-stream" in r.headers["Content-Type"]
            assert body.count("event: audio") == 3
            assert "event: done" in body
            assert r.headers["X-GSV-Backend"]
        finally:
            await client.close()
            await s1.close()

    run_async(go)


def test_router_fails_over_to_healthy_backend():
    async def go():
        b2 = make_backend("b2")
        s2 = TestServer(b2)
        await s2.start_server()
        # backend 1 is a closed port: connection errors → failover
        app = create_router_app(["http://127.0.0.1:1",
                                 str(s2.make_url(""))], health_interval=3600)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            for _ in range(3):
                r = await client.post("/tts", json={"text": "x"})
                assert r.status == 200
                assert (await r.json())["name"] == "b2"
            h = await (await client.get("/health")).json()
            assert h["status"] == "ok"
            healthy = {b["url"]: b["healthy"] for b in h["backends"]}
            assert healthy[str(s2.make_url("")).rstrip("/")] is True
            assert healthy["http://127.0.0.1:1"] is False
        finally:
            await client.close()
            await s2.close()

    run_async(go)


def test_router_fanout_weight_switch():
    async def go():
        b1, b2 = make_backend("b1"), make_backend("b2")
        s1, s2 = TestServer(b1), TestServer(b2)
        await s1.start_server()
        await s2.start_server()
        app = create_router_app([str(s1.make_url("")), str(s2.make_url(""))],
                                health_interval=3600)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.get("/set_gpt_weights",
                                 params={"weights_path": "/x.ckpt"})
            data = await r.json()
            assert r.status == 200 and data["ok"]
            assert b1["calls"]["weights"] == 1
            assert b2["calls"]["weights"] == 1
        finally:
            await client.close()
            await s1.close()
            await s2.close()

    run_async(go)


def test_router_resyncs_weights_when_backend_recovers():
    """A backend that is down during a weight-switch broadcast must have
    the desired weights replayed BEFORE it is re-marked healthy — else it
    rejoins the fleet serving the old model (the fanout reports it as
    deferred, not as a failure)."""
    async def go():
        state = {"down": True}
        b_calls = {"weights": 0}

        async def flaky_health(request):
            if state["down"]:
                raise web.HTTPInternalServerError(text="restarting")
            return web.json_response({"status": "ok"})

        async def weights(request):
            b_calls["weights"] += 1
            return web.json_response({
                "message": "success",
                "path": request.query.get("weights_path")})

        flaky = web.Application()
        flaky.router.add_get("/health", flaky_health)
        flaky.router.add_get("/set_gpt_weights", weights)

        ok_b = make_backend("ok")
        s1, s2 = TestServer(ok_b), TestServer(flaky)
        await s1.start_server()
        await s2.start_server()
        app = create_router_app([str(s1.make_url("")), str(s2.make_url(""))],
                                health_interval=3600)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            from gsv_tts_tpu.serving.router import ROUTER_KEY
            router = app[ROUTER_KEY]
            await router._probe_all()  # marks the flaky backend down
            r = await client.get("/set_gpt_weights",
                                 params={"weights_path": "/new.ckpt"})
            data = await r.json()
            # broadcast succeeds with the down backend deferred
            assert r.status == 200 and data["ok"], data
            assert "deferred" in data["backends"][
                str(s2.make_url("")).rstrip("/")]["body"]
            assert b_calls["weights"] == 0
            # backend comes back: the next probe must replay the switch
            state["down"] = False
            await router._probe_all()
            assert b_calls["weights"] == 1, "desired weights not resynced"
            assert all(b.healthy for b in router.backends)
        finally:
            await client.close()
            await s1.close()
            await s2.close()

    run_async(go)


def test_router_all_down_returns_503():
    async def go():
        app = create_router_app(["http://127.0.0.1:1", "http://127.0.0.1:2"],
                                health_interval=3600, max_retries=1)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/tts", json={})
            assert r.status == 503
        finally:
            await client.close()

    run_async(go)


def test_router_sheds_at_capacity():
    """With every healthy backend at max_outstanding, new requests get an
    immediate 503 + Retry-After instead of queueing behind the stall."""
    async def go():
        release = asyncio.Event()
        started = asyncio.Event()

        async def slow_tts(request):
            started.set()
            await release.wait()
            return web.json_response({"name": "slow"})

        app_b = web.Application()
        app_b.router.add_get("/health",
                             lambda r: web.json_response({"status": "ok"}))
        app_b.router.add_post("/tts", slow_tts)
        s1 = TestServer(app_b)
        await s1.start_server()
        app = create_router_app([str(s1.make_url(""))], health_interval=3600,
                                max_outstanding=1)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            first = asyncio.create_task(client.post("/tts", json={}))
            await asyncio.wait_for(started.wait(), timeout=5)
            r2 = await client.post("/tts", json={})
            assert r2.status == 503
            assert r2.headers.get("Retry-After") == "1"
            release.set()
            r1 = await first
            assert r1.status == 200  # the in-flight request still completes
        finally:
            release.set()
            await client.close()
            await s1.close()

    run_async(go)


def test_router_mid_stream_upstream_loss_aborts_not_retries():
    """If the upstream dies after bytes were relayed, the router must abort
    the connection so the client can DETECT the truncation (a clean
    write_eof would make the short body look complete) — and never prepare
    a second response on the same request or replay onto another backend."""
    async def go():
        b2 = make_backend("b2")

        async def dying_stream(request):
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"})
            await resp.prepare(request)
            await resp.write(b"event: audio\ndata: dying-0\n\n")
            await resp.drain()
            request.transport.close()  # abrupt mid-body disconnect
            return resp

        app_b = web.Application()
        app_b.router.add_get("/health",
                             lambda r: web.json_response({"status": "ok"}))
        app_b.router.add_post("/tts/stream", dying_stream)
        s1, s2 = TestServer(app_b), TestServer(b2)
        await s1.start_server()
        await s2.start_server()
        app = create_router_app([str(s1.make_url(""))],  # dying backend only
                                health_interval=3600)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/tts/stream", json={})
            assert r.status == 200
            body = b""
            saw_abort = False
            try:
                async for chunk in r.content.iter_any():
                    body += chunk
            except (aiohttp.ClientPayloadError,
                    aiohttp.http_exceptions.TransferEncodingError):
                saw_abort = True  # chunked stream ended without terminator
            assert b"dying-0" in body         # relayed bytes arrived
            assert b"b2" not in body          # and nothing was replayed
            assert saw_abort, "truncation must be client-detectable"
        finally:
            await client.close()
            await s1.close()
            await s2.close()

    run_async(go)


def test_router_audio_fanout_finds_owning_backend():
    """/audio/{f} files live only on the backend that synthesized them —
    the router must try backends until one returns 200 instead of
    load-balancing into a 404."""
    async def go():
        def backend_with_audio(name, has_file):
            app = make_backend(name)

            async def audio(request):
                if not has_file or \
                        request.match_info["filename"] != "batch_x.wav":
                    raise web.HTTPNotFound(text="nope")
                return web.Response(body=b"RIFFfake", headers={
                    "Content-Type": "audio/wav"})

            app.router.add_get("/audio/{filename}", audio)
            return app

        b1 = backend_with_audio("b1", has_file=False)
        b2 = backend_with_audio("b2", has_file=True)
        s1, s2 = TestServer(b1), TestServer(b2)
        await s1.start_server()
        await s2.start_server()
        app = create_router_app([str(s1.make_url("")), str(s2.make_url(""))],
                                health_interval=3600)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            for _ in range(3):  # every attempt must find b2's copy
                r = await client.get("/audio/batch_x.wav")
                assert r.status == 200
                assert (await r.read()) == b"RIFFfake"
            r404 = await client.get("/audio/missing_everywhere.wav")
            assert r404.status == 404
        finally:
            await client.close()
            await s1.close()
            await s2.close()

    run_async(go)


def test_router_proxies_batched_stream_route():
    """POST /tts/stream/batched must be proxied (it 404'd before r3)."""
    async def go():
        b1 = make_backend("b1")

        async def bstream(request):
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"})
            await resp.prepare(request)
            await resp.write(b"event: done\ndata: {}\n\n")
            await resp.write_eof()
            return resp

        b1.router.add_post("/tts/stream/batched", bstream)
        s1 = TestServer(b1)
        await s1.start_server()
        app = create_router_app([str(s1.make_url(""))], health_interval=3600)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/tts/stream/batched", json={"texts": ["x"]})
            assert r.status == 200
            assert b"event: done" in await r.read()
        finally:
            await client.close()
            await s1.close()

    run_async(go)


def test_router_fails_over_on_capacity_503():
    """A backend's OWN capacity 503 (server --max-streams admission) must
    fail over to a backend with room; only when EVERY candidate sheds is
    the 503 (with its Retry-After) relayed to the client."""
    def make_shedding_backend(name, shed):
        calls = {"tts": 0}

        async def health(request):
            return web.json_response({"status": "ok", "name": name})

        async def tts(request):
            calls["tts"] += 1
            if shed:
                return web.json_response(
                    {"error": "server at capacity"}, status=503,
                    headers={"Retry-After": "1"})
            return web.json_response({"name": name})

        app = web.Application()
        app.router.add_get("/health", health)
        app.router.add_post("/tts", tts)
        app["calls"] = calls
        return app

    async def go():
        full = make_shedding_backend("full", shed=True)
        free = make_shedding_backend("free", shed=False)
        s1, s2 = TestServer(full), TestServer(free)
        await s1.start_server()
        await s2.start_server()
        app = create_router_app([str(s1.make_url("")), str(s2.make_url(""))],
                                health_interval=3600)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # several requests: whichever backend is picked first, every
            # request must land on the free one
            for _ in range(4):
                r = await client.post("/tts", json={"text": "hi"})
                assert r.status == 200
                assert (await r.json())["name"] == "free"
            assert full["calls"]["tts"] >= 1, "503 backend never probed"
            # the shedding backend must still be considered healthy
            rh = await client.get("/health")
            health = await rh.json()
            assert all(b["healthy"] for b in health["backends"])
        finally:
            await client.close()
            await s1.close()
            await s2.close()

    run_async(go)


def test_router_relays_503_when_all_backends_shed():
    async def go():
        async def health(request):
            return web.json_response({"status": "ok"})

        async def tts(request):
            return web.json_response({"error": "server at capacity"},
                                     status=503,
                                     headers={"Retry-After": "1"})

        apps = []
        servers = []
        for _ in range(2):
            app = web.Application()
            app.router.add_get("/health", health)
            app.router.add_post("/tts", tts)
            apps.append(app)
            s = TestServer(app)
            await s.start_server()
            servers.append(s)
        app = create_router_app([str(s.make_url("")) for s in servers],
                                health_interval=3600)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/tts", json={"text": "hi"})
            assert r.status == 503
            assert r.headers.get("Retry-After") == "1"
            assert "capacity" in (await r.json())["error"]
            # shedding is not a failure: both stay healthy
            rh = await client.get("/health")
            assert all(b["healthy"] for b in (await rh.json())["backends"])
        finally:
            await client.close()
            for s in servers:
                await s.close()

    run_async(go)


def test_router_503_failover_not_bounded_by_max_retries():
    """Capacity 503s must not consume the connection-failure retry budget:
    with 4 backends, 3 shedding, and max_retries=1, the single free
    backend is still found every time."""
    async def go():
        async def health(request):
            return web.json_response({"status": "ok"})

        def make(shed, name):
            async def tts(request):
                if shed:
                    return web.json_response({"error": "capacity"},
                                             status=503,
                                             headers={"Retry-After": "1"})
                return web.json_response({"name": name})

            app = web.Application()
            app.router.add_get("/health", health)
            app.router.add_post("/tts", tts)
            return app

        servers = []
        for i in range(4):
            s = TestServer(make(shed=(i != 3), name=f"b{i}"))
            await s.start_server()
            servers.append(s)
        app = create_router_app([str(s.make_url("")) for s in servers],
                                health_interval=3600, max_retries=1)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            for _ in range(6):
                r = await client.post("/tts", json={})
                assert r.status == 200
                assert (await r.json())["name"] == "b3"
        finally:
            await client.close()
            for s in servers:
                await s.close()

    run_async(go)
