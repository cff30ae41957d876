"""HTTP serving tests (aiohttp app with the tiny end-to-end engine)."""
import asyncio
import base64
import json

import numpy as np
import pytest

pytest.importorskip("aiohttp")
torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import aiohttp
from aiohttp.test_utils import TestClient, TestServer

# heavy requests compile ~a dozen XLA programs on first run; under -n 4
# contention that blew past aiohttp's default 5-min total timeout (r2)
LONG = aiohttp.ClientTimeout(total=1800)

from test_e2e import assets, engine  # fixtures  # noqa: F401


@pytest.fixture()
def client_factory(engine):  # noqa: F811
    from gsv_tts_tpu.serving.server import create_app

    app = create_app(engine)

    def run(coro_fn):
        async def body():
            client = TestClient(TestServer(app))
            await client.start_server()
            try:
                return await coro_fn(client)
            finally:
                await client.close()

        return asyncio.run(body())

    return run


def test_sse_stream_batched(client_factory, assets):  # noqa: F811
    """/tts/stream/batched: every request index streams >=1 tagged audio
    event and exactly one done-marked event; the stream ends with done."""
    async def go(client):
        r = await client.post("/tts/stream/batched", timeout=LONG, json={
            "texts": ["hello streaming batch one.",
                      "and a second concurrent line."],
            "speaker_audio": assets["spk"],
            "prompt_audio": assets["prompt"],
            "prompt_text": "hello there.",
            "stream_chunk": 10,
        })
        body = await r.text()
        return r.status, body

    status, body = client_factory(go)
    assert status == 200
    events = [b for b in body.split("\n\n") if b.strip()]
    audio_evs = [json.loads(e.split("data: ", 1)[1])
                 for e in events if e.startswith("event: audio")]
    assert events[-1].startswith("event: done")
    assert "event: error" not in body
    by_idx = {}
    for ev in audio_evs:
        by_idx.setdefault(ev["index"], []).append(ev)
        assert len(base64.b64decode(ev["audio"])) % 4 == 0
    assert set(by_idx) == {0, 1}
    for idx, evs in by_idx.items():
        assert sum(1 for e in evs if e["done"]) == 1
        assert evs[-1]["done"] is True


def test_sse_stream_shared_independent_clients(client_factory, assets):  # noqa: F811
    """Three INDEPENDENT /tts/stream clients with "shared": true arriving
    staggered must each stream ordered audio + done while sharing one wave
    (they are not serialized behind the engine lock); /health exposes the
    wave scheduler state while streams are live."""
    async def go(client):
        async def one(text, delay):
            await asyncio.sleep(delay)
            r = await client.post("/tts/stream", timeout=LONG, json={
                "text": text,
                "speaker_audio": assets["spk"],
                "prompt_audio": assets["prompt"],
                "prompt_text": "hello there.",
                "stream_chunk": 10,
                "shared": True,
                "noise_scale": 0.0,
            })
            return r.status, await r.text()

        seen = {}

        async def poll_health():
            while True:
                h = await (await client.get("/health")).json()
                for waves in h.get("waves", {}).values():
                    for w in waves["waves"]:
                        seen["live"] = max(seen.get("live", 0), w["live"])
                        seen["attached"] = max(seen.get("attached", 0),
                                               w["attached"])
                await asyncio.sleep(0.05)

        poller = asyncio.ensure_future(poll_health())
        outs = await asyncio.gather(
            one("the first shared client speaks.", 0.0),
            one("a second shared client talks concurrently.", 0.2),
            one("and a third one joins the wave.", 0.4))
        poller.cancel()
        return outs, seen

    outs, seen = client_factory(go)
    for status, body in outs:
        assert status == 200
        events = [e for e in body.split("\n\n") if e.strip()]
        audio_events = [e for e in events if e.startswith("event: audio")]
        assert audio_events, body[:400]
        assert any(e.startswith("event: done") for e in events)
        assert "event: error" not in body
        total = sum(np.frombuffer(base64.b64decode(
            json.loads(e.split("data: ", 1)[1])["audio"]), np.float32).size
            for e in audio_events)
        assert total > 0
    # the poller must have observed the wave with >1 client attached
    assert seen.get("attached", 0) >= 2, f"wave never shared: {seen}"


def test_root_and_health(client_factory):
    async def go(client):
        r = await client.get("/")
        info = await r.json()
        h = await (await client.get("/health")).json()
        return r.status, info, h

    status, info, health = client_factory(go)
    assert status == 200
    assert "/tts/stream" in info["endpoints"]
    assert health["status"] == "ok"
    assert len(health["gpt_models"]) == 1
    # --warmup flips this via TTS.warmup(); unwarmed engines report False
    assert health["warmed"] in (False, True)


def test_sse_stream(client_factory, assets):  # noqa: F811
    async def go(client):
        r = await client.post("/tts/stream", timeout=LONG, json={
            "text": "hello streaming world.",
            "speaker_audio": assets["spk"],
            "prompt_audio": assets["prompt"],
            "prompt_text": "hello there.",
            "stream_chunk": 10,
        })
        body = await r.text()
        return r.status, r.headers.get("Content-Type"), body

    status, ctype, body = client_factory(go)
    assert status == 200
    assert "text/event-stream" in ctype
    events = [e for e in body.split("\n\n") if e.strip()]
    audio_events = [e for e in events if e.startswith("event: audio")]
    assert audio_events, body[:500]
    assert any(e.startswith("event: done") for e in events)
    total = 0
    for ev in audio_events:
        payload = json.loads(ev.split("data: ", 1)[1])
        total += np.frombuffer(base64.b64decode(payload["audio"]), np.float32).size
        assert payload["sample_rate"] == 32000
    assert total > 0


def test_api_v2_get_wav(client_factory, assets):  # noqa: F811
    async def go(client):
        r = await client.get("/tts", timeout=LONG, params={
            "text": "api v2 compatibility.",
            "ref_audio_path": assets["prompt"],
            "prompt_text": "hello there.",
            "media_type": "wav",
        })
        return r.status, await r.read()

    status, body = client_factory(go)
    assert status == 200
    assert body[:4] == b"RIFF"


def test_api_v2_missing_ref(client_factory):
    async def go(client):
        r = await client.get("/tts", timeout=LONG, params={"text": "x"})
        return r.status

    assert client_factory(go) == 400


def test_batched_endpoint(client_factory, assets):  # noqa: F811
    async def go(client):
        r = await client.post("/tts/batched", timeout=LONG, json={
            "texts": ["first one.", "second one."],
            "speaker_audio": assets["spk"],
            "prompt_audio": assets["prompt"],
            "prompt_text": "hello there.",
        })
        data = await r.json()
        # fetch the first generated file
        r2 = await client.get(data["results"][0]["audio_url"])
        return r.status, data, r2.status, await r2.read()

    status, data, status2, wav = client_factory(go)
    assert status == 200
    assert len(data["results"]) == 2
    assert status2 == 200
    assert wav[:4] == b"RIFF"


def test_model_switch_endpoints(client_factory, assets):  # noqa: F811
    async def go(client):
        r = await client.get("/set_gpt_weights", params={"weights_path": assets["gpt"]})
        r2 = await client.get("/set_sovits_weights", params={"weights_path": assets["sovits"]})
        return (await r.json()), (await r2.json())

    a, b = client_factory(go)
    assert a["message"] == "success" and b["message"] == "success"


def test_stream_async_propagates_errors(engine):  # noqa: F811
    """infer_stream failures must raise from infer_stream_async, not end the
    stream cleanly (the executor future is discarded)."""
    def boom(*a, **k):
        yield from ()
        raise RuntimeError("synthetic stream failure")

    orig = engine.infer_stream
    engine.infer_stream = boom
    try:
        async def go():
            chunks = []
            async for c in engine.infer_stream_async("x"):
                chunks.append(c)
            return chunks

        with pytest.raises(RuntimeError, match="synthetic stream failure"):
            asyncio.run(go())
    finally:
        engine.infer_stream = orig


def test_stream_async_abandoned_consumer_stops_worker(engine):  # noqa: F811
    """Closing the async generator mid-stream (client disconnect) must stop
    the synthesis worker — not leave it holding _infer_lock and pushing
    every remaining chunk into a queue nobody reads."""
    import threading
    import time

    progress = {"yielded": 0, "closed": False}
    release = threading.Event()

    def slow_stream(*a, **k):
        try:
            for _ in range(1000):
                progress["yielded"] += 1
                yield np.zeros(10, np.float32)
                # after the consumer got the first chunk, pace the rest so
                # the cancel lands mid-stream deterministically
                release.wait(0.05)
        finally:
            progress["closed"] = True

    orig = engine.infer_stream
    engine.infer_stream = slow_stream
    try:
        async def go():
            agen = engine.infer_stream_async("x")
            async for _ in agen:
                break  # consumer walks away after the first chunk
            await agen.aclose()

        asyncio.run(go())
        # the worker thread must wind down promptly (lock released,
        # generator closed) instead of producing all 1000 chunks
        deadline = time.time() + 10.0
        while not progress["closed"] and time.time() < deadline:
            time.sleep(0.05)
        assert progress["closed"], "worker generator was never closed"
        assert progress["yielded"] < 1000, \
            f"worker synthesized to completion: {progress['yielded']}"
        assert engine._infer_lock.acquire(timeout=10.0), \
            "_infer_lock still held by the abandoned worker"
        engine._infer_lock.release()
    finally:
        release.set()
        engine.infer_stream = orig


def test_sse_stream_error_event(client_factory, engine, assets):  # noqa: F811
    """A failing stream must surface as `event: error`, not `event: done`."""
    def boom(*a, **k):
        yield from ()
        raise RuntimeError("kaput")

    orig = engine.infer_stream
    engine.infer_stream = boom
    try:
        async def go(client):
            r = await client.post("/tts/stream", timeout=LONG, json={
                "text": "will fail.",
                "speaker_audio": assets["spk"],
                "prompt_audio": assets["prompt"],
                "prompt_text": "hello there.",
            })
            return r.status, await r.text()

        status, body = client_factory(go)
    finally:
        engine.infer_stream = orig
    events = [e for e in body.split("\n\n") if e.strip()]
    assert any(e.startswith("event: error") for e in events), body[:500]
    assert not any(e.startswith("event: done") for e in events)


@pytest.mark.parametrize("media_type,expect", [
    ("wav", 200), ("raw", 200), ("ogg", None), ("aac", None), ("mp9", 400),
])
def test_api_v2_media_types(client_factory, assets, media_type, expect):  # noqa: F811
    """Every api_v2 media_type answers deterministically: wav/raw always
    succeed; ogg/aac succeed with the optional soundfile encoder and
    return a documented 415 + supported list without it; unknown → 400."""
    from gsv_tts_tpu.serving.server import _supported_media_types

    if expect is None:  # encoder-dependent: match the server's own probe
        expect = 200 if media_type in _supported_media_types() else 415

    async def go(client):
        r = await client.get("/tts", timeout=LONG, params={
            "text": "media type check.",
            "ref_audio_path": assets["prompt"],
            "prompt_text": "hello there.",
            "media_type": media_type,
        })
        return r.status, await r.read()

    status, body = client_factory(go)
    assert status == expect, (media_type, status, body[:200])
    if status == 200 and media_type == "wav":
        assert body[:4] == b"RIFF"
    if status in (400, 415):
        data = json.loads(body)
        assert "supported" in data and "wav" in data["supported"]


def test_api_v2_get_string_booleans_and_aux(client_factory, assets):  # noqa: F811
    """GET query strings arrive as strings: streaming_mode=true must
    stream (int('true') used to 500), batch_infer=false must NOT route
    through batch synthesis, and a single aux_ref_audio_paths string must
    not TypeError against the list concat."""
    async def go(client):
        r1 = await client.get("/tts", timeout=LONG, params={
            "text": "streamed api v2.",
            "ref_audio_path": assets["prompt"],
            "prompt_text": "hello there.",
            "media_type": "wav",
            "streaming_mode": "true",
        })
        b1 = await r1.read()
        r2 = await client.get("/tts", timeout=LONG, params={
            "text": "plain api v2.",
            "ref_audio_path": assets["prompt"],
            "prompt_text": "hello there.",
            "media_type": "wav",
            "streaming_mode": "false",
            "batch_infer": "false",
            "aux_ref_audio_paths": assets["spk"],
        })
        b2 = await r2.read()
        return r1.status, b1, r2.status, b2

    s1, b1, s2, b2 = client_factory(go)
    assert s1 == 200 and b1[:4] == b"RIFF"
    assert s2 == 200 and b2[:4] == b"RIFF"


def test_weight_switch_bad_path_keeps_serving(client_factory, assets):  # noqa: F811
    """A failed weight switch must leave the previous model loaded (the
    old unload-first flow left the server model-less and the router
    fans the switch out fleet-wide)."""
    async def go(client):
        r_bad = await client.get("/set_gpt_weights",
                                 params={"weights_path": "/no/such.ckpt"})
        r_after = await client.get("/tts", timeout=LONG, params={
            "text": "still serving after the failed switch.",
            "ref_audio_path": assets["prompt"],
            "prompt_text": "hello there.",
            "media_type": "wav",
        })
        return r_bad.status, r_after.status, await r_after.read()

    bad, after, body = client_factory(go)
    assert bad >= 400
    assert after == 200 and body[:4] == b"RIFF"


def test_stream_shared_sheds_503_at_capacity(client_factory, engine, assets):  # noqa: F811
    """--max-streams admission: past the cap, a shared /tts/stream request
    gets a clean retryable 503 + Retry-After BEFORE the SSE response
    starts (reference has no admission control at all — its clients queue
    on _infer_lock forever)."""
    gpt_model, _ = engine._default_models(None, None)
    sched = engine._get_wave_scheduler(gpt_model)
    old_cap, old_tts = sched.max_clients, engine.wave_max_clients
    engine.wave_max_clients = 0
    sched.max_clients = 0

    async def go(client):
        r = await client.post("/tts/stream", json={
            "text": "too many clients.",
            "speaker_audio": assets["spk"],
            "prompt_audio": assets["prompt"],
            "prompt_text": "hello there.",
            "shared": True,
        })
        body = await r.json()
        return r.status, r.headers.get("Retry-After"), body

    try:
        status, retry_after, body = client_factory(go)
    finally:
        engine.wave_max_clients = old_tts
        sched.max_clients = old_cap
    assert status == 503
    assert retry_after == "1"
    assert "capacity" in body["error"]


def test_stream_shared_burst_losers_get_503_not_sse_error(client_factory, engine, assets):  # noqa: F811
    """The admission check is AUTHORITATIVE (acquire before the SSE
    response starts): with a cap of 1 and a client mid-stream, concurrent
    newcomers get 503 — never a 200 whose body is only an SSE error
    event (which the router could not fail over on)."""
    gpt_model, _ = engine._default_models(None, None)
    sched = engine._get_wave_scheduler(gpt_model)
    old_cap, old_tts = sched.max_clients, engine.wave_max_clients
    engine.wave_max_clients = 1
    sched.max_clients = 1

    async def go(client):
        async def holder():
            r = await client.post("/tts/stream", timeout=LONG, json={
                "text": "the holder keeps the only slot busy while "
                        "newcomers arrive and must be shed.",
                "speaker_audio": assets["spk"],
                "prompt_audio": assets["prompt"],
                "prompt_text": "hello there.",
                "shared": True, "stream_chunk": 10,
            })
            return r.status, await r.text()

        task = asyncio.create_task(holder())
        # wait until the holder actually holds the slot
        for _ in range(600):
            if sched.stats["clients"] >= 1:
                break
            await asyncio.sleep(0.05)
        assert sched.stats["clients"] >= 1, "holder never admitted"
        burst = await asyncio.gather(*[
            client.post("/tts/stream", json={
                "text": "burst loser.",
                "speaker_audio": assets["spk"],
                "prompt_audio": assets["prompt"],
                "prompt_text": "hello there.",
                "shared": True,
            }) for _ in range(3)])
        statuses = [r.status for r in burst]
        retry = [r.headers.get("Retry-After") for r in burst]
        h_status, h_body = await task
        return statuses, retry, h_status, h_body

    try:
        statuses, retry, h_status, h_body = client_factory(go)
    finally:
        engine.wave_max_clients = old_tts
        sched.max_clients = old_cap
    assert statuses == [503, 503, 503]
    assert retry == ["1", "1", "1"]
    # the admitted holder streamed normally and released its slot
    assert h_status == 200
    assert "event: audio" in h_body and "event: done" in h_body
    assert "event: error" not in h_body
    assert sched.stats["clients"] == 0


def test_malformed_requests_get_400_not_500(client_factory):
    """Client mistakes on the JSON endpoints are clean 400s with an error
    body (the reference FastAPI surface answers 422), never aiohttp 500s:
    invalid JSON, non-object bodies, missing required fields, and
    non-numeric parameter values."""
    async def go(client):
        out = []
        # invalid JSON body
        r = await client.post("/tts/stream", data=b"{not json",
                              headers={"Content-Type": "application/json"})
        out.append(("bad json", r.status, (await r.json())["error"]))
        # non-object body
        r = await client.post("/tts/stream", json=["a", "list"])
        out.append(("non-object", r.status, (await r.json())["error"]))
        # missing required fields
        r = await client.post("/tts/stream", json={"text": "hi"})
        out.append(("missing", r.status, (await r.json())["error"]))
        r = await client.post("/tts/stream/batched", json={"texts": ["x"]})
        out.append(("missing batched", r.status, (await r.json())["error"]))
        r = await client.post("/tts/batched", json={})
        out.append(("missing tts_batched", r.status, (await r.json())["error"]))
        # malformed numeric parameter
        r = await client.post("/tts/stream", json={
            "text": "hi", "speaker_audio": "s.wav", "prompt_audio": "p.wav",
            "top_k": "lots"})
        out.append(("bad numeric", r.status, (await r.json())["error"]))
        return out

    for label, status, err in client_factory(go):
        assert status == 400, (label, status, err)
        assert err, label


def test_metrics_prometheus_exposition(client_factory, engine, assets):  # noqa: F811
    """/metrics: Prometheus text gauges covering the timing reservoirs and
    wave-scheduler counters (scrapeable counterpart of /health; the
    reference has no metrics surface)."""
    async def go(client):
        # generate some activity so timing reservoirs are non-empty —
        # and DRAIN the SSE body (post() returns at response headers;
        # ttfa_s is only recorded once the first audio event is written)
        rs = await client.post("/tts/stream", timeout=LONG, json={
            "text": "metrics drive.",
            "speaker_audio": assets["spk"],
            "prompt_audio": assets["prompt"],
            "prompt_text": "hello there.",
            "shared": True,
        })
        sse = await rs.text()
        assert "event: audio" in sse
        r = await client.get("/metrics")
        return r.status, r.headers.get("Content-Type", ""), await r.text()

    status, ctype, body = client_factory(go)
    assert status == 200
    assert ctype.startswith("text/plain")
    lines = body.strip().splitlines()
    assert "gsv_up 1" in lines
    # every sample line is NAME VALUE or NAME{labels} VALUE with a float
    import re as _re
    sample = _re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*(\{[^}]*\})? -?[0-9.eE+-]+$")
    for ln in lines:
        if ln.startswith("#"):
            continue
        assert sample.match(ln), ln
    # the shared stream above must have left timing + wave counters
    assert any(ln.startswith("gsv_ttfa_s_") for ln in lines), body[:500]
    assert any(ln.startswith("gsv_wave_clients{") for ln in lines), body[:500]


def test_drain_stops_admission_and_reopens(client_factory, engine, assets):  # noqa: F811
    """POST /drain: new synthesis requests (every /tts* route) answer 503
    + Retry-After while draining; an IN-FLIGHT stream finishes cleanly;
    {"enable": false} re-opens (rolling-restart primitive — the router's
    capacity-503 failover routes around a draining replica)."""
    async def go(client):
        out = {}
        # start a stream, then flip draining while it runs
        stream_task = asyncio.create_task(client.post(
            "/tts/stream", timeout=LONG, json={
                "text": "the in flight stream must finish while draining.",
                "speaker_audio": assets["spk"],
                "prompt_audio": assets["prompt"],
                "prompt_text": "hello there.",
                "stream_chunk": 10,
            }))
        await asyncio.sleep(0.2)
        r = await client.post("/drain")
        out["drain"] = await r.json()
        r = await client.post("/tts/stream", json={
            "text": "rejected.", "speaker_audio": assets["spk"],
            "prompt_audio": assets["prompt"], "prompt_text": "hello there."})
        out["shed"] = (r.status, r.headers.get("Retry-After"),
                       (await r.json())["error"])
        r = await client.get("/tts", params={
            "text": "rejected too", "ref_audio_path": assets["prompt"],
            "prompt_text": "hello there."})
        out["shed_v2"] = r.status
        rh = await client.get("/health")
        out["health"] = await rh.json()
        rs = await stream_task
        body = await rs.text()
        out["inflight_stream"] = (rs.status, "event: done" in body,
                                  "event: error" in body)
        r = await client.post("/drain", json={"enable": False})
        out["undrain"] = await r.json()
        r = await client.post("/tts/stream", timeout=LONG, json={
            "text": "admitted again.", "speaker_audio": assets["spk"],
            "prompt_audio": assets["prompt"], "prompt_text": "hello there."})
        out["after"] = (r.status, "event: audio" in await r.text())
        return out

    out = client_factory(go)
    assert out["drain"]["draining"] is True
    assert out["shed"] == (503, "5", "server draining")
    assert out["shed_v2"] == 503
    assert out["health"]["draining"] is True
    assert out["inflight_stream"] == (200, True, False)
    assert out["undrain"]["draining"] is False
    assert out["after"] == (200, True)
