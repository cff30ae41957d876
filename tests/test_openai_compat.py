"""OpenAI-compatible speech surface tests (/v1/audio/speech et al.).

The reference has no OpenAI-compat endpoint (its surfaces are
personal_api + GPT-SoVITS api_v2); this pins the beyond-reference wire
contract: registry voice resolution, response_format negotiation, the
OpenAI error envelope, SSE streaming deltas, and drain gating.
"""
import asyncio
import base64
import json

import numpy as np
import pytest

pytest.importorskip("aiohttp")
pytest.importorskip("torch")
pytest.importorskip("transformers")

import aiohttp
from aiohttp.test_utils import TestClient, TestServer

LONG = aiohttp.ClientTimeout(total=1800)

from test_e2e import assets, engine  # fixtures  # noqa: F401


@pytest.fixture()
def client_factory(engine, assets):  # noqa: F811
    from gsv_tts_tpu.serving.server import create_app

    voices = {"alloy": {"speaker_audio": assets["spk"],
                        "prompt_audio": assets["prompt"],
                        "prompt_text": "hello there."}}
    app = create_app(engine, voices=voices)

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


def test_speech_wav_roundtrip(client_factory):
    """Registry voice → RIFF wav body with the right content type."""
    async def go(client):
        r = await client.post("/v1/audio/speech", timeout=LONG, json={
            "model": "tts-1", "input": "open ai compatible check.",
            "voice": "alloy"})
        return r.status, r.content_type, await r.read()

    status, ctype, body = client_factory(go)
    assert status == 200
    assert ctype == "audio/wav"
    assert body[:4] == b"RIFF"


def test_speech_pcm_and_speed(client_factory):
    """response_format pcm returns bare s16le frames; speed is honored
    (2.0 produces roughly half the samples of 1.0, same voice+text)."""
    async def go(client):
        # top_k=1 (sampling passthrough) makes the token chain greedy, so
        # the two calls synthesize the SAME semantic sequence and only the
        # SoVITS time axis differs
        req = {"model": "tts-1", "input": "pcm and speed contract.",
               "voice": "alloy", "response_format": "pcm",
               "top_k": 1, "noise_scale": 0.0}
        r1 = await client.post("/v1/audio/speech", timeout=LONG, json=req)
        b1 = await r1.read()
        r2 = await client.post("/v1/audio/speech", timeout=LONG,
                               json={**req, "speed": 2.0})
        b2 = await r2.read()
        return r1.status, r1.content_type, b1, r2.status, b2

    s1, ctype, b1, s2, b2 = client_factory(go)
    assert s1 == 200 and s2 == 200
    assert ctype == "audio/pcm"
    assert b1[:4] != b"RIFF" and len(b1) % 2 == 0
    pcm = np.frombuffer(b1, "<i2")
    assert len(pcm) > 0 and np.abs(pcm).max() <= 32767
    # speed=2.0 roughly halves the duration (SoVITS time-compresses)
    assert len(b2) < 0.8 * len(b1)


def test_speech_error_envelope(client_factory):
    """Bad requests answer the OpenAI error shape, not aiohttp 500s."""
    async def go(client):
        out = []
        # missing input
        r = await client.post("/v1/audio/speech", json={"voice": "alloy"})
        out.append((r.status, await r.json()))
        # unknown voice lists the registry
        r = await client.post("/v1/audio/speech",
                              json={"input": "x", "voice": "nope"})
        out.append((r.status, await r.json()))
        # mp3 is a documented 415 (no encoder), with the supported list
        r = await client.post("/v1/audio/speech", json={
            "input": "x", "voice": "alloy", "response_format": "mp3"})
        out.append((r.status, await r.json()))
        # speed outside the OpenAI bounds
        r = await client.post("/v1/audio/speech", json={
            "input": "x", "voice": "alloy", "speed": 9.0})
        out.append((r.status, await r.json()))
        # non-numeric stream_chunk must 400 BEFORE the SSE prepare (after
        # the 200 + headers it could only abort the connection)
        r = await client.post("/v1/audio/speech", json={
            "input": "x", "voice": "alloy", "stream_format": "sse",
            "stream_chunk": "fast"})
        assert r.status == 400
        assert (await r.json())["error"]["param"] == "stream_chunk"
        # malformed JSON body → clean 400 in the OpenAI envelope too
        r = await client.post("/v1/audio/speech", data=b"{nope")
        out.append((r.status, await r.json()))
        return out

    (s_in, e_in), (s_v, e_v), (s_f, e_f), (s_sp, e_sp), (s_js, e_js) = \
        client_factory(go)
    assert "JSON" in e_js["error"]["message"]
    assert s_in == 400 and e_in["error"]["param"] == "input"
    assert s_v == 400 and "alloy" in e_v["error"]["message"]
    assert s_f == 415 and "wav" in str(e_f["error"]["message"])
    assert s_sp == 400 and e_sp["error"]["param"] == "speed"
    assert s_js == 400
    for e in (e_in, e_v, e_f, e_sp):
        assert e["error"]["type"] == "invalid_request_error"


def test_speech_sse_stream(client_factory):
    """stream_format sse: base64 pcm deltas then one speech.audio.done
    with usage; decoded deltas are valid s16le frames."""
    async def go(client):
        r = await client.post("/v1/audio/speech", timeout=LONG, json={
            "input": "streaming over server sent events.",
            "voice": "alloy", "stream_format": "sse",
            "stream_chunk": 10})
        status, ctype, body = r.status, r.content_type, await r.text()
        # sse requires a pcm-family response_format
        r = await client.post("/v1/audio/speech", json={
            "input": "x", "voice": "alloy", "stream_format": "sse",
            "response_format": "flac"})
        return status, ctype, body, r.status

    status, ctype, body, bad_status = client_factory(go)
    assert bad_status in (400, 415)
    assert status == 200
    assert ctype == "text/event-stream"
    events = [json.loads(b.split("data: ", 1)[1])
              for b in body.split("\n\n") if b.startswith("data: ")]
    deltas = [e for e in events if e["type"] == "speech.audio.delta"]
    dones = [e for e in events if e["type"] == "speech.audio.done"]
    assert len(deltas) >= 1 and len(dones) == 1
    assert events[-1]["type"] == "speech.audio.done"
    n = 0
    for d in deltas:
        pcm = base64.b64decode(d["audio"])
        assert len(pcm) % 2 == 0 and len(pcm) > 0
        n += len(pcm) // 2
    usage = dones[0]["usage"]
    assert usage["input_characters"] == len(
        "streaming over server sent events.")
    assert abs(usage["output_duration_s"] - n / usage["sample_rate"]) < 1e-6


def test_models_and_voices_listings(client_factory):
    async def go(client):
        models = await (await client.get("/v1/models")).json()
        voices = await (await client.get("/v1/audio/voices")).json()
        return models, voices

    models, voices = client_factory(go)
    assert models["object"] == "list" and len(models["data"]) == 1
    assert models["data"][0]["object"] == "model"
    # the full OpenAI Model schema (strict clients validate `created`)
    assert set(models["data"][0]) == {"id", "object", "created", "owned_by"}
    assert isinstance(models["data"][0]["created"], int)
    assert voices["voices"] == ["alloy"]


def test_sse_admission_shed_openai_envelope(engine, assets, monkeypatch):  # noqa: F811
    """With --stream-share + --max-streams at capacity, the OpenAI SSE
    path sheds with 503 + Retry-After in the OpenAI envelope BEFORE any
    SSE bytes — same admission contract as the native /tts/stream."""
    from gsv_tts_tpu.runtime.wave import WaveOverloadedError
    from gsv_tts_tpu.serving.server import create_app

    def deny():
        raise WaveOverloadedError("synthetic capacity")

    monkeypatch.setattr(engine, "admit_shared_client", deny)
    app = create_app(engine, stream_share=True, voices={
        "alloy": {"speaker_audio": assets["spk"],
                  "prompt_audio": assets["prompt"],
                  "prompt_text": "hello there."}})

    async def body():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/v1/audio/speech", json={
                "input": "x", "voice": "alloy", "stream_format": "sse"})
            return r.status, r.headers.get("Retry-After"), await r.json()
        finally:
            await client.close()

    status, retry, err = asyncio.run(body())
    assert status == 503 and retry == "1"
    assert err["error"]["type"] == "server_error"
    assert "capacity" in err["error"]["message"]


def test_speech_gated_by_drain(client_factory):
    """/v1/audio/speech is a synthesis route: draining sheds it with 503
    + Retry-After like the native surfaces."""
    async def go(client):
        r = await client.post("/drain", json={})
        assert r.status == 200
        r = await client.post("/v1/audio/speech", json={
            "input": "x", "voice": "alloy"})
        return r.status, r.headers.get("Retry-After")

    status, retry = client_factory(go)
    assert status == 503 and retry is not None


def test_load_voices_validation(tmp_path):
    from gsv_tts_tpu.serving.openai_compat import load_voices

    good = tmp_path / "v.json"
    good.write_text(json.dumps({"a": {"speaker_audio": "s.wav",
                                      "prompt_audio": "p.wav",
                                      "prompt_text": "t"}}))
    assert "a" in load_voices(str(good))
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"a": {"speaker_audio": "s.wav"}}))
    with pytest.raises(ValueError, match="prompt_audio"):
        load_voices(str(bad))
    notdict = tmp_path / "nd.json"
    notdict.write_text(json.dumps(["a"]))
    with pytest.raises(ValueError, match="JSON object"):
        load_voices(str(notdict))
