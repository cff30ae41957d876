"""WebUI tests: rich-text parsing, presets, synthesis round-trip."""
import asyncio

import numpy as np
import pytest

pytest.importorskip("aiohttp")
torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from aiohttp.test_utils import TestClient, TestServer

from gsv_tts_tpu.serving.webui import parse_rich_text, loudness_normalize
from test_e2e import assets, engine  # fixtures  # noqa: F401


def test_parse_rich_text():
    segs = parse_rich_text("Hello. <alice>Hi there!</alice> <break:1.5/> Bye.")
    assert segs[0] == ("speak", (None, "Hello."))
    assert segs[1] == ("speak", ("alice", "Hi there!"))
    assert segs[2] == ("break", 1.5)
    assert segs[3] == ("speak", (None, "Bye."))


def test_loudness_normalize():
    x = np.full(1000, 0.5, np.float32)
    y = loudness_normalize(x, target_rms=0.1)
    assert abs(float(np.sqrt(np.mean(y ** 2))) - 0.1) < 1e-3
    assert np.all(loudness_normalize(np.zeros(10, np.float32)) == 0)


def test_webui_synth_roundtrip(engine, assets, tmp_path):  # noqa: F811
    from gsv_tts_tpu.serving.webui import create_webui_app

    app = create_webui_app(engine, workdir=tmp_path)

    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.get("/")
            assert r.status == 200 and "Synthesis" in await r.text()

            r = await client.post("/ui/presets", json={
                "name": "alice", "prompt_audio": assets["prompt"],
                "prompt_text": "hello there.", "speaker_audio": assets["spk"]})
            assert (await r.json())["ok"]

            r = await client.post("/ui/synth", json={
                "text": "short test. <break:0.2/> <alice>preset voice.</alice>",
                "speaker_audio": assets["spk"],
                "prompt_audio": assets["prompt"],
                "prompt_text": "hello there."})
            data = await r.json()
            assert r.status == 200, data
            assert data["duration"] > 0.2
            r2 = await client.get(data["audio_url"])
            body = await r2.read()
            assert body[:4] == b"RIFF"

            # enhance path: full fx chain applied server-side
            r = await client.post("/ui/synth", json={
                "text": "enhanced test one.",
                "speaker_audio": assets["spk"],
                "prompt_audio": assets["prompt"],
                "prompt_text": "hello there.",
                "enhance": True})
            data2 = await r.json()
            assert r.status == 200, data2
            body2 = await (await client.get(data2["audio_url"])).read()
            assert body2[:4] == b"RIFF" and len(body2) > 1000

            hist = await (await client.get("/ui/history")).json()
            assert len(hist) == 2

            models = await (await client.get("/ui/models")).json()
            assert len(models["gpt_loaded"]) >= 1
        finally:
            await client.close()

    asyncio.run(go())
