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


def test_spa_fetch_contract_routes():
    """Every fetch() the embedded SPA issues must resolve to a registered
    route with the matching method (VERDICT r3 #7: pin the JS page's fetch
    contract; reference counterpart WebUI/web.py:161-188,293-311).  Parsed
    from the page source so a route rename that orphans the JS fails here."""
    import re

    from gsv_tts_tpu.serving.webui import _INDEX_HTML

    script = _INDEX_HTML[_INDEX_HTML.index("<script>"):]
    calls = []
    for m in re.finditer(r"fetch\('([^']+)'(?:\s*,\s*\{([^}]*method[^}]*)\})?",
                         script):
        url, opts = m.group(1), m.group(2) or ""
        method = "POST" if "POST" in opts else "GET"
        calls.append((url, method))
    assert sorted(set(calls)) == [
        ("/ui/history", "GET"), ("/ui/presets", "GET"),
        ("/ui/presets", "POST"), ("/ui/synth", "POST"), ("/ui/vc", "POST"),
    ], calls
    # plus the dynamic audio links the page renders: /ui/audio/${file}
    assert "/ui/audio/" in script


def test_webui_page_flow_contract(engine, assets, tmp_path):  # noqa: F811
    """Drive every /ui/* route in the exact order and shape the embedded
    SPA does (page load → save preset → reload presets → rich-text synth →
    history refresh → audio fetch → VC), asserting the response fields the
    JS dereferences (d.rtf / d.duration / d.audio_url; e.file / e.duration /
    e.rtf / e.text; Object.keys(presets))."""
    from gsv_tts_tpu.serving.webui import create_webui_app

    app = create_webui_app(engine, workdir=tmp_path / "flow")

    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # page load: GET / then the script's loadHist(); loadPresets()
            page = await (await client.get("/")).text()
            assert "<script>" in page
            hist = await (await client.get("/ui/history")).json()
            assert hist == []
            presets = await (await client.get("/ui/presets")).json()
            assert presets == {}

            # savePreset(): exact key set the JS serializes
            r = await client.post("/ui/presets", json={
                "name": "alice", "speaker_audio": assets["spk"],
                "prompt_audio": assets["prompt"], "prompt_text": "hello there."})
            d = await r.json()
            assert r.status == 200 and d["ok"] and d["presets"] == ["alice"]
            # loadPresets(): the page renders Object.keys(p)
            presets = await (await client.get("/ui/presets")).json()
            assert list(presets) == ["alice"]
            assert set(presets["alice"]) == {"speaker_audio", "prompt_audio",
                                             "prompt_text"}

            # synth(): the exact body the JS builds (numeric coercions of
            # the form fields, enhance checkbox, nullable speaker_audio)
            r = await client.post("/ui/synth", json={
                "text": "page test. <alice>preset line.</alice> <break:0.3/> bye.",
                "speaker_audio": assets["spk"], "prompt_audio": assets["prompt"],
                "prompt_text": "hello there.", "top_k": 15, "temperature": 1.0,
                "speed": 1.0, "noise_scale": 0.5, "enhance": False})
            d = await r.json()
            assert r.status == 200, d
            # fields the JS reads: status line + player.src + history refresh
            assert isinstance(d["rtf"], float) and d["duration"] > 0.3
            assert d["audio_url"].startswith("/ui/audio/")
            body = await (await client.get(d["audio_url"])).read()
            assert body[:4] == b"RIFF"

            # loadHist(): entry fields the page template dereferences,
            # and the /ui/audio/${e.file} link it renders must resolve
            hist = await (await client.get("/ui/history")).json()
            assert len(hist) == 1
            e = hist[0]
            assert {"file", "duration", "rtf", "text"} <= set(e)
            body = await (await client.get(f"/ui/audio/{e['file']}")).read()
            assert body[:4] == b"RIFF"
            r = await client.get("/ui/audio/missing.wav")
            assert r.status == 404

            # vc(): exact JS body; page reads d.audio_url only
            r = await client.post("/ui/vc", json={
                "speaker_audio": assets["spk"], "prompt_audio": assets["prompt"],
                "prompt_text": "hello there."})
            d = await r.json()
            assert r.status == 200, d
            body = await (await client.get(d["audio_url"])).read()
            assert body[:4] == b"RIFF"

            # preset delete branch of the POST handler
            r = await client.post("/ui/presets", json={"name": "alice",
                                                       "delete": True})
            assert (await r.json())["presets"] == []
        finally:
            await client.close()

    asyncio.run(go())


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
