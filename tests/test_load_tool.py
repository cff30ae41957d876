"""tools/load_test.py against the in-process server: the SSE parsing,
lead accounting, and wave aggregation run end-to-end on a real socket."""
import asyncio
import sys
from pathlib import Path

import pytest

pytest.importorskip("aiohttp")
torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from aiohttp.test_utils import TestServer

from test_e2e import assets, engine  # fixtures  # noqa: F401

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import load_test  # noqa: E402


def test_load_tool_wave_realtime_on_cpu_server(engine, assets):  # noqa: F811
    """A 3-client shared wave through the tool: every client gets audio,
    the aggregation fields are coherent, errors list is empty.  (CPU is
    not realtime — only the realtime flag's TYPE is asserted here; the
    chip run is where the number means something.)"""
    from gsv_tts_tpu.serving.server import create_app

    app = create_app(engine)
    payload = {
        "speaker_audio": assets["spk"],
        "prompt_audio": assets["prompt"],
        "prompt_text": "hello there.",
        "text": "hello load test one. and a second line.",
        "shared": True,
        "stream_chunk": 10,
    }

    async def body():
        server = TestServer(app)
        await server.start_server()
        try:
            url = str(server.make_url("")).rstrip("/")
            return await load_test.run_wave(
                url, n=3, payload=payload, stagger_ms=50.0,
                tolerance_s=0.05, timeout_s=1800.0)
        finally:
            await server.close()

    wave = asyncio.run(body())
    assert wave["n"] == 3
    assert wave["ok"] == 3, wave["errors"]
    assert wave["errors"] == []
    assert wave["audio_s_total"] > 0
    assert wave["agg_stream_s_per_s"] > 0
    assert wave["ttfa_p50_s"] > 0 and wave["ttfa_p95_s"] >= wave["ttfa_p50_s"]
    assert isinstance(wave["realtime"], int)
    assert 0.0 <= wave["realtime_frac"] <= 1.0


def test_load_tool_pct_and_sse_parse():
    assert load_test._pct([3.0, 1.0, 2.0], 0.5) == 2.0
    assert load_test._pct([], 0.5) is None
    assert load_test._pct([5.0], 0.95) == 5.0


def test_saturation_harness_on_cpu(engine, assets):  # noqa: F811
    """tools/saturation.py sweep end-to-end on the CPU engine: every client
    of both waves completes with audio, aggregation fields are coherent
    (the knee itself is a chip-run property — bench.py --saturation)."""
    import saturation

    out = saturation.sweep(
        engine, [2, 3], assets["spk"], assets["prompt"], "hello there.",
        "hello saturation. and a second line.", stream_chunk=10,
        stagger_ms=20.0, log=lambda s: None)
    assert out["metric"] == "serving_saturation"
    assert [w["n"] for w in out["waves"]] == [2, 3]
    for w in out["waves"]:
        assert w["ok"] == w["n"], w["errors"]
        assert w["errors"] == []
        assert w["audio_s_total"] > 0
        assert w["agg_stream_s_per_s"] > 0
        assert w["ttfa_p50_s"] > 0 and w["ttfa_p99_s"] >= w["ttfa_p50_s"]
        assert 0.0 <= w["realtime_frac"] <= 1.0
        assert "attached" in w["wave_stats"] or w["wave_stats"] == {} or \
            isinstance(w["wave_stats"], dict)
