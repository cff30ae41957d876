"""Cross-request micro-batching (serving/batcher.py): grouping, signature
isolation, error containment — unit-level with a fake engine, plus one
integration pass through the real aiohttp app + tiny engine."""
import asyncio

import numpy as np
import pytest

from gsv_tts_tpu.serving.batcher import MicroBatcher


class FakeTTS:
    """Records every infer_batched_async call; returns one tagged clip per
    text so routing can be asserted."""

    def __init__(self, delay=0.0, fail=False):
        self.calls = []
        self.delay = delay
        self.fail = fail

    async def infer_batched_async(self, *, spk_audio_paths,
                                  prompt_audio_paths, prompt_audio_texts,
                                  texts, executor=None, **params):
        self.calls.append({"texts": list(texts), "params": dict(params)})
        if self.delay:
            await asyncio.sleep(self.delay)
        if self.fail:
            raise RuntimeError("synthesis exploded")
        return tuple(f"clip:{t}:{params.get('top_k')}" for t in texts)


def run(coro):
    return asyncio.run(coro)


def test_concurrent_requests_coalesce_into_one_call():
    async def go():
        tts = FakeTTS()
        b = MicroBatcher(tts, max_batch=4, max_wait_ms=50)
        outs = await asyncio.gather(*[
            b.infer("s", "p", "pt", f"text{i}", top_k=15) for i in range(4)])
        return tts, b, outs

    tts, b, outs = run(go())
    assert len(tts.calls) == 1
    assert sorted(tts.calls[0]["texts"]) == [f"text{i}" for i in range(4)]
    # each request got ITS clip back
    assert sorted(outs) == [f"clip:text{i}:15" for i in range(4)]
    assert b.stats["calls"] == 1 and b.stats["requests"] == 4


def test_full_batch_flushes_before_window():
    async def go():
        tts = FakeTTS()
        # enormous window: only the batch-full event can flush it promptly
        b = MicroBatcher(tts, max_batch=2, max_wait_ms=60_000)
        return tts, await asyncio.wait_for(
            asyncio.gather(b.infer("s", "p", "pt", "a", top_k=1),
                           b.infer("s", "p", "pt", "b", top_k=1)),
            timeout=5.0)

    tts, outs = run(go())
    assert len(tts.calls) == 1 and len(tts.calls[0]["texts"]) == 2


def test_different_params_do_not_mix():
    async def go():
        tts = FakeTTS()
        b = MicroBatcher(tts, max_batch=4, max_wait_ms=30)
        return tts, await asyncio.gather(
            b.infer("s", "p", "pt", "a", top_k=15),
            b.infer("s", "p", "pt", "b", top_k=3))

    tts, outs = run(go())
    assert len(tts.calls) == 2
    assert {c["params"]["top_k"] for c in tts.calls} == {3, 15}
    assert outs[0] == "clip:a:15" and outs[1] == "clip:b:3"


def test_overflow_rolls_into_next_wave():
    async def go():
        tts = FakeTTS(delay=0.05)
        b = MicroBatcher(tts, max_batch=2, max_wait_ms=10)
        return tts, await asyncio.gather(*[
            b.infer("s", "p", "pt", f"t{i}", top_k=5) for i in range(5)])

    tts, outs = run(go())
    assert sum(len(c["texts"]) for c in tts.calls) == 5
    assert all(len(c["texts"]) <= 2 for c in tts.calls)
    assert sorted(outs) == sorted(f"clip:t{i}:5" for i in range(5))


def test_lone_request_uses_single_call_semantics():
    """A flush wave with exactly one request must route through the
    single_call hook (documented single-``infer`` semantics), not
    infer_batched — and a full wave must still take the batched path."""
    async def go():
        tts = FakeTTS()
        singles = []

        async def single(spk, prompt, prompt_text, text, **params):
            singles.append({"text": text, "params": dict(params)})
            return f"single:{text}"

        b = MicroBatcher(tts, max_batch=4, max_wait_ms=10, single_call=single)
        lone = await b.infer("s", "p", "pt", "alone", top_k=15,
                             is_cut_text=True)
        group = await asyncio.gather(*[
            b.infer("s", "p", "pt", f"g{i}", top_k=7) for i in range(4)])
        return tts, singles, lone, group

    tts, singles, lone, group = run(go())
    assert lone == "single:alone"
    assert len(singles) == 1 and singles[0]["text"] == "alone"
    # the batched engine call never saw the lone request …
    assert all("alone" not in c["texts"] for c in tts.calls)
    # … while the full wave still coalesced through infer_batched
    assert sorted(group) == [f"clip:g{i}:7" for i in range(4)]
    assert sum(len(c["texts"]) for c in tts.calls) == 4


def test_failure_rejects_only_that_wave():
    async def go():
        tts = FakeTTS(fail=True)
        b = MicroBatcher(tts, max_batch=2, max_wait_ms=10)
        res = await asyncio.gather(
            *[b.infer("s", "p", "pt", f"t{i}", top_k=5) for i in range(2)],
            return_exceptions=True)
        # batcher stays usable for the next wave
        tts.fail = False
        ok = await b.infer("s", "p", "pt", "after", top_k=5)
        return res, ok

    res, ok = run(go())
    assert all(isinstance(r, RuntimeError) for r in res)
    assert ok == "clip:after:5"


def test_close_rejects_queued():
    async def go():
        tts = FakeTTS(delay=1.0)
        b = MicroBatcher(tts, max_batch=1, max_wait_ms=10_000)
        t1 = asyncio.ensure_future(b.infer("s", "p", "pt", "x", top_k=5))
        await asyncio.sleep(0.05)  # t1's wave is in flight; queue another
        t2 = asyncio.ensure_future(b.infer("s", "p", "pt", "y", top_k=5))
        await asyncio.sleep(0.05)
        await b.close()
        r1, r2 = await asyncio.gather(t1, t2, return_exceptions=True)
        return r1, r2

    r1, r2 = run(go())
    # both end (cancelled flusher or explicit rejection) — nothing hangs
    assert isinstance(r2, Exception)


# ---------------------------------------------------------------------------
# integration: real app + tiny engine
# ---------------------------------------------------------------------------

pytest.importorskip("aiohttp")
pytest.importorskip("torch")
pytest.importorskip("transformers")

from test_e2e import assets, engine  # fixtures  # noqa: F401,E402


def test_api_v2_coalesces_concurrent_requests(engine, assets):  # noqa: F811
    from aiohttp.test_utils import TestClient, TestServer

    from gsv_tts_tpu.serving.server import create_app

    app = create_app(engine, batch_window_ms=300, batch_max=4)

    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            q = {"text": "hello batched world.",
                 "ref_audio_path": assets["prompt"],
                 "prompt_text": "hello there.", "media_type": "wav"}
            r1, r2 = await asyncio.gather(
                client.get("/tts", params=q),
                client.get("/tts", params={**q, "text": "second request."}))
            b1, b2 = await r1.read(), await r2.read()
            health = await (await client.get("/health")).json()
            return r1.status, r2.status, b1, b2, health
        finally:
            await client.close()

    s1, s2, b1, b2, health = asyncio.run(go())
    assert s1 == 200 and s2 == 200
    assert b1[:4] == b"RIFF" and b2[:4] == b"RIFF"
    assert b1 != b2  # distinct texts → distinct audio
    st = health["batcher"]
    assert st["requests"] == 2
    assert st["calls"] == 1, f"expected one coalesced call, got {st}"
