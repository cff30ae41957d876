"""Server-level streaming capacity load test.

Drives N independent SSE clients against a RUNNING gsv-tts-lite-tpu server's
``/tts/stream`` endpoint (shared-wave mode) and measures what the serving
stack actually sustains — the full path through aiohttp, the wave scheduler
(``runtime/wave.py``), the batched decode kernel, and the cross-stream
vocoder batcher — rather than the kernel-level capacity arithmetic
``bench.py`` reports (decode agg tok/s + vocoder ms/stream → streams/chip).

A stream counts as REALTIME when, at every audio event after the first,
cumulative delivered audio ≥ wall time since the first event (playback that
starts at TTFA never underruns): ``min_lead_s >= -tolerance``.  The capacity
of a wave of N clients is reported two ways:

  * ``realtime_frac`` — fraction of clients that never underran;
  * ``agg_stream_s_per_s`` — total delivered audio seconds / wave wall
    seconds, the measured concurrent-realtime-stream equivalent.

Reference counterpart being measured: ``personal_api.py:560-663`` streams
one client at a time behind a lock; this server multiplexes N clients into
B<=4 kernel waves (``serving/server.py:313-322``, beyond the reference).

Usage (server first, then the probe):
    python -m gsv_tts_tpu.serving.server --models-dir /tmp/gsv_assets \
        --gpt /tmp/gsv_assets/tiny_s1.ckpt --sovits /tmp/gsv_assets/tiny_s2.pth \
        --stream-share --port 19890 &
    python tools/load_test.py --url http://127.0.0.1:19890 \
        --assets /tmp/gsv_assets --clients 2,4,8 --stagger-ms 300

Prints one JSON line with per-wave stats; exit code 1 if the smallest wave
already underruns (server misconfigured / not realtime at all).
"""
from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time
from typing import Optional


async def _read_sse(resp):
    """Yield (event, data_dict) from an aiohttp SSE response."""
    event, data = None, []
    async for raw in resp.content:
        line = raw.decode().rstrip("\n")
        if line.startswith("event: "):
            event = line[7:]
        elif line.startswith("data: "):
            data.append(line[6:])
        elif line == "" and event is not None:
            yield event, json.loads("".join(data))
            event, data = None, []


async def run_client(session, url: str, payload: dict, delay_s: float,
                     tolerance_s: float) -> dict:
    """One SSE stream; returns ttfa/lead/duration stats."""
    await asyncio.sleep(delay_s)
    t0 = time.perf_counter()
    ttfa = None
    t_first = None
    audio_s = 0.0
    min_lead = float("inf")
    n_events = 0
    error = None
    try:
        async with session.post(url + "/tts/stream", json=payload) as resp:
            if resp.status != 200:
                return {"error": f"http {resp.status}", "ok": False}
            async for event, data in _read_sse(resp):
                now = time.perf_counter()
                if event == "audio":
                    n_events += 1
                    audio_s += float(data["duration"])
                    if ttfa is None:
                        ttfa = now - t0
                        t_first = now
                    else:
                        min_lead = min(min_lead, audio_s - (now - t_first))
                elif event == "error":
                    error = data.get("error", "unknown")
                elif event == "done":
                    break
    except Exception as e:  # noqa: BLE001 — any one client's failure
        # (aiohttp.ClientError, a ValueError from an oversized SSE line,
        # a timeout) must be RECORDED as that client's error, never crash
        # the wave (ADVICE r3)
        error = f"{type(e).__name__}: {e}"
    wall = time.perf_counter() - t0
    if min_lead == float("inf"):
        min_lead = 0.0  # single-chunk stream: trivially realtime
    return {
        "ok": error is None and ttfa is not None,
        "error": error,
        "ttfa_s": ttfa,
        "audio_s": audio_s,
        "wall_s": wall,
        "n_events": n_events,
        "min_lead_s": min_lead,
        "realtime": error is None and ttfa is not None
                    and min_lead >= -tolerance_s,
    }


def _pct(xs, q):
    xs = sorted(xs)
    if not xs:
        return None
    i = min(len(xs) - 1, int(round(q * (len(xs) - 1))))
    return xs[i]


async def run_wave(url: str, n: int, payload: dict, stagger_ms: float,
                   tolerance_s: float, timeout_s: float) -> dict:
    import aiohttp
    t0 = time.perf_counter()
    timeout = aiohttp.ClientTimeout(total=timeout_s)
    # A 1 s audio event's base64 data: line is ~85 KB at 32 kHz — past
    # aiohttp's default 64 KB readline limit ("Chunk too big").
    async with aiohttp.ClientSession(timeout=timeout,
                                     read_bufsize=2 ** 22) as session:
        results = await asyncio.gather(*[
            run_client(session, url, payload, i * stagger_ms / 1000.0,
                       tolerance_s)
            for i in range(n)
        ], return_exceptions=True)
    results = [r if isinstance(r, dict) else
               {"ok": False, "error": f"{type(r).__name__}: {r}",
                "ttfa_s": None, "audio_s": 0.0, "wall_s": 0.0,
                "n_events": 0, "min_lead_s": 0.0, "realtime": False}
               for r in results]
    wall = time.perf_counter() - t0
    ok = [r for r in results if r["ok"]]
    ttfas = [r["ttfa_s"] for r in ok]
    return {
        "n": n,
        "ok": len(ok),
        "realtime": sum(1 for r in ok if r["realtime"]),
        "realtime_frac": (sum(1 for r in ok if r["realtime"]) / len(ok))
                         if ok else 0.0,
        "ttfa_p50_s": _pct(ttfas, 0.5),
        "ttfa_p95_s": _pct(ttfas, 0.95),
        "min_lead_p05_s": _pct([r["min_lead_s"] for r in ok], 0.05),
        "audio_s_total": round(sum(r["audio_s"] for r in ok), 3),
        "wave_wall_s": round(wall, 3),
        "agg_stream_s_per_s": round(sum(r["audio_s"] for r in ok) / wall, 2),
        "errors": [r["error"] for r in results if r["error"]],
    }


async def amain(args) -> int:
    payload = {
        "speaker_audio": f"{args.assets}/spk.wav",
        "prompt_audio": f"{args.assets}/prompt.wav",
        "prompt_text": args.prompt_text,
        "text": args.text,
        "shared": True,
        "stream_chunk": args.stream_chunk,
    }
    waves = []
    for n in [int(x) for x in args.clients.split(",")]:
        w = await run_wave(args.url, n, payload, args.stagger_ms,
                           args.tolerance_s, args.timeout_s)
        print(f"wave n={n}: ok={w['ok']} realtime={w['realtime']}"
              f" ttfa_p50={w['ttfa_p50_s']} agg={w['agg_stream_s_per_s']}"
              f" stream_s/s", file=sys.stderr)
        waves.append(w)
    sustained = [w["n"] for w in waves
                 if w["ok"] == w["n"] and w["realtime_frac"] >= args.realtime_frac]
    out = {
        "metric": "server_streams_realtime",
        "value": max(sustained) if sustained else 0,
        "unit": "concurrent SSE clients, all realtime",
        "waves": waves,
    }
    print(json.dumps(out))
    return 0 if sustained else 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--url", required=True)
    ap.add_argument("--assets", required=True,
                    help="dir with spk.wav / prompt.wav (tests/make_tiny_assets.py)")
    ap.add_argument("--prompt-text", default="你好,这是一条测试语音。")
    ap.add_argument("--text", default="今天天气真不错,我们一起去公园散步吧。"
                                      "海上生明月,天涯共此时。")
    ap.add_argument("--clients", default="2,4,8",
                    help="comma list of wave sizes, run in order")
    ap.add_argument("--stagger-ms", type=float, default=300.0,
                    help="arrival spacing within a wave")
    ap.add_argument("--stream-chunk", type=int, default=25)
    ap.add_argument("--tolerance-s", type=float, default=0.05,
                    help="underrun slack (SSE framing jitter)")
    ap.add_argument("--realtime-frac", type=float, default=1.0,
                    help="fraction of a wave's clients that must be "
                         "realtime for the wave to count as sustained")
    ap.add_argument("--timeout-s", type=float, default=600.0)
    args = ap.parse_args()
    return asyncio.run(amain(args))


if __name__ == "__main__":
    sys.exit(main())
