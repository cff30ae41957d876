"""Wave-scheduler saturation characterization (VERDICT r3 #4).

Drives N synthetic clients STRAIGHT into ``TTS.stream_shared`` — no HTTP,
no SSE framing — so the measured quantity is the serving stack's own
queueing behavior (wave scheduler attach/growth/waves + cross-stream
vocoder batching) as N sweeps past the per-chip capacity estimate
(~200 realtime streams on v5e, CLAUDE.md).  For each wave size it reports:

  * ``ttfa_p50_s`` / ``ttfa_p99_s`` — wall time from call to first audio
    chunk (includes queueing for a wave slot: the knee shows up here first);
  * ``realtime_frac`` — fraction of clients whose delivered audio never
    fell behind wall time after their first chunk (same lead accounting as
    ``tools/load_test.py``);
  * ``agg_stream_s_per_s`` — delivered audio seconds per wall second: the
    measured concurrent-realtime-stream equivalent, which PLATEAUS at the
    capacity knee while ttfa_p99 starts growing linearly with N.

Reference counterpart: ``API/test_async_performance.py:57-110`` (async
client sweep against the one-lock server); this sweep measures an actual
shared-wave multiplexer instead.

Usage:
    python tools/saturation.py --assets /tmp/gsv_assets \
        --clients 8,32,64,128,256 [--text ...] [--stagger-ms 20]

Prints one JSON line: {"metric": "serving_saturation", "waves": [...]}.
``bench.py --saturation`` embeds the same sweep in the bench artifact.
"""
from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from typing import List, Optional


from gsv_tts_tpu.utils.timing import percentile as _pct  # noqa: E402


def run_client(tts, spk: str, prompt: str, prompt_text: str, text: str,
               stream_chunk: int, tolerance_s: float) -> dict:
    t0 = time.perf_counter()
    ttfa = None
    t_first = None
    audio_s = 0.0
    min_lead = float("inf")
    error = None
    try:
        for clip in tts.stream_shared(spk, prompt, prompt_text, text,
                                      stream_chunk=stream_chunk, debug=False):
            now = time.perf_counter()
            audio_s += len(clip.audio_data) / clip.samplerate
            if ttfa is None:
                ttfa = now - t0
                t_first = now
            else:
                min_lead = min(min_lead, audio_s - (now - t_first))
    except Exception as e:  # noqa: BLE001 — a client's failure is data
        error = f"{type(e).__name__}: {e}"
    if min_lead == float("inf"):
        min_lead = 0.0
    return {"ok": error is None and ttfa is not None, "error": error,
            "ttfa_s": ttfa, "audio_s": audio_s,
            "wall_s": time.perf_counter() - t0, "min_lead_s": min_lead,
            "realtime": error is None and ttfa is not None
                        and min_lead >= -tolerance_s}


def run_wave(tts, n: int, spk: str, prompt: str, prompt_text: str, text: str,
             stream_chunk: int = 25, stagger_ms: float = 20.0,
             tolerance_s: float = 0.05) -> dict:
    results: List[Optional[dict]] = [None] * n
    t0 = time.perf_counter()

    def one(i: int):
        time.sleep(i * stagger_ms / 1000.0)
        results[i] = run_client(tts, spk, prompt, prompt_text, text,
                                stream_chunk, tolerance_s)

    threads = [threading.Thread(target=one, args=(i,), daemon=True)
               for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    ok = [r for r in results if r and r["ok"]]
    ttfas = [r["ttfa_s"] for r in ok]
    return {
        "n": n,
        "ok": len(ok),
        "errors": sorted({r["error"] for r in results if r and r["error"]}),
        "realtime": sum(1 for r in ok if r["realtime"]),
        "realtime_frac": round(sum(1 for r in ok if r["realtime"]) / len(ok), 3)
                         if ok else 0.0,
        "ttfa_p50_s": round(_pct(ttfas, 0.5), 3) if ttfas else None,
        "ttfa_p99_s": round(_pct(ttfas, 0.99), 3) if ttfas else None,
        "min_lead_p05_s": round(_pct([r["min_lead_s"] for r in ok], 0.05), 3)
                          if ok else None,
        "audio_s_total": round(sum(r["audio_s"] for r in ok), 2),
        "wave_wall_s": round(wall, 2),
        "agg_stream_s_per_s": round(sum(r["audio_s"] for r in ok) / wall, 2),
    }


def sweep(tts, clients: List[int], spk: str, prompt: str, prompt_text: str,
          text: str, stream_chunk: int = 25, stagger_ms: float = 20.0,
          tolerance_s: float = 0.05, log=lambda s: print(s, file=sys.stderr)):
    waves = []
    for n in clients:
        w = run_wave(tts, n, spk, prompt, prompt_text, text,
                     stream_chunk=stream_chunk, stagger_ms=stagger_ms,
                     tolerance_s=tolerance_s)
        w["wave_stats"] = tts.wave_stats() if hasattr(tts, "wave_stats") else {}
        log(f"saturation n={n}: ok={w['ok']} realtime_frac={w['realtime_frac']}"
            f" ttfa_p50={w['ttfa_p50_s']} p99={w['ttfa_p99_s']}"
            f" agg={w['agg_stream_s_per_s']} stream_s/s")
        waves.append(w)
    # the knee: largest N whose wave stayed fully realtime
    sustained = [w["n"] for w in waves
                 if w["ok"] == w["n"] and w["realtime_frac"] >= 1.0]
    return {"metric": "serving_saturation",
            "value": max(sustained) if sustained else 0,
            "unit": "concurrent in-process clients, all realtime",
            "waves": waves}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--assets", required=True)
    ap.add_argument("--gpt", default=None)
    ap.add_argument("--sovits", default=None)
    ap.add_argument("--clients", default="8,32,64,128,256")
    ap.add_argument("--text", default="今天天气真不错,我们一起去公园散步吧。")
    ap.add_argument("--prompt-text", default="你好,这是一条测试语音。")
    ap.add_argument("--stream-chunk", type=int, default=25)
    ap.add_argument("--stagger-ms", type=float, default=20.0)
    ap.add_argument("--tolerance-s", type=float, default=0.05)
    ap.add_argument("--quant-t2s", action="store_true")
    args = ap.parse_args()

    from gsv_tts_tpu import TTS
    from gsv_tts_tpu.utils.timing import enable_compilation_cache

    enable_compilation_cache()
    tts = TTS(models_dir=args.assets, quant_t2s=args.quant_t2s)
    tts.load_gpt_model(args.gpt or f"{args.assets}/tiny_s1.ckpt")
    tts.load_sovits_model(args.sovits or f"{args.assets}/tiny_s2.pth")

    out = sweep(tts, [int(x) for x in args.clients.split(",")],
                f"{args.assets}/spk.wav", f"{args.assets}/prompt.wav",
                args.prompt_text, args.text, stream_chunk=args.stream_chunk,
                stagger_ms=args.stagger_ms, tolerance_s=args.tolerance_s)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
