#!/usr/bin/env python
"""Serving soak for leaks (VERDICT r4 item 9): drive a REAL server through
15-30 min of churn — concurrent SSE streams with mixed text signatures,
~30% of clients cancel mid-stream, periodic drain-enable/disable cycles,
api_v2 one-shots, and a weight re-switch — while sampling RSS,
``backend_compiles`` (must plateau: shape-keyed jit programs compile once),
``live_arrays`` (device-buffer leak signal), and the /metrics reservoirs.

Writes SOAK_r05-style JSON:
    python tools/soak.py [--minutes 20] [--assets /tmp/gsv_assets]
                         [--out SOAK_r05.json] [--port 19899]
The server runs on CPU (JAX_PLATFORMS=cpu) with the tiny asset fixtures —
compile-cache keys, slot lifecycle, reservoir growth and aiohttp stream
bookkeeping are platform-independent, which is what leaks.

NOTE on vm.max_map_count: XLA:CPU JITs each compiled program as many
small LLVM sections (3 mmaps each); a bucketed server's program
population alone holds tens of thousands of mappings, so the stock limit
(65530) kills a CPU fixture server with "LLVM ERROR: Unable to allocate
section memory" once a few decode buckets have compiled — raise it
(e.g. ``sysctl -w vm.max_map_count=1048576``) before a CPU soak.  TPU
serving does not have this profile (device binaries, no host LLVM
sections); what the soak certifies cross-platform is that the counts
PLATEAU (bounded programs) and RSS/live_arrays stay flat.

Verdict logic (written into the artifact):
  * rss_flat    — RSS growth over the post-warm phase < 15% of the
                  post-warm baseline (first third discarded: lazy allocs,
                  fresh compiles);
  * compiles_bounded — the final third mints <= 10% of all compiles AND
                  <= 5% of all mappings: the program population SATURATES
                  (every compile is a one-time program for a newly seen
                  bucket/truncation length or a weight-switch rebuild, not
                  a per-request cache miss — the r5 leak signature was a
                  LINEAR compile curve);
  * zero client-visible errors (non-cancelled clients must all complete).
"""
from __future__ import annotations

import argparse
import asyncio
import json
import os
import random
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# short/medium signatures only: the CPU fixture server synthesizes ~1 s
# of audio per second of wall clock, so a long text makes one cycle take
# minutes and the 20-min soak degenerates to a handful of cycles
TEXTS = [
    "short one.",
    "a medium sentence for the second bucket, with clauses.",
    "numbers 1 2 3 and punctuation!  does it hold?",
    "fourth signature here.",
]


def rss_mb(pid: int) -> float:
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def n_maps(pid: int) -> int:
    """Memory-mapping count: LLVM JIT'd XLA:CPU executables allocate
    sections via mmap, and vm.max_map_count (65530 here) is a hard
    process death sentence ("Cannot allocate memory" from LLVM) — watch
    growth alongside RSS."""
    try:
        with open(f"/proc/{pid}/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return -1


async def sse_client(session, base, text, cancel_after=None):
    """One SSE stream; returns (audio_events, done, cancelled, error)."""
    import aiohttp

    # deterministic sampling: the tiny fixture's random weights give
    # wildly varying chain lengths per request under stochastic sampling,
    # so every request mints NEW code buckets (each a fresh big XLA:CPU
    # program, thousands of LLVM section mmaps) — production text has
    # text-determined lengths; greedy pins the fixture the same way
    payload = {"text": text, "speaker_audio": f"{ASSETS}/spk.wav",
               "prompt_audio": f"{ASSETS}/prompt.wav",
               "prompt_text": "hello there.", "stream_chunk": 10,
               "top_k": 1, "top_p": 1.0, "temperature": 1.0}
    n_audio, done = 0, False
    t0 = time.monotonic()
    try:
        async with session.post(base + "/tts/stream", json=payload,
                                timeout=aiohttp.ClientTimeout(total=600)) as r:
            if r.status != 200:
                return 0, False, False, f"http {r.status}"
            async for raw in r.content:
                line = raw.decode("utf-8", "replace").strip()
                if line.startswith("event: audio"):
                    n_audio += 1
                    if cancel_after and n_audio >= cancel_after:
                        return n_audio, False, True, None  # client cancels
                elif line.startswith("event: done"):
                    done = True
                elif line.startswith("event: error"):
                    return n_audio, False, False, "in-stream error"
            return n_audio, done, False, None
    except asyncio.CancelledError:
        return n_audio, False, True, None
    except Exception as e:  # noqa: BLE001
        return n_audio, False, False, f"{type(e).__name__}: {e}"
    finally:
        _ = time.monotonic() - t0


async def api_v2_client(session, base, text):
    import aiohttp

    try:
        async with session.get(base + "/tts", params={
                "text": text, "ref_audio_path": f"{ASSETS}/prompt.wav",
                "prompt_text": "hello there.", "media_type": "wav"},
                timeout=aiohttp.ClientTimeout(total=600)) as r:
            body = await r.read()
            if r.status != 200 or body[:4] != b"RIFF":
                return f"api_v2 http {r.status}"
            return None
    except Exception as e:  # noqa: BLE001
        return f"api_v2 {type(e).__name__}: {e}"


async def soak(base, pid, minutes, out_path):
    import aiohttp

    t_end = time.monotonic() + minutes * 60
    samples, errors, counts = [], [], {"streams": 0, "cancelled": 0,
                                       "api_v2": 0, "drain_cycles": 0,
                                       "weight_switches": 0}
    rnd = random.Random(1234)
    # big read buffer: SSE audio events are single base64 lines that can
    # exceed aiohttp's default 64 KiB line buffer ("ValueError: Chunk too
    # big" killed every long clip in the first soak attempt)
    async with aiohttp.ClientSession(read_bufsize=2 ** 23) as session:

        async def sample():
            try:
                async with session.get(base + "/health") as r:
                    h = await r.json()
            except Exception as e:  # noqa: BLE001 — server died: record it
                errors.append(f"health sample failed: {type(e).__name__}")
                h = {}
            samples.append({
                "t_s": round(time.monotonic() - t0, 1),
                "rss_mb": round(rss_mb(pid), 1),
                "n_maps": n_maps(pid),
                "backend_compiles": h.get("backend_compiles"),
                "live_arrays": h.get("live_arrays"),
                "inflight": h.get("inflight"),
            })

        t0 = time.monotonic()
        last_drain = last_switch = t0
        await sample()
        cycle = 0
        aborted = None
        while time.monotonic() < t_end:
            cycle += 1
            # wave of 2-4 concurrent SSE clients, mixed signatures,
            # ~30% cancel mid-stream
            n = rnd.randint(2, 4)
            tasks = []
            for i in range(n):
                text = rnd.choice(TEXTS)
                cancel = rnd.random() < 0.3
                tasks.append(sse_client(
                    session, base, text,
                    cancel_after=rnd.randint(1, 3) if cancel else None))
            if rnd.random() < 0.5:
                tasks.append(api_v2_client(session, base, rnd.choice(TEXTS)))
                counts["api_v2"] += 1
            results = await asyncio.gather(*tasks)
            for res in results:
                if res is None:
                    continue
                if isinstance(res, str):
                    errors.append(res)
                    continue
                n_audio, done, cancelled, err = res
                counts["streams"] += 1
                if cancelled:
                    counts["cancelled"] += 1
                elif err:
                    errors.append(err)
                elif not done or n_audio == 0:
                    errors.append(f"incomplete stream ({n_audio} events, "
                                  f"done={done})")
            # periodic drain cycle: enable, verify shed, disable
            # (time-based: cycle duration varies wildly on the CPU fixture)
            if time.monotonic() - last_drain > 180:
                last_drain = time.monotonic()
                counts["drain_cycles"] += 1
                try:
                    await session.post(base + "/drain", json={"enable": True})
                    async with session.post(base + "/tts/stream", json={
                            "text": "x", "speaker_audio": f"{ASSETS}/spk.wav",
                            "prompt_audio": f"{ASSETS}/prompt.wav",
                            "prompt_text": "hello there."}) as r:
                        if r.status != 503:
                            errors.append(
                                f"drain admitted a stream ({r.status})")
                except Exception as e:  # noqa: BLE001 — server may be dead
                    errors.append(f"drain cycle failed: {type(e).__name__}")
                finally:
                    # ALWAYS try to lift the drain: a transient shed-probe
                    # failure must not leave the server draining (every
                    # later request would 503 and fail the whole soak)
                    try:
                        await session.post(base + "/drain",
                                           json={"enable": False})
                    except Exception:  # noqa: BLE001
                        errors.append("drain disable failed")
            # occasional weight re-switch (same path — exercises the
            # load/unload cycle without changing the model)
            if time.monotonic() - last_switch > 300:
                last_switch = time.monotonic()
                counts["weight_switches"] += 1
                try:
                    async with session.get(
                            base + "/set_gpt_weights",
                            params={"weights_path": f"{ASSETS}/tiny_s1.ckpt"},
                            ) as r:
                        if r.status != 200:
                            errors.append(f"weight switch http {r.status}")
                except Exception as e:  # noqa: BLE001
                    errors.append(f"weight switch failed: {type(e).__name__}")
            await sample()
            if samples[-1].get("backend_compiles") is None:
                aborted = "server unreachable (died mid-soak)"
                break

    # verdict
    samples = [s for s in samples if s.get("backend_compiles") is not None]
    if len(samples) < 3:
        with open(out_path, "w") as f:
            json.dump({"aborted": aborted or "too few samples",
                       "errors": errors, "samples": samples}, f, indent=2)
        print(f"ABORTED: {aborted}; wrote partial {out_path}")
        return 1
    third = max(1, len(samples) // 3)
    post_warm = samples[third:]
    rss0, rss1 = post_warm[0]["rss_mb"], post_warm[-1]["rss_mb"]
    rss_growth_pct = 100.0 * (rss1 - rss0) / max(rss0, 1.0)
    final_third = samples[-third:]
    compiles_delta_final = (final_third[-1]["backend_compiles"] -
                            final_third[0]["backend_compiles"])
    compiles_total = max(samples[-1]["backend_compiles"], 1)
    maps_delta_final = final_third[-1]["n_maps"] - final_third[0]["n_maps"]
    maps_total = max(samples[-1]["n_maps"], 1)
    report = {
        "minutes": minutes,
        "counts": counts,
        "errors": errors,
        "samples_every_cycle": samples,
        "rss_post_warm_mb": [rss0, rss1],
        "rss_growth_pct_post_warm": round(rss_growth_pct, 2),
        "backend_compiles_final": samples[-1]["backend_compiles"],
        "compiles_in_final_third": compiles_delta_final,
        "live_arrays_first_last": [samples[0]["live_arrays"],
                                   samples[-1]["live_arrays"]],
        "n_maps_first_last": [samples[0]["n_maps"], samples[-1]["n_maps"]],
        "compile_share_final_third_pct": round(
            100.0 * compiles_delta_final / compiles_total, 1),
        "maps_share_final_third_pct": round(
            100.0 * maps_delta_final / maps_total, 1),
        "verdict": {
            "rss_flat": rss_growth_pct < 15.0,
            "compiles_bounded": (
                compiles_delta_final <= 0.10 * compiles_total
                and maps_delta_final <= 0.05 * maps_total),
            "zero_errors": not errors,
            "survived": aborted is None,
        },
    }
    if aborted:
        report["aborted"] = aborted
    report["pass"] = all(report["verdict"].values())
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("counts", "rss_growth_pct_post_warm",
                       "backend_compiles_final", "compiles_in_final_third",
                       "compile_share_final_third_pct",
                       "maps_share_final_third_pct",
                       "live_arrays_first_last", "verdict", "pass")},
                     indent=2))
    print(f"errors: {errors[:10]}")
    print(f"wrote {out_path}")
    return 0 if report["pass"] else 1


def main() -> int:
    global ASSETS
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--minutes", type=float, default=20.0)
    ap.add_argument("--assets", default="/tmp/gsv_assets")
    ap.add_argument("--port", type=int, default=19899)
    ap.add_argument("--out", default=os.path.join(REPO, "SOAK_r05.json"))
    args = ap.parse_args()
    ASSETS = args.assets

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
               GSV_OFFLINE="1")
    srv = subprocess.Popen(
        [sys.executable, "-m", "gsv_tts_tpu.serving.server",
         "--host", "127.0.0.1", "--port", str(args.port),
         "--models-dir", args.assets,
         "--gpt", f"{args.assets}/tiny_s1.ckpt",
         "--sovits", f"{args.assets}/tiny_s2.pth",
         "--dtype", "float32", "--stream-share"],
        env=env, stdout=open("/tmp/soak_server.log", "w"),
        stderr=subprocess.STDOUT, cwd="/tmp")
    base = f"http://127.0.0.1:{args.port}"
    try:
        import requests

        for _ in range(120):
            try:
                if requests.get(base + "/health", timeout=3).status_code == 200:
                    break
            except Exception:  # noqa: BLE001
                pass
            time.sleep(5)
        else:
            print("server never became healthy; see /tmp/soak_server.log")
            return 2
        print(f"server up (pid {srv.pid}); soaking {args.minutes} min ...")
        return asyncio.run(soak(base, srv.pid, args.minutes, args.out))
    finally:
        srv.send_signal(signal.SIGTERM)
        try:
            srv.wait(timeout=15)
        except subprocess.TimeoutExpired:
            srv.kill()


if __name__ == "__main__":
    sys.exit(main())
