"""SSE streaming client with TTFA (time-to-first-audio) measurement —
the reference measures first-packet latency in ``API/test_realtime_api.py``.

Run the server first:
  python -m gsv_tts_tpu.serving.server --gpt ... --sovits ...
"""
import argparse
import asyncio
import base64
import json
import time

import aiohttp
import numpy as np


async def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:9880")
    ap.add_argument("--spk", required=True)
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--prompt-text", required=True)
    ap.add_argument("--text", default="流式合成延迟测试。这是第二句话。")
    args = ap.parse_args()

    payload = {
        "text": args.text,
        "speaker_audio": args.spk,
        "prompt_audio": args.prompt,
        "prompt_text": args.prompt_text,
    }
    t0 = time.perf_counter()
    ttfa = None
    total = 0
    async with aiohttp.ClientSession() as session:
        async with session.post(f"{args.url}/tts/stream", json=payload) as resp:
            resp.raise_for_status()
            buffer = b""
            async for data, _ in resp.content.iter_chunks():
                buffer += data
                while b"\n\n" in buffer:
                    event, buffer = buffer.split(b"\n\n", 1)
                    text = event.decode()
                    if text.startswith("event: audio"):
                        if ttfa is None:
                            ttfa = time.perf_counter() - t0
                        chunk = json.loads(text.split("data: ", 1)[1])
                        audio = np.frombuffer(
                            base64.b64decode(chunk["audio"]), np.float32)
                        total += len(audio) / chunk["sample_rate"]
                    elif text.startswith("event: done"):
                        wall = time.perf_counter() - t0
                        print(f"TTFA: {ttfa * 1000:.0f} ms")
                        print(f"audio: {total:.2f}s in {wall:.2f}s wall "
                              f"(RTF {wall / total:.3f})")
                        return


if __name__ == "__main__":
    asyncio.run(main())
