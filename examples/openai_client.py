"""OpenAI Audio API client against the compat surface (/v1/audio/speech).

Works three ways:
  1. with the official ``openai`` SDK when installed (``--sdk``),
  2. with plain ``aiohttp`` otherwise (same wire bytes),
  3. streaming via ``stream_format: "sse"`` (base64 pcm deltas).

Run the server first with a voice registry:
  python -m gsv_tts_tpu.serving.server --gpt ... --sovits ... \
      --voices voices.json
  # voices.json: {"alloy": {"speaker_audio": "spk.wav",
  #                         "prompt_audio": "prompt.wav",
  #                         "prompt_text": "reference transcript."}}
"""
import argparse
import asyncio
import base64
import json
import time

import aiohttp


async def speak(url: str, voice: str, text: str, out: str):
    async with aiohttp.ClientSession() as s:
        r = await s.post(f"{url}/v1/audio/speech", json={
            "model": "tts-1", "input": text, "voice": voice,
            "response_format": "wav"})
        r.raise_for_status()
        with open(out, "wb") as f:
            f.write(await r.read())
        print(f"wrote {out} ({r.content_length} bytes)")


async def speak_sse(url: str, voice: str, text: str):
    t0 = time.perf_counter()
    pcm = bytearray()
    # one SSE line carries a whole base64 pcm chunk — the 64 KiB default
    # readline buffer raises "Chunk too big" on long chunks
    async with aiohttp.ClientSession(read_bufsize=4 * 1024 * 1024) as s:
        r = await s.post(f"{url}/v1/audio/speech", json={
            "input": text, "voice": voice, "stream_format": "sse"})
        r.raise_for_status()
        async for raw in r.content:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            ev = json.loads(line[6:])
            if ev["type"] == "speech.audio.delta":
                if not pcm:
                    print(f"TTFA {time.perf_counter() - t0:.3f}s")
                pcm += base64.b64decode(ev["audio"])
            elif ev["type"] == "speech.audio.done":
                u = ev["usage"]
                print(f"done: {u['output_duration_s']:.2f}s audio, "
                      f"{len(pcm)} pcm bytes, "
                      f"{u['input_characters']} input chars")


def speak_sdk(url: str, voice: str, text: str, out: str):
    """The official SDK path — identical wire format."""
    from openai import OpenAI  # pip install openai

    client = OpenAI(base_url=f"{url}/v1", api_key="unused")
    with client.audio.speech.with_streaming_response.create(
            model="tts-1", voice=voice, input=text,
            response_format="wav") as resp:
        resp.stream_to_file(out)
    print(f"wrote {out} via the openai SDK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:9880")
    ap.add_argument("--voice", default="alloy")
    ap.add_argument("--text", default="Hello from the OpenAI-compatible "
                                      "endpoint.")
    ap.add_argument("--out", default="speech.wav")
    ap.add_argument("--sse", action="store_true", help="stream pcm deltas")
    ap.add_argument("--sdk", action="store_true",
                    help="use the installed `openai` SDK instead of aiohttp")
    args = ap.parse_args()
    if args.sdk:
        speak_sdk(args.url, args.voice, args.text, args.out)
    elif args.sse:
        asyncio.run(speak_sse(args.url, args.voice, args.text))
    else:
        asyncio.run(speak(args.url, args.voice, args.text, args.out))
