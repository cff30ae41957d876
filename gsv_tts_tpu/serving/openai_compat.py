"""OpenAI-compatible speech surface: ``POST /v1/audio/speech``.

Drop-in endpoint for clients speaking the OpenAI Audio API — the de-facto
standard TTS client protocol (OpenAI SDKs, LiteLLM, LangChain, Home
Assistant, ...).  The reference server speaks only its own personal_api
and the GPT-SoVITS api_v2 surface (``/root/reference/API/personal_api.py``,
``api_v2``-style ``/tts``); this module is beyond-reference: point any
OpenAI client's ``base_url`` at this server and TTS works unchanged.

Voice names map to reference-audio bundles via a JSON registry
(``--voices`` on the server CLI)::

    {"alloy": {"speaker_audio": "/path/spk.wav",
               "prompt_audio": "/path/prompt.wav",
               "prompt_text": "reference transcript."}}

Request schema (the OpenAI subset that is meaningful here; unknown fields
are ignored so stock SDK payloads pass validation):

``model``
    Accepted for wire compatibility; one engine serves regardless.
``input``
    Text to synthesize (required).
``voice``
    A registry name.  Escape hatch: requests may instead carry
    ``speaker_audio``/``prompt_audio``/``prompt_text`` directly (OpenAI
    SDKs pass them through ``extra_body``).
``response_format``
    ``wav`` | ``pcm`` always (pcm = 16-bit little-endian mono @32 kHz,
    OpenAI's pcm convention); ``flac``/``aac``/``ogg`` when the optional
    soundfile encoder can produce them; ``mp3``/``opus`` never (no
    pure-Python psychoacoustic encoder is practical) → 400/415 listing
    what IS supported.  Default ``wav`` (OpenAI defaults to mp3, which
    would always fail here).
``speed``
    0.25–4.0 (OpenAI bounds), mapped to the facade ``speed``.
``stream_format``
    ``"audio"`` (default — one audio body) or ``"sse"``: OpenAI's
    streaming shape, ``data: {"type": "speech.audio.delta", "audio":
    <b64>}`` events followed by ``{"type": "speech.audio.done", "usage":
    ...}``.  SSE deltas are always pcm frames (wav/pcm formats only).
``top_k`` / ``top_p`` / ``temperature`` / ``repetition_penalty`` /
``noise_scale`` / ``stream_chunk``
    Optional sampling passthrough to the facade (OpenAI SDKs send these
    via ``extra_body``).

Errors use the OpenAI envelope::

    {"error": {"message": ..., "type": "invalid_request_error", "param": ...}}

Also served: ``GET /v1/models`` (loaded GPT checkpoints in the OpenAI
list shape) and ``GET /v1/audio/voices`` (the registry names — a common
compat-server extension; OpenAI itself has no voice-list endpoint).
"""
from __future__ import annotations

import base64
import json
import logging
import time
from typing import Any, Dict, Optional

from aiohttp import web

from .server import (SF_FORMATS, _supported_media_types, pack_audio,
                     pack_raw, pack_wav)

__all__ = ["add_openai_routes", "load_voices"]

_CONTENT_TYPES = {"wav": "audio/wav", "pcm": "audio/pcm",
                  "flac": "audio/flac", "aac": "audio/aac",
                  "ogg": "audio/ogg"}


def load_voices(path: str) -> Dict[str, dict]:
    """Load and validate a ``--voices`` JSON registry."""
    with open(path, "r", encoding="utf-8") as f:
        voices = json.load(f)
    if not isinstance(voices, dict):
        raise ValueError(f"{path}: voices registry must be a JSON object")
    for name, v in voices.items():
        if not isinstance(v, dict) or not v.get("speaker_audio") \
                or not v.get("prompt_audio"):
            raise ValueError(
                f"{path}: voice '{name}' needs speaker_audio and "
                f"prompt_audio (prompt_text optional when an ASR backend "
                f"is configured)")
    return voices


def _supported_formats() -> tuple:
    """OpenAI format names available here: wav/pcm always, plus whatever
    the server's shared soundfile probe can encode (one probe, one
    packing switch — ``server._supported_media_types``/``pack_audio``)."""
    gated = tuple(f for f in _supported_media_types() if f in SF_FORMATS)
    return ("wav", "pcm") + gated


def _error(status: int, message: str, param: Optional[str] = None,
           err_type: str = "invalid_request_error",
           headers: Optional[dict] = None) -> web.Response:
    return web.json_response(
        {"error": {"message": message, "type": err_type, "param": param}},
        status=status, headers=headers)


def _pack(data, rate: int, fmt: str) -> bytes:
    if fmt == "pcm":
        return pack_raw(data)
    if fmt == "wav":
        return pack_wav(data, rate)
    return pack_audio(data, rate, fmt)  # gated by _supported_formats()


class _OpenAISpeech:
    """Handlers; ``server`` is the hosting :class:`TTSServer` (shares its
    audio-URL resolution, ASR prompt fallback, and timing reservoirs)."""

    def __init__(self, server, voices: Optional[Dict[str, dict]]):
        self.server = server
        self.voices = voices or {}
        self.started = int(time.time())  # /v1/models "created" epoch

    # -- request resolution --------------------------------------------

    async def _resolve_voice(self, req: dict):
        """Returns ``(speaker_audio, prompt_audio, prompt_text)`` or an
        error response."""
        if req.get("speaker_audio") and req.get("prompt_audio"):
            spec: Dict[str, Any] = {k: req.get(k) for k in
                                    ("speaker_audio", "prompt_audio",
                                     "prompt_text")}
        else:
            voice = req.get("voice")
            if not voice:
                return _error(
                    400, "missing 'voice' (and no speaker_audio/"
                    "prompt_audio escape-hatch fields)", param="voice")
            spec = self.voices.get(str(voice))
            if spec is None:
                avail = sorted(self.voices)
                detail = (f"available: {avail}" if avail else
                          "no voices configured (start the server with "
                          "--voices registry.json)")
                return _error(400, f"unknown voice '{voice}'; {detail}",
                              param="voice")
        spk = await self.server._resolve_audio(spec["speaker_audio"])
        prompt = await self.server._resolve_audio(spec["prompt_audio"])
        try:
            prompt_text = await self.server._resolve_prompt(
                prompt, spec.get("prompt_text"))
        except web.HTTPBadRequest as e:
            # "prompt_text required, no ASR backend" in the OpenAI envelope
            return _error(400, e.text, param="voice")
        return spk, prompt, prompt_text

    @staticmethod
    def _speed(req: dict):
        try:
            speed = float(req.get("speed", 1.0))
        except (TypeError, ValueError):
            return _error(400, "speed must be a number", param="speed")
        if not 0.25 <= speed <= 4.0:  # the OpenAI bounds
            return _error(400, "speed must be between 0.25 and 4.0",
                          param="speed")
        return speed

    @staticmethod
    def _sampling_kw(req: dict):
        """Optional sampling passthrough (OpenAI SDKs send these via
        ``extra_body``): top_k/top_p/temperature/repetition_penalty/
        noise_scale map straight to the facade."""
        kw: Dict[str, Any] = {}
        for key, cast in (("top_k", int), ("top_p", float),
                          ("temperature", float),
                          ("repetition_penalty", float),
                          ("noise_scale", float)):
            if req.get(key) is not None:
                try:
                    kw[key] = cast(req[key])
                except (TypeError, ValueError):
                    return _error(400, f"{key} must be numeric", param=key)
        return kw

    # -- endpoints -------------------------------------------------------

    async def speech(self, request: web.Request) -> web.StreamResponse:
        from .server import parse_json

        try:
            req = await parse_json(request)
        except web.HTTPBadRequest as e:
            # re-shape the generic 400 into the OpenAI error envelope
            return _error(400, json.loads(e.text).get("error", e.text))
        text = req.get("input")
        if not text or not isinstance(text, str):
            return _error(400, "'input' is required", param="input")
        fmt = str(req.get("response_format", "wav")).lower()
        supported = _supported_formats()
        if fmt not in supported:
            known = fmt in ("mp3", "opus") or fmt in SF_FORMATS
            return _error(
                415 if known else 400,
                f"response_format '{fmt}' is not available on this server; "
                f"supported: {list(supported)}", param="response_format")
        speed = self._speed(req)
        if isinstance(speed, web.Response):
            return speed
        kw = self._sampling_kw(req)
        if isinstance(kw, web.Response):
            return kw
        try:  # validate BEFORE any SSE prepare — a bad value after the 200
            chunk = int(req.get("stream_chunk", 25))
        except (TypeError, ValueError):
            return _error(400, "stream_chunk must be an integer",
                          param="stream_chunk")
        try:
            resolved = await self._resolve_voice(req)
            if isinstance(resolved, web.Response):
                return resolved
            spk, prompt, prompt_text = resolved

            if str(req.get("stream_format", "audio")) == "sse":
                return await self._speech_sse(request, req, text, fmt, speed,
                                              kw, chunk, spk, prompt,
                                              prompt_text)

            t0 = time.perf_counter()
            clip = await self.server.tts.infer_async(
                spk_audio_path=spk, prompt_audio_path=prompt,
                prompt_audio_text=prompt_text, text=text, speed=speed, **kw)
            # whole-utterance time — NOT the ttfa_s reservoir (that one is
            # first-chunk latency on the streaming routes; mixing them
            # would skew /health and /metrics percentiles)
            self.server.timings.record("synth_s", time.perf_counter() - t0)
            return web.Response(
                body=_pack(clip.audio_data, clip.samplerate, fmt),
                content_type=_CONTENT_TYPES[fmt])
        except web.HTTPException as e:
            # keep the status, re-shape the body into the OpenAI envelope
            # (resolution failures raise aiohttp HTTP errors)
            return _error(e.status, e.text or str(e.reason),
                          err_type="invalid_request_error"
                          if e.status < 500 else "server_error")
        except Exception as e:  # noqa: BLE001 — envelope, not a raw 500 page
            logging.exception("openai speech failure")
            return _error(500, str(e), err_type="server_error")

    async def _speech_sse(self, request, req, text, fmt, speed, kw, chunk,
                          spk, prompt, prompt_text) -> web.StreamResponse:
        """OpenAI ``stream_format: "sse"``: pcm16 deltas as they decode.

        Honors the server's ``--stream-share`` default (and a per-request
        ``"shared"`` override) exactly like the native ``/tts/stream``:
        shared clients join the batched wave, and ``--max-streams``
        admission sheds past-capacity clients with a clean 503 +
        Retry-After in the OpenAI envelope BEFORE the SSE starts."""
        if fmt not in ("wav", "pcm"):
            return _error(400, "stream_format 'sse' supports response_format"
                               " wav/pcm only (deltas are pcm frames)",
                          param="stream_format")
        from .server import truthy

        tts = self.server.tts
        shared = truthy(req.get("shared", self.server.stream_share))
        release_admission = None
        if shared and hasattr(tts, "admit_shared_client"):
            from ..runtime.wave import WaveOverloadedError

            try:
                release_admission = tts.admit_shared_client()
            except WaveOverloadedError:
                return _error(
                    503, "server at capacity (max concurrent shared "
                         "streams reached)", err_type="server_error",
                    headers={"Retry-After": "1"})
        try:
            return await self._speech_sse_body(
                request, text, fmt, speed, kw, chunk, spk, prompt,
                prompt_text, shared, release_admission is not None)
        finally:
            if release_admission is not None:
                release_admission()

    async def _speech_sse_body(self, request, text, fmt, speed, kw, chunk,
                               spk, prompt, prompt_text, shared,
                               admitted) -> web.StreamResponse:
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "X-Accel-Buffering": "no",
        })
        await resp.prepare(request)
        t0 = time.perf_counter()
        first = True
        total = 0
        if shared:
            agen = self.server.tts.stream_shared_async(
                spk_audio_path=spk, prompt_audio_path=prompt,
                prompt_audio_text=prompt_text, text=text, speed=speed,
                stream_chunk=chunk, debug=False, admitted=admitted, **kw)
        else:
            agen = self.server.tts.infer_stream_async(
                spk_audio_path=spk, prompt_audio_path=prompt,
                prompt_audio_text=prompt_text, text=text, speed=speed,
                stream_chunk=chunk, debug=False, **kw)
        try:
            async for clip in agen:
                if first:
                    self.server.timings.record(
                        "ttfa_s", time.perf_counter() - t0)
                    first = False
                total += len(clip.audio_data)
                delta = {"type": "speech.audio.delta",
                         "audio": base64.b64encode(
                             pack_raw(clip.audio_data)).decode()}
                await resp.write(b"data: " + json.dumps(delta).encode()
                                 + b"\n\n")
            done = {"type": "speech.audio.done",
                    "usage": {"input_characters": len(text),
                              "output_duration_s":
                                  total / self.server.tts.samplerate,
                              "sample_rate": self.server.tts.samplerate}}
            await resp.write(b"data: " + json.dumps(done).encode() + b"\n\n")
        except (ConnectionResetError, ConnectionError):
            await agen.aclose()
            return resp
        except Exception as e:  # noqa: BLE001 — surface as an SSE error event
            err = {"type": "error",
                   "error": {"message": str(e), "type": "server_error"}}
            try:
                await resp.write(b"data: " + json.dumps(err).encode()
                                 + b"\n\n")
            except (ConnectionResetError, ConnectionError):
                return resp
        await resp.write_eof()
        return resp

    async def models(self, request: web.Request) -> web.Response:
        tts = self.server.tts
        data = [{"id": str(m), "object": "model", "created": self.started,
                 "owned_by": "gsv-tts-tpu"} for m in tts.get_gpt_list()]
        return web.json_response({"object": "list", "data": data})

    async def voices_list(self, request: web.Request) -> web.Response:
        return web.json_response({"voices": sorted(self.voices)})


def add_openai_routes(app: web.Application, server,
                      voices: Optional[Dict[str, dict]] = None) -> None:
    oai = _OpenAISpeech(server, voices)
    app["openai"] = oai
    app.router.add_post("/v1/audio/speech", oai.speech)
    app.router.add_get("/v1/models", oai.models)
    app.router.add_get("/v1/audio/voices", oai.voices_list)
