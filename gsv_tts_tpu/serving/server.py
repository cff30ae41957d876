"""HTTP serving layer (aiohttp): SSE streaming, batched synthesis, and the
GPT-SoVITS api_v2 compatibility surface.

Endpoint-compatible with the reference FastAPI server
(``API/personal_api.py``):

  GET  /                      – service info
  POST /tts/stream            – SSE: base64 audio chunks + subtitles
                                 (``personal_api.py:560-663``)
  POST /tts/batched           – batched synthesis, JSON with file refs
                                 (``personal_api.py:666-745``)
  GET  /audio/{filename}      – serve generated files (``personal_api.py:748``)
  GET/POST /tts               – GPT-SoVITS api_v2 compatibility
                                 (``personal_api.py:474-535``)
  GET  /set_gpt_weights       – hot model switch (``personal_api.py:538-557``)
  GET  /set_sovits_weights
  GET  /health                – liveness + engine metrics
  POST /v1/audio/speech       – OpenAI Audio API compatibility (beyond the
  GET  /v1/models               reference; serving/openai_compat.py)
  GET  /v1/audio/voices

Built on aiohttp (no FastAPI dependency); the engine's async wrappers
serialize device work behind the engine lock.
"""
from __future__ import annotations

import asyncio
import base64
import functools
import hashlib
import io
import json
import logging
import os
import re
import tempfile
import time
import uuid
import wave
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

try:
    from aiohttp import web
    import aiohttp
except ImportError as e:  # pragma: no cover
    raise ImportError("The serving layer requires `aiohttp`") from e

from ..utils.timing import Timings

# api_v2 cut-method → cut_minlen mapping (``personal_api.py:203-210``)
CUT_METHOD2MINLEN = {"cut0": 999, "cut1": 50, "cut2": 50, "cut3": 20,
                     "cut4": 20, "cut5": 10}

AUDIO_DIR = Path(tempfile.gettempdir()) / "gsv_tts_tpu_audio"


_FALSY = (False, 0, "0", None, "", "false", "False")


def truthy(v) -> bool:
    """JSON bool fields arrive as strings from some clients — treat
    "false"/"0" as off (same tuple api_v2's GET parsing uses) instead of
    ``bool("false") is True`` silently enabling the option."""
    return v not in _FALSY


def is_url(path: str) -> bool:
    return isinstance(path, str) and path.startswith(("http://", "https://"))


def _bad_request(msg: str):
    raise web.HTTPBadRequest(text=json.dumps({"error": msg}),
                             content_type="application/json")


async def parse_json(request: web.Request) -> dict:
    """Body parse that turns client mistakes into a clean 400 (the
    reference FastAPI surface answers 422) instead of an aiohttp 500."""
    try:
        req = await request.json()
    except Exception:
        _bad_request("request body must be valid JSON")
    if not isinstance(req, dict):
        _bad_request("request body must be a JSON object")
    return req


def require(req: dict, *keys: str) -> None:
    missing = [k for k in keys if req.get(k) in (None, "", [])]
    if missing:
        _bad_request("missing required field(s): " + ", ".join(missing))


def pack_raw(data: np.ndarray) -> bytes:
    return (np.clip(np.asarray(data, np.float32), -1, 1) * 32767).astype("<i2").tobytes()


def wave_header_chunk(frame_input: bytes = b"", channels: int = 1,
                      sample_width: int = 2, sample_rate: int = 32000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sample_width)
        w.setframerate(sample_rate)
        w.writeframes(frame_input)
    buf.seek(0)
    return buf.read()


def pack_wav(data: np.ndarray, rate: int) -> bytes:
    return wave_header_chunk(pack_raw(data), sample_rate=rate)


#: soundfile-gated encodings (mp3/opus are NOT encodable: libsndfile
#: builds here lack lame/opus and no pure-Python encoder is practical)
SF_FORMATS = {"ogg": "OGG", "aac": "AAC", "flac": "FLAC"}


@functools.lru_cache(maxsize=1)
def _supported_media_types() -> tuple:
    """wav/raw always; ogg/aac/flac only if the optional soundfile backend
    can actually encode them (probed once — importability alone is not
    enough: libsndfile builds differ in codec support).  api_v2 itself
    accepts only the reference's wav/raw/ogg/aac set; flac is probed for
    the OpenAI-compat surface."""
    out = ["wav", "raw"]
    try:
        import soundfile as sf

        for name, fmt in SF_FORMATS.items():
            try:
                buf = io.BytesIO()
                sf.write(buf, np.zeros(64, np.float32), 32000, format=fmt)
                out.append(name)
            except Exception:
                pass
    except ImportError:
        pass
    return tuple(out)


def pack_audio(data: np.ndarray, rate: int, media_type: str) -> bytes:
    """api_v2 response packing (``personal_api.py``).  wav/raw are always
    available; ogg/aac require the optional ``soundfile`` encoder —
    without it the request gets a documented 415 listing what IS
    supported (no pure-Python psychoacoustic encoder is practical)."""
    if media_type == "raw":
        return pack_raw(data)
    if media_type == "wav":
        return pack_wav(data, rate)
    if media_type in SF_FORMATS:
        try:
            import soundfile as sf
        except ImportError:
            raise web.HTTPUnsupportedMediaType(
                text=json.dumps({
                    "error": f"media_type '{media_type}' needs the optional "
                             "`soundfile` encoder backend",
                    "supported": _supported_media_types(),
                }), content_type="application/json")
        try:
            buf = io.BytesIO()
            sf.write(buf, np.asarray(data, np.float32), rate,
                     format=SF_FORMATS[media_type])
            return buf.getvalue()
        except Exception as e:  # encoder present but can't do this codec
            raise web.HTTPUnsupportedMediaType(
                text=json.dumps({
                    "error": f"encoder backend cannot produce '{media_type}': {e}",
                    "supported": _supported_media_types(),
                }), content_type="application/json")
    raise web.HTTPBadRequest(
        text=json.dumps({"error": f"unknown media_type '{media_type}'",
                         "supported": _supported_media_types()}),
        content_type="application/json")


#: process-wide backend-compile tally ([count]); see TTSServer._compile_base
_COMPILE_TALLY = [0]
_COMPILE_LISTENER_INSTALLED = False


def _install_compile_counter() -> int:
    """Register the (single, module-level) jax.monitoring compile listener
    and return the current tally — a server snapshots this at init so its
    /health ``backend_compiles`` counts only its own lifetime."""
    global _COMPILE_LISTENER_INSTALLED
    if not _COMPILE_LISTENER_INSTALLED:
        try:
            import jax.monitoring

            def _on_event_duration(event: str, duration: float, **kw):
                if "backend_compile" in event:
                    _COMPILE_TALLY[0] += 1

            jax.monitoring.register_event_duration_secs_listener(
                _on_event_duration)
            _COMPILE_LISTENER_INSTALLED = True
        except Exception:  # noqa: BLE001 — observability must never block
            pass
    return _COMPILE_TALLY[0]


class TTSServer:
    def __init__(self, tts, asr_fn=None, batch_window_ms: float = 0.0,
                 batch_max: int = 4, stream_share: bool = False):
        """``tts``: a gsv_tts_tpu.TTS engine.  ``asr_fn``: optional callable
        (audio_path → transcript) used when prompt_text is omitted (the
        reference calls Qwen3-ASR, ``personal_api.py:92-108``).
        ``batch_window_ms`` > 0 coalesces concurrent non-streaming api_v2
        requests arriving within the window into one continuous-batched
        synthesis call (``serving/batcher.py`` — beyond the reference,
        which serializes every request).  NOTE: when >=2 requests coalesce,
        each is synthesized with the api's ``batch_infer=true`` semantics —
        text split per ``text_split_method`` with ``fragment_interval``
        silence between segments (``infer_batched`` structurally inserts
        the fragment pauses).  A flush wave holding exactly ONE request
        bypasses that and keeps the documented single-``infer`` semantics
        (only the window's latency is added).

        ``stream_share`` makes ``/tts/stream`` route through the shared
        wave scheduler by default (``TTS.stream_shared`` — N independent
        SSE clients decode concurrently in one batched kernel wave instead
        of queueing on the engine lock); each request can override with
        ``"shared": true/false``."""
        self.tts = tts
        self.asr_fn = asr_fn
        self.stream_share = stream_share
        self.timings = Timings()
        #: graceful drain (POST /drain): new synthesis requests answer 503
        #: + Retry-After while in-flight streams finish — the rolling-
        #: restart primitive (the router's capacity-503 failover routes
        #: around a draining replica automatically)
        self.draining = False
        self._inflight = 0
        #: backend-compile counter (soak/leak observability, r5): a healthy
        #: long-running server compiles each bucketed program ONCE — this
        #: number must plateau; unbounded growth = a shape leaking into the
        #: jit cache keys (tools/soak.py watches it alongside RSS and
        #: jax.live_arrays()).  Counted via a module-level listener
        #: registered ONCE: jax.monitoring listeners live in a
        #: process-global registry with no practical unregister on object
        #: death, so a per-instance closure over ``self`` would pin every
        #: server (and its whole model) forever and cross-count instances.
        self._compile_base = _install_compile_counter()
        self.batcher = None
        if batch_window_ms > 0:
            from .batcher import MicroBatcher

            async def _single(spk, prompt, prompt_text, text, **params):
                # drop the batched-only cut kwargs: the lone-request path
                # mirrors the non-batched handler (server.py tts_v2),
                # which passes only the sampling kwargs to infer_async.
                kw = {k: v for k, v in params.items()
                      if k not in ("is_cut_text", "cut_minlen", "cut_mute")}
                return await tts.infer_async(
                    spk_audio_path=spk, prompt_audio_path=prompt,
                    prompt_audio_text=prompt_text, text=text, **kw)

            self.batcher = MicroBatcher(tts, max_batch=batch_max,
                                        max_wait_ms=batch_window_ms,
                                        single_call=_single)
        AUDIO_DIR.mkdir(exist_ok=True)

    # -- helpers -----------------------------------------------------------

    async def _download_audio(self, url: str) -> str:
        suffix = os.path.splitext(url.split("?")[0])[1] or ".wav"
        # URL-keyed cache: repeated requests for the same reference clip
        # reuse the file instead of growing AUDIO_DIR unboundedly
        key = hashlib.sha1(url.encode()).hexdigest()[:24]
        out = AUDIO_DIR / f"dl_{key}{suffix}"
        if out.exists():
            out.touch()  # keep hot entries past the TTL sweep
            return str(out)
        self._sweep_audio_dir()
        async with aiohttp.ClientSession() as session:
            async with session.get(url) as resp:
                resp.raise_for_status()
                tmp = out.with_suffix(out.suffix + f".{uuid.uuid4().hex}.part")
                tmp.write_bytes(await resp.read())
                tmp.replace(out)  # atomic: concurrent same-URL requests race safely
        return str(out)

    @staticmethod
    def _sweep_audio_dir(ttl_s: float = 3600.0):
        """Drop downloads/batch results older than ``ttl_s`` — without this
        a long-running server fills the tempdir (one file per URL prompt
        and per batched text, ~1 MB each, never removed)."""
        cutoff = time.time() - ttl_s
        try:
            for f in AUDIO_DIR.iterdir():
                try:
                    if f.stat().st_mtime < cutoff:
                        f.unlink()
                except OSError:
                    pass
        except OSError:
            pass

    async def _resolve_audio(self, path: str) -> str:
        if is_url(path):
            return await self._download_audio(path)
        return path

    async def _resolve_prompt(self, prompt_audio: str, prompt_text: Optional[str]) -> str:
        if prompt_text:
            return prompt_text
        if self.asr_fn is not None:
            # the ASR backend is a blocking network round-trip — off the
            # event loop, or every concurrent stream stalls for its RTT
            text = await asyncio.get_running_loop().run_in_executor(
                None, self.asr_fn, prompt_audio)
            if text:
                return text
        raise web.HTTPBadRequest(
            text="prompt_text is required (no ASR backend configured)")

    # -- endpoints ---------------------------------------------------------

    async def root(self, request: web.Request) -> web.Response:
        return web.json_response({
            "service": "gsv-tts-lite-tpu",
            "endpoints": ["/tts/stream", "/tts/stream/batched", "/tts/batched",
                          "/tts", "/set_gpt_weights", "/set_sovits_weights",
                          "/audio/{filename}", "/health",
                          "/v1/audio/speech", "/v1/models",
                          "/v1/audio/voices"],
        })

    async def health(self, request: web.Request) -> web.Response:
        engine_timings = (self.tts.get_timings()
                          if hasattr(self.tts, "get_timings") else {})
        import jax

        dev = jax.config.jax_default_device
        payload = {
            "status": "ok",
            "draining": self.draining,
            "inflight": self._inflight,
            "warmed": bool(getattr(self.tts, "_warmed", False)),
            "device": str(dev) if dev is not None else str(jax.devices()[0]),
            "gpt_models": [str(p) for p in self.tts.get_gpt_list()],
            "sovits_models": [str(p) for p in self.tts.get_sovits_list()],
            "timings": {**self.timings.summary(), **engine_timings},
            # leak observability (tools/soak.py): compiles must plateau,
            # live device arrays must stay bounded across churn
            "backend_compiles": _COMPILE_TALLY[0] - self._compile_base,
            "live_arrays": len(jax.live_arrays()),
        }
        if self.batcher is not None:
            payload["batcher"] = self.batcher.stats
        if hasattr(self.tts, "wave_stats"):
            waves = self.tts.wave_stats()
            if waves:
                payload["waves"] = waves
        if hasattr(self.tts, "vocoder_batch_stats"):
            vb = self.tts.vocoder_batch_stats()
            if vb:
                payload["vocoder_batcher"] = vb
        return web.json_response(payload)

    async def drain(self, request: web.Request) -> web.Response:
        """POST /drain: stop admitting synthesis requests (503 +
        Retry-After) while in-flight streams finish — the rolling-restart
        primitive for fleet replicas (the router's capacity-503 failover
        routes around a draining replica; the reference must hard-kill its
        single process).  Body ``{"enable": false}`` re-opens."""
        req = {}
        if request.can_read_body:
            try:
                req = await request.json()
            except Exception:  # noqa: BLE001 — empty/invalid body = enable
                req = {}
        if not isinstance(req, dict):
            req = {}
        self.draining = truthy(req.get("enable", True))
        return web.json_response({"draining": self.draining,
                                  "inflight": self._inflight})

    async def metrics(self, request: web.Request) -> web.Response:
        """Prometheus text exposition of the serving counters — the same
        data /health reports as JSON, flattened into scrapeable gauges
        (the reference has no metrics surface at all; SURVEY §5)."""
        def clean(name: str) -> str:
            return re.sub(r"[^a-zA-Z0-9_]", "_", name)

        import jax

        lines = ["# TYPE gsv_up gauge", "gsv_up 1",
                 f"gsv_backend_compiles "
                 f"{_COMPILE_TALLY[0] - self._compile_base}",
                 f"gsv_live_arrays {len(jax.live_arrays())}"]
        engine_timings = (self.tts.get_timings()
                          if hasattr(self.tts, "get_timings") else {})
        for name, st in sorted({**self.timings.summary(),
                                **engine_timings}.items()):
            base = "gsv_" + clean(name)
            if isinstance(st, dict):
                for k, v in st.items():
                    if isinstance(v, (int, float)):
                        lines.append(f"{base}_{clean(k)} {v:g}")
            elif isinstance(st, (int, float)):
                lines.append(f"{base} {st:g}")
        if self.batcher is not None:
            for k, v in self.batcher.stats.items():
                if isinstance(v, (int, float)):
                    lines.append(f"gsv_batcher_{clean(k)} {v:g}")
        if hasattr(self.tts, "wave_stats"):
            for model, ws in (self.tts.wave_stats() or {}).items():
                if not isinstance(ws, dict):
                    continue
                ml = f'model="{clean(os.path.basename(str(model)))}"'
                for k in ("clients", "max_clients", "max_batch"):
                    v = ws.get(k)
                    if isinstance(v, (int, float)):
                        lines.append(f"gsv_wave_{k}{{{ml}}} {v:g}")
                for i, w in enumerate(ws.get("waves", [])):
                    wl = f'{ml},wave="{i}"'
                    for k in ("batch", "live", "pending", "attached",
                              "finished", "refills", "batched_refills",
                              "resizes"):
                        v = w.get(k)
                        if isinstance(v, (int, float)):
                            lines.append(f"gsv_wave_{k}{{{wl}}} {v:g}")
        if hasattr(self.tts, "vocoder_batch_stats"):
            for k, v in (self.tts.vocoder_batch_stats() or {}).items():
                if isinstance(v, (int, float)):
                    lines.append(f"gsv_vocoder_batcher_{clean(k)} {v:g}")
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    async def tts_stream(self, request: web.Request) -> web.StreamResponse:
        """SSE streaming: audio / subtitle / done / error events."""
        req = await parse_json(request)
        require(req, "text", "speaker_audio", "prompt_audio")
        try:
            kw = dict(
                return_subtitles=truthy(req.get("return_subtitles", False)),
                is_cut_text=truthy(req.get("is_cut_text", True)),
                cut_minlen=int(req.get("cut_minlen", 10)),
                cut_mute=float(req.get("cut_mute", 0.3)),
                stream_chunk=int(req.get("stream_chunk", 25)),
                overlap_len=int(req.get("overlap_len", 5)),
                top_k=int(req.get("top_k", 15)),
                top_p=float(req.get("top_p", 1.0)),
                temperature=float(req.get("temperature", 1.0)),
                repetition_penalty=float(req.get("repetition_penalty", 1.35)),
                noise_scale=float(req.get("noise_scale", 0.5)),
                speed=float(req.get("speed", 1.0)),
                debug=False,
            )
        except (TypeError, ValueError) as e:
            # a client's malformed numeric is a 400, not a mid-SSE error
            _bad_request(f"invalid parameter value: {e}")
        shared = truthy(req.get("shared", self.stream_share))
        release_admission = None
        if shared and hasattr(self.tts, "admit_shared_client"):
            # AUTHORITATIVE admission (--max-streams / TTS
            # wave_max_clients): claim the client slot BEFORE the SSE
            # response starts, so every shed is a clean retryable 503 the
            # router can fail over on — an advisory check would let bursty
            # losers through to a 200 + SSE error event instead.
            try:
                release_admission = self.tts.admit_shared_client()
            except Exception as e:
                from ..runtime.wave import WaveOverloadedError

                if not isinstance(e, WaveOverloadedError):
                    raise
                return web.json_response(
                    {"error": "server at capacity (max concurrent shared "
                              "streams reached)"},
                    status=503, headers={"Retry-After": "1"})
        try:
            speaker_audio = await self._resolve_audio(req["speaker_audio"])
            prompt_audio = await self._resolve_audio(req["prompt_audio"])
            prompt_text = await self._resolve_prompt(prompt_audio,
                                                     req.get("prompt_text"))

            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
                "Connection": "keep-alive",
                "X-Accel-Buffering": "no",
            })
            await resp.prepare(request)

            t0 = time.perf_counter()
            first = True
            total_len = 0
            agen = None
            try:
                if shared:
                    # shared wave: concurrent SSE clients decode in one
                    # batched kernel wave (sentence mode maps to a huge
                    # chunk as in infer_stream; boost_first_chunk has no
                    # batched analogue)
                    if req.get("stream_mode", "token") == "sentence":
                        kw["stream_chunk"] = 10000
                    agen = self.tts.stream_shared_async(
                        spk_audio_path=speaker_audio,
                        prompt_audio_path=prompt_audio,
                        prompt_audio_text=prompt_text,
                        text=req["text"],
                        admitted=release_admission is not None, **kw)
                else:
                    agen = self.tts.infer_stream_async(
                        spk_audio_path=speaker_audio,
                        prompt_audio_path=prompt_audio,
                        prompt_audio_text=prompt_text,
                        text=req["text"],
                        stream_mode=req.get("stream_mode", "token"),
                        boost_first_chunk=truthy(req.get("boost_first_chunk", True)),
                        **kw)
                async for clip in agen:
                    if first:
                        self.timings.record("ttfa_s", time.perf_counter() - t0)
                        first = False
                    total_len += len(clip.audio_data)
                    chunk = {
                        "audio": base64.b64encode(
                            np.asarray(clip.audio_data, np.float32).tobytes()).decode(),
                        "sample_rate": clip.samplerate,
                        "duration": clip.audio_len_s,
                        "subtitles": clip.subtitles,
                        "text": clip.orig_text,
                    }
                    await resp.write(
                        f"event: audio\ndata: {json.dumps(chunk, ensure_ascii=False)}\n\n".encode())
                done = {"total_duration": total_len / self.tts.samplerate}
                await resp.write(f"event: done\ndata: {json.dumps(done)}\n\n".encode())
            except (ConnectionResetError, ConnectionError,
                    aiohttp.ClientConnectionError) as e:
                # routine client disconnect, NOT an inference error: stop
                # the generator (its cancel_event detaches the synthesis
                # worker) and don't write to the dead socket again
                logging.info("client disconnected mid-stream: %s", e)
                if agen is not None:
                    await agen.aclose()
                return resp
            except Exception as e:  # noqa: BLE001
                logging.exception("stream inference error")
                err = {"error": str(e)}
                try:
                    await resp.write(f"event: error\ndata: {json.dumps(err, ensure_ascii=False)}\n\n".encode())
                except (ConnectionResetError, ConnectionError):
                    return resp
            await resp.write_eof()
            return resp
        finally:
            if release_admission is not None:
                release_admission()

    async def tts_stream_batched(self, request: web.Request) -> web.StreamResponse:
        """SSE streaming continuous batching: N texts synthesize
        concurrently through the batched engine; each ``audio`` event is
        tagged with its request ``index`` and a per-request ``done`` flag
        (beyond the reference, which has no streaming batch mode)."""
        req = await parse_json(request)
        require(req, "texts", "speaker_audio", "prompt_audio")
        speaker_audio = await self._resolve_audio(req["speaker_audio"])
        prompt_audio = await self._resolve_audio(req["prompt_audio"])
        prompt_text = await self._resolve_prompt(prompt_audio, req.get("prompt_text"))

        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive",
            "X-Accel-Buffering": "no",
        })
        await resp.prepare(request)
        t0 = time.perf_counter()
        first = True
        try:
            agen = self.tts.infer_batched_stream_async(
                spk_audio_paths=speaker_audio,
                prompt_audio_paths=prompt_audio,
                prompt_audio_texts=prompt_text,
                texts=req["texts"],
                return_subtitles=truthy(req.get("return_subtitles", False)),
                is_cut_text=truthy(req.get("is_cut_text", True)),
                cut_minlen=int(req.get("cut_minlen", 10)),
                cut_mute=float(req.get("cut_mute", 0.3)),
                stream_chunk=int(req.get("stream_chunk", 25)),
                overlap_len=int(req.get("overlap_len", 5)),
                top_k=int(req.get("top_k", 15)),
                top_p=float(req.get("top_p", 1.0)),
                temperature=float(req.get("temperature", 1.0)),
                repetition_penalty=float(req.get("repetition_penalty", 1.35)),
                noise_scale=float(req.get("noise_scale", 0.5)),
                speed=float(req.get("speed", 1.0)),
            )
            async for idx, clip, req_done in agen:
                if first:
                    self.timings.record("ttfa_s", time.perf_counter() - t0)
                    first = False
                chunk = {
                    "index": int(idx),
                    "done": bool(req_done),
                    "audio": base64.b64encode(
                        np.asarray(clip.audio_data, np.float32).tobytes()).decode(),
                    "sample_rate": clip.samplerate,
                    "duration": clip.audio_len_s,
                    "subtitles": clip.subtitles,
                    "text": clip.orig_text,
                }
                await resp.write(
                    f"event: audio\ndata: {json.dumps(chunk, ensure_ascii=False)}\n\n".encode())
            await resp.write(f"event: done\ndata: {{}}\n\n".encode())
        except (ConnectionResetError, ConnectionError,
                aiohttp.ClientConnectionError) as e:
            logging.info("client disconnected mid-stream: %s", e)
            await agen.aclose()
            return resp
        except Exception as e:  # noqa: BLE001
            logging.exception("batched stream inference error")
            err = {"error": str(e)}
            try:
                await resp.write(f"event: error\ndata: {json.dumps(err, ensure_ascii=False)}\n\n".encode())
            except (ConnectionResetError, ConnectionError):
                return resp
        await resp.write_eof()
        return resp

    async def tts_batched(self, request: web.Request) -> web.Response:
        req = await parse_json(request)
        require(req, "texts", "speaker_audio", "prompt_audio")
        speaker_audio = await self._resolve_audio(req["speaker_audio"])
        prompt_audio = await self._resolve_audio(req["prompt_audio"])
        prompt_text = await self._resolve_prompt(prompt_audio, req.get("prompt_text"))

        t0 = time.perf_counter()
        clips = await self.tts.infer_batched_async(
            spk_audio_paths=speaker_audio,
            prompt_audio_paths=prompt_audio,
            prompt_audio_texts=prompt_text,
            texts=req["texts"],
            return_subtitles=truthy(req.get("return_subtitles", False)),
            is_cut_text=truthy(req.get("is_cut_text", True)),
            cut_minlen=int(req.get("cut_minlen", 10)),
            cut_mute=float(req.get("cut_mute", 0.3)),
            top_k=int(req.get("top_k", 15)),
            top_p=float(req.get("top_p", 1.0)),
            temperature=float(req.get("temperature", 1.0)),
            repetition_penalty=float(req.get("repetition_penalty", 1.35)),
            noise_scale=float(req.get("noise_scale", 0.5)),
            speed=float(req.get("speed", 1.0)),
        )
        self.timings.record("batched_s", time.perf_counter() - t0)

        results = []
        self._sweep_audio_dir()
        for i, clip in enumerate(clips):
            fname = f"batch_{uuid.uuid4().hex}_{i}.wav"
            from ..utils.audio_io import save_wav

            save_wav(str(AUDIO_DIR / fname), np.asarray(clip.audio_data), clip.samplerate)
            results.append({
                "text": clip.orig_text,
                "duration": clip.audio_len_s,
                "audio_url": f"/audio/{fname}",
                "subtitles": clip.subtitles,
            })
        return web.json_response({"results": results})

    async def get_audio(self, request: web.Request) -> web.Response:
        filename = request.match_info["filename"]
        path = AUDIO_DIR / os.path.basename(filename)
        if not path.exists():
            raise web.HTTPNotFound(text=f"audio {filename} not found")
        return web.FileResponse(path)

    # -- api_v2 compatibility ---------------------------------------------

    async def _handle_api_v2(self, req: Dict[str, Any]):
        ref_audio_path = req.get("ref_audio_path")
        if not ref_audio_path:
            raise web.HTTPBadRequest(text="ref_audio_path is required")
        ref_audio_path = await self._resolve_audio(ref_audio_path)
        aux = req.get("aux_ref_audio_paths") or []
        if isinstance(aux, str):  # GET query strings arrive unlisted
            aux = [aux]
        if aux:
            speaker_audio: Any = {p: 1.0 for p in [ref_audio_path] + aux}
        else:
            speaker_audio = ref_audio_path
        prompt_text = await self._resolve_prompt(ref_audio_path, req.get("prompt_text"))

        text_input = req.get("text")
        if text_input in (None, ""):
            raise web.HTTPBadRequest(text="text is required")
        media_type = req.get("media_type", "wav")
        if media_type not in {"wav", "raw", "ogg", "aac"}:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": f"unknown media_type '{media_type}'",
                                 "supported": _supported_media_types()}),
                content_type="application/json")
        if media_type not in _supported_media_types():
            # reject before synthesizing: ogg/aac need the optional
            # soundfile encoder (documented 415, VERDICT r1 item 8)
            raise web.HTTPUnsupportedMediaType(
                text=json.dumps({
                    "error": f"media_type '{media_type}' needs the optional "
                             "`soundfile` encoder backend",
                    "supported": _supported_media_types(),
                }), content_type="application/json")

        falsy = (False, 0, "0", None, "", "false", "False")
        streaming_mode = req.get("streaming_mode", False)
        stream_enabled = streaming_mode not in falsy
        batch_infer = req.get("batch_infer", False) not in falsy
        if batch_infer and stream_enabled:
            raise web.HTTPBadRequest(text="batch_infer is not supported with streaming_mode")

        cut_method = req.get("text_split_method", "cut1")
        kw = dict(
            top_k=int(req.get("top_k", 15)),
            top_p=float(req.get("top_p", 1.0)),
            temperature=float(req.get("temperature", 1.0)),
            repetition_penalty=float(req.get("repetition_penalty", 1.35)),
            noise_scale=float(req.get("noise_scale", 0.5)),
            speed=float(req.get("speed_factor", 1.0)),
        )

        if batch_infer:
            clips = await self.tts.infer_batched_async(
                spk_audio_paths=speaker_audio, prompt_audio_paths=ref_audio_path,
                prompt_audio_texts=prompt_text, texts=text_input,
                is_cut_text=cut_method not in {"", "cut0", "none"},
                cut_minlen=CUT_METHOD2MINLEN.get(cut_method, 10),
                cut_mute=float(req.get("fragment_interval", 0.3)), **kw)
            merged = np.concatenate([np.asarray(c.audio_data) for c in clips])
            return web.Response(body=pack_audio(merged, clips[0].samplerate, media_type),
                                content_type=f"audio/{media_type}")

        if stream_enabled:
            try:  # "true"/"True"/True all mean mode 1 (api_v2 GET strings)
                mode_value = int(streaming_mode)
            except (TypeError, ValueError):
                mode_value = 1
            return ("stream", speaker_audio, ref_audio_path, prompt_text,
                    text_input, media_type, mode_value, cut_method, kw,
                    float(req.get("fragment_interval", 0.3)),
                    int(req.get("min_chunk_length", 25)),
                    int(req.get("overlap_length", 5)))

        if self.batcher is not None:
            # coalesce with other in-window requests into one batched call
            clip = await self.batcher.infer(
                speaker_audio, ref_audio_path, prompt_text, text_input,
                is_cut_text=cut_method not in {"", "cut0", "none"},
                cut_minlen=CUT_METHOD2MINLEN.get(cut_method, 10),
                cut_mute=float(req.get("fragment_interval", 0.3)), **kw)
        else:
            clip = await self.tts.infer_async(
                spk_audio_path=speaker_audio, prompt_audio_path=ref_audio_path,
                prompt_audio_text=prompt_text, text=text_input, **kw)
        return web.Response(body=pack_audio(clip.audio_data, clip.samplerate, media_type),
                            content_type=f"audio/{media_type}")

    async def tts_v2(self, request: web.Request) -> web.StreamResponse:
        if request.method == "GET":
            req = dict(request.query)
            # repeated keys collapse in dict(); aux refs may legitimately
            # repeat (api_v2 multi-speaker fusion)
            aux_all = request.query.getall("aux_ref_audio_paths", [])
            if len(aux_all) > 1:
                req["aux_ref_audio_paths"] = list(aux_all)
        else:
            req = await parse_json(request)
        out = await self._handle_api_v2(req)
        if not isinstance(out, tuple):
            return out
        # streaming response path
        (_, speaker_audio, prompt_audio, prompt_text, text_input, media_type,
         mode_value, cut_method, kw, cut_mute, stream_chunk, overlap_len) = out
        resp = web.StreamResponse(headers={"Content-Type": f"audio/{media_type}"})
        await resp.prepare(request)
        first = True
        async for clip in self.tts.infer_stream_async(
                spk_audio_path=speaker_audio, prompt_audio_path=prompt_audio,
                prompt_audio_text=prompt_text, text=text_input,
                is_cut_text=cut_method not in {"", "cut0", "none"},
                cut_minlen=CUT_METHOD2MINLEN.get(cut_method, 10),
                cut_mute=cut_mute, stream_mode="token",
                stream_chunk=max(1, stream_chunk), overlap_len=max(1, overlap_len),
                boost_first_chunk=(mode_value == 1), debug=False, **kw):
            if first and media_type == "wav":
                await resp.write(wave_header_chunk(sample_rate=clip.samplerate))
                first = False
                await resp.write(pack_audio(clip.audio_data, clip.samplerate, "raw"))
            else:
                await resp.write(pack_audio(
                    clip.audio_data, clip.samplerate,
                    "raw" if media_type == "wav" else media_type))
        await resp.write_eof()
        return resp

    async def set_gpt_weights(self, request: web.Request) -> web.Response:
        path = request.query.get("weights_path")
        if not path:
            raise web.HTTPBadRequest(text="weights_path is required")

        def switch():
            # serialize against in-flight inference: a request that just
            # resolved the default model must not see it vanish mid-call.
            # (Active SHARED-wave streams on the old model are still
            # aborted by unload — an explicit weight switch supersedes
            # them.)  Load FIRST, unload only on success: unload-first
            # left the server model-less after a corrupt checkpoint, and
            # the router fans this out fleet-wide.
            with self.tts._infer_lock:
                old = [m for m in self.tts.get_gpt_list()
                       if str(m) != str(path)]
                self.tts.load_gpt_model(path)
                for model in old:
                    self.tts.unload_gpt_model(model)

        # checkpoint load + device upload takes seconds — NEVER on the
        # event loop (every SSE stream and /health would stall past the
        # router's probe timeout, fleet-wide since the switch is fanned out)
        try:
            await asyncio.get_running_loop().run_in_executor(None, switch)
        except Exception as exc:  # noqa: BLE001 — bad/corrupt/malicious
            # checkpoint: the old model is still loaded (load-first flow);
            # answer with a clean envelope, not an unhandled 500
            logging.warning("set_gpt_weights(%s) failed: %s", path, exc)
            return web.json_response(
                {"message": f"failed to load GPT weights: {exc}"}, status=400)
        return web.json_response({"message": "success"})

    async def set_sovits_weights(self, request: web.Request) -> web.Response:
        path = request.query.get("weights_path")
        if not path:
            raise web.HTTPBadRequest(text="weights_path is required")

        def switch():
            with self.tts._infer_lock:
                old = [m for m in self.tts.get_sovits_list()
                       if str(m) != str(path)]
                self.tts.load_sovits_model(path)
                for model in old:
                    self.tts.unload_sovits_model(model)

        try:
            await asyncio.get_running_loop().run_in_executor(None, switch)
        except Exception as exc:  # noqa: BLE001 — see set_gpt_weights
            logging.warning("set_sovits_weights(%s) failed: %s", path, exc)
            return web.json_response(
                {"message": f"failed to load SoVITS weights: {exc}"},
                status=400)
        return web.json_response({"message": "success"})


#: routes gated by graceful drain (POST /drain) and counted as in-flight
SYNTH_PATHS = ("/tts", "/tts/stream", "/tts/stream/batched", "/tts/batched",
               "/v1/audio/speech")


@web.middleware
async def _drain_middleware(request: web.Request, handler):
    server = request.app["server"]
    if request.path in SYNTH_PATHS:
        if server.draining:
            return web.json_response({"error": "server draining"},
                                     status=503,
                                     headers={"Retry-After": "5"})
        server._inflight += 1
        try:
            return await handler(request)
        finally:
            server._inflight -= 1
    return await handler(request)


def create_app(tts, asr_fn=None, batch_window_ms: float = 0.0,
               batch_max: int = 4, stream_share: bool = False,
               voices: Optional[Dict[str, dict]] = None) -> "web.Application":
    server = TTSServer(tts, asr_fn=asr_fn, batch_window_ms=batch_window_ms,
                       batch_max=batch_max, stream_share=stream_share)
    app = web.Application(middlewares=[_drain_middleware])
    app["server"] = server
    if server.batcher is not None:
        async def _close_batcher(app):
            await server.batcher.close()
        app.on_cleanup.append(_close_batcher)
    app.router.add_get("/", server.root)
    app.router.add_get("/health", server.health)
    app.router.add_get("/metrics", server.metrics)
    app.router.add_post("/drain", server.drain)
    app.router.add_post("/tts/stream", server.tts_stream)
    app.router.add_post("/tts/stream/batched", server.tts_stream_batched)
    app.router.add_post("/tts/batched", server.tts_batched)
    app.router.add_get("/audio/{filename}", server.get_audio)
    app.router.add_get("/tts", server.tts_v2)
    app.router.add_post("/tts", server.tts_v2)
    app.router.add_get("/set_gpt_weights", server.set_gpt_weights)
    app.router.add_get("/set_sovits_weights", server.set_sovits_weights)
    from .openai_compat import add_openai_routes

    add_openai_routes(app, server, voices)
    return app


def main():
    import argparse

    from ..tts import TTS

    ap = argparse.ArgumentParser(description="gsv-tts-lite-tpu HTTP server")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=9880)
    ap.add_argument("--models-dir", default=None)
    ap.add_argument("--gpt", default=None, help="GPT checkpoint path")
    ap.add_argument("--sovits", default=None, help="SoVITS checkpoint path")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--batch-window-ms", type=float, default=0.0,
                    help="coalesce concurrent non-streaming api_v2 requests "
                         "arriving within this window into one batched "
                         "synthesis call (0 = off; coalesced requests get "
                         "batch_infer=true semantics: text split + "
                         "fragment_interval pauses)")
    ap.add_argument("--batch-max", type=int, default=4,
                    help="max requests per coalesced batch (the fused "
                         "batched decode kernel peaks at 4 slots/wave)")
    ap.add_argument("--quant-t2s", nargs="?", const="int8", default=False,
                    choices=("int8", "int4"),
                    help="quantized weight-streaming GPT decode: bare flag "
                         "or 'int8' = fused_step_q8 (~+30-40%% B=1 decode "
                         "throughput on TPU), 'int4' = fused_step_q4 "
                         "(halves the weight stream again); sampled tokens "
                         "shift by the rounding error vs the bf16 default")
    ap.add_argument("--t2s-softmax", choices=("rows", "shared", "vec"),
                    default="rows",
                    help="batched decode kernel softmax bookkeeping: "
                         "\"shared\" uses one running max per head across "
                         "slots (with --quant-t2s it also gates B=7/8 "
                         "waves); tokens shift by f32 exp reordering vs "
                         "the per-row default")
    ap.add_argument("--quant-bert", action="store_true",
                    help="int8 dynamic-quantization BERT featurizer "
                         "(reference INT8-ONNX CPU backend counterpart): "
                         "~4x faster linear layers on AVX-512 CPU hosts, "
                         "4x smaller weights; features drift by the int8 "
                         "rounding")
    ap.add_argument("--featurizer-buckets", action="store_true",
                    help="shape-bucket the BERT/hubert featurizer programs "
                         "(token grid + 0.5 s audio buckets with masked "
                         "attention/stats): bounds XLA compiles when "
                         "serving arbitrary text lengths or user-uploaded "
                         "reference audio; features drift ~1 ulp vs the "
                         "exact-shape programs")
    ap.add_argument("--device", type=int, default=None,
                    help="pin this server's engine to jax.devices()[N] — "
                         "the single-host dp scale-out unit: one server "
                         "process per chip, fronted by serving.router or "
                         "serving.fleet (which spawns both)")
    ap.add_argument("--stream-share", action="store_true",
                    help="route /tts/stream through the shared wave "
                         "scheduler by default: N independent SSE clients "
                         "decode concurrently in one batched kernel wave "
                         "(per-request override via \"shared\": true/false; "
                         "shared streams use batched-mode sampling "
                         "semantics)")
    ap.add_argument("--voices", default=None,
                    help="JSON voice registry for the OpenAI-compatible "
                         "surface (POST /v1/audio/speech): maps voice "
                         "names to {speaker_audio, prompt_audio, "
                         "prompt_text} bundles")
    ap.add_argument("--warmup", action="store_true",
                    help="run one short synthesis (and one shared-wave "
                         "stream under --stream-share) BEFORE listening, "
                         "so the serving programs are compiled when the "
                         "first request lands — makes fleet rolling "
                         "restarts (POST /drain → restart) hitless; with "
                         "--voices the first registry voice's assets are "
                         "used, else synthetic references")
    ap.add_argument("--max-streams", type=int, default=None,
                    help="admission cap on concurrent shared streaming "
                         "clients: past it /tts/stream returns 503 + "
                         "Retry-After instead of queueing (set it at the "
                         "chip's saturation knee, bench.py --saturation; "
                         "default unbounded)")
    args = ap.parse_args()

    # Persistent XLA compile cache: a restarted server skips recompiling
    # every decode/prefill/vocoder program it has ever run (bench.py and
    # tpu_smoke.py already do this; cold flagship start drops minutes).
    from ..utils.timing import enable_compilation_cache

    enable_compilation_cache()

    if args.device is not None:
        # dp scale-out unit: every array this process creates lands on one
        # chip, so N pinned server processes share an N-chip host without
        # contending (the reference has no multi-GPU serving story at all)
        import jax

        jax.config.update("jax_default_device", jax.devices()[args.device])

    tts = TTS(models_dir=args.models_dir, dtype=args.dtype,
              quant_t2s=args.quant_t2s, t2s_softmax=args.t2s_softmax,
              quant_bert=args.quant_bert, wave_max_clients=args.max_streams,
              featurizer_buckets=args.featurizer_buckets)
    if args.gpt:
        tts.load_gpt_model(args.gpt)
    if args.sovits:
        tts.load_sovits_model(args.sovits)
    from .asr import make_asr_fn

    voices = None
    if args.voices:
        from .openai_compat import load_voices

        voices = load_voices(args.voices)
    if args.warmup:
        # compile the serving programs before the socket opens: /health
        # stays unreachable (= unhealthy to the router / fleet
        # wait_healthy) until the first request can be served compile-free
        voice = next(iter(voices.values())) if voices else None
        tts.warmup(voice=voice, stream=args.stream_share)
    web.run_app(create_app(tts, asr_fn=make_asr_fn(),
                           batch_window_ms=args.batch_window_ms,
                           batch_max=args.batch_max,
                           stream_share=args.stream_share,
                           voices=voices),
                host=args.host, port=args.port)


if __name__ == "__main__":
    main()
