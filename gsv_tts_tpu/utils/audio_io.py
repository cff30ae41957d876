"""Audio file I/O (host-side).

WAV is handled natively (stdlib ``wave`` + numpy); other containers fall back
to optional decoders (``soundfile``, then PyAV like the reference
``TTS.py:1811-1823``) with a clear error when neither is installed.
"""
from __future__ import annotations

import os
import wave
from typing import Tuple

import numpy as np


def load_audio(path: str) -> Tuple[np.ndarray, int]:
    """Returns (audio [channels, T] float32 in [-1, 1], sample_rate)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        try:
            return _load_wav(path)
        except Exception:
            pass  # fall through to optional decoders (e.g. float wav)
    try:
        import soundfile as sf

        data, sr = sf.read(path, dtype="float32", always_2d=True)
        return data.T.copy(), int(sr)
    except ImportError:
        pass
    try:
        import av

        with av.open(path) as container:
            stream = container.streams.audio[0]
            resampler = av.AudioResampler(format="flt", layout="mono", rate=stream.rate)
            frames = []
            for frame in container.decode(stream):
                for rf in resampler.resample(frame):
                    frames.append(rf.to_ndarray())
            return np.concatenate(frames, axis=1), int(stream.rate)
    except ImportError:
        pass
    raise RuntimeError(
        f"Cannot decode {path!r}: non-WAV audio needs `soundfile` or `av` installed")


def _load_wav(path: str) -> Tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return data.reshape(-1, ch).T.copy(), sr


def save_wav(path: str, audio: np.ndarray, sr: int):
    """audio [T] or [C, T] float in [-1, 1] → 16-bit PCM WAV."""
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[None]
    pcm = np.clip(audio.T, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(audio.shape[0])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
