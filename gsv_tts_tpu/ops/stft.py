"""Spectral ops: linear spectrogram, mel filterbanks, polyphase resampling.

Torch-compatible re-implementations of the DSP the reference gets from
torchaudio (``TTS.py:1572-1610``): ``Spectrogram(n_fft, win, hop,
center=True, pad_mode='reflect', power=1)`` feeding ``get_ge``/``ref_enc``,
and ``Resample`` (windowed-sinc polyphase, ``lowpass_filter_width=6``,
``rolloff=0.99``, hann) for 16 kHz HuBERT input.

The spectrogram is pure jnp (runs on TPU as part of the conditioning path);
resampling and file decoding are host-side numpy.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32


@lru_cache(maxsize=16)
def _hann_window_padded(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann window, centre-padded to n_fft (torch.stft semantics)."""
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win_length) / win_length)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = np.pad(w, (left, n_fft - win_length - left))
    return w.astype(np.float32)


def spectrogram(audio: jnp.ndarray, n_fft: int, hop_length: int,
                win_length: int, power: float = 1.0) -> jnp.ndarray:
    """Magnitude STFT matching ``torchaudio.transforms.Spectrogram`` with
    ``center=True, pad_mode='reflect'``.  audio [..., T] → [..., n_fft//2+1, F].
    """
    window = jnp.asarray(_hann_window_padded(win_length, n_fft))
    pad = n_fft // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    T = x.shape[-1]
    n_frames = 1 + (T - n_fft) // hop_length
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    frames = x[..., idx] * window  # [..., F, n_fft]
    spec = jnp.fft.rfft(frames.astype(F32), axis=-1)
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag ** power
    return jnp.swapaxes(mag, -1, -2)  # [..., bins, frames]


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-style mel filterbank (librosa default, area-normalized)."""
    fmax = fmax or sr / 2

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(log_region,
                       15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
                       mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, cen, hi = freqs[i], freqs[i + 1], freqs[i + 2]
        up = (fft_freqs - lo) / max(cen - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - cen, 1e-10)
        fb[i] = np.maximum(0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)  # slaney area normalization
    return fb.astype(np.float32)


def mel_spectrogram(audio: np.ndarray, sr: int = 32000, n_fft: int = 2048,
                    hop_length: int = 640, win_length: int = 2048,
                    n_mels: int = 128, fmin: float = 0.0,
                    fmax: Optional[float] = None) -> np.ndarray:
    """Log-mel used for the mel-parity metric (host-side numpy)."""
    spec = np.asarray(spectrogram(jnp.asarray(audio[None], F32), n_fft,
                                  hop_length, win_length))[0]
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    mel = fb @ spec
    return np.log(np.clip(mel, 1e-5, None))


def mel_distance(a: np.ndarray, b: np.ndarray, sr: int = 32000) -> float:
    """Mean absolute log-mel distance between two waveforms (truncated to the
    shorter length) — the BASELINE.json "mel parity" check."""
    n = min(len(a), len(b))
    ma = mel_spectrogram(np.asarray(a[:n], np.float32), sr)
    mb = mel_spectrogram(np.asarray(b[:n], np.float32), sr)
    return float(np.mean(np.abs(ma - mb)))


# ---------------------------------------------------------------------------
# Polyphase windowed-sinc resampling (torchaudio-compatible)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=32)
def _sinc_resample_kernel(orig_freq: int, new_freq: int,
                          lowpass_filter_width: int = 6,
                          rolloff: float = 0.99):
    gcd = math.gcd(orig_freq, new_freq)
    orig = orig_freq // gcd
    new = new_freq // gcd
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)

    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    scale = base_freq / orig
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * scale
    return kernel.astype(np.float32), width, orig, new


def resample(audio: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """torchaudio.transforms.Resample equivalent.  audio [..., T] numpy."""
    if orig_freq == new_freq:
        return audio
    kernel, width, orig, new = _sinc_resample_kernel(orig_freq, new_freq)
    shape = audio.shape
    x = np.asarray(audio, np.float32).reshape(-1, shape[-1])
    length = shape[-1]
    target_len = int(math.ceil(new * length / orig))
    x = np.pad(x, [(0, 0), (width, width + orig)])
    # frame into polyphase windows: out[p, f] = sum_k x[f*orig + k] * kernel[p, k]
    n_frames = (x.shape[-1] - kernel.shape[-1]) // orig + 1
    strides = (x.strides[0], orig * x.strides[-1], x.strides[-1])
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(x.shape[0], n_frames, kernel.shape[-1]), strides=strides)
    out = np.einsum("bfk,pk->bpf", frames, kernel)  # [B, new, frames]
    out = out.transpose(0, 2, 1).reshape(x.shape[0], -1)[:, :target_len]
    return out.reshape(*shape[:-1], target_len)
