"""Speaker-verification embedder: ERes2NetV2 + Kaldi fbank, in JAX.

Replaces the reference ``GPT_SoVITS/SV`` stack (``sv.py``, ``ERes2NetV2.py``,
``fusion.py``): 80-bin Kaldi fbank (povey window, dither=0) → ERes2NetV2
(baseWidth=24, scale=4, expansion=4) → ``forward3`` pre-pooling fused feature
mean (20480-d), consumed by the v2Pro ``sv_emb`` linear and by
``verify_speaker`` cosine similarity.

Parameters are a flat dict keyed by the torch checkpoint names.
"""
from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.convs import conv2d, batch_norm, linear

F32 = jnp.float32


# ---------------------------------------------------------------------------
# Kaldi-compatible fbank (torchaudio.compliance.kaldi.fbank defaults with
# num_mel_bins=80, sample_frequency=16000, dither=0 — reference ``sv.py:19``)
# ---------------------------------------------------------------------------

def _povey_window(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))) ** 0.85


def _kaldi_mel_banks(num_bins: int, window_size: int, sr: float,
                     low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    if high_freq <= 0:
        high_freq = sr / 2 + high_freq
    num_fft_bins = window_size // 2

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    mel_low = mel(low_freq)
    mel_high = mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    fft_bin_width = sr / window_size
    bins = np.zeros((num_bins, num_fft_bins))
    for b in range(num_bins):
        left, center, right = (mel_low + b * mel_delta,
                               mel_low + (b + 1) * mel_delta,
                               mel_low + (b + 2) * mel_delta)
        freqs = mel(fft_bin_width * np.arange(num_fft_bins))
        up = (freqs - left) / (center - left)
        down = (right - freqs) / (right - center)
        bins[b] = np.clip(np.minimum(up, down), 0, None)
    return bins.astype(np.float32)


def kaldi_fbank(wav: np.ndarray, num_mel_bins: int = 80, sr: int = 16000,
                frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0,
                preemph: float = 0.97, remove_dc: bool = True) -> np.ndarray:
    """wav [T] float → [frames, num_mel_bins] log-mel (snip_edges=True)."""
    wav = np.asarray(wav, np.float32)
    win = int(sr * frame_length_ms / 1000)
    shift = int(sr * frame_shift_ms / 1000)
    padded = 1 << (win - 1).bit_length()  # round_to_power_of_two
    if len(wav) < win:
        return np.zeros((0, num_mel_bins), np.float32)
    n_frames = 1 + (len(wav) - win) // shift
    idx = np.arange(n_frames)[:, None] * shift + np.arange(win)[None, :]
    frames = wav[idx]
    if remove_dc:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemph:
        first = frames[:, :1]
        frames = np.concatenate([first - preemph * first,
                                 frames[:, 1:] - preemph * frames[:, :-1]], axis=1)
    frames = frames * _povey_window(win)[None, :]
    frames = np.pad(frames, [(0, 0), (0, padded - win)])
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # power
    banks = _kaldi_mel_banks(num_mel_bins, padded, sr)
    banks = np.pad(banks, [(0, 0), (0, 1)])  # nyquist column is zero
    mel = spec @ banks.T
    return np.log(np.maximum(mel, np.finfo(np.float32).eps)).astype(np.float32)


# ---------------------------------------------------------------------------
# ERes2NetV2
# ---------------------------------------------------------------------------

def _relu20(x):
    # reference ReLU = Hardtanh(0, 20) (``ERes2NetV2.py:9-15``)
    return jnp.clip(x, 0.0, 20.0)


def _bn(p, pfx, x):
    return batch_norm(x, p[pfx + "running_mean"], p[pfx + "running_var"],
                      p.get(pfx + "weight"), p.get(pfx + "bias"))


def _aff(p, pfx, x, ds_y):
    """Attentional feature fusion (``fusion.py:5-24``)."""
    xa = jnp.concatenate([x, ds_y], axis=1)
    h = conv2d(xa, p[pfx + "local_att.0.weight"], p[pfx + "local_att.0.bias"])
    h = _bn(p, pfx + "local_att.1.", h)
    h = jax.nn.silu(h.astype(F32)).astype(h.dtype)
    h = conv2d(h, p[pfx + "local_att.3.weight"], p[pfx + "local_att.3.bias"])
    h = _bn(p, pfx + "local_att.4.", h)
    att = 1.0 + jnp.tanh(h)
    return x * att + ds_y * (2.0 - att)


def _basic_block(p, pfx, x, width: int, scale: int, stride: int, use_aff: bool,
                 has_shortcut: bool):
    out = conv2d(x, p[pfx + "conv1.weight"], stride=stride)
    out = _relu20(_bn(p, pfx + "bn1.", out))
    spx = [out[:, i * width:(i + 1) * width] for i in range(scale)]
    pieces = []
    sp = None
    for i in range(scale):
        if i == 0:
            sp = spx[0]
        elif use_aff:
            sp = _aff(p, f"{pfx}fuse_models.{i - 1}.", sp, spx[i])
        else:
            sp = sp + spx[i]
        sp = conv2d(sp, p[f"{pfx}convs.{i}.weight"], padding=1)
        sp = _relu20(_bn(p, f"{pfx}bns.{i}.", sp))
        pieces.append(sp)
    out = jnp.concatenate(pieces, axis=1)
    out = _bn(p, pfx + "bn3.", conv2d(out, p[pfx + "conv3.weight"]))
    if has_shortcut:
        residual = _bn(p, pfx + "shortcut.1.",
                       conv2d(x, p[pfx + "shortcut.0.weight"], stride=stride))
    else:
        residual = x
    return _relu20(out + residual)


class SVConfig:
    num_blocks = (3, 4, 6, 3)
    m_channels = 64
    base_width = 24
    scale = 4
    expansion = 4


def eres2netv2_features(p: Dict[str, jnp.ndarray], feat: jnp.ndarray,
                        cfg: SVConfig = SVConfig) -> jnp.ndarray:
    """feat [B, T, 80] → fused pre-pooling feature map [B, C, F, T']
    (``ERes2NetV2.py:230-240`` before the temporal mean)."""
    x = feat.transpose(0, 2, 1)[:, None]  # [B, 1, F, T]
    # the STEM uses plain (unbounded) relu — only in-block activations use
    # the Hardtanh(0, 20) ReLU (``ERes2NetV2.py:233`` is F.relu, :9-11)
    out = jnp.maximum(_bn(p, "bn1.", conv2d(x, p["conv1.weight"], padding=1)), 0.0)

    in_planes = cfg.m_channels
    for li, (planes_mult, n_blocks, use_aff) in enumerate(
            [(1, cfg.num_blocks[0], False), (2, cfg.num_blocks[1], False),
             (4, cfg.num_blocks[2], True), (8, cfg.num_blocks[3], True)]):
        planes = cfg.m_channels * planes_mult
        width = int(math.floor(planes * (cfg.base_width / 64.0)))
        strides = [1 if li == 0 else 2] + [1] * (n_blocks - 1)
        for bi, stride in enumerate(strides):
            pfx = f"layer{li + 1}.{bi}."
            has_shortcut = (stride != 1 or in_planes != cfg.expansion * planes)
            if li >= 2:
                out = _basic_block(p, pfx, out, width, cfg.scale, stride, True,
                                   has_shortcut)
            else:
                out = _basic_block(p, pfx, out, width, cfg.scale, stride, False,
                                   has_shortcut)
            if li == 2 and bi == len(strides) - 1:
                out3 = out
            in_planes = planes * cfg.expansion
    out4 = out
    out3_ds = conv2d(out3, p["layer3_ds.weight"], stride=2, padding=1)
    return _aff(p, "fuse34.", out4, out3_ds)


def eres2netv2_forward3(p: Dict[str, jnp.ndarray], feat: jnp.ndarray,
                        cfg: SVConfig = SVConfig) -> jnp.ndarray:
    """feat [B, T, 80] → fused pre-pooling feature mean [B, 20480]
    (``ERes2NetV2.py:230-241``).

    NOTE: the temporal mean lives OUTSIDE the jitted feature extractor in
    ``ERes2Net.compute_embedding3`` — the [B,2048,10,T]→[B,2048,10] reduce
    (in any formulation: reshape+reduce, reduce+reshape, or dot_general)
    trips an XLA:TPU post-optimization layout assert on the current
    toolchain, so the tiny mean runs on the host instead."""
    fused = eres2netv2_features(p, feat, cfg)
    B = fused.shape[0]
    return jnp.mean(fused.astype(F32), axis=-1).reshape(B, -1)


class ERes2Net:
    """Facade mirroring the reference ``ERes2Net`` (``SV/sv.py``)."""

    def __init__(self, sv_path: str, tts_config):
        import torch

        sd = torch.load(str(sv_path), map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        self.dtype = tts_config.dtype
        self.params = {k: jnp.asarray(v.numpy() if hasattr(v, "numpy") else v, self.dtype)
                       for k, v in sd.items() if "num_batches_tracked" not in k}
        self._fwd = jax.jit(lambda p, f: eres2netv2_features(p, f))

    def compute_embedding3(self, wav: np.ndarray) -> np.ndarray:
        """wav [B, T] 16 kHz → [B, 20480]."""
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        feats = np.stack([kaldi_fbank(w) for w in wav])
        fused = np.asarray(self._fwd(self.params, jnp.asarray(feats, self.dtype)),
                           np.float32)
        # host-side temporal mean (see eres2netv2_forward3 note)
        return fused.mean(axis=-1).reshape(fused.shape[0], -1)
