"""CNHubert SSL featurizer in JAX.

Replaces the reference's ``transformers.HubertModel`` usage
(``GPT_SoVITS/Featurizer/cnhubert.py``): 16 kHz waveform → 768-d 50 Hz SSL
features feeding RVQ prompt extraction (``TTS.py:1556-1570``) and voice
conversion.  Implements the standard HuBERT-base topology (conv feature
extractor with group-norm first layer, feature projection, convolutional
positional embedding, post-LN transformer encoder) config-driven from the HF
``config.json``; weights load from the HF checkpoint into a flat dict keyed
by the HF parameter names (weight-norm of the positional conv folded).
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.convs import conv1d, linear, fold_weight_norm

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    feat_extract_norm: str = "group"
    conv_bias: bool = False
    layer_norm_eps: float = 1e-5
    do_stable_layer_norm: bool = False
    feat_proj_layer_norm: bool = True

    @classmethod
    def from_json(cls, path: str) -> "HubertConfig":
        with open(path) as f:
            c = json.load(f)
        return cls(
            hidden_size=c["hidden_size"],
            num_hidden_layers=c["num_hidden_layers"],
            num_attention_heads=c["num_attention_heads"],
            intermediate_size=c["intermediate_size"],
            conv_dim=tuple(c["conv_dim"]),
            conv_kernel=tuple(c["conv_kernel"]),
            conv_stride=tuple(c["conv_stride"]),
            num_conv_pos_embeddings=c["num_conv_pos_embeddings"],
            num_conv_pos_embedding_groups=c["num_conv_pos_embedding_groups"],
            feat_extract_norm=c.get("feat_extract_norm", "group"),
            conv_bias=c.get("conv_bias", False),
            layer_norm_eps=c.get("layer_norm_eps", 1e-5),
            do_stable_layer_norm=c.get("do_stable_layer_norm", False),
            feat_proj_layer_norm=c.get("feat_proj_layer_norm", True),
        )


from ..ops.norms import layer_norm as _layer_norm  # noqa: E402


def _group_norm(x, g, b, num_groups, eps=1e-5, valid=None):
    """torch GroupNorm on [B, C, T] with groups == C (per-channel).

    ``valid`` ([B] int32, optional) restricts the statistics to the first
    ``valid[b]`` timesteps — the bucketed featurizer path pads T with
    frames that must not shift the per-channel mean/var (GroupNorm is the
    one cross-frame op in the conv extractor)."""
    dtype = x.dtype
    B, C, T = x.shape
    x32 = x.astype(F32).reshape(B, num_groups, C // num_groups, T)
    if valid is None:
        mean = jnp.mean(x32, axis=(2, 3), keepdims=True)
        var = jnp.var(x32, axis=(2, 3), keepdims=True)
    else:
        m = (jnp.arange(T)[None, :] < valid[:, None]).astype(F32)[:, None, None, :]
        cnt = (valid.astype(F32) * (C // num_groups))[:, None, None, None]
        mean = jnp.sum(x32 * m, axis=(2, 3), keepdims=True) / cnt
        d = (x32 - mean) * m
        var = jnp.sum(d * d, axis=(2, 3), keepdims=True) / cnt
    x32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    x32 = x32.reshape(B, C, T)
    return (x32 * g.astype(F32)[None, :, None] + b.astype(F32)[None, :, None]).astype(dtype)


def conv_out_length(length: int, cfg: HubertConfig, n_layers: Optional[int] = None) -> int:
    """Frames produced from ``length`` samples after the first ``n_layers``
    conv-extractor layers (all of them by default) — torch's floor rule."""
    ks = cfg.conv_kernel if n_layers is None else cfg.conv_kernel[:n_layers]
    ss = cfg.conv_stride if n_layers is None else cfg.conv_stride[:n_layers]
    for k, s in zip(ks, ss):
        length = (length - k) // s + 1
    return int(length)


def feature_extractor(p: Dict[str, jnp.ndarray], cfg: HubertConfig, x: jnp.ndarray,
                      valid_l0: Optional[jnp.ndarray] = None):
    """waveform [B, T] → [B, C, frames].

    ``valid_l0`` ([B] int32, optional): number of layer-0 output frames whose
    conv windows lie entirely inside the un-padded waveform — group-norm
    statistics are restricted to them on the bucketed path (frames strictly
    below that bound see identical samples as the exact-shape run, so their
    values match up to XLA reduction tiling)."""
    h = x[:, None, :]
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        w = p[f"feature_extractor.conv_layers.{i}.conv.weight"]
        b = p.get(f"feature_extractor.conv_layers.{i}.conv.bias")
        h = conv1d(h, w, b, stride=s)
        if i == 0 and cfg.feat_extract_norm == "group":
            h = _group_norm(h, p["feature_extractor.conv_layers.0.layer_norm.weight"],
                            p["feature_extractor.conv_layers.0.layer_norm.bias"],
                            num_groups=cfg.conv_dim[0], valid=valid_l0)
        elif cfg.feat_extract_norm == "layer":
            h = h.transpose(0, 2, 1)
            h = _layer_norm(h, p[f"feature_extractor.conv_layers.{i}.layer_norm.weight"],
                            p[f"feature_extractor.conv_layers.{i}.layer_norm.bias"])
            h = h.transpose(0, 2, 1)
        h = jax.nn.gelu(h.astype(F32), approximate=False).astype(h.dtype)
    return h


def encoder_layer(p, pfx, x, n_heads, eps, mask_bias=None):
    B, T, D = x.shape
    Dh = D // n_heads
    res = x
    q = linear(x, p[pfx + "attention.q_proj.weight"], p[pfx + "attention.q_proj.bias"])
    k = linear(x, p[pfx + "attention.k_proj.weight"], p[pfx + "attention.k_proj.bias"])
    v = linear(x, p[pfx + "attention.v_proj.weight"], p[pfx + "attention.v_proj.bias"])
    q = q.reshape(B, T, n_heads, Dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, n_heads, Dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, n_heads, Dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=F32) / math.sqrt(Dh)
    if mask_bias is not None:
        # pad keys get -1e9: exp underflows to exact 0 in the f32 softmax,
        # so valid-frame rows match the unpadded program
        scores = scores + mask_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(B, T, D)
    attn = linear(attn, p[pfx + "attention.out_proj.weight"], p[pfx + "attention.out_proj.bias"])
    x = _layer_norm(res + attn, p[pfx + "layer_norm.weight"], p[pfx + "layer_norm.bias"], eps)
    res = x
    h = linear(x, p[pfx + "feed_forward.intermediate_dense.weight"],
               p[pfx + "feed_forward.intermediate_dense.bias"])
    h = jax.nn.gelu(h.astype(F32), approximate=False).astype(h.dtype)
    h = linear(h, p[pfx + "feed_forward.output_dense.weight"],
               p[pfx + "feed_forward.output_dense.bias"])
    x = _layer_norm(res + h, p[pfx + "final_layer_norm.weight"],
                    p[pfx + "final_layer_norm.bias"], eps)
    return x


def hubert_forward(p: Dict[str, jnp.ndarray], cfg: HubertConfig, wav: jnp.ndarray,
                   n_frames: Optional[jnp.ndarray] = None,
                   valid_l0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """wav [B, T] (16 kHz, zero-mean-unit-var normalized upstream) →
    last_hidden_state [B, frames, hidden].

    Bucketed path (``n_frames``/``valid_l0`` [B] int32 set): ``wav`` is
    zero-padded to a shape bucket; group-norm stats are masked, projected
    features are zeroed at pad frames (so the positional conv sees the same
    zero padding the exact-shape run sees at its boundary), and attention
    masks pad keys.  Rows ``< n_frames[b]`` then match the exact-shape
    program up to XLA reduction tiling; the caller trims the tail."""
    h = feature_extractor(p, cfg, wav, valid_l0=valid_l0)  # [B, C, F]
    h = h.transpose(0, 2, 1)
    if cfg.feat_proj_layer_norm:
        h = _layer_norm(h, p["feature_projection.layer_norm.weight"],
                        p["feature_projection.layer_norm.bias"], cfg.layer_norm_eps)
    h = linear(h, p["feature_projection.projection.weight"],
               p["feature_projection.projection.bias"])
    mask_bias = None
    if n_frames is not None:
        fmask = jnp.arange(h.shape[1])[None, :] < n_frames[:, None]  # [B, F]
        h = h * fmask[:, :, None].astype(h.dtype)
        mask_bias = jnp.where(fmask, 0.0, -1e9).astype(F32)[:, None, None, :]

    # convolutional positional embedding (kernel 128, groups 16, weight-norm
    # folded at load); even kernel → trim the last output element
    k = cfg.num_conv_pos_embeddings
    pos = conv1d(h.transpose(0, 2, 1), p["encoder.pos_conv_embed.conv.weight"],
                 p["encoder.pos_conv_embed.conv.bias"], padding=k // 2,
                 groups=cfg.num_conv_pos_embedding_groups)
    if k % 2 == 0:
        pos = pos[:, :, :-1]
    pos = jax.nn.gelu(pos.astype(F32), approximate=False).astype(pos.dtype)
    h = h + pos.transpose(0, 2, 1)
    h = _layer_norm(h, p["encoder.layer_norm.weight"], p["encoder.layer_norm.bias"],
                    cfg.layer_norm_eps)
    for i in range(cfg.num_hidden_layers):
        h = encoder_layer(p, f"encoder.layers.{i}.", h, cfg.num_attention_heads,
                          cfg.layer_norm_eps, mask_bias=mask_bias)
    return h


def params_from_torch_state_dict(state_dict: Dict[str, Any], dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    out: Dict[str, jnp.ndarray] = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    consumed = set()
    # fold pos-conv weight norm (parametrizations or weight_g/v naming)
    for gk, vk in (("encoder.pos_conv_embed.conv.weight_g",
                    "encoder.pos_conv_embed.conv.weight_v"),
                   ("encoder.pos_conv_embed.conv.parametrizations.weight.original0",
                    "encoder.pos_conv_embed.conv.parametrizations.weight.original1")):
        if gk in sd:
            g, v = sd[gk], sd[vk]
            # torch weight_norm(dim=2) for pos conv: norm over dims (0, 1)
            norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
            out["encoder.pos_conv_embed.conv.weight"] = jnp.asarray(g * v / norm, dtype)
            consumed.update({gk, vk})
    for k, v in sd.items():
        if k in consumed or k.startswith("masked_spec_embed"):
            continue
        out[k] = jnp.asarray(v, dtype)
    return out


class CNHubert:
    """Facade mirroring the reference ``CNHubert`` (wav → SSL features)."""

    def __init__(self, base_path: str, tts_config):
        self.cfg = HubertConfig.from_json(os.path.join(base_path, "config.json"))
        self.dtype = tts_config.dtype
        st_path = os.path.join(base_path, "model.safetensors")
        if os.path.exists(st_path):
            from safetensors.numpy import load_file

            sd = load_file(st_path)
        else:
            import torch

            bin_path = os.path.join(base_path, "pytorch_model.bin")
            sd = {k: v.numpy() for k, v in torch.load(bin_path, map_location="cpu",
                                                      weights_only=True).items()}
        sd = {k.removeprefix("hubert."): v for k, v in sd.items()}
        self.params = params_from_torch_state_dict(sd, dtype=self.dtype)
        self._fwd = jax.jit(lambda p, w: hubert_forward(p, self.cfg, w))
        # bucketed variant: pad the waveform to BUCKET_SAMPLES multiples so
        # arbitrary reference-audio lengths reuse a bounded set of compiled
        # programs (every novel length otherwise pays a full XLA compile)
        self.buckets = bool(getattr(tts_config, "featurizer_buckets", False))
        self._fwd_masked = jax.jit(
            lambda p, w, nf, v0: hubert_forward(p, self.cfg, w, n_frames=nf,
                                                valid_l0=v0))

    BUCKET_SAMPLES = 8000  # 0.5 s at 16 kHz

    def __call__(self, wav16k: np.ndarray, normalize: bool = False) -> jnp.ndarray:
        """wav [B, T] → [B, frames, 768].

        ``normalize=False`` matches the reference's prompt-extraction path,
        which feeds the raw waveform straight into ``HubertModel``
        (``TTS.py:1566``); ``normalize=True`` applies the Wav2Vec2 feature
        extractor's zero-mean/unit-var normalization (``cnhubert.py:28-31``).

        With ``Config.featurizer_buckets`` the waveform is zero-padded to
        the next 0.5 s bucket and run through the masked program; the
        output is trimmed back to the exact frame count (single-row calls
        — the engine's prompt/VC path — are unaffected by the row policy).
        """
        wav = np.asarray(wav16k, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        if normalize:
            mean = wav.mean(axis=-1, keepdims=True)
            std = wav.std(axis=-1, keepdims=True)
            wav = (wav - mean) / np.sqrt(std ** 2 + 1e-7)
        T = wav.shape[1]
        if not self.buckets:
            return self._fwd(self.params, jnp.asarray(wav, self.dtype))
        pad_T = max(self.BUCKET_SAMPLES,
                    -(-T // self.BUCKET_SAMPLES) * self.BUCKET_SAMPLES)
        if pad_T != T:
            wav = np.pad(wav, ((0, 0), (0, pad_T - T)))
        n_frames = conv_out_length(T, self.cfg)
        valid_l0 = conv_out_length(T, self.cfg, n_layers=1)
        B = wav.shape[0]
        out = self._fwd_masked(
            self.params, jnp.asarray(wav, self.dtype),
            jnp.full((B,), n_frames, jnp.int32),
            jnp.full((B,), valid_l0, jnp.int32))
        return out[:, :n_frames]
