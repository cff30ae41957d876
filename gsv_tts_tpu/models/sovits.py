"""Stage-2 SoVITS (semantic tokens → waveform), TPU-native.

Functional JAX re-implementation of the reference ``SynthesizerTrn``
(``gsv_tts/GPT_SoVITS/SoVITS/models.py:235-434``) and its modules
(``module/modules.py``, ``module/attentions.py``, ``module/mrte_model.py``,
``module/quantize.py``): RVQ codebook decode, the VITS relative-position
encoder stack, MRTE cross-attention (returning the attention matrix for
subtitle timestamping), the reversed residual-coupling flow, and the HiFi-GAN
generator.

Parameters live in a *flat dict keyed by the reference state-dict names*
(weight-norm folded at load, see ``ops/convs.fold_weight_norm``), so
checkpoint loading is a dtype cast and audits against the reference are
1:1.  All functions are pure and jit-friendly; streaming state
(``y_overlap``, reference ``models.py:209-215``) is carried explicitly.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.convs import (conv1d, conv1d_mm, conv_transpose1d,
                         conv_transpose1d_mm, linear, leaky_relu, mish,
                         prelu, interpolate_nearest_2x, interpolate_nearest,
                         interpolate_linear)

F32 = jnp.float32
LRELU_SLOPE = 0.1

#: codes/text shape-bucket granularity for the padded streaming vocoder
#: paths (``decode_core_stream_padded(_batch)``) — shared by the solo jit
#: in ``tts.py`` and the cross-stream batcher so both produce the same
#: (codes, text) bucket keys
STREAM_PAD_MULTIPLE = 32
V2PRO_SET = ("v2Pro", "v2ProPlus")


@dataclasses.dataclass(frozen=True)
class SovitsConfig:
    """From the checkpoint's ``hps`` (reference ``models.py:237-282``)."""

    spec_channels: int = 1025
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Tuple[int, ...] = (10, 8, 2, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 8, 2, 2)
    gin_channels: int = 512
    ssl_dim: int = 768
    n_symbols: int = 732
    quantizer_bins: int = 1024
    quantizer_n_q: int = 1
    version: str = "v2"
    window_size: int = 4  # relative-attention window (``attentions.py:43``)
    flow_n_flows: int = 4
    flow_kernel_size: int = 5
    flow_n_layers: int = 4
    ref_enc_in: int = 704
    ref_enc_hidden: int = 128
    ref_enc_heads: int = 2
    ref_enc_kernel: int = 5

    @property
    def is_v2pro(self) -> bool:
        return self.version in V2PRO_SET

    @property
    def samples_per_frame(self) -> int:
        return int(np.prod(self.upsample_rates))

    @classmethod
    def from_hps(cls, hps_model: Dict[str, Any], spec_channels: int, n_symbols: int = 732) -> "SovitsConfig":
        m = dict(hps_model)
        def tt(x):
            return tuple(tuple(v) if isinstance(v, (list, tuple)) else v for v in x)
        return cls(
            spec_channels=spec_channels,
            inter_channels=m["inter_channels"],
            hidden_channels=m["hidden_channels"],
            filter_channels=m["filter_channels"],
            n_heads=m["n_heads"],
            n_layers=m["n_layers"],
            kernel_size=m["kernel_size"],
            p_dropout=m["p_dropout"],
            resblock_kernel_sizes=tuple(m["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tt(m["resblock_dilation_sizes"]),
            upsample_rates=tuple(m["upsample_rates"]),
            upsample_initial_channel=m["upsample_initial_channel"],
            upsample_kernel_sizes=tuple(m["upsample_kernel_sizes"]),
            gin_channels=m["gin_channels"],
            n_symbols=n_symbols,
            version=m.get("version", "v2"),
        )


# ---------------------------------------------------------------------------
# Basic blocks
# ---------------------------------------------------------------------------

def channel_layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                       eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the channel dim of [B, C, T] (``modules.py:15-27``)."""
    dtype = x.dtype
    x32 = x.astype(F32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.var(x32, axis=1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = out * gamma.astype(F32)[None, :, None] + beta.astype(F32)[None, :, None]
    return out.astype(dtype)


# -- VITS relative-position attention (``attentions.py:81-221``) ------------

def _get_relative_embeddings(rel_emb: jnp.ndarray, length: int, window_size: int) -> jnp.ndarray:
    pad_length = max(length - (window_size + 1), 0)
    slice_start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        rel_emb = jnp.pad(rel_emb, [(0, 0), (pad_length, pad_length), (0, 0)])
    return rel_emb[:, slice_start: slice_start + 2 * length - 1]


def _relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
    """[b, h, l, 2l-1] → [b, h, l, l] (``attentions.py:191-206``)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, 1)])
    x_flat = x.reshape(b, h, l * 2 * l)
    x_flat = jnp.pad(x_flat, [(0, 0), (0, 0), (0, l - 1)])
    return x_flat.reshape(b, h, l + 1, 2 * l - 1)[:, :, :l, l - 1:]


def _absolute_to_relative(x: jnp.ndarray) -> jnp.ndarray:
    """[b, h, l, l] → [b, h, l, 2l-1] (``attentions.py:208-220``)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, l - 1)])
    x_flat = x.reshape(b, h, l * l + l * (l - 1))
    x_flat = jnp.pad(x_flat, [(0, 0), (0, 0), (l, 0)])
    return x_flat.reshape(b, h, l, 2 * l)[:, :, :, 1:]


def vits_attention(p: Dict[str, jnp.ndarray], pfx: str, x: jnp.ndarray,
                   c: jnp.ndarray, n_heads: int,
                   attn_mask: Optional[jnp.ndarray] = None,
                   window_size: Optional[int] = None):
    """``attentions.MultiHeadAttention`` forward.  x, c are [B, C, T].
    Returns (out [B, C, T], attn probs [B, H, T_q, T_k])."""
    q = conv1d(x, p[pfx + "conv_q.weight"], p[pfx + "conv_q.bias"])
    k = conv1d(c, p[pfx + "conv_k.weight"], p[pfx + "conv_k.bias"])
    v = conv1d(c, p[pfx + "conv_v.weight"], p[pfx + "conv_v.bias"])

    b, d, t_s = k.shape
    t_t = q.shape[2]
    k_ch = d // n_heads
    # [b, d, t] -> [b, h, t, k_ch]
    qh = q.reshape(b, n_heads, k_ch, t_t).transpose(0, 1, 3, 2)
    kh = k.reshape(b, n_heads, k_ch, t_s).transpose(0, 1, 3, 2)
    vh = v.reshape(b, n_heads, k_ch, t_s).transpose(0, 1, 3, 2)

    scale = 1.0 / math.sqrt(k_ch)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh,
                        preferred_element_type=F32)
    if window_size is not None:
        rel_k = _get_relative_embeddings(p[pfx + "emb_rel_k"].astype(F32), t_s, window_size)
        rel_logits = jnp.einsum("bhld,nmd->bhlm", (qh * scale).astype(F32), rel_k)
        scores = scores + _relative_to_absolute(rel_logits)
    if attn_mask is not None:
        scores = jnp.where(attn_mask == 0, -1e4, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(x.dtype), vh)
    if window_size is not None:
        rel_w = _absolute_to_relative(probs)
        rel_v = _get_relative_embeddings(p[pfx + "emb_rel_v"].astype(F32), t_s, window_size)
        out = out + jnp.einsum("bhlm,nmd->bhld", rel_w, rel_v).astype(x.dtype)
    out = out.transpose(0, 1, 3, 2).reshape(b, d, t_t)
    out = conv1d(out, p[pfx + "conv_o.weight"], p[pfx + "conv_o.bias"])
    return out, probs


def ffn(p, pfx, x, x_mask, kernel_size: int):
    """``attentions.FFN`` (same-padded conv sandwich, relu)."""
    pad_l = (kernel_size - 1) // 2
    pad_r = kernel_size // 2

    def same_pad(t):
        if kernel_size == 1:
            return t
        return jnp.pad(t, [(0, 0), (0, 0), (pad_l, pad_r)])

    h = conv1d(same_pad(x * x_mask), p[pfx + "conv_1.weight"], p[pfx + "conv_1.bias"])
    h = jax.nn.relu(h)
    h = conv1d(same_pad(h * x_mask), p[pfx + "conv_2.weight"], p[pfx + "conv_2.bias"])
    return h * x_mask


def vits_encoder(p, pfx, x, x_mask, n_layers: int, n_heads: int,
                 kernel_size: int, window_size: int = 4):
    """``attentions.Encoder`` stack (``attentions.py:10-78``)."""
    attn_mask = x_mask[:, :, None, :] * x_mask[:, :, :, None]  # [B,1,T,T]
    x = x * x_mask
    for i in range(n_layers):
        y, _ = vits_attention(p, f"{pfx}attn_layers.{i}.", x, x, n_heads,
                              attn_mask, window_size)
        x = channel_layer_norm(x + y, p[f"{pfx}norm_layers_1.{i}.gamma"],
                               p[f"{pfx}norm_layers_1.{i}.beta"])
        y = ffn(p, f"{pfx}ffn_layers.{i}.", x, x_mask, kernel_size)
        x = channel_layer_norm(x + y, p[f"{pfx}norm_layers_2.{i}.gamma"],
                               p[f"{pfx}norm_layers_2.{i}.beta"])
    return x * x_mask


# -- MRTE (``module/mrte_model.py``) ----------------------------------------

def mrte(p, pfx, ssl_enc, ssl_mask, text, text_mask, ge,
         slice_indices: Optional[jnp.ndarray] = None,
         nullkey_idx: Optional[jnp.ndarray] = None):
    """Cross-attention fusion; returns (out, attn) — the attention matrix is
    consumed by the subtitle Viterbi (``models.py:427``).  ``nullkey_idx``
    overrides which text column is always attendable under ``slice_indices``
    (defaults to the last column; needed when text is shape-padded)."""
    if slice_indices is None:
        attn_mask = text_mask[:, :, None, :] * ssl_mask[:, :, :, None]
    else:
        n = text.shape[-1]
        text_range = jnp.arange(n)[None, :]
        start = slice_indices[:, 0][:, None]
        end = slice_indices[:, 1][:, None]
        attn_mask = (text_range >= start) & (text_range < end)
        if nullkey_idx is None:
            attn_mask = attn_mask.at[:, -1].set(True)  # nullkey always attendable
        else:
            attn_mask = attn_mask | (text_range == nullkey_idx)
        attn_mask = attn_mask[None, None]

    ssl_h = conv1d(ssl_enc * ssl_mask, p[pfx + "c_pre.weight"], p[pfx + "c_pre.bias"])
    text_h = conv1d(text * text_mask, p[pfx + "text_pre.weight"], p[pfx + "text_pre.bias"])
    x, attn = vits_attention(p, pfx + "cross_attention.", ssl_h * ssl_mask,
                             text_h * text_mask, 4, attn_mask, None)
    x = x + ssl_h + ge
    x = conv1d(x * ssl_mask, p[pfx + "c_post.weight"], p[pfx + "c_post.bias"])
    return x, attn


# -- WaveNet / flow (``modules.py:30-112,447-511``) -------------------------

def wn(p, pfx, x, x_mask, n_layers: int, hidden: int, kernel_size: int,
       dilation_rate: int, g: Optional[jnp.ndarray] = None):
    output = jnp.zeros_like(x)
    if g is not None:
        g = conv1d(g, p[pfx + "cond_layer.weight"], p[pfx + "cond_layer.bias"])
    for i in range(n_layers):
        dilation = dilation_rate ** i
        padding = (kernel_size * dilation - dilation) // 2
        x_in = conv1d(x, p[f"{pfx}in_layers.{i}.weight"], p[f"{pfx}in_layers.{i}.bias"],
                      padding=padding, dilation=dilation)
        if g is not None:
            g_l = g[:, i * 2 * hidden:(i + 1) * 2 * hidden]
        else:
            g_l = jnp.zeros_like(x_in)
        # fused tanh-sigmoid gate (``commons.py:14-21``)
        in_act = x_in + g_l
        acts = jnp.tanh(in_act[:, :hidden]) * jax.nn.sigmoid(in_act[:, hidden:])
        res_skip = conv1d(acts, p[f"{pfx}res_skip_layers.{i}.weight"],
                          p[f"{pfx}res_skip_layers.{i}.bias"])
        if i < n_layers - 1:
            x = (x + res_skip[:, :hidden]) * x_mask
            output = output + res_skip[:, hidden:]
        else:
            output = output + res_skip
    return output * x_mask


def flow_reverse(p, cfg: SovitsConfig, x, x_mask, g):
    """``ResidualCouplingBlock`` run in reverse (inference direction,
    ``models.py:58-65``): iterate flows backwards; each pair is
    (Flip, ResidualCouplingLayer) when reversed."""
    half = cfg.inter_channels // 2
    for i in range(cfg.flow_n_flows - 1, -1, -1):
        # Flip (applied first in reverse order)
        x = jnp.flip(x, axis=1)
        pfx = f"flow.flows.{i * 2}."
        x0 = x[:, :half]
        x1 = x[:, half:]
        h = conv1d(x0, p[pfx + "pre.weight"], p[pfx + "pre.bias"]) * x_mask
        h = wn(p, pfx + "enc.", h, x_mask, cfg.flow_n_layers, cfg.hidden_channels,
               cfg.flow_kernel_size, 1, g=g)
        m = conv1d(h, p[pfx + "post.weight"], p[pfx + "post.bias"]) * x_mask
        x1 = (x1 - m) * x_mask  # mean_only => logs = 0
        x = jnp.concatenate([x0, x1], axis=1)
    return x


# -- HiFi-GAN generator (``models.py:68-138``, ``modules.py:115-209``) ------

def resblock1(p, pfx, x, kernel_size: int, dilations: Tuple[int, ...]):
    for j, d in enumerate(dilations):
        xt = leaky_relu(x, LRELU_SLOPE)
        pad = (kernel_size * d - d) // 2
        xt = conv1d(xt, p[f"{pfx}convs1.{j}.weight"], p[f"{pfx}convs1.{j}.bias"],
                    padding=pad, dilation=d)
        xt = leaky_relu(xt, LRELU_SLOPE)
        pad = (kernel_size - 1) // 2
        xt = conv1d(xt, p[f"{pfx}convs2.{j}.weight"], p[f"{pfx}convs2.{j}.bias"],
                    padding=pad)
        x = xt + x
    return x


def generator(p, cfg: SovitsConfig, x, g: Optional[jnp.ndarray] = None,
              n_stages: Optional[int] = None):
    """HiFi-GAN vocoder (``models.py:68-128``).  ``n_stages`` truncates
    after that many upsample stages (bench attribution only — the returned
    intermediate is NOT audio)."""
    x = conv1d(x, p["dec.conv_pre.weight"], p["dec.conv_pre.bias"], padding=3)
    if g is not None:
        x = x + conv1d(g, p["dec.cond.weight"], p["dec.cond.bias"])
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        if n_stages is not None and i >= n_stages:
            return x
        x = leaky_relu(x, LRELU_SLOPE)
        x = conv_transpose1d(x, p[f"dec.ups.{i}.weight"], p[f"dec.ups.{i}.bias"],
                             stride=u, padding=(k - u) // 2)
        xs = None
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            r = resblock1(p, f"dec.resblocks.{i * num_kernels + j}.", x, rk, rd)
            xs = r if xs is None else xs + r
        x = xs / num_kernels
    # final activation uses torch's default slope 0.01 (``models.py:128``)
    x = leaky_relu(x, 0.01)
    x = conv1d(x, p["dec.conv_post.weight"], p.get("dec.conv_post.bias"), padding=3)
    return jnp.tanh(x)


# -- channels-last (MXU-native) flow + generator ----------------------------
#
# The inference vocoder (``flow_dec``) re-expressed with time on the matmul
# M dim and channels on the lanes: every conv becomes K shifted
# [B, T, C_in] x [C_in, C_out] matmuls (``ops/convs.conv1d_mm``) and every
# upsample a polyphase stack (``conv_transpose1d_mm`` — 10x/8x fewer FLOPs
# than the lhs-dilated form on the first two HiFi-GAN stages).  Same
# parameters, same ℝ semantics as the NCH functions above (f32 tap
# accumulation; summation order differs).  Functions carry [B, T, C].

def wn_nlc(p, pfx, x, x_mask, n_layers: int, hidden: int, kernel_size: int,
           dilation_rate: int, g: Optional[jnp.ndarray] = None):
    """``wn`` with x, x_mask, g in [B, T, C] layout."""
    output = jnp.zeros_like(x)
    if g is not None:
        g = conv1d_mm(g, p[pfx + "cond_layer.weight"], p[pfx + "cond_layer.bias"])
    for i in range(n_layers):
        dilation = dilation_rate ** i
        padding = (kernel_size * dilation - dilation) // 2
        x_in = conv1d_mm(x, p[f"{pfx}in_layers.{i}.weight"],
                         p[f"{pfx}in_layers.{i}.bias"],
                         padding=padding, dilation=dilation)
        if g is not None:
            g_l = g[:, :, i * 2 * hidden:(i + 1) * 2 * hidden]
        else:
            g_l = jnp.zeros_like(x_in)
        in_act = x_in + g_l
        acts = jnp.tanh(in_act[:, :, :hidden]) * jax.nn.sigmoid(in_act[:, :, hidden:])
        res_skip = conv1d_mm(acts, p[f"{pfx}res_skip_layers.{i}.weight"],
                             p[f"{pfx}res_skip_layers.{i}.bias"])
        if i < n_layers - 1:
            x = (x + res_skip[:, :, :hidden]) * x_mask
            output = output + res_skip[:, :, hidden:]
        else:
            output = output + res_skip
    return output * x_mask


def flow_reverse_nlc(p, cfg: SovitsConfig, x, x_mask, g):
    """``flow_reverse`` with x [B, T, C], x_mask [B, T, 1], g [B, 1, gin]."""
    half = cfg.inter_channels // 2
    for i in range(cfg.flow_n_flows - 1, -1, -1):
        x = jnp.flip(x, axis=2)
        pfx = f"flow.flows.{i * 2}."
        x0 = x[:, :, :half]
        x1 = x[:, :, half:]
        h = conv1d_mm(x0, p[pfx + "pre.weight"], p[pfx + "pre.bias"]) * x_mask
        h = wn_nlc(p, pfx + "enc.", h, x_mask, cfg.flow_n_layers,
                   cfg.hidden_channels, cfg.flow_kernel_size, 1, g=g)
        m = conv1d_mm(h, p[pfx + "post.weight"], p[pfx + "post.bias"]) * x_mask
        x1 = (x1 - m) * x_mask
        x = jnp.concatenate([x0, x1], axis=2)
    return x


def resblock1_nlc(p, pfx, x, kernel_size: int, dilations: Tuple[int, ...]):
    for j, d in enumerate(dilations):
        xt = leaky_relu(x, LRELU_SLOPE)
        pad = (kernel_size * d - d) // 2
        xt = conv1d_mm(xt, p[f"{pfx}convs1.{j}.weight"], p[f"{pfx}convs1.{j}.bias"],
                       padding=pad, dilation=d)
        xt = leaky_relu(xt, LRELU_SLOPE)
        pad = (kernel_size - 1) // 2
        xt = conv1d_mm(xt, p[f"{pfx}convs2.{j}.weight"], p[f"{pfx}convs2.{j}.bias"],
                       padding=pad)
        x = xt + x
    return x


def generator_nlc(p, cfg: SovitsConfig, x, g: Optional[jnp.ndarray] = None):
    """``generator`` with x [B, T, C] (and g [B, 1, gin]) → audio [B, T_out, 1]."""
    x = conv1d_mm(x, p["dec.conv_pre.weight"], p["dec.conv_pre.bias"], padding=3)
    if g is not None:
        x = x + conv1d_mm(g, p["dec.cond.weight"], p["dec.cond.bias"])
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = leaky_relu(x, LRELU_SLOPE)
        x = conv_transpose1d_mm(x, p[f"dec.ups.{i}.weight"], p[f"dec.ups.{i}.bias"],
                                stride=u, padding=(k - u) // 2)
        xs = None
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            r = resblock1_nlc(p, f"dec.resblocks.{i * num_kernels + j}.", x, rk, rd)
            xs = r if xs is None else xs + r
        x = xs / num_kernels
    x = leaky_relu(x, 0.01)
    x = conv1d_mm(x, p["dec.conv_post.weight"], p.get("dec.conv_post.bias"),
                  padding=3)
    return jnp.tanh(x)


# -- Reference (mel-style) encoder (``modules.py:367-444``) -----------------

def mel_style_encoder(p, cfg: SovitsConfig, x, mask: Optional[jnp.ndarray] = None):
    """x [B, n_mel(=704), T] → style vector [B, gin, 1].  ``mask`` is the
    [B,1,T] 1/0 mask (ones in the inference path, ``models.py:372``)."""
    pfx = "ref_enc."
    x = x.transpose(0, 2, 1)  # [B, T, C]
    key_mask = None if mask is None else (mask[:, 0, :] == 0)  # True = pad

    # spectral: Linear+Mish ×2
    x = mish(linear(x, p[pfx + "spectral.0.fc.weight"], p[pfx + "spectral.0.fc.bias"]))
    x = mish(linear(x, p[pfx + "spectral.3.fc.weight"], p[pfx + "spectral.3.fc.bias"]))

    # temporal: Conv1dGLU ×2
    x = x.transpose(0, 2, 1)
    for i in range(2):
        res = x
        h = conv1d(x, p[f"{pfx}temporal.{i}.conv1.conv.weight"],
                   p[f"{pfx}temporal.{i}.conv1.conv.bias"],
                   padding=(cfg.ref_enc_kernel - 1) // 2)
        c = cfg.ref_enc_hidden
        x = res + h[:, :c] * jax.nn.sigmoid(h[:, c:])
    x = x.transpose(0, 2, 1)  # [B, T, C]

    if key_mask is not None:
        x = jnp.where(key_mask[:, :, None], 0.0, x)

    # self-attention (``modules.py:291-341``): temperature = sqrt(d_model)
    b, t, d = x.shape
    h = cfg.ref_enc_heads
    dk = cfg.ref_enc_hidden // h
    q = linear(x, p[pfx + "slf_attn.w_qs.weight"], p[pfx + "slf_attn.w_qs.bias"])
    k = linear(x, p[pfx + "slf_attn.w_ks.weight"], p[pfx + "slf_attn.w_ks.bias"])
    v = linear(x, p[pfx + "slf_attn.w_vs.weight"], p[pfx + "slf_attn.w_vs.bias"])
    q = q.reshape(b, t, h, dk).transpose(2, 0, 1, 3)
    k = k.reshape(b, t, h, dk).transpose(2, 0, 1, 3)
    v = v.reshape(b, t, h, dk).transpose(2, 0, 1, 3)
    scores = jnp.einsum("hbqd,hbkd->hbqk", q, k, preferred_element_type=F32)
    scores = scores / math.sqrt(cfg.ref_enc_hidden)
    if key_mask is not None:
        scores = jnp.where(key_mask[None, :, None, :], -jnp.inf, scores)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("hbqk,hbkd->hbqd", probs, v)
    out = out.transpose(1, 2, 0, 3).reshape(b, t, h * dk)
    out = linear(out, p[pfx + "slf_attn.fc.weight"], p[pfx + "slf_attn.fc.bias"])
    x = out + x

    x = linear(x, p[pfx + "fc.fc.weight"], p[pfx + "fc.fc.bias"])

    # temporal average pooling (``modules.py:411-421``)
    if key_mask is None:
        w = jnp.mean(x, axis=1)
    else:
        dtype = x.dtype  # pool in f32, return the compute dtype (the old
        lens = jnp.sum(~key_mask, axis=1)[:, None]  # .astype(x.dtype) was a
        x = jnp.where(key_mask[:, :, None], 0.0, x).astype(F32)  # no-op on
        w = jnp.sum(x / lens[:, :, None], axis=1).astype(dtype)  # shadowed x)
    return w[:, :, None]


# -- RVQ (``module/quantize.py``, ``module/core_vq.py``) --------------------

def quantizer_decode(p, codes: jnp.ndarray, n_q: int = 1) -> jnp.ndarray:
    """codes [n_q, B, T] → summed codebook vectors [B, D, T]."""
    out = None
    for q in range(n_q):
        embed = p[f"quantizer.vq.layers.{q}._codebook.embed"]
        vec = jnp.take(embed, codes[q], axis=0)  # [B, T, D]
        out = vec if out is None else out + vec
    return out.transpose(0, 2, 1)


def quantizer_encode(p, x: jnp.ndarray, n_q: int = 1) -> jnp.ndarray:
    """x [B, D, T] → codes [n_q, B, T] (euclidean nearest, residual)."""
    residual = x.transpose(0, 2, 1).astype(F32)  # [B, T, D]
    codes = []
    for q in range(n_q):
        embed = p[f"quantizer.vq.layers.{q}._codebook.embed"].astype(F32)
        dist = (jnp.sum(residual ** 2, -1, keepdims=True)
                - 2 * residual @ embed.T
                + jnp.sum(embed ** 2, -1)[None, None, :])
        idx = jnp.argmin(dist, axis=-1)
        codes.append(idx)
        residual = residual - jnp.take(embed, idx, axis=0)
    return jnp.stack(codes)


# ---------------------------------------------------------------------------
# TextEncoder + top-level synthesizer
# ---------------------------------------------------------------------------

def text_encoder_infer(p, cfg: SovitsConfig, y, text, ge,
                       slice_indices: Optional[jnp.ndarray] = None,
                       y_mask: Optional[jnp.ndarray] = None,
                       text_mask: Optional[jnp.ndarray] = None,
                       nullkey_idx: Optional[jnp.ndarray] = None):
    """``TextEncoder.infer`` core (``models.py:196-224``) without the
    streaming/speed post-steps (those live in ``decode_latents`` below).

    y    [B, 768, T]  upsampled quantized SSL latent (50 Hz)
    text [B, N]       phoneme ids
    ge   [B, 512, 1|T] speaker conditioning (already ge_to512'd for v2Pro)
    Returns ``(y_latent, y_mask, attn)`` — ``y_latent`` [B, H, T] is the
    pre-projection latent used for streaming cross-fade, ``attn``
    [B, 4, Tq, Tk] the MRTE attention (4 heads; callers slice/viterbi it
    for subtitles).
    """
    pfx = "enc_p."
    if y_mask is None:
        y_mask = jnp.ones((y.shape[0], 1, y.shape[2]), y.dtype)
    if text_mask is None:
        text_mask = jnp.ones((text.shape[0], 1, text.shape[1]), y.dtype)

    h = conv1d(y * y_mask, p[pfx + "ssl_proj.weight"], p[pfx + "ssl_proj.bias"]) * y_mask
    h = vits_encoder(p, pfx + "encoder_ssl.", h * y_mask, y_mask,
                     cfg.n_layers // 2, cfg.n_heads, cfg.kernel_size, cfg.window_size)

    t = jnp.take(p[pfx + "text_embedding.weight"], text, axis=0).astype(h.dtype)
    t = t.transpose(0, 2, 1)
    t = vits_encoder(p, pfx + "encoder_text.", t * text_mask, text_mask,
                     cfg.n_layers, cfg.n_heads, cfg.kernel_size, cfg.window_size)

    h, attn = mrte(p, pfx + "mrte.", h, y_mask, t, text_mask, ge, slice_indices,
                   nullkey_idx)
    h = vits_encoder(p, pfx + "encoder2.", h * y_mask, y_mask,
                     cfg.n_layers // 2, cfg.n_heads, cfg.kernel_size, cfg.window_size)
    return h, y_mask, attn


def project_latent(p, cfg: SovitsConfig, y_latent, y_mask):
    stats = conv1d(y_latent, p["enc_p.proj.weight"], p["enc_p.proj.bias"]) * y_mask
    m = stats[:, : cfg.inter_channels]
    logs = stats[:, cfg.inter_channels:]
    return m, logs


def get_ge(p, cfg: SovitsConfig, refer: jnp.ndarray,
           sv_emb: Optional[jnp.ndarray] = None,
           refer_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Speaker conditioning from the linear spectrogram (``models.py:371-378``)."""
    if refer_mask is None:
        refer_mask = jnp.ones((refer.shape[0], 1, refer.shape[2]), refer.dtype)
    ge = mel_style_encoder(p, cfg, refer[:, :cfg.ref_enc_in] * refer_mask, refer_mask)
    if cfg.is_v2pro and sv_emb is not None:
        sv = linear(sv_emb, p["sv_emb.weight"], p["sv_emb.bias"])
        ge = ge + sv[:, :, None]
        ge = prelu(ge, p["prelu.weight"])
    return ge


def ge_for_mrte(p, cfg: SovitsConfig, ge: jnp.ndarray) -> jnp.ndarray:
    """v2Pro routes ge through ``ge_to512`` before MRTE (``models.py:394``)."""
    if cfg.is_v2pro:
        return linear(ge.transpose(0, 2, 1), p["ge_to512.weight"],
                      p["ge_to512.bias"]).transpose(0, 2, 1)
    return ge


#: conv formulation for the inference vocoder: "nlc" = channels-last
#: matmul-form convs + polyphase upsamples (MXU-native), "nch" = the
#: original ``lax.conv_general_dilated`` path.  Module-level so every jit
#: region (solo bucketed, cross-stream batched, fused streaming) picks it
#: up consistently; flip only with a cleared compile cache.
VOCODER_CONV_IMPL = "nlc"


def flow_dec(p, cfg: SovitsConfig, z_p, y_mask, ge):
    """flow⁻¹ + vocoder (``models.py:380-383``), the CUDA-graph'd region in
    the reference — here one fused jit region per frame bucket."""
    if VOCODER_CONV_IMPL == "nlc":
        mask_t = y_mask.transpose(0, 2, 1)
        ge_t = ge.transpose(0, 2, 1)
        z_t = flow_reverse_nlc(p, cfg, z_p.transpose(0, 2, 1), mask_t, ge_t)
        audio = generator_nlc(p, cfg, z_t * mask_t, g=ge_t)
        return audio.transpose(0, 2, 1)
    z = flow_reverse(p, cfg, z_p, y_mask, ge)
    return generator(p, cfg, z * y_mask, g=ge)


def extract_latent(p, x: jnp.ndarray) -> jnp.ndarray:
    """50 Hz SSL features → 25 Hz RVQ codes (``models.py:431-434``)."""
    ssl = conv1d(x, p["ssl_proj.weight"], p["ssl_proj.bias"], stride=2)
    return quantizer_encode(p, ssl).transpose(1, 0, 2)


def decode_core(p, cfg: SovitsConfig, codes, text, ge, noise, *,
                speed: float = 1.0,
                slice_indices: Optional[jnp.ndarray] = None,
                y_overlap: Optional[jnp.ndarray] = None,
                valid_start_idx: int = 0,
                overlap_len: Optional[int] = None,
                y_mask: Optional[jnp.ndarray] = None,
                text_mask: Optional[jnp.ndarray] = None,
                nullkey_idx: Optional[jnp.ndarray] = None):
    """Latent pipeline of ``SynthesizerTrn.decode`` (``models.py:385-404``)
    up to ``z_p`` — everything before the bucketed flow+vocoder.

    ``noise`` is a standard-normal tensor shaped like ``m``  scaled outside
    by ``noise_scale`` (kept explicit for reproducibility across backends).
    Returns (z_p, y_mask, attn, new_y_overlap, ge_out) where ``ge_out`` is the
    (possibly time-expanded / speed-resampled) conditioning to feed
    ``flow_dec`` (``models.py:389,402``).
    """
    quantized = quantizer_decode(p, codes, cfg.quantizer_n_q)
    quantized = interpolate_nearest_2x(quantized)
    if ge.shape[-1] != 1:
        ge_t = interpolate_nearest(ge, ge.shape[-1] * 2)
    else:
        ge_t = ge

    y_latent, y_mask, attn = text_encoder_infer(
        p, cfg, quantized, text, ge_for_mrte(p, cfg, ge_t), slice_indices,
        y_mask=y_mask, text_mask=text_mask, nullkey_idx=nullkey_idx)

    new_overlap = None
    if overlap_len is not None:
        # streaming cross-fade of the latent chunk boundary (``models.py:209-215``)
        y_latent = y_latent[:, :, valid_start_idx:]
        y_mask = y_mask[:, :, valid_start_idx:]
        alpha = jnp.linspace(0, 1, overlap_len, dtype=y_latent.dtype)[None, None, :]
        if y_overlap is not None:
            head = y_overlap * (1 - alpha) + y_latent[:, :, :overlap_len] * alpha
            y_latent = jnp.concatenate([head, y_latent[:, :, overlap_len:]], axis=2)
        new_overlap = y_latent[:, :, -overlap_len:]

    if speed != 1:
        y_latent = interpolate_linear(y_latent, int(y_latent.shape[-1] / speed) + 1)
        y_mask = interpolate_nearest(y_mask, y_latent.shape[-1])

    m, logs = project_latent(p, cfg, y_latent, y_mask)
    z_p = m + noise * jnp.exp(logs)

    ge_out = ge_t
    if speed != 1 and ge_t.shape[-1] != 1:
        ge_out = interpolate_nearest(ge_t, m.shape[-1])
    return z_p, y_mask, attn, new_overlap, ge_out


def decode_core_stream_padded(p, cfg: SovitsConfig, codes_pad, codes_len,
                              text_pad, text_len, ge, noise, y_overlap, vsi,
                              *, overlap_len: int, blend: bool):
    """Bucket-padded streaming variant of :func:`decode_core` — the shape
    contract that makes the facade's streaming vocode ONE jitted program
    per (codes-bucket, text-bucket) pair instead of an eager op-by-op
    dispatch per chunk (reference ``TTS.py:422-431`` runs its equivalent
    eagerly under CUDA; on TPU eager dispatch costs ~10-50 us/op and a
    tunnel RTT per op under axon).

    ``codes_pad`` [1, 1, Bc] / ``text_pad`` [1, Np] are right-padded to
    bucket sizes; ``codes_len`` / ``text_len`` / ``vsi`` are traced
    scalars, so chunk boundaries never trigger recompiles.  VITS masking
    makes right-padding exact: masked columns are zeros, which match the
    SAME-padding zeros convs see at the boundary in the exact-shape
    computation, and attention is masked — so the valid region is
    numerically identical to :func:`decode_core`.

    Returns ``(z_p [1, C, 2*Bc], y_mask_chunk, attn [1, 4, 2*Bc, Np],
    new_overlap [1, hidden, overlap_len])``; the caller slices the valid
    prefix ``2*codes_len - vsi`` (and ``attn``'s valid rows/cols) host-side.
    """
    Bc = codes_pad.shape[-1]
    T50 = 2 * Bc
    quantized = quantizer_decode(p, codes_pad, cfg.quantizer_n_q)
    quantized = interpolate_nearest_2x(quantized)
    t50_valid = 2 * codes_len
    pos = jnp.arange(T50)[None, None, :]
    y_mask = (pos < t50_valid).astype(quantized.dtype)
    tpos = jnp.arange(text_pad.shape[-1])[None, None, :]
    text_mask = (tpos < text_len).astype(quantized.dtype)

    ge_t = ge
    if ge.shape[-1] != 1:
        ge_t = interpolate_nearest(ge, ge.shape[-1] * 2)
    y_latent, y_mask, attn = text_encoder_infer(
        p, cfg, quantized, text_pad, ge_for_mrte(p, cfg, ge_t),
        y_mask=y_mask, text_mask=text_mask)

    C = y_latent.shape[1]
    # static-size chunk slice at a traced offset: right-extend by T50 zeros
    # so (vsi + T50) never clamps
    ext = jnp.pad(y_latent, [(0, 0), (0, 0), (0, T50)])
    chunk = jax.lax.dynamic_slice(ext, (0, 0, vsi), (1, C, T50))
    mext = jnp.pad(y_mask, [(0, 0), (0, 0), (0, T50)])
    mask_chunk = jax.lax.dynamic_slice(mext, (0, 0, vsi), (1, 1, T50))
    if blend:
        alpha = jnp.linspace(0, 1, overlap_len, dtype=chunk.dtype)[None, None, :]
        head = y_overlap * (1 - alpha) + chunk[:, :, :overlap_len] * alpha
        chunk = jnp.concatenate([head, chunk[:, :, overlap_len:]], axis=2)
    # overlap carry comes from the BLENDED chunk's valid tail
    # (``decode_core`` takes it after the cross-fade)
    cext = jnp.pad(chunk, [(0, 0), (0, 0), (0, T50)])
    new_overlap = jax.lax.dynamic_slice(
        cext, (0, 0, t50_valid - vsi - overlap_len), (1, C, overlap_len))

    m, logs = project_latent(p, cfg, chunk, mask_chunk)
    z_p = m + noise * jnp.exp(logs)
    return z_p, mask_chunk, attn, new_overlap


def decode_core_stream_padded_batch(p, cfg: SovitsConfig, codes_pad,
                                    codes_len, text_pad, text_len, ge, noise,
                                    y_overlap, vsi, blend, *,
                                    overlap_len: int):
    """Cross-stream batched variant of :func:`decode_core_stream_padded`:
    N independent streaming requests' vocoder chunks run as ONE program.

    Every per-request quantity is a [B]-vector of traced scalars
    (``codes_len`` / ``text_len`` / ``vsi`` / ``blend``), so requests at
    different progress points — different valid lengths, different chunk
    offsets, first chunk (no blend) vs later chunks — share one compiled
    executable keyed only by the (B, codes-bucket, text-bucket) shapes.
    Rows are right-padded into the COMMON bucket; VITS masking makes that
    exact per row (see the single-row variant's docstring).  ``blend`` is
    a per-row bool selecting the cross-fade head (the single-row variant's
    static ``blend`` flag, made traced so first chunks can share the batch
    with later chunks).

    Shapes: codes_pad [B, 1, Bc], text_pad [B, Np], ge [B, gin, 1],
    noise [B, inter, 2*Bc], y_overlap [B, hidden, overlap_len];
    returns (z_p [B, C, 2*Bc], mask [B, 1, 2*Bc], attn [B, 4, 2*Bc, Np],
    new_overlap [B, hidden, overlap_len]) — the caller slices each row's
    valid prefix ``2*codes_len[b] - vsi[b]`` host-side.

    No reference counterpart: the reference vocodes each stream's chunk
    solo under its ``_infer_lock`` (``TTS.py:422-431``); this is the TPU
    batch-amortization of that region across concurrent clients.
    """
    B, _, Bc = codes_pad.shape
    T50 = 2 * Bc
    quantized = quantizer_decode(p, codes_pad.transpose(1, 0, 2),
                                 cfg.quantizer_n_q)
    quantized = interpolate_nearest_2x(quantized)
    t50_valid = 2 * codes_len  # [B]
    pos = jnp.arange(T50)[None, None, :]
    y_mask = (pos < t50_valid[:, None, None]).astype(quantized.dtype)
    tpos = jnp.arange(text_pad.shape[-1])[None, None, :]
    text_mask = (tpos < text_len[:, None, None]).astype(quantized.dtype)

    y_latent, y_mask, attn = text_encoder_infer(
        p, cfg, quantized, text_pad, ge_for_mrte(p, cfg, ge),
        y_mask=y_mask, text_mask=text_mask)

    C = y_latent.shape[1]
    ext = jnp.pad(y_latent, [(0, 0), (0, 0), (0, T50)])
    mext = jnp.pad(y_mask, [(0, 0), (0, 0), (0, T50)])
    slice_row = jax.vmap(
        lambda e, v: jax.lax.dynamic_slice(e, (0, v), (C, T50)))
    chunk = slice_row(ext, vsi)
    mask_chunk = jax.vmap(
        lambda e, v: jax.lax.dynamic_slice(e, (0, v), (1, T50)))(mext, vsi)
    alpha = jnp.linspace(0, 1, overlap_len, dtype=chunk.dtype)[None, None, :]
    blended = y_overlap * (1 - alpha) + chunk[:, :, :overlap_len] * alpha
    head = jnp.where(blend[:, None, None], blended, chunk[:, :, :overlap_len])
    chunk = jnp.concatenate([head, chunk[:, :, overlap_len:]], axis=2)
    cext = jnp.pad(chunk, [(0, 0), (0, 0), (0, T50)])
    H = chunk.shape[1]
    new_overlap = jax.vmap(
        lambda e, s: jax.lax.dynamic_slice(e, (0, s), (H, overlap_len)))(
        cext, t50_valid - vsi - overlap_len)

    m, logs = project_latent(p, cfg, chunk, mask_chunk)
    z_p = m + noise * jnp.exp(logs)
    return z_p, mask_chunk, attn, new_overlap


def params_from_torch_state_dict(state_dict: Dict[str, Any], dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Flat torch state dict (numpy values) → our flat params.  Folds any
    weight-norm (weight_g/weight_v) pairs (reference removes the Generator's
    at load, ``Loader.py:73,95``; we fold all of them — inference only)."""
    from ..ops.convs import fold_weight_norm

    out: Dict[str, jnp.ndarray] = {}
    keys = set(state_dict.keys())
    consumed = set()
    for k in sorted(keys):
        if k.endswith("weight_v"):
            base = k[: -len("weight_v")]
            g = base + "weight_g"
            w = fold_weight_norm(np.asarray(state_dict[k]), np.asarray(state_dict[g]))
            out[base + "weight"] = jnp.asarray(w, dtype)
            consumed.update({k, g})
    for k in sorted(keys - consumed):
        v = np.asarray(state_dict[k])
        out[k] = jnp.asarray(v, dtype)
    return out


def init_params(rng: jax.Array, cfg: SovitsConfig, dtype=jnp.float32,
                scale: float = 0.05) -> Dict[str, jnp.ndarray]:
    """Random parameters with checkpoint-identical keys/shapes — used for
    benchmarking and tests when no real checkpoint is available."""
    key_iter = [jax.random.fold_in(rng, i) for i in range(4096)]
    ctr = [0]

    def nrm(*shape):
        ctr[0] += 1
        return (jax.random.normal(key_iter[ctr[0]], shape) * scale).astype(dtype)

    p: Dict[str, jnp.ndarray] = {}

    def conv(name, out_c, in_c, k, bias=True):
        p[name + ".weight"] = nrm(out_c, in_c, k)
        if bias:
            p[name + ".bias"] = jnp.zeros((out_c,), dtype)

    def lin(name, out_c, in_c, bias=True):
        p[name + ".weight"] = nrm(out_c, in_c)
        if bias:
            p[name + ".bias"] = jnp.zeros((out_c,), dtype)

    C, F, Hn, W = cfg.hidden_channels, cfg.filter_channels, cfg.n_heads, cfg.window_size
    kch = C // Hn

    def encoder(pfx, n_layers):
        for i in range(n_layers):
            for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
                conv(f"{pfx}.attn_layers.{i}.{nm}", C, C, 1)
            p[f"{pfx}.attn_layers.{i}.emb_rel_k"] = nrm(1, 2 * W + 1, kch)
            p[f"{pfx}.attn_layers.{i}.emb_rel_v"] = nrm(1, 2 * W + 1, kch)
            for nm, shp in (("norm_layers_1", C), ("norm_layers_2", C)):
                p[f"{pfx}.{nm}.{i}.gamma"] = jnp.ones((shp,), dtype)
                p[f"{pfx}.{nm}.{i}.beta"] = jnp.zeros((shp,), dtype)
            conv(f"{pfx}.ffn_layers.{i}.conv_1", F, C, cfg.kernel_size)
            conv(f"{pfx}.ffn_layers.{i}.conv_2", C, F, cfg.kernel_size)

    # enc_p
    conv("enc_p.ssl_proj", C, cfg.ssl_dim, 1)
    encoder("enc_p.encoder_ssl", cfg.n_layers // 2)
    encoder("enc_p.encoder_text", cfg.n_layers)
    p["enc_p.text_embedding.weight"] = nrm(cfg.n_symbols, C)
    for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
        conv(f"enc_p.mrte.cross_attention.{nm}", 512, 512, 1)
    conv("enc_p.mrte.c_pre", 512, C, 1)
    conv("enc_p.mrte.text_pre", 512, C, 1)
    conv("enc_p.mrte.c_post", C, 512, 1)
    encoder("enc_p.encoder2", cfg.n_layers // 2)
    conv("enc_p.proj", cfg.inter_channels * 2, C, 1)

    # generator
    ch0 = cfg.upsample_initial_channel
    conv("dec.conv_pre", ch0, cfg.inter_channels, 7)
    if cfg.gin_channels:
        conv("dec.cond", ch0, cfg.gin_channels, 1)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        in_c, out_c = ch0 // (2 ** i), ch0 // (2 ** (i + 1))
        p[f"dec.ups.{i}.weight"] = nrm(in_c, out_c, k)  # ConvTranspose layout
        p[f"dec.ups.{i}.bias"] = jnp.zeros((out_c,), dtype)
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            for m in range(len(rd)):
                conv(f"dec.resblocks.{i * nk + j}.convs1.{m}", out_c, out_c, rk)
                conv(f"dec.resblocks.{i * nk + j}.convs2.{m}", out_c, out_c, rk)
    conv("dec.conv_post", 1, ch0 // (2 ** len(cfg.upsample_rates)), 7, bias=False)

    # flow
    half = cfg.inter_channels // 2
    for i in range(cfg.flow_n_flows):
        pfx = f"flow.flows.{i * 2}"
        conv(f"{pfx}.pre", C, half, 1)
        conv(f"{pfx}.enc.cond_layer", 2 * C * cfg.flow_n_layers, cfg.gin_channels, 1)
        for j in range(cfg.flow_n_layers):
            conv(f"{pfx}.enc.in_layers.{j}", 2 * C, C, cfg.flow_kernel_size)
            rs = 2 * C if j < cfg.flow_n_layers - 1 else C
            conv(f"{pfx}.enc.res_skip_layers.{j}", rs, C, 1)
        p[f"{pfx}.post.weight"] = jnp.zeros((half, C, 1), dtype)
        p[f"{pfx}.post.bias"] = jnp.zeros((half,), dtype)

    # ref_enc (MelStyleEncoder)
    h = cfg.ref_enc_hidden
    lin("ref_enc.spectral.0.fc", h, cfg.ref_enc_in)
    lin("ref_enc.spectral.3.fc", h, h)
    for i in range(2):
        conv(f"ref_enc.temporal.{i}.conv1.conv", 2 * h, h, cfg.ref_enc_kernel)
    for nm in ("w_qs", "w_ks", "w_vs", "fc"):
        lin(f"ref_enc.slf_attn.{nm}", h, h)
    lin("ref_enc.fc.fc", cfg.gin_channels, h)

    # quantizer + prompt ssl_proj
    p["quantizer.vq.layers.0._codebook.embed"] = (
        jax.random.normal(key_iter[0], (cfg.quantizer_bins, cfg.ssl_dim))).astype(dtype)
    conv("ssl_proj", cfg.ssl_dim, cfg.ssl_dim, 2)

    if cfg.is_v2pro:
        lin("sv_emb", cfg.gin_channels, 20480)
        lin("ge_to512", 512, cfg.gin_channels)
        p["prelu.weight"] = jnp.full((cfg.gin_channels,), 0.25, dtype)
    return p
