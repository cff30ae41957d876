"""1-D convolution primitives with torch-compatible semantics.

The SoVITS stack (reference ``gsv_tts/GPT_SoVITS/SoVITS``) is built almost
entirely from ``nn.Conv1d`` / ``nn.ConvTranspose1d``; these wrappers map those
exactly onto ``lax.conv_general_dilated`` so checkpoint weights can be used
unchanged (torch layouts: Conv1d weight [C_out, C_in, K], ConvTranspose1d
weight [C_in, C_out, K]).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

_DN = ("NCH", "OIH", "NCH")


def conv1d(x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
           stride: int = 1, padding: int = 0, dilation: int = 1,
           groups: int = 1) -> jnp.ndarray:
    """torch.nn.functional.conv1d.  x [B, C_in, T], weight [C_out, C_in/g, K]."""
    out = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=F32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)[None, :, None]
    return out


def conv_transpose1d(x: jnp.ndarray, weight: jnp.ndarray,
                     bias: Optional[jnp.ndarray] = None, stride: int = 1,
                     padding: int = 0) -> jnp.ndarray:
    """torch.nn.functional.conv_transpose1d.

    x [B, C_in, T], weight [C_in, C_out, K].  Implemented as an
    input-dilated convolution with a flipped kernel:
    out_len = (T - 1) * stride - 2 * padding + K.
    """
    k = weight.shape[-1]
    # [C_in, C_out, K] -> [C_out, C_in, K], kernel reversed
    w = jnp.flip(weight, axis=-1).transpose(1, 0, 2)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
        preferred_element_type=F32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)[None, :, None]
    return out


def conv1d_mm(x: jnp.ndarray, weight: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None, padding: int = 0,
              dilation: int = 1) -> jnp.ndarray:
    """Tap-unrolled channels-LAST conv1d: x [B, T, C_in], torch weight
    [C_out, C_in, K] → [B, T_out, C_out].

    MXU-native formulation of the SoVITS vocoder convs: each kernel tap is
    one [B, T, C_in] x [C_in, C_out] matmul on a shifted time slice, summed
    in f32 — time rides the matmul M dim (large), channels ride the
    lanes/contraction (128-aligned for the hot HiFi-GAN stages), and no
    NCH<->conv-layout relayouts are left for XLA to insert.  Numerically
    equivalent to ``conv1d`` up to f32 summation order (both accumulate
    taps in f32).
    """
    K = weight.shape[-1]
    t_out = x.shape[1] + 2 * padding - dilation * (K - 1)
    if padding:
        x = jnp.pad(x, [(0, 0), (padding, padding), (0, 0)])
    w = weight.astype(x.dtype)
    acc = None
    for j in range(K):
        seg = jax.lax.slice_in_dim(x, j * dilation, j * dilation + t_out,
                                   axis=1)
        part = jax.lax.dot_general(
            seg, w[:, :, j],
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=F32)
        acc = part if acc is None else acc + part
    out = acc.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def conv_transpose1d_mm(x: jnp.ndarray, weight: jnp.ndarray,
                        bias: Optional[jnp.ndarray] = None, stride: int = 1,
                        padding: int = 0) -> jnp.ndarray:
    """Polyphase channels-LAST conv_transpose1d: x [B, T, C_in], torch
    weight [C_in, C_out, K] → [B, (T-1)*stride - 2*padding + K, C_out].

    The naive ``lhs_dilation`` lowering convolves a stride-dilated input
    that is (stride-1)/stride zeros; the polyphase decomposition computes
    each output phase r with only its ceil((K-r)/stride) live taps and
    interleaves, cutting the HiFi-GAN upsample-conv FLOPs by the stride
    factor (10x / 8x for the first two stages).  Derivation: with
    t' = t + padding = k + j*stride (k the kernel tap, j the input index),
    phase r = t' mod stride draws taps k = stride*s + r, contributing
    x[t' div stride - s] @ w[:, :, k]; stacking the per-phase results on a
    new axis and reshaping interleaves them back into t'.  Exact in ℝ
    (each tap used once); f32 tap accumulation like ``conv1d_mm``.
    """
    cin, cout, K = weight.shape
    u = stride
    T = x.shape[1]
    t_out = (T - 1) * u - 2 * padding + K
    smax = -(-K // u)  # max taps over phases = ceil(K/u)
    M = T + smax - 1
    xp = jnp.pad(x, [(0, 0), (smax - 1, smax - 1), (0, 0)])
    w = weight.astype(x.dtype)
    phases = []
    for r in range(u):
        acc = jnp.zeros((x.shape[0], M, cout), F32)
        for s in range(-(-(K - r) // u)):  # s while stride*s + r < K
            seg = jax.lax.slice_in_dim(
                xp, smax - 1 - s, smax - 1 - s + M, axis=1)
            acc = acc + jax.lax.dot_general(
                seg, w[:, :, u * s + r],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=F32)
        phases.append(acc)
    out = jnp.stack(phases, axis=2).reshape(x.shape[0], M * u, cout)
    out = jax.lax.slice_in_dim(out, padding, padding + t_out,
                               axis=1).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def linear(x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch.nn.functional.linear: weight [out, in] (torch layout)."""
    out = x @ weight.astype(x.dtype).T
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def fold_weight_norm(weight_v: jnp.ndarray, weight_g: jnp.ndarray) -> jnp.ndarray:
    """Fold torch weight_norm (dim=0) parametrization: w = g * v / ||v||.

    Matches the load-time ``remove_weight_norm`` in the reference
    (``Loader.py:73,95``; norm over all dims except dim 0).
    """
    v = jnp.asarray(weight_v, F32)
    g = jnp.asarray(weight_g, F32)
    axes = tuple(range(1, v.ndim))
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return (g * v / norm).astype(weight_v.dtype)


def interpolate_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate(scale_factor=2, mode='nearest') on the last axis
    (reference ``models.py:388``: 25 Hz latent → 50 Hz)."""
    return jnp.repeat(x, 2, axis=-1)


def interpolate_nearest(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """F.interpolate(mode='nearest') to an arbitrary length (last axis).

    Source indices are computed HOST-side in float64 (shapes are static
    under jit): torch's upsample_nearest1d uses a double scale, and a
    float32 ``i * (t/size)`` flips to the neighboring index exactly at
    integer ratio boundaries (e.g. t=441, size=300, i=100: f32 rounds to
    147.000005 → 147 while double gives 146.999… → 146)."""
    t = x.shape[-1]
    idx = np.floor(np.arange(size) * (t / size)).astype(np.int32)
    idx = jnp.asarray(np.clip(idx, 0, t - 1))
    return jnp.take(x, idx, axis=-1)


def interpolate_linear(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """F.interpolate(mode='linear', align_corners=False) on the last axis
    (reference speed-change path, ``models.py:217-219``)."""
    t = x.shape[-1]
    scale = t / size
    # half-pixel centers
    src = (jnp.arange(size, dtype=F32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, t - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (src - lo).astype(x.dtype)
    xlo = jnp.take(x, lo, axis=-1)
    xhi = jnp.take(x, hi, axis=-1)
    return xlo * (1 - w) + xhi * w


def leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * slope)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


def prelu(x: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """torch PReLU with per-channel weight; x [B, C, T]."""
    w = weight.astype(x.dtype)[None, :, None]
    return jnp.where(x >= 0, x, x * w)


def conv2d(x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
           stride=1, padding=0) -> jnp.ndarray:
    """torch.nn.functional.conv2d.  x [B, C, H, W], weight [C_out, C_in, kH, kW]."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    out = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=F32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)[None, :, None, None]
    return out


def batch_norm(x: jnp.ndarray, mean: jnp.ndarray, var: jnp.ndarray,
               gamma: Optional[jnp.ndarray], beta: Optional[jnp.ndarray],
               eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode BatchNorm over the channel axis (axis 1)."""
    shape = [1, -1] + [1] * (x.ndim - 2)
    inv = jax.lax.rsqrt(var.astype(F32) + eps)
    out = (x.astype(F32) - mean.astype(F32).reshape(shape)) * inv.reshape(shape)
    if gamma is not None:
        out = out * gamma.astype(F32).reshape(shape)
    if beta is not None:
        out = out + beta.astype(F32).reshape(shape)
    return out.astype(x.dtype)
