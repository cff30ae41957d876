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
    """F.interpolate(mode='nearest') to an arbitrary length (last axis)."""
    t = x.shape[-1]
    idx = jnp.floor(jnp.arange(size) * (t / size)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, t - 1)
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
