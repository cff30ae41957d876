"""Shared normalization math (used by the t2s / HuBERT / RoBERTa stacks)."""
import jax
import jax.numpy as jnp

F32 = jnp.float32


def layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with float32 statistics, cast back to ``x``'s dtype.

    ``g``/``b`` may be any float dtype — their promotion into the f32
    expression is exact for bf16/f16 params, so one implementation serves
    every model (the three per-model copies this replaces differed only
    by a redundant explicit ``astype(F32)`` on the affines)."""
    dtype = x.dtype
    x32 = x.astype(F32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * g.astype(F32) \
        + b.astype(F32)
    return out.astype(dtype)
