"""Token sampling for the autoregressive t2s decoder.

Pure-jnp re-implementation of the reference sampling pipeline
(``gsv_tts/GPT_SoVITS/GPT/utils.py:5-59``): repetition penalty via
gather/scatter over previous tokens, top-p (nucleus) filtering computed on the
*pre-temperature* logits, temperature, top-k pivot filtering, and the
no-host-sync Gumbel/exponential-race draw
(argmax(probs / Exp(1)) == argmax(log probs + Gumbel)).

Everything here is shape-static and jit-friendly: ``top_k``/``top_p``/
``temperature``/``repetition_penalty`` are traced scalars or Python floats,
``previous_tokens`` is a fixed-size buffer where *invalid* slots hold the
out-of-range sentinel index ``vocab_size`` (dropped by the scatter).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def apply_repetition_penalty(
    logits: jnp.ndarray,  # [B, V] float
    previous_tokens: jnp.ndarray,  # [B, P] int32; idx >= V means "empty slot"
    repetition_penalty: float,
) -> jnp.ndarray:
    """Mirror of ``utils.py:20-27``: gathered scores are scaled and scattered
    back (duplicates write identical values, so scatter order is irrelevant)."""

    def _row(row_logits, row_prev):
        score = jnp.take(row_logits, row_prev, mode="clip")
        score = jnp.where(score < 0, score * repetition_penalty, score / repetition_penalty)
        return row_logits.at[row_prev].set(score, mode="drop")

    return jax.vmap(_row)(logits, previous_tokens)


def apply_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filter on raw logits (``utils.py:29-39``).  Keeps at least the
    top-1 token.  Note the reference computes the cumulative distribution
    *before* temperature is applied; we preserve that order."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_idx = jnp.argsort(logits, axis=-1)[..., ::-1]
    cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1), axis=-1)
    sorted_remove = cum_probs > top_p
    sorted_remove = sorted_remove.at[..., 0].set(False)
    # Scatter the removal mask back to vocab order.
    remove = jnp.zeros_like(sorted_remove)
    remove = jax.vmap(lambda r, idx, rem: r.at[idx].set(rem))(remove, sorted_idx, sorted_remove)
    return jnp.where(remove, -jnp.inf, logits)


def apply_top_k(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Pivot filter (``utils.py:43-46``)."""
    v = jax.lax.top_k(logits, top_k)[0]
    pivot = v[..., -1:]
    return jnp.where(logits < pivot, -jnp.inf, logits)


def logits_to_probs(
    logits: jnp.ndarray,
    previous_tokens: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    repetition_penalty: float = 1.0,
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    if previous_tokens is not None and repetition_penalty != 1.0:
        logits = apply_repetition_penalty(logits, previous_tokens, repetition_penalty)
    if top_p is not None and top_p < 1.0:
        logits = apply_top_p(logits, top_p)
    logits = logits / max(temperature, 1e-5)
    if top_k is not None:
        logits = apply_top_k(logits, min(top_k, logits.shape[-1]))
    return jax.nn.softmax(logits, axis=-1)


def gumbel_argmax(rng: jax.Array, probs: jnp.ndarray) -> jnp.ndarray:
    """Multinomial draw without host sync (``utils.py:5-9``): the reference
    computes argmax(probs / q), q ~ Exp(1); equivalently argmax(log p + G),
    G ~ Gumbel(0, 1)."""
    g = jax.random.gumbel(rng, probs.shape, dtype=jnp.float32)
    return gumbel_argmax_with_noise(probs, g)


def gumbel_argmax_with_noise(probs: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Same draw with the Gumbel noise supplied by the caller — lets decode
    loops draw ONE [n_steps, B, V] tensor per dispatch instead of paying a
    per-step threefry (measured ~0.2 ms/step at B=4 on v5e)."""
    logp = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-38)), -jnp.inf)
    return jnp.argmax(logp + g, axis=-1)


def sample(
    rng: jax.Array,
    logits: jnp.ndarray,
    previous_tokens: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    repetition_penalty: float = 1.0,
):
    """Returns (next_token [B], probs [B, V])."""
    probs = logits_to_probs(
        logits,
        previous_tokens=previous_tokens,
        temperature=temperature,
        top_k=top_k,
        top_p=top_p,
        repetition_penalty=repetition_penalty,
    )
    idx = gumbel_argmax(rng, probs)
    return idx, probs
