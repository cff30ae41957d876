"""Pallas flash decode-attention for the t2s KV cache.

TPU-native analogue of the reference's ``flash_attn_with_kvcache`` decode path
(``t2s_model_flash_attn.py:80-88``): single-query attention of the current
token against the per-layer KV cache with *per-slot dynamic lengths*.

Why a kernel instead of XLA SDPA: the XLA path materializes scores over the
full cache bucket ``S`` and masks — every step reads the whole ``[S, H, Dh]``
K and V buffers from HBM even when only ``kv_len ≪ S`` entries are valid.
This kernel walks the cache in 128-row blocks with an online softmax and
*clamps the block index map* past the valid length, so trailing blocks are
never DMA'd: HBM traffic scales with ``kv_len`` instead of the bucket size
(the same effect the reference gets from ``cache_seqlens``).

Layout: q [B, H, Dh], caches [B, S, H, Dh] (S on the sublane-tiled axis),
``kv_len`` [B] int32 — position of the current token (the kernel attends to
``kv_len + 1`` entries, matching ``s <= kv_len`` in the XLA path).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32

BLOCK_S = 128
NEG_INF = -1e30


def _kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
            *, block_s: int, n_blocks: int, scale: float):
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    length = kv_len_ref[b] + 1  # current token included
    start = i * block_s

    @pl.when(start < length)
    def _block():
        q = q_ref[0].astype(F32)          # [H, Dh]
        k = k_ref[0].astype(F32)          # [block, H, Dh]
        v = v_ref[0].astype(F32)          # [block, H, Dh]

        scores = jnp.sum(k * q[None, :, :], axis=-1) * scale  # [block, H]
        sidx = jax.lax.broadcasted_iota(jnp.int32, (block_s, 1), 0) + start
        valid = sidx < length
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_scr[0]                                  # [H]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new[None, :])
        p = jnp.where(valid, p, 0.0)

        l_scr[0] = l_scr[0] * corr + jnp.sum(p, axis=0)
        acc_scr[:] = acc_scr[:] * corr[:, None] + jnp.sum(
            p[:, :, None] * v, axis=0)
        m_scr[0] = m_new

    @pl.when(i == n_blocks - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[0][:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                           v_cache: jnp.ndarray, kv_len: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Single-token decode attention over the KV cache.

    q [B, H, Dh]; k_cache/v_cache [B, S, H, Dh]; kv_len [B] (current token's
    position; entries ``s <= kv_len`` attended).  Returns [B, H, Dh].
    """
    B, H, Dh = q.shape
    S = k_cache.shape[1]
    block_s = min(BLOCK_S, S)
    n_blocks = pl.cdiv(S, block_s)
    scale = 1.0 / math.sqrt(Dh)

    kv_len = kv_len.astype(jnp.int32)

    def kv_index_map(b, i, kv_len_ref):
        # clamp past the valid region: repeated index ⇒ no new DMA
        last_needed = jax.lax.div(kv_len_ref[b], block_s)
        return (b, jnp.minimum(i, last_needed), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, H, Dh), lambda b, i, s: (b, 0, 0)),
            pl.BlockSpec((1, block_s, H, Dh), kv_index_map),
            pl.BlockSpec((1, block_s, H, Dh), kv_index_map),
        ],
        out_specs=pl.BlockSpec((1, H, Dh), lambda b, i, s: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, H), F32),   # running max
            pltpu.VMEM((1, H), F32),   # running denominator
            pltpu.VMEM((H, Dh), F32),  # output accumulator
        ],
    )

    kernel = functools.partial(_kernel, block_s=block_s, n_blocks=n_blocks,
                               scale=scale)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), q.dtype),
        interpret=interpret,
    )(kv_len, q, k_cache, v_cache)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_decode_attention_layered(q: jnp.ndarray, k_cache: jnp.ndarray,
                                   v_cache: jnp.ndarray, kv_len: jnp.ndarray,
                                   layer: jnp.ndarray,
                                   interpret: bool = False) -> jnp.ndarray:
    """Like :func:`flash_decode_attention` but reads one layer's blocks
    straight out of the *full stacked cache* ``[L, B, S, H, Dh]`` — no
    layer-slice materialization between the cache buffer and the kernel
    (``layer`` is a scalar int32 selected via the block index map)."""
    B, H, Dh = q.shape
    S = k_cache.shape[2]
    block_s = min(BLOCK_S, S)
    n_blocks = pl.cdiv(S, block_s)
    scale = 1.0 / math.sqrt(Dh)

    scalars = jnp.concatenate([layer.reshape(1).astype(jnp.int32),
                               kv_len.astype(jnp.int32)])

    def kv_index_map(b, i, scalar_ref):
        last_needed = jax.lax.div(scalar_ref[b + 1], block_s)
        return (scalar_ref[0], b, jnp.minimum(i, last_needed), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, H, Dh), lambda b, i, s: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_s, H, Dh), kv_index_map),
            pl.BlockSpec((1, 1, block_s, H, Dh), kv_index_map),
        ],
        out_specs=pl.BlockSpec((1, H, Dh), lambda b, i, s: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, H), F32),
            pltpu.VMEM((1, H), F32),
            pltpu.VMEM((H, Dh), F32),
        ],
    )

    def kernel5(scalar_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        # k_ref/v_ref blocks arrive as [1, 1, block, H, Dh]
        class _KvView:
            def __getitem__(self, b):
                return scalar_ref[b + 1]

        class _Squeeze:
            def __init__(self, ref):
                self._ref = ref

            def __getitem__(self, idx):
                return self._ref[0, idx]

            @property
            def dtype(self):
                return self._ref.dtype

        _kernel(_KvView(), q_ref, _Squeeze(k_ref), _Squeeze(v_ref), o_ref,
                m_scr, l_scr, acc_scr, block_s=block_s, n_blocks=n_blocks,
                scale=scale)

    return pl.pallas_call(
        kernel5,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), q.dtype),
        interpret=interpret,
    )(scalars, q, k_cache, v_cache)


def xla_decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                         v_cache: jnp.ndarray, kv_len: jnp.ndarray) -> jnp.ndarray:
    """Masked-SDPA fallback (the default path in ``models/t2s.py``)."""
    Dh = q.shape[-1]
    S = k_cache.shape[1]
    scores = jnp.einsum("bhd,bshd->bhs", q, k_cache, preferred_element_type=F32)
    scores = scores / math.sqrt(Dh)
    valid = jnp.arange(S)[None, :] <= kv_len[:, None]
    scores = jnp.where(valid[:, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhs,bshd->bhd", probs, v_cache)
