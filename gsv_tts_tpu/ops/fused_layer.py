"""Fused t2s decode-layer Pallas kernel (experimental, not the default).

Measured on v5e (flagship config, S=512): 0.615 ms/tok for the XLA+flash
path vs 1.305 ms/tok fused — the monolithic kernel serializes its weight
DMAs (inputs are staged to VMEM before the body runs) while XLA pipelines
weight streaming across op boundaries.  Kept in-tree as a correct, tested
baseline for a future weight-double-buffered whole-step kernel (see PLAN.md);
enable with ``attn_impl="fused"``.

One kernel launch computes an ENTIRE transformer block for one token:
qkv projection → decode attention with online softmax over the valid cache
prefix → output projection → post-LN → MLP → post-LN.  The XLA path runs the
same math as ~5 kernels per layer; on v5e the per-kernel scheduling overhead
dominates the decode step (ablation in CLAUDE.md), so fusing the layer buys
most of the gap to the weight-streaming floor.

Mosaic-friendly design (everything stays 2D — the lane dim is never split):
  * caches are viewed as ``[L, B, S, D]`` (a free reshape of the engine's
    ``[L, B, S, H, Dh]`` layout at the jit level) and are *read-only* inside
    the kernel; the one-row K/V append is returned to XLA and scattered
    outside (a ~2 µs op that Mosaic's tiled-slice rules would otherwise
    complicate);
  * per-head score/weight reductions run through a constant 0/1
    *head-pooling* matrix ``P [D, H]`` on the MXU:
    ``scores = (k_blk * q) @ P``; head-broadcasts use ``@ P.T``;
  * the current token's K/V never round-trips through HBM — the online
    softmax folds it in from registers;
  * the cache walk reads ``ceil(kv_len/block)`` blocks via ``fori_loop`` —
    HBM traffic scales with the true length (flash-decode semantics);
  * matmuls accumulate in f32 on the MXU; layernorms run in f32.

``kv_len`` [B] is the new token's position (attends to ``s <= kv_len``).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BLOCK_S = 128
NEG = -1e30


def _kernel(scalar_ref,  # scalar prefetch: [layer, kv_len[0..B-1]]
            x_ref, qkv_w_ref, qkv_b_ref, out_w_ref, out_b_ref,
            ln1_g_ref, ln1_b_ref, mlp1_w_ref, mlp1_b_ref,
            mlp2_w_ref, mlp2_b_ref, ln2_g_ref, ln2_b_ref,
            pool_ref, poolT_ref, k_in_ref, v_in_ref,
            x_out_ref, k_new_ref, v_new_ref,
            kv_vmem, sem, acc_ref, m_ref, l_ref,
            *, B, S, H, D, block_s, eps=1e-5):
    layer = scalar_ref[0]

    x = x_ref[:].astype(F32)  # [B, D]
    pool = pool_ref[:]        # [D, H] 0/1 head-pooling matrix (f32)
    poolT = poolT_ref[:]      # [H, D]

    # ---- qkv projection (MXU, f32 accumulate) ----
    qkv = jnp.dot(x_ref[:], qkv_w_ref[:], preferred_element_type=F32)
    qkv = qkv + qkv_b_ref[:].astype(F32)[None, :]
    q = qkv[:, :D]            # [B, D]
    k_new = qkv[:, D:2 * D]
    v_new = qkv[:, 2 * D:]
    k_new_ref[:] = k_new.astype(k_new_ref.dtype)
    v_new_ref[:] = v_new.astype(v_new_ref.dtype)

    # ---- decode attention: blocked online softmax over [0, kv_len) plus the
    #      fresh token straight from registers ----
    scale = 1.0 / math.sqrt(D // H)
    rows = []
    for b in range(B):
        length = scalar_ref[b + 1]  # entries strictly below the new token
        qb = q[b:b + 1]             # [1, D] f32

        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        n_blocks = pl.cdiv(length, block_s)

        def body(i, _, _b=b, _q=qb):
            start = i * block_s
            ck = pltpu.make_async_copy(
                k_in_ref.at[layer, _b, pl.ds(start, block_s)],
                kv_vmem.at[0], sem.at[0])
            cv = pltpu.make_async_copy(
                v_in_ref.at[layer, _b, pl.ds(start, block_s)],
                kv_vmem.at[1], sem.at[1])
            ck.start()
            cv.start()
            ck.wait()
            cv.wait()
            kb = kv_vmem[0].astype(F32)  # [block, D]
            vb = kv_vmem[1].astype(F32)
            scores = jnp.dot(kb * _q, pool,
                             preferred_element_type=F32) * scale  # [block, H]
            sidx = jax.lax.broadcasted_iota(jnp.int32, (block_s, 1), 0) + start
            valid = sidx < length
            scores = jnp.where(valid, scores, NEG)
            m_prev = m_ref[0]
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0))
            corr = jnp.exp(m_prev - m_new)
            p = jnp.where(valid, jnp.exp(scores - m_new[None, :]), 0.0)
            l_ref[0] = l_ref[0] * corr + jnp.sum(p, axis=0)
            p_exp = jnp.dot(p, poolT, preferred_element_type=F32)  # [block, D]
            corr_exp = jnp.dot(corr[None, :], poolT, preferred_element_type=F32)
            acc_ref[:] = acc_ref[:] * corr_exp + jnp.sum(p_exp * vb, axis=0,
                                                         keepdims=True)
            m_ref[0] = m_new
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

        # fold in the current token (score = q·k_new per head)
        s_self = jnp.dot(qb * k_new[b:b + 1], pool,
                         preferred_element_type=F32)[0] * scale  # [H]
        m_prev = m_ref[0]
        m_new = jnp.maximum(m_prev, s_self)
        corr = jnp.exp(m_prev - m_new)
        p_self = jnp.exp(s_self - m_new)
        l = l_ref[0] * corr + p_self
        corr_exp = jnp.dot(corr[None, :], poolT, preferred_element_type=F32)
        pself_exp = jnp.dot(p_self[None, :], poolT, preferred_element_type=F32)
        acc = acc_ref[:] * corr_exp + pself_exp * v_new[b:b + 1]
        l_exp = jnp.dot(l[None, :], poolT, preferred_element_type=F32)
        rows.append(acc / l_exp)

    attn = rows[0] if B == 1 else jnp.concatenate(rows, axis=0)  # [B, D] f32

    # ---- output projection + residual + LN1 (f32) ----
    h = jnp.dot(attn.astype(x_ref.dtype), out_w_ref[:], preferred_element_type=F32)
    h = x + h + out_b_ref[:].astype(F32)[None, :]
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mean) ** 2, axis=-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + eps) * ln1_g_ref[:].astype(F32)[None, :] \
        + ln1_b_ref[:].astype(F32)[None, :]

    # ---- MLP + residual + LN2 ----
    hc = h.astype(x_ref.dtype)
    m1 = jnp.dot(hc, mlp1_w_ref[:], preferred_element_type=F32)
    m1 = jnp.maximum(m1 + mlp1_b_ref[:].astype(F32)[None, :], 0.0)
    m2 = jnp.dot(m1.astype(x_ref.dtype), mlp2_w_ref[:], preferred_element_type=F32)
    h2 = h + m2 + mlp2_b_ref[:].astype(F32)[None, :]
    mean = jnp.mean(h2, axis=-1, keepdims=True)
    var = jnp.mean((h2 - mean) ** 2, axis=-1, keepdims=True)
    out = (h2 - mean) * jax.lax.rsqrt(var + eps) * ln2_g_ref[:].astype(F32)[None, :] \
        + ln2_b_ref[:].astype(F32)[None, :]
    x_out_ref[:] = out.astype(x_out_ref.dtype)


@functools.lru_cache(maxsize=8)
def _head_pool_np(D: int, H: int):
    p = np.zeros((D, H), np.float32)
    dh = D // H
    for h in range(H):
        p[h * dh:(h + 1) * dh, h] = 1.0
    return p, p.T.copy()


def _head_pool(D: int, H: int):
    # NOTE: convert to jnp per call — caching jnp values would leak traced
    # constants between jit traces (UnexpectedTracerError)
    p, pt = _head_pool_np(D, H)
    return jnp.asarray(p), jnp.asarray(pt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decode_layer(x, lp, k_cache, v_cache, kv_len, layer,
                       interpret: bool = False):
    """x [B, D]; lp = per-layer param dict (unstacked); caches are the FULL
    stacked [L, B, S, H, Dh] buffers (the ``layer`` scalar selects the slice
    inside the kernel, read-only; the new K/V row is scattered by XLA).
    Returns (x_out, k_cache, v_cache)."""
    B, D = x.shape
    L, _, S, H, Dh = k_cache.shape
    block_s = min(BLOCK_S, S)

    kc2 = k_cache.reshape(L, B, S, D)  # free: contiguous dims
    vc2 = v_cache.reshape(L, B, S, D)
    pool, poolT = _head_pool(D, H)

    kernel = functools.partial(_kernel, B=B, S=S, H=H, D=D, block_s=block_s)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pltpu.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[vmem] * 15 + [any_, any_],
        out_specs=[vmem, vmem, vmem],
        scratch_shapes=[
            pltpu.VMEM((2, block_s, D), k_cache.dtype),  # KV block buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, D), F32),                      # acc
            pltpu.VMEM((1, H), F32),                      # running max
            pltpu.VMEM((1, H), F32),                      # running denom
        ],
    )

    scalars = jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                               kv_len.astype(jnp.int32)])

    x_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D), x.dtype),
            jax.ShapeDtypeStruct((B, D), k_cache.dtype),
            jax.ShapeDtypeStruct((B, D), v_cache.dtype),
        ],
        interpret=interpret,
    )(scalars, x, lp["qkv_w"], lp["qkv_b"], lp["out_w"],
      lp["out_b"], lp["ln1_g"], lp["ln1_b"], lp["mlp1_w"], lp["mlp1_b"],
      lp["mlp2_w"], lp["mlp2_b"], lp["ln2_g"], lp["ln2_b"],
      pool, poolT, kc2, vc2)

    bidx = jnp.arange(B)
    if isinstance(layer, int):
        k_cache = k_cache.at[layer, bidx, kv_len].set(k_new.reshape(B, H, Dh))
        v_cache = v_cache.at[layer, bidx, kv_len].set(v_new.reshape(B, H, Dh))
    else:
        k_cache = k_cache.at[layer, bidx, kv_len].set(k_new.reshape(B, H, Dh))
        v_cache = v_cache.at[layer, bidx, kv_len].set(v_new.reshape(B, H, Dh))
    return x_out, k_cache, v_cache
