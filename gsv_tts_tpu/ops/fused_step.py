"""Whole-step fused decode kernel: all transformer layers in ONE launch.

The v1 per-layer fused kernel (``ops/fused_layer.py``) lost to XLA because a
monolithic pallas_call stages its VMEM inputs *before* the body runs — weight
DMA serialized with compute.  This kernel fixes that structurally: the
stacked layer weights stay in HBM (`ANY`) and the kernel *double-buffers*
them — while layer ``i`` computes, layer ``i+1``'s 12 weight tensors stream
into the alternate VMEM slot.  Per-token cost approaches
``max(weight-DMA, compute)`` ≈ the HBM floor.

Scope: B = 1 (the latency-critical streaming path; batched decode keeps the
XLA path).  The per-layer K/V rows are emitted as ``[L, D]`` outputs and
appended by a single XLA scatter outside (attention folds the current token
from registers, so the append is not on the critical path).

All tensors stay 2D for Mosaic (see ``fused_layer.py``: head reductions via
the 0/1 pooling matmul).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_layer import _head_pool

F32 = jnp.float32
BLOCK_S = 128
NEG = -1e30

# order of the streamed per-layer tensors
_WNAMES = ("qkv_w", "qkv_b", "out_w", "out_b", "ln1_g", "ln1_b",
           "mlp1_w", "mlp1_b", "mlp2_w", "mlp2_b", "ln2_g", "ln2_b")


def _kernel(scalar_ref,  # [kv_len]
            x_ref, pool_ref, poolT_ref,
            # 12 stacked weight refs (ANY/HBM)
            qkv_w_ref, qkv_b_ref, out_w_ref, out_b_ref, ln1_g_ref, ln1_b_ref,
            mlp1_w_ref, mlp1_b_ref, mlp2_w_ref, mlp2_b_ref, ln2_g_ref, ln2_b_ref,
            k_in_ref, v_in_ref,
            # outputs
            x_out_ref, k_new_ref, v_new_ref,
            # scratch: double-buffered weights (12 × [2, ...]), kv walk, sems
            w_qkv_w, w_out_w, w_mlp1_w, w_mlp2_w,
            kv_vmem, x_scr, knew_stage, vnew_stage, w_sem, kv_sem, kvout_sem,
            *, L, S, H, D, block_s, eps=1e-5):
    length = scalar_ref[0]  # kv_len: entries strictly below the new token
    scale = 1.0 / math.sqrt(D // H)
    pool = pool_ref[:]
    poolT = poolT_ref[:]

    # only the four big matrices stream per layer; the small vector params
    # (biases, layernorm gains) live whole in VMEM and are value-indexed
    hbm = (qkv_w_ref, out_w_ref, mlp1_w_ref, mlp2_w_ref)
    buf = (w_qkv_w, w_out_w, w_mlp1_w, w_mlp2_w)

    def start_layer_load(layer, slot):
        for j, (src, dst) in enumerate(zip(hbm, buf)):
            pltpu.make_async_copy(src.at[layer], dst.at[slot],
                                  w_sem.at[slot, j]).start()

    def wait_layer_load(slot):
        for j, (src, dst) in enumerate(zip(hbm, buf)):
            pltpu.make_async_copy(src.at[0], dst.at[slot],
                                  w_sem.at[slot, j]).wait()

    # prime the pipeline with layer 0
    start_layer_load(0, 0)
    x_scr[:] = x_ref[:].astype(F32)

    def layer_body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        # stream next layer's weights while this one computes
        @pl.when(i + 1 < L)
        def _():
            start_layer_load(i + 1, nxt)

        wait_layer_load(slot)

        x = x_scr[:]  # [1, D] f32
        xc = x.astype(k_in_ref.dtype)

        qkv = jnp.dot(xc, w_qkv_w[slot], preferred_element_type=F32)
        qkv = qkv + qkv_b_ref[i][0:1].astype(F32)
        q = qkv[:, :D]
        k_new = qkv[:, D:2 * D]
        v_new = qkv[:, 2 * D:]
        # emit the new K/V row for this layer via DMA staging (VMEM slice
        # stores of single rows violate Mosaic tiling; HBM dst slicing is fine)
        slot_kv = jax.lax.rem(i, 2)

        @pl.when(i >= 2)
        def _wait_stage():
            pltpu.make_async_copy(knew_stage.at[slot_kv], k_new_ref.at[0],
                                  kvout_sem.at[slot_kv, 0]).wait()
            pltpu.make_async_copy(vnew_stage.at[slot_kv], v_new_ref.at[0],
                                  kvout_sem.at[slot_kv, 1]).wait()

        knew_stage[slot_kv] = jnp.broadcast_to(k_new.astype(k_new_ref.dtype), (2, D))
        vnew_stage[slot_kv] = jnp.broadcast_to(v_new.astype(v_new_ref.dtype), (2, D))
        pltpu.make_async_copy(knew_stage.at[slot_kv], k_new_ref.at[i],
                              kvout_sem.at[slot_kv, 0]).start()
        pltpu.make_async_copy(vnew_stage.at[slot_kv], v_new_ref.at[i],
                              kvout_sem.at[slot_kv, 1]).start()

        # --- blocked online-softmax attention over the cache prefix ---
        def scoped(acc_ref, m_ref, l_ref):
            m_ref[:] = jnp.full_like(m_ref, NEG)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)
            n_blocks = pl.cdiv(length, block_s)

            def blk(bi, _):
                start = bi * block_s
                ck = pltpu.make_async_copy(
                    k_in_ref.at[i, 0, pl.ds(start, block_s)], kv_vmem.at[0],
                    kv_sem.at[0])
                cv = pltpu.make_async_copy(
                    v_in_ref.at[i, 0, pl.ds(start, block_s)], kv_vmem.at[1],
                    kv_sem.at[1])
                ck.start()
                cv.start()
                ck.wait()
                cv.wait()
                kb = kv_vmem[0].astype(F32)
                vb = kv_vmem[1].astype(F32)
                scores = jnp.dot(kb * q, pool, preferred_element_type=F32) * scale
                sidx = jax.lax.broadcasted_iota(jnp.int32, (block_s, 1), 0) + start
                valid = sidx < length
                scores = jnp.where(valid, scores, NEG)
                m_prev = m_ref[0]
                m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0))
                corr = jnp.exp(m_prev - m_new)
                p = jnp.where(valid, jnp.exp(scores - m_new[None, :]), 0.0)
                l_ref[0] = l_ref[0] * corr + jnp.sum(p, axis=0)
                p_exp = jnp.dot(p, poolT, preferred_element_type=F32)
                corr_exp = jnp.dot(corr[None, :], poolT, preferred_element_type=F32)
                acc_ref[:] = acc_ref[:] * corr_exp + jnp.sum(
                    p_exp * vb, axis=0, keepdims=True)
                m_ref[0] = m_new
                return 0

            jax.lax.fori_loop(0, n_blocks, blk, 0)

            s_self = jnp.dot(q * k_new, pool, preferred_element_type=F32)[0] * scale
            m_prev = m_ref[0]
            m_new = jnp.maximum(m_prev, s_self)
            corr = jnp.exp(m_prev - m_new)
            p_self = jnp.exp(s_self - m_new)
            l = l_ref[0] * corr + p_self
            corr_exp = jnp.dot(corr[None, :], poolT, preferred_element_type=F32)
            pself_exp = jnp.dot(p_self[None, :], poolT, preferred_element_type=F32)
            acc = acc_ref[:] * corr_exp + pself_exp * v_new
            l_exp = jnp.dot(l[None, :], poolT, preferred_element_type=F32)

            h = jnp.dot((acc / l_exp).astype(k_in_ref.dtype), w_out_w[slot],
                        preferred_element_type=F32)
            h = x + h + out_b_ref[i][0:1].astype(F32)
            mean = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.mean((h - mean) ** 2, axis=-1, keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + eps) \
                * ln1_g_ref[i][0:1].astype(F32) + ln1_b_ref[i][0:1].astype(F32)

            m1 = jnp.dot(h.astype(k_in_ref.dtype), w_mlp1_w[slot],
                         preferred_element_type=F32)
            m1 = jnp.maximum(m1 + mlp1_b_ref[i][0:1].astype(F32), 0.0)
            m2 = jnp.dot(m1.astype(k_in_ref.dtype), w_mlp2_w[slot],
                         preferred_element_type=F32)
            h2 = h + m2 + mlp2_b_ref[i][0:1].astype(F32)
            mean = jnp.mean(h2, axis=-1, keepdims=True)
            var = jnp.mean((h2 - mean) ** 2, axis=-1, keepdims=True)
            x_scr[:] = (h2 - mean) * jax.lax.rsqrt(var + eps) \
                * ln2_g_ref[i][0:1].astype(F32) + ln2_b_ref[i][0:1].astype(F32)

        pl.run_scoped(
            scoped,
            acc_ref=pltpu.VMEM((1, D), F32),
            m_ref=pltpu.VMEM((1, H), F32),
            l_ref=pltpu.VMEM((1, H), F32),
        )
        return 0

    jax.lax.fori_loop(0, L, layer_body, 0)
    # drain the trailing K/V-row DMAs
    for slot in range(2):
        pltpu.make_async_copy(knew_stage.at[slot], k_new_ref.at[0],
                              kvout_sem.at[slot, 0]).wait()
        pltpu.make_async_copy(vnew_stage.at[slot], v_new_ref.at[0],
                              kvout_sem.at[slot, 1]).wait()
    x_out_ref[:] = x_scr[:].astype(x_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decode_step(x, layers, k_cache, v_cache, kv_len,
                      interpret: bool = False):
    """One token through ALL layers in a single kernel (B = 1).

    x [1, D]; layers = the engine's stacked params dict; caches
    [L, 1, S, H, Dh].  Returns (h_out [1, D], k_cache, v_cache) with the new
    K/V rows scattered in.
    """
    B, D = x.shape
    assert B == 1, "fused_decode_step is specialized for the B=1 latency path"
    L, _, S, H, Dh = k_cache.shape
    block_s = min(BLOCK_S, S)
    M = layers["mlp1_w"].shape[-1]
    dtype = k_cache.dtype

    kc2 = k_cache.reshape(L, B, S, D)
    vc2 = v_cache.reshape(L, B, S, D)
    pool, poolT = _head_pool(D, H)

    kernel = functools.partial(_kernel, L=L, S=S, H=H, D=D, block_s=block_s)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pltpu.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[vmem, vmem, vmem,
                  any_, vmem, any_, vmem, vmem, vmem,
                  any_, vmem, any_, vmem, vmem, vmem,
                  any_, any_],
        out_specs=[vmem, any_, any_],
        scratch_shapes=[
            pltpu.VMEM((2, D, 3 * D), dtype),    # qkv_w
            pltpu.VMEM((2, D, D), dtype),        # out_w
            pltpu.VMEM((2, D, M), dtype),        # mlp1_w
            pltpu.VMEM((2, M, D), dtype),        # mlp2_w
            pltpu.VMEM((2, block_s, D), dtype),  # kv walk buffer
            pltpu.VMEM((1, D), F32),             # activation carry
            pltpu.VMEM((2, 2, D), dtype),        # k_new staging
            pltpu.VMEM((2, 2, D), dtype),        # v_new staging
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    def as3(t, f32=False):
        # [L, 2, N]: padded second-minor row so whole-array VMEM staging is
        # tile-friendly; kernel value-indexes [i][0:1]
        arr = jnp.broadcast_to(t.reshape(L, 1, t.shape[-1]),
                               (L, 2, t.shape[-1]))
        return arr.astype(F32) if f32 else arr

    x_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, D), x.dtype),
            jax.ShapeDtypeStruct((L, 2, D), dtype),
            jax.ShapeDtypeStruct((L, 2, D), dtype),
        ],
        interpret=interpret,
    )(kv_len.astype(jnp.int32), x, pool, poolT,
      layers["qkv_w"], as3(layers["qkv_b"]),
      layers["out_w"], as3(layers["out_b"]),
      as3(layers["ln1_g"], True), as3(layers["ln1_b"], True),
      layers["mlp1_w"], as3(layers["mlp1_b"]),
      layers["mlp2_w"], as3(layers["mlp2_b"]),
      as3(layers["ln2_g"], True), as3(layers["ln2_b"], True),
      kc2, vc2)

    pos = kv_len.astype(jnp.int32)[0]
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_new[:, 0].reshape(L, 1, 1, H, Dh), (0, 0, pos, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_new[:, 0].reshape(L, 1, 1, H, Dh), (0, 0, pos, 0, 0))
    return x_out, k_cache, v_cache
