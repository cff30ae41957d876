"""Pallas prefill attention with the t2s hybrid mask.

Replaces the XLA SDPA prefill (``models/t2s.py:_block_prefill``), which
materializes [B, H, T, T] f32 scores in HBM per layer (16 MB at T=512 —
~1.5 GB of score traffic over 24 layers).  This kernel keeps each query
tile's scores in VMEM: one program handles a [BQ, Dh] query block against
the full [T, Dh] K/V of its (batch, head), applying the hybrid prompt mask
(reference ``t2s_model.py:334-349``) from per-row length scalars:

    row r attends col c  iff  (r < xl ? c < xl : c ≤ r)  and  c < xyl

i.e. the phoneme block is bidirectional and never looks at audio; audio
rows are causal over everything valid; padding columns are dead.  Pad rows
(r ≥ xyl) attend all valid columns — same as the XLA mask, so no NaN rows.

T and Dh are small (≤1024, 32), so K/V live whole in VMEM per program and
a single-pass softmax suffices (no online rescaling needed).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
NEG = -1e30
BQ = 128


def _kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *, T, Dh, B, H, bq):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    b = bh // H
    xl = lens_ref[b]
    xyl = lens_ref[B + b]
    scale = 1.0 / math.sqrt(Dh)

    q = q_ref[0].astype(F32)  # [bq, Dh]
    k = k_ref[0].astype(F32)  # [T, Dh]
    v = v_ref[0].astype(F32)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=F32) * scale  # [bq, T]

    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, T), 0) + qi * bq
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, T), 1)
    # pure and/or of comparisons — a `jnp.where` with BOOLEAN branches
    # lowers to an i8→i1 trunci Mosaic cannot compile (real-TPU only;
    # interpret mode accepts it).  Equivalent form: phoneme rows
    # (r < xl) hit only the first clause; audio/pad rows add causal cols.
    valid = ((cols < xl) | ((rows >= xl) & (cols <= rows))) & (cols < xyl)
    scores = jnp.where(valid, scores, NEG)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot((p / l).astype(v_ref.dtype).astype(F32), v,
                preferred_element_type=F32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def flash_prefill_attention(q, k, v, x_lens, xy_lens, *, num_heads,
                            interpret: bool = False):
    """q/k/v: [B, T, H, Dh]; x_lens/xy_lens: [B] i32.  Returns [B, T, H*Dh]
    attention output under the hybrid prompt mask."""
    B, T, H, Dh = q.shape
    assert H == num_heads
    bq = min(BQ, T)

    def heads_first(t):
        return jnp.swapaxes(t, 1, 2).reshape(B * H, T, Dh)

    lens = jnp.concatenate([x_lens.astype(jnp.int32).reshape(B),
                            xy_lens.astype(jnp.int32).reshape(B)])
    kernel = functools.partial(_kernel, T=T, Dh=Dh, B=B, H=H, bq=bq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, pl.cdiv(T, bq)),
        in_specs=[
            # index maps receive the scalar-prefetch ref as a trailing arg
            pl.BlockSpec((1, bq, Dh), lambda bh, qi, lens: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dh), lambda bh, qi, lens: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Dh), lambda bh, qi, lens: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, Dh), lambda bh, qi, lens: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, T, Dh), q.dtype),
        interpret=interpret,
    )(lens, heads_first(q), heads_first(k), heads_first(v))
    # [B*H, T, Dh] → [B, T, H*Dh]
    return jnp.swapaxes(out.reshape(B, H, T, Dh), 1, 2).reshape(B, T, H * Dh)
