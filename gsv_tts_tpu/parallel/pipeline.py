"""Pipeline-parallel t2s training (GPipe schedule over a ``("dp", "pp")``
mesh).

The reference ships no training code and no multi-device runtime (SURVEY
§2.8); ``parallel/train.py`` already covers dp × tp via GSPMD.  This module
adds the third TPU scaling axis — **pipeline parallelism over the layer
stack** — for models/batches where tensor parallelism stops paying (tp
collectives every matmul) but the layer stack still doesn't fit, or where
ICI topology favours a ring:

  * the stacked-layer param pytree ``[L, ...]`` (``models/t2s.py:95``) is
    sharded on its leading axis over ``pp`` — stage ``s`` holds layers
    ``[s·L/pp, (s+1)·L/pp)`` and nothing else;
  * a ``jax.shard_map`` step runs the classic GPipe microbatch schedule:
    ``n_micro + pp − 1`` ticks, stage ``s`` processing microbatch ``t − s``
    at tick ``t``, activations hopping one stage per tick over
    ``lax.ppermute`` (ICI neighbour traffic only — no all-to-all);
  * autodiff differentiates straight through the tick scan: the transpose
    of ``ppermute`` is the reverse permute, so the backward pass is the
    mirrored pipeline with no hand-written communication;
  * ``dp`` composes orthogonally (batch sharded on the leading axis,
    gradient ``psum`` over ``dp``).

This is deliberately ``shard_map`` + explicit collectives rather than GSPMD
annotations: a pipeline schedule is a *program*, not a layout — the compiler
cannot be left to discover the microbatch skew, and the scaling-book recipe
for pp is exactly this ppermute ring.

Numerics match the dense step (``parallel/train.py:make_train_step``) up to
f32 summation order; ``tests/test_pipeline.py`` pins loss and one-step
params against the single-device oracle.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import t2s as t2s_model
from ..models.t2s import T2SConfig

F32 = jnp.float32


def make_mesh_dp_pp(n_devices: Optional[int] = None, dp: Optional[int] = None,
                    pp: Optional[int] = None) -> Mesh:
    """``("dp", "pp")`` mesh: defaults to the deepest pipeline that divides
    the device count (pp rides the ICI ring; dp is the outer axis)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if pp is None and dp is None:
        pp = 1
        for cand in (8, 4, 2, 1):
            if n % cand == 0 and cand <= n:
                pp = cand
                break
        dp = n // pp
    elif pp is None:
        pp = n // dp
    elif dp is None:
        dp = n // pp
    assert dp * pp == n, f"dp({dp}) * pp({pp}) != n_devices({n})"
    return Mesh(np.asarray(devices).reshape(dp, pp), ("dp", "pp"))


def pp_param_sharding(mesh: Mesh):
    """Layer stack sharded on its leading ``[L]`` axis over ``pp``;
    embeddings / head / norm scalars replicated."""
    rep = NamedSharding(mesh, P())
    stage = NamedSharding(mesh, P("pp"))
    return {
        "text_emb": rep, "audio_emb": rep,
        "bert_proj_w": rep, "bert_proj_b": rep,
        "text_pos_alpha": rep, "audio_pos_alpha": rep,
        "predict_w": rep, "pe": rep,
        "layers": {
            k: stage for k in ("qkv_w", "qkv_b", "out_w", "out_b",
                               "ln1_g", "ln1_b", "ln2_g", "ln2_b",
                               "mlp1_w", "mlp1_b", "mlp2_w", "mlp2_b")
        },
    }


def _param_pspec():
    stage = P("pp")
    rep = P()
    return {
        "text_emb": rep, "audio_emb": rep,
        "bert_proj_w": rep, "bert_proj_b": rep,
        "text_pos_alpha": rep, "audio_pos_alpha": rep,
        "predict_w": rep, "pe": rep,
        "layers": {
            k: stage for k in ("qkv_w", "qkv_b", "out_w", "out_b",
                               "ln1_g", "ln1_b", "ln2_g", "ln2_b",
                               "mlp1_w", "mlp1_b", "mlp2_w", "mlp2_b")
        },
    }


def shard_pp_params(params, mesh: Mesh):
    return jax.tree.map(jax.device_put, params, pp_param_sharding(mesh))


def make_pp_train_step(cfg: T2SConfig, optimizer: optax.GradientTransformation,
                       mesh: Mesh, n_micro: int, dtype=jnp.bfloat16,
                       remat: bool = False):
    """Returns a jittable ``(params, opt_state, batch) -> (params, opt_state,
    loss)`` GPipe step.  ``batch`` is the ``parallel/train.py:pad_batch``
    dict; its global batch must divide ``dp * n_micro``.

    The optimizer runs OUTSIDE the ``shard_map`` (plain GSPMD jit): the
    global-norm clip in ``make_optimizer`` then reduces over the full
    logically-global gradient pytree, including across pp layer shards —
    running it per-stage would clip each stage by its own norm.
    """
    pp = mesh.shape["pp"]
    dp = mesh.shape["dp"]
    assert cfg.num_layers % pp == 0, (
        f"num_layers={cfg.num_layers} must divide pp={pp}")
    pspec = _param_pspec()
    bspec = {k: P("dp") for k in ("x_ids", "y_ids", "bert", "x_lens",
                                  "y_lens")}

    def pipeline_nll(p_local, batch):
        """Per-device (stage) GPipe forward: returns LOCAL (nll_sum, count)
        — nonzero only on the last stage, whose devices see every
        microbatch's logits."""
        stage = jax.lax.axis_index("pp")
        x_ids, y_ids = batch["x_ids"], batch["y_ids"]
        x_lens, y_lens = batch["x_lens"], batch["y_lens"]
        B, Ly = y_ids.shape
        assert B % n_micro == 0, (
            f"local batch {B} (global/{dp}) must divide n_micro={n_micro}")
        mb = B // n_micro

        xy_pos, mask, _ = t2s_model.embed_prompt_batch(
            p_local, cfg, x_ids, y_ids, batch["bert"], x_lens, y_lens, dtype)
        T, D = xy_pos.shape[1], xy_pos.shape[2]

        # labels / loss mask — identical to parallel/train.py:t2s_loss
        pos = jnp.arange(T)[None, :]
        in_audio = (pos >= x_lens[:, None]) & (pos < (x_lens + y_lens)[:, None])
        t_in_audio = jnp.clip(pos - x_lens[:, None], 0, Ly - 1)
        next_t = jnp.clip(t_in_audio + 1, 0, Ly - 1)
        y_next = jnp.take_along_axis(y_ids, next_t, axis=1)
        is_last = pos == (x_lens + y_lens)[:, None] - 1
        labels = jnp.where(is_last, cfg.eos, y_next)

        emb_m = xy_pos.reshape(n_micro, mb, T, D)
        mask_m = mask.reshape(n_micro, mb, T, T)
        labels_m = labels.reshape(n_micro, mb, T)
        ia_m = in_audio.reshape(n_micro, mb, T)

        def apply_stage(x, attn_mask):
            def body(h, lp):
                h, _, _ = t2s_model._block_prefill(
                    h, lp, attn_mask, cfg.num_heads)
                return h, None
            h, _ = jax.lax.scan(body, x, p_local["layers"])
            return h

        if remat:
            apply_stage = jax.checkpoint(apply_stage)

        perm = [(i, i + 1) for i in range(pp - 1)]
        n_ticks = n_micro + pp - 1
        last = pp - 1

        def tick(carry, t):
            recv, nll, cnt = carry
            # stage s processes microbatch t - s at tick t (clipped indices
            # outside the valid window recompute a real microbatch; their
            # results are never accumulated and never reach a valid slot)
            i_mine = jnp.clip(t - stage, 0, n_micro - 1)
            inp = jnp.where(stage == 0,
                            jax.lax.dynamic_index_in_dim(emb_m, i_mine, 0,
                                                         keepdims=False),
                            recv)
            attn_mask = jax.lax.dynamic_index_in_dim(mask_m, i_mine, 0,
                                                     keepdims=False)
            out = apply_stage(inp, attn_mask)
            send = jax.lax.ppermute(out, "pp", perm)

            # last stage: accumulate CE over microbatch t - (pp-1).  The
            # logits matmul runs (masked) on every stage — [mb, T, V] at
            # V≈1k is noise next to the block stack, and masked compute
            # keeps the SPMD program free of device-varying control flow.
            i_out = jnp.clip(t - last, 0, n_micro - 1)
            lbl = jax.lax.dynamic_index_in_dim(labels_m, i_out, 0,
                                               keepdims=False)
            ia = jax.lax.dynamic_index_in_dim(ia_m, i_out, 0, keepdims=False)
            logits = (out @ p_local["predict_w"]).astype(F32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll_el = -jnp.take_along_axis(logp, lbl[:, :, None], axis=2)[..., 0]
            valid = (stage == last) & (t >= last)
            take = ia & valid
            nll = nll + jnp.sum(jnp.where(take, nll_el, 0.0))
            cnt = cnt + jnp.sum(take)
            return (send, nll, cnt), None

        # the carry is device-varying (each stage holds a different
        # microbatch's activation); mark the initial zeros accordingly
        carry0 = jax.lax.pcast(
            (jnp.zeros((mb, T, D), xy_pos.dtype), jnp.float32(0.0),
             jnp.int32(0)), ("dp", "pp"), to="varying")
        (_, nll, cnt), _ = jax.lax.scan(tick, carry0, jnp.arange(n_ticks))
        return nll, cnt

    def per_device(p_local, batch):
        (nll, cnt), g = jax.value_and_grad(
            lambda p: pipeline_nll(p, batch), has_aux=True)(p_local)
        tot = jax.lax.psum(nll, ("dp", "pp"))
        c = jnp.maximum(jax.lax.psum(cnt, ("dp", "pp")), 1).astype(F32)
        loss = tot / c
        # NO manual gradient psums: under vma-tracked shard_map autodiff the
        # transpose of the implicit ``pvary`` promotion IS the cross-replica
        # psum, so ``g`` already arrives fully reduced over every axis each
        # param is unvarying on (layer shards: summed over dp; replicated
        # leaves: summed over dp AND pp).  Adding psums here double-counts
        # (measured ×dp / ×dp·pp).  Only the token-mean normalization
        # remains.
        g = jax.tree.map(lambda t: t / c, g)
        return loss, g

    grad_fn = jax.shard_map(per_device, mesh=mesh, in_specs=(pspec, bspec),
                            out_specs=(P(), pspec))

    def step(params, opt_state, batch):
        loss, grads = grad_fn(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
