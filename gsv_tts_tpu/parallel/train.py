"""t2s training step (dp × tp sharded).

The reference ships no training code (SURVEY: inference-only); this module
adds a native TPU training capability for the stage-1 text-to-semantic
decoder: teacher-forced next-token cross-entropy over the audio block of the
packed [text | audio] prompt (the same hybrid-mask forward used at prefill,
``models/t2s.py:embed_prompt_batch``), AdamW via optax, sharded over a
``("dp", "tp")`` mesh with GSPMD-inserted collectives.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import t2s as t2s_model
from ..models.t2s import T2SConfig

F32 = jnp.float32


def t2s_loss(params, cfg: T2SConfig, x_ids, y_ids, bert, x_lens, y_lens,
             dtype=jnp.bfloat16, remat: bool = False, seq_mesh=None):
    """Next-semantic-token CE over the audio block (+EOS at the end).

    x_ids [B, Lx] phonemes, y_ids [B, Ly] target semantic tokens.
    The packed row is [x | y]; position ``x_len + t`` predicts ``y[t + 1]``
    (and the last valid position predicts EOS).

    ``remat=True`` rematerializes the transformer forward in the backward
    pass (``jax.checkpoint``) — trades ~1/3 more FLOPs for activation memory
    scaling O(L·√depth) instead of O(L·depth); use for long batches / big
    models on HBM-tight chips.
    """
    B, Ly = y_ids.shape
    xy_pos, mask, _ = t2s_model.embed_prompt_batch(
        params, cfg, x_ids, y_ids, bert, x_lens, y_lens, dtype)
    if seq_mesh is not None:
        # sequence parallelism, the GSPMD way: constrain the packed-prompt
        # activations to shard their TIME axis over ``tp`` (batch stays on
        # ``dp``) and let XLA place the attention all-gathers on ICI.  For
        # long-prompt training this bounds the [B, T, D] activation (and
        # the [B, H, T, T] score block) per chip; a parity test pins
        # loss/grads against the unsharded step.
        from jax.sharding import NamedSharding, PartitionSpec as SP

        xy_pos = jax.lax.with_sharding_constraint(
            xy_pos, NamedSharding(seq_mesh, SP("dp", "tp")))
    fwd = t2s_model.transformer_prefill
    if remat:
        fwd = jax.checkpoint(fwd, static_argnums=(1,))
    h, _, _ = fwd(params, cfg, xy_pos, mask)
    logits = (h @ params["predict_w"]).astype(F32)  # [B, T, V]

    T = xy_pos.shape[1]
    pos = jnp.arange(T)[None, :]
    # audio positions: x_len <= pos < x_len + y_len
    in_audio = (pos >= x_lens[:, None]) & (pos < (x_lens + y_lens)[:, None])
    # label at audio step t: y[t+1], or EOS at the last audio position
    t_in_audio = jnp.clip(pos - x_lens[:, None], 0, Ly - 1)
    next_t = jnp.clip(t_in_audio + 1, 0, Ly - 1)
    y_next = jnp.take_along_axis(y_ids, next_t, axis=1)
    is_last = pos == (x_lens + y_lens)[:, None] - 1
    labels = jnp.where(is_last, cfg.eos, y_next)

    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, :, None], axis=2)[:, :, 0]
    total = jnp.sum(jnp.where(in_audio, nll, 0.0))
    count = jnp.maximum(jnp.sum(in_audio), 1)
    return total / count


def make_train_step(cfg: T2SConfig, optimizer: optax.GradientTransformation,
                    dtype=jnp.bfloat16, remat: bool = False, seq_mesh=None):
    """Returns a jittable (params, opt_state, batch) -> (params, opt_state,
    loss) step.  Shard params/batch before jitting (``parallel/mesh.py``);
    GSPMD handles the tp all-reduces and dp gradient psum."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: t2s_loss(p, cfg, batch["x_ids"], batch["y_ids"],
                               batch["bert"], batch["x_lens"], batch["y_lens"],
                               dtype, remat=remat, seq_mesh=seq_mesh))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_optimizer(peak_lr: float = 1e-4, warmup_steps: int = 500,
                   decay_steps: int = 50_000, end_lr_scale: float = 0.1,
                   weight_decay: float = 0.01, clip_norm: float = 1.0,
                   b1: float = 0.9, b2: float = 0.95):
    """AdamW with linear warmup → cosine decay and global-norm clipping
    (the standard AR-decoder recipe; the reference has no training code)."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=peak_lr, warmup_steps=warmup_steps,
        decay_steps=decay_steps, end_value=peak_lr * end_lr_scale)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay),
    ), schedule


def pad_batch(cfg: T2SConfig, samples, pad_multiple: int = 32):
    """Collate [(x_ids, y_ids, bert), ...] into the padded dict consumed by
    the train step.  Lengths round up to ``pad_multiple`` so the number of
    jit specializations stays bounded (same bucketing idea as inference).
    """
    import numpy as np

    def rup(n):
        return max(pad_multiple, -(-n // pad_multiple) * pad_multiple)

    B = len(samples)
    Lx = rup(max(len(s[0]) for s in samples))
    Ly = rup(max(len(s[1]) for s in samples))
    x = np.zeros((B, Lx), np.int32)
    y = np.zeros((B, Ly), np.int32)
    bert = np.zeros((B, Lx, cfg.bert_dim), np.float32)
    x_lens = np.zeros((B,), np.int32)
    y_lens = np.zeros((B,), np.int32)
    for i, (xi, yi, bi) in enumerate(samples):
        x[i, :len(xi)] = xi
        y[i, :len(yi)] = yi
        if bi is not None:
            bert[i, :len(xi)] = bi
        x_lens[i], y_lens[i] = len(xi), len(yi)
    return {"x_ids": jnp.asarray(x), "y_ids": jnp.asarray(y),
            "bert": jnp.asarray(bert), "x_lens": jnp.asarray(x_lens),
            "y_lens": jnp.asarray(y_lens)}
