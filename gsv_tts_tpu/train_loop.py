"""Resumable fine-tuning loops with full-train-state checkpoints.

The reference engine is inference-only (SURVEY §4: no training code in the
tree); upstream GPT-SoVITS trains the two stages with torch Lightning /
a hand-rolled torch loop and resumes from ``.ckpt`` files that bundle
model + optimizer state.  This module gives the same operational
capability TPU-natively on top of the jitted steps in
``parallel/train.py`` (stage 1) and ``models/sovits_train.py`` (stage 2):

  * :func:`save_train_state` / :func:`load_train_state` — whole-pytree
    checkpoints (params + optimizer state + step) as a flat ``.npz``
    written atomically; bf16 leaves are stored as f32 (lossless) and cast
    back to the template's dtype on load, so checkpoints are portable
    across compute dtypes and need no pickle.
  * :func:`finetune_t2s` — stage-1 CE loop: epoch-seeded length-bucketed
    batches, periodic checkpoints, bit-exact resume (the restart replays
    the same batch order from the saved step), final safetensors export
    loadable by ``TTS.load_gpt_model``.
  * :func:`finetune_sovits` — stage-2 GAN loop (G/D params + both
    optimizer states in one checkpoint); per-step rng derived with
    ``fold_in(key, step)`` so a resumed run draws the same noise/slices.

``examples/finetune_t2s.py`` / ``examples/finetune_sovits.py`` are thin
CLIs over these functions.
"""
from __future__ import annotations

import itertools
import os
import time
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "save_train_state", "load_train_state",
    "finetune_t2s", "finetune_sovits",
]


# ---------------------------------------------------------------------------
# Pytree train-state checkpoints (.npz, no pickle)
# ---------------------------------------------------------------------------

def _flatten_with_keys(tree):
    """[(stable_key, leaf), ...] + treedef, keys from the pytree paths."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        key = jax.tree_util.keystr(path).replace("/", "_")
        out.append((key, leaf))
    return out, treedef


def save_train_state(path: str, state) -> None:
    """Write a pytree (params / optimizer states / counters) to ``path``
    as one flat ``.npz``, atomically (tmp + rename).  bf16 leaves are
    widened to f32 (lossless — bf16 ⊂ f32) because numpy archives cannot
    hold ml_dtypes natively; :func:`load_train_state` casts back to the
    template's dtype."""
    flat, _ = _flatten_with_keys(state)
    arrays = {}
    for key, leaf in flat:
        a = np.asarray(jax.device_get(leaf))
        if a.dtype == jnp.bfloat16 or a.dtype.kind not in "biufc?":
            a = a.astype(np.float32)
        arrays[key] = a
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_train_state(path: str, template):
    """Restore a pytree saved by :func:`save_train_state`.  ``template``
    supplies the structure and leaf dtypes (e.g. fresh-initialized params
    + ``optimizer.init(params)``); every leaf is cast to its template
    dtype.  Raises ``ValueError`` on a structure mismatch (different
    model dims / optimizer) instead of silently mixing states."""
    z = np.load(path)
    flat, treedef = _flatten_with_keys(template)
    want = [k for k, _ in flat]
    have = set(z.files)
    missing = [k for k in want if k not in have]
    extra = sorted(have - set(want))
    if missing or extra:
        raise ValueError(
            f"checkpoint {path} does not match the training setup: "
            f"missing={missing[:5]} extra={extra[:5]}")
    leaves = []
    for key, ref in flat:
        a = z[key]
        ref = np.asarray(ref) if not hasattr(ref, "dtype") else ref
        if tuple(a.shape) != tuple(np.shape(ref)):
            raise ValueError(f"checkpoint leaf {key}: shape {a.shape} != "
                             f"template {np.shape(ref)}")
        leaves.append(jnp.asarray(a, dtype=ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# Stage 1: t2s CE fine-tuning
# ---------------------------------------------------------------------------

def finetune_t2s(samples: Sequence, cfg, out_dir: str, *,
                 total_steps: int, batch_size: int = 8,
                 init_params=None, dtype=jnp.bfloat16,
                 peak_lr: float = 1e-4, warmup_steps: int = 100,
                 remat: bool = False, mesh=None, pp_n_micro: int = 2,
                 ckpt_every: int = 500, log_every: int = 50,
                 resume: bool = True, seed: int = 0,
                 export: bool = True, export_config: Optional[dict] = None,
                 max_steps_this_run: Optional[int] = None,
                 log_fn: Callable[[str], None] = print):
    """Run (or resume) stage-1 fine-tuning to ``total_steps``.

    Returns the final (host) params.  The checkpoint
    ``{out_dir}/t2s_state.npz`` holds params + AdamW state + step; when
    ``resume`` and it exists, training continues from the saved step with
    the identical epoch-seeded batch order (resumed run == uninterrupted
    run — pass the SAME ``total_steps`` on resume; it parameterizes the
    LR schedule).  ``max_steps_this_run`` bounds one invocation (time-
    boxed jobs) without touching the schedule.  With ``mesh``,
    params/batches are sharded for GSPMD (``parallel/mesh.py``) and
    checkpoints are written from host copies.
    """
    from . import train_data
    from .loader import save_trained_gpt
    from .models import t2s as t2s_model
    from .parallel import train as ptrain

    if not samples:
        raise ValueError("no training samples (empty/filtered manifest?)")
    os.makedirs(out_dir, exist_ok=True)
    ckpt_path = os.path.join(out_dir, "t2s_state.npz")

    params = init_params if init_params is not None else \
        t2s_model.init_params(jax.random.PRNGKey(seed), cfg, dtype=dtype)
    # optax's warmup-cosine needs warmup < decay_steps (= total schedule)
    warmup_steps = min(warmup_steps, max(total_steps - 1, 0))
    optimizer, schedule = ptrain.make_optimizer(
        peak_lr=peak_lr, warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1))
    opt_state = optimizer.init(params)

    step = 0
    if resume and os.path.exists(ckpt_path):
        state = load_train_state(
            ckpt_path, {"params": params, "opt": opt_state, "step": 0})
        params, opt_state = state["params"], state["opt"]
        step = int(state["step"])
        log_fn(f"resumed from {ckpt_path} at step {step}")

    if mesh is not None and "pp" in mesh.axis_names and mesh.shape["pp"] > 1:
        # pipeline-parallel (GPipe) path: layer stack sharded across pp
        # stages, microbatch schedule inside the step (parallel/pipeline.py)
        from jax.sharding import NamedSharding, PartitionSpec

        from .parallel import pipeline as ppl
        from .parallel.mesh import replicated

        dp = mesh.shape["dp"]
        if batch_size % (dp * pp_n_micro) != 0:
            raise ValueError(
                f"batch_size={batch_size} must divide dp({dp}) * "
                f"n_micro({pp_n_micro}) for the GPipe schedule")
        if len(samples) < batch_size:
            # the GPipe loop drops the ragged epoch tail — with zero full
            # batches it would spin forever
            raise ValueError(
                f"pipeline training needs >= one full batch "
                f"({len(samples)} samples < batch_size={batch_size})")
        params = ppl.shard_pp_params(params, mesh)
        opt_state = jax.device_put(opt_state, replicated(mesh))
        bs = NamedSharding(mesh, PartitionSpec("dp"))
        step_fn = jax.jit(ppl.make_pp_train_step(
            cfg, optimizer, mesh, n_micro=pp_n_micro, dtype=dtype,
            remat=remat))
        pp_mode = True
    else:
        if mesh is not None:
            from .parallel.mesh import batch_sharding, replicated, shard_t2s_params
            params = shard_t2s_params(params, mesh)
            opt_state = jax.device_put(opt_state, replicated(mesh))
            bs = batch_sharding(mesh)
        else:
            bs = None
        step_fn = jax.jit(ptrain.make_train_step(cfg, optimizer, dtype=dtype,
                                                 remat=remat))
        pp_mode = False

    def checkpoint():
        save_train_state(ckpt_path, {
            "params": jax.device_get(params), "opt": jax.device_get(opt_state),
            "step": step})

    # GPipe needs every batch divisible by dp*n_micro — drop the ragged
    # epoch tail there (and shrink batches-per-epoch to match)
    bpe = (max(1, len(samples) // batch_size) if pp_mode
           else max(1, -(-len(samples) // batch_size)))  # batches per epoch
    stop = total_steps if max_steps_this_run is None else \
        min(total_steps, step + max_steps_this_run)
    t0, step0 = time.time(), step
    while step < stop:
        epoch = step // bpe
        it = train_data.batches(cfg, samples, batch_size, seed=seed + epoch,
                                drop_remainder=pp_mode)
        it = itertools.islice(it, step % bpe, None)  # mid-epoch resume
        for batch in it:
            if bs is not None:
                batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
            params, opt_state, loss = step_fn(params, opt_state, batch)
            step += 1
            if step % log_every == 0 or step == step0 + 1:
                dt = (time.time() - t0) / max(step - step0, 1)
                log_fn(f"step {step:6d}  loss {float(loss):.4f}  "
                       f"lr {float(schedule(step)):.2e}  {dt * 1e3:.0f} ms/step")
            if step % ckpt_every == 0:
                checkpoint()
            if step >= stop:
                break

    checkpoint()
    host_params = jax.device_get(params)
    if export:
        save_trained_gpt(host_params, cfg, out_dir, config=export_config)
        log_fn(f"exported safetensors checkpoint to {out_dir}")
    return host_params


# ---------------------------------------------------------------------------
# Stage 2: SoVITS GAN fine-tuning
# ---------------------------------------------------------------------------

def sovits_batches(cfg, samples: Sequence, batch_size: int, hop_length: int,
                   seed: Optional[int] = 0, pad_multiple: int = 32):
    """Length-bucketed padded GAN batches (same design as
    ``train_data.batches``: sort by frames, chunk, shuffle chunk order)."""
    from .models.sovits_train import pad_sovits_batch

    order = sorted(range(len(samples)), key=lambda i: samples[i][1].shape[-1])
    chunks = [order[i: i + batch_size]
              for i in range(0, len(order), batch_size)]
    if seed is not None:
        np.random.RandomState(seed).shuffle(chunks)
    for chunk in chunks:
        group = [samples[i] for i in chunk]
        if len(group) < batch_size:
            group = group + [group[-1]] * (batch_size - len(group))
        yield pad_sovits_batch(cfg, group, hop_length,
                               pad_multiple=pad_multiple)


def finetune_sovits(samples: Sequence, cfg, hps, out_dir: str, *,
                    total_steps: int, batch_size: int = 4,
                    init_params=None, dtype=jnp.float32,
                    g_lr: float = 2e-4, d_lr: float = 2e-4,
                    segment_frames: Optional[int] = None,
                    mesh=None,
                    ckpt_every: int = 500, log_every: int = 50,
                    resume: bool = True, seed: int = 0,
                    export: bool = True,
                    max_steps_this_run: Optional[int] = None,
                    log_fn: Callable[[str], None] = print):
    """Run (or resume) stage-2 GAN fine-tuning to ``total_steps``.

    ``init_params`` is the loaded SoVITS param dict (a fresh posterior
    encoder is added when the Lite checkpoint stripped ``enc_q.*``).  The
    checkpoint ``{out_dir}/sovits_state.npz`` bundles G/D params and both
    optimizer states; per-step rng is ``fold_in(PRNGKey(seed), step)`` so
    a resumed run draws the identical noise and slice offsets.  With
    ``mesh``, batches shard over ``dp`` (G/D params replicated) and GSPMD
    inserts the gradient all-reduces; ``batch_size`` must divide by the
    mesh's dp extent.  Returns the final (host) generator params.
    """
    import optax

    from .loader import save_trained_sovits
    from .models import sovits_train as svt

    if not samples:
        raise ValueError("no training samples (empty/filtered manifest?)")
    os.makedirs(out_dir, exist_ok=True)
    ckpt_path = os.path.join(out_dir, "sovits_state.npz")

    hop = int(hps.data.hop_length)
    spf = int(np.prod(cfg.upsample_rates))
    if spf != hop:
        if spf % hop:
            raise ValueError(f"hop_length ({hop}) incompatible with the "
                             f"vocoder's samples-per-frame ({spf})")
        r = spf // hop
        samples = [(s[:, ::r], sp[:, ::r], w, t) for s, sp, w, t in samples]
        hop = spf
    if segment_frames is None:
        segment_frames = max(int(hps.train.segment_size) // hop, 4)

    params = dict(init_params) if init_params is not None else {}
    if "enc_q.pre.weight" not in params:
        params.update(svt.init_enc_q_params(jax.random.PRNGKey(seed), cfg,
                                            dtype=dtype))
        log_fn("posterior encoder not in checkpoint — fresh init")
    d_params = svt.init_discriminator_params(jax.random.PRNGKey(seed + 1),
                                             dtype=dtype)

    g_opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(g_lr))
    d_opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(d_lr))
    g_state = g_opt.init(params)
    d_state = d_opt.init(d_params)

    step = 0
    if resume and os.path.exists(ckpt_path):
        state = load_train_state(ckpt_path, {
            "g": params, "d": d_params, "g_opt": g_state, "d_opt": d_state,
            "step": 0})
        params, d_params = state["g"], state["d"]
        g_state, d_state = state["g_opt"], state["d_opt"]
        step = int(state["step"])
        log_fn(f"resumed from {ckpt_path} at step {step}")

    if mesh is not None:
        from .parallel.mesh import batch_sharding, replicated
        dp = mesh.shape.get("dp", 1)
        if batch_size % dp:
            raise ValueError(f"batch_size {batch_size} must divide by the "
                             f"mesh dp extent {dp}")
        rep = replicated(mesh)
        params = jax.device_put(params, rep)
        d_params = jax.device_put(d_params, rep)
        g_state = jax.device_put(g_state, rep)
        d_state = jax.device_put(d_state, rep)
        bsh = batch_sharding(mesh)
    else:
        bsh = None

    step_fn = jax.jit(svt.make_sovits_train_step(
        cfg, g_opt, d_opt,
        n_fft=int(hps.data.filter_length), hop_length=hop,
        win_length=int(hps.data.win_length), sr=int(hps.data.sampling_rate),
        segment_frames=segment_frames))

    def checkpoint():
        save_train_state(ckpt_path, {
            "g": jax.device_get(params), "d": jax.device_get(d_params),
            "g_opt": jax.device_get(g_state), "d_opt": jax.device_get(d_state),
            "step": step})

    base_key = jax.random.PRNGKey(seed + 2)
    bpe = max(1, -(-len(samples) // batch_size))
    stop = total_steps if max_steps_this_run is None else \
        min(total_steps, step + max_steps_this_run)
    t0, step0 = time.time(), step
    while step < stop:
        epoch = step // bpe
        it = sovits_batches(cfg, samples, batch_size, hop, seed=seed + epoch)
        it = itertools.islice(it, step % bpe, None)
        for batch in it:
            if bsh is not None:
                batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
            sub = jax.random.fold_in(base_key, step)
            params, d_params, g_state, d_state, m = step_fn(
                params, d_params, g_state, d_state, batch, sub)
            step += 1
            if step % log_every == 0 or step == step0 + 1:
                dt = (time.time() - t0) / max(step - step0, 1)
                log_fn(f"step {step:6d}  g {float(m['g_total']):.3f} "
                       f"(mel {float(m['mel']):.3f} kl {float(m['kl']):.3f} "
                       f"fm {float(m['fm']):.3f} adv {float(m['adv']):.3f})  "
                       f"d {float(m['d_total']):.3f}  {dt * 1e3:.0f} ms/step")
            if step % ckpt_every == 0:
                checkpoint()
            if step >= stop:
                break

    checkpoint()
    host_params = jax.device_get(params)
    if export:
        save_trained_sovits(host_params, hps, out_dir)
        log_fn(f"exported safetensors checkpoint to {out_dir}")
    return host_params
