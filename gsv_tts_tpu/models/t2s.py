"""Stage-1 "GPT" text-to-semantic decoder, TPU-native.

Functional JAX re-design of the reference ``Text2SemanticDecoder``
(``gsv_tts/GPT_SoVITS/GPT/t2s_model.py:158-206``): a decoder-only transformer
with a hybrid prompt (phoneme block attends bidirectionally to itself, audio
block attends causally to itself and fully to the phonemes,
``t2s_model.py:351-383``), post-norm residual blocks with fused-QKV attention
(``t2s_model.py:13-105``), sinusoidal positional embeddings with a learned
scalar ``alpha`` (``GPT/embedding.py:35-75``), and a tied-nothing linear
``ar_predict_layer``.

TPU-first design decisions (vs. the CUDA original):
  * parameters are a pytree with all layers *stacked* on a leading axis, so
    prefill and decode are a single ``lax.scan`` over layers — one compiled
    layer body, minimal compile time, and XLA pipelines the weight streaming;
  * the KV cache is a preallocated HBM buffer ``[L, B, S, H, Dh]`` carried
    functionally through the scan (with buffer donation, XLA updates it
    in place);
  * the decode loop runs ``check_interval`` (or ``stream_chunk``) tokens per
    dispatch as an inner ``lax.scan`` — the jit compile cache plays the role
    of the reference's CUDA-graph pool, and the host only syncs on the tiny
    per-chunk token output (mirrors the 5-step EOS readback cadence,
    ``t2s_model.py:451-453``);
  * attention masks are *derived* from per-slot ``kv_len``/``x_len`` scalars
    instead of materialized mask buffers (``t2s_model.py:422-430`` keeps a
    [B,H,1,S] bool buffer; we compute ``iota <= kv_len`` on the fly).
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sampling

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class T2SConfig:
    """Hyperparameters, read from the checkpoint's embedded config
    (``t2s_model.py:159-168``)."""

    hidden_dim: int = 512
    embedding_dim: int = 512
    num_heads: int = 16
    num_layers: int = 24
    vocab_size: int = 1025
    phoneme_vocab_size: int = 732
    eos: int = 1024
    bert_dim: int = 1024
    mlp_ratio: int = 4
    max_position: int = 4000
    # first-steps token suppression (``t2s_model.py:170``)
    suppressed_tokens: Tuple[int, ...] = (280, 486)

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    @classmethod
    def from_checkpoint_config(cls, config: Dict[str, Any]) -> "T2SConfig":
        m = config["model"]
        return cls(
            hidden_dim=m["hidden_dim"],
            embedding_dim=m["embedding_dim"],
            num_heads=m["head"],
            num_layers=m["n_layer"],
            vocab_size=m["vocab_size"],
            phoneme_vocab_size=m["phoneme_vocab_size"],
            eos=m["EOS"],
        )


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def sine_pe_table(max_len: int, dim: int) -> np.ndarray:
    """Sinusoidal table, computed in float32 exactly like
    ``embedding.py:52-69`` (non-reversed variant)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float32) * -(math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def init_params(rng: jax.Array, cfg: T2SConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Random initialization (used for tests/benchmarks; real weights come
    from the checkpoint loader)."""
    keys = iter(jax.random.split(rng, 32))
    D, E, L = cfg.hidden_dim, cfg.embedding_dim, cfg.num_layers
    M = D * cfg.mlp_ratio

    def dense(key, fan_in, shape):
        return (jax.random.normal(key, shape) / math.sqrt(fan_in)).astype(dtype)

    params = {
        "text_emb": dense(next(keys), 1, (cfg.phoneme_vocab_size, E)),
        "audio_emb": dense(next(keys), 1, (cfg.vocab_size, E)),
        "bert_proj_w": dense(next(keys), cfg.bert_dim, (cfg.bert_dim, E)),
        "bert_proj_b": jnp.zeros((E,), dtype),
        "text_pos_alpha": jnp.ones((1,), F32),
        "audio_pos_alpha": jnp.ones((1,), F32),
        "predict_w": dense(next(keys), D, (D, cfg.vocab_size)),
        "layers": {
            "qkv_w": dense(next(keys), D, (L, D, 3 * D)),
            "qkv_b": jnp.zeros((L, 3 * D), dtype),
            "out_w": dense(next(keys), D, (L, D, D)),
            "out_b": jnp.zeros((L, D), dtype),
            "ln1_g": jnp.ones((L, D), F32),
            "ln1_b": jnp.zeros((L, D), F32),
            "ln2_g": jnp.ones((L, D), F32),
            "ln2_b": jnp.zeros((L, D), F32),
            "mlp1_w": dense(next(keys), D, (L, D, M)),
            "mlp1_b": jnp.zeros((L, M), dtype),
            "mlp2_w": dense(next(keys), M, (L, M, D)),
            "mlp2_b": jnp.zeros((L, D), dtype),
        },
        "pe": jnp.asarray(sine_pe_table(cfg.max_position, E)),  # f32 constant
    }
    return params


def params_from_torch_state_dict(state_dict: Dict[str, Any], cfg: T2SConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Convert a (key-remapped) reference state dict — numpy arrays keyed as
    in ``Loader.py:130-154`` after remap — into our stacked pytree.

    Torch ``nn.Linear`` stores ``weight`` as [out, in]; we keep [in, out].
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    L = cfg.num_layers

    def stack(fmt: str, transpose: bool = False):
        mats = [sd[fmt.format(i)] for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), dtype=dtype)

    def stack_f32(fmt: str):
        return jnp.asarray(np.stack([sd[fmt.format(i)] for i in range(L)]), dtype=F32)

    pfx = "t2s_transformer.blocks.{}."
    params = {
        "text_emb": jnp.asarray(sd["ar_text_embedding.word_embeddings.weight"], dtype),
        "audio_emb": jnp.asarray(sd["ar_audio_embedding.word_embeddings.weight"], dtype),
        "bert_proj_w": jnp.asarray(sd["bert_proj.weight"].T, dtype),
        "bert_proj_b": jnp.asarray(sd["bert_proj.bias"], dtype),
        "text_pos_alpha": jnp.asarray(sd["ar_text_position.alpha"].reshape(1), F32),
        "audio_pos_alpha": jnp.asarray(sd["ar_audio_position.alpha"].reshape(1), F32),
        "predict_w": jnp.asarray(sd["ar_predict_layer.weight"].T, dtype),
        "layers": {
            "qkv_w": stack(pfx + "qkv.weight", transpose=True),
            "qkv_b": stack(pfx + "qkv.bias"),
            "out_w": stack(pfx + "out_proj.weight", transpose=True),
            "out_b": stack(pfx + "out_proj.bias"),
            "ln1_g": stack_f32(pfx + "norm1.weight"),
            "ln1_b": stack_f32(pfx + "norm1.bias"),
            "ln2_g": stack_f32(pfx + "norm2.weight"),
            "ln2_b": stack_f32(pfx + "norm2.bias"),
            "mlp1_w": stack(pfx + "mlp.0.weight", transpose=True),
            "mlp1_b": stack(pfx + "mlp.0.bias"),
            "mlp2_w": stack(pfx + "mlp.2.weight", transpose=True),
            "mlp2_b": stack(pfx + "mlp.2.bias"),
        },
        "pe": jnp.asarray(sine_pe_table(cfg.max_position, cfg.embedding_dim)),
    }
    return params


def params_to_torch_state_dict(params: Dict[str, Any],
                               cfg: T2SConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`params_from_torch_state_dict`: our stacked pytree →
    a float32 numpy state dict in the runtime key layout (what the
    safetensors fast path stores), so trained weights can be saved into a
    checkpoint every loader understands.  ``pe`` is derived, not stored.

    Every returned tensor is made C-contiguous: safetensors serializes the
    raw buffer, so a transposed VIEW would silently save corrupted data."""
    p = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    sd = {
        "ar_text_embedding.word_embeddings.weight": p["text_emb"],
        "ar_audio_embedding.word_embeddings.weight": p["audio_emb"],
        "bert_proj.weight": p["bert_proj_w"].T,
        "bert_proj.bias": p["bert_proj_b"],
        "ar_text_position.alpha": p["text_pos_alpha"].reshape(()),
        "ar_audio_position.alpha": p["audio_pos_alpha"].reshape(()),
        "ar_predict_layer.weight": p["predict_w"].T,
    }
    lay = p["layers"]
    per_layer = [
        ("qkv.weight", "qkv_w", True), ("qkv.bias", "qkv_b", False),
        ("out_proj.weight", "out_w", True), ("out_proj.bias", "out_b", False),
        ("norm1.weight", "ln1_g", False), ("norm1.bias", "ln1_b", False),
        ("norm2.weight", "ln2_g", False), ("norm2.bias", "ln2_b", False),
        ("mlp.0.weight", "mlp1_w", True), ("mlp.0.bias", "mlp1_b", False),
        ("mlp.2.weight", "mlp2_w", True), ("mlp.2.bias", "mlp2_b", False),
    ]
    for i in range(cfg.num_layers):
        for torch_name, ours, transpose in per_layer:
            m = lay[ours][i]
            sd[f"t2s_transformer.blocks.{i}.{torch_name}"] = m.T if transpose else m
    return {k: np.ascontiguousarray(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Core math
# ---------------------------------------------------------------------------

from ..ops.norms import layer_norm as _layer_norm  # noqa: E402


def _block_prefill(x, lp, attn_mask, num_heads, lens=None, impl="xla"):
    """One post-norm transformer block over the full prompt
    (``t2s_model.py:31-65``).  Returns (hidden, k, v) with k/v in
    [B, T, H, Dh] layout for the cache.

    ``impl="flash"``/``"flash_interpret"`` (with ``lens=(x_lens, xy_lens)``)
    uses the Pallas hybrid-mask kernel (``ops/flash_prefill.py``) — no
    [B, H, T, T] score materialization; ``attn_mask`` is ignored there
    (the kernel derives the identical mask from the lengths)."""
    B, T, D = x.shape
    H = num_heads
    Dh = D // H

    residual = x
    qkv = jnp.einsum("btd,de->bte", x, lp["qkv_w"]) + lp["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, H, Dh)
    k = k.reshape(B, T, H, Dh)
    v = v.reshape(B, T, H, Dh)

    if impl in ("flash", "flash_interpret") and lens is not None:
        from ..ops.flash_prefill import flash_prefill_attention

        attn = flash_prefill_attention(
            q, k, v, lens[0], lens[1], num_heads=H,
            interpret=(impl == "flash_interpret"))
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=F32)
        scores = scores / math.sqrt(Dh)
        scores = jnp.where(attn_mask[:, None, :, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)

    x = residual + jnp.einsum("btd,de->bte", attn, lp["out_w"]) + lp["out_b"]
    x = _layer_norm(x, lp["ln1_g"], lp["ln1_b"])

    residual = x
    h = jax.nn.relu(jnp.einsum("btd,dm->btm", x, lp["mlp1_w"]) + lp["mlp1_b"])
    x = residual + jnp.einsum("btm,md->btd", h, lp["mlp2_w"]) + lp["mlp2_b"]
    x = _layer_norm(x, lp["ln2_g"], lp["ln2_b"])
    return x, k, v


def transformer_prefill(params, cfg: T2SConfig, xy_pos: jnp.ndarray,
                        attn_mask: jnp.ndarray, lens=None, impl: str = "xla"):
    """Run all layers over the packed prompt; returns final hidden states and
    stacked per-layer K/V ``[L, B, T, H, Dh]`` (reference
    ``T2STransformer.process_prompt``, ``t2s_model.py:114-127``)."""

    def body(x, lp):
        x, k, v = _block_prefill(x, lp, attn_mask, cfg.num_heads, lens, impl)
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(body, xy_pos, params["layers"])
    return x, ks, vs


def _block_decode(x, lp, layer_idx, k_cache, v_cache, kv_len, num_heads,
                  attn_impl: str = "xla"):
    """Single-token decode step of one block (``t2s_model.py:67-105``).

    x        [B, D]          current token hidden
    k_cache  [L, B, S, H, Dh] the FULL stacked cache (updated in place via a
                              tiny scatter at [layer_idx, b, kv_len])
    kv_len   [B] int32        valid cache entries *before* this token
    attn_impl: "xla" (masked SDPA), "flash" (Pallas length-aware kernel,
    ``ops/flash_decode.py``) or "flash_interpret" (kernel in interpreter mode
    for CPU tests).

    TPU note: the caches flow through the layer loop as *carry*, so XLA keeps
    one buffer and the per-token write is a scatter of H·Dh values — no
    full-cache copy per step (a scan-ys formulation would rewrite the whole
    [L,B,S,H,Dh] buffer every token, which measured ~2.4× slower at S=1024).
    """
    from ..ops import flash_decode

    B, D = x.shape
    H = num_heads
    Dh = D // H
    bidx = jnp.arange(B)

    residual = x
    qkv = x @ lp["qkv_w"] + lp["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, H, Dh)
    k_cache = k_cache.at[layer_idx, bidx, kv_len].set(k.reshape(B, H, Dh))
    v_cache = v_cache.at[layer_idx, bidx, kv_len].set(v.reshape(B, H, Dh))

    if attn_impl == "xla":
        if isinstance(layer_idx, int):  # unrolled: static slice, no gather
            kc, vc = k_cache[layer_idx], v_cache[layer_idx]
        else:
            kc = jax.lax.dynamic_index_in_dim(k_cache, layer_idx, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(v_cache, layer_idx, 0, keepdims=False)
        attn = flash_decode.xla_decode_attention(q, kc, vc, kv_len)
    else:
        attn = flash_decode.flash_decode_attention_layered(
            q, k_cache, v_cache, kv_len, jnp.asarray(layer_idx, jnp.int32),
            interpret=(attn_impl == "flash_interpret"))
    attn = attn.reshape(B, D)

    x = residual + attn @ lp["out_w"] + lp["out_b"]
    x = _layer_norm(x, lp["ln1_g"], lp["ln1_b"])

    residual = x
    h = jax.nn.relu(x @ lp["mlp1_w"] + lp["mlp1_b"])
    x = residual + h @ lp["mlp2_w"] + lp["mlp2_b"]
    x = _layer_norm(x, lp["ln2_g"], lp["ln2_b"])
    return x, k_cache, v_cache


def transformer_decode_step(params, cfg: T2SConfig, x, k_cache, v_cache, kv_len,
                            attn_impl: str = "xla", unroll: bool = True):
    """One token through all layers; caches updated in place.

    ``unroll=True`` (default) inlines the layer loop with *static* layer
    indices — measured ~0.1 ms/token faster than ``lax.scan`` on v5e (the
    scan pays a dynamic-slice of every weight each iteration).  The scan path
    remains for compile-time-sensitive uses."""
    if (attn_impl in ("fused_step", "fused_step_interpret") and x.shape[0] == 1
            and x.shape[1] % 128 == 0):
        # (the kernel lane-slices qkv at offsets D and 2D, so the hidden dim
        # must be 128-aligned; smaller models fall through to flash/XLA)
        # whole-step kernel: ALL layers in one launch with double-buffered
        # weight streaming (``ops/fused_step.py``)
        from ..ops.fused_step import fused_decode_step

        return fused_decode_step(x, params["layers"], k_cache, v_cache, kv_len,
                                 interpret=(attn_impl == "fused_step_interpret"))

    # fused_step not applicable (B>1 or unaligned hidden dim): degrade to the
    # flash kernel, preserving interpret mode (q8 only exists as the
    # whole-step sampling kernel — its fallback is bf16 flash)
    attn_impl = {"fused_step": "flash",
                 "fused_step_q8": "flash",
                 "fused_step_q4": "flash",
                 "fused_step_interpret": "flash_interpret",
                 "fused_step_q8_interpret": "flash_interpret",
                 "fused_step_q4_interpret": "flash_interpret"}.get(
        attn_impl, attn_impl)

    if attn_impl in ("fused", "fused_interpret"):
        # whole-layer Pallas kernel (``ops/fused_layer.py``): one launch per
        # layer, caches appended in place by the kernel's DMA
        from ..ops.fused_layer import fused_decode_layer

        h = x
        for i in range(cfg.num_layers):
            lp = jax.tree.map(lambda a: a[i], params["layers"])
            h, k_cache, v_cache = fused_decode_layer(
                h, lp, k_cache, v_cache, kv_len, i,
                interpret=(attn_impl == "fused_interpret"))
        return h, k_cache, v_cache

    if unroll:
        h = x
        for i in range(cfg.num_layers):
            lp = jax.tree.map(lambda a: a[i], params["layers"])
            h, k_cache, v_cache = _block_decode(
                h, lp, i, k_cache, v_cache, kv_len, cfg.num_heads, attn_impl)
        return h, k_cache, v_cache

    def body(carry, inputs):
        h, kc, vc = carry
        lp, layer_idx = inputs
        h, kc, vc = _block_decode(h, lp, layer_idx, kc, vc, kv_len,
                                  cfg.num_heads, attn_impl)
        return (h, kc, vc), None

    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    (h, k_cache, v_cache), _ = jax.lax.scan(
        body, (x, k_cache, v_cache), (params["layers"], layer_ids))
    return h, k_cache, v_cache


# ---------------------------------------------------------------------------
# Prompt building (reference process_single_data / process_batch_data,
# ``t2s_model.py:300-383``)
# ---------------------------------------------------------------------------

def embed_prompt_single(params, cfg: T2SConfig, x_ids, y_ids, bert, dtype):
    """B=1 prompt: [x text block | y audio block] (``t2s_model.py:351-383``)."""
    x = jnp.take(params["text_emb"], x_ids, axis=0).astype(dtype)
    x = x + (bert.astype(dtype) @ params["bert_proj_w"] + params["bert_proj_b"])
    Lx = x_ids.shape[1]
    x = x + (params["text_pos_alpha"] * params["pe"][:Lx]).astype(dtype)

    y = jnp.take(params["audio_emb"], y_ids, axis=0).astype(dtype)
    Ly = y_ids.shape[1]
    y = y + (params["audio_pos_alpha"] * params["pe"][:Ly]).astype(dtype)

    xy_pos = jnp.concatenate([x, y], axis=1)

    T = Lx + Ly
    rows = jnp.arange(T)[:, None]
    cols = jnp.arange(T)[None, :]
    in_x_col = cols < Lx
    # phoneme rows: attend to the whole phoneme block, never to audio
    # audio rows: attend to phonemes + causal within audio
    mask = jnp.where(rows < Lx, in_x_col, in_x_col | (cols <= rows))
    return xy_pos, mask[None, :, :]


def embed_prompt_batch(params, cfg: T2SConfig, x_ids, y_ids, bert, x_lens, y_lens, dtype):
    """Ragged batch prompt packing (``t2s_model.py:300-349``): each row is
    [x_i tokens | y_i tokens | padding] with a per-row hybrid mask and a
    last-token one-hot mask."""
    B, Lx = x_ids.shape
    Ly = y_ids.shape[1]
    T = Lx + Ly

    x = jnp.take(params["text_emb"], x_ids, axis=0).astype(dtype)
    x = x + (bert.astype(dtype) @ params["bert_proj_w"] + params["bert_proj_b"])
    x = x + (params["text_pos_alpha"] * params["pe"][:Lx]).astype(dtype)
    y = jnp.take(params["audio_emb"], y_ids, axis=0).astype(dtype)
    y = y + (params["audio_pos_alpha"] * params["pe"][:Ly]).astype(dtype)

    xy_lens = x_lens + y_lens  # [B]
    pos = jnp.arange(T)[None, :]  # [1, T]
    # Packed gather: position t of row b takes x[b, t] if t < x_len else y[b, t - x_len]
    is_x = pos < x_lens[:, None]
    y_index = jnp.clip(pos - x_lens[:, None], 0, Ly - 1)
    x_index = jnp.clip(pos, 0, Lx - 1)
    gx = jnp.take_along_axis(x, x_index[:, :, None], axis=1)
    gy = jnp.take_along_axis(y, y_index[:, :, None], axis=1)
    xy_pos = jnp.where(is_x[:, :, None], gx, gy)
    xy_pos = jnp.where((pos < xy_lens[:, None])[:, :, None], xy_pos, 0.0)

    rows = jnp.arange(T)[None, :, None]
    cols = jnp.arange(T)[None, None, :]
    xl = x_lens[:, None, None]
    valid_col = cols < xy_lens[:, None, None]
    in_x_col = cols < xl
    mask = jnp.where(rows < xl, in_x_col, in_x_col | (cols <= rows))
    mask = mask & valid_col
    last_token_mask = pos == (xy_lens[:, None] - 1)
    return xy_pos, mask, last_token_mask
