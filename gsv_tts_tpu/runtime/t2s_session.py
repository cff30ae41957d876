"""Decode runtime for the t2s model: bucketed KV cache + jitted step loop.

TPU-native replacement for the reference's CUDA-graph bucket machinery
(``t2s_model.py:146-156,210-298``).  The mapping is:

  reference CUDA mechanism                 TPU mechanism here
  --------------------------------------   --------------------------------
  CUDAGraph capture of decode_next_token   jit-compiled ``decode_chunk`` (the
                                           XLA compile cache *is* the graph
                                           pool; buffers donated for in-place
                                           HBM updates)
  nested KV-cache bucket views             per-(B, S) cache buffers; bucket
                                           escalation = one pad-copy
                                           (``t2s_model.py:425-428``)
  per-step Python loop + graph.replay()    ``lax.scan`` over
                                           ``check_interval``/``stream_chunk``
                                           tokens per dispatch; host syncs
                                           only on the per-chunk token block,
                                           mirroring the 5-step EOS readback
                                           (``t2s_model.py:451-453``)
  [B,H,1,S] bool decode mask buffer        mask derived on the fly from
                                           per-slot ``kv_len`` scalars
  continuous-batching slot refill          jitted per-slot prefill writing
                                           into ``cache[:, slot]``
                                           (``t2s_model.py:696-722``)
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import t2s as t2s_model
from ..models.t2s import T2SConfig
from ..ops import sampling

F32 = jnp.float32
I32 = jnp.int32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def freeze_slot(state: "DecodeState", j: int) -> "DecodeState":
    """Zero a dead slot's counters so its per-chunk K/V appends restart
    from row 0 and never reach the bucket edge (shared by the batched
    stream and the wave scheduler)."""
    return dataclasses.replace(
        state, kv_len=state.kv_len.at[j].set(0),
        step_idx=state.step_idx.at[j].set(0),
        buf_len=state.buf_len.at[j].set(0))


def prompt_rows(x, y) -> int:
    """Cache rows a slot prefill + its first decode step need: the padded
    ``[Lx|Ly]`` block the prefill writes, or prompt+1, whichever is
    larger.  For a BATCHED refill the binding number is the GROUP pad
    (``xs.shape[1] + ys.shape[1]`` from :meth:`T2SEngine._pad_prompts`),
    which can exceed every per-request value when x/y splits are
    mismatched across the group."""
    lxp = _round_up(max(len(x), 1), PAD_MULTIPLE)
    lyp = _round_up(max(len(y), 1), PAD_MULTIPLE)
    return max(len(x) + len(y) + 1, lxp + lyp)


class SlotHarvest:
    """Per-slot incremental-emission bookkeeping, shared by
    :meth:`T2SEngine.generate_batched_stream` and the wave scheduler
    (``runtime/wave.py``) — ONE definition so the two stay token-exact
    and a window-semantics fix covers both.  Reference semantics
    (``t2s_model.py:655,674-679``): only decode samples BEFORE the
    interval's last one are emittable mid-stream, nothing at or past the
    first sampled EOS is ever emitted, and the final harvest trims
    specials and yields the not-yet-emitted tail."""

    __slots__ = ("samples", "emitted", "eos_seen")

    def __init__(self):
        self.samples: List[int] = []  # every decode sample so far (host ints)
        self.emitted = 0  # how many the consumer has received
        self.eos_seen = False

    def extend(self, toks) -> None:
        self.samples.extend(int(t) for t in toks)

    def drain_stream(self, eos: int) -> Optional[np.ndarray]:
        """Newly-final tokens, or None when there is nothing new.  The
        emittable window is every decode sample EXCEPT the interval's
        last one (``samples[:-1]``), trimmed at the first EOS."""
        if self.eos_seen:
            return None
        window = self.samples[:-1]
        hi = len(window)
        for t in range(self.emitted, len(window)):
            if window[t] == eos:
                hi = t
                self.eos_seen = True
                break
        if hi <= self.emitted:
            return None
        out = np.asarray(window[self.emitted:hi], np.int64)
        self.emitted = hi
        return out

    def drain_final(self, eos: int,
                    gen: Optional[np.ndarray] = None) -> np.ndarray:
        """Final-harvest tail: ``gen`` — the full harvest window, defaulting
        to the host-accumulated ``samples[:-1]`` (``generate_batched_stream``
        passes the equivalent device ``tok_buf`` window instead) — trimmed
        at the first EOS, specials dropped, already-emitted prefix
        skipped."""
        if gen is None:
            gen = np.asarray(self.samples[:-1], np.int64)
        eos_pos = np.nonzero(gen == eos)[0]
        if eos_pos.size:
            gen = gen[: eos_pos[0]]
        gen = gen[gen < eos]
        return gen.astype(np.int64)[self.emitted:]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DecodeState:
    """Device-resident decode state (one per active bucket)."""

    k_cache: jnp.ndarray  # [L, B, S, H, Dh]
    v_cache: jnp.ndarray  # [L, B, S, H, Dh]
    kv_len: jnp.ndarray  # [B] i32 — valid cache entries per slot
    x_len: jnp.ndarray  # [B] i32 — phoneme-block length per slot
    tok_buf: jnp.ndarray  # [B, S] i32 — prompt-y + generated tokens (sentinel V = empty)
    buf_len: jnp.ndarray  # [B] i32
    last_tok: jnp.ndarray  # [B] i32 — token to feed next step
    step_idx: jnp.ndarray  # [B] i32 — decode step counter (suppression window)
    rng: jax.Array

    def tree_flatten(self):
        return (
            (self.k_cache, self.v_cache, self.kv_len, self.x_len, self.tok_buf,
             self.buf_len, self.last_tok, self.step_idx, self.rng),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@dataclasses.dataclass(frozen=True)
class SampleArgs:
    top_k: int = 15
    top_p: float = 1.0
    temperature: float = 1.0
    repetition_penalty: float = 1.35
    use_prev: bool = True  # penalty over previous tokens (off in batched mode)


# ---------------------------------------------------------------------------
# jitted kernels
# ---------------------------------------------------------------------------

def _prefill_impl(attn_impl: str) -> str:
    """Decode attn_impl → prefill attention implementation.

    The Pallas decode paths pair with the XLA SDPA prefill: measured on
    v5e, the hybrid-mask Pallas prefill kernel (``ops/flash_prefill.py``)
    ties XLA at T=512 (11.5 ms wall incl. dispatch; ~4 ms on-chip) and is
    ~10x SLOWER at T=160 (101 ms) — at B=1/T<=1024 the [B, H, T, T] score
    materialization XLA pays is small and its fused softmax pipeline wins.
    The kernel stays available via the explicit "flash" impls (and as the
    scores-in-VMEM option for long-prompt/batched prefill experiments)."""
    return {"flash": "flash",
            "fused_step_interpret": "flash_interpret",
            "flash_interpret": "flash_interpret",
            "fused_interpret": "flash_interpret"}.get(attn_impl, "xla")

def _sample_logits(g, logits, tok_buf, sa: SampleArgs, vocab: int, mask_eos: bool, suppress: jnp.ndarray, suppressed: Tuple[int, ...]):
    """Shared logit post-processing: suppression, EOS masking, sampling.

    ``g`` is the precomputed [B, V] Gumbel noise for this draw — decode
    loops generate one [n_steps, B, V] tensor per dispatch (a per-step
    threefry inside the scan measured ~0.2 ms/step at B=4 on v5e)."""
    logits = logits.astype(F32)
    if suppressed:
        sup = jnp.asarray(suppressed, dtype=I32)
        neg = jnp.full((len(suppressed),), -jnp.inf, F32)
        logits = jnp.where(
            suppress[:, None],
            jax.vmap(lambda l: l.at[sup].set(neg))(logits),
            logits,
        )
    if mask_eos:
        logits = logits.at[:, vocab - 1].set(-jnp.inf)
    prev = tok_buf if sa.use_prev else None
    probs = sampling.logits_to_probs(
        logits, prev,
        temperature=sa.temperature, top_k=sa.top_k, top_p=sa.top_p,
        repetition_penalty=sa.repetition_penalty,
    )
    return sampling.gumbel_argmax_with_noise(probs, g).astype(I32)


def _append_tok(tok_buf, buf_len, tok):
    """Write ``tok[b]`` at ``tok_buf[b, buf_len[b]]`` as a static loop of
    in-place dynamic-update-slices (`.at[bidx, buf_len].set` lowers to a
    gather/scatter that measured ~0.1 ms/step at B=4 on v5e)."""
    for b in range(tok_buf.shape[0]):
        tok_buf = jax.lax.dynamic_update_slice(
            tok_buf, tok[b].reshape(1, 1), (jnp.int32(b), buf_len[b]))
    return tok_buf


@partial(jax.jit, static_argnames=("new_S", "vocab"))
def _gather_slots(state: DecodeState, slot_map, new_S: int, vocab: int):
    """Re-pack slots into a (differently sized) wave: ``slot_map[j]`` is
    the OLD slot index new slot ``j`` inherits, -1 for a dead slot.  One
    device gather per buffer — used for continuous-batching wave growth
    (identity map into a larger B) and tail compaction (survivors into a
    smaller B, so a lone tail request decodes at the small-batch kernel
    rate instead of burning dead slots).  The sequence dimension pads or
    truncates to ``new_S``; the caller guarantees every live slot's
    ``kv_len`` fits.  (No donation: the output shape always differs.)"""
    old_B = state.kv_len.shape[0]
    src = jnp.clip(slot_map, 0, old_B - 1)
    live = slot_map >= 0
    S = state.k_cache.shape[2]

    def fix_s(c):
        if new_S > S:
            return jnp.pad(c, [(0, 0), (0, 0), (0, new_S - S), (0, 0), (0, 0)])
        if new_S < S:
            return c[:, :, :new_S]
        return c

    tok_buf = jnp.take(state.tok_buf, src, axis=0)
    if new_S > S:
        tok_buf = jnp.pad(tok_buf, [(0, 0), (0, new_S - S)],
                          constant_values=vocab)
    elif new_S < S:
        tok_buf = tok_buf[:, :new_S]

    def scal(a):
        return jnp.where(live, jnp.take(a, src, axis=0), 0)

    return DecodeState(
        k_cache=fix_s(jnp.take(state.k_cache, src, axis=1)),
        v_cache=fix_s(jnp.take(state.v_cache, src, axis=1)),
        kv_len=scal(state.kv_len), x_len=scal(state.x_len),
        tok_buf=tok_buf, buf_len=scal(state.buf_len),
        last_tok=scal(state.last_tok), step_idx=scal(state.step_idx),
        rng=state.rng)


@partial(jax.jit, static_argnames=("cfg", "sa", "first_suppress", "dtype_name",
                                   "attn_impl"),
         donate_argnames=("k_cache", "v_cache"))
def prefill_batch(params, cfg: T2SConfig, x_ids, y_ids, bert, x_lens, y_lens,
                  k_cache, v_cache, rng, sa: SampleArgs, first_suppress: bool,
                  dtype_name: str = "float32", attn_impl: str = "xla"):
    """Full-batch prefill into fresh caches; samples the first token per row
    (reference prefill + first sample, ``t2s_model.py:414-421,608-616``)."""
    dtype = jnp.dtype(dtype_name)
    B = x_ids.shape[0]
    xy_pos, mask, last_mask = t2s_model.embed_prompt_batch(
        params, cfg, x_ids, y_ids, bert, x_lens, y_lens, dtype)
    h, ks, vs = t2s_model.transformer_prefill(
        params, cfg, xy_pos, mask, lens=(x_lens, x_lens + y_lens),
        impl=_prefill_impl(attn_impl))
    T = xy_pos.shape[1]
    k_cache = jax.lax.dynamic_update_slice(k_cache, ks, (0, 0, 0, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, vs, (0, 0, 0, 0, 0))

    h_last = jnp.sum(h * last_mask[:, :, None].astype(h.dtype), axis=1)  # [B, D]
    logits = h_last @ params["predict_w"]

    S = k_cache.shape[2]
    xy_lens = x_lens + y_lens
    # token buffer: y prompt tokens first (for repetition penalty), sentinel V elsewhere
    pos = jnp.arange(S)[None, :]
    sentinel = jnp.full((B, S), cfg.vocab_size, I32)
    y_gather = jnp.take_along_axis(
        y_ids, jnp.clip(pos, 0, y_ids.shape[1] - 1), axis=1).astype(I32)
    tok_buf = jnp.where(pos < y_lens[:, None], y_gather, sentinel)

    rng, sub = jax.random.split(rng)
    g = jax.random.gumbel(sub, (B, cfg.vocab_size), F32)
    suppress = jnp.ones((B,), bool) if first_suppress else jnp.zeros((B,), bool)
    tok = _sample_logits(g, logits, tok_buf, sa, cfg.vocab_size, True,
                         suppress, cfg.suppressed_tokens if first_suppress else ())

    tok_buf = tok_buf.at[jnp.arange(B), y_lens].set(tok)
    state = DecodeState(
        k_cache=k_cache, v_cache=v_cache,
        kv_len=xy_lens.astype(I32), x_len=x_lens.astype(I32),
        tok_buf=tok_buf, buf_len=(y_lens + 1).astype(I32),
        last_tok=tok, step_idx=jnp.ones((B,), I32), rng=rng,
    )
    return state, tok


@partial(jax.jit, static_argnames=("cfg", "sa", "dtype_name", "attn_impl"),
         donate_argnames=("state",))
def prefill_slot(params, cfg: T2SConfig, state: DecodeState, slot,
                 x_ids, y_ids, bert, x_len, y_len, sa: SampleArgs,
                 dtype_name: str = "float32", attn_impl: str = "xla"):
    """Continuous-batching slot refill (``t2s_model.py:696-722``): prefill one
    request into cache slot ``slot`` while other slots keep decoding.  Uses the
    packed ragged embedding so padded inputs compact to [x | y | pad]."""
    dtype = jnp.dtype(dtype_name)
    Ly = y_ids.shape[1]
    xy_len = (x_len + y_len).astype(I32)
    xy_pos, mask, last_mask = t2s_model.embed_prompt_batch(
        params, cfg, x_ids, y_ids, bert,
        x_len.reshape(1), y_len.reshape(1), dtype)
    # padded rows must still attend somewhere to avoid NaN softmax rows
    mask = mask | (jnp.arange(mask.shape[-1])[None, None, :] == 0)

    h, ks, vs = t2s_model.transformer_prefill(
        params, cfg, xy_pos, mask,
        lens=(x_len.reshape(1), xy_len.reshape(1)),
        impl=_prefill_impl(attn_impl))
    h_last = jnp.sum(h * last_mask[:, :, None].astype(h.dtype), axis=1)[0]

    k_cache = jax.lax.dynamic_update_slice(state.k_cache, ks, (0, slot, 0, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(state.v_cache, vs, (0, slot, 0, 0, 0))

    logits = (h_last @ params["predict_w"])[None, :]
    rng, sub = jax.random.split(state.rng)
    g = jax.random.gumbel(sub, (1, cfg.vocab_size), F32)
    tok = _sample_logits(g, logits, None, dataclasses.replace(sa, use_prev=False),
                         cfg.vocab_size, True, jnp.zeros((1,), bool), ())[0]

    S = state.k_cache.shape[2]
    posS = jnp.arange(S)
    y_gather = jnp.take(y_ids[0], jnp.clip(posS, 0, Ly - 1)).astype(I32)
    row_buf = jnp.where(posS < y_len, y_gather, cfg.vocab_size)
    row_buf = row_buf.at[y_len].set(tok)

    return DecodeState(
        k_cache=k_cache, v_cache=v_cache,
        kv_len=state.kv_len.at[slot].set(xy_len.astype(jnp.int32)),
        x_len=state.x_len.at[slot].set(x_len.astype(jnp.int32)),
        tok_buf=jax.lax.dynamic_update_slice(state.tok_buf, row_buf[None, :], (slot, 0)),
        buf_len=state.buf_len.at[slot].set((y_len + 1).astype(jnp.int32)),
        last_tok=state.last_tok.at[slot].set(tok),
        step_idx=state.step_idx.at[slot].set(1),
        rng=rng,
    ), tok


@partial(jax.jit, static_argnames=("cfg", "sa", "dtype_name", "attn_impl"),
         donate_argnames=("state",))
def prefill_slots(params, cfg: T2SConfig, state: DecodeState, slots,
                  x_ids, y_ids, bert, x_lens, y_lens, sa: SampleArgs,
                  dtype_name: str = "float32", attn_impl: str = "xla"):
    """Batched slot refill: prefill ``k`` requests into cache slots
    ``slots`` ([k] i32) in ONE dispatch.  Semantically k sequential
    :func:`prefill_slot` calls (the reference refills one slot at a time,
    ``t2s_model.py:696-722``), but burst arrivals pay one weight read and
    one program launch instead of k — the prefill transformer runs batched
    over the k rows.  Inputs are [k, Lx] / [k, Ly] / [k, Lx, bert_dim]
    padded to common shape buckets; ``slots`` must be distinct.

    Returns ``(state, toks [k])``.  Sampling draws ONE batched Gumbel
    tensor (one rng split total, not one per request) — greedy (top_k=1)
    tokens are rng-independent and match the sequential path exactly."""
    dtype = jnp.dtype(dtype_name)
    k, Ly = y_ids.shape
    xy_lens = (x_lens + y_lens).astype(I32)
    xy_pos, mask, last_mask = t2s_model.embed_prompt_batch(
        params, cfg, x_ids, y_ids, bert, x_lens, y_lens, dtype)
    # padded rows must still attend somewhere to avoid NaN softmax rows
    # (same guard as prefill_slot)
    mask = mask | (jnp.arange(mask.shape[-1])[None, None, :] == 0)

    h, ks, vs = t2s_model.transformer_prefill(
        params, cfg, xy_pos, mask, lens=(x_lens, xy_lens),
        impl=_prefill_impl(attn_impl))
    k_cache, v_cache = state.k_cache, state.v_cache
    for j in range(k):  # k is static; slots[j] is a traced scalar start
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, ks[:, j:j + 1], (0, slots[j], 0, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, vs[:, j:j + 1], (0, slots[j], 0, 0, 0))

    h_last = jnp.sum(h * last_mask[:, :, None].astype(h.dtype), axis=1)  # [k, D]
    logits = h_last @ params["predict_w"]
    rng, sub = jax.random.split(state.rng)
    g = jax.random.gumbel(sub, (k, cfg.vocab_size), F32)
    toks = _sample_logits(g, logits, None,
                          dataclasses.replace(sa, use_prev=False),
                          cfg.vocab_size, True, jnp.zeros((k,), bool), ())

    S = state.k_cache.shape[2]
    posS = jnp.arange(S)[None, :]
    y_gather = jnp.take_along_axis(
        y_ids, jnp.clip(posS, 0, Ly - 1).repeat(k, axis=0), axis=1).astype(I32)
    row_bufs = jnp.where(posS < y_lens[:, None], y_gather, cfg.vocab_size)
    row_bufs = row_bufs.at[jnp.arange(k), y_lens].set(toks)
    tok_buf = state.tok_buf
    for j in range(k):
        tok_buf = jax.lax.dynamic_update_slice(
            tok_buf, row_bufs[j:j + 1], (slots[j], jnp.int32(0)))

    return DecodeState(
        k_cache=k_cache, v_cache=v_cache,
        kv_len=state.kv_len.at[slots].set(xy_lens),
        x_len=state.x_len.at[slots].set(x_lens.astype(I32)),
        tok_buf=tok_buf,
        buf_len=state.buf_len.at[slots].set((y_lens + 1).astype(I32)),
        last_tok=state.last_tok.at[slots].set(toks),
        step_idx=state.step_idx.at[slots].set(1),
        rng=rng,
    ), toks


@partial(jax.jit, static_argnames=("cfg", "sa", "n_steps", "suppress_until", "dtype_name",
                                   "attn_impl"),
         donate_argnames=("state",))
def decode_chunk(params, cfg: T2SConfig, state: DecodeState, n_steps: int,
                 sa: SampleArgs, suppress_until: int = 0,
                 dtype_name: str = "float32", attn_impl: str = "xla"):
    """Generate ``n_steps`` tokens in one dispatch (inner ``lax.scan``).

    Mirrors the decode loop body of ``t2s_model.py:425-456``: embed last token
    with the audio positional entry ``pe[kv_len - x_len]``, run all layers over
    the cache, sample (with suppression while ``step_idx < suppress_until``).
    Returns the new state and the sampled tokens ``[n_steps, B]``.
    """
    dtype = jnp.dtype(dtype_name)
    B = state.kv_len.shape[0]
    bidx = jnp.arange(B)

    # ONE key split + ONE Gumbel tensor for the whole dispatch (all attn
    # impls share this chain, so cross-impl token parity holds); a per-step
    # split + draw inside the scan measured ~0.2 ms/step at B=4 on v5e
    rng, sub = jax.random.split(state.rng)
    noise = jax.random.gumbel(sub, (n_steps, B, cfg.vocab_size), F32)
    state = dataclasses.replace(state, rng=rng)
    buf_len0 = state.buf_len

    def finish_tok_buf(state, toks):
        # with the repetition penalty off, the scan skips per-step token
        # writes; reconstruct the buffer in one batched write (harvest and
        # slot refill read it)
        if sa.use_prev:
            return state
        pos = buf_len0[:, None] + jnp.arange(n_steps)[None, :]
        tb = state.tok_buf.at[bidx[:, None], pos].set(toks.T)
        return dataclasses.replace(state, tok_buf=tb)

    D = cfg.hidden_dim
    S = state.k_cache.shape[2]
    # measurement-only phase ablation ("fused_step:<mode>", bench.py
    # --breakdown): strip the suffix before impl dispatch
    attn_impl, _, ablate = attn_impl.partition(":")
    ablate = ablate or None
    # the fused kernels' attention walk (pl.ds over block_s windows) and
    # repetition-penalty tok_buf sweep (128-row chunks) require the cache
    # bucket length to be a 128-multiple; gpt_cache is user config, so gate
    # rather than corrupt attention on an odd bucket
    fused_ok = D % 128 == 0 and S % 128 == 0
    # "fused_step_q8": int8 weight-streaming variant of the whole-step
    # kernels — halves the packed-weight DMA.  B=1 and B in 2..6 both run
    # their quantized kernels (the batched one also unlocks 128-row walk
    # blocks); only the B>6 flash fallback stays bf16.
    quant = attn_impl in ("fused_step_q8", "fused_step_q8_interpret")
    # "fused_step_q4": int4 nibble stream — halves the q8 DMA again (r5)
    quant4 = attn_impl in ("fused_step_q4", "fused_step_q4_interpret")
    fused_impls = ("fused_step", "fused_step_interpret",
                   "fused_step_q8", "fused_step_q8_interpret",
                   "fused_step_q4", "fused_step_q4_interpret")
    interp_impls = ("fused_step_interpret", "fused_step_q8_interpret",
                    "fused_step_q4_interpret")
    fused_sample = attn_impl in fused_impls and B == 1 and fused_ok
    # B > 6 falls back to flash+XLA: the 2-slot weight scratch no longer fits
    # the 16 MiB scoped-vmem budget, and measured scaling says it wouldn't
    # pay anyway (B=4: 0.54 ms/step; B=6: 1.07 — the per-row VPU loops and
    # [B, Vp] sampling peels pad 6 rows to 8 sublanes, so two B=4 waves beat
    # any B > 4 config per chip).  EXCEPTION: q8 + shared softmax (":shsm")
    # or the exact vectorized softmax (":vec") drop both blockers (6.3 MiB
    # int8 pages, no per-row loops) and gate up to B = 8.
    max_fused_b = 8 if ((quant or quant4) and ablate and
                        (ablate.startswith("shsm") or
                         ablate.startswith("vec"))) else 6
    fused_sample_b = attn_impl in fused_impls and 1 < B <= max_fused_b \
        and fused_ok
    if attn_impl in interp_impls and not (fused_sample or fused_sample_b):
        # the generic path would otherwise hand an interpret impl to the
        # REAL flash-decode kernel (no interpret lowering on CPU)
        attn_impl = "xla"
    if attn_impl in fused_impls and not (fused_sample or fused_sample_b) \
            and not fused_ok:
        # the S/D%128 gate must ALSO bind the generic fallback: left as
        # "fused_step", transformer_decode_step would re-enter the fused
        # attention kernel (it checks only B==1 and D%128), whose BLOCK_S
        # walk runs its last pl.ds window past an odd-S cache
        attn_impl = "xla"
    if fused_sample_b:
        # batched whole-step kernel (``ops/fused_step.py:_kernel_sample_b``):
        # the packed weight stream is amortized over B slots; only the K/V
        # row scatter and the counter updates stay in XLA per step
        from ..ops.fused_step import (_round_up_128, fused_decode_step_sample_batched,
                                      pack_bias_page, pack_layer_weights,
                                      pad_rows8)

        V = cfg.vocab_size
        Vp = _round_up_128(V)
        L, _, S, H, Dh = state.k_cache.shape
        params = dict(params)
        params.setdefault("predict_w_padded", jnp.pad(
            params["predict_w"], ((0, 0), (0, Vp - V))))
        if quant4:
            from ..ops.fused_step import pack_layer_weights_int4

            if "layers_packed_q4" not in params:
                q4, scale4 = pack_layer_weights_int4(params["layers"])
                params["layers_packed_q4"] = q4
                params["layers_scale_page_q4"] = scale4
        elif quant:
            from ..ops.fused_step import pack_layer_weights_int8

            if "layers_packed_q8" not in params:
                q8, scale = pack_layer_weights_int8(params["layers"])
                params["layers_packed_q8"] = q8
                params["layers_scale_page"] = scale
        else:
            params.setdefault("layers_packed",
                              pack_layer_weights(params["layers"]))
        params.setdefault("bias_page", pack_bias_page(params["layers"]))
        params.setdefault("audio_emb_padded", pad_rows8(params["audio_emb"]))
        noise = jnp.pad(noise, ((0, 0), (0, 0), (0, Vp - V)))

        def step(st: DecodeState, g):
            tok, _, kc, vc = fused_decode_step_sample_batched(
                params, st.k_cache, st.v_cache, st.tok_buf,
                st.kv_len, st.x_len, st.last_tok, st.buf_len, st.step_idx,
                g, sa=sa, suppress_until=suppress_until,
                suppressed=cfg.suppressed_tokens + (cfg.eos,),
                interpret=(attn_impl in interp_impls), quant=quant,
                quant4=quant4, ablate=ablate)
            new = DecodeState(
                k_cache=kc, v_cache=vc,
                kv_len=st.kv_len + 1, x_len=st.x_len,
                tok_buf=_append_tok(st.tok_buf, st.buf_len, tok)
                if sa.use_prev else st.tok_buf,
                buf_len=st.buf_len + 1,
                last_tok=tok, step_idx=st.step_idx + 1, rng=st.rng,
            )
            return new, tok

        state, toks = jax.lax.scan(step, state, noise)
        return finish_tok_buf(state, toks), toks.T
    if fused_sample:
        # the whole step — embed, layers, KV append, logits head, sampling —
        # runs as ONE kernel launch (``ops/fused_step.py:_kernel_sample``);
        # per-step XLA shrinks to the tok_buf append + counters
        from ..ops.fused_step import (fused_decode_step_sample,
                                      pack_layer_weights, pad_rows8,
                                      _round_up_128)

        V = cfg.vocab_size
        Vp = _round_up_128(V)
        params = dict(params)
        # DELIBERATELY materialized per dispatch inside the jit: streaming
        # weights from a fresh jit-local temp measured 2962 tok/s vs 2652
        # from a precomputed long-lived input buffer (and in-jit beat even
        # the unpacked 4-DMA input streams, 2780) — XLA gives temps a
        # consumer-friendly placement that persistent params don't get
        params.setdefault("predict_w_padded", jnp.pad(
            params["predict_w"], ((0, 0), (0, Vp - V))))
        if quant4:
            from ..ops.fused_step import pack_layer_weights_int4

            if "layers_packed_q4" not in params:
                q4, scale4 = pack_layer_weights_int4(params["layers"])
                params["layers_packed_q4"] = q4
                params["layers_scale_page_q4"] = scale4
        elif quant:
            from ..ops.fused_step import pack_layer_weights_int8

            if "layers_packed_q8" not in params:
                q8, scale = pack_layer_weights_int8(params["layers"])
                params["layers_packed_q8"] = q8
                params["layers_scale_page"] = scale
        else:
            params.setdefault("layers_packed",
                              pack_layer_weights(params["layers"]))
        params.setdefault("audio_emb_padded", pad_rows8(params["audio_emb"]))
        noise = jnp.pad(noise, ((0, 0), (0, 0), (0, Vp - V)))

        def step(st: DecodeState, g):
            tok, _, kc, vc = fused_decode_step_sample(
                params, st.k_cache, st.v_cache, st.tok_buf,
                st.kv_len, st.x_len, st.last_tok, st.buf_len, st.step_idx,
                g, sa=sa, suppress_until=suppress_until,
                suppressed=cfg.suppressed_tokens + (cfg.eos,),
                interpret=(attn_impl in interp_impls),
                quant=quant, quant4=quant4, ablate=ablate)
            new = DecodeState(
                k_cache=kc, v_cache=vc,
                kv_len=st.kv_len + 1, x_len=st.x_len,
                tok_buf=_append_tok(st.tok_buf, st.buf_len, tok)
                if sa.use_prev else st.tok_buf,
                buf_len=st.buf_len + 1,
                last_tok=tok, step_idx=st.step_idx + 1, rng=st.rng,
            )
            return new, tok

        state, toks = jax.lax.scan(step, state, noise)
        return finish_tok_buf(state, toks), toks.T

    def step(st: DecodeState, g):
        pe_idx = st.kv_len - st.x_len
        pe = (params["audio_pos_alpha"] * params["pe"][pe_idx]).astype(dtype)
        x = jnp.take(params["audio_emb"], st.last_tok, axis=0).astype(dtype) + pe

        h, kc, vc = t2s_model.transformer_decode_step(
            params, cfg, x, st.k_cache, st.v_cache, st.kv_len, attn_impl)
        logits = h @ params["predict_w"]

        suppress = st.step_idx < suppress_until
        tok = _sample_logits(g, logits, st.tok_buf, sa, cfg.vocab_size, False,
                             suppress, cfg.suppressed_tokens + (cfg.eos,) if suppress_until else ())

        new = DecodeState(
            k_cache=kc, v_cache=vc,
            kv_len=st.kv_len + 1, x_len=st.x_len,
            tok_buf=_append_tok(st.tok_buf, st.buf_len, tok)
            if sa.use_prev else st.tok_buf,
            buf_len=st.buf_len + 1,
            last_tok=tok, step_idx=st.step_idx + 1, rng=st.rng,
        )
        return new, tok

    state, toks = jax.lax.scan(step, state, noise)
    return finish_tok_buf(state, toks), toks.T  # [B, n_steps]


# ---------------------------------------------------------------------------
# Host-side engine
# ---------------------------------------------------------------------------

PAD_MULTIPLE = 32


class T2SEngine:
    """Host orchestration of generation (reference ``infer`` /
    ``infer_stream`` / ``infer_batched``, ``t2s_model.py:385-734``)."""

    def __init__(self, params, cfg: T2SConfig, gpt_cache: List[Tuple[int, int]],
                 dtype=jnp.float32, check_interval: int = 5,
                 initial_suppression_steps: int = 10, attn_impl: str = "xla"):
        self.params = params
        self.cfg = cfg
        self.attn_impl = attn_impl
        self.dtype = jnp.dtype(dtype)
        self.check_interval = check_interval
        self.initial_suppression_steps = initial_suppression_steps
        self.mesh = None  # set by .shard() for multi-chip inference
        # observability counters (asserted by tpu_smoke's real-chip drives)
        self.compactions = 0
        self.refills = 0
        # buckets[batch_size] = sorted list of max_kv_cache lengths
        self.buckets: Dict[int, List[int]] = {}
        for b, s in gpt_cache:
            self.buckets.setdefault(b, [])
            if s not in self.buckets[b]:
                self.buckets[b].append(s)
        for b in self.buckets:
            self.buckets[b].sort()

    # -- helpers -----------------------------------------------------------

    def _dtype_name(self):
        return self.dtype.name

    def _pick_bucket(self, batch_size: int, prompt_len: int) -> Tuple[int, int]:
        sizes = sorted(self.buckets.keys())
        B = next((b for b in sizes if b >= batch_size), sizes[-1])
        lens = self.buckets[B]
        S = next((s for s in lens if s > prompt_len), lens[-1])
        if S <= prompt_len:
            raise ValueError(
                f"prompt length {prompt_len} exceeds largest gpt_cache bucket {lens[-1]}")
        return B, S

    def shard(self, mesh) -> "T2SEngine":
        """Multi-chip inference (new capability vs the single-GPU reference):
        tp-shard the transformer weights over the mesh's ``tp`` axis and lay
        KV caches out as [L, B(dp), S, H(tp), Dh].  The same jitted
        prefill/decode programs then run under GSPMD, which inserts the ICI
        collectives (all-reduce after row-parallel matmuls).  The Pallas
        attention kernels are single-device, so sharded engines use the XLA
        attention path."""
        from ..parallel.mesh import shard_t2s_params

        self.mesh = mesh
        self.params = shard_t2s_params(self.params, mesh)
        self.attn_impl = "xla"
        return self

    def _cache_sharding(self, B: int):
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp, tp = self.mesh.shape["dp"], self.mesh.shape["tp"]
        return NamedSharding(self.mesh, P(
            None, "dp" if dp > 1 and B % dp == 0 else None, None,
            "tp" if self.cfg.num_heads % tp == 0 else None, None))

    def _alloc_cache(self, B: int, S: int):
        c = self.cfg
        shape = (c.num_layers, B, S, c.num_heads, c.head_dim)
        k = jnp.zeros(shape, self.dtype)
        v = jnp.zeros(shape, self.dtype)
        if self.mesh is not None:
            s = self._cache_sharding(B)
            k, v = jax.device_put(k, s), jax.device_put(v, s)
        return k, v

    def _escalate(self, state: DecodeState, new_S: int) -> DecodeState:
        """Bucket escalation (``t2s_model.py:425-428``): grow cache to the next
        length bucket.  One pad-copy; afterwards the larger jit specialization
        takes over."""
        S = state.k_cache.shape[2]
        pad = [(0, 0), (0, 0), (0, new_S - S), (0, 0), (0, 0)]
        return dataclasses.replace(
            state,
            k_cache=jnp.pad(state.k_cache, pad),
            v_cache=jnp.pad(state.v_cache, pad),
            tok_buf=jnp.pad(state.tok_buf, [(0, 0), (0, new_S - S)],
                            constant_values=self.cfg.vocab_size),
        )

    def _pad_prompt(self, x: np.ndarray, y: np.ndarray, bert: np.ndarray):
        """Pad (x, y, bert) to shape buckets to bound jit specializations."""
        Lx = _round_up(max(len(x), 1), PAD_MULTIPLE)
        Ly = _round_up(max(len(y), 1), PAD_MULTIPLE)
        xp = np.zeros((Lx,), np.int32)
        xp[: len(x)] = x
        yp = np.zeros((Ly,), np.int32)
        yp[: len(y)] = y
        bp = np.zeros((Lx, bert.shape[-1]), np.float32)
        bp[: len(x)] = bert
        return xp, yp, bp

    def _pad_prompts(self, items, B: Optional[int] = None):
        """Stack k prompts padded to common 32-multiple ``(Lx, Ly)`` shapes
        (the batched analogue of :meth:`_pad_prompt`; one jit
        specialization per shape pair).  ``items`` is a list of
        ``(x, y, bert)``; rows past ``len(items)`` (up to ``B``) stay
        zero with 1/1 dummy lengths for dead slots.  Returns
        ``(xs, ys, bs, x_lens, y_lens)``.  A batched prefill of this
        group writes ``xs.shape[1] + ys.shape[1]`` cache rows per slot —
        callers must check that against the target bucket (the common
        pad can exceed every per-request :func:`prompt_rows` when x/y
        splits are mismatched across the group)."""
        B = len(items) if B is None else B
        Lx = _round_up(max(max(len(x) for x, _, _ in items), 1), PAD_MULTIPLE)
        Ly = _round_up(max(max(len(y) for _, y, _ in items), 1), PAD_MULTIPLE)
        xs = np.zeros((B, Lx), np.int32)
        ys = np.zeros((B, Ly), np.int32)
        bs = np.zeros((B, Lx, self.cfg.bert_dim), np.float32)
        x_lens = np.ones((B,), np.int32)
        y_lens = np.ones((B,), np.int32)
        for n, (x, y, bert) in enumerate(items):
            xs[n, : len(x)] = x
            ys[n, : len(y)] = y
            bs[n, : len(x)] = np.asarray(bert, np.float32).reshape(len(x), -1)
            x_lens[n] = len(x)
            y_lens[n] = len(y)
        return xs, ys, bs, x_lens, y_lens

    def _prepare_chunk(self, state: DecodeState, live_mask: List[bool],
                       n_steps: int) -> Tuple[DecodeState, int, int]:
        """Pre-chunk bucket bookkeeping shared by
        :meth:`generate_batched_stream` and the wave scheduler
        (``runtime/wave.py`` — one definition so a fix covers both):

        * escalate to a bigger S bucket when the ACTIVE slots near the
          edge (keyed on live slots only: decode_chunk advances kv_len
          for frozen slots too, so a long-dead slot's phantom kv would
          drive spurious escalations);
        * clamp the chunk to the tightest active slot's room when no
          bigger bucket exists — a slot REFILLED within check_interval
          of the largest bucket has not passed the post-chunk retire
          check yet, and unclamped its K/V append would write past the
          cache edge (the XLA DUS clamps the start index and silently
          overwrites the last valid rows; the TPU kernel's RMW window
          runs out of bounds).  attach/refill guards keep kv <= S-1, so
          at least one step always fits;
        * re-freeze dead slots whose phantom kv nears the edge.

        Returns ``(state, n_steps, S_cur)``."""
        B = len(live_mask)
        S_cur = state.k_cache.shape[2]
        kv = np.asarray(state.kv_len)
        kv_active = max((int(kv[j]) for j in range(B) if live_mask[j]),
                        default=0)
        if kv_active + n_steps >= S_cur:
            bigger = [s for s in self.buckets[B] if s > S_cur]
            if bigger:
                state = self._escalate(state, bigger[0])
                S_cur = bigger[0]
        if kv_active + n_steps > S_cur:
            n_steps = max(1, S_cur - kv_active)
        assert kv_active + n_steps <= S_cur, (kv_active, n_steps, S_cur)
        for j in range(B):
            if not live_mask[j] and int(kv[j]) + n_steps >= S_cur:
                state = freeze_slot(state, j)
        return state, n_steps, S_cur

    def _ensure_rows(self, state: DecodeState, B: int,
                     need: int) -> Optional[DecodeState]:
        """Escalate ``state`` until its cache holds ``need`` rows.  Returns
        the (possibly grown) state, or None when no ``gpt_cache`` bucket
        at this batch size fits — an unchecked prefill would shape-error
        out of the jit and take every slot in the wave down with it."""
        S_cur = state.k_cache.shape[2]
        if need <= S_cur:
            return state
        new_S = next((s for s in self.buckets[B] if s >= need), None)
        if new_S is None:
            return None
        return self._escalate(state, new_S)

    def _retire_after_chunk(self, last_sample: int, kv_j: int, B: int,
                            S_cur: int) -> bool:
        """Post-chunk retire check shared by :meth:`generate_batched_stream`
        and the wave scheduler: the reference checks EOS only on the
        interval's LAST sample (``t2s_model.py:655``); a slot within one
        check interval of the LARGEST S bucket's edge also retires — there
        is no escalation room left for another full chunk."""
        if last_sample == self.cfg.eos:
            return True
        return (kv_j + self.check_interval >= S_cur
                and not [s for s in self.buckets[B] if s > S_cur])

    def _refill_slots_prefill(self, state: DecodeState, slot_idx: List[int],
                              items, sa: "SampleArgs"
                              ) -> Tuple[DecodeState, bool]:
        """Prefill ``items`` (``(x, y, bert)`` tuples) into ``slot_idx`` —
        the refill dispatch shared by :meth:`generate_batched_stream` and
        the wave scheduler.  Several requests arriving together pay ONE
        batched dispatch (``prefill_slots``: one weight read + launch
        instead of k) when the group-padded ``[Lx|Ly]`` block fits a cache
        bucket at this batch size; otherwise (mismatched x/y splits can pad
        the GROUP past every bucket although each request fits alone) they
        fall back to one-at-a-time ``prefill_slot`` dispatches.  Escalates
        the sequence bucket as needed; raises ``ValueError`` when a single
        request fits no bucket at this batch size (an unchecked prefill
        would shape-error out of the jit and take every slot in the wave
        down with it).  Returns ``(state, used_batched_dispatch)``."""
        B = state.k_cache.shape[0]
        items = [(np.asarray(x, np.int32), np.asarray(y, np.int32),
                  np.asarray(b, np.float32).reshape(len(x), -1))
                 for x, y, b in items]
        group = self._pad_prompts(items) if len(items) > 1 else None
        if group is not None:
            g_need = max(group[0].shape[1] + group[1].shape[1],
                         max(prompt_rows(x, y) for x, y, _ in items))
            new_state = self._ensure_rows(state, B, g_need)
            if new_state is None:
                group = None
            else:
                state = new_state
        if group is not None:
            xr, yr, br, xlr, ylr = group
            state, _ = prefill_slots(
                self.params, self.cfg, state,
                jnp.asarray(slot_idx, I32),
                jnp.asarray(xr), jnp.asarray(yr), jnp.asarray(br),
                jnp.asarray(xlr), jnp.asarray(ylr),
                sa, self._dtype_name(), self.attn_impl)
            return state, True
        for j, (x, y, b) in zip(slot_idx, items):
            new_state = self._ensure_rows(state, B, prompt_rows(x, y))
            if new_state is None:
                raise ValueError(
                    f"prompt for slot {j} needs {prompt_rows(x, y)} cache "
                    f"rows; no gpt_cache bucket at B={B} holds it")
            state = new_state
            xp, yp, bp = self._pad_prompt(x, y, b)
            state, _ = prefill_slot(
                self.params, self.cfg, state, j,
                jnp.asarray(xp[None]), jnp.asarray(yp[None]),
                jnp.asarray(bp[None]),
                jnp.asarray(len(x), I32), jnp.asarray(len(y), I32),
                sa, self._dtype_name(), self.attn_impl)
        return state, False

    def _gather_live(self, state: DecodeState, live_idx: List[int],
                     new_B: int) -> Optional[DecodeState]:
        """Re-pack the live slots into a ``new_B``-slot state (growth or
        tail compaction; one on-device gather copy, no re-prefill) — shared
        by :meth:`generate_batched_stream` and the wave scheduler.  Returns
        None when no sequence bucket at ``new_B`` holds the longest
        survivor."""
        kv = np.asarray(state.kv_len)
        need = int(max((kv[k] for k in live_idx), default=0))
        new_S = next((s for s in self.buckets[new_B] if s > need), None)
        if new_S is None:
            return None
        slot_map = np.full((new_B,), -1, np.int32)
        keep = live_idx[:new_B]
        slot_map[: len(keep)] = keep
        return _gather_slots(state, jnp.asarray(slot_map), new_S,
                             self.cfg.vocab_size)

    # -- single-utterance generation (``t2s_model.py:385-464``) ------------

    def generate(self, x_ids, y_ids, bert, top_k=15, top_p=1.0, temperature=1.0,
                 repetition_penalty=1.35, rng: Optional[jax.Array] = None,
                 stream_chunk: Optional[int] = None,
                 boost_first_chunk: bool = False):
        """Greedy-loop generation for B=1.  Returns list of generated tokens
        (first post-prefill sample excluded, EOS trimmed — mirroring
        ``t2s_model.py:458-464``).  If ``stream_chunk`` is set, instead acts
        as a generator yielding ``(tokens_so_far, is_final)`` like
        ``infer_stream`` (``t2s_model.py:466-553``)."""
        if stream_chunk is not None:
            return self._generate_stream(
                x_ids, y_ids, bert, top_k, top_p, temperature,
                repetition_penalty, rng, stream_chunk, boost_first_chunk,
                stream_final_semantics=True)
        toks = None
        for toks, is_final in self._generate_stream(
                x_ids, y_ids, bert, top_k, top_p, temperature,
                repetition_penalty, rng, stream_chunk=1 << 30):
            pass
        return toks

    def _generate_stream(self, x_ids, y_ids, bert, top_k, top_p, temperature,
                         repetition_penalty, rng, stream_chunk,
                         boost_first_chunk: bool = False,
                         stream_final_semantics: bool = False):
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        x_ids = np.asarray(x_ids, np.int32).reshape(-1)
        y_ids = np.asarray(y_ids, np.int32).reshape(-1)
        bert = np.asarray(bert, np.float32).reshape(len(x_ids), -1)

        sa = SampleArgs(top_k=top_k, top_p=top_p, temperature=temperature,
                        repetition_penalty=repetition_penalty, use_prev=True)
        xp, yp, bp = self._pad_prompt(x_ids, y_ids, bert)
        prompt_len = len(x_ids) + len(y_ids)
        # _pick_bucket tolerates a missing batch-1 bucket (nearest B >=
        # 1), so the escalation ladder must come from the SAME bucket
        # list — reading self.buckets[1] directly would KeyError mid-
        # request on a batch-only gpt_cache
        pick_B, S = self._pick_bucket(1, max(prompt_len + 1, len(xp) + len(yp)))
        s_ladder = self.buckets[pick_B]
        k_cache, v_cache = self._alloc_cache(1, S)

        state, tok0 = prefill_batch(
            self.params, cfg, xp[None], yp[None], bp[None],
            jnp.asarray([len(x_ids)], I32), jnp.asarray([len(y_ids)], I32),
            k_cache, v_cache, rng, sa, True, self._dtype_name(),
            self.attn_impl)
        # NOTE: embed_prompt_batch packs each row as [x | y | pad] — valid
        # tokens are contiguous, so every kv position < kv_len holds real
        # prompt state and padded positions never enter the attended region.
        # No compaction pass is needed after prefill.
        del k_cache, v_cache

        generated: List[int] = [int(np.asarray(tok0)[0])]
        eos_at = None
        idx = 0
        chunk_accum = 0
        first_chunk = True
        pre_chunk = None
        while True:
            cur_S = state.k_cache.shape[2]
            kv = int(state.kv_len[0])
            if kv >= cur_S:
                # bucket escalation, or stop when the largest bucket is full
                # (the reference decodes until the cache is exactly full,
                # ``t2s_model.py:425``)
                bigger = [s for s in s_ladder if s > cur_S]
                if not bigger:
                    break
                state = self._escalate(state, bigger[0])
                cur_S = bigger[0]
            n = min(self.check_interval, cur_S - kv)
            state, toks = decode_chunk(
                self.params, cfg, state, n, sa,
                self.initial_suppression_steps, self._dtype_name(),
                self.attn_impl)
            toks = np.asarray(toks)[0]
            for t in toks:
                idx += 1
                generated.append(int(t))
                if int(t) == cfg.eos:
                    eos_at = len(generated) - 1
                    break
            if eos_at is not None:
                break
            chunk_accum += n
            if chunk_accum >= stream_chunk:
                chunk_accum = 0
                out = np.asarray(generated[1:], np.int64)
                if first_chunk and boost_first_chunk:
                    first_chunk = False
                    yield out[None, None, :], False
                elif pre_chunk is not None:
                    yield pre_chunk, False
                    pre_chunk = out[None, None, :]
                else:
                    pre_chunk = out[None, None, :]

        if eos_at is not None:
            # Reference quirk, reproduced for parity: in STREAM mode the
            # EOS-ended final window `pre_tokens[:, -idx:]` keeps the
            # prefill-sampled first token because the EOS concat is skipped
            # (t2s_model.py:534-553), while the non-stream `infer` (which
            # concats EOS before trimming, t2s_model.py:450-464) drops it.
            # Cap-ended runs drop it in both modes.
            start = 0 if stream_final_semantics else 1
            final = generated[start:eos_at]
        else:
            final = generated[1:]
        yield np.asarray(final, np.int64)[None, None, :], True

    # -- continuous batching (``t2s_model.py:555-734``) --------------------

    def generate_batched(self, x_list, y_list, bert_list, top_k=15, top_p=1.0,
                         temperature=1.0, repetition_penalty=1.35,
                         rng: Optional[jax.Array] = None, compact: bool = True):
        """Continuous batching with slot refill.  Returns
        (list of np token arrays, list of original indices)."""
        acc: Dict[int, List[np.ndarray]] = {}
        order: List[int] = []
        for i, toks, done in self.generate_batched_stream(
                x_list, y_list, bert_list, top_k=top_k, top_p=top_p,
                temperature=temperature, repetition_penalty=repetition_penalty,
                rng=rng, compact=compact):
            acc.setdefault(i, []).append(toks)
            if done:
                order.append(i)
        pred = [np.concatenate(acc[i]).astype(np.int64) if acc[i]
                else np.zeros(0, np.int64) for i in order]
        return pred, np.asarray(order, np.int64)

    def generate_batched_stream(self, x_list, y_list, bert_list, top_k=15,
                                top_p=1.0, temperature=1.0,
                                repetition_penalty=1.35,
                                rng: Optional[jax.Array] = None,
                                compact: bool = True, grouped: bool = False):
        """Incremental continuous batching: yields ``(orig_idx, new_tokens,
        done)`` after every decode chunk, where concatenating a request's
        ``new_tokens`` arrays reproduces its :meth:`generate_batched`
        harvest EXACTLY (same reference window semantics: the prefill
        sample and the interval's last sample are withheld until the
        harvest, and nothing past a sampled EOS is ever emitted).  This is
        the engine surface for streaming continuous-batched serving — B
        concurrent requests share the batched whole-step kernel while each
        consumer vocodes its tokens as they arrive.

        With ``grouped=True`` each iteration instead yields the LIST of
        ``(orig_idx, new_tokens, done)`` events produced by one decode
        chunk (same events, same order).  Slots cross their stream-chunk
        thresholds on the same decode step, so a consumer seeing the whole
        step at once can micro-batch its per-request vocodes
        (``tts.infer_batched_stream`` does)."""
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        N = len(x_list)
        sa = SampleArgs(top_k=top_k, top_p=top_p, temperature=temperature,
                        repetition_penalty=repetition_penalty, use_prev=False)

        sizes = sorted(self.buckets.keys())
        B = next((b for b in sizes if b >= N), sizes[-1])
        wave = list(range(min(N, B)))

        # pad the first wave to common (Lx, Ly) shapes; dead slots get a
        # 1-phoneme dummy prompt
        xs, ys, bs, x_lens, y_lens = self._pad_prompts(
            [(np.asarray(x_list[i], np.int32), np.asarray(y_list[i], np.int32),
              np.asarray(bert_list[i], np.float32)) for i in wave], B)
        Lx, Ly = xs.shape[1], ys.shape[1]

        prompt_max = int((x_lens + y_lens).max())
        _, S = self._pick_bucket(B, max(prompt_max + 1, Lx + Ly))
        k_cache, v_cache = self._alloc_cache(B, S)

        # NOTE on padding: embed_prompt_batch packs rows as [x_i | y_i | pad],
        # so padded columns never enter the cache-valid region.
        state, _ = prefill_batch(
            self.params, cfg, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(bs),
            jnp.asarray(x_lens), jnp.asarray(y_lens),
            k_cache, v_cache, rng, sa, False, self._dtype_name(),
            self.attn_impl)
        del k_cache, v_cache

        slot_orig = list(wave) + [-1] * (B - len(wave))
        slot_start = [int(x_lens[j] + y_lens[j]) for j in range(B)]  # kv pos where generation started
        slot_steps = [0] * B  # decode steps taken for current request
        # incremental-emission state (one shared definition with the wave
        # scheduler — see :class:`SlotHarvest`)
        slot_harvest = [SlotHarvest() for _ in range(B)]
        ignore = [j >= len(wave) for j in range(B)]
        next_req = len(wave)

        # the reference's decode loop checks at GLOBAL steps 1, 6, 11, ...
        # (``for idx in range(1000)`` with ``idx % check_interval == 0``,
        # t2s_model.py:634-655), so the first chunk is 1 step and the rest
        # are check_interval; slot refills inherit the global phase
        first_chunk = True
        events: List[tuple] = []
        refill_jobs: List[Tuple[int, int]] = []
        while not all(ignore):
            n_steps = 1 if first_chunk else self.check_interval
            first_chunk = False
            state, n_steps, S_cur = self._prepare_chunk(
                state, [not ig for ig in ignore], n_steps)
            state, toks = decode_chunk(
                self.params, cfg, state, n_steps, sa, 0,
                self._dtype_name(), self.attn_impl)
            toks = np.asarray(toks)  # [B, n_steps]
            for j in range(B):
                slot_steps[j] += n_steps
                if not ignore[j]:
                    slot_harvest[j].extend(toks[j])
            kv = np.asarray(state.kv_len)
            buf = None
            for j in range(B):
                if ignore[j]:
                    continue
                # stream out newly-final tokens (shared window semantics
                # with the wave scheduler — SlotHarvest.drain_stream)
                out = slot_harvest[j].drain_stream(cfg.eos)
                if out is not None:
                    events.append((slot_orig[j], out, False))
                    if not grouped:
                        yield events.pop()
                if not self._retire_after_chunk(int(toks[j][-1]),
                                                int(kv[j]), B, S_cur):
                    continue
                if buf is None:
                    buf = np.asarray(state.tok_buf)
                # harvest (``t2s_model.py:674-679``): the reference window
                # ``pre_tokens[i, kv-steps+1 : kv]`` excludes both the first
                # post-prefill sample AND the last written sample, then trims
                # at the first EOS — here read from the device tok_buf (the
                # host-accumulated SlotHarvest default is equivalent)
                y_len = slot_start[j] - int(np.asarray(state.x_len)[j])
                gen = buf[j, y_len + 1: y_len + slot_steps[j]]
                events.append((slot_orig[j],
                               slot_harvest[j].drain_final(cfg.eos, gen),
                               True))
                if not grouped:
                    yield events.pop()

                if next_req < N:
                    refill_jobs.append((j, next_req))
                    next_req += 1
                else:
                    ignore[j] = True
                    # freeze the slot: reset kv_len so it stops growing
                    state = freeze_slot(state, j)

            # refill every slot that finished this chunk in ONE dispatch
            # (harvests above read the pre-refill state, exactly as the
            # old one-at-a-time order did — a refill only touches its own
            # slot's rows)
            if refill_jobs:
                # fit checks, escalation and batched-vs-per-slot dispatch
                # all live in the shared helper (one definition with the
                # wave scheduler)
                state, _ = self._refill_slots_prefill(
                    state, [j for j, _ in refill_jobs],
                    [(x_list[i], y_list[i], bert_list[i])
                     for _, i in refill_jobs], sa)
                for j, i in refill_jobs:
                    slot_orig[j] = i
                    slot_start[j] = len(x_list[i]) + len(y_list[i])
                    slot_steps[j] = 0
                    slot_harvest[j] = SlotHarvest()
                    self.refills += 1
                refill_jobs = []

            # tail compaction: once no requests remain to refill and the
            # wave is mostly dead, re-pack survivors into the smallest
            # batch bucket that fits (one device gather — the tail then
            # decodes at the small-batch kernel rate instead of paying
            # full-wave steps for frozen slots)
            if compact and next_req >= N:
                live_idx = [k for k in range(B) if not ignore[k]]
                if live_idx and len(live_idx) <= B // 2:
                    sizes = sorted(self.buckets.keys())
                    smaller = next((b for b in sizes
                                    if b >= len(live_idx) and b < B), None)
                    new_state = self._gather_live(state, live_idx, smaller) \
                        if smaller is not None else None
                    if new_state is not None:
                        state = new_state

                        def remap(lst, fill):
                            return [lst[k] for k in live_idx] + \
                                [fill] * (smaller - len(live_idx))

                        slot_orig = remap(slot_orig, -1)
                        slot_start = remap(slot_start, 0)
                        slot_steps = remap(slot_steps, 0)
                        slot_harvest = remap(slot_harvest, SlotHarvest())
                        ignore = remap(ignore, True)
                        B = smaller
                        self.compactions += 1

            if grouped and events:
                yield events
                events = []
