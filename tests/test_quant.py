"""int8 weight-streaming t2s decode ("fused_step_q8").

The B=1 decode step is bound by the packed-weight HBM stream (bench.py
--breakdown, r3: a compute-free kernel runs at full-step speed), so the
q8 kernel halves that stream with per-lane symmetric weight-only
quantization.  Correctness contract: the kernel must reproduce the XLA
decode path run on the DEQUANTIZED weights (q * scale) — the
quantization error itself is the documented opt-in tradeoff, not a bug.
Reference hot loop being accelerated: ``t2s_model.py:425-456``.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsv_tts_tpu.models import t2s as t2s_model
from gsv_tts_tpu.models.t2s import T2SConfig
from gsv_tts_tpu.ops.fused_step import (pack_layer_weights,
                                        pack_layer_weights_int8)
from gsv_tts_tpu.runtime.t2s_session import (SampleArgs, decode_chunk,
                                             prefill_batch)


def _tiny():
    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=50,
                    eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    return cfg, params


def _dequant_params(params):
    """Rebuild per-layer weights from the int8 pack: the XLA oracle for
    what the q8 kernel should compute."""
    q8, page = pack_layer_weights_int8(params["layers"])
    w = np.asarray(q8, np.float32) * np.asarray(page[:, 0:1])
    layers = dict(params["layers"])
    D = layers["out_w"].shape[-1]
    M = layers["mlp1_w"].shape[-1]
    layers["qkv_w"] = jnp.asarray(w[:, :, : 3 * D])
    layers["out_w"] = jnp.asarray(w[:, :, 3 * D: 4 * D])
    layers["mlp1_w"] = jnp.asarray(w[:, :, 4 * D: 4 * D + M])
    layers["mlp2_w"] = jnp.asarray(np.swapaxes(w[:, :, 4 * D + M:], 1, 2))
    p = dict(params)
    p["layers"] = layers
    return p


def test_pack_int8_roundtrip_error_bound():
    """Per-lane symmetric quantization: |w - q*s| <= s/2 everywhere, and
    the max-|w| element of every lane is exactly representable."""
    cfg, params = _tiny()
    packed = np.asarray(pack_layer_weights(params["layers"]), np.float32)
    q8, page = pack_layer_weights_int8(params["layers"])
    q8 = np.asarray(q8, np.float32)
    s = np.asarray(page[:, 0:1])  # [L, 1, W]
    assert q8.min() >= -127 and q8.max() <= 127
    err = np.abs(packed - q8 * s)
    assert (err <= s / 2 + 1e-7).all(), err.max()
    # row 0 carries the scales; row 1 the per-layer biases in the packed
    # lane layout (rounded through the model dtype — the batched quant
    # kernel reads them from here instead of streaming a bias page);
    # rows 2..7 are zero padding
    ly = params["layers"]
    D = ly["out_w"].shape[-1]
    M = ly["mlp1_w"].shape[-1]
    bias_ref = np.concatenate([
        np.asarray(ly["qkv_b"]), np.asarray(ly["out_b"]),
        np.asarray(ly["mlp1_b"]), np.asarray(ly["mlp2_b"]),
        np.zeros((q8.shape[0], M - D), np.float32)], axis=-1)
    np.testing.assert_array_equal(np.asarray(page[:, 1]), bias_ref)
    assert not np.asarray(page[:, 2:]).any()


def test_decode_chunk_q8_interpret_matches_dequant_xla():
    """fused_step_q8 (interpret) vs the XLA step on dequantized weights:
    same prefill, same rng chain, token-for-token equal chains."""
    cfg, params = _tiny()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randint(1, 50, (1, 12)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (1, 7)), jnp.int32)
    bert = jnp.zeros((1, 12, cfg.bert_dim), jnp.float32)
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)
    dq = _dequant_params(params)
    outs = {}
    for impl, p in (("xla", dq), ("fused_step_q8_interpret", params)):
        shape = (cfg.num_layers, 1, 128, cfg.num_heads, cfg.head_dim)
        # the XLA oracle must see the dequantized weights at prefill too
        # (prefill is NOT quantized in the q8 engine — only decode streams
        # int8 — so both sides prefill with the same dequant weights to
        # isolate the decode step)
        st, _ = prefill_batch(dq, cfg, x, y, bert,
                              jnp.full((1,), 12, jnp.int32),
                              jnp.full((1,), 7, jnp.int32),
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa, True, "float32")
        st, toks = decode_chunk(p, cfg, st, 10, sa, 0, "float32", impl)
        outs[impl] = np.asarray(toks)
    np.testing.assert_array_equal(outs["xla"],
                                  outs["fused_step_q8_interpret"])


def test_decode_chunk_q8_suppressed_variant():
    """The suppression window (reference t2s_model.py:444-445) must hold
    under q8 exactly as in the bf16 kernel."""
    cfg, params = _tiny()
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randint(1, 50, (1, 9)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (1, 5)), jnp.int32)
    bert = jnp.zeros((1, 9, cfg.bert_dim), jnp.float32)
    sa = SampleArgs(top_k=5, repetition_penalty=1.0, use_prev=False)
    shape = (cfg.num_layers, 1, 128, cfg.num_heads, cfg.head_dim)
    st, _ = prefill_batch(params, cfg, x, y, bert,
                          jnp.full((1,), 9, jnp.int32),
                          jnp.full((1,), 5, jnp.int32),
                          jnp.zeros(shape, jnp.float32),
                          jnp.zeros(shape, jnp.float32),
                          jax.random.PRNGKey(2), sa, True, "float32")
    st, toks = decode_chunk(params, cfg, st, 8, sa, 8, "float32",
                            "fused_step_q8_interpret")
    toks = np.asarray(toks).reshape(-1)
    assert (toks != cfg.eos).all(), toks  # eos suppressed for all 8 steps
    assert np.isfinite(toks).all()


def test_q8_quality_close_to_fp():
    """Sanity bound on the quantization error itself: the q8 chain's
    first sampled token (greedy) matches the full-precision chain's for a
    prompt where the fp logits margin exceeds the int8 noise.  (Weight-only
    per-lane int8 perturbs logits by ~0.4% relative; random tiny weights
    give near-uniform logits, so only the FIRST token — largest margin —
    is asserted.)"""
    cfg, params = _tiny()
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randint(1, 50, (1, 10)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (1, 6)), jnp.int32)
    bert = jnp.zeros((1, 10, cfg.bert_dim), jnp.float32)
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)
    toks = {}
    for impl in ("xla", "fused_step_q8_interpret"):
        shape = (cfg.num_layers, 1, 128, cfg.num_heads, cfg.head_dim)
        st, _ = prefill_batch(params, cfg, x, y, bert,
                              jnp.full((1,), 10, jnp.int32),
                              jnp.full((1,), 6, jnp.int32),
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(4), sa, True, "float32")
        st, t = decode_chunk(params, cfg, st, 1, sa, 0, "float32", impl)
        toks[impl] = int(np.asarray(t).reshape(-1)[0])
    assert toks["xla"] == toks["fused_step_q8_interpret"], toks


def test_decode_chunk_q8_batched_matches_dequant_xla():
    """B>1 q8 kernel (interpret) vs the XLA batched step on dequantized
    weights, ragged per-slot lengths — token-exact chains per slot."""
    cfg, params = _tiny()
    rng = np.random.RandomState(11)
    B = 3
    x = jnp.asarray(rng.randint(1, 50, (B, 12)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (B, 7)), jnp.int32)
    bert = jnp.zeros((B, 12, cfg.bert_dim), jnp.float32)
    x_lens = jnp.asarray([12, 9, 5], jnp.int32)
    y_lens = jnp.asarray([7, 3, 6], jnp.int32)
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)
    dq = _dequant_params(params)
    outs = {}
    for impl, p in (("xla", dq), ("fused_step_q8_interpret", params)):
        shape = (cfg.num_layers, B, 128, cfg.num_heads, cfg.head_dim)
        st, _ = prefill_batch(dq, cfg, x, y, bert, x_lens, y_lens,
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa, False, "float32")
        st, toks = decode_chunk(p, cfg, st, 10, sa, 0, "float32", impl)
        outs[impl] = np.asarray(toks)
    np.testing.assert_array_equal(outs["xla"],
                                  outs["fused_step_q8_interpret"])


def test_engine_generate_q8_interpret_end_to_end():
    """Full T2SEngine.generate through the q8 impl (interpret): prefill,
    chunked decode, suppression window, EOS/cap termination — the
    engine-level integration the facade's quant_t2s flag switches on."""
    from gsv_tts_tpu.runtime.t2s_session import T2SEngine

    cfg, params = _tiny()
    eng = T2SEngine(params, cfg, gpt_cache=[(1, 128)], dtype=jnp.float32,
                    attn_impl="fused_step_q8_interpret")
    rng = np.random.RandomState(13)
    x = rng.randint(1, 50, 10).astype(np.int32)
    y = rng.randint(0, 100, 6).astype(np.int32)
    bert = np.zeros((10, cfg.bert_dim), np.float32)
    toks = np.asarray(eng.generate(x, y, bert, top_k=5,
                                   rng=jax.random.PRNGKey(3))).ravel()
    assert toks.size >= 1
    assert (toks < cfg.eos).all()  # eos never leaks into the harvest


def test_q8_shared_softmax_b8_wave():
    """q8 + shared softmax gates a B=8 wave (bf16/rows stop at 6): the
    one-step kernel probabilities at B=8 must match the XLA+ops oracle on
    DEQUANTIZED weights, and a decode_chunk chain stays valid with a
    bounded-prefix match (shared-max exp reorder may flip deep near-ties).
    """
    from gsv_tts_tpu.models.t2s import transformer_decode_step
    from gsv_tts_tpu.ops import sampling
    from gsv_tts_tpu.ops.fused_step import fused_decode_step_sample_batched

    cfg, params = _tiny()
    dq = _dequant_params(params)
    rng = np.random.RandomState(13)
    L, B, S, H, Dh = 2, 8, 128, 4, 32
    kc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32) * 0.3)
    vc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32) * 0.3)
    kv_len = jnp.asarray([100, 90, 70, 40, 25, 13, 7, 0], jnp.int32)
    x_len = jnp.asarray([12, 10, 12, 12, 9, 5, 3, 5], jnp.int32)
    last_tok = jnp.asarray([17, 4, 55, 31, 88, 12, 99, 0], jnp.int32)
    tok_buf = np.full((B, S), cfg.vocab_size, np.int32)
    tok_buf[0, :60] = rng.randint(0, 100, size=(60,))
    tok_buf[3, :20] = rng.randint(0, 100, size=(20,))
    buf_len = jnp.asarray([60, 0, 0, 20, 0, 0, 0, 0], jnp.int32)
    step_idx = jnp.asarray([5, 8, 20, 3, 7, 2, 30, 1], jnp.int32)
    g = jnp.zeros((B, 128), jnp.float32)
    sa = SampleArgs(top_k=15, top_p=0.9, temperature=1.0,
                    repetition_penalty=1.35, use_prev=True)

    tok, row, kc2, vc2 = fused_decode_step_sample_batched(
        params, kc, vc, jnp.asarray(tok_buf),
        kv_len, x_len, last_tok, buf_len, step_idx, g,
        sa=sa, suppress_until=10,
        suppressed=cfg.suppressed_tokens + (cfg.eos,),
        interpret=True, quant=True, softmax="shared")
    p_kernel = jax.nn.softmax(row[:, :cfg.vocab_size], axis=-1)

    pe_idx = jnp.maximum(kv_len - x_len, 0)
    pe = (dq["audio_pos_alpha"] * dq["pe"][pe_idx])
    xin = jnp.take(dq["audio_emb"], last_tok, axis=0) + pe
    h, _, _ = transformer_decode_step(dq, cfg, xin, kc, vc, kv_len, "xla")
    logits = (h @ dq["predict_w"]).astype(jnp.float32)
    sup = jnp.asarray(cfg.suppressed_tokens + (cfg.eos,))
    neg = jnp.full((len(sup),), -jnp.inf)
    logits = jnp.where((step_idx < 10)[:, None],
                       jax.vmap(lambda l: l.at[sup].set(neg))(logits), logits)
    probs_ref = sampling.logits_to_probs(
        logits, jnp.asarray(tok_buf), temperature=sa.temperature,
        top_k=sa.top_k, top_p=sa.top_p,
        repetition_penalty=sa.repetition_penalty)
    np.testing.assert_allclose(np.asarray(p_kernel), np.asarray(probs_ref),
                               rtol=5e-4, atol=5e-6)

    # full decode_chunk chain at B=8 through the ":shsm" impl suffix
    xb = jnp.asarray(rng.randint(1, 50, (B, 12)), jnp.int32)
    yb = jnp.asarray(rng.randint(0, 100, (B, 7)), jnp.int32)
    bert = jnp.zeros((B, 12, cfg.bert_dim), jnp.float32)
    x_lens = jnp.asarray([12, 9, 5, 12, 8, 6, 10, 7], jnp.int32)
    y_lens = jnp.asarray([7, 3, 6, 2, 7, 4, 5, 3], jnp.int32)
    sa_g = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)
    shape = (cfg.num_layers, B, 128, cfg.num_heads, cfg.head_dim)

    def chain(impl, p):
        st, _ = prefill_batch(dq, cfg, xb, yb, bert, x_lens, y_lens,
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa_g, False, "float32")
        st, toks = decode_chunk(p, cfg, st, 8, sa_g, 0, "float32", impl)
        return np.asarray(toks)

    toks_q8 = chain("fused_step_q8_interpret:shsm", params)
    toks_ref = chain("xla", dq)
    assert toks_q8.shape == (B, 8)
    np.testing.assert_array_equal(toks_q8[:, :3], toks_ref[:, :3])


def test_generate_batched_b8_wave_engine_level():
    """The ENGINE machinery (prefill_batch at B=8, bucket selection,
    harvest, slot refills with N > B) through the q8+shared kernel: all
    requests complete with valid tokens, and the run is deterministic
    (cross-impl token parity is covered at the decode_chunk level — the
    engines would prefill with different weights here, so token chains are
    not comparable)."""
    from gsv_tts_tpu.runtime.t2s_session import T2SEngine

    cfg, params = _tiny()
    rng = np.random.RandomState(21)
    N = 10  # > B=8: forces one refill through the wave machinery
    xs = [rng.randint(1, 50, size=(rng.randint(4, 12),)).astype(np.int64)
          for _ in range(N)]
    ys = [rng.randint(0, 100, size=(rng.randint(3, 8),)).astype(np.int64)
          for _ in range(N)]
    berts = [(rng.randn(len(x), cfg.bert_dim) * 0.1).astype(np.float32)
             for x in xs]

    def run():
        eng = T2SEngine(params, cfg, gpt_cache=[(8, 128)],
                        dtype=jnp.float32,
                        attn_impl="fused_step_q8_interpret:shsm")
        pred, idx = eng.generate_batched(xs, ys, berts, top_k=1,
                                         repetition_penalty=1.0,
                                         rng=jax.random.PRNGKey(3))
        return {int(i): pr for pr, i in zip(pred, idx)}

    out1 = run()
    assert len(out1) == N
    for i, pr in out1.items():
        pr = np.asarray(pr)
        assert pr.size >= 1
        assert ((pr >= 0) & (pr <= cfg.vocab_size)).all(), (i, pr)
    out2 = run()
    for i in out1:
        np.testing.assert_array_equal(out1[i], out2[i], err_msg=f"req {i}")


def test_decode_chunk_q8_deep3_token_identical():
    """":deep3" (triple-buffered weight pages, two page DMAs in flight)
    only changes DMA scheduling — the token chain must be bit-identical
    to the 2-slot q8 kernel."""
    cfg, params = _tiny()
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randint(1, 50, (1, 12)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (1, 7)), jnp.int32)
    bert = jnp.zeros((1, 12, cfg.bert_dim), jnp.float32)
    sa = SampleArgs(top_k=3, repetition_penalty=1.05)
    outs = {}
    for impl in ("fused_step_q8_interpret", "fused_step_q8_interpret:deep3"):
        shape = (cfg.num_layers, 1, 128, cfg.num_heads, cfg.head_dim)
        st, _ = prefill_batch(params, cfg, x, y, bert,
                              jnp.full((1,), 12, jnp.int32),
                              jnp.full((1,), 7, jnp.int32),
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(2), sa, True, "float32")
        st, toks = decode_chunk(params, cfg, st, 10, sa, 0, "float32", impl)
        outs[impl] = np.asarray(toks)
    np.testing.assert_array_equal(outs["fused_step_q8_interpret"],
                                  outs["fused_step_q8_interpret:deep3"])
