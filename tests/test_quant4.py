"""int4 weight-streaming t2s decode ("fused_step_q4", VERDICT r4 item 6).

Same contract as the q8 kernel (tests/test_quant.py): the kernel must
reproduce the XLA decode path run on the DEQUANTIZED weights — the int4
rounding error (scale = max|w|/7 per lane) is the documented opt-in
tradeoff.  The nibble unpack reconstructs each packed block's lanes in
ORIGINAL order (ops/fused_step.py:pack_layer_weights_int4), so the
matmul/scale/bias chain is bit-identical to q8's on the unpacked values
— exactness of the dequant oracle carries over unchanged.
"""
import numpy as np

import jax
import jax.numpy as jnp

from gsv_tts_tpu.models import t2s as t2s_model
from gsv_tts_tpu.models.t2s import T2SConfig
from gsv_tts_tpu.ops.fused_step import (pack_layer_weights,
                                        pack_layer_weights_int4)
from gsv_tts_tpu.runtime.t2s_session import (SampleArgs, T2SEngine,
                                             decode_chunk, prefill_batch)


def _tiny():
    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=50,
                    eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    return cfg, params


def _unpack_np(q4, D, M):
    """Numpy mirror of the kernel's nibble unpack: [L, D, W/2] int8 →
    [L, D, W] int values in the original packed-lane order."""
    b = np.asarray(q4).astype(np.int32)
    hi = b >> 4
    lo = ((b & 15) ^ 8) - 8
    out = []
    pos = 0
    for start, end in ((0, 3 * D), (3 * D, 4 * D),
                       (4 * D, 4 * D + M), (4 * D + M, 4 * D + 2 * M)):
        half = (end - start) // 2
        out.append(lo[:, :, pos:pos + half])
        out.append(hi[:, :, pos:pos + half])
        pos += half
    return np.concatenate(out, axis=-1).astype(np.float32)


def _dequant_params(params):
    """Rebuild per-layer weights from the int4 pack: the XLA oracle for
    what the q4 kernel should compute."""
    q4, page = pack_layer_weights_int4(params["layers"])
    layers = dict(params["layers"])
    D = layers["out_w"].shape[-1]
    M = layers["mlp1_w"].shape[-1]
    w = _unpack_np(q4, D, M) * np.asarray(page[:, 0:1])
    layers["qkv_w"] = jnp.asarray(w[:, :, : 3 * D])
    layers["out_w"] = jnp.asarray(w[:, :, 3 * D: 4 * D])
    layers["mlp1_w"] = jnp.asarray(w[:, :, 4 * D: 4 * D + M])
    layers["mlp2_w"] = jnp.asarray(np.swapaxes(w[:, :, 4 * D + M:], 1, 2))
    p = dict(params)
    p["layers"] = layers
    return p


def test_pack_int4_roundtrip_error_bound():
    """Per-lane symmetric int4: |w - q*s| <= s/2 everywhere, values in
    [-7, 7], unpack reconstructs lanes in original order, and the scale
    page mirrors the q8 layout (row 0 scales, row 1 biases, rest zero)."""
    cfg, params = _tiny()
    packed = np.asarray(pack_layer_weights(params["layers"]), np.float32)
    q4, page = pack_layer_weights_int4(params["layers"])
    ly = params["layers"]
    D = ly["out_w"].shape[-1]
    M = ly["mlp1_w"].shape[-1]
    assert q4.shape == (packed.shape[0], packed.shape[1], packed.shape[2] // 2)
    w = _unpack_np(q4, D, M)
    assert w.min() >= -7 and w.max() <= 7
    s = np.asarray(page[:, 0:1])
    err = np.abs(packed - w * s)
    assert (err <= s / 2 + 1e-7).all(), err.max()
    bias_ref = np.concatenate([
        np.asarray(ly["qkv_b"]), np.asarray(ly["out_b"]),
        np.asarray(ly["mlp1_b"]), np.asarray(ly["mlp2_b"]),
        np.zeros((q4.shape[0], M - D), np.float32)], axis=-1)
    np.testing.assert_array_equal(np.asarray(page[:, 1]), bias_ref)
    assert not np.asarray(page[:, 2:]).any()


def test_decode_chunk_q4_interpret_matches_dequant_xla():
    """fused_step_q4 (interpret) vs the XLA step on dequantized weights:
    same prefill, same rng chain, token-for-token equal chains."""
    cfg, params = _tiny()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randint(1, 50, (1, 12)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (1, 7)), jnp.int32)
    bert = jnp.zeros((1, 12, cfg.bert_dim), jnp.float32)
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)
    dq = _dequant_params(params)
    outs = {}
    for impl, p in (("xla", dq), ("fused_step_q4_interpret", params)):
        shape = (cfg.num_layers, 1, 128, cfg.num_heads, cfg.head_dim)
        # prefill stays unquantized in the q4 engine (as in q8): both
        # sides prefill with the same dequant weights to isolate decode
        st, _ = prefill_batch(dq, cfg, x, y, bert,
                              jnp.full((1,), 12, jnp.int32),
                              jnp.full((1,), 7, jnp.int32),
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa, True, "float32")
        st, toks = decode_chunk(p, cfg, st, 10, sa, 0, "float32", impl)
        outs[impl] = np.asarray(toks)
    np.testing.assert_array_equal(outs["xla"],
                                  outs["fused_step_q4_interpret"])


def test_decode_chunk_q4_batched_matches_dequant_xla():
    """B>1 q4 kernel (interpret) vs the XLA batched step on dequantized
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
    for impl, p in (("xla", dq), ("fused_step_q4_interpret", params)):
        shape = (cfg.num_layers, B, 128, cfg.num_heads, cfg.head_dim)
        st, _ = prefill_batch(dq, cfg, x, y, bert, x_lens, y_lens,
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa, False, "float32")
        st, toks = decode_chunk(p, cfg, st, 10, sa, 0, "float32", impl)
        outs[impl] = np.asarray(toks)
    np.testing.assert_array_equal(outs["xla"],
                                  outs["fused_step_q4_interpret"])


def test_decode_chunk_q4_suppressed_variant():
    """The suppression window (reference t2s_model.py:444-445) must hold
    under q4 exactly as in the bf16/q8 kernels."""
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
                            "fused_step_q4_interpret")
    toks = np.asarray(toks).reshape(-1)
    assert (toks != cfg.eos).all(), toks
    assert np.isfinite(toks).all()


def test_engine_generate_q4_interpret_end_to_end():
    """Full T2SEngine.generate through the q4 impl (interpret): prefill,
    chunked decode, suppression window, EOS/cap termination — what
    TTS(quant_t2s="int4") switches on."""
    cfg, params = _tiny()
    eng = T2SEngine(params, cfg, gpt_cache=[(1, 128)], dtype=jnp.float32,
                    attn_impl="fused_step_q4_interpret")
    rng = np.random.RandomState(13)
    x = rng.randint(1, 50, 10).astype(np.int32)
    y = rng.randint(0, 100, 6).astype(np.int32)
    bert = np.zeros((10, cfg.bert_dim), np.float32)
    toks = np.asarray(eng.generate(x, y, bert, top_k=5,
                                   rng=jax.random.PRNGKey(3))).ravel()
    assert toks.size >= 1
    assert (toks < cfg.eos).all()


def test_quant_t2s_flag_accepts_int4():
    """Config plumbing: quant_t2s='int4' routes the engine to
    fused_step_q4 on TPU; a typo fails loudly at config time (validation
    is platform-independent)."""
    import pytest

    from gsv_tts_tpu.config import Config
    from gsv_tts_tpu.loader import resolve_t2s_attn_impl

    cfg = Config(dtype="float32", platform="cpu")
    cfg.use_flash_attn = True
    for mode, impl in ((False, "fused_step"), (True, "fused_step_q8"),
                       ("int8", "fused_step_q8"), ("int4", "fused_step_q4")):
        cfg.quant_t2s = mode
        cfg.platform = "tpu"
        assert resolve_t2s_attn_impl(cfg) == impl
        cfg.platform = "cpu"
        assert resolve_t2s_attn_impl(cfg) == "xla"
    cfg.quant_t2s = "int42"
    with pytest.raises(ValueError, match="quant_t2s"):
        resolve_t2s_attn_impl(cfg)
