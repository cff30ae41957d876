"""Pallas flash decode-attention parity (interpreter mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsv_tts_tpu.ops import flash_decode


@pytest.mark.parametrize("kv_len", [0, 5, 127, 128, 200, 511])
def test_flash_matches_xla(kv_len):
    rng = np.random.RandomState(0)
    B, S, H, Dh = 1, 512, 4, 32
    q = jnp.asarray(rng.randn(B, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, Dh).astype(np.float32))
    lens = jnp.asarray([kv_len], jnp.int32)

    ref = flash_decode.xla_decode_attention(q, k, v, lens)
    ours = flash_decode.flash_decode_attention(q, k, v, lens, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_batch_ragged():
    rng = np.random.RandomState(1)
    B, S, H, Dh = 3, 256, 2, 16
    q = jnp.asarray(rng.randn(B, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, Dh).astype(np.float32))
    lens = jnp.asarray([3, 130, 255], jnp.int32)
    ref = flash_decode.xla_decode_attention(q, k, v, lens)
    ours = flash_decode.flash_decode_attention(q, k, v, lens, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_layered_matches_xla():
    rng = np.random.RandomState(2)
    L, B, S, H, Dh = 3, 2, 256, 4, 32
    q = jnp.asarray(rng.randn(B, H, Dh).astype(np.float32))
    kc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32))
    vc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32))
    lens = jnp.asarray([40, 201], jnp.int32)
    for layer in range(L):
        ref = flash_decode.xla_decode_attention(q, kc[layer], vc[layer], lens)
        ours = flash_decode.flash_decode_attention_layered(
            q, kc, vc, lens, jnp.asarray(layer, jnp.int32), interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=f"layer {layer}")


def test_decode_chunk_flash_matches_xla():
    """Full decode_chunk with the flash kernel (interpret) vs XLA attention."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, decode_chunk, prefill_batch

    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randint(1, 50, (1, 12)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (1, 7)), jnp.int32)
    bert = jnp.zeros((1, 12, cfg.bert_dim), jnp.float32)
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)

    outs = {}
    for impl in ("xla", "flash_interpret"):
        shape = (cfg.num_layers, 1, 128, cfg.num_heads, cfg.head_dim)
        state, t0 = prefill_batch(params, cfg, x, y, bert,
                                  jnp.full((1,), 12, jnp.int32),
                                  jnp.full((1,), 7, jnp.int32),
                                  jnp.zeros(shape, jnp.float32),
                                  jnp.zeros(shape, jnp.float32),
                                  jax.random.PRNGKey(1), sa, True, "float32")
        state, toks = decode_chunk(params, cfg, state, 10, sa, 0, "float32", impl)
        outs[impl] = np.asarray(toks)
    np.testing.assert_array_equal(outs["xla"], outs["flash_interpret"])


def test_fused_layer_matches_xla():
    """Experimental fused decode-layer kernel (interpret mode)."""
    from gsv_tts_tpu.models.t2s import T2SConfig, _block_decode
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.ops.fused_layer import fused_decode_layer

    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lp = jax.tree.map(lambda a: a[1], params["layers"])
    rng = np.random.RandomState(0)
    L, B, S, H, Dh = 2, 3, 256, 4, 16
    x = jnp.asarray(rng.randn(B, 64).astype(np.float32))
    kc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32))
    vc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32))
    kv_len = jnp.asarray([140, 7, 255], jnp.int32)
    h_ref, kc_ref, vc_ref = _block_decode(x, lp, 1, kc, vc, kv_len,
                                          cfg.num_heads, "xla")
    x_out, kc2, vc2 = fused_decode_layer(x, lp, kc, vc, kv_len, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(kc2), np.asarray(kc_ref))
    np.testing.assert_array_equal(np.asarray(vc2), np.asarray(vc_ref))


def test_decode_chunk_fused_matches_xla():
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, decode_chunk, prefill_batch

    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randint(1, 50, (1, 12)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (1, 7)), jnp.int32)
    bert = jnp.zeros((1, 12, cfg.bert_dim), jnp.float32)
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)
    outs = {}
    for impl in ("xla", "fused_interpret"):
        shape = (cfg.num_layers, 1, 128, cfg.num_heads, cfg.head_dim)
        st, _ = prefill_batch(params, cfg, x, y, bert,
                              jnp.full((1,), 12, jnp.int32),
                              jnp.full((1,), 7, jnp.int32),
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa, True, "float32")
        st, toks = decode_chunk(params, cfg, st, 10, sa, 0, "float32", impl)
        outs[impl] = np.asarray(toks)
    np.testing.assert_array_equal(outs["xla"], outs["fused_interpret"])


def test_fused_step_matches_xla():
    """Whole-step fused kernel (interpret mode) vs the XLA step."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig, transformer_decode_step
    from gsv_tts_tpu.ops.fused_step import fused_decode_step

    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4, num_layers=3,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    L, B, S, H, Dh = 3, 1, 256, 4, 16
    x = jnp.asarray(rng.randn(B, 64).astype(np.float32))
    kc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32))
    vc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32))
    for kv in (0, 127, 140):
        kv_len = jnp.asarray([kv], jnp.int32)
        h_ref, kc_ref, vc_ref = transformer_decode_step(
            params, cfg, x, kc, vc, kv_len, "xla")
        h2, kc2, vc2 = fused_decode_step(x, params["layers"], kc, vc, kv_len,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h_ref),
                                   rtol=1e-5, atol=1e-5, err_msg=f"kv={kv}")
        np.testing.assert_allclose(np.asarray(kc2), np.asarray(kc_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vc2), np.asarray(vc_ref),
                                   rtol=1e-5, atol=1e-6)


def test_decode_chunk_fused_step_matches_xla():
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, decode_chunk, prefill_batch

    # hidden dim must be 128-aligned for the whole-step kernel
    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randint(1, 50, (1, 12)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (1, 7)), jnp.int32)
    bert = jnp.zeros((1, 12, cfg.bert_dim), jnp.float32)
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)
    outs = {}
    for impl in ("xla", "fused_step_interpret"):
        shape = (cfg.num_layers, 1, 128, cfg.num_heads, cfg.head_dim)
        st, _ = prefill_batch(params, cfg, x, y, bert,
                              jnp.full((1,), 12, jnp.int32),
                              jnp.full((1,), 7, jnp.int32),
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa, True, "float32")
        st, toks = decode_chunk(params, cfg, st, 10, sa, 0, "float32", impl)
        outs[impl] = np.asarray(toks)
    np.testing.assert_array_equal(outs["xla"], outs["fused_step_interpret"])


def test_decode_chunk_fused_step_batched_matches_xla():
    """B>1 whole-step kernel (interpret) vs the XLA batched step: the full
    decode_chunk path with ragged per-slot lengths must be token-exact."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, decode_chunk, prefill_batch

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    B = 3
    x = jnp.asarray(rng.randint(1, 50, (B, 12)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (B, 7)), jnp.int32)
    bert = jnp.zeros((B, 12, cfg.bert_dim), jnp.float32)
    x_lens = jnp.asarray([12, 9, 5], jnp.int32)
    y_lens = jnp.asarray([7, 3, 6], jnp.int32)
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)
    outs = {}
    for impl in ("xla", "fused_step_interpret"):
        shape = (cfg.num_layers, B, 128, cfg.num_heads, cfg.head_dim)
        st, _ = prefill_batch(params, cfg, x, y, bert, x_lens, y_lens,
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa, False, "float32")
        st, toks = decode_chunk(params, cfg, st, 10, sa, 0, "float32", impl)
        outs[impl] = np.asarray(toks)
    np.testing.assert_array_equal(outs["xla"], outs["fused_step_interpret"])


def test_fused_gate_rejects_odd_bucket_and_falls_back():
    """A cache bucket that is not a 128-multiple must NOT take the fused
    kernels (pl.ds clamps out-of-range walk windows, silently corrupting
    attention) — decode_chunk falls back and stays token-exact with xla,
    and fused_step_interpret never leaks the real flash kernel onto CPU."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, decode_chunk, prefill_batch

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randint(1, 50, (1, 12)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (1, 9)), jnp.int32)
    bert = jnp.zeros((1, 12, cfg.bert_dim), jnp.float32)
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)
    outs = {}
    for impl in ("xla", "fused_step_interpret"):
        shape = (cfg.num_layers, 1, 192, cfg.num_heads, cfg.head_dim)  # 192 % 128 != 0
        st, _ = prefill_batch(params, cfg, x, y, bert,
                              jnp.asarray([12], jnp.int32),
                              jnp.asarray([9], jnp.int32),
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa, False, "float32")
        st, toks = decode_chunk(params, cfg, st, 8, sa, 0, "float32", impl)
        outs[impl] = np.asarray(toks)
    np.testing.assert_array_equal(outs["xla"], outs["fused_step_interpret"])

    from gsv_tts_tpu.ops.fused_step import fused_decode_step_sample
    import pytest
    with pytest.raises(AssertionError, match="multiple of 128"):
        fused_decode_step_sample(
            params, jnp.zeros((2, 1, 192, 4, 32), jnp.float32),
            jnp.zeros((2, 1, 192, 4, 32), jnp.float32),
            jnp.full((1, 192), cfg.vocab_size, jnp.int32),
            jnp.asarray([21], jnp.int32), jnp.asarray([12], jnp.int32),
            jnp.asarray([3], jnp.int32), jnp.asarray([10], jnp.int32),
            jnp.asarray([1], jnp.int32), jnp.zeros((1, 128), jnp.float32),
            sa=sa, interpret=True)


def test_fused_batched_sample_rows_match_sampling_ops():
    """Per-row filtered logits of the batched kernel vs ops/sampling, with
    ragged per-row kv lengths, histories, and suppression flags (incl. a
    frozen slot with kv_len = 0 < x_len)."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig, transformer_decode_step
    from gsv_tts_tpu.ops import sampling
    from gsv_tts_tpu.ops.fused_step import fused_decode_step_sample_batched
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(7)
    L, B, S, H, Dh = 2, 3, 128, 4, 32
    kc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32) * 0.3)
    vc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32) * 0.3)
    kv_len = jnp.asarray([40, 7, 0], jnp.int32)
    x_len = jnp.asarray([12, 3, 5], jnp.int32)
    last_tok = jnp.asarray([17, 99, 0], jnp.int32)
    tok_buf = np.full((B, S), cfg.vocab_size, np.int32)
    tok_buf[0, :30] = rng.randint(0, 100, size=(30,))
    tok_buf[1, :5] = rng.randint(0, 100, size=(5,))
    buf_len = jnp.asarray([30, 5, 0], jnp.int32)
    step_idx = jnp.asarray([5, 20, 3], jnp.int32)
    g = jnp.zeros((B, 128), jnp.float32)

    for sa in (SampleArgs(top_k=15, top_p=1.0, temperature=1.0,
                          repetition_penalty=1.35, use_prev=True),
               SampleArgs(top_k=8, top_p=0.7, temperature=0.8,
                          repetition_penalty=1.2, use_prev=True),
               SampleArgs(top_k=3, top_p=0.95, temperature=1.3,
                          repetition_penalty=1.0, use_prev=False)):
        for suppress_until in (0, 10):
            tok, row, kc2, vc2 = fused_decode_step_sample_batched(
                params, kc, vc, jnp.asarray(tok_buf),
                kv_len, x_len, last_tok, buf_len, step_idx, g,
                sa=sa, suppress_until=suppress_until,
                suppressed=cfg.suppressed_tokens + (cfg.eos,),
                interpret=True)

            pe_idx = jnp.maximum(kv_len - x_len, 0)
            pe = (params["audio_pos_alpha"] * params["pe"][pe_idx])
            xin = jnp.take(params["audio_emb"], last_tok, axis=0) + pe
            h, kc_ref, vc_ref = transformer_decode_step(
                params, cfg, xin, kc, vc, kv_len, "xla")
            logits = (h @ params["predict_w"]).astype(jnp.float32)
            if suppress_until:
                sup = jnp.asarray(cfg.suppressed_tokens + (cfg.eos,))
                neg = jnp.full((len(sup),), -jnp.inf)
                logits = jnp.where(
                    (step_idx < suppress_until)[:, None],
                    jax.vmap(lambda l: l.at[sup].set(neg))(logits), logits)
            probs_ref = sampling.logits_to_probs(
                logits,
                jnp.asarray(tok_buf) if sa.use_prev else None,
                temperature=sa.temperature, top_k=sa.top_k, top_p=sa.top_p,
                repetition_penalty=sa.repetition_penalty)

            probs_kernel = jax.nn.softmax(row[:, :cfg.vocab_size], axis=-1)
            np.testing.assert_allclose(
                np.asarray(probs_kernel), np.asarray(probs_ref),
                rtol=2e-4, atol=2e-5,
                err_msg=f"sa={sa} suppress_until={suppress_until}")
            np.testing.assert_array_equal(
                np.asarray(tok), np.argmax(np.asarray(probs_ref), axis=-1))

            # the in-place window RMW must produce the same caches as the
            # XLA step's per-slot scatter (history rows bit-identical, new
            # row within f32 rounding)
            np.testing.assert_allclose(np.asarray(kc2), np.asarray(kc_ref),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(vc2), np.asarray(vc_ref),
                                       rtol=1e-5, atol=1e-6)


def test_generate_batched_fused_matches_xla(monkeypatch):
    """Continuous batching through the batched whole-step kernel (interpret)
    vs the XLA path: same key chain ⇒ identical harvested sequences,
    including slot refills.  Both sides are pinned to the XLA prefill —
    the Pallas prefill's ~1e-6 summation-order noise can flip a greedy
    near-tie deep into a chain (see test_prefill_flash_token_parity)."""
    import gsv_tts_tpu.runtime.t2s_session as sess
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import T2SEngine

    sess.prefill_batch.clear_cache()
    sess.prefill_slot.clear_cache()
    monkeypatch.setattr(sess, "_prefill_impl", lambda impl: "xla")

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(11)
    N = 4
    xs = [rng.randint(1, 50, size=(rng.randint(4, 12),)).astype(np.int64)
          for _ in range(N)]
    ys = [rng.randint(0, 100, size=(rng.randint(3, 8),)).astype(np.int64)
          for _ in range(N)]
    berts = [(rng.randn(len(x), cfg.bert_dim) * 0.1).astype(np.float32)
             for x in xs]

    outs = {}
    try:
        for impl in ("xla", "fused_step_interpret"):
            eng = T2SEngine(params, cfg, gpt_cache=[(2, 96), (2, 128)],
                            dtype=jnp.float32, attn_impl=impl)
            pred, idx = eng.generate_batched(xs, ys, berts, top_k=1,
                                             repetition_penalty=1.0,
                                             rng=jax.random.PRNGKey(3))
            outs[impl] = {int(i): p for p, i in zip(pred, idx)}
    finally:
        # drop programs compiled with the patched prefill — later tests
        # expect the Pallas prefill under the same static attn_impl key
        sess.prefill_batch.clear_cache()
        sess.prefill_slot.clear_cache()
    assert outs["xla"].keys() == outs["fused_step_interpret"].keys()
    for i in outs["xla"]:
        a, b = outs["xla"][i], outs["fused_step_interpret"][i]
        n = min(len(a), len(b), 30)
        np.testing.assert_array_equal(a[:n], b[:n], err_msg=f"request {i}")


def test_fused_sample_row_matches_sampling_ops():
    """The kernel's filtered logits row (penalty → top-p → temperature →
    top-k) must match ops/sampling.logits_to_probs after softmax."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.ops import sampling
    from gsv_tts_tpu.ops.fused_step import fused_decode_step_sample
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(7)
    L, B, S, H, Dh = 2, 1, 128, 4, 32
    kc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32) * 0.3)
    vc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32) * 0.3)
    kv_len = jnp.asarray([40], jnp.int32)
    x_len = jnp.asarray([12], jnp.int32)
    last_tok = jnp.asarray([17], jnp.int32)
    # token history with duplicates for the penalty path
    hist = rng.randint(0, 100, size=(30,))
    tok_buf = np.full((1, S), cfg.vocab_size, np.int32)
    tok_buf[0, :30] = hist
    buf_len = jnp.asarray([30], jnp.int32)
    g = jnp.zeros((1, 128), jnp.float32)

    for sa in (SampleArgs(top_k=15, top_p=1.0, temperature=1.0,
                          repetition_penalty=1.35, use_prev=True),
               SampleArgs(top_k=8, top_p=0.7, temperature=0.8,
                          repetition_penalty=1.2, use_prev=True),
               SampleArgs(top_k=3, top_p=0.95, temperature=1.3,
                          repetition_penalty=1.0, use_prev=False)):
        for suppress_until, step_idx in ((0, 5), (10, 5), (10, 20)):
            tok, row, _, _ = fused_decode_step_sample(
                params, kc, vc, jnp.asarray(tok_buf),
                kv_len, x_len, last_tok, buf_len,
                jnp.asarray([step_idx], jnp.int32), g,
                sa=sa, suppress_until=suppress_until,
                suppressed=cfg.suppressed_tokens + (cfg.eos,),
                interpret=True)

            # reference: the XLA step + _sample_logits filtering chain
            from gsv_tts_tpu.models.t2s import transformer_decode_step
            pe_idx = kv_len - x_len
            pe = (params["audio_pos_alpha"] * params["pe"][pe_idx])
            x = jnp.take(params["audio_emb"], last_tok, axis=0) + pe
            h, _, _ = transformer_decode_step(params, cfg, x, kc, vc, kv_len, "xla")
            logits = (h @ params["predict_w"]).astype(jnp.float32)
            if suppress_until and step_idx < suppress_until:
                sup = jnp.asarray(cfg.suppressed_tokens + (cfg.eos,))
                logits = logits.at[:, sup].set(-jnp.inf)
            probs_ref = sampling.logits_to_probs(
                logits,
                jnp.asarray(tok_buf) if sa.use_prev else None,
                temperature=sa.temperature, top_k=sa.top_k, top_p=sa.top_p,
                repetition_penalty=sa.repetition_penalty)

            probs_kernel = jax.nn.softmax(row[:, :cfg.vocab_size], axis=-1)
            np.testing.assert_allclose(
                np.asarray(probs_kernel), np.asarray(probs_ref),
                rtol=2e-4, atol=2e-5,
                err_msg=f"sa={sa} suppress_until={suppress_until} step={step_idx}")
            # zero noise ⇒ the kernel's draw must be the max-prob token
            assert int(np.asarray(tok)[0]) == int(np.argmax(np.asarray(probs_ref)))


def test_fused_step_last_window_token_embedding():
    """Regression: a token in the vocab's final partial 8-row window (here
    last_tok=99 with V=101; flagship: tokens >= 1018 with V=1025) must gather
    the correct embedding row.  The unpadded table made ``pl.ds`` clamp the
    window start off its 8-alignment, mask-selecting the wrong row."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig, transformer_decode_step
    from gsv_tts_tpu.ops.fused_step import fused_decode_step_sample
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(21)
    L, B, S, H, Dh = 2, 1, 128, 4, 32
    kc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32) * 0.3)
    vc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32) * 0.3)
    kv_len = jnp.asarray([20], jnp.int32)
    x_len = jnp.asarray([8], jnp.int32)
    tok_buf = jnp.full((1, S), cfg.vocab_size, jnp.int32)
    sa = SampleArgs(top_k=101, top_p=1.0, temperature=1.0,
                    repetition_penalty=1.0, use_prev=False)
    for t in (96, 99, 100):
        last_tok = jnp.asarray([t], jnp.int32)
        _, row, _, _ = fused_decode_step_sample(
            params, kc, vc, tok_buf, kv_len, x_len, last_tok,
            jnp.asarray([0], jnp.int32), jnp.asarray([50], jnp.int32),
            jnp.zeros((1, 128), jnp.float32), sa=sa, suppress_until=0,
            suppressed=(), interpret=True)
        pe = params["audio_pos_alpha"] * params["pe"][kv_len - x_len]
        x = jnp.take(params["audio_emb"], last_tok, axis=0) + pe
        h, _, _ = transformer_decode_step(params, cfg, x, kc, vc, kv_len, "xla")
        ref = (h @ params["predict_w"]).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(row[:, :101]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5, err_msg=f"tok {t}")


def test_generate_fused_sampling_matches_xla_full_pipeline():
    """Whole-engine generate() with the fused in-kernel sampler vs the XLA
    path: identical key chain ⇒ identical tokens (suppression window,
    repetition penalty, and bucket escalation all active)."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import T2SEngine

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(9)
    x = rng.randint(1, 50, size=(12,)).astype(np.int64)
    y = rng.randint(0, 100, size=(7,)).astype(np.int64)
    bert = (rng.randn(12, cfg.bert_dim) * 0.1).astype(np.float32)

    outs = {}
    for impl in ("xla", "fused_step_interpret"):
        eng = T2SEngine(params, cfg, gpt_cache=[(1, 96), (1, 128)],
                        dtype=jnp.float32, attn_impl=impl)
        toks = eng.generate(x, y, bert, top_k=15, top_p=1.0, temperature=1.0,
                            repetition_penalty=1.35, rng=jax.random.PRNGKey(3))
        outs[impl] = np.asarray(toks).ravel()
    # both engines share one threefry chain; the fused engine additionally
    # uses the Pallas prefill whose ~1e-6 summation-order noise can flip a
    # near-tie deep in the sequence — require a long exact prefix
    a, b = outs["xla"], outs["fused_step_interpret"]
    n = min(len(a), len(b), 30)
    np.testing.assert_array_equal(a[:n], b[:n])


def test_flash_prefill_matches_xla():
    """Pallas hybrid-mask prefill attention vs the XLA SDPA mask path."""
    from gsv_tts_tpu.ops.flash_prefill import flash_prefill_attention

    rng = np.random.RandomState(11)
    B, T, H, Dh = 3, 256, 4, 32
    q = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32) * 0.5)
    x_lens = jnp.asarray([12, 100, 255], jnp.int32)
    xy_lens = jnp.asarray([40, 130, 256], jnp.int32)

    # XLA reference with the embed_prompt_batch mask formula
    rows = np.arange(T)[None, :, None]
    cols = np.arange(T)[None, None, :]
    xl = np.asarray(x_lens)[:, None, None]
    xyl = np.asarray(xy_lens)[:, None, None]
    in_x = cols < xl
    mask = np.where(rows < xl, in_x, in_x | (cols <= rows)) & (cols < xyl)
    import math as _math

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / _math.sqrt(Dh)
    scores = jnp.where(jnp.asarray(mask)[:, None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, H * Dh)

    ours = flash_prefill_attention(q, k, v, x_lens, xy_lens, num_heads=H,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_prefill_flash_token_parity():
    """prefill_batch with the Pallas prefill: same first token, K/V caches
    within f32 rounding, and a long greedy prefix in agreement (the two
    prefills differ only in summation order — ~1e-6 — which can flip a
    greedy near-tie deep into the sequence; strict full equality holds only
    within one implementation)."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, T2SEngine, prefill_batch

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(13)

    # direct prefill parity: token + cache numerics
    x = jnp.asarray(rng.randint(1, 50, (1, 32)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (1, 32)), jnp.int32)
    bert = jnp.zeros((1, 32, cfg.bert_dim), jnp.float32)
    shape = (2, 1, 96, 4, 32)
    sa = SampleArgs(top_k=1)
    res = {}
    for impl in ("xla", "fused_step_interpret"):
        st, tok = prefill_batch(params, cfg, x, y, bert,
                                jnp.full((1,), 11, jnp.int32),
                                jnp.full((1,), 6, jnp.int32),
                                jnp.zeros(shape, jnp.float32),
                                jnp.zeros(shape, jnp.float32),
                                jax.random.PRNGKey(7), sa, True, "float32",
                                impl)
        res[impl] = (int(np.asarray(tok)[0]), np.asarray(st.k_cache))
    assert res["xla"][0] == res["fused_step_interpret"][0]
    np.testing.assert_allclose(res["fused_step_interpret"][1], res["xla"][1],
                               rtol=1e-4, atol=1e-5)

    # greedy agreement: the two engines must match for a long prefix
    xs = rng.randint(1, 50, size=(11,)).astype(np.int64)
    ys = rng.randint(0, 100, size=(6,)).astype(np.int64)
    bs = (rng.randn(11, cfg.bert_dim) * 0.1).astype(np.float32)
    outs = {}
    for impl in ("xla", "fused_step_interpret"):
        eng = T2SEngine(params, cfg, gpt_cache=[(1, 96), (1, 128)],
                        dtype=jnp.float32, attn_impl=impl)
        # rp=1.0: with random weights the repetition penalty drags repeated
        # tokens onto near-ties every few steps, where the prefills' ~1e-6
        # summation-order difference flips the greedy argmax
        outs[impl] = np.asarray(eng.generate(
            xs, ys, bs, top_k=1, repetition_penalty=1.0,
            rng=jax.random.PRNGKey(7))).ravel()
    a, b = outs["xla"], outs["fused_step_interpret"]
    n = min(len(a), len(b), 30)
    np.testing.assert_array_equal(a[:n], b[:n])

def test_fused_batched_shared_softmax_matches_rows():
    """softmax="shared" (one running max per head across slots + selector
    matmul segment sums) vs the per-row bookkeeping path AND the XLA+ops
    oracle: filtered probabilities must agree to f32-reorder tolerance on
    ragged kv lengths (incl. a frozen kv_len=0 slot)."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig, transformer_decode_step
    from gsv_tts_tpu.ops import sampling
    from gsv_tts_tpu.ops.fused_step import fused_decode_step_sample_batched
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(11)
    L, B, S, H, Dh = 2, 4, 128, 4, 32
    kc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32) * 0.3)
    vc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32) * 0.3)
    kv_len = jnp.asarray([100, 40, 7, 0], jnp.int32)
    x_len = jnp.asarray([12, 12, 3, 5], jnp.int32)
    last_tok = jnp.asarray([17, 55, 99, 0], jnp.int32)
    tok_buf = np.full((B, S), cfg.vocab_size, np.int32)
    tok_buf[0, :60] = rng.randint(0, 100, size=(60,))
    tok_buf[1, :30] = rng.randint(0, 100, size=(30,))
    buf_len = jnp.asarray([60, 30, 5, 0], jnp.int32)
    step_idx = jnp.asarray([5, 8, 20, 3], jnp.int32)
    g = jnp.zeros((B, 128), jnp.float32)
    sa = SampleArgs(top_k=15, top_p=0.9, temperature=1.0,
                    repetition_penalty=1.35, use_prev=True)

    outs = {}
    for mode in ("rows", "shared"):
        tok, row, kc2, vc2 = fused_decode_step_sample_batched(
            params, kc, vc, jnp.asarray(tok_buf),
            kv_len, x_len, last_tok, buf_len, step_idx, g,
            sa=sa, suppress_until=10,
            suppressed=cfg.suppressed_tokens + (cfg.eos,),
            interpret=True, softmax=mode)
        outs[mode] = (np.asarray(tok), np.asarray(row),
                      np.asarray(kc2), np.asarray(vc2))

    # caches agree to f32 rounding (layer > 0 rows pass through layer 0's
    # attention output, which differs by ulps between the two softmax
    # bookkeeping orders; history rows are untouched either way)
    np.testing.assert_allclose(outs["rows"][2], outs["shared"][2],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs["rows"][3], outs["shared"][3],
                               rtol=1e-5, atol=1e-6)

    p_rows = jax.nn.softmax(jnp.asarray(outs["rows"][1][:, :cfg.vocab_size]))
    p_shared = jax.nn.softmax(jnp.asarray(outs["shared"][1][:, :cfg.vocab_size]))
    np.testing.assert_allclose(np.asarray(p_shared), np.asarray(p_rows),
                               rtol=5e-4, atol=5e-6)

    # and against the XLA + ops/sampling oracle
    pe_idx = jnp.maximum(kv_len - x_len, 0)
    pe = (params["audio_pos_alpha"] * params["pe"][pe_idx])
    xin = jnp.take(params["audio_emb"], last_tok, axis=0) + pe
    h, _, _ = transformer_decode_step(params, cfg, xin, kc, vc, kv_len, "xla")
    logits = (h @ params["predict_w"]).astype(jnp.float32)
    sup = jnp.asarray(cfg.suppressed_tokens + (cfg.eos,))
    neg = jnp.full((len(sup),), -jnp.inf)
    logits = jnp.where((step_idx < 10)[:, None],
                       jax.vmap(lambda l: l.at[sup].set(neg))(logits), logits)
    probs_ref = sampling.logits_to_probs(
        logits, jnp.asarray(tok_buf), temperature=sa.temperature,
        top_k=sa.top_k, top_p=sa.top_p,
        repetition_penalty=sa.repetition_penalty)
    np.testing.assert_allclose(np.asarray(p_shared), np.asarray(probs_ref),
                               rtol=5e-4, atol=5e-6)

def test_decode_chunk_shared_softmax_chain():
    """Full decode_chunk chains under softmax="shared" (impl suffix
    ":shsm"), bf16-path layout aside: greedy tokens match the per-row
    kernel on a bounded prefix (near-ties deep in a chain may flip on the
    shared-max exp reordering — CLAUDE.md cross-impl parity rule), and the
    q8+shared combination stays consistent with q8 rows."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, decode_chunk, prefill_batch

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(5)
    B = 3
    x = jnp.asarray(rng.randint(1, 50, (B, 12)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (B, 7)), jnp.int32)
    bert = jnp.zeros((B, 12, cfg.bert_dim), jnp.float32)
    x_lens = jnp.asarray([12, 9, 5], jnp.int32)
    y_lens = jnp.asarray([7, 3, 6], jnp.int32)
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)

    def run(impl):
        shape = (cfg.num_layers, B, 128, cfg.num_heads, cfg.head_dim)
        st, _ = prefill_batch(params, cfg, x, y, bert, x_lens, y_lens,
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa, False, "float32")
        st, toks = decode_chunk(params, cfg, st, 10, sa, 0, "float32", impl)
        return np.asarray(toks)

    rows = run("fused_step_interpret")
    shared = run("fused_step_interpret:shsm")
    assert rows.shape == shared.shape
    np.testing.assert_array_equal(rows[:, :4], shared[:, :4])

    q8_rows = run("fused_step_q8_interpret")
    q8_shared = run("fused_step_q8_interpret:shsm")
    np.testing.assert_array_equal(q8_rows[:, :4], q8_shared[:, :4])


def test_fused_batched_vec_softmax_bit_exact_vs_rows():
    """softmax="vec" (r4): the per-row online-softmax bookkeeping
    vectorized across slots with EXACT semantics — the masking, exp
    arguments, and per-segment reduction sets are identical to the "rows"
    path, so tokens, filtered rows, and caches must match bit for bit
    (unlike "shared", which reorders the stability shift)."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.ops.fused_step import fused_decode_step_sample_batched
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(11)
    L, B, S, H, Dh = 2, 4, 128, 4, 32
    kc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32) * 0.3)
    vc = jnp.asarray(rng.randn(L, B, S, H, Dh).astype(np.float32) * 0.3)
    kv_len = jnp.asarray([100, 40, 7, 0], jnp.int32)
    x_len = jnp.asarray([12, 12, 3, 5], jnp.int32)
    last_tok = jnp.asarray([17, 55, 99, 0], jnp.int32)
    tok_buf = np.full((B, S), cfg.vocab_size, np.int32)
    tok_buf[0, :60] = rng.randint(0, 100, size=(60,))
    tok_buf[1, :30] = rng.randint(0, 100, size=(30,))
    buf_len = jnp.asarray([60, 30, 5, 0], jnp.int32)
    step_idx = jnp.asarray([5, 8, 20, 3], jnp.int32)
    g = jnp.asarray(rng.gumbel(size=(B, 128)).astype(np.float32))
    sa = SampleArgs(top_k=15, top_p=0.9, temperature=1.0,
                    repetition_penalty=1.35, use_prev=True)

    outs = {}
    for mode in ("rows", "vec"):
        tok, row, kc2, vc2 = fused_decode_step_sample_batched(
            params, kc, vc, jnp.asarray(tok_buf),
            kv_len, x_len, last_tok, buf_len, step_idx, g,
            sa=sa, suppress_until=10,
            suppressed=cfg.suppressed_tokens + (cfg.eos,),
            interpret=True, softmax=mode)
        outs[mode] = (np.asarray(tok), np.asarray(row),
                      np.asarray(kc2), np.asarray(vc2))

    np.testing.assert_array_equal(outs["rows"][0], outs["vec"][0])
    np.testing.assert_array_equal(outs["rows"][1], outs["vec"][1])
    np.testing.assert_array_equal(outs["rows"][2], outs["vec"][2])
    np.testing.assert_array_equal(outs["rows"][3], outs["vec"][3])


def test_decode_chunk_vec_softmax_chain_token_exact():
    """Full decode_chunk chains under softmax="vec" (impl suffix ":vec"):
    token-for-token equal to the per-row kernel over the WHOLE chain —
    exactness is the mode's contract (no bounded-prefix escape hatch), for
    bf16-layout float32, the q8 combination, and a q8 B=8 wave (":vec"
    lifts the B<=6 gate like ":shsm")."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, decode_chunk, prefill_batch

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(5)
    B = 3
    x = jnp.asarray(rng.randint(1, 50, (B, 12)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (B, 7)), jnp.int32)
    bert = jnp.zeros((B, 12, cfg.bert_dim), jnp.float32)
    x_lens = jnp.asarray([12, 9, 5], jnp.int32)
    y_lens = jnp.asarray([7, 3, 6], jnp.int32)
    sa = SampleArgs(top_k=5, top_p=0.8, repetition_penalty=1.35, use_prev=True)

    def run(impl, nb=B):
        shape = (cfg.num_layers, nb, 128, cfg.num_heads, cfg.head_dim)
        st, _ = prefill_batch(params, cfg, x[:nb], y[:nb], bert[:nb],
                              x_lens[:nb], y_lens[:nb],
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa, False, "float32")
        st, toks = decode_chunk(params, cfg, st, 10, sa, 5, "float32", impl)
        return np.asarray(toks)

    rows = run("fused_step_interpret")
    vec = run("fused_step_interpret:vec")
    np.testing.assert_array_equal(rows, vec)

    q8_rows = run("fused_step_q8_interpret")
    q8_vec = run("fused_step_q8_interpret:vec")
    np.testing.assert_array_equal(q8_rows, q8_vec)

    # B=8 wave gates through q8+vec (rows/bf16 stop at 6): the chain must
    # run and stay token-exact vs the XLA path on DEQUANTIZED weights
    # (the q8 correctness contract, tests/test_quant.py)
    from tests.test_quant import _dequant_params

    dq = _dequant_params(params)
    x8 = jnp.asarray(rng.randint(1, 50, (8, 12)), jnp.int32)
    y8 = jnp.asarray(rng.randint(0, 100, (8, 7)), jnp.int32)
    bert8 = jnp.zeros((8, 12, cfg.bert_dim), jnp.float32)
    x_l8 = jnp.asarray([12, 9, 5, 12, 8, 6, 10, 7], jnp.int32)
    y_l8 = jnp.asarray([7, 3, 6, 2, 7, 4, 5, 3], jnp.int32)

    def run8(impl, p):
        shape = (cfg.num_layers, 8, 128, cfg.num_heads, cfg.head_dim)
        st, _ = prefill_batch(dq, cfg, x8, y8, bert8, x_l8, y_l8,
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa, False, "float32")
        st, toks = decode_chunk(p, cfg, st, 8, sa, 5, "float32", impl)
        return np.asarray(toks)

    t_vec8 = run8("fused_step_q8_interpret:vec", params)
    t_xla8 = run8("xla", dq)
    np.testing.assert_array_equal(t_vec8, t_xla8)


def test_fused_gate_binds_the_real_impl_generic_fallback():
    """When the S%128 gate rejects the fused SAMPLING kernels, the generic
    per-op fallback must not re-enter the fused ATTENTION kernel either
    (transformer_decode_step checks only B==1/D%128; the kernel's BLOCK_S
    walk would run past an odd-S cache on real TPU).  With the REAL
    'fused_step' impl on CPU the downgrade is observable directly: the
    pallas kernel cannot lower on CPU, so pre-fix this errored."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, decode_chunk, prefill_batch

    cfg = T2SConfig(hidden_dim=128, embedding_dim=128, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=50,
                    eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randint(1, 50, (1, 12)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 100, (1, 9)), jnp.int32)
    bert = jnp.zeros((1, 12, cfg.bert_dim), jnp.float32)
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)
    outs = {}
    for impl in ("xla", "fused_step", "fused_step_q8"):
        shape = (cfg.num_layers, 1, 192, cfg.num_heads, cfg.head_dim)
        st, _ = prefill_batch(params, cfg, x, y, bert,
                              jnp.asarray([12], jnp.int32),
                              jnp.asarray([9], jnp.int32),
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32),
                              jax.random.PRNGKey(1), sa, False, "float32")
        st, toks = decode_chunk(params, cfg, st, 8, sa, 0, "float32", impl)
        outs[impl] = np.asarray(toks)
    np.testing.assert_array_equal(outs["xla"], outs["fused_step"])
    np.testing.assert_array_equal(outs["xla"], outs["fused_step_q8"])


def test_batch_only_gpt_cache_escalates_without_keyerror():
    """An engine built with NO batch-1 bucket (batch-only serving) must
    still run single-request generation: _pick_bucket tolerates the
    missing bucket, so the B=1 escalation ladder has to come from the
    bucket list actually picked (reading buckets[1] raised KeyError at
    the first bucket edge)."""
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import T2SEngine

    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=50,
                    eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    eng = T2SEngine(params, cfg, gpt_cache=[(4, 96), (4, 128)],
                    dtype=jnp.float32)
    rng = np.random.RandomState(3)
    # prompt near the first bucket edge so escalation (96 -> 128) triggers
    x = rng.randint(1, 50, 60).astype(np.int32)
    y = rng.randint(0, 100, 30).astype(np.int32)
    bert = np.zeros((60, cfg.bert_dim), np.float32)
    toks = eng.generate(x, y, bert, top_k=1, rng=jax.random.PRNGKey(0))
    toks = np.asarray(toks)
    assert toks.ndim >= 1  # completed without KeyError at the bucket edge
