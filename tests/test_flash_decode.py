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
