"""Bucket-padded streaming vocoder core (models/sovits.py
decode_core_stream_padded): the padded+masked ONE-program path must
reproduce the exact-shape decode_core valid region for every streaming
chunk kind (first chunk, blended continuation, cumulative growth)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsv_tts_tpu.models import sovits as jsv


@pytest.fixture(scope="module")
def setup():
    cfg = jsv.SovitsConfig(
        spec_channels=129, inter_channels=64, hidden_channels=64,
        filter_channels=96, n_heads=2, n_layers=2, kernel_size=3,
        p_dropout=0.0, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),), upsample_rates=(2, 2),
        upsample_initial_channel=32, upsample_kernel_sizes=(4, 4),
        gin_channels=512, ref_enc_in=96, flow_n_layers=2)
    params = jsv.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _pad_codes(codes, bucket):
    out = np.zeros((1, 1, bucket), np.int32)
    out[..., :codes.shape[-1]] = codes
    return jnp.asarray(out)


def _pad_text(text, bucket):
    out = np.zeros((1, bucket), np.int32)
    out[..., :text.shape[-1]] = text
    return jnp.asarray(out)


def test_padded_stream_core_matches_exact_chunks(setup):
    """Walk three cumulative chunks exactly like the facade's streaming
    loop does, through BOTH paths, carrying each path's own y_overlap.
    z_p / mask / attn / overlap must agree in the valid region."""
    cfg, params = setup
    rng = np.random.RandomState(0)
    n_text = 13
    text = rng.randint(1, 700, (1, n_text)).astype(np.int32)
    ge = jnp.asarray(rng.randn(1, cfg.gin_channels, 1).astype(np.float32) * 0.1)
    overlap = 5
    all_codes = rng.randint(0, 1024, (1, 1, 60)).astype(np.int32)

    vsi = 0
    y_ov_exact = None
    y_ov_pad = None
    for k, n in enumerate((20, 41, 60)):
        codes = all_codes[..., :n]
        t_valid = 2 * n - vsi
        noise = jnp.zeros((1, cfg.inter_channels, t_valid), jnp.float32)

        z_e, m_e, attn_e, ov_e, _ = jsv.decode_core(
            params, cfg, jnp.asarray(codes), jnp.asarray(text), ge, noise,
            y_overlap=y_ov_exact, valid_start_idx=vsi, overlap_len=overlap)

        Bc = ((n + 31) // 32) * 32
        noise_pad = jnp.zeros((1, cfg.inter_channels, 2 * Bc), jnp.float32)
        blend = y_ov_pad is not None
        y_ov_in = y_ov_pad if blend else jnp.zeros(
            (1, cfg.hidden_channels, overlap), jnp.float32)
        z_p, m_p, attn_p, ov_p = jsv.decode_core_stream_padded(
            params, cfg, _pad_codes(codes, Bc), jnp.int32(n),
            _pad_text(text, 32), jnp.int32(n_text), ge, noise_pad,
            y_ov_in, jnp.int32(vsi), overlap_len=overlap, blend=blend)

        np.testing.assert_allclose(
            np.asarray(z_p[:, :, :t_valid]), np.asarray(z_e),
            rtol=2e-4, atol=2e-5, err_msg=f"chunk {k} z_p")
        np.testing.assert_array_equal(
            np.asarray(m_p[:, :, :t_valid]), np.asarray(m_e),
            err_msg=f"chunk {k} mask")
        np.testing.assert_allclose(
            np.asarray(attn_p[..., :2 * n, :n_text]), np.asarray(attn_e),
            rtol=2e-4, atol=2e-5, err_msg=f"chunk {k} attn")
        np.testing.assert_allclose(
            np.asarray(ov_p), np.asarray(ov_e),
            rtol=2e-4, atol=2e-5, err_msg=f"chunk {k} overlap carry")

        # mirror the facade: next chunk starts at the trimmed attn length
        vsi = attn_e[:, :-overlap, :].shape[1]
        y_ov_exact = ov_e
        y_ov_pad = ov_p


def test_padded_stream_core_is_jittable_one_program(setup):
    """The padded core compiles once per shape bucket: different lengths
    within the same bucket must NOT retrace (lengths are traced scalars)."""
    cfg, params = setup
    import gsv_tts_tpu.tts as facade

    rng = np.random.RandomState(1)
    text = _pad_text(rng.randint(1, 700, (1, 9)).astype(np.int32), 32)
    ge = jnp.asarray(rng.randn(1, cfg.gin_channels, 1).astype(np.float32) * 0.1)
    noise = jnp.zeros((1, cfg.inter_channels, 64), jnp.float32)
    y_ov = jnp.zeros((1, cfg.hidden_channels, 5), jnp.float32)

    fn = facade._stream_core_padded_jit
    before = fn._cache_size()
    for n in (10, 17, 25, 31):
        codes = _pad_codes(rng.randint(0, 1024, (1, 1, n)).astype(np.int32), 32)
        z, m, a, o = fn(params, cfg, codes, jnp.int32(n), text, jnp.int32(9),
                        ge, noise, y_ov, jnp.int32(0), 5, False)
        assert np.isfinite(np.asarray(z)).all()
    assert fn._cache_size() - before <= 1, "length change retraced the jit"
