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


def test_batched_stream_core_matches_solo_rows(setup):
    """decode_core_stream_padded_batch: N rows at DIFFERENT progress points
    (first chunk, blended continuation, different lengths) in one program
    must reproduce each row's solo decode_core_stream_padded result in its
    valid region — including rows padded into a larger common bucket."""
    cfg, params = setup
    rng = np.random.RandomState(2)
    overlap = 5
    # (n_codes, n_text, vsi, blend)
    rows = [(20, 13, 0, False),   # first chunk
            (41, 13, 35, True),   # continuation (needs y_overlap)
            (9, 7, 0, False)]     # short row padded far into the bucket
    y_ovs = [None,
             jnp.asarray(rng.randn(1, cfg.hidden_channels, overlap)
                         .astype(np.float32) * 0.1),
             None]
    codes = [rng.randint(0, 1024, (1, 1, n)).astype(np.int32)
             for n, *_ in rows]
    texts = [rng.randint(1, 700, (1, t)).astype(np.int32)
             for _, t, *_ in rows]
    ges = [jnp.asarray(rng.randn(1, cfg.gin_channels, 1)
                       .astype(np.float32) * 0.1) for _ in rows]

    B = len(rows)
    Bc = ((max(n for n, *_ in rows) + 31) // 32) * 32
    Np = ((max(t for _, t, *_ in rows) + 31) // 32) * 32
    T50 = 2 * Bc
    noise = jnp.asarray(rng.randn(B, cfg.inter_channels, T50)
                        .astype(np.float32) * 0.3)

    codes_b = np.zeros((B, 1, Bc), np.int32)
    text_b = np.zeros((B, Np), np.int32)
    yov_b = np.zeros((B, cfg.hidden_channels, overlap), np.float32)
    for i, ((n, t, _, _), c, tx) in enumerate(zip(rows, codes, texts)):
        codes_b[i, 0, :n] = c
        text_b[i, :t] = tx
        if y_ovs[i] is not None:
            yov_b[i] = np.asarray(y_ovs[i][0])
    z_b, m_b, attn_b, ov_b = jsv.decode_core_stream_padded_batch(
        params, cfg, jnp.asarray(codes_b),
        jnp.asarray([n for n, *_ in rows], jnp.int32),
        jnp.asarray(text_b), jnp.asarray([t for _, t, *_ in rows], jnp.int32),
        jnp.concatenate(ges, axis=0), noise, jnp.asarray(yov_b),
        jnp.asarray([v for *_, v, _ in rows], jnp.int32),
        jnp.asarray([b for *_, b in rows]), overlap_len=overlap)

    for i, ((n, t, vsi, blend), c, tx) in enumerate(zip(rows, codes, texts)):
        Bc_i = ((n + 31) // 32) * 32
        # the solo program sees the row's own bucket but the SAME noise
        # values in the valid region (noise enters additively post-slice)
        noise_i = jnp.zeros((1, cfg.inter_channels, 2 * Bc_i), jnp.float32)
        noise_i = noise_i.at[:, :, :T50].set(noise[i:i + 1, :, :2 * Bc_i])
        y_ov_in = (y_ovs[i] if blend else
                   jnp.zeros((1, cfg.hidden_channels, overlap), jnp.float32))
        z_s, m_s, attn_s, ov_s = jsv.decode_core_stream_padded(
            params, cfg, _pad_codes(c, Bc_i), jnp.int32(n),
            _pad_text(tx, ((t + 31) // 32) * 32), jnp.int32(t), ges[i],
            noise_i, y_ov_in, jnp.int32(vsi), overlap_len=overlap,
            blend=blend)
        t_valid = 2 * n - vsi
        np.testing.assert_allclose(
            np.asarray(z_b[i, :, :t_valid]), np.asarray(z_s[0, :, :t_valid]),
            rtol=2e-4, atol=2e-5, err_msg=f"row {i} z_p")
        np.testing.assert_array_equal(
            np.asarray(m_b[i, :, :t_valid]), np.asarray(m_s[0, :, :t_valid]),
            err_msg=f"row {i} mask")
        np.testing.assert_allclose(
            np.asarray(attn_b[i][..., :2 * n, :t]),
            np.asarray(attn_s[0][..., :2 * n, :t]),
            rtol=2e-4, atol=2e-5, err_msg=f"row {i} attn")
        np.testing.assert_allclose(
            np.asarray(ov_b[i]), np.asarray(ov_s[0]),
            rtol=2e-4, atol=2e-5, err_msg=f"row {i} overlap carry")


def test_fused_one_program_matches_split_core_flow(setup):
    """The fused chunk program (core + bucket pad + flow + HiFi-GAN in one
    jit — the production solo AND batched path) must reproduce the split
    core→flow sequence in every row's valid region."""
    cfg, params = setup
    from gsv_tts_tpu.runtime.vocoder_batch import _stream_batch_fused_jit

    rng = np.random.RandomState(4)
    B, n, t = 2, 20, 9
    Bc, Np, overlap, bucket = 32, 32, 5, 45
    codes = np.zeros((B, 1, Bc), np.int32)
    text = np.zeros((B, Np), np.int32)
    codes[:, 0, :n] = rng.randint(0, 1024, (B, n))
    text[:, :t] = rng.randint(1, 700, (B, t))
    ge = jnp.asarray(rng.randn(B, cfg.gin_channels, 1).astype(np.float32) * 0.1)
    noise = jnp.asarray(rng.randn(B, cfg.inter_channels, 2 * Bc)
                        .astype(np.float32) * 0.3)
    y_ov = jnp.zeros((B, cfg.hidden_channels, overlap), jnp.float32)
    lens = jnp.full((B,), n, jnp.int32)
    tlens = jnp.full((B,), t, jnp.int32)
    vsi = jnp.zeros((B,), jnp.int32)
    blend = jnp.zeros((B,), bool)

    audio_f, attn_f, ov_f = _stream_batch_fused_jit(
        params, cfg, jnp.asarray(codes), lens, jnp.asarray(text), tlens,
        ge, noise, y_ov, vsi, blend, overlap, bucket)

    z, m, attn_s, ov_s = jsv.decode_core_stream_padded_batch(
        params, cfg, jnp.asarray(codes), lens, jnp.asarray(text), tlens,
        ge, noise, y_ov, vsi, blend, overlap_len=overlap)
    pad = bucket - z.shape[-1]
    if pad >= 0:
        z = jnp.pad(z, [(0, 0), (0, 0), (0, pad)])
        m = jnp.pad(m, [(0, 0), (0, 0), (0, pad)])
    else:
        z, m = z[:, :, :bucket], m[:, :, :bucket]
    audio_s = jsv.flow_dec(params, cfg, z, m, ge)

    t_valid = 2 * n * cfg.samples_per_frame
    np.testing.assert_allclose(
        np.asarray(audio_f[:, :, :t_valid]),
        np.asarray(audio_s[:, :, :t_valid]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_f), np.asarray(attn_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ov_f), np.asarray(ov_s),
                               rtol=1e-5, atol=1e-6)
