"""Parity of the MXU-native (channels-last, tap-unrolled / polyphase)
conv formulations against the ``lax.conv_general_dilated`` wrappers they
replace in the vocoder hot path.

Every (kernel, stride/dilation, padding) combination exercised by the
SoVITS stack appears here: the HiFi-GAN upsample ladder
(reference ``models.py:68-128``: k/u = 16/10, 16/8, 8/2, 2/2 with
padding (k-u)//2), the resblock dilations (1, 3, 5 at k = 3, 7, 11,
``modules.py:115-209``), the WN in-layers (k=5, ``modules.py:30-112``)
and the k=1/k=7 pre/post convs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsv_tts_tpu.ops.convs import (conv1d, conv1d_mm, conv_transpose1d,
                                   conv_transpose1d_mm)


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.3)


CONV_CASES = [
    # (C_in, C_out, K, dilation, padding, T)
    (192, 512, 7, 1, 3, 55),     # generator conv_pre
    (16, 1, 7, 1, 3, 64),        # generator conv_post
    (256, 256, 3, 1, 1, 40),     # resblock k=3 d=1
    (128, 128, 7, 3, 9, 50),     # resblock k=7 d=3
    (64, 64, 11, 5, 25, 60),     # resblock k=11 d=5
    (192, 384, 5, 1, 2, 55),     # WN in_layer
    (96, 192, 1, 1, 0, 33),      # flow pre (k=1)
    (512, 768, 1, 1, 0, 1),      # WN cond_layer on [B, gin, 1]
]


@pytest.mark.parametrize("cin,cout,k,d,p,t", CONV_CASES)
def test_conv1d_mm_matches_lax(cin, cout, k, d, p, t):
    rng = np.random.RandomState(hash((cin, cout, k, d, p)) % 2**31)
    x = _rand(rng, 2, cin, t)
    w = _rand(rng, cout, cin, k)
    b = _rand(rng, cout)
    ref = conv1d(x, w, b, padding=p, dilation=d)
    got = conv1d_mm(x.transpose(0, 2, 1), w, b, padding=p, dilation=d)
    assert got.shape == (ref.shape[0], ref.shape[2], ref.shape[1])
    np.testing.assert_allclose(np.asarray(got.transpose(0, 2, 1)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


TCONV_CASES = [
    # (C_in, C_out, K, stride, padding, T) — the HiFi-GAN ladder
    (512, 256, 16, 10, 3, 55),
    (256, 128, 16, 8, 4, 40),
    (128, 64, 8, 2, 3, 80),
    (64, 32, 2, 2, 0, 90),
    (32, 16, 2, 2, 0, 100),
    # edge shapes: kernel not a stride multiple, T=1
    (8, 8, 5, 3, 1, 17),
    (8, 8, 4, 4, 0, 1),
]


@pytest.mark.parametrize("cin,cout,k,u,p,t", TCONV_CASES)
def test_conv_transpose1d_mm_matches_lax(cin, cout, k, u, p, t):
    rng = np.random.RandomState(hash((cin, cout, k, u, p)) % 2**31)
    x = _rand(rng, 2, cin, t)
    w = _rand(rng, cin, cout, k)
    b = _rand(rng, cout)
    ref = conv_transpose1d(x, w, b, stride=u, padding=p)
    got = conv_transpose1d_mm(x.transpose(0, 2, 1), w, b, stride=u,
                              padding=p)
    assert got.shape == (ref.shape[0], ref.shape[2], ref.shape[1])
    np.testing.assert_allclose(np.asarray(got.transpose(0, 2, 1)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_conv1d_mm_jit_grad():
    """The mm form stays differentiable (the GAN fine-tune path may adopt
    it later) and jits cleanly."""
    rng = np.random.RandomState(0)
    x = _rand(rng, 1, 20, 16)
    w = _rand(rng, 8, 16, 3)

    def loss(w):
        return jnp.sum(conv1d_mm(x, w, None, padding=1) ** 2)

    g = jax.jit(jax.grad(loss))(w)
    assert g.shape == w.shape and bool(jnp.all(jnp.isfinite(g)))


def test_flow_dec_nlc_matches_nch():
    """The channels-last vocoder (flow_reverse_nlc + generator_nlc, the
    production flow_dec path) reproduces the lax.conv formulation on a
    small but fully-featured config (2 upsample stages, 2 resblock
    kernels, dilated WN, ge conditioning)."""
    from gsv_tts_tpu.models import sovits as jsv

    cfg = jsv.SovitsConfig(
        spec_channels=129, inter_channels=64, hidden_channels=64,
        filter_channels=96, n_heads=2, n_layers=2, kernel_size=3,
        p_dropout=0.0, resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        upsample_rates=(10, 2), upsample_initial_channel=32,
        upsample_kernel_sizes=(16, 4), gin_channels=512, ref_enc_in=96,
        flow_n_layers=2)
    params = jsv.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(7)
    B, T = 2, 23
    z_p = jnp.asarray(rng.randn(B, cfg.inter_channels, T).astype(np.float32))
    mask = np.ones((B, 1, T), np.float32)
    mask[1, :, 17:] = 0.0  # ragged row exercises the masked tail
    mask = jnp.asarray(mask)
    ge = jnp.asarray(rng.randn(B, cfg.gin_channels, 1).astype(np.float32) * 0.1)

    z_ref = jsv.flow_reverse(params, cfg, z_p, mask, ge)
    ref = jsv.generator(params, cfg, z_ref * mask, g=ge)

    mask_t = mask.transpose(0, 2, 1)
    ge_t = ge.transpose(0, 2, 1)
    z_nlc = jsv.flow_reverse_nlc(params, cfg, z_p.transpose(0, 2, 1),
                                 mask_t, ge_t)
    np.testing.assert_allclose(np.asarray(z_nlc.transpose(0, 2, 1)),
                               np.asarray(z_ref), rtol=2e-5, atol=2e-5)
    got = jsv.generator_nlc(params, cfg, z_nlc * mask_t, g=ge_t)
    np.testing.assert_allclose(np.asarray(got.transpose(0, 2, 1)),
                               np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_interpolate_nearest_double_precision_indices():
    """torch's upsample_nearest1d computes floor(i·scale) in DOUBLE; a
    float32 product flips to the neighboring index exactly at integer
    ratio boundaries (t=441, size=300, i=100: f32 → 147, double → 146).
    Oracle: torch.nn.functional.interpolate."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from gsv_tts_tpu.ops.convs import interpolate_nearest

    rng = np.random.RandomState(0)
    for t, size in ((441, 300), (300, 441), (55, 128), (1000, 333)):
        x = rng.randn(1, 4, t).astype(np.float32)
        got = np.asarray(interpolate_nearest(jnp.asarray(x), size))
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=size, mode="nearest").numpy()
        np.testing.assert_array_equal(got, want, err_msg=f"t={t} size={size}")
