"""SoVITS fine-tune machinery (training-only halves; the reference is
inference-only so these are anchored by self-consistency invariants —
most importantly flow forward/reverse invertibility)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsv_tts_tpu.models import sovits as jsv
from gsv_tts_tpu.models import sovits_train as svt


def tiny_cfg():
    return jsv.SovitsConfig(
        spec_channels=129, inter_channels=64, hidden_channels=64,
        filter_channels=96, n_heads=2, n_layers=2, kernel_size=3,
        p_dropout=0.0, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),), upsample_rates=(2, 2),
        upsample_initial_channel=32, upsample_kernel_sizes=(4, 4),
        # gin stays 512: the MRTE hidden is fixed at 512 in the reference
        # topology and adds ge directly (models/sovits.py:243)
        gin_channels=512, ref_enc_in=96, flow_n_layers=2)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = jsv.init_params(jax.random.PRNGKey(0), cfg)
    params.update(svt.init_enc_q_params(jax.random.PRNGKey(1), cfg))
    return cfg, params


def test_flow_forward_inverts_reverse(setup):
    """flow_forward is the exact inverse of the inference flow_reverse —
    the one numeric anchor available without upstream training code."""
    cfg, params = setup
    rng = np.random.RandomState(0)
    B, T = 2, 24
    x = jnp.asarray(rng.randn(B, cfg.inter_channels, T).astype(np.float32))
    mask = jnp.ones((B, 1, T), jnp.float32)
    ge = jnp.asarray(rng.randn(B, cfg.gin_channels, 1).astype(np.float32))
    z_p = svt.flow_forward(params, cfg, x, mask, ge)
    back = jsv.flow_reverse(params, cfg, z_p, mask, ge)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-4, atol=1e-5)
    # and the other composition order
    x2 = svt.flow_forward(params, cfg, jsv.flow_reverse(params, cfg, x, mask, ge),
                          mask, ge)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


def test_posterior_encoder_masks_and_shapes(setup):
    cfg, params = setup
    rng = np.random.RandomState(1)
    B, T = 2, 20
    spec = jnp.asarray(rng.randn(B, cfg.spec_channels, T).astype(np.float32))
    lens = jnp.asarray([20, 13], jnp.int32)
    mask = (jnp.arange(T)[None, None, :] < lens[:, None, None]).astype(jnp.float32)
    noise = jnp.asarray(rng.randn(B, cfg.inter_channels, T).astype(np.float32))
    ge = jnp.asarray(rng.randn(B, cfg.gin_channels, 1).astype(np.float32))
    z, m, logs = svt.posterior_encoder(params, cfg, spec, mask, ge, noise)
    assert z.shape == (B, cfg.inter_channels, T)
    # masked frames are exactly zero
    np.testing.assert_array_equal(np.asarray(z[1, :, 13:]), 0.0)
    assert np.isfinite(np.asarray(z)).all()


def test_kl_loss_minimal_at_matched_distributions():
    rng = np.random.RandomState(2)
    B, C, T = 1, 8, 2000
    m_p = jnp.asarray(rng.randn(B, C, T).astype(np.float32))
    logs_p = jnp.asarray((rng.randn(B, C, T) * 0.3).astype(np.float32))
    mask = jnp.ones((B, 1, T), jnp.float32)
    eps = rng.randn(B, C, T).astype(np.float32)
    # samples drawn FROM the prior: E[kl] = 0 per frame·channel (×C summed)
    z_p = m_p + jnp.asarray(eps) * jnp.exp(logs_p)
    matched = float(svt.kl_loss(z_p, logs_p, m_p, logs_p, mask))
    assert abs(matched) < 0.3  # Monte-Carlo around 0 (channel-summed scale)
    # a shifted posterior must cost strictly more
    shifted = float(svt.kl_loss(z_p + 1.0, logs_p, m_p, logs_p, mask))
    assert shifted > matched + 1.0


def test_discriminators_and_losses(setup):
    rng = np.random.RandomState(3)
    d_params = svt.init_discriminator_params(jax.random.PRNGKey(2))
    y = jnp.asarray(rng.randn(2, 1, 512).astype(np.float32) * 0.1)
    outs, fmaps = svt.discriminate(d_params, y)
    assert len(outs) == 1 + len(svt.PERIODS)
    assert len(fmaps[0]) == 7  # DiscriminatorS: 6 convs + post
    assert all(len(f) == 6 for f in fmaps[1:])  # DiscriminatorP: 5 convs + post
    loss = svt.discriminator_loss(outs, outs)
    assert np.isfinite(float(loss))
    g_adv = svt.generator_adv_loss(outs)
    fm = svt.feature_loss(fmaps, fmaps)
    assert float(fm) == 0.0
    assert np.isfinite(float(g_adv))


def test_train_forward_prior_is_per_sample(setup):
    """Regression for the r2 codes-layout bug: extract_latent returns
    [B, n_q, T] but quantizer_decode expects [n_q, B, T]; passing codes
    through untransposed silently broadcast sample 0's semantic codes
    across the whole batch.  Each row's prior (m_p/logs_p) must match a
    per-sample B=1 forward."""
    cfg, params = setup
    rng = np.random.RandomState(7)
    hop = int(np.prod(cfg.upsample_rates))
    T = 32
    samples = [
        (rng.randn(768, T).astype(np.float32) * 0.1,
         np.abs(rng.randn(cfg.spec_channels, T)).astype(np.float32),
         rng.randn(T * hop).astype(np.float32) * 0.1,
         rng.randint(1, 100, size=(9,)).astype(np.int32)),
        (rng.randn(768, T).astype(np.float32) * 0.1,
         np.abs(rng.randn(cfg.spec_channels, T)).astype(np.float32),
         rng.randn(T * hop).astype(np.float32) * 0.1,
         rng.randint(1, 100, size=(9,)).astype(np.int32)),
    ]
    batched = svt.pad_sovits_batch(cfg, samples, hop)
    out_b = svt.train_forward(params, cfg, batched, jax.random.PRNGKey(8))
    for i, s in enumerate(samples):
        single = svt.pad_sovits_batch(cfg, [s], hop)
        out_1 = svt.train_forward(params, cfg, single, jax.random.PRNGKey(8))
        for key in ("m_p", "logs_p"):
            np.testing.assert_allclose(
                np.asarray(out_b[key][i]), np.asarray(out_1[key][0]),
                rtol=1e-4, atol=1e-5,
                err_msg=f"{key} row {i} diverges from per-sample forward")
    # the two rows carry different ssl content, so identical priors would
    # mean the broadcast bug is back
    assert not np.allclose(np.asarray(out_b["m_p"][0]),
                           np.asarray(out_b["m_p"][1]))


def test_train_step_updates_and_freezes(setup):
    """One full G/D step on a tiny batch: finite metrics, generator params
    move, frozen RVQ/ssl_proj params bit-identical."""
    import optax

    cfg, params = setup
    params = dict(params)
    d_params = svt.init_discriminator_params(jax.random.PRNGKey(3))
    # hop must equal the generator's samples_per_frame (prod(upsample_rates))
    hop = int(np.prod(cfg.upsample_rates))
    n_fft = win = 16
    seg = 16
    step = svt.make_sovits_train_step(
        cfg, optax.adam(2e-4), optax.adam(2e-4),
        n_fft=n_fft, hop_length=hop, win_length=win, sr=16000,
        segment_frames=seg, n_mels=8)

    rng = np.random.RandomState(4)
    T = 32
    samples = [
        (rng.randn(768, T).astype(np.float32) * 0.1,
         np.abs(rng.randn(cfg.spec_channels, T)).astype(np.float32),
         rng.randn(T * hop).astype(np.float32) * 0.1,
         rng.randint(1, 100, size=(12,)).astype(np.int32)),
        (rng.randn(768, T - 10).astype(np.float32) * 0.1,
         np.abs(rng.randn(cfg.spec_channels, T - 10)).astype(np.float32),
         rng.randn((T - 10) * hop).astype(np.float32) * 0.1,
         rng.randint(1, 100, size=(7,)).astype(np.int32)),
    ]
    batch = svt.pad_sovits_batch(cfg, samples, hop)
    assert batch["spec"].shape[-1] % 32 == 0
    assert batch["ssl"].shape[-1] == batch["spec"].shape[-1]

    g_opt = optax.adam(2e-4).init(params)
    d_opt = optax.adam(2e-4).init(d_params)
    frozen_before = {k: np.asarray(v) for k, v in params.items()
                     if k.startswith(svt.FROZEN_PREFIXES)}
    assert frozen_before, "expected quantizer/ssl_proj keys in params"

    jstep = jax.jit(step)
    g2, d2, g_opt, d_opt, metrics = jstep(params, d_params, g_opt, d_opt,
                                          batch, jax.random.PRNGKey(5))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite: {v}"
    # generator moved…
    moved = sum(1 for k in params
                if not np.array_equal(np.asarray(params[k]), np.asarray(g2[k])))
    assert moved > 10
    # …but the frozen semantic-token space did not
    for k, before in frozen_before.items():
        np.testing.assert_array_equal(before, np.asarray(g2[k]), err_msg=k)
    # a second step still runs (opt states thread through)
    g3, d3, g_opt, d_opt, metrics2 = jstep(g2, d2, g_opt, d_opt, batch,
                                           jax.random.PRNGKey(6))
    assert np.isfinite(float(metrics2["g_total"]))


def test_v2pro_finetune_fuses_sv_emb():
    """v2Pro fine-tuning must apply the SAME ge fusion inference uses
    (style + sv_emb linear + prelu, models.py:315-318): the batch carries
    a per-sample sv_emb, train_forward consumes it, and a v2Pro batch
    WITHOUT embeddings is rejected instead of silently half-wiring the sv
    branch."""
    cfg = jsv.SovitsConfig(
        spec_channels=129, inter_channels=64, hidden_channels=64,
        filter_channels=96, n_heads=2, n_layers=2, kernel_size=3,
        p_dropout=0.0, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),), upsample_rates=(2, 2),
        upsample_initial_channel=32, upsample_kernel_sizes=(4, 4),
        gin_channels=512, ref_enc_in=96, flow_n_layers=2,
        version="v2Pro")
    assert cfg.is_v2pro
    params = jsv.init_params(jax.random.PRNGKey(0), cfg)
    params.update(svt.init_enc_q_params(jax.random.PRNGKey(1), cfg))
    sv_dim = params["sv_emb.weight"].shape[-1]

    rng = np.random.RandomState(3)
    hop = 4
    samples = []
    for i in range(2):
        T = int(rng.randint(20, 28))
        samples.append((rng.randn(768, T).astype(np.float32) * 0.1,
                        np.abs(rng.randn(cfg.spec_channels, T)).astype(np.float32),
                        (rng.randn(T * hop) * 0.1).astype(np.float32),
                        rng.randint(1, 100, size=(7,)).astype(np.int32),
                        rng.randn(sv_dim).astype(np.float32) * 0.1))

    batch = svt.pad_sovits_batch(cfg, samples, hop, pad_multiple=8)
    assert batch["sv_emb"].shape == (2, sv_dim)

    # the fused ge must match inference's get_ge WITH sv_emb (and differ
    # from the unfused style-only ge the old code trained against)
    T = batch["spec"].shape[-1]
    y_mask = (jnp.arange(T)[None, None, :]
              < batch["spec_lens"][:, None, None]).astype(jnp.float32)
    ge_fused = jsv.get_ge(params, cfg, batch["spec"],
                          sv_emb=batch["sv_emb"], refer_mask=y_mask)
    ge_unfused = jsv.get_ge(params, cfg, batch["spec"], refer_mask=y_mask)
    assert not np.allclose(np.asarray(ge_fused), np.asarray(ge_unfused))

    out = svt.train_forward(params, cfg, batch, jax.random.PRNGKey(5))
    for v in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(v)).all()

    # a v2Pro batch missing the embeddings must be rejected loudly
    with pytest.raises(ValueError, match="sv_emb"):
        svt.pad_sovits_batch(cfg, [s[:4] for s in samples], hop,
                             pad_multiple=8)
