"""SoVITS (stage-2 VITS) fine-tuning: the training-only halves of the model.

The reference engine is inference-only — its ``SynthesizerTrn``
(``gsv_tts/GPT_SoVITS/SoVITS/models.py:235``) ships without the posterior
encoder, forward flow direction, or discriminators that VITS training needs.
This module adds them TPU-natively on top of the inference stack in
``models/sovits.py`` (same flat param dict, same torch-layout conv weights,
upstream GPT-SoVITS key names — so a FULL s2 checkpoint's ``enc_q.*``
weights load directly, and a Lite/stripped one gets a fresh init).

Training objective (standard VITS / upstream GPT-SoVITS s2 recipe):
  L_G = L1(mel(ŷ), mel(y))·c_mel + KL(z_p ‖ prior)·c_kl + L_fm·2 + L_adv
  L_D = LSGAN real/fake on the multi-period + scale discriminators

Fine-tune stance: the RVQ codebook and its ``ssl_proj`` front are FROZEN —
they define the semantic-token space the stage-1 GPT was trained against;
updating them would silently break stage-1 compatibility.  (Upstream trains
them jointly and re-trains stage 1 afterwards; freezing is the safe default
for fine-tuning one stage.)
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.convs import conv1d, conv2d
from ..ops import stft as stft_ops
from . import sovits as sv

F32 = jnp.float32
LRELU_SLOPE = 0.1

ENC_Q_LAYERS = 16  # upstream PosteriorEncoder(spec, inter, hidden, 5, 1, 16)
ENC_Q_KERNEL = 5
# param-key prefixes excluded from fine-tune updates (see module docstring)
FROZEN_PREFIXES = ("quantizer.", "ssl_proj.")


def _leaky(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


# ---------------------------------------------------------------------------
# Posterior encoder (enc_q) — upstream ``modules.PosteriorEncoder``
# ---------------------------------------------------------------------------

def init_enc_q_params(rng, cfg: sv.SovitsConfig, dtype=F32) -> Dict[str, jnp.ndarray]:
    """Fresh ``enc_q.*`` params in upstream state-dict naming (weight-norm
    already folded, like the rest of the loaded param dict)."""
    keys = jax.random.split(rng, 4 + 2 * ENC_Q_LAYERS)
    ki = iter(keys)
    H = cfg.hidden_channels

    def conv_w(key, out_ch, in_ch, k):
        fan = in_ch * k
        return (jax.random.normal(key, (out_ch, in_ch, k)) / math.sqrt(fan)).astype(dtype)

    p = {
        "enc_q.pre.weight": conv_w(next(ki), H, cfg.spec_channels, 1),
        "enc_q.pre.bias": jnp.zeros((H,), dtype),
        "enc_q.proj.weight": conv_w(next(ki), 2 * cfg.inter_channels, H, 1),
        "enc_q.proj.bias": jnp.zeros((2 * cfg.inter_channels,), dtype),
        "enc_q.enc.cond_layer.weight": conv_w(next(ki), 2 * H * ENC_Q_LAYERS,
                                              cfg.gin_channels, 1),
        "enc_q.enc.cond_layer.bias": jnp.zeros((2 * H * ENC_Q_LAYERS,), dtype),
    }
    for i in range(ENC_Q_LAYERS):
        p[f"enc_q.enc.in_layers.{i}.weight"] = conv_w(next(ki), 2 * H, H, ENC_Q_KERNEL)
        p[f"enc_q.enc.in_layers.{i}.bias"] = jnp.zeros((2 * H,), dtype)
        out_ch = 2 * H if i < ENC_Q_LAYERS - 1 else H
        p[f"enc_q.enc.res_skip_layers.{i}.weight"] = conv_w(next(ki), out_ch, H, 1)
        p[f"enc_q.enc.res_skip_layers.{i}.bias"] = jnp.zeros((out_ch,), dtype)
    return p


def posterior_encoder(p, cfg: sv.SovitsConfig, spec, spec_mask, ge, noise):
    """spec [B, spec_ch, T] → (z, m_q, logs_q); ``noise`` is standard normal
    shaped like m_q (explicit for reproducibility, as in decode_core)."""
    h = conv1d(spec, p["enc_q.pre.weight"], p["enc_q.pre.bias"]) * spec_mask
    h = sv.wn(p, "enc_q.enc.", h, spec_mask, ENC_Q_LAYERS, cfg.hidden_channels,
              ENC_Q_KERNEL, 1, g=ge)
    stats = conv1d(h, p["enc_q.proj.weight"], p["enc_q.proj.bias"]) * spec_mask
    m = stats[:, : cfg.inter_channels]
    logs = stats[:, cfg.inter_channels:]
    z = (m + noise * jnp.exp(logs)) * spec_mask
    return z, m, logs


# ---------------------------------------------------------------------------
# Forward flow (training direction; inference uses sovits.flow_reverse)
# ---------------------------------------------------------------------------

def flow_forward(p, cfg: sv.SovitsConfig, x, x_mask, g):
    """``ResidualCouplingBlock`` forward (z → z_p): couple then Flip, flows
    in order — the exact inverse of ``sovits.flow_reverse`` (mean-only
    couplings, so no logdet term)."""
    half = cfg.inter_channels // 2
    for i in range(cfg.flow_n_flows):
        pfx = f"flow.flows.{i * 2}."
        x0 = x[:, :half]
        x1 = x[:, half:]
        h = conv1d(x0, p[pfx + "pre.weight"], p[pfx + "pre.bias"]) * x_mask
        h = sv.wn(p, pfx + "enc.", h, x_mask, cfg.flow_n_layers,
                  cfg.hidden_channels, cfg.flow_kernel_size, 1, g=g)
        m = conv1d(h, p[pfx + "post.weight"], p[pfx + "post.bias"]) * x_mask
        x1 = (m + x1) * x_mask
        x = jnp.concatenate([x0, x1], axis=1)
        x = jnp.flip(x, axis=1)
    return x


# ---------------------------------------------------------------------------
# Mel loss front-end
# ---------------------------------------------------------------------------

def mel_spectrogram(audio, *, n_fft: int, hop_length: int, win_length: int,
                    sr: int, n_mels: int = 128, fmin: float = 0.0,
                    fmax: Optional[float] = None):
    """log-mel for the reconstruction loss: magnitude STFT → slaney mel →
    log(clamp(·, 1e-5)) (upstream ``mel_processing.spectral_normalize``).
    Both y and ŷ pass through this same transform, so the center-padding
    convention difference vs upstream is loss-neutral."""
    spec = stft_ops.spectrogram(audio, n_fft, hop_length, win_length)
    fb = jnp.asarray(stft_ops.mel_filterbank(sr, n_fft, n_mels, fmin, fmax),
                     spec.dtype)
    mel = jnp.einsum("mf,...ft->...mt", fb, spec)
    return jnp.log(jnp.clip(mel, 1e-5))


def rand_slice_segments(rng, x, lengths, segment_frames: int):
    """Per-row random window of ``segment_frames`` frames from x [B, C, T]
    (upstream ``commons.rand_slice_segments``).  Returns (slices, ids)."""
    B = x.shape[0]
    max_start = jnp.maximum(lengths - segment_frames, 0)
    ids = (jax.random.uniform(rng, (B,)) * (max_start + 1).astype(F32)).astype(jnp.int32)

    def cut(row, start):
        return jax.lax.dynamic_slice(row, (0, start), (row.shape[0], segment_frames))

    return jax.vmap(cut)(x, ids), ids


def slice_audio(wav, ids, segment_frames: int, hop_length: int):
    """Matching waveform windows for :func:`rand_slice_segments` ids."""
    seg = segment_frames * hop_length

    def cut(row, start):
        return jax.lax.dynamic_slice(row, (start * hop_length,), (seg,))

    return jax.vmap(cut)(wav, ids)


# ---------------------------------------------------------------------------
# Discriminators (multi-period + scale), fresh-initialized for fine-tuning
# ---------------------------------------------------------------------------

PERIODS = (2, 3, 5, 7, 11)
_P_CH = (1, 32, 128, 512, 1024, 1024)
_S_SPEC = (  # (out, in, kernel, stride, groups) per DiscriminatorS conv
    (16, 1, 15, 1, 1), (64, 16, 41, 4, 4), (256, 64, 41, 4, 16),
    (1024, 256, 41, 4, 64), (1024, 1024, 41, 4, 256), (1024, 1024, 5, 1, 1),
)


def init_discriminator_params(rng, dtype=F32) -> Dict[str, jnp.ndarray]:
    """Multi-period (2,3,5,7,11) + scale discriminators, upstream topology,
    plain convs (the weight-norm parametrization is a training nicety we
    drop for fresh discriminators)."""
    n_keys = len(PERIODS) * 6 + len(_S_SPEC) + 1
    keys = iter(jax.random.split(rng, n_keys))

    def w(key, shape, fan):
        return (jax.random.normal(key, shape) * 0.02 / math.sqrt(max(fan / 64.0, 1.0))
                ).astype(dtype)

    p: Dict[str, jnp.ndarray] = {}
    for pi, period in enumerate(PERIODS):
        for i in range(5):
            cin, cout = _P_CH[i], _P_CH[i + 1]
            k = (5, 1)
            p[f"mpd.{pi}.convs.{i}.weight"] = w(next(keys), (cout, cin, *k), cin * 5)
            p[f"mpd.{pi}.convs.{i}.bias"] = jnp.zeros((cout,), dtype)
        p[f"mpd.{pi}.post.weight"] = w(next(keys), (1, 1024, 3, 1), 1024 * 3)
        p[f"mpd.{pi}.post.bias"] = jnp.zeros((1,), dtype)
    for i, (cout, cin, k, _s, g) in enumerate(_S_SPEC):
        p[f"msd.convs.{i}.weight"] = w(next(keys), (cout, cin // g, k), cin * k // g)
        p[f"msd.convs.{i}.bias"] = jnp.zeros((cout,), dtype)
    p["msd.post.weight"] = w(next(keys), (1, 1024, 3), 1024 * 3)
    p["msd.post.bias"] = jnp.zeros((1,), dtype)
    return p


def _disc_p(p, pi: int, period: int, y):
    """DiscriminatorP forward: y [B, 1, T] → (logits, feature maps)."""
    B, _, T = y.shape
    pad = (-T) % period
    if pad:
        y = jnp.pad(y, [(0, 0), (0, 0), (0, pad)], mode="reflect")
        T = T + pad
    x = y.reshape(B, 1, T // period, period)
    fmap = []
    for i in range(5):
        stride = (3, 1) if i < 4 else (1, 1)
        x = conv2d(x, p[f"mpd.{pi}.convs.{i}.weight"], p[f"mpd.{pi}.convs.{i}.bias"],
                   stride=stride, padding=((2, 2), (0, 0)))
        x = _leaky(x)
        fmap.append(x)
    x = conv2d(x, p[f"mpd.{pi}.post.weight"], p[f"mpd.{pi}.post.bias"],
               padding=((1, 1), (0, 0)))
    fmap.append(x)
    return x.reshape(B, -1), fmap


def _disc_s(p, y):
    """DiscriminatorS forward: y [B, 1, T] → (logits, feature maps)."""
    x = y
    fmap = []
    for i, (_cout, _cin, k, s, g) in enumerate(_S_SPEC):
        x = conv1d(x, p[f"msd.convs.{i}.weight"], p[f"msd.convs.{i}.bias"],
                   stride=s, padding=k // 2, groups=g)
        x = _leaky(x)
        fmap.append(x)
    x = conv1d(x, p["msd.post.weight"], p["msd.post.bias"], padding=1)
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def discriminate(p, y):
    """All discriminators on y [B, 1, T] → (logits list, fmaps list)."""
    outs, fmaps = [], []
    o, f = _disc_s(p, y)
    outs.append(o)
    fmaps.append(f)
    for pi, period in enumerate(PERIODS):
        o, f = _disc_p(p, pi, period, y)
        outs.append(o)
        fmaps.append(f)
    return outs, fmaps


# ---------------------------------------------------------------------------
# Losses (upstream ``losses.py`` semantics)
# ---------------------------------------------------------------------------

def kl_loss(z_p, logs_q, m_p, logs_p, z_mask):
    """Upstream normalization: channel-summed KL averaged over valid frames
    (``sum(kl·mask) / sum(mask)`` with mask [B,1,T]) — c_kl is calibrated to
    that scale."""
    z_p, logs_q, m_p, logs_p = (t.astype(F32) for t in (z_p, logs_q, m_p, logs_p))
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.maximum(jnp.sum(z_mask), 1.0)


def feature_loss(fmaps_real, fmaps_fake):
    loss = 0.0
    for fr, ff in zip(fmaps_real, fmaps_fake):
        for r, f in zip(fr, ff):
            loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(r).astype(F32)
                                           - f.astype(F32)))
    return loss * 2.0


def generator_adv_loss(disc_fake_outs):
    return sum(jnp.mean((1.0 - d.astype(F32)) ** 2) for d in disc_fake_outs)


def discriminator_loss(disc_real_outs, disc_fake_outs):
    loss = 0.0
    for dr, df in zip(disc_real_outs, disc_fake_outs):
        loss = loss + jnp.mean((1.0 - dr.astype(F32)) ** 2) + jnp.mean(
            df.astype(F32) ** 2)
    return loss


# ---------------------------------------------------------------------------
# Training forward + two-optimizer step
# ---------------------------------------------------------------------------

def train_forward(params, cfg: sv.SovitsConfig, batch, rng):
    """Upstream ``SynthesizerTrn.forward`` semantics with a frozen RVQ:
    ssl → (frozen) codes → text encoder prior; spec → posterior z; z → flow
    → z_p; random z slice → generator.  Returns the pieces the losses need.

    batch: ssl [B, 768, T50], spec [B, spec_ch, T], wav [B, T·hop],
           text [B, N], spec_lens [B], text_lens [B]
    plus static ``segment_frames`` handled by the caller.
    """
    spec = batch["spec"]
    B, _, T = spec.shape
    pos = jnp.arange(T)[None, None, :]
    y_mask = (pos < batch["spec_lens"][:, None, None]).astype(spec.dtype)
    tpos = jnp.arange(batch["text"].shape[1])[None, None, :]
    text_mask = (tpos < batch["text_lens"][:, None, None]).astype(spec.dtype)

    # v2Pro: fuse the per-sample speaker embedding exactly as inference
    # does (models.py:315-318) — training without it half-wires the sv
    # branch (ge_to512 trains, sv_emb+prelu never run)
    ge = sv.get_ge(params, cfg, spec, sv_emb=batch.get("sv_emb"),
                   refer_mask=y_mask)

    # frozen semantic tokens: ssl → codes → codebook rows (50 Hz).
    # extract_latent returns [B, n_q, T]; quantizer_decode expects [n_q, B, T].
    codes = sv.extract_latent(params, jax.lax.stop_gradient(batch["ssl"]))
    quantized = sv.quantizer_decode(params, codes.transpose(1, 0, 2),
                                    cfg.quantizer_n_q)
    quantized = sv.interpolate_nearest_2x(quantized)[:, :, :T]
    pad_t = T - quantized.shape[-1]
    if pad_t > 0:
        quantized = jnp.pad(quantized, [(0, 0), (0, 0), (0, pad_t)])
    quantized = jax.lax.stop_gradient(quantized)

    y_latent, y_mask, _attn = sv.text_encoder_infer(
        params, cfg, quantized, batch["text"], sv.ge_for_mrte(params, cfg, ge),
        y_mask=y_mask, text_mask=text_mask)
    m_p, logs_p = sv.project_latent(params, cfg, y_latent, y_mask)

    rng_q, rng_slice = jax.random.split(rng)
    noise = jax.random.normal(rng_q, m_p.shape, dtype=F32).astype(spec.dtype)
    z, m_q, logs_q = posterior_encoder(params, cfg, spec, y_mask, ge, noise)
    z_p = flow_forward(params, cfg, z, y_mask, ge)

    return dict(z=z, z_p=z_p, m_p=m_p, logs_p=logs_p, m_q=m_q, logs_q=logs_q,
                y_mask=y_mask, ge=ge, rng_slice=rng_slice)


def make_sovits_train_step(cfg: sv.SovitsConfig, g_optimizer, d_optimizer, *,
                           n_fft: int, hop_length: int, win_length: int,
                           sr: int, segment_frames: int, n_mels: int = 128,
                           c_mel: float = 45.0, c_kl: float = 1.0):
    """Returns a jittable
    ``(g_params, d_params, g_opt_state, d_opt_state, batch, rng) → (...,
    metrics)`` step: D update on stop-gradiented ŷ, then G update
    (mel + KL + feature-matching + adversarial) — upstream s2 loop order.
    RVQ/ssl_proj grads are zeroed (frozen, see module docstring)."""

    def mel(a):
        return mel_spectrogram(a, n_fft=n_fft, hop_length=hop_length,
                               win_length=win_length, sr=sr, n_mels=n_mels)

    def synth(g_params, batch, rng):
        out = train_forward(g_params, cfg, batch, rng)
        z_slice, ids = rand_slice_segments(out["rng_slice"], out["z"],
                                           batch["spec_lens"], segment_frames)
        y_hat = sv.generator(g_params, cfg, z_slice, g=out["ge"])[:, 0]
        y = slice_audio(batch["wav"], ids, segment_frames, hop_length)
        return y_hat, y, out

    def d_loss_fn(d_params, y, y_hat):
        real_outs, _ = discriminate(d_params, y[:, None])
        fake_outs, _ = discriminate(d_params, y_hat[:, None])
        return discriminator_loss(real_outs, fake_outs)

    def g_loss_fn(g_params, d_params, batch, rng):
        y_hat, y, out = synth(g_params, batch, rng)
        l_mel = jnp.mean(jnp.abs(mel(y_hat) - mel(y))) * c_mel
        l_kl = kl_loss(out["z_p"], out["logs_q"], out["m_p"], out["logs_p"],
                       out["y_mask"]) * c_kl
        real_outs, real_fmaps = discriminate(d_params, y[:, None])
        fake_outs, fake_fmaps = discriminate(d_params, y_hat[:, None])
        l_fm = feature_loss(real_fmaps, fake_fmaps)
        l_adv = generator_adv_loss(fake_outs)
        total = l_mel + l_kl + l_fm + l_adv
        return total, dict(mel=l_mel, kl=l_kl, fm=l_fm, adv=l_adv)

    def step(g_params, d_params, g_opt_state, d_opt_state, batch, rng):
        # ONE noise stream for both phases: the G loss must rebuild the
        # exact y_hat the D step scored (upstream single-forward GAN
        # recipe) — do NOT give G a fresh key
        rng_d, _ = jax.random.split(rng)
        y_hat, y, _ = synth(g_params, batch, rng_d)
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            d_params, y, jax.lax.stop_gradient(y_hat))
        d_updates, d_opt_state = d_optimizer.update(d_grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, d_updates)

        (g_loss, parts), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_params, d_params, batch, rng_d)
        g_grads = {k: (jnp.zeros_like(v)
                       if k.startswith(FROZEN_PREFIXES) else v)
                   for k, v in g_grads.items()}
        g_updates, g_opt_state = g_optimizer.update(g_grads, g_opt_state, g_params)
        # zero the UPDATES too, not just the grads: adamw's decoupled weight
        # decay adds -lr*wd*param regardless of gradient, which would let
        # the "frozen" codebook drift over a long fine-tune
        g_updates = {k: (jnp.zeros_like(v)
                         if k.startswith(FROZEN_PREFIXES) else v)
                     for k, v in g_updates.items()}
        g_params = optax.apply_updates(g_params, g_updates)
        metrics = dict(parts, g_total=g_loss, d_total=d_loss)
        return g_params, d_params, g_opt_state, d_opt_state, metrics

    return step


def pad_sovits_batch(cfg: sv.SovitsConfig, samples, hop_length: int,
                     pad_multiple: int = 32):
    """Collate [(ssl [768, T50], spec [spec_ch, T], wav [T·hop], text
    [, sv_emb [D]]), ...] into the padded dict :func:`train_forward`
    consumes.  Frame counts are aligned to min(ssl·2-rate, spec) per
    sample by the featurizer; here we just pad to a common bucketed
    length.  v2Pro samples carry a 5th element (their own ERes2NetV2
    embedding) which becomes ``batch["sv_emb"]`` — required for v2Pro
    fine-tunes so training sees the fused conditioning inference uses."""
    B = len(samples)
    T = max(s[1].shape[-1] for s in samples)
    T = -(-T // pad_multiple) * pad_multiple
    N = max(len(s[3]) for s in samples)
    N = -(-N // 8) * 8
    ssl = np.zeros((B, samples[0][0].shape[0], T), np.float32)  # 50 Hz, same rate as spec
    spec = np.zeros((B, samples[0][1].shape[0], T), np.float32)
    wav = np.zeros((B, T * hop_length), np.float32)
    text = np.zeros((B, N), np.int32)
    spec_lens = np.zeros((B,), np.int32)
    text_lens = np.zeros((B,), np.int32)
    sv_embs = []
    for i, sample in enumerate(samples):
        s, sp, w, t = sample[:4]
        Ls = min(s.shape[-1], T)
        ssl[i, :, :Ls] = s[:, :Ls]
        spec[i, :, : sp.shape[-1]] = sp
        wav[i, : len(w)] = w[: wav.shape[-1]]
        spec_lens[i] = sp.shape[-1]
        text[i, : len(t)] = t
        text_lens[i] = len(t)
        if len(sample) > 4 and sample[4] is not None:
            sv_embs.append(np.asarray(sample[4], np.float32))
    if cfg.is_v2pro and len(sv_embs) != B:
        raise ValueError(
            "v2Pro fine-tune needs a per-sample sv_emb (featurize_sovits "
            "computes it); got " f"{len(sv_embs)}/{B} samples with one")
    out = {"ssl": jnp.asarray(ssl), "spec": jnp.asarray(spec),
           "wav": jnp.asarray(wav), "text": jnp.asarray(text),
           "spec_lens": jnp.asarray(spec_lens),
           "text_lens": jnp.asarray(text_lens)}
    if len(sv_embs) == B:
        out["sv_emb"] = jnp.asarray(np.stack(sv_embs))
    return out
