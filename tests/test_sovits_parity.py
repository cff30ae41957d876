"""Parity of the SoVITS stack vs the torch reference
(``gsv_tts/GPT_SoVITS/SoVITS/models.py``) with shared random weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsv_tts_tpu.models import sovits as jsv
from conftest import import_reference_module

torch = pytest.importorskip("torch")

SMALL = dict(
    spec_channels=705,
    segment_size=4,
    inter_channels=192,
    hidden_channels=192,
    filter_channels=256,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.0,
    resblock="1",
    resblock_kernel_sizes=[3],
    resblock_dilation_sizes=[[1, 3, 5]],
    upsample_rates=[2, 2],
    upsample_initial_channel=32,
    upsample_kernel_sizes=[4, 4],
    gin_channels=512,
    version="v2",
)


@pytest.fixture(scope="module")
def ref_models_module():
    for rel, name in [
        ("GPT_SoVITS/G2P/Symbols.py", "GPT_SoVITS.G2P.Symbols"),
        ("GPT_SoVITS/SoVITS/module/commons.py", "GPT_SoVITS.SoVITS.module.commons"),
        ("GPT_SoVITS/SoVITS/module/modules.py", "GPT_SoVITS.SoVITS.module.modules"),
        ("GPT_SoVITS/SoVITS/module/attentions.py", "GPT_SoVITS.SoVITS.module.attentions"),
        ("GPT_SoVITS/SoVITS/module/mrte_model.py", "GPT_SoVITS.SoVITS.module.mrte_model"),
        ("GPT_SoVITS/SoVITS/module/core_vq.py", "GPT_SoVITS.SoVITS.module.core_vq"),
        ("GPT_SoVITS/SoVITS/module/quantize.py", "GPT_SoVITS.SoVITS.module.quantize"),
    ]:
        import_reference_module(rel, name)
    return import_reference_module("GPT_SoVITS/SoVITS/models.py", "GPT_SoVITS.SoVITS.models")


def _build(ref_models_module, version="v2"):
    torch.manual_seed(0)
    kw = dict(SMALL)
    kw["version"] = version
    ref = ref_models_module.SynthesizerTrn(**kw)
    with torch.no_grad():
        for prm in ref.parameters():
            prm.normal_(0, 0.1)
        for q in ref.quantizer.vq.layers:
            q._codebook.embed.normal_(0, 1.0)
    ref.eval()

    cfg = jsv.SovitsConfig(
        spec_channels=SMALL["spec_channels"],
        inter_channels=SMALL["inter_channels"],
        hidden_channels=SMALL["hidden_channels"],
        filter_channels=SMALL["filter_channels"],
        n_heads=SMALL["n_heads"],
        n_layers=SMALL["n_layers"],
        kernel_size=SMALL["kernel_size"],
        resblock_kernel_sizes=tuple(SMALL["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(map(tuple, SMALL["resblock_dilation_sizes"])),
        upsample_rates=tuple(SMALL["upsample_rates"]),
        upsample_initial_channel=SMALL["upsample_initial_channel"],
        upsample_kernel_sizes=tuple(SMALL["upsample_kernel_sizes"]),
        gin_channels=SMALL["gin_channels"],
        version=version,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jsv.params_from_torch_state_dict(sd, dtype=jnp.float32)
    return ref, cfg, params


@pytest.fixture(scope="module")
def models(ref_models_module):
    return _build(ref_models_module, "v2")


def test_quantizer_roundtrip(models):
    ref, cfg, params = models
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 1024, size=(1, 1, 13))
    with torch.no_grad():
        ref_q = ref.quantizer.decode(torch.tensor(codes)).numpy()
    ours = np.asarray(jsv.quantizer_decode(params, jnp.asarray(codes)))
    np.testing.assert_allclose(ours, ref_q, rtol=1e-6, atol=1e-6)

    x = rng.randn(1, 768, 20).astype(np.float32)
    with torch.no_grad():
        ref_codes = ref.quantizer.encode(torch.tensor(x)).numpy()
    our_codes = np.asarray(jsv.quantizer_encode(params, jnp.asarray(x)))
    np.testing.assert_array_equal(our_codes, ref_codes)


def test_extract_latent_parity(models):
    ref, cfg, params = models
    rng = np.random.RandomState(1)
    ssl = rng.randn(1, 768, 40).astype(np.float32)
    with torch.no_grad():
        ref_codes = ref.extract_latent(torch.tensor(ssl)).numpy()
    ours = np.asarray(jsv.extract_latent(params, jnp.asarray(ssl)))
    np.testing.assert_array_equal(ours, ref_codes)


def test_get_ge_parity(models):
    ref, cfg, params = models
    rng = np.random.RandomState(2)
    refer = rng.randn(1, SMALL["spec_channels"], 37).astype(np.float32)
    with torch.no_grad():
        ref_ge = ref.get_ge(torch.tensor(refer)).numpy()
    ours = np.asarray(jsv.get_ge(params, cfg, jnp.asarray(refer)))
    np.testing.assert_allclose(ours, ref_ge, rtol=1e-4, atol=1e-5)


def _decode_inputs(seed, t25=12, n_text=9):
    rng = np.random.RandomState(seed)
    codes = rng.randint(0, 1024, size=(1, 1, t25))
    text = rng.randint(0, 732, size=(1, n_text))
    refer = rng.randn(1, SMALL["spec_channels"], 25).astype(np.float32)
    return codes, text, refer


def test_decode_full_parity(models):
    """Full decode path with noise_scale=0 (deterministic latent)."""
    ref, cfg, params = models
    codes, text, refer = _decode_inputs(3)
    with torch.no_grad():
        ge = ref.get_ge(torch.tensor(refer))
        audio, attn = ref.decode(torch.tensor(codes), torch.tensor(text), ge,
                                 noise_scale=0.0)
    ref_audio = audio.numpy()
    ref_attn = attn.numpy()

    ge_j = jsv.get_ge(params, cfg, jnp.asarray(refer))
    t50 = codes.shape[-1] * 2
    noise = jnp.zeros((1, cfg.inter_channels, t50), jnp.float32)
    z_p, y_mask, attn_j, _, ge_out = jsv.decode_core(
        params, cfg, jnp.asarray(codes), jnp.asarray(text), ge_j, noise)
    audio_j = jsv.flow_dec(params, cfg, z_p, y_mask, ge_out)

    np.testing.assert_allclose(np.asarray(attn_j[0]), ref_attn, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(audio_j), ref_audio, rtol=1e-3, atol=2e-4)


def test_decode_speed_parity(models):
    ref, cfg, params = models
    codes, text, refer = _decode_inputs(4)
    with torch.no_grad():
        ge = ref.get_ge(torch.tensor(refer))
        audio, _ = ref.decode(torch.tensor(codes), torch.tensor(text), ge,
                              noise_scale=0.0, speed=1.2)
    ge_j = jsv.get_ge(params, cfg, jnp.asarray(refer))
    t_speed = int(codes.shape[-1] * 2 / 1.2) + 1
    noise = jnp.zeros((1, cfg.inter_channels, t_speed), jnp.float32)
    z_p, y_mask, _, _, ge_out = jsv.decode_core(
        params, cfg, jnp.asarray(codes), jnp.asarray(text), ge_j, noise, speed=1.2)
    audio_j = jsv.flow_dec(params, cfg, z_p, y_mask, ge_out)
    np.testing.assert_allclose(np.asarray(audio_j), audio.numpy(), rtol=1e-3, atol=2e-4)


def test_decode_stream_overlap_parity(models):
    """Streaming latent cross-fade (y_overlap) matches the reference's
    stateful enc_p (``models.py:209-215``)."""
    ref, cfg, params = models
    rng = np.random.RandomState(5)
    text = rng.randint(0, 732, size=(1, 9))
    refer = rng.randn(1, SMALL["spec_channels"], 25).astype(np.float32)
    overlap = 3

    full_codes = rng.randint(0, 1024, size=(1, 1, 18))
    chunks = [full_codes[:, :, :10], full_codes]  # cumulative, like infer_stream

    ref.enc_p.y_overlap = None
    ref_audios = []
    valid_start = 0
    with torch.no_grad():
        ge = ref.get_ge(torch.tensor(refer))
        for c in chunks:
            audio, attn = ref.decode(torch.tensor(c), torch.tensor(text), ge,
                                     noise_scale=0.0, stream_mode=True,
                                     valid_start_idx=valid_start, overlap_len=overlap)
            ref_audios.append(audio.numpy())
            valid_start = attn.shape[0] - overlap  # mirrors TTS.py:437-440
    ref.enc_p.y_overlap = None

    ge_j = jsv.get_ge(params, cfg, jnp.asarray(refer))
    y_overlap = None
    valid_start = 0
    for c, ref_audio in zip(chunks, ref_audios):
        t50 = c.shape[-1] * 2 - valid_start
        noise = jnp.zeros((1, cfg.inter_channels, t50), jnp.float32)
        z_p, y_mask, attn_j, y_overlap, ge_out = jsv.decode_core(
            params, cfg, jnp.asarray(c), jnp.asarray(text), ge_j, noise,
            y_overlap=y_overlap, valid_start_idx=valid_start, overlap_len=overlap)
        audio_j = jsv.flow_dec(params, cfg, z_p, y_mask, ge_out)
        np.testing.assert_allclose(np.asarray(audio_j), ref_audio, rtol=1e-3, atol=2e-4)
        valid_start = attn_j.shape[1] - overlap


def test_decode_packed_slice_indices(models):
    """Packed multi-segment decode with block-diagonal MRTE masks
    (``mrte_model.py:24-33``, ``TTS.py:735-764``)."""
    ref, cfg, params = models
    rng = np.random.RandomState(6)
    lens25 = [5, 7]
    phone_lens = [4, 6]
    codes = rng.randint(0, 1024, size=(1, 1, sum(lens25)))
    text = rng.randint(0, 732, size=(1, sum(phone_lens)))
    refer = rng.randn(1, SMALL["spec_channels"], 25).astype(np.float32)

    starts = np.cumsum([0] + phone_lens[:-1])
    ends = np.cumsum(phone_lens)
    pairs = np.stack([starts, ends], 1)
    slice_indices = np.repeat(pairs, np.array(lens25) * 2, axis=0)

    with torch.no_grad():
        ge = ref.get_ge(torch.tensor(refer))
        ge_packed = ge.expand(-1, -1, sum(lens25))
        audio, attn = ref.decode(torch.tensor(codes), torch.tensor(text), ge_packed,
                                 noise_scale=0.0, cuda_graph=False,
                                 slice_indices=torch.tensor(slice_indices))

    ge_j = jnp.broadcast_to(jsv.get_ge(params, cfg, jnp.asarray(refer)),
                            (1, SMALL["gin_channels"], sum(lens25)))
    t50 = codes.shape[-1] * 2
    noise = jnp.zeros((1, cfg.inter_channels, t50), jnp.float32)
    z_p, y_mask, attn_j, _, ge_out = jsv.decode_core(
        params, cfg, jnp.asarray(codes), jnp.asarray(text), ge_j, noise,
        slice_indices=jnp.asarray(slice_indices))
    audio_j = jsv.flow_dec(params, cfg, z_p, y_mask, ge_out)
    np.testing.assert_allclose(np.asarray(attn_j[0]), attn.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(audio_j), audio.numpy(), rtol=1e-3, atol=2e-4)


def test_v2pro_ge_path(ref_models_module):
    ref, cfg, params = _build(ref_models_module, "v2ProPlus")
    rng = np.random.RandomState(7)
    refer = rng.randn(1, SMALL["spec_channels"], 21).astype(np.float32)
    sv = rng.randn(1, 20480).astype(np.float32)
    with torch.no_grad():
        ref_ge = ref.get_ge(torch.tensor(refer), torch.tensor(sv)).numpy()
    ours = np.asarray(jsv.get_ge(params, cfg, jnp.asarray(refer), jnp.asarray(sv)))
    np.testing.assert_allclose(ours, ref_ge, rtol=1e-4, atol=1e-4)

    codes, text, _ = _decode_inputs(8)
    with torch.no_grad():
        audio, _ = ref.decode(torch.tensor(codes), torch.tensor(text),
                              torch.tensor(ref_ge), noise_scale=0.0)
    noise = jnp.zeros((1, cfg.inter_channels, codes.shape[-1] * 2), jnp.float32)
    z_p, y_mask, _, _, ge_out = jsv.decode_core(
        params, cfg, jnp.asarray(codes), jnp.asarray(text), jnp.asarray(ref_ge), noise)
    audio_j = jsv.flow_dec(params, cfg, z_p, y_mask, ge_out)
    np.testing.assert_allclose(np.asarray(audio_j), audio.numpy(), rtol=1e-3, atol=2e-4)


def test_init_params_keys_match_reference(ref_models_module):
    """Random-init params must carry exactly the reference checkpoint keys
    (inference-relevant subset) with matching shapes."""
    ref, cfg, params = _build(ref_models_module, "v2")
    import jax

    import jax.numpy as jnp
    from gsv_tts_tpu.models.sovits import SovitsConfig, init_params

    small_cfg = jsv.SovitsConfig(
        spec_channels=SMALL["spec_channels"],
        inter_channels=SMALL["inter_channels"],
        hidden_channels=SMALL["hidden_channels"],
        filter_channels=SMALL["filter_channels"],
        n_heads=SMALL["n_heads"],
        n_layers=SMALL["n_layers"],
        kernel_size=SMALL["kernel_size"],
        resblock_kernel_sizes=tuple(SMALL["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(map(tuple, SMALL["resblock_dilation_sizes"])),
        upsample_rates=tuple(SMALL["upsample_rates"]),
        upsample_initial_channel=SMALL["upsample_initial_channel"],
        upsample_kernel_sizes=tuple(SMALL["upsample_kernel_sizes"]),
        gin_channels=SMALL["gin_channels"],
        version="v2",
    )
    ours = init_params(jax.random.PRNGKey(0), small_cfg)
    loaded = set(params.keys())
    generated = set(ours.keys())
    # every generated key must exist in the real checkpoint with same shape
    missing = generated - loaded
    assert not missing, sorted(missing)[:10]
    for k in generated:
        assert tuple(ours[k].shape) == tuple(params[k].shape), (
            k, ours[k].shape, params[k].shape)
    # and everything the inference graph touches must be generated
    inference_needed = {k for k in loaded
                        if not k.startswith(("enc_q", "quantizer.vq.layers.0._codebook.cluster_size",
                                             "quantizer.vq.layers.0._codebook.embed_avg",
                                             "quantizer.vq.layers.0._codebook.inited"))}
    assert inference_needed - generated == set(), sorted(inference_needed - generated)[:10]
