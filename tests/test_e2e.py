"""End-to-end engine tests: tiny random checkpoints through the full
``TTS`` facade (infer / infer_stream / infer_batched / infer_vc /
verify_speaker / caches / subtitles)."""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from gsv_tts_tpu.utils.audio_io import save_wav
from conftest import import_reference_module

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY_GPT = {
    "model": {
        "hidden_dim": 64, "embedding_dim": 64, "head": 4, "n_layer": 2,
        "vocab_size": 1025, "phoneme_vocab_size": 732, "dropout": 0.0, "EOS": 1024,
    }
}

HPS = {
    "data": {"filter_length": 1408, "hop_length": 320, "win_length": 1408,
             "sampling_rate": 32000, "n_speakers": 0},
    "train": {"segment_size": 1280},
    "model": {
        "inter_channels": 192, "hidden_channels": 192, "filter_channels": 256,
        "n_heads": 2, "n_layers": 2, "kernel_size": 3, "p_dropout": 0.0,
        "resblock": "1", "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3, 5]],
        "upsample_rates": [8, 5, 4, 4], "upsample_initial_channel": 64,
        "upsample_kernel_sizes": [16, 11, 8, 8], "gin_channels": 512,
        "version": "v2",
    },
}


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Create tiny random checkpoints + reference audio files."""
    root = tmp_path_factory.mktemp("models")

    # --- GPT checkpoint (.ckpt, training-format keys) ---
    import_reference_module("GPT_SoVITS/GPT/embedding.py", "GPT_SoVITS.GPT.embedding")
    import_reference_module("GPT_SoVITS/GPT/utils.py", "GPT_SoVITS.GPT.utils")
    gmod = import_reference_module("GPT_SoVITS/GPT/t2s_model.py", "GPT_SoVITS.GPT.t2s_model")
    torch.manual_seed(0)
    gref = gmod.Text2SemanticDecoder(TINY_GPT)
    from gsv_tts_tpu import loader as jloader

    inv = {new: old for old, new in jloader.GPT_KEY_MAP}
    weight = {}
    for k, v in gref.state_dict().items():
        if k.startswith("t2s_transformer.blocks."):
            parts = k.split(".")
            weight[f"model.h.layers.{parts[2]}." + inv[".".join(parts[3:])]] = v
        else:
            weight["model." + k] = v
    gpt_path = root / "tiny_s1.ckpt"
    torch.save({"config": TINY_GPT, "weight": weight}, str(gpt_path))

    # --- SoVITS checkpoint (.pth) ---
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
    smod = import_reference_module("GPT_SoVITS/SoVITS/models.py", "GPT_SoVITS.SoVITS.models")
    torch.manual_seed(1)
    kw = dict(HPS["model"])
    kw.pop("version")
    sref = smod.SynthesizerTrn(
        HPS["data"]["filter_length"] // 2 + 1,
        HPS["train"]["segment_size"] // HPS["data"]["hop_length"],
        n_speakers=0, **kw)
    with torch.no_grad():
        for prm in sref.parameters():
            prm.normal_(0, 0.05)
        # keep the random vocoder's output comfortably above the RMS trim
        # thresholds (0.01/0.02) so head/tail trimming stays meaningful
        sref.dec.conv_post.weight.mul_(30.0)
        for q in sref.quantizer.vq.layers:
            q._codebook.embed.normal_(0, 1.0)
            # mark the codebook initialized so the reference's quantizer
            # forward (extract_latent) won't k-means re-init it
            q._codebook.inited.fill_(1)
    sovits_path = root / "tiny_s2.pth"
    torch.save({"config": HPS, "weight": sref.state_dict()}, str(sovits_path))

    # --- tiny HuBERT (stride product 320 → 50 Hz at 16 kHz) ---
    from transformers import HubertConfig, HubertModel

    hcfg = HubertConfig(
        hidden_size=768, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=128, conv_dim=[32, 32, 32, 32],
        conv_kernel=[10, 8, 4, 4], conv_stride=[5, 4, 4, 4],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        feat_extract_norm="group", do_stable_layer_norm=False, conv_bias=False)
    torch.manual_seed(2)
    href = HubertModel(hcfg)
    hdir = root / "chinese-hubert-base"
    hdir.mkdir()
    (hdir / "config.json").write_text(hcfg.to_json_string())
    (hdir / "preprocessor_config.json").write_text(json.dumps({
        "feature_extractor_type": "Wav2Vec2FeatureExtractor",
        "feature_size": 1, "sampling_rate": 16000, "padding_side": "right",
        "padding_value": 0.0, "do_normalize": True, "return_attention_mask": False,
    }))
    from safetensors.numpy import save_file

    save_file({k: v.numpy() for k, v in href.state_dict().items()
               if "num_batches_tracked" not in k}, str(hdir / "model.safetensors"))

    # --- SV checkpoint (full ERes2NetV2 topology, random weights) ---
    import_reference_module("GPT_SoVITS/SV/pooling_layers.py", "GPT_SoVITS.SV.pooling_layers")
    import_reference_module("GPT_SoVITS/SV/fusion.py", "GPT_SoVITS.SV.fusion")
    svmod = import_reference_module("GPT_SoVITS/SV/ERes2NetV2.py", "GPT_SoVITS.SV.ERes2NetV2")
    torch.manual_seed(4)
    sv_net = svmod.ERes2NetV2(baseWidth=24, scale=4, expansion=4)
    with torch.no_grad():
        for prm in sv_net.parameters():
            prm.normal_(0, 0.02)
        for name, buf in sv_net.named_buffers():
            if name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)
    (root / "sv").mkdir()
    torch.save(sv_net.state_dict(), str(root / "sv" / "pretrained_eres2netv2w24s4ep4.ckpt"))

    # --- audio files ---
    rng = np.random.RandomState(3)
    sr = 32000

    def noise_wav(path, seconds, freq):
        t = np.arange(int(sr * seconds)) / sr
        wav = (0.3 * np.sin(2 * np.pi * freq * t)
               + 0.05 * rng.randn(len(t))).astype(np.float32)
        save_wav(str(path), wav, sr)
        return path

    spk_wav = noise_wav(root / "spk.wav", 0.7, 220)
    prompt_wav = noise_wav(root / "prompt.wav", 0.6, 330)
    return dict(root=root, gpt=str(gpt_path), sovits=str(sovits_path),
                spk=str(spk_wav), prompt=str(prompt_wav))


@pytest.fixture(scope="module")
def engine(assets):
    from gsv_tts_tpu import TTS

    tts = TTS(gpt_cache=[(1, 96), (1, 128), (2, 128)], sovits_cache=[50, 55],
              models_dir=str(assets["root"]), dtype="float32")
    tts.load_gpt_model(assets["gpt"])
    tts.load_sovits_model(assets["sovits"])
    import jax

    tts._rng = jax.random.PRNGKey(42)
    return tts


def test_infer_end_to_end(assets, engine):
    clip = engine.infer(assets["spk"], assets["prompt"], "hello there.",
                        "this is a test.", return_subtitles=True)
    assert clip.samplerate == 32000
    assert clip.audio_data.dtype == np.float32
    assert len(clip.audio_data) > 0.2 * 32000  # at least the trailing pad
    assert np.all(np.abs(clip.audio_data) <= 1.0 + 1e-6)
    assert clip.audio_len_s == pytest.approx(len(clip.audio_data) / 32000)
    if clip.subtitles:
        starts = [s["start_s"] for s in clip.subtitles]
        assert starts == sorted(starts)
        assert all("orig_idx_start" in s for s in clip.subtitles)


def test_infer_stream_chunks(assets, engine):
    chunks = list(engine.infer_stream(
        assets["spk"], assets["prompt"], "hello there.",
        "this is a longer test sentence, with two clauses to stream.",
        stream_chunk=10, return_subtitles=True, debug=False))
    assert len(chunks) >= 1
    total = sum(len(c.audio_data) for c in chunks)
    assert total > 0
    for c in chunks:
        assert c.audio_data.dtype == np.float32


def test_infer_batched(assets, engine):
    clips = engine.infer_batched(
        assets["spk"], assets["prompt"], "hello there.",
        ["first sentence to speak.", "the second one is a bit longer than that."],
    )
    assert len(clips) == 2
    for clip in clips:
        assert len(clip.audio_data) > 0
        assert clip.audio_data.dtype == np.float32


def test_infer_batched_stream(assets, engine):
    """Streaming continuous batching: every request yields >=1 clip and
    exactly one done marker, clips interleave while preserving each
    request's segment order (cumulative duration strictly increases), and
    audio is finite float32."""
    texts = ["first sentence to speak. then a second segment here.",
             "the second request is one uncut line."]
    events = list(engine.infer_batched_stream(
        assets["spk"], assets["prompt"], "hello there.", texts,
        cut_minlen=5, stream_chunk=10))
    assert events, "no stream events"
    seen_done = {}
    last_len = {}
    for oi, clip, done in events:
        assert oi in (0, 1)
        assert not seen_done.get(oi), "clip after request done"
        a = np.asarray(clip.audio_data)
        assert a.dtype == np.float32 and np.isfinite(a).all()
        assert clip.audio_len_s >= last_len.get(oi, 0.0)
        last_len[oi] = clip.audio_len_s
        if done:
            seen_done[oi] = True
    assert seen_done == {0: True, 1: True}
    assert all(last_len[oi] > 0 for oi in (0, 1))
    # the multi-segment request must emit at least two clips (per-segment
    # finalization at minimum)
    assert sum(1 for oi, _, _ in events if oi == 0) >= 2


def test_infer_vc(assets, engine):
    clip = engine.infer_vc(assets["spk"], assets["prompt"], "hello there.")
    assert len(clip.audio_data) > 0


def test_caches_and_model_lists(assets, engine):
    # populate the audio caches explicitly: under pytest-xdist this test can
    # land on a worker where no earlier infer() primed them
    engine.cache_prompt_audio(assets["prompt"], "hello there.")
    engine.cache_spk_audio(assets["spk"])
    assert assets["gpt"] in engine.get_gpt_list()
    assert assets["sovits"] in engine.get_sovits_list()
    assert assets["prompt"] in engine.get_prompt_audio_list()
    assert assets["spk"] in engine.get_spk_audio_list()
    engine.del_prompt_audio(assets["prompt"])
    assert assets["prompt"] not in engine.get_prompt_audio_list()
    # re-cache for subsequent runs
    engine.cache_prompt_audio(assets["prompt"], "hello there.")


def test_clip_save_and_play(assets, engine, tmp_path):
    clip = engine.infer(assets["spk"], assets["prompt"], "hello there.", "save me.")
    out = tmp_path / "out.wav"
    clip.save(str(out), is_save_subtitles=True)
    assert out.exists() and (tmp_path / "out.json").exists()
    clip.play()  # no audio device in CI: must not raise
    engine.audio_queue.wait()


def test_to_safetensors_roundtrip(assets, engine, tmp_path):
    out = tmp_path / "st_gpt"
    engine.to_safetensors(assets["gpt"], str(out))
    assert (out / "model.safetensors").exists()
    assert (out / "config.json").exists()


def test_multi_speaker_fusion(assets, engine):
    clip = engine.infer({assets["spk"]: 0.7, assets["prompt"]: 0.3},
                        assets["prompt"], "hello there.", "fusion test.")
    assert len(clip.audio_data) > 0


def test_verify_speaker(assets, engine):
    sim_self = engine.verify_speaker(assets["spk"], assets["spk"])
    sim_cross = engine.verify_speaker(assets["spk"], assets["prompt"])
    assert sim_self == pytest.approx(1.0, abs=1e-3)
    assert -1.0 <= sim_cross <= 1.0


def test_chinese_bert_path(assets, tmp_path_factory):
    """End-to-end Chinese synthesis with the BERT featurizer active."""
    from transformers import BertConfig, BertModel

    root = assets["root"]
    bdir = root / "chinese-roberta-wwm-ext-large"
    if not bdir.exists():
        bdir.mkdir()
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + list(
            "你好中国人天气真不错今点分。，！？.")
        (bdir / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
        bcfg = BertConfig(vocab_size=len(vocab), hidden_size=1024,
                          num_hidden_layers=3, num_attention_heads=4,
                          intermediate_size=64, max_position_embeddings=64)
        torch.manual_seed(7)
        bref = BertModel(bcfg).eval()
        (bdir / "config.json").write_text(bcfg.to_json_string())
        from safetensors.numpy import save_file

        save_file({k: v.numpy() for k, v in bref.state_dict().items()},
                  str(bdir / "model.safetensors"))

    from gsv_tts_tpu import TTS
    from gsv_tts_tpu.config import global_config
    from gsv_tts_tpu.frontend.g2p.chinese import ChineseG2P
    from test_frontend import ZH_LEXICON

    old_g2p = global_config.chinese_g2p
    global_config.chinese_g2p = ChineseG2P(lexicon=ZH_LEXICON)
    try:
        tts = TTS(gpt_cache=[(1, 96), (1, 128)], sovits_cache=[50, 55],
                  models_dir=str(root), dtype="float32", use_bert=True)
        assert tts.tts_config.cnroberta is not None
        tts.load_gpt_model(assets["gpt"])
        tts.load_sovits_model(assets["sovits"])
        clip = tts.infer(assets["spk"], assets["prompt"], "hello there.",
                         "你好中国。", return_subtitles=True)
        assert len(clip.audio_data) > 0
    finally:
        global_config.chinese_g2p = old_g2p


def test_whitespace_text_does_not_crash(assets, engine):
    """Reference TTS.py has no target-text validation — whitespace-only text
    must synthesize (the frontend appends '.') rather than raise."""
    clip = engine.infer(assets["spk"], assets["prompt"], "hello there.", "   ")
    assert clip.audio_data.dtype == np.float32


def test_text_without_trailing_pause(assets, engine):
    """Reference appends '.' when the text lacks trailing punctuation."""
    clip = engine.infer(assets["spk"], assets["prompt"], "hello there.",
                        "no trailing punctuation here")
    assert len(clip.audio_data) > 0


def test_empty_prompt_text_raises(assets, engine):
    with pytest.raises(ValueError):
        engine.cache_prompt_audio(assets["prompt"] + "x", "   ")


def test_realtime_module_gates_cleanly():
    """serving.realtime imports fine without aiortc; use raises clearly."""
    import importlib

    mod = importlib.import_module("gsv_tts_tpu.serving.realtime")
    try:
        import aiortc  # noqa: F401
        pytest.skip("aiortc installed")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="aiortc"):
        mod._require_aiortc()


def test_long_text_multisegment_stream(assets, engine):
    text = ("one sentence here. another one follows, with a clause. "
            "and a third for good measure. plus the fourth.")
    chunks = list(engine.infer_stream(assets["spk"], assets["prompt"],
                                      "hello there.", text, cut_minlen=5,
                                      debug=False))
    assert len(chunks) >= 2
    assert all(c.audio_data.dtype == np.float32 for c in chunks)


def test_concurrent_async_inference_serializes(assets, engine):
    """The coarse _infer_lock (reference TTS.py:145) must make concurrent
    async calls safe: all complete, audio is valid, and the engine state
    stays consistent."""
    import asyncio
    from concurrent.futures import ThreadPoolExecutor

    async def go():
        ex = ThreadPoolExecutor(max_workers=4)
        clips = await asyncio.gather(*[
            engine.infer_async(assets["spk"], assets["prompt"],
                               "hello there.", f"concurrent test {i}.",
                               executor=ex)
            for i in range(4)
        ])
        return clips

    clips = asyncio.run(go())
    assert len(clips) == 4
    for c in clips:
        assert c.audio_data.dtype == np.float32 and len(c.audio_data) > 0


def test_packed_sovits_compile_growth_bounded(assets, engine):
    """The geometric frame-bucket ladder must keep flow/vocoder jit
    specializations bounded on heterogeneous batched workloads
    (round-1 finding: per-64-frame rounding compiled one program per
    length quantum)."""
    rng = np.random.RandomState(0)
    words = ["one", "two", "three", "four", "alpha", "beta", "gamma",
             "delta", "long", "short", "mixed", "case"]
    texts = [" ".join(rng.choice(words, size=rng.randint(2, 14))) + "."
             for _ in range(20)]

    def flow_programs():
        return sum(fn._cache_size()
                   for key, fn in engine._decode_jit_cache.items()
                   if key[1] == "flow_dec")

    before = flow_programs()  # the shared engine may have compiled already
    engine.infer_batched(assets["spk"], assets["prompt"], "hello there.",
                         texts)
    grown = flow_programs() - before
    assert grown <= 4, f"{grown} new flow/vocoder specializations"


def test_featurize_and_train_step(assets, engine, tmp_path):
    """Training data pipeline end-to-end on the tiny facade: manifest →
    featurize (frontend + HuBERT + RVQ) → shard roundtrip → padded batch →
    one CE train step → loss decreases over a few steps."""
    import jax
    import json as _json

    from gsv_tts_tpu import train_data
    from gsv_tts_tpu.parallel import train as ptrain

    manifest = tmp_path / "train.jsonl"
    manifest.write_text(
        _json.dumps({"wav": assets["spk"], "text": "hello there, friend."}) + "\n" +
        _json.dumps({"wav": assets["prompt"], "text": "a second sample.",
                     "lang": "en"}) + "\n")
    items = train_data.read_manifest(manifest)
    samples = train_data.featurize(engine, items)
    assert len(samples) == 2
    gpt = engine.gpt_models[assets["gpt"]]
    for x, y, bert in samples:
        assert x.dtype == np.int32 and len(x) > 0
        assert y.dtype == np.int32 and len(y) > 0
        assert (y >= 0).all() and (y < gpt.cfg.vocab_size - 1).all()
        assert bert.shape == (len(x), 1024)

    # shard roundtrip preserves the featurized samples
    shard = tmp_path / "shard.npz"
    train_data.save_samples(shard, samples)
    back = train_data.load_samples(shard)
    np.testing.assert_array_equal(back[0][0], samples[0][0])
    np.testing.assert_array_equal(back[1][1], samples[1][1])

    optimizer, _ = ptrain.make_optimizer(peak_lr=5e-3, warmup_steps=1,
                                         decay_steps=20)
    step_fn = jax.jit(ptrain.make_train_step(gpt.cfg, optimizer,
                                             dtype=jnp.float32))
    params = gpt.params
    opt_state = optimizer.init(params)
    losses = []
    for step in range(4):
        for batch in train_data.batches(gpt.cfg, samples, batch_size=2,
                                        seed=step):
            params, opt_state, loss = step_fn(params, opt_state, batch)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_sovits_finetune_roundtrip(assets, engine, tmp_path):
    """Stage-2 fine-tune end-to-end on the tiny facade: featurize, one GAN
    train step (fresh enc_q + discriminators), export with
    save_trained_sovits, reload through the facade, synthesize."""
    import jax
    import optax

    from gsv_tts_tpu import train_data
    from gsv_tts_tpu.loader import save_trained_sovits
    from gsv_tts_tpu.models import sovits_train as svt

    items = [(assets["spk"], "hello there, friend.", "en"),
             (assets["prompt"], "a second sample.", "en")]
    samples = train_data.featurize_sovits(engine, items)
    sovits = engine.sovits_models[assets["sovits"]]
    cfg, hps = sovits.cfg, sovits.hps
    for ssl, spec, wav, text in samples:
        assert ssl.shape[0] == 768 and ssl.shape[1] == spec.shape[1]
        assert len(wav) == spec.shape[1] * int(hps.data.hop_length)
        assert len(text) > 0

    # the tiny test HPS has hop (320) != vocoder samples-per-frame (640) —
    # fine for inference (spec only feeds ref_enc) but training alignment
    # needs frame == spf; decimate to the vocoder frame rate
    spf = int(np.prod(cfg.upsample_rates))
    r = spf // int(hps.data.hop_length)
    samples = [(s[:, ::r], sp[:, ::r], w, t) for s, sp, w, t in samples]

    params = dict(sovits.params)
    assert "enc_q.pre.weight" not in params  # Lite checkpoints strip enc_q
    params.update(svt.init_enc_q_params(jax.random.PRNGKey(0), cfg))
    d_params = svt.init_discriminator_params(jax.random.PRNGKey(1))

    g_opt = optax.adam(1e-4)
    d_opt = optax.adam(1e-4)
    step_fn = jax.jit(svt.make_sovits_train_step(
        cfg, g_opt, d_opt, n_fft=256, hop_length=spf, win_length=256,
        sr=int(hps.data.sampling_rate), segment_frames=4, n_mels=32))
    batch = svt.pad_sovits_batch(cfg, samples, spf, pad_multiple=8)
    params, d_params, gs, ds, metrics = step_fn(
        params, d_params, g_opt.init(params), d_opt.init(d_params),
        batch, jax.random.PRNGKey(2))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"

    out = tmp_path / "s2_ft"
    save_trained_sovits(jax.device_get(params), hps, str(out))
    engine.load_sovits_model(str(out))
    try:
        clip = engine.infer(assets["spk"], assets["prompt"], "hello there.",
                            "fine tuned model check.",
                            sovits_model=str(out))
        assert len(clip.audio_data) > 1000
    finally:
        engine.unload_sovits_model(str(out))


def test_warmup_compiles_serving_paths(engine):
    """``TTS.warmup()`` (server ``--warmup``): one synthetic-reference
    synthesis precompiles the serving programs — with ``stream=True`` the
    shared-wave + streaming-vocoder path too — and flips the /health
    ``warmed`` flag.  No real voice assets are required."""
    assert engine._warmed is False or engine._warmed is True  # attr exists
    stats = engine.warmup(stream=True)
    assert engine._warmed is True
    assert stats["infer_s"] > 0
    assert stats["stream_s"] > 0
    assert stats["total_s"] >= stats["infer_s"]


def test_warmup_with_registry_voice(assets, engine):
    """A voices-registry bundle warms with production assets instead of
    the synthetic sine references."""
    stats = engine.warmup(voice={"speaker_audio": assets["spk"],
                                 "prompt_audio": assets["prompt"],
                                 "prompt_text": "hello there."})
    assert stats["total_s"] > 0 and "stream_s" not in stats


def test_repeat_infer_is_compile_free(assets, engine):
    """Regression (r5 soak finding): a repeated identical request must not
    compile ANYTHING new.  The vocoder attn/audio slices ran eagerly on
    device arrays with per-request lengths, compiling 3-4 fresh tiny
    executables per request — unbounded jit-cache (and LLVM mmap) growth
    that killed a 20-min CPU serving soak at vm.max_map_count.
    Deterministic sampling (top_k=1, noise_scale=0) pins the chain so
    every shape repeats."""
    import jax

    kwargs = dict(top_k=1, top_p=1.0, temperature=1.0,
                  repetition_penalty=1.35, noise_scale=0.0)
    engine.infer(assets["spk"], assets["prompt"], "hello there.",
                 "compile stability check.", **kwargs)

    compiles = []

    def listener(event, duration, **kw):
        if "backend_compile" in event:
            compiles.append(event)

    import jax.monitoring

    jax.monitoring.register_event_duration_secs_listener(listener)
    try:
        clip = engine.infer(assets["spk"], assets["prompt"], "hello there.",
                            "compile stability check.", **kwargs)
    finally:
        jax.monitoring.unregister_event_duration_listener(listener)
    assert len(clip.audio_data) > 0
    assert not compiles, f"repeat request compiled {len(compiles)} programs"
