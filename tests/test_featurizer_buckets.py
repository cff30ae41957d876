"""Shape-bucketed featurizer programs (``Config.featurizer_buckets``).

Serving sees arbitrary text lengths and user-uploaded reference audio; the
exact-shape jit programs in models/roberta.py and models/hubert.py would pay
one full XLA trace+compile per novel shape (the reference's eager torch
featurizers, ``cnhubert.py:24-35`` / ``cnroberta.py``, have no such cliff).
The bucketed path pads to a bounded shape ladder with masked attention /
masked group-norm stats; these tests pin (a) numerical equivalence of the
valid region to the exact-shape program, and (b) the compile-count bound.
"""
import json

import numpy as np
import pytest

import jax.numpy as jnp

from gsv_tts_tpu.models import hubert as jhub
from gsv_tts_tpu.models import roberta as jbert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_hubert(seed=0):
    from transformers import HubertConfig, HubertModel

    cfg_t = HubertConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=[32, 32, 32], conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, feat_extract_norm="group",
        do_stable_layer_norm=False, conv_bias=False,
    )
    torch.manual_seed(seed)
    ref = HubertModel(cfg_t).eval()
    cfg = jhub.HubertConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=(32, 32, 32), conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    return cfg, jhub.params_from_torch_state_dict(sd), ref


def test_conv_out_length_matches_conv_shapes():
    cfg, params, _ = _tiny_hubert()
    for T in (320, 1000, 3217):
        wav = np.zeros((1, T), np.float32)
        frames = jhub.feature_extractor(params, cfg, jnp.asarray(wav)).shape[2]
        assert jhub.conv_out_length(T, cfg) == frames


def test_hubert_bucketed_matches_exact():
    """Valid frames of the padded+masked program equal the exact-shape run
    (masked group-norm stats, zeroed pad features ahead of the positional
    conv, -1e9 pad keys)."""
    cfg, params, _ = _tiny_hubert()
    rng = np.random.RandomState(1)
    T = 3217  # deliberately not a multiple of anything
    wav = rng.randn(1, T).astype(np.float32)

    exact = np.asarray(jhub.hubert_forward(params, cfg, jnp.asarray(wav)))

    pad_T = 4096
    wav_p = np.pad(wav, ((0, 0), (0, pad_T - T)))
    n_frames = jhub.conv_out_length(T, cfg)
    valid_l0 = jhub.conv_out_length(T, cfg, n_layers=1)
    masked = np.asarray(jhub.hubert_forward(
        params, cfg, jnp.asarray(wav_p),
        n_frames=jnp.full((1,), n_frames, jnp.int32),
        valid_l0=jnp.full((1,), valid_l0, jnp.int32)))

    assert exact.shape[1] == n_frames
    np.testing.assert_allclose(masked[:, :n_frames], exact,
                               rtol=1e-4, atol=1e-5)


def test_cnhubert_facade_buckets(tmp_path):
    """CNHubert facade: bucketed output == exact output (trimmed), and two
    lengths inside one 0.5 s bucket share a single compiled program."""
    from safetensors.numpy import save_file

    from gsv_tts_tpu.config import Config

    cfg, params, ref = _tiny_hubert(seed=2)
    d = tmp_path / "hubert"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "hidden_size": 64, "num_hidden_layers": 2, "num_attention_heads": 4,
        "intermediate_size": 128, "conv_dim": [32, 32, 32],
        "conv_kernel": [10, 3, 2], "conv_stride": [5, 2, 2],
        "num_conv_pos_embeddings": 16, "num_conv_pos_embedding_groups": 4,
        "feat_extract_norm": "group", "do_stable_layer_norm": False,
        "conv_bias": False}))
    save_file({k: v.numpy() for k, v in ref.state_dict().items()},
              str(d / "model.safetensors"))

    tcfg = Config(dtype="float32", platform="cpu")
    exact_model = jhub.CNHubert(str(d), tcfg)
    tcfg_b = Config(dtype="float32", platform="cpu")
    tcfg_b.featurizer_buckets = True
    bucket_model = jhub.CNHubert(str(d), tcfg_b)
    assert not exact_model.buckets and bucket_model.buckets

    rng = np.random.RandomState(3)
    wav_a = rng.randn(8500).astype(np.float32)
    wav_b = rng.randn(8999).astype(np.float32)

    for wav in (wav_a, wav_b):
        exact = np.asarray(exact_model(wav))
        bucketed = np.asarray(bucket_model(wav))
        assert bucketed.shape == exact.shape
        np.testing.assert_allclose(bucketed, exact, rtol=1e-4, atol=1e-5)

    # both lengths land in the 16000-sample bucket -> ONE compiled program
    size = getattr(bucket_model._fwd_masked, "_cache_size", None)
    if size is not None:
        assert size() == 1


def _tiny_bert_dir(tmp_path):
    from safetensors.numpy import save_file
    from transformers import BertConfig, BertModel

    cfg_t = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=128)
    torch.manual_seed(7)
    ref = BertModel(cfg_t).eval()
    d = tmp_path / "bert"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "vocab_size": 64, "hidden_size": 32, "num_hidden_layers": 4,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 128}))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + list("你好吗天气很不错的")
    (d / "vocab.txt").write_text("\n".join(vocab) + "\n")
    save_file({k: v.numpy() for k, v in ref.state_dict().items()},
              str(d / "model.safetensors"))
    return d


def _w2p(text):
    return {"word": list(text), "ph": [2] * len(text)}


def test_cnroberta_buckets_match_exact(tmp_path):
    """Bucketed BERT features equal the exact-shape run for every valid row
    (pad columns are -1e9-masked keys; pad rows are independent)."""
    from gsv_tts_tpu.config import Config

    d = _tiny_bert_dir(tmp_path)
    tcfg = Config(dtype="float32", platform="cpu")
    exact_model = jbert.CNRoberta(str(d), tcfg, quant=False)
    tcfg_b = Config(dtype="float32", platform="cpu")
    tcfg_b.featurizer_buckets = True
    bucket_model = jbert.CNRoberta(str(d), tcfg_b, quant=False)

    batches = [
        [_w2p("你好吗")],
        [_w2p("今天天气很不错"[1:]), _w2p("你好"), _w2p("不错的")],
        [_w2p("你好吗" * 9)],
    ]
    for w2p_list in batches:
        exact = exact_model(w2p_list)
        bucketed = bucket_model(w2p_list)
        assert len(exact) == len(bucketed) == len(w2p_list)
        for e, b in zip(exact, bucketed):
            assert e.shape == b.shape
            np.testing.assert_allclose(b, e, rtol=1e-4, atol=1e-5)


def test_cnroberta_bucket_compile_bound(tmp_path):
    """Many novel (rows, maxlen) shapes collapse onto a handful of bucketed
    programs — the serving compile-storm guard."""
    from gsv_tts_tpu.config import Config

    d = _tiny_bert_dir(tmp_path)
    tcfg = Config(dtype="float32", platform="cpu")
    tcfg.featurizer_buckets = True
    model = jbert.CNRoberta(str(d), tcfg, quant=False)

    texts = ["你好", "你好吗", "今天天气", "天气很不错", "你好吗今天",
             "不错的天气很不错", "你好吗" * 4, "天气" * 7]
    for i, t in enumerate(texts):
        model([_w2p(t)] + ([_w2p("你好")] if i % 2 else []))

    size = getattr(model._fwd, "_cache_size", None)
    if size is not None:
        # 8 distinct maxlens x 2 row counts -> at most (1,32)/(2,32)/(1,64)/
        # (2,64) style buckets; far fewer than the 16 exact-shape programs
        assert size() <= 4


def test_extract_latent_pad_neutral():
    """Zero-padding the SSL frame axis and trimming the codes reproduces the
    exact-shape RVQ codes (per-frame nearest-codebook lookup over a no-pad
    strided conv) — the tts._get_prompt bucketing contract."""
    from gsv_tts_tpu.models import sovits as jsv

    rng = np.random.RandomState(5)
    D, k = 32, 2
    p = {
        "ssl_proj.weight": jnp.asarray(rng.randn(D, D, k).astype(np.float32) * 0.2),
        "ssl_proj.bias": jnp.asarray(rng.randn(D).astype(np.float32) * 0.1),
        "quantizer.vq.layers.0._codebook.embed":
            jnp.asarray(rng.randn(64, D).astype(np.float32)),
    }
    F = 41
    ssl = rng.randn(1, D, F).astype(np.float32)
    exact = np.asarray(jsv.extract_latent(p, jnp.asarray(ssl)))
    n_codes = (F - k) // 2 + 1
    assert exact.shape[-1] == n_codes
    padded = np.asarray(jsv.extract_latent(
        p, jnp.asarray(np.pad(ssl, ((0, 0), (0, 0), (0, 64 - F))))))
    np.testing.assert_array_equal(padded[..., :n_codes], exact)
