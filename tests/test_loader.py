"""Checkpoint loader roundtrip tests: legacy torch formats → jax params."""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from gsv_tts_tpu.config import Config
from gsv_tts_tpu import loader
from conftest import import_reference_module

torch = pytest.importorskip("torch")

TINY_GPT = {
    "model": {
        "hidden_dim": 64,
        "embedding_dim": 64,
        "head": 4,
        "n_layer": 2,
        "vocab_size": 101,
        "phoneme_vocab_size": 50,
        "dropout": 0.0,
        "EOS": 100,
    }
}

HPS = {
    "data": {"filter_length": 1408, "hop_length": 4, "win_length": 16,
             "sampling_rate": 32000, "n_speakers": 0},
    "train": {"segment_size": 16},
    "model": {
        "inter_channels": 192, "hidden_channels": 192, "filter_channels": 256,
        "n_heads": 2, "n_layers": 2, "kernel_size": 3, "p_dropout": 0.0,
        "resblock": "1", "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3, 5]],
        "upsample_rates": [2, 2], "upsample_initial_channel": 32,
        "upsample_kernel_sizes": [4, 4], "gin_channels": 512,
    },
}


def _cfg():
    c = Config(dtype="float32")
    c.gpt_cache = [(1, 96), (1, 128)]
    c.sovits_cache = [50, 55]
    return c


def _make_gpt_ckpt(tmp_path):
    import_reference_module("GPT_SoVITS/GPT/embedding.py", "GPT_SoVITS.GPT.embedding")
    import_reference_module("GPT_SoVITS/GPT/utils.py", "GPT_SoVITS.GPT.utils")
    mod = import_reference_module("GPT_SoVITS/GPT/t2s_model.py", "GPT_SoVITS.GPT.t2s_model")
    torch.manual_seed(0)
    ref = mod.Text2SemanticDecoder(TINY_GPT)
    sd = ref.state_dict()
    # inverse of the Loader remap: runtime names → training-checkpoint names
    inv = {new: old for old, new in loader.GPT_KEY_MAP}
    weight = {}
    for k, v in sd.items():
        if k.startswith("t2s_transformer.blocks."):
            parts = k.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            weight[f"model.h.layers.{i}.{inv[rest]}"] = v
        else:
            weight["model." + k] = v
    path = tmp_path / "tiny_s1.ckpt"
    torch.save({"config": TINY_GPT, "weight": weight}, str(path))
    return ref, path


def test_gpt_ckpt_roundtrip(tmp_path):
    ref, path = _make_gpt_ckpt(tmp_path)
    gpt = loader.get_gpt_weights(path, _cfg())
    # the remapped params must match a direct conversion of the runtime dict
    from gsv_tts_tpu.models import t2s as jt2s
    direct = jt2s.params_from_torch_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, gpt.cfg)
    for k in ("text_emb", "audio_emb", "predict_w"):
        np.testing.assert_array_equal(np.asarray(gpt.params[k]), np.asarray(direct[k]))
    np.testing.assert_array_equal(
        np.asarray(gpt.params["layers"]["qkv_w"]), np.asarray(direct["layers"]["qkv_w"]))
    assert gpt.cfg.eos == 100


def test_gpt_safetensors_roundtrip(tmp_path):
    _, path = _make_gpt_ckpt(tmp_path)
    out = tmp_path / "gpt_st"
    loader.gpt_to_safetensors(str(path), str(out), _cfg())
    a = loader.get_gpt_weights(path, _cfg())
    b = loader.get_gpt_weights(str(out), _cfg())
    np.testing.assert_allclose(np.asarray(a.params["layers"]["qkv_w"]),
                               np.asarray(b.params["layers"]["qkv_w"]), atol=1e-7)


def _make_sovits_pth(tmp_path, doctored_header=None, version_in_hps=True):
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
    mm = import_reference_module("GPT_SoVITS/SoVITS/models.py", "GPT_SoVITS.SoVITS.models")
    torch.manual_seed(1)
    hps = json.loads(json.dumps(HPS))
    if version_in_hps:
        hps["model"]["version"] = "v2"
    kw = dict(hps["model"])
    kw.pop("version", None)
    ref = mm.SynthesizerTrn(
        hps["data"]["filter_length"] // 2 + 1,
        hps["train"]["segment_size"] // hps["data"]["hop_length"],
        n_speakers=0, **kw)
    with torch.no_grad():
        for prm in ref.parameters():
            prm.normal_(0, 0.1)
    path = tmp_path / "tiny_s2.pth"
    torch.save({"config": hps, "weight": ref.state_dict()}, str(path))
    if doctored_header is not None:
        data = path.read_bytes()
        path.write_bytes(doctored_header + data[2:])
    return ref, path


def test_sovits_pth_roundtrip(tmp_path):
    ref, path = _make_sovits_pth(tmp_path)
    sv = loader.get_sovits_weights(path, _cfg())
    assert sv.cfg.version == "v2"
    assert sv.cfg.spec_channels == 705
    assert sv.cfg.samples_per_frame == 4
    ssl_w = ref.state_dict()["ssl_proj.weight"].numpy()
    np.testing.assert_array_equal(np.asarray(sv.params["ssl_proj.weight"]), ssl_w)
    # weight-norm keys must be folded away
    assert not any(k.endswith("weight_v") for k in sv.params)
    assert "dec.ups.0.weight" in sv.params


def test_sovits_doctored_header(tmp_path):
    """The b'05' header overrides the in-file version (``Loader.py:42-57``)."""
    _, path = _make_sovits_pth(tmp_path, doctored_header=b"05", version_in_hps=False)
    # v2Pro requires sv_emb weights; loading the params still works because the
    # conversion is name-driven — only version metadata changes.
    sv = loader.get_sovits_weights(path, _cfg())
    assert sv.cfg.version == "v2Pro"


def test_sovits_safetensors_roundtrip(tmp_path):
    ref, path = _make_sovits_pth(tmp_path)
    out = tmp_path / "sov_st"
    loader.sovits_to_safetensors(str(path), str(out), _cfg())
    a = loader.get_sovits_weights(path, _cfg())
    b = loader.get_sovits_weights(str(out), _cfg())
    assert set(a.params.keys()) == set(b.params.keys())
    np.testing.assert_allclose(np.asarray(a.params["dec.ups.0.weight"]),
                               np.asarray(b.params["dec.ups.0.weight"]), atol=1e-7)


def test_pure_python_torch_reader(tmp_path):
    """utils/torch_pickle loads torch zip checkpoints without torch."""
    from gsv_tts_tpu.utils import torch_pickle

    obj = {
        "config": {"model": {"hidden": 64, "name": "x"}, "lr": [1, 2.5]},
        "weight": {
            "a.weight": torch.randn(3, 5),
            "b.bias": torch.arange(7, dtype=torch.int64),
            "c.half": torch.randn(2, 2).half(),
            "d.bf16": torch.randn(4, 3).bfloat16(),
            "e.scalar": torch.tensor(2.5),
            "f.noncontig": torch.randn(6, 8).t(),
        },
    }
    path = tmp_path / "roundtrip.pth"
    torch.save(obj, str(path))
    out = torch_pickle.load(str(path))
    assert out["config"] == obj["config"]
    for k, v in obj["weight"].items():
        got = out["weight"][k]
        ref = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
        np.testing.assert_array_equal(np.asarray(got, np.float32)
                                      if "bf16" in k else got, ref)
        assert tuple(got.shape) == tuple(v.shape)


def test_loader_works_without_torch(tmp_path, monkeypatch):
    """Checkpoint loading must not require torch at runtime."""
    import builtins
    import sys

    _, gpt_path = _make_gpt_ckpt(tmp_path)

    real_import = builtins.__import__

    def guarded(name, *args, **kwargs):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch blocked for this test")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", guarded)
    gpt = loader.get_gpt_weights(gpt_path, _cfg())
    assert gpt.cfg.eos == 100


def test_save_trained_gpt_roundtrip(tmp_path):
    """Trained-params export → safetensors dir → reload: pytree-equal params
    (new capability vs the reference, which only converts checkpoints)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsv_tts_tpu.config import Config
    from gsv_tts_tpu.loader import save_trained_gpt, get_gpt_weights
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig

    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=64,
                    eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(7), cfg,
                                   dtype=jnp.float32)
    out = tmp_path / "trained_gpt"
    save_trained_gpt(params, cfg, str(out))

    gpt = get_gpt_weights(str(out), Config(dtype="float32"))
    assert gpt.cfg.num_layers == 2 and gpt.cfg.vocab_size == 101
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(gpt.params)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-6)


def test_torch_pickle_rejects_code_execution(tmp_path):
    """A crafted data.pkl that REDUCEs into eval/os.system must raise, not
    execute (the unpickler allowlists only data-container builtins)."""
    import pickle
    import zipfile

    import pytest

    from gsv_tts_tpu.utils import torch_pickle

    class Evil:
        def __reduce__(self):
            return (eval, ("__import__('os').system('touch /tmp/pwned_gsv')",))

    path = tmp_path / "evil.ckpt"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("archive/data.pkl", pickle.dumps(Evil()))
    with pytest.raises(pickle.UnpicklingError, match="not allowed"):
        torch_pickle.load(str(path))
    assert not os.path.exists("/tmp/pwned_gsv")

    # getattr laundering (builtins.getattr as a GLOBAL) must also fail
    with zipfile.ZipFile(tmp_path / "evil2.ckpt", "w") as z:
        z.writestr("archive/data.pkl",
                   b"\x80\x04cbuiltins\ngetattr\n.")
    with pytest.raises(pickle.UnpicklingError):
        torch_pickle.load(str(tmp_path / "evil2.ckpt"))


def test_torch_pickle_safe_builtins_still_load(tmp_path):
    """Container builtins (set/slice/complex) remain loadable."""
    import pickle
    import zipfile

    from gsv_tts_tpu.utils import torch_pickle

    obj = {"a": {1, 2}, "b": slice(1, 5, 2), "c": complex(1, 2),
           "d": bytearray(b"xy"), "e": (1, [2, 3])}
    path = tmp_path / "ok.ckpt"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("archive/data.pkl", pickle.dumps(obj))
    out = torch_pickle.load(str(path))
    assert out == obj
