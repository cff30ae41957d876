"""Generate tiny random checkpoints + audio for driving the real server.

``--flagship`` swaps the stage-1/stage-2 checkpoints to production dims
(GPT 512/24/16, SoVITS v2 192/512 — the shapes ``T2SConfig``/``SovitsConfig``
default to, i.e. the reference's s1v3/s2G dims) while keeping the
featurizers tiny, so `tools/load_test.py` measures real-model serving
capacity through the actual HTTP server rather than toy-shape overheads.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch

from conftest import import_reference_module
from gsv_tts_tpu.utils.audio_io import save_wav

FLAGSHIP = "--flagship" in sys.argv
argv = [a for a in sys.argv[1:] if a != "--flagship"]
ROOT = argv[0] if argv else (
    "/tmp/gsv_assets_flagship" if FLAGSHIP else "/tmp/gsv_assets")
os.makedirs(ROOT, exist_ok=True)

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
if FLAGSHIP:
    # Production dims (reference s1v3.ckpt / s2Gv2 hps; random weights).
    TINY_GPT["model"].update(hidden_dim=512, embedding_dim=512, head=16,
                             n_layer=24)
    HPS["data"].update(filter_length=2048, hop_length=640, win_length=2048)
    HPS["train"]["segment_size"] = 20480
    HPS["model"].update(
        filter_channels=768, n_layers=6,
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        upsample_rates=[10, 8, 2, 2, 2], upsample_initial_channel=512,
        upsample_kernel_sizes=[16, 16, 8, 2, 2],
    )

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
torch.save({"config": TINY_GPT, "weight": weight}, os.path.join(ROOT, "tiny_s1.ckpt"))

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
    sref.dec.conv_post.weight.mul_(30.0)
    for q in sref.quantizer.vq.layers:
        q._codebook.embed.normal_(0, 1.0)
        q._codebook.inited.fill_(1)
torch.save({"config": HPS, "weight": sref.state_dict()},
           os.path.join(ROOT, "tiny_s2.pth"))

from transformers import HubertConfig, HubertModel

hcfg = HubertConfig(
    hidden_size=768, num_hidden_layers=1, num_attention_heads=4,
    intermediate_size=128, conv_dim=[32, 32, 32, 32],
    conv_kernel=[10, 8, 4, 4], conv_stride=[5, 4, 4, 4],
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    feat_extract_norm="group", do_stable_layer_norm=False, conv_bias=False)
torch.manual_seed(2)
href = HubertModel(hcfg)
hdir = os.path.join(ROOT, "chinese-hubert-base")
os.makedirs(hdir, exist_ok=True)
open(os.path.join(hdir, "config.json"), "w").write(hcfg.to_json_string())
open(os.path.join(hdir, "preprocessor_config.json"), "w").write(json.dumps({
    "feature_extractor_type": "Wav2Vec2FeatureExtractor",
    "feature_size": 1, "sampling_rate": 16000, "padding_side": "right",
    "padding_value": 0.0, "do_normalize": True, "return_attention_mask": False,
}))
from safetensors.numpy import save_file

save_file({k: v.numpy() for k, v in href.state_dict().items()
           if "num_batches_tracked" not in k},
          os.path.join(hdir, "model.safetensors"))

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
os.makedirs(os.path.join(ROOT, "sv"), exist_ok=True)
torch.save(sv_net.state_dict(),
           os.path.join(ROOT, "sv", "pretrained_eres2netv2w24s4ep4.ckpt"))

rng = np.random.RandomState(3)
sr = 32000
for fname, seconds, freq in [("spk.wav", 0.7, 220), ("prompt.wav", 0.6, 330)]:
    t = np.arange(int(sr * seconds)) / sr
    wav = (0.3 * np.sin(2 * np.pi * freq * t)
           + 0.05 * rng.randn(len(t))).astype(np.float32)
    save_wav(os.path.join(ROOT, fname), wav, sr)

# evil checkpoint: REDUCEs into eval on load
import pickle
import zipfile


class Evil:
    def __reduce__(self):
        return (eval, ("__import__('os').system('touch /tmp/pwned_gsv_verify')",))


with zipfile.ZipFile(os.path.join(ROOT, "evil.ckpt"), "w") as z:
    z.writestr("archive/data.pkl", pickle.dumps(Evil()))

print("assets at", ROOT)
