#!/usr/bin/env python
"""Produce CHECKPOINT_VERIFY.json: hard evidence of the real-checkpoint
situation in this environment (VERDICT r3 item 1).

Three sections:

1. ``network`` — DNS + HTTP probes of every asset host the download manager
   races (reference ``Download.py:63-87``), then an actual
   ``check_pretrained_models`` run into a scratch dir with the exact failure
   captured.  This turns "env-blocked" from an assertion into a log.
2. ``assets_on_disk`` — what IS present locally (sizes + md5), classified
   real vs tiny-fixture by parameter count.
3. ``real_sv_parity`` — the one released checkpoint that exists locally is
   the 214 MB ERes2NetV2 speaker-verification model
   (``pretrained_eres2netv2w24s4ep4.ckpt``, reference ``Loader.py`` sv slot).
   Load it through BOTH stacks (this repo's JAX ``models/sv.py`` and the
   reference torch ``GPT_SoVITS/SV``), embed the two real wavs in the asset
   bundle, and report elementwise parity + cosine-similarity agreement.
   This is genuine trained-weight parity, not a random-fixture test.

Run:  python tools/checkpoint_env_report.py [--assets /tmp/gsv_assets]
"""
from __future__ import annotations

import argparse
import hashlib
import io
import json
import logging
import os
import socket
import sys
import tempfile
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

HOSTS = ["huggingface.co", "www.modelscope.cn", "github.com"]

# Exact staging recipe (VERDICT r4 item 5): anyone with network can stage
# /tmp/gsv_assets from this list; verify_checkpoints.py and bench.py
# auto-detect the staged real checkpoints and run the full mel-parity +
# q8-quality gauntlet unprompted.  URLs are the download manager's own
# templates (gsv_tts_tpu/download.py:17-19, mirroring reference
# Download.py:11-12,147-148) plus the upstream GPT-SoVITS pretrained repo
# for the two flagship checkpoints (which the reference's downloader also
# does NOT fetch — they are user-provided, reference Loader.py:111,59).
STAGING_MANIFEST = {
    "stage_dir": "/tmp/gsv_assets  (or any dir via --models-dir / "
                 "GSV_MODELS_DIR; auto-detected by verify_checkpoints.py "
                 "and bench.py)",
    "assets": [
        {
            "file": "s1v3.ckpt",
            "purpose": "flagship t2s AR model (24L/512H)",
            "approx_bytes": "~155e6",
            "source": "https://huggingface.co/lj1995/GPT-SoVITS/resolve/"
                      "main/s1v3.ckpt (upstream GPT-SoVITS pretrained repo)",
        },
        {
            "file": "s2Gv2ProPlus.pth",
            "purpose": "flagship SoVITS generator (v2ProPlus)",
            "approx_bytes": "~200e6",
            "md5_first_8kib": "66b313e39455b57ab1b0bc0b239c9d0a",
            "md5_note": "first-8KiB md5 from the version sniffer table "
                        "(loader.py HASH_PRETRAINED, reference Loader.py:26)",
            "source": "https://huggingface.co/lj1995/GPT-SoVITS/resolve/"
                      "main/v2Pro/s2Gv2ProPlus.pth",
        },
        {
            "file": "chinese-hubert-base/ + g2p/ + sv/"
                    "pretrained_eres2netv2w24s4ep4.ckpt",
            "purpose": "featurizer bundle (hubert ~189 MB, sv 214 MB, g2p "
                       "lexicons)",
            "source": [
                "https://modelscope.cn/models/chinokiki/GPTSoVITS-RT/"
                "resolve/master/pretrained_models5.zip  (MS flavor: "
                "includes g2p)",
                "https://huggingface.co/cnmds/GPTSoVITS-RT/resolve/main/"
                "pretrained_models6.zip?download=true  (HF flavor) + "
                "https://github.com/chinokikiss/GSV-TTS-Lite/releases/"
                "download/g2p/g2p.zip",
            ],
            "note": "unzip into the stage dir; or just run "
                    "gsv_tts_tpu.download.check_pretrained_models(dir) "
                    "with network",
        },
        {
            "file": "chinese-roberta-wwm-ext-large/",
            "purpose": "zh BERT featurizer (optional: engine runs with "
                       "use_bert=False without it)",
            "source": "https://modelscope.cn/models/chinokiki/GPTSoVITS-RT/"
                      "resolve/master/chinese-roberta.zip (or the HF "
                      "template with the same filename)",
        },
        {
            "file": "spk.wav / prompt.wav",
            "purpose": ">=3 s reference speech for the prompt side "
                       "(any real voice recording works; the gauntlet "
                       "uses them for speaker/prompt audio)",
            "source": "user-provided",
        },
    ],
    "run_after_staging": [
        "python verify_checkpoints.py            # auto-detects the stage "
        "dir, full mel-parity vs the reference torch pipeline",
        "python verify_checkpoints.py --quant    # + q8 quality gate "
        "(real TPU)",
        "python bench.py                         # auto-runs the gauntlet "
        "and records it in the bench artifact",
    ],
}


def probe_network() -> dict:
    out = {"dns": {}, "http": {}, "download_manager": {}}
    for host in HOSTS:
        t0 = time.time()
        try:
            infos = socket.getaddrinfo(host, 443)
            out["dns"][host] = {"ok": True, "addr": infos[0][4][0],
                                "ms": round((time.time() - t0) * 1e3, 1)}
        except OSError as e:
            out["dns"][host] = {"ok": False, "error": f"{type(e).__name__}: {e}",
                                "ms": round((time.time() - t0) * 1e3, 1)}
    import requests
    for host in HOSTS:
        try:
            r = requests.head(f"https://{host}", timeout=10)
            out["http"][host] = {"ok": True, "status": r.status_code}
        except Exception as e:  # noqa: BLE001
            out["http"][host] = {"ok": False,
                                 "error": f"{type(e).__name__}: {str(e)[:300]}"}

    # Exercise the actual download manager end to end and capture its logs.
    from gsv_tts_tpu import download
    download._base_url = None
    buf = io.StringIO()
    handler = logging.StreamHandler(buf)
    logging.getLogger().addHandler(handler)
    old_level = logging.getLogger().level
    logging.getLogger().setLevel(logging.INFO)
    tmp = tempfile.mkdtemp(prefix="gsv_fetch_probe_")
    try:
        t0 = time.time()
        ok = download.check_pretrained_models(tmp)
        out["download_manager"] = {
            "check_pretrained_models": bool(ok),
            "elapsed_s": round(time.time() - t0, 1),
            "scratch_dir_contents": sorted(os.listdir(tmp)),
            "log": buf.getvalue().strip().splitlines(),
        }
    except Exception:  # noqa: BLE001
        out["download_manager"] = {
            "check_pretrained_models": False,
            "exception": traceback.format_exc(limit=3),
            "log": buf.getvalue().strip().splitlines(),
        }
    finally:
        logging.getLogger().removeHandler(handler)
        logging.getLogger().setLevel(old_level)
    return out


def md5_file(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()


def inventory(assets: str) -> dict:
    inv = {}
    targets = {
        "gpt (s1)": ["s1v3.ckpt", "tiny_s1.ckpt"],
        "sovits (s2)": ["s2Gv2ProPlus.pth", "tiny_s2.pth"],
        "hubert": ["chinese-hubert-base/model.safetensors"],
        "sv": ["sv/pretrained_eres2netv2w24s4ep4.ckpt"],
    }
    # Real released sizes (approx, bytes) for classification.
    real_min = {"gpt (s1)": 100e6, "sovits (s2)": 90e6, "hubert": 150e6,
                "sv": 180e6}
    for slot, names in targets.items():
        for name in names:
            p = os.path.join(assets, name)
            if os.path.exists(p):
                size = os.path.getsize(p)
                inv[slot] = {
                    "file": name, "bytes": size, "md5": md5_file(p),
                    "classification": ("real-scale" if size >= real_min[slot]
                                       else "tiny fixture (random weights)"),
                }
                break
        else:
            inv[slot] = {"file": None, "classification": "absent"}
    return inv


def real_sv_parity(assets: str) -> dict:
    """Trained-weight parity: real ERes2NetV2 ckpt through both stacks."""
    import numpy as np
    import torch

    sv_path = os.path.join(assets, "sv", "pretrained_eres2netv2w24s4ep4.ckpt")
    if not os.path.exists(sv_path) or os.path.getsize(sv_path) < 180e6:
        return {"skipped": "real sv checkpoint not on disk"}

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from conftest import import_reference_module
    from gsv_tts_tpu.models import sv as jsv
    from gsv_tts_tpu.utils import audio_io

    import_reference_module("GPT_SoVITS/SV/pooling_layers.py",
                            "GPT_SoVITS.SV.pooling_layers")
    import_reference_module("GPT_SoVITS/SV/fusion.py", "GPT_SoVITS.SV.fusion")
    mod = import_reference_module("GPT_SoVITS/SV/ERes2NetV2.py",
                                  "GPT_SoVITS.SV.ERes2NetV2")

    sd = torch.load(sv_path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    ref = mod.ERes2NetV2(baseWidth=24, scale=4, expansion=4).eval()
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    params = {k: jnp.asarray(v.numpy()) for k, v in ref.state_dict().items()
              if "num_batches_tracked" not in k}

    out = {"ckpt_keys": len(sd),
           "load_missing": [str(k) for k in missing],
           "load_unexpected": [str(k) for k in unexpected],
           "params_total": int(sum(int(v.numel()) for v in sd.values()
                                   if hasattr(v, "numel")))}

    embs_ref, embs_ours, per_wav = [], [], {}
    for wav_name in ("spk.wav", "prompt.wav"):
        wav_path = os.path.join(assets, wav_name)
        wav, sr = audio_io.load_audio(wav_path)
        wav = np.asarray(wav, np.float32).reshape(-1)
        if sr != 16000:
            from gsv_tts_tpu.ops.stft import resample
            wav = resample(np.asarray(wav, np.float32), sr, 16000)
        # Both stacks get the SAME features (this repo's kaldi fbank,
        # property-tested in test_featurizers) so the delta isolates the
        # 53.6M-param model math on trained weights.
        feat = np.asarray(jsv.kaldi_fbank(np.asarray(wav, np.float32)))
        feat = feat - feat.mean(axis=0, keepdims=True)
        with torch.no_grad():
            e_ref = ref.forward3(torch.tensor(feat[None])).numpy()
        e_ours = np.asarray(jsv.eres2netv2_forward3(
            params, jnp.asarray(feat[None], jnp.float32)))
        denom = np.abs(e_ref).max()
        per_wav[wav_name] = {
            "emb_dim": int(e_ref.shape[-1]),
            "max_abs_diff": float(np.abs(e_ours - e_ref).max()),
            "rel_max_diff": float(np.abs(e_ours - e_ref).max() / denom),
            "ref_abs_max": float(denom),
        }
        embs_ref.append(e_ref.ravel())
        embs_ours.append(e_ours.ravel())

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    out["per_wav"] = per_wav
    out["cosine_spk_vs_prompt"] = {"reference_torch": cos(*embs_ref),
                                   "this_repo_jax": cos(*embs_ours)}
    out["cosine_delta"] = abs(out["cosine_spk_vs_prompt"]["reference_torch"]
                              - out["cosine_spk_vs_prompt"]["this_repo_jax"])
    ok = (out["cosine_delta"] < 1e-4
          and all(w["rel_max_diff"] < 1e-3 for w in per_wav.values())
          and not out["load_missing"] and not out["load_unexpected"])
    out["parity"] = "PASS" if ok else "FAIL"
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", default="/tmp/gsv_assets")
    ap.add_argument("--out", default=os.path.join(REPO, "CHECKPOINT_VERIFY.json"))
    args = ap.parse_args()

    report = {
        "generated": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
        "purpose": ("VERDICT r3 item 1: prove real-checkpoint status. "
                    "verify_checkpoints.py (full mel-parity gauntlet incl. "
                    "--quant quality gate) is ready and runs the moment "
                    "s1v3.ckpt / s2Gv2ProPlus.pth reach disk."),
        "staging_manifest": STAGING_MANIFEST,
        "network": probe_network(),
        "assets_on_disk": inventory(args.assets),
    }
    net = report["network"]
    blocked = not any(v.get("ok") for v in net["dns"].values())
    report["fetch_status"] = (
        "ENV-BLOCKED: DNS resolution fails for every asset host "
        "(huggingface.co / modelscope.cn / github.com) — no route to fetch "
        "s1v3.ckpt or s2Gv2ProPlus.pth from this sandbox." if blocked else
        "network partially reachable — see download_manager log")
    report["real_sv_parity"] = real_sv_parity(args.assets)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["real_sv_parity"], indent=2))
    print(report["fetch_status"])
    print(f"wrote {args.out}")
    sv = report["real_sv_parity"]
    return 0 if sv.get("parity") == "PASS" or "skipped" in sv else 1


if __name__ == "__main__":
    sys.exit(main())
