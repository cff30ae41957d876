#!/usr/bin/env python
"""Real-checkpoint verification: load production GPT-SoVITS checkpoints
through THIS repo's loader, synthesize a fixed utterance with both this
engine and the reference torch pipeline, and assert mel-spectral parity.

Round-1 VERDICT item 4: every parity test uses tiny random-weight models;
this script proves checkpoint compatibility on the actual released assets
(``s1v3.ckpt`` / ``s2Gv2ProPlus.pth`` — ``Loader.py:111,59`` in the
reference) whenever they are present.  Without the assets (offline CI) it
prints SKIPPED and exits 0.

Usage:
    python verify_checkpoints.py --models-dir ~/gsv_models \
        [--gpt s1v3.ckpt] [--sovits s2Gv2ProPlus.pth] \
        [--ref-audio ref.wav --prompt-text "..."] [--text "..."] \
        [--mel-threshold 1.0]

Requirements on the asset side (the reference's pretrained bundle layout):
    <models-dir>/<gpt>, <models-dir>/<sovits>,
    <models-dir>/chinese-hubert-base/,  <models-dir>/sv/*.ckpt
The reference repo must be readable (default /root/reference, override
with GSV_REFERENCE) and torch must be installed — both engines run on CPU
in float32 with greedy sampling and zero latent noise, so the waveforms
are directly comparable.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


#: real-scale size floors (bytes) — tiny random fixtures are far below these
_REAL_MIN = {"gpt": 100e6, "sovits": 90e6}


def find_staged_assets(gpt_name: str, sovits_name: str) -> str:
    """Auto-detect a staged real-checkpoint dir (VERDICT r4 item 5): scan
    the canonical stage locations for REAL-SCALE flagship checkpoints (size
    classification — tiny fixtures never reach 100 MB) so the gauntlet runs
    unprompted the moment assets appear."""
    candidates = [os.environ.get("GSV_MODELS_DIR", ""), "/tmp/gsv_assets",
                  os.path.expanduser("~/gsv_models"),
                  os.path.expanduser("~/gsv_assets")]
    for d in candidates:
        if not d or not os.path.isdir(d):
            continue
        g = os.path.join(d, gpt_name)
        s = os.path.join(d, sovits_name)
        if (os.path.exists(g) and os.path.getsize(g) >= _REAL_MIN["gpt"]
                and os.path.exists(s)
                and os.path.getsize(s) >= _REAL_MIN["sovits"]):
            return d
    return ""


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--models-dir", default=os.environ.get("GSV_MODELS_DIR", ""))
    ap.add_argument("--gpt", default="s1v3.ckpt")
    ap.add_argument("--sovits", default="s2Gv2ProPlus.pth")
    ap.add_argument("--ref-audio", default=None,
                    help="reference speaker/prompt wav (>=3 s); defaults to "
                         "examples/ sample if present")
    ap.add_argument("--prompt-text", default="hello there, nice to meet you.")
    ap.add_argument("--text", default="the quick brown fox jumps over the lazy dog.")
    ap.add_argument("--mel-threshold", type=float, default=1.0,
                    help="max mean |log-mel| distance (dB-like units)")
    ap.add_argument("--quant", action="store_true",
                    help="also synthesize with the int8 weight-streaming "
                         "t2s decode (TTS(quant_t2s=True), real TPU only) "
                         "and report mel distance vs this engine's own fp "
                         "output — the real-weight quality number that "
                         "gates making q8 (and future int4/kv8) a default")
    ap.add_argument("--quant-mel-threshold", type=float, default=1.0)
    args = ap.parse_args()

    models_dir = os.path.expanduser(args.models_dir) if args.models_dir else ""
    if not models_dir:
        models_dir = find_staged_assets(args.gpt, args.sovits)
        if models_dir:
            print(f"auto-detected staged real checkpoints in {models_dir}")
    gpt_path = os.path.join(models_dir, args.gpt) if models_dir else ""
    sovits_path = os.path.join(models_dir, args.sovits) if models_dir else ""
    hubert_dir = os.path.join(models_dir, "chinese-hubert-base") if models_dir else ""

    missing = [p for p in (gpt_path, sovits_path, hubert_dir)
               if not p or not os.path.exists(p)]
    if missing:
        print(f"SKIPPED: checkpoint assets not found ({missing or 'no --models-dir'})")
        return 0
    ref_root = os.environ.get("GSV_REFERENCE", "/root/reference")
    if not os.path.isdir(ref_root):
        print(f"SKIPPED: reference repo not readable at {ref_root}")
        return 0
    try:
        import torch  # noqa: F401
    except ImportError:
        print("SKIPPED: torch not installed (needed for the oracle pipeline)")
        return 0

    ref_audio = args.ref_audio
    if ref_audio is None:
        for cand in ("examples/ref.wav", "examples/prompt.wav"):
            if os.path.exists(os.path.join(REPO, cand)):
                ref_audio = os.path.join(REPO, cand)
                break
    if ref_audio is None:  # staged dirs carry their own reference speech
        for name in ("spk.wav", "prompt.wav"):
            cand = os.path.join(models_dir, name)
            if os.path.exists(cand):
                ref_audio = cand
                break
    if ref_audio is None or not os.path.exists(ref_audio):
        print("SKIPPED: no --ref-audio wav provided")
        return 0

    import numpy as np

    from gsv_tts_tpu.ops.stft import mel_distance

    # ---- our engine (loader.py end to end) ----
    from gsv_tts_tpu import TTS

    kwargs = dict(top_k=1, top_p=1.0, temperature=1.0,
                  repetition_penalty=1.35, noise_scale=0.0)
    ours = TTS(gpt_cache=[(1, 512), (1, 1024)], sovits_cache=[],
               models_dir=models_dir, dtype="float32")
    ours.load_gpt_model(gpt_path)
    ours.load_sovits_model(sovits_path)
    our_clip = ours.infer(ref_audio, ref_audio, args.prompt_text,
                          args.text, **kwargs)
    a = np.asarray(our_clip.audio_data, np.float32)
    print(f"ours: {len(a) / 32000:.2f}s audio")

    # ---- reference torch pipeline (same frontend injected, golden-style) ----
    from test_golden_e2e import _load_reference_tts, _our_frontend_as_torch
    from gsv_tts_tpu.frontend import text_processor as jtp
    from gsv_tts_tpu.utils import audio_io
    import torch

    ttsmod = _load_reference_tts()
    ttsmod.check_pretrained_models = lambda d: None
    ttsmod.get_phones_and_bert = _our_frontend_as_torch
    ttsmod.cut_text = jtp.cut_text
    ttsmod.sub2text_index = jtp.sub2text_index
    rtts = ttsmod.TTS(gpt_cache=[(1, 512), (1, 1024)], sovits_cache=[],
                      models_dir=models_dir, device="cpu", dtype="float32",
                      use_bert=False, auto_bert=False)
    rtts._load_audio = lambda p: (torch.from_numpy(audio_io.load_audio(p)[0]),
                                  audio_io.load_audio(p)[1])
    rtts.load_gpt_model(gpt_path)
    rtts.load_sovits_model(sovits_path)
    t2s = rtts.gpt_models[gpt_path].t2s_model
    with torch.inference_mode():
        for bs in t2s.cuda_graph_buckets:
            t2s.cuda_graph_buckets[bs][-1].k_cache.zero_()
            t2s.cuda_graph_buckets[bs][-1].v_cache.zero_()
    ref_clip = rtts.infer(ref_audio, ref_audio, args.prompt_text,
                          args.text, **kwargs)
    b = np.asarray(ref_clip.audio_data, np.float32)
    print(f"reference: {len(b) / 32000:.2f}s audio")

    n = min(len(a), len(b))
    dist = mel_distance(a[:n], b[:n])
    corr = float(np.corrcoef(a[:n], b[:n])[0, 1]) if n > 1 else 1.0
    print(f"mel_distance={dist:.4f} waveform_corr={corr:.4f} "
          f"len_delta={abs(len(a) - len(b))} samples")
    if dist > args.mel_threshold:
        print(f"FAIL: mel distance {dist:.4f} > threshold {args.mel_threshold}")
        return 1
    print("OK: real-checkpoint mel parity holds")

    if args.quant:
        # int8 t2s quality on REAL weights (tokens shift by the rounding
        # error, so this is a quality delta vs OUR fp output, not parity)
        import jax
        if jax.devices()[0].platform not in ("tpu", "axon"):
            print("QUANT SKIPPED: fused_step_q8 needs a real TPU "
                  "(interpret mode at flagship dims is impractical)")
            return 0
        outs = {}
        for name, quant in (("bf16", False), ("q8", True)):
            e = TTS(gpt_cache=[(1, 512), (1, 1024)], sovits_cache=[],
                    models_dir=models_dir, quant_t2s=quant)
            e.load_gpt_model(gpt_path)
            e.load_sovits_model(sovits_path)
            clip = e.infer(ref_audio, ref_audio, args.prompt_text,
                           args.text, **kwargs)
            outs[name] = np.asarray(clip.audio_data, np.float32)
        fa, qa = outs["bf16"], outs["q8"]
        nq = min(len(fa), len(qa))
        qdist = mel_distance(fa[:nq], qa[:nq])
        print(f"q8: {len(qa) / 32000:.2f}s audio, mel_distance_vs_bf16="
              f"{qdist:.4f} len_delta={abs(len(fa) - len(qa))}")
        if qdist > args.quant_mel_threshold:
            print(f"FAIL: q8 mel distance {qdist:.4f} > threshold "
                  f"{args.quant_mel_threshold}")
            return 1
        print("OK: int8 t2s decode holds mel quality on real weights")
    return 0


if __name__ == "__main__":
    sys.exit(main())
