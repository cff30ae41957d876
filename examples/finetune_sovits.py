"""Fine-tune the stage-2 SoVITS synthesizer (VITS GAN recipe) on your data.

Counterpart of ``finetune_t2s.py`` for the vocoder stage — a capability the
reference engine does not have (inference-only).  The RVQ codebook stays
frozen so the fine-tuned model remains compatible with your stage-1 GPT.

    python examples/finetune_sovits.py --manifest data/train.list \
        --sovits s2Gv2ProPlus.pth --out-dir runs/s2_ft --steps 5000
"""
import argparse
import time
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--sovits", required=True)
    ap.add_argument("--models-dir", default=None)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--g-lr", type=float, default=1e-4)
    ap.add_argument("--d-lr", type=float, default=1e-4)
    args = ap.parse_args()

    import jax
    import optax

    from gsv_tts_tpu import TTS, train_data
    from gsv_tts_tpu.loader import save_trained_sovits
    from gsv_tts_tpu.models import sovits_train as svt

    tts = TTS(models_dir=args.models_dir) if args.models_dir else TTS()
    tts.load_sovits_model(args.sovits)
    sovits = tts.sovits_models[args.sovits]
    cfg, hps = sovits.cfg, sovits.hps

    hop = int(hps.data.hop_length)
    spf = int(np.prod(cfg.upsample_rates))
    items = train_data.read_manifest(args.manifest)
    t0 = time.time()
    samples = train_data.featurize_sovits(tts, items)
    print(f"featurized {len(samples)} samples in {time.time() - t0:.1f}s")
    if spf != hop:
        # training needs one latent frame == one vocoder hop; when the spec
        # hop is an integer fraction of samples-per-frame (real checkpoints:
        # equal), decimate features to the vocoder frame rate
        if spf % hop:
            raise SystemExit(f"hop_length ({hop}) incompatible with the "
                             f"vocoder's samples-per-frame ({spf})")
        r = spf // hop
        samples = [(s[:, ::r], sp[:, ::r], w, t) for s, sp, w, t in samples]
        hop = spf
    segment_frames = max(int(hps.train.segment_size) // hop, 4)

    params = dict(sovits.params)
    if "enc_q.pre.weight" not in params:  # Lite checkpoints strip enc_q
        params.update(svt.init_enc_q_params(jax.random.PRNGKey(0), cfg,
                                            dtype=tts.tts_config.dtype))
        print("posterior encoder not in checkpoint — fresh init")
    d_params = svt.init_discriminator_params(jax.random.PRNGKey(1),
                                             dtype=tts.tts_config.dtype)

    g_opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.g_lr))
    d_opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.d_lr))
    step_fn = jax.jit(svt.make_sovits_train_step(
        cfg, g_opt, d_opt,
        n_fft=int(hps.data.filter_length), hop_length=hop,
        win_length=int(hps.data.win_length), sr=int(hps.data.sampling_rate),
        segment_frames=segment_frames))
    g_state = g_opt.init(params)
    d_state = d_opt.init(d_params)

    order = sorted(range(len(samples)), key=lambda i: samples[i][1].shape[-1])
    chunks = [order[i: i + args.batch_size]
              for i in range(0, len(order), args.batch_size)]
    step = 0
    rng = jax.random.PRNGKey(2)
    t0 = time.time()
    while step < args.steps:
        for chunk in chunks:
            group = [samples[i] for i in chunk]
            if len(group) < args.batch_size:
                group += [group[-1]] * (args.batch_size - len(group))
            batch = svt.pad_sovits_batch(cfg, group, hop)
            rng, sub = jax.random.split(rng)
            params, d_params, g_state, d_state, m = step_fn(
                params, d_params, g_state, d_state, batch, sub)
            step += 1
            if step % 50 == 0 or step == 1:
                dt = (time.time() - t0) / max(step, 1)
                print(f"step {step:6d}  g {float(m['g_total']):.3f} "
                      f"(mel {float(m['mel']):.3f} kl {float(m['kl']):.3f} "
                      f"fm {float(m['fm']):.3f} adv {float(m['adv']):.3f})  "
                      f"d {float(m['d_total']):.3f}  {dt * 1000:.0f} ms/step")
            if step >= args.steps:
                break

    out = Path(args.out_dir)
    save_trained_sovits(jax.device_get(params), hps, str(out))
    print(f"saved fine-tuned SoVITS to {out} — load with "
          f"TTS().load_sovits_model({str(out)!r})")


if __name__ == "__main__":
    main()
