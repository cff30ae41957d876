"""Fine-tune the stage-2 SoVITS synthesizer (VITS GAN recipe) on your data.

Counterpart of ``finetune_t2s.py`` for the vocoder stage — a capability the
reference engine does not have (inference-only).  The RVQ codebook stays
frozen so the fine-tuned model remains compatible with your stage-1 GPT.

    python examples/finetune_sovits.py --manifest data/train.list \
        --sovits s2Gv2ProPlus.pth --out-dir runs/s2_ft --steps 5000
"""
import argparse
import time


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
    ap.add_argument("--ckpt-every", type=int, default=500,
                    help="checkpoint cadence; interrupted runs resume from "
                         "{out-dir}/sovits_state.npz automatically")
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore an existing checkpoint and start fresh")
    ap.add_argument("--max-steps-this-run", type=int, default=None)
    args = ap.parse_args()

    from gsv_tts_tpu import TTS, train_data

    tts = TTS(models_dir=args.models_dir) if args.models_dir else TTS()
    tts.load_sovits_model(args.sovits)
    sovits = tts.sovits_models[args.sovits]
    cfg, hps = sovits.cfg, sovits.hps

    items = train_data.read_manifest(args.manifest)
    t0 = time.time()
    samples = train_data.featurize_sovits(tts, items)
    print(f"featurized {len(samples)} samples in {time.time() - t0:.1f}s")

    from gsv_tts_tpu.train_loop import finetune_sovits

    finetune_sovits(
        samples, cfg, hps, args.out_dir,
        total_steps=args.steps, batch_size=args.batch_size,
        init_params=sovits.params, dtype=tts.tts_config.dtype,
        g_lr=args.g_lr, d_lr=args.d_lr, ckpt_every=args.ckpt_every,
        resume=not args.no_resume,
        max_steps_this_run=args.max_steps_this_run)
    print(f"saved fine-tuned SoVITS to {args.out_dir} — load with "
          f"TTS().load_sovits_model({args.out_dir!r})")


if __name__ == "__main__":
    main()
