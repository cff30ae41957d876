"""Fine-tune the stage-1 (text→semantic) decoder on your own recordings.

End-to-end recipe — a capability the reference engine does not have (it is
inference-only; upstream GPT-SoVITS trains stage 1 with torch on GPU):

  1. featurize (wav, text) pairs with the same frontend/HuBERT/RVQ stack
     inference uses (``gsv_tts_tpu/train_data.py``),
  2. teacher-forced next-token CE over the audio block, AdamW with
     warmup-cosine (``gsv_tts_tpu/parallel/train.py``), dp×tp sharded over
     all visible TPU chips via GSPMD when more than one is present,
  3. export a safetensors checkpoint dir loadable by ``TTS.load_gpt_model``.

Manifest format (``--manifest``): the upstream GPT-SoVITS ``.list`` lines
``wav_path|speaker|lang|text`` or ``.jsonl`` ``{"wav", "text", "lang"}``.

    python examples/finetune_t2s.py --manifest data/train.list \
        --gpt s1v3.ckpt --sovits s2Gv2ProPlus.pth --out-dir runs/ft \
        --steps 2000 --batch-size 8
"""
import argparse
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--gpt", required=True, help=".ckpt / safetensors dir to start from")
    ap.add_argument("--sovits", required=True, help="SoVITS weights (RVQ codebook for targets)")
    ap.add_argument("--models-dir", default=None)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the forward in backward (HBM-tight chips)")
    ap.add_argument("--cache", default=None,
                    help="featurized-sample .npz cache (skips re-extraction)")
    ap.add_argument("--ckpt-every", type=int, default=500,
                    help="checkpoint cadence; interrupted runs resume from "
                         "{out-dir}/t2s_state.npz automatically")
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore an existing checkpoint and start fresh")
    ap.add_argument("--pp", type=int, default=0,
                    help="pipeline-parallel stages (GPipe over a "
                         "('dp','pp') mesh; 0 = dp x tp GSPMD default)")
    ap.add_argument("--n-micro", type=int, default=2,
                    help="GPipe microbatches per step (with --pp)")
    ap.add_argument("--max-steps-this-run", type=int, default=None,
                    help="stop after N steps this invocation (time-boxed "
                         "jobs); --steps still parameterizes the schedule")
    args = ap.parse_args()

    import jax

    from gsv_tts_tpu import TTS
    from gsv_tts_tpu import train_data
    from gsv_tts_tpu.parallel.mesh import make_mesh

    tts = TTS(models_dir=args.models_dir) if args.models_dir else TTS()
    tts.load_gpt_model(args.gpt)
    tts.load_sovits_model(args.sovits)
    gpt = tts.gpt_models[args.gpt]

    if args.cache and Path(args.cache).exists():
        samples = train_data.load_samples(args.cache)
        print(f"loaded {len(samples)} cached samples from {args.cache}")
    else:
        items = train_data.read_manifest(args.manifest)
        t0 = time.time()
        samples = train_data.featurize(tts, items)
        print(f"featurized {len(samples)} samples in {time.time() - t0:.1f}s")
        if args.cache:
            train_data.save_samples(args.cache, samples)

    n_dev = len(jax.devices())
    if args.pp > 1:
        from gsv_tts_tpu.parallel.pipeline import make_mesh_dp_pp

        mesh = make_mesh_dp_pp(n_dev, pp=args.pp)
    else:
        mesh = make_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None:
        print(f"sharding over {n_dev} chips: mesh {dict(mesh.shape)}")

    from gsv_tts_tpu.train_loop import finetune_t2s

    finetune_t2s(
        samples, gpt.cfg, args.out_dir,
        total_steps=args.steps, batch_size=args.batch_size,
        init_params=gpt.params, dtype=tts.tts_config.dtype,
        peak_lr=args.lr, warmup_steps=args.warmup, remat=args.remat,
        mesh=mesh, pp_n_micro=args.n_micro,
        ckpt_every=args.ckpt_every, resume=not args.no_resume,
        max_steps_this_run=args.max_steps_this_run,
        export_config=gpt.config)
    print(f"saved fine-tuned checkpoint to {args.out_dir} — load with "
          f"TTS().load_gpt_model({args.out_dir!r})")


if __name__ == "__main__":
    main()
