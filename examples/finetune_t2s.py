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
    args = ap.parse_args()

    import jax
    import numpy as np

    from gsv_tts_tpu import TTS
    from gsv_tts_tpu import train_data
    from gsv_tts_tpu.loader import save_trained_gpt
    from gsv_tts_tpu.parallel import train as ptrain
    from gsv_tts_tpu.parallel.mesh import make_mesh, shard_t2s_params

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

    optimizer, schedule = ptrain.make_optimizer(
        peak_lr=args.lr, warmup_steps=args.warmup, decay_steps=args.steps)
    step_fn = jax.jit(ptrain.make_train_step(
        gpt.cfg, optimizer, dtype=tts.tts_config.dtype, remat=args.remat))

    params = gpt.params
    n_dev = len(jax.devices())
    if n_dev > 1:
        mesh = make_mesh(n_dev)
        params = shard_t2s_params(params, mesh)
        print(f"sharded over {n_dev} chips: mesh {dict(mesh.shape)}")
    import optax  # noqa: F401  (baked-in; used by make_optimizer internally)

    opt_state = optimizer.init(params)

    step = 0
    t0 = time.time()
    while step < args.steps:
        for batch in train_data.batches(gpt.cfg, samples, args.batch_size,
                                        seed=step):
            params, opt_state, loss = step_fn(params, opt_state, batch)
            step += 1
            if step % 50 == 0 or step == 1:
                dt = (time.time() - t0) / max(step, 1)
                print(f"step {step:6d}  loss {float(loss):.4f}  "
                      f"lr {float(schedule(step)):.2e}  {dt * 1000:.0f} ms/step")
            if step >= args.steps:
                break

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_trained_gpt(jax.device_get(params), gpt.cfg, str(out),
                     config=gpt.config)
    print(f"saved fine-tuned checkpoint to {out} — load with "
          f"TTS().load_gpt_model({str(out)!r})")


if __name__ == "__main__":
    main()
