#!/usr/bin/env python
"""Real-TPU smoke drives: compile-and-run every engine path on the chip.

Interpret-mode tests cannot see Mosaic lowering failures or scoped-vmem
budgets — r2 caught three production-path failures ONLY by driving the
real hardware (a bool-branch `jnp.where` the prefill kernel couldn't
lower, and two scoped-vmem OOMs in batched-kernel variants bench never
compiled).  This script drives each engine program the serving stack
actually runs, at flagship dims with random weights:

  1. B=1 whole-step decode via ``T2SEngine.generate`` (suppression on)
  2. streaming generator path (25-token chunks)
  3. B=4 continuous batching via ``generate_batched``
  4. bucket escalation 512 -> 1024 mid-generation
  5. (with --assets DIR) the full TTS facade incl. featurizers:
     ``infer`` + ``infer_stream`` on tiny checkpoints

Run: ``python tpu_smoke.py [--assets /path/to/tiny_assets] [--skip-escalation]``
Exit code 0 = every drive ran and produced finite audio / nonempty tokens.
"""
from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", default=None,
                    help="tiny-checkpoint dir (tests/make_tiny_assets.py) "
                         "for the full-facade drive")
    ap.add_argument("--skip-escalation", action="store_true",
                    help="skip the 1024-bucket escalation drive (its first "
                         "compile is slow over a tunnel)")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.utils.timing import enable_compilation_cache
    enable_compilation_cache()

    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import T2SEngine

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    impl = "fused_step" if platform == "tpu" else "xla"
    print(f"platform={platform} dtype={jnp.dtype(dtype).name} attn_impl={impl}")

    cfg = T2SConfig()
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    params["predict_w"] = params["predict_w"] * 0.02  # sane sampling spread
    eng = T2SEngine(params, cfg, gpt_cache=[(1, 512), (1, 1024), (4, 512)],
                    dtype=dtype, attn_impl=impl)
    rng = np.random.RandomState(0)
    x = rng.randint(1, cfg.phoneme_vocab_size, 60).astype(np.int32)
    y = rng.randint(0, cfg.vocab_size - 1, 75).astype(np.int32)
    bert = np.zeros((60, cfg.bert_dim), np.float32)

    t0 = time.time()
    toks = np.asarray(eng.generate(x, y, bert, top_k=15,
                                   rng=jax.random.PRNGKey(7))).ravel()
    print(f"1. generate B=1: {toks.size} tokens ({time.time() - t0:.0f}s)")
    assert toks.size >= 1 and (toks < cfg.vocab_size).all()

    t0 = time.time()
    n_yields = 0
    for chunk, fin in eng.generate(x, y, bert, top_k=15,
                                   rng=jax.random.PRNGKey(8),
                                   stream_chunk=25):
        n_yields += 1
        if fin:
            break
    print(f"2. streaming: {n_yields} yields ({time.time() - t0:.0f}s)")
    assert n_yields >= 1

    t0 = time.time()
    outs, idx = eng.generate_batched([x] * 4, [y] * 4, [bert] * 4, top_k=15,
                                     rng=jax.random.PRNGKey(9))
    sizes = [np.asarray(o).size for o in outs]
    print(f"3. generate_batched B=4: {sizes} ({time.time() - t0:.0f}s)")
    assert len(outs) == 4 and all(s >= 1 for s in sizes)

    if not args.skip_escalation:
        # long prompt near the 512 edge + EOS held off -> forced escalation
        eng2 = T2SEngine(params, cfg, gpt_cache=[(1, 512), (1, 1024)],
                         dtype=dtype, attn_impl=impl,
                         initial_suppression_steps=150)
        xl = rng.randint(1, cfg.phoneme_vocab_size, 200).astype(np.int32)
        yl = rng.randint(0, cfg.vocab_size - 1, 250).astype(np.int32)
        bl = np.zeros((200, cfg.bert_dim), np.float32)
        t0 = time.time()
        toks = np.asarray(eng2.generate(xl, yl, bl, top_k=15,
                                        rng=jax.random.PRNGKey(3))).ravel()
        print(f"4. escalation 512->1024: {toks.size} tokens "
              f"(crossed={toks.size > 62}) ({time.time() - t0:.0f}s)")
        assert toks.size > 62, "generation never crossed the 512 bucket"

    if args.assets:
        from gsv_tts_tpu import TTS

        t = TTS(models_dir=args.assets)
        t.load_gpt_model(f"{args.assets}/tiny_s1.ckpt")
        t.load_sovits_model(f"{args.assets}/tiny_s2.pth")
        t0 = time.time()
        clip = t.infer(f"{args.assets}/spk.wav", f"{args.assets}/prompt.wav",
                       "hello there.", "Full facade on the real chip.")
        a = np.asarray(clip.audio_data)
        assert np.isfinite(a).all() and a.size > 0
        n = sum(1 for _ in t.infer_stream(
            f"{args.assets}/spk.wav", f"{args.assets}/prompt.wav",
            "hello there.", "Streaming on the chip works too.",
            stream_chunk=10))
        print(f"5. facade infer: {a.shape} finite; stream: {n} chunks "
              f"({time.time() - t0:.0f}s)")
        assert n >= 1

    print("SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
