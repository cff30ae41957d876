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
  3. continuous batching with N=7 > B=4 — forces the ``prefill_slot``
     refill program (r2 verdict: the refill path had never run on chip)
  4. bucket escalation 512 -> 1024 mid-generation (B=1)
  5. BATCHED escalation: B=4 wave crosses 512 -> 1024 (EOS-suppressed
     logits force every row past the bucket edge)
  6. tail compaction: mixed prompt lengths + no refills left -> the wave
     re-packs B=4 -> B=2 mid-decode (``_gather_slots`` on chip)
  7. shared-wave scheduler: 6 staggered attaches over max_batch=4 —
     drives slot refill, wave growth/compaction, and the driver thread
     against the real chip
  8. (with --assets DIR) the full TTS facade incl. featurizers:
     ``infer`` + ``infer_stream`` + ``infer_batched_stream`` with N>B
     + two concurrent ``stream_shared`` clients on tiny checkpoints

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
    ap.add_argument("--only-facade", action="store_true",
                    help="run only the --assets facade drives (steps 8a-8c)")
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

    if args.only_facade:
        if not args.assets:
            print("--only-facade requires --assets")
            return 2
        return run_facade(args)

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

    # 1b. int8 weight-streaming variant (fused_step_q8 / quant_t2s=True):
    # the q8 kernel has its own Mosaic lowering (int8 VMEM pages, per-lane
    # scale stream, i8->bf16 converts) — drive both B=1 and B=4 programs
    if platform == "tpu":
        eng_q = T2SEngine(params, cfg, gpt_cache=[(1, 512), (4, 512)],
                          dtype=dtype, attn_impl="fused_step_q8")
        t0 = time.time()
        toks_q = np.asarray(eng_q.generate(x, y, bert, top_k=15,
                                           rng=jax.random.PRNGKey(7))).ravel()
        xs_q = [rng.randint(1, cfg.phoneme_vocab_size, n).astype(np.int32)
                for n in (60, 50, 40, 30)]
        ys_q = [rng.randint(0, cfg.vocab_size - 1, n).astype(np.int32)
                for n in (70, 60, 50, 40)]
        bs_q = [np.zeros((len(xi), cfg.bert_dim), np.float32) for xi in xs_q]
        outs_q, _ = eng_q.generate_batched(xs_q, ys_q, bs_q, top_k=15,
                                           rng=jax.random.PRNGKey(9))
        sizes_q = [np.asarray(o).size for o in outs_q]
        print(f"1b. q8 generate B=1: {toks_q.size} tokens, B=4: {sizes_q} "
              f"({time.time() - t0:.0f}s)")
        assert toks_q.size >= 1 and (toks_q < cfg.vocab_size).all()
        assert all(s >= 1 for s in sizes_q)
        del eng_q

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

    # N=7 > B=4: at least 3 finished slots must be refilled via the
    # prefill_slot program (never chip-driven before r3 — VERDICT r2 #2)
    t0 = time.time()
    eng.refills = 0
    xs7 = [rng.randint(1, cfg.phoneme_vocab_size,
                       40 + 5 * i).astype(np.int32) for i in range(7)]
    ys7 = [rng.randint(0, cfg.vocab_size - 1,
                       50 + 4 * i).astype(np.int32) for i in range(7)]
    bs7 = [np.zeros((len(xi), cfg.bert_dim), np.float32) for xi in xs7]
    outs, idx = eng.generate_batched(xs7, ys7, bs7, top_k=15,
                                     rng=jax.random.PRNGKey(9))
    sizes = [np.asarray(o).size for o in outs]
    print(f"3. generate_batched N=7>B=4: {sizes} refills={eng.refills} "
          f"compactions={eng.compactions} ({time.time() - t0:.0f}s)")
    assert len(outs) == 7 and all(s >= 1 for s in sizes)
    assert eng.refills >= 2, "slot refill never ran on the chip"

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

        # 5. BATCHED escalation: EOS-suppressed logits force every B=4 row
        # past the 512 edge (VERDICT r2 #2: batched escalation never
        # chip-driven).  Batched mode has no suppression window, so pin the
        # EOS weight COLUMN to zero: the EOS logit becomes exactly 0 —
        # median of the ~N(0, s) logit spread — and the top_k=15-of-1025
        # filter then never lets it win.  (A large negative column does
        # NOT work: logits are h @ W, so the sign flips with h.)
        params_noeos = dict(params)
        params_noeos["predict_w"] = params["predict_w"].at[:, cfg.eos].set(0.0)
        eng3 = T2SEngine(params_noeos, cfg, gpt_cache=[(4, 512), (4, 1024)],
                         dtype=dtype, attn_impl=impl)
        xe = rng.randint(1, cfg.phoneme_vocab_size, 200).astype(np.int32)
        ye = rng.randint(0, cfg.vocab_size - 1, 250).astype(np.int32)
        be = np.zeros((200, cfg.bert_dim), np.float32)
        t0 = time.time()
        outs, _ = eng3.generate_batched([xe] * 4, [ye] * 4, [be] * 4,
                                        top_k=15, rng=jax.random.PRNGKey(4))
        sizes = [np.asarray(o).size for o in outs]
        print(f"5. batched escalation 512->1024 B=4: {sizes} "
              f"({time.time() - t0:.0f}s)")
        assert all(s > 62 for s in sizes), \
            f"batched wave never crossed the 512 bucket: {sizes}"

        # 6. tail compaction on chip: two 450-prompt rows cap out early,
        # two 60-prompt rows keep decoding -> live=2 <= B//2 -> the wave
        # re-packs into the (2, 512) bucket via _gather_slots
        eng4 = T2SEngine(params_noeos, cfg, gpt_cache=[(2, 512), (4, 512)],
                         dtype=dtype, attn_impl=impl)
        xs_mix = [rng.randint(1, cfg.phoneme_vocab_size, n).astype(np.int32)
                  for n in (220, 220, 40, 40)]
        ys_mix = [rng.randint(0, cfg.vocab_size - 1, n).astype(np.int32)
                  for n in (230, 230, 20, 20)]
        bs_mix = [np.zeros((len(xi), cfg.bert_dim), np.float32)
                  for xi in xs_mix]
        t0 = time.time()
        outs, _ = eng4.generate_batched(xs_mix, ys_mix, bs_mix, top_k=15,
                                        rng=jax.random.PRNGKey(5))
        sizes = [np.asarray(o).size for o in outs]
        print(f"6. tail compaction B=4->B=2: {sizes} "
              f"compactions={eng4.compactions} ({time.time() - t0:.0f}s)")
        assert eng4.compactions >= 1, "compaction never triggered on chip"
        assert all(s >= 1 for s in sizes)

    # 7. shared-wave scheduler: staggered independent clients on the chip
    from gsv_tts_tpu.runtime.wave import WaveScheduler

    eng5 = T2SEngine(params, cfg, gpt_cache=[(1, 512), (2, 512), (4, 512)],
                     dtype=dtype, attn_impl=impl)
    sched = WaveScheduler(eng5, max_batch=4)
    t0 = time.time()
    seen = {"refills": 0, "batched_refills": 0, "resizes": 0,
            "attached": 0, "live": 0}

    def snap():
        for w in sched.stats["waves"]:
            for k in seen:
                seen[k] = max(seen[k], w[k] if k in w else 0)

    try:
        handles = [sched.attach(xs7[0], ys7[0], bs7[0], top_k=15)]
        handles[0].get(timeout=600.0)  # first chunk before the others join
        handles += [sched.attach(xs7[i], ys7[i], bs7[i], top_k=15)
                    for i in range(1, 6)]
        counts = []
        for h in handles:
            n = 0
            for toks, done in h:
                n += toks.size
                snap()
            counts.append(n)
    finally:
        sched.close()
    print(f"7. shared wave 6 staggered clients: {counts} seen={seen} "
          f"({time.time() - t0:.0f}s)")
    assert len(counts) == 6
    assert seen["refills"] + seen["resizes"] >= 1, \
        f"no wave sharing on chip: {seen}"

    # 7b. batched slot refill program (prefill_slots) — deterministic
    # drive (step 7's burst usually batches too, but EOS timing on a
    # random model can admit one-at-a-time): freeze 3 of 4 slots, refill
    # them in ONE dispatch, then decode a chunk over the mixed wave
    from gsv_tts_tpu.runtime.t2s_session import (SampleArgs, prefill_batch,
                                                 prefill_slots)
    t0 = time.time()
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)
    kc, vc = eng5._alloc_cache(4, 512)
    xp, yp, bp = eng5._pad_prompt(xs7[0], ys7[0], bs7[0])
    state, _ = prefill_batch(
        params, cfg, jnp.asarray(np.tile(xp, (4, 1))),
        jnp.asarray(np.tile(yp, (4, 1))), jnp.asarray(np.tile(bp, (4, 1, 1))),
        jnp.asarray(np.full(4, len(xs7[0]), np.int32)),
        jnp.asarray(np.full(4, len(ys7[0]), np.int32)), kc, vc,
        jax.random.PRNGKey(9), sa, False, eng5._dtype_name(), eng5.attn_impl)
    k = 3
    Lx = max(len(xs7[i]) for i in (1, 2, 3))
    Lx = -(-Lx // 32) * 32
    Ly = -(-max(len(ys7[i]) for i in (1, 2, 3)) // 32) * 32
    xr = np.zeros((k, Lx), np.int32)
    yr = np.zeros((k, Ly), np.int32)
    br = np.zeros((k, Lx, cfg.bert_dim), np.float32)
    xl = np.zeros((k,), np.int32)
    yl = np.zeros((k,), np.int32)
    for n, i in enumerate((1, 2, 3)):
        xr[n, :len(xs7[i])] = xs7[i]
        yr[n, :len(ys7[i])] = ys7[i]
        br[n, :len(xs7[i])] = bs7[i]
        xl[n], yl[n] = len(xs7[i]), len(ys7[i])
    state, toks = prefill_slots(
        params, cfg, state, jnp.asarray([1, 2, 3], jnp.int32),
        jnp.asarray(xr), jnp.asarray(yr), jnp.asarray(br),
        jnp.asarray(xl), jnp.asarray(yl), sa,
        eng5._dtype_name(), eng5.attn_impl)
    from gsv_tts_tpu.runtime.t2s_session import decode_chunk
    state, chunk = decode_chunk(params, cfg, state, 5, sa, 0,
                                eng5._dtype_name(), eng5.attn_impl)
    chunk = np.asarray(chunk)
    kvn = np.asarray(state.kv_len)
    print(f"7b. batched refill k=3 + decode: first_toks={np.asarray(toks)} "
          f"kv={kvn.tolist()} ({time.time() - t0:.0f}s)")
    assert chunk.shape == (4, 5) and (kvn > 0).all()  # [B, n_steps]

    if args.assets:
        rc = run_facade(args)
        if rc:
            return rc

    print("SMOKE OK")
    return 0


def run_facade(args) -> int:
    """Facade drives (8a-8c) on tiny checkpoints.  Bucket config is chosen
    to bound tunnel compile count: small GPT buckets cap the (random-model)
    token counts, and the SoVITS frame ladder catches the cumulative
    25-token vocode lengths so chunked streaming reuses ~4 flow shapes
    instead of compiling one per length."""
    import numpy as np

    import time as _t

    from gsv_tts_tpu import TTS

    t = TTS(models_dir=args.assets,
            gpt_cache=[(1, 128), (1, 256), (4, 128), (4, 256)],
            sovits_cache=[50, 55, 128, 256, 512])
    t.load_gpt_model(f"{args.assets}/tiny_s1.ckpt")
    t.load_sovits_model(f"{args.assets}/tiny_s2.pth")
    spk, prm = f"{args.assets}/spk.wav", f"{args.assets}/prompt.wav"
    t0 = _t.time()
    clip = t.infer(spk, prm, "hello there.",
                   "Full facade on the real chip.")
    a = np.asarray(clip.audio_data)
    assert np.isfinite(a).all() and a.size > 0
    n = sum(1 for _ in t.infer_stream(
        spk, prm, "hello there.", "Streaming on the chip works too.",
        stream_chunk=25))
    print(f"8a. facade infer: {a.shape} finite; stream: {n} chunks "
          f"({_t.time() - t0:.0f}s)")
    assert n >= 1

    # N=6 texts > B=4: facade streaming continuous batching with slot
    # refill + per-request subtitles
    t0 = _t.time()
    eng_gpt = t.gpt_models[f"{args.assets}/tiny_s1.ckpt"].engine
    eng_gpt.refills = 0
    done_idx = set()
    n_ev = 0
    for oi, c, done in t.infer_batched_stream(
            spk, prm, "hello there.",
            [f"batched stream request number {i}." for i in range(6)],
            stream_chunk=25, return_subtitles=True):
        n_ev += 1
        assert np.isfinite(np.asarray(c.audio_data)).all()
        if done:
            done_idx.add(oi)
    print(f"8b. facade batched stream N=6: {n_ev} events "
          f"refills={eng_gpt.refills} ({_t.time() - t0:.0f}s)")
    assert done_idx == set(range(6))
    assert eng_gpt.refills >= 2

    # two concurrent shared-wave streaming clients
    import threading

    t0 = _t.time()
    results = [None, None]

    def shared_client(i):
        results[i] = sum(len(c.audio_data) for c in t.stream_shared(
            spk, prm, "hello there.",
            f"shared wave client number {i} is talking.",
            stream_chunk=25, debug=False))

    ths = [threading.Thread(target=shared_client, args=(i,))
           for i in range(2)]
    ths[0].start()
    _t.sleep(0.5)
    ths[1].start()
    for th in ths:
        th.join(timeout=900)
    vb = t.vocoder_batch_stats()
    print(f"8c. facade shared streams x2: {results} samples "
          f"vocoder_batcher={vb} ({_t.time() - t0:.0f}s)")
    assert all(r and r > 0 for r in results)
    # every shared-stream chunk must route through the micro-batcher
    # (grouping itself is timing-dependent — rows is the hard assert,
    # max_group the recorded evidence)
    assert vb.get("rows", 0) >= 2, vb
    print("FACADE SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
