#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: stage-1 GPT (t2s) autoregressive decode throughput on the flagship
(s1v3-class) model config — the same metric the reference publishes per GPU
(``README_EN.md:75-78``: 1122.72 tok/s RTX PRO 6000 / 886.47 H200 / 660.73
A100 / 281.06 T4).  ``vs_baseline`` is measured against the BASELINE.json
north-star target of 800 semantic tok/s/chip (RTF ≈ 0.031 for the GPT stage;
25 tok/s = realtime audio).

Methodology mirrors ``API/test_async_performance.py``: warmup pass first,
then wall-clock over a fixed decode length, B=1, 512-token KV bucket,
25-token chunks per dispatch (the streaming chunk size, ``TTS.py:301``).
"""
import argparse
import dataclasses
import functools
import json
import os
import sys
import time

import numpy as np


def bench_t2s_decode(n_tokens: int = 500, chunk: int = 25, bucket: int = 512,
                     prompt_phones: int = 60, prompt_audio: int = 75,
                     warmup_tokens: int = 50, impl: str = None):
    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.utils.timing import enable_compilation_cache
    enable_compilation_cache()

    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import (DecodeState, SampleArgs,
                                                 decode_chunk, prefill_batch)

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    dtype_name = jnp.dtype(dtype).name

    cfg = T2SConfig()  # flagship dims: 512 hidden / 24 layers / 16 heads
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    # scale the random head so sampled logits have trained-checkpoint-like
    # spread (raw init saturates top-p to ~1 token).  Throughput-neutral:
    # the per-step compute/DMA is identical for any predict_w values; only
    # which token wins changes, and decode cost is token-independent.
    params["predict_w"] = params["predict_w"] * 0.05
    sa = SampleArgs()
    rng = np.random.RandomState(0)
    B = 1
    x = jnp.asarray(rng.randint(1, cfg.phoneme_vocab_size, (B, prompt_phones)), jnp.int32)
    y = jnp.asarray(rng.randint(0, cfg.vocab_size - 1, (B, prompt_audio)), jnp.int32)
    bert = jnp.zeros((B, prompt_phones, cfg.bert_dim), jnp.float32)
    x_lens = jnp.full((B,), prompt_phones, jnp.int32)
    y_lens = jnp.full((B,), prompt_audio, jnp.int32)

    shape = (cfg.num_layers, B, bucket, cfg.num_heads, cfg.head_dim)

    def fresh_state():
        k_cache = jnp.zeros(shape, dtype)
        v_cache = jnp.zeros(shape, dtype)
        state, _ = prefill_batch(params, cfg, x, y, bert, x_lens, y_lens,
                                 k_cache, v_cache, jax.random.PRNGKey(1), sa,
                                 True, dtype_name)
        return state

    # NOTE: sync via tiny host fetches (np.asarray) — on tunneled platforms
    # block_until_ready can return before remote execution completes.

    # warmup: compile prefill + decode_chunk (and warm the device session)
    t_prefill0 = time.perf_counter()
    state = fresh_state()
    np.asarray(state.kv_len)
    compile_prefill_s = time.perf_counter() - t_prefill0

    attn_impl = impl or ("fused_step" if platform == "tpu" else "xla")
    for _ in range(max(1, warmup_tokens // chunk)):
        state, toks = decode_chunk(params, cfg, state, chunk, sa, 10, dtype_name,
                                   attn_impl)
    np.asarray(toks)

    # measured prefill (TTFT component).  Single-dispatch wall time includes
    # the tunnel RTT (tens of ms on axon), so also report an amortized
    # on-chip figure: N back-to-back prefills behind ONE host fetch.
    t0 = time.perf_counter()
    state = fresh_state()
    np.asarray(state.kv_len)
    prefill_s = time.perf_counter() - t0

    n_amort = 10
    t0 = time.perf_counter()
    for _ in range(n_amort):
        state = fresh_state()
    np.asarray(state.kv_len)
    prefill_onchip_s = (time.perf_counter() - t0) / n_amort

    # measured decode
    n_chunks = n_tokens // chunk
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, toks = decode_chunk(params, cfg, state, chunk, sa, 10, dtype_name,
                                   attn_impl)
    np.asarray(toks)
    decode_s = time.perf_counter() - t0

    decoded = n_chunks * chunk
    tok_s = decoded / decode_s
    ttft_ms = (prefill_s + (chunk / tok_s)) * 1000.0  # prefill + first 25-token chunk
    return {
        "platform": platform,
        "dtype": dtype_name,
        "tok_s": tok_s,
        "decode_ms_per_token": 1000.0 * decode_s / decoded,
        "prefill_ms": prefill_s * 1000.0,
        "prefill_onchip_ms": prefill_onchip_s * 1000.0,
        "ttft_gpt_ms": ttft_ms,
        "gpt_rtf": 25.0 / tok_s,  # 25 semantic tok = 1 s of audio
        "compile_prefill_s": compile_prefill_s,
    }


def bench_batched_decode(B: int = 4, chunk: int = 25, bucket: int = 512,
                         n_chunks: int = 16, impl: str = None):
    """Aggregate continuous-batching decode throughput (the serving
    headline): B concurrent slots through the batched whole-step kernel
    (``ops/fused_step.py:_kernel_sample_b`` — weight stream amortized over
    B), with the flash-attention + XLA-sampling path as fallback."""
    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, decode_chunk, prefill_batch

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    dtype_name = jnp.dtype(dtype).name
    cfg = T2SConfig()
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    params["predict_w"] = params["predict_w"] * 0.05
    sa = SampleArgs(use_prev=False, repetition_penalty=1.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(1, 700, (B, 64)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 1024, (B, 64)), jnp.int32)
    bert = jnp.zeros((B, 64, cfg.bert_dim), jnp.float32)
    shape = (cfg.num_layers, B, bucket, cfg.num_heads, cfg.head_dim)
    state, _ = prefill_batch(params, cfg, x, y, bert,
                             jnp.full((B,), 60, jnp.int32),
                             jnp.full((B,), 60, jnp.int32),
                             jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                             jax.random.PRNGKey(1), sa, True, dtype_name)
    if impl is None:
        impl = "fused_step" if platform == "tpu" else "xla"
    state, toks = decode_chunk(params, cfg, state, chunk, sa, 10, dtype_name, impl)
    np.asarray(toks)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, toks = decode_chunk(params, cfg, state, chunk, sa, 10, dtype_name, impl)
    np.asarray(toks)
    dt = time.perf_counter() - t0
    agg = n_chunks * chunk * B / dt
    return {"batch": B, "impl": impl, "agg_tok_s": agg,
            "streams_realtime": agg / 25.0}


def bench_batched_refill(bucket: int = 512, k: int = 3, reps: int = 8,
                         Lx: int = 64, Ly: int = 96):
    """Burst slot-refill admission: ONE ``prefill_slots`` dispatch vs the k
    sequential ``prefill_slot`` launches it replaces (the wave scheduler's
    concurrent-arrival path — each sequential launch pays a program
    dispatch plus a full weight read).  Amortized behind one host fetch
    per timing loop, flagship dims."""
    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import (SampleArgs, prefill_batch,
                                                 prefill_slot, prefill_slots)

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    dtype_name = jnp.dtype(dtype).name
    cfg = T2SConfig()
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    params["predict_w"] = params["predict_w"] * 0.05
    sa = SampleArgs(use_prev=False, repetition_penalty=1.0)
    rng = np.random.RandomState(0)
    B = 4
    x = jnp.asarray(rng.randint(1, 700, (B, Lx)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 1024, (B, Ly)), jnp.int32)
    bert = jnp.zeros((B, Lx, cfg.bert_dim), jnp.float32)
    shape = (cfg.num_layers, B, bucket, cfg.num_heads, cfg.head_dim)
    state, _ = prefill_batch(params, cfg, x, y, bert,
                             jnp.full((B,), 60, jnp.int32),
                             jnp.full((B,), 75, jnp.int32),
                             jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                             jax.random.PRNGKey(1), sa, False, dtype_name)
    xl1 = jnp.asarray(60, jnp.int32)
    yl1 = jnp.asarray(75, jnp.int32)
    slots = jnp.arange(1, 1 + k, dtype=jnp.int32)
    xlk = jnp.full((k,), 60, jnp.int32)
    ylk = jnp.full((k,), 75, jnp.int32)

    def seq(state):
        for j in range(1, 1 + k):
            state, _ = prefill_slot(params, cfg, state, j,
                                    x[:1], y[:1], bert[:1], xl1, yl1,
                                    sa, dtype_name)
        return state

    def bat(state):
        state, _ = prefill_slots(params, cfg, state, slots,
                                 x[:k], y[:k], bert[:k], xlk, ylk,
                                 sa, dtype_name)
        return state

    out = {"k": k}
    for name, fn in (("seq", seq), ("batched", bat)):
        state = fn(state)  # compile
        np.asarray(state.kv_len)
        t0 = time.perf_counter()
        for _ in range(reps):
            state = fn(state)
        np.asarray(state.kv_len)
        out[f"refill_{name}_ms"] = (time.perf_counter() - t0) / reps * 1e3
    out["speedup"] = out["refill_seq_ms"] / out["refill_batched_ms"]
    return out


def bench_breakdown(n_tokens: int = 400, chunk: int = 25, bucket: int = 512,
                    reps: int = 3, only=None):
    """B=1 plateau attribution (VERDICT r2 #4): time the whole-step kernel
    with one phase compile-time-removed per variant (``fused_step:<mode>``,
    ``ops/fused_step.py`` ablations).  The delta full-minus-variant is that
    phase's contribution to the serial critical path; if the deltas sum to
    far less than the step time, the residue is chain latency / overheads
    rather than any single phase's FLOPs or bytes."""
    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, decode_chunk, prefill_batch

    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        return {"skipped": f"breakdown needs real TPU (platform={platform})"}
    dtype = jnp.bfloat16
    dtype_name = "bfloat16"
    cfg = T2SConfig()
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    params["predict_w"] = params["predict_w"] * 0.05
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(1, cfg.phoneme_vocab_size, (1, 60)), jnp.int32)
    y = jnp.asarray(rng.randint(0, cfg.vocab_size - 1, (1, 75)), jnp.int32)
    bert = jnp.zeros((1, 60, cfg.bert_dim), jnp.float32)
    shape = (cfg.num_layers, 1, bucket, cfg.num_heads, cfg.head_dim)

    modes = [
        ("full", "fused_step", SampleArgs()),
        # sampling pipeline off (rp/top-p/top-k all compile away)
        ("no_sampling", "fused_step",
         SampleArgs(top_k=cfg.vocab_size, top_p=1.0, repetition_penalty=1.0,
                    use_prev=False)),
        ("no_walk", "fused_step:walk", SampleArgs()),
        ("no_attn_mm", "fused_step:attn_mm", SampleArgs()),
        ("no_mlp", "fused_step:mlp", SampleArgs()),
        ("no_head", "fused_step:head", SampleArgs()),
        # weight stream + walk only: every weight-consuming matmul removed
        ("stream_only", "fused_step:mm_off", SampleArgs()),
        # DMA-shape experiments (token-identical: same data, different
        # transfer shapes/priorities)
        ("w_prio0", "fused_step:wprio0", SampleArgs()),
        ("w_split2", "fused_step:wsplit", SampleArgs()),
        ("w_split4", "fused_step:wsplit4", SampleArgs()),
        # q8 reference + triple-buffered weight pages (two page DMAs in
        # flight — closes the per-layer issue/wait gap; token-identical)
        ("q8", "fused_step_q8", SampleArgs()),
        ("q8_deep3", "fused_step_q8:deep3", SampleArgs()),
    ]
    out = {}
    if only:
        modes = [m for m in modes if m[0] in only]
    for label, impl, sa in modes:
        state, _ = prefill_batch(params, cfg, x, y, bert,
                                 jnp.full((1,), 60, jnp.int32),
                                 jnp.full((1,), 75, jnp.int32),
                                 jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                                 jax.random.PRNGKey(1), sa, True, dtype_name)
        state, toks = decode_chunk(params, cfg, state, chunk, sa, 10,
                                   dtype_name, impl)
        np.asarray(toks)  # compile + sync
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_tokens // chunk):
                state, toks = decode_chunk(params, cfg, state, chunk, sa, 10,
                                           dtype_name, impl)
            np.asarray(toks)
            best = min(best, (time.perf_counter() - t0) / n_tokens)
        out[label] = best * 1e3  # ms/tok
    full = out.get("full")
    out_d = {k: {"ms_per_tok": round(v, 4),
                 **({"delta_vs_full_us": round((full - v) * 1e3, 1)}
                    if full is not None else {})}
             for k, v in out.items()}
    return out_d


def bench_shared_serving(n_clients: int = 8, bucket: int = 512):
    """Serving-shape measurement of the shared wave scheduler (VERDICT r2
    weak #3: the ~300-streams/chip claim was kernel-level only): N
    independent client threads attach to one WaveScheduler at staggered
    times — exactly the /tts/stream `shared` path minus HTTP framing —
    while a flagship-dim SoVITS chunk runs per 25 tokens per client on the
    SAME chip (the vocode work a real server interleaves with decode).
    Reports aggregate semantic tok/s across clients, per-client TTFT
    (first 25 tokens + first vocoder chunk), and realtime stream capacity."""
    import queue as _queue
    import threading

    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.models import sovits as jsv
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import T2SEngine
    from gsv_tts_tpu.runtime.wave import WaveScheduler

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    cfg = T2SConfig()
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    params["predict_w"] = params["predict_w"] * 0.05
    impl = "fused_step" if platform == "tpu" else "xla"
    eng = T2SEngine(params, cfg,
                    gpt_cache=[(1, bucket), (2, bucket), (4, bucket)],
                    dtype=dtype, attn_impl=impl)

    # flagship-dim vocoder chunk (one jit program reused by every client)
    scfg = jsv.SovitsConfig()
    sparams = jsv.init_params(jax.random.PRNGKey(1), scfg, dtype=dtype)
    srng = np.random.RandomState(0)
    text = jnp.asarray(srng.randint(0, 732, (1, 30)), jnp.int32)
    refer = jnp.asarray(srng.randn(1, scfg.spec_channels, 100).astype(np.float32), dtype)
    noise = jnp.zeros((1, scfg.inter_channels, 50), dtype)

    @jax.jit
    def vocode_chunk(codes):
        ge = jsv.get_ge(sparams, scfg, refer)
        z_p, y_mask, _, _, ge_out = jsv.decode_core(sparams, scfg, codes, text, ge, noise)
        pad = 128 - z_p.shape[-1]
        z_p = jnp.pad(z_p, [(0, 0), (0, 0), (0, pad)])
        y_mask = jnp.pad(y_mask, [(0, 0), (0, 0), (0, pad)])
        return jsv.flow_dec(sparams, scfg, z_p, y_mask, ge_out)

    rng = np.random.RandomState(0)
    prompts = []
    for i in range(n_clients):
        x = rng.randint(1, cfg.phoneme_vocab_size, 60).astype(np.int32)
        y = rng.randint(0, cfg.vocab_size - 1, 75).astype(np.int32)
        prompts.append((x, y, np.zeros((60, cfg.bert_dim), np.float32)))

    def solo_pass():
        """Single client through a fresh scheduler; returns wall TTFT
        (attach -> first 25 tokens -> first vocoder chunk fetched)."""
        sched = WaveScheduler(eng, max_batch=4)
        try:
            t0 = time.perf_counter()
            h = sched.attach(*prompts[0], top_k=15)
            got = []
            for toks, done in h:
                got.extend(int(t) for t in toks)
                if len(got) >= 25 or done:
                    break
            block = (np.asarray(got[:25], np.int32) % 1024 if len(got) >= 25
                     else np.zeros(25, np.int32))
            np.asarray(vocode_chunk(
                jnp.asarray(block.reshape(1, 1, -1)))[0, 0, :4])
            ttft = time.perf_counter() - t0
            if not h.done:
                h.cancel()
            return ttft
        finally:
            sched.close()

    def staggered_pass():
        """N staggered clients through one fresh scheduler; returns
        (rows, wall_start) — rows are (i, n_tokens, ttft, t_done)."""
        sched = WaveScheduler(eng, max_batch=4)
        out_q = _queue.Queue()
        t_start = time.perf_counter()

        def client(i):
            try:
                t0 = time.perf_counter()
                h = sched.attach(*prompts[i], top_k=15)
                toks = []
                ttft = None
                n_vocoded = 0
                for tarr, done in h:
                    toks.extend(int(t) for t in tarr)
                    while len(toks) - n_vocoded >= 25:
                        block = (np.asarray(
                            toks[n_vocoded:n_vocoded + 25], np.int32) % 1024)
                        np.asarray(vocode_chunk(
                            jnp.asarray(block.reshape(1, 1, -1)))[0, 0, :4])
                        n_vocoded += 25
                        if ttft is None:
                            ttft = time.perf_counter() - t0
                out_q.put((i, len(toks), ttft or (time.perf_counter() - t0),
                           time.perf_counter()))
            except Exception as e:  # noqa: BLE001
                out_q.put((i, 0, None, time.perf_counter()))
                print(f"# shared-serving client {i} failed: {e}",
                      file=sys.stderr)

        threads = []
        for i in range(n_clients):
            th = threading.Thread(target=client, args=(i,))
            th.start()
            threads.append(th)
            time.sleep(0.05 * (i % 4))
        for th in threads:
            th.join(timeout=900)
        sched.close()
        rows = []
        while not out_q.empty():
            rows.append(out_q.get())
        return rows, t_start

    # pass 0 compiles every wave program (B=1/2/4 decode, slot prefill,
    # growth/compaction gathers, the vocoder chunk); pass 1 is the
    # measurement — first-compile time must not read as serving latency
    solo_pass()
    staggered_pass()
    solo_ttft = solo_pass()
    rows, t_start = staggered_pass()

    total_toks = sum(r[1] for r in rows)
    t_end = max(r[3] for r in rows)
    agg = total_toks / (t_end - t_start)
    ttfts = sorted(r[2] for r in rows if r[2] is not None)
    p50 = ttfts[len(ttfts) // 2] if ttfts else float("nan")
    return {
        "n_clients": len(rows),
        "agg_tok_s": agg,
        "streams_realtime": agg / 25.0,
        "solo_ttft_ms": solo_ttft * 1e3,
        "p50_ttft_ms": p50 * 1e3,
        "max_ttft_ms": (ttfts[-1] * 1e3) if ttfts else float("nan"),
    }


def bench_saturation(ns=(8, 32, 64, 128, 256), bucket: int = 512,
                     stagger_ms: float = 20.0, tolerance_s: float = 0.10,
                     vocode: str = "batched"):
    """Wave-scheduler saturation sweep (VERDICT r3 #4): N synthetic clients
    attach straight to one WaveScheduler (no HTTP) with per-25-token vocoder
    chunks on the same chip, N sweeping past the ~200-streams/chip capacity
    estimate.  Per wave: TTFT p50/p99, realtime_frac (lead accounting at
    25 tok/s = 1 s audio per vocoded chunk), and agg stream-seconds/second —
    the knee is where agg plateaus while p99 TTFT keeps growing with N.

    ``vocode`` selects how clients' per-second chunks reach the vocoder:
      * "batched" (default, the production shape): one collector thread
        micro-batches ready chunks across clients into {1,2,4,8}-row
        programs and fetches once per group — exactly what
        ``runtime/vocoder_batch.py`` does in serving;
      * "solo": one dispatch + fetch per client per chunk (r4 measurement:
        over the tunnel this serializes at ~72 round-trips/s ⇒ the agg
        plateau reads ~14 stream-s/s and is a DISPATCH artifact, not the
        device knee);
      * "none": decode-only ablation (isolates the scheduler itself).

    Wall times include tunnel RTT when run through axon — absolute TTFTs
    read pessimistic (CLAUDE.md tunnel caveats).  r4 chip sweep
    (SATURATION_r04.json): over the tunnel the agg plateau (~12
    stream-s/s) is the DISPATCH-ROUND rate of the synchronous driver
    loop (~0.33 s wall per 4-stream-second wave round vs ~21 ms device),
    NOT the device knee — read the sweep as a scheduler-robustness +
    queueing-shape certificate (ok=N, realtime_frac 1.0 once admitted,
    TTFT ∝ N ⇒ shed via --max-streams), and take capacity from the
    device-time model (``e2e_streams_per_chip``).
    Reference counterpart: ``API/test_async_performance.py:57-110``."""
    import queue as _queue
    import threading

    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.models import sovits as jsv
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import T2SEngine
    from gsv_tts_tpu.runtime.wave import WaveScheduler

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    cfg = T2SConfig()
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    params["predict_w"] = params["predict_w"] * 0.05
    impl = "fused_step" if platform == "tpu" else "xla"
    eng = T2SEngine(params, cfg,
                    gpt_cache=[(1, bucket), (2, bucket), (4, bucket)],
                    dtype=dtype, attn_impl=impl)

    scfg = jsv.SovitsConfig()
    sparams = jsv.init_params(jax.random.PRNGKey(1), scfg, dtype=dtype)
    srng = np.random.RandomState(0)
    text = jnp.asarray(srng.randint(0, 732, (1, 30)), jnp.int32)
    refer = jnp.asarray(srng.randn(1, scfg.spec_channels, 100).astype(np.float32), dtype)
    noise = jnp.zeros((1, scfg.inter_channels, 50), dtype)

    # speaker conditioning is cached per speaker in serving — precompute once
    ge1 = jax.jit(lambda p, r: jsv.get_ge(p, scfg, r))(sparams, refer)
    from gsv_tts_tpu.runtime.vocoder_batch import _stream_batch_fused_jit
    OV = 5  # facade streaming default overlap_len

    @functools.lru_cache(maxsize=None)
    def vocode_b_fn(Bv):
        ge_b = jnp.tile(jnp.asarray(ge1, dtype), (Bv, 1, 1))
        text_b = jnp.tile(text, (Bv, 1))
        noise_b = jnp.tile(noise, (Bv, 1, 1))
        yov_b = jnp.zeros((Bv, scfg.hidden_channels, OV), dtype)
        lens = jnp.full((Bv,), 25, jnp.int32)
        tlens = jnp.full((Bv,), text.shape[-1], jnp.int32)
        vsi = jnp.zeros((Bv,), jnp.int32)
        blend = jnp.zeros((Bv,), bool)

        def f(codes):  # [Bv, 1, 25] — the PRODUCTION fused batched program
            audio, _, _ = _stream_batch_fused_jit(
                sparams, scfg, codes, lens, text_b, tlens, ge_b, noise_b,
                yov_b, vsi, blend, OV, 55)
            return audio

        return f

    rng = np.random.RandomState(0)
    max_n = max(ns)
    prompts = []
    for i in range(max_n):
        x = rng.randint(1, cfg.phoneme_vocab_size, 60).astype(np.int32)
        y = rng.randint(0, cfg.vocab_size - 1, 75).astype(np.int32)
        prompts.append((x, y, np.zeros((60, cfg.bert_dim), np.float32)))

    def run_wave(n):
        sched = WaveScheduler(eng, max_batch=4)
        out_q = _queue.Queue()
        vq = _queue.Queue()
        stop_ev = threading.Event()

        worker_err = [None]

        def vocoder_worker():
            """Cross-client vocoder micro-batching, the production shape
            (runtime/vocoder_batch.py): drain coincident chunks, pad to a
            {1,2,4,8} bucket, ONE program + ONE fetch per group.  Any
            device error kills the sweep FAST (recorded + all waiters
            released) instead of silently dying and letting every client
            block out its 300 s ev.wait per chunk."""
            while not (stop_ev.is_set() and vq.empty()):
                try:
                    group = [vq.get(timeout=0.05)]
                except _queue.Empty:
                    continue
                t_close = time.perf_counter() + 0.005
                while len(group) < 8:
                    try:
                        group.append(vq.get(timeout=max(
                            0.0, t_close - time.perf_counter())))
                    except _queue.Empty:
                        break
                try:
                    k = len(group)
                    Bv = 1 if k == 1 else (2 if k == 2 else (4 if k <= 4 else 8))
                    codes = np.stack([g[0] for g in group]
                                     + [group[-1][0]] * (Bv - k))
                    audio = vocode_b_fn(Bv)(jnp.asarray(codes.reshape(Bv, 1, -1)))
                    np.asarray(audio[:k, 0, :4])  # one fetch per group
                except Exception as exc:  # noqa: BLE001 — fail the sweep
                    worker_err[0] = exc
                    for g in group:
                        g[1].set()
                    while True:  # release everything already queued
                        try:
                            vq.get_nowait()[1].set()
                        except _queue.Empty:
                            return
                for g in group:
                    g[1].set()

        vworker = None
        if vocode == "batched":
            vworker = threading.Thread(target=vocoder_worker, daemon=True)
            vworker.start()
        t_start = time.perf_counter()

        def do_vocode(block):
            if vocode == "none":
                return
            if vocode == "solo":
                np.asarray(vocode_b_fn(1)(
                    jnp.asarray(block.reshape(1, 1, -1)))[0, 0, :4])
                return
            if worker_err[0] is not None:
                raise RuntimeError("vocoder batch worker died") \
                    from worker_err[0]
            ev = threading.Event()
            vq.put((block, ev))
            if not ev.wait(timeout=300):
                raise RuntimeError("vocoder batch worker stalled")
            if worker_err[0] is not None:
                raise RuntimeError("vocoder batch worker died") \
                    from worker_err[0]

        def client(i):
            try:
                t0 = time.perf_counter()
                h = sched.attach(*prompts[i], top_k=15)
                toks = []
                ttft = None
                t_first = None
                n_vocoded = 0
                audio_s = 0.0
                min_lead = float("inf")
                for tarr, done in h:
                    toks.extend(int(t) for t in tarr)
                    while len(toks) - n_vocoded >= 25:
                        block = (np.asarray(
                            toks[n_vocoded:n_vocoded + 25], np.int32) % 1024)
                        do_vocode(block)
                        n_vocoded += 25
                        audio_s += 1.0  # 25 semantic tok = 1 s audio
                        now = time.perf_counter()
                        if ttft is None:
                            ttft = now - t0
                            t_first = now
                        else:
                            min_lead = min(min_lead,
                                           audio_s - (now - t_first))
                if min_lead == float("inf"):
                    min_lead = 0.0
                out_q.put({"i": i, "toks": len(toks), "ttft": ttft,
                           "audio_s": audio_s, "min_lead": min_lead,
                           "t_done": time.perf_counter(), "ok": ttft is not None})
            except Exception as e:  # noqa: BLE001
                out_q.put({"i": i, "toks": 0, "ttft": None, "audio_s": 0.0,
                           "min_lead": 0.0, "t_done": time.perf_counter(),
                           "ok": False, "error": f"{type(e).__name__}: {e}"})

        threads = []
        for i in range(n):
            th = threading.Thread(target=client, args=(i,), daemon=True)
            th.start()
            threads.append(th)
            time.sleep(stagger_ms / 1000.0)
        for th in threads:
            th.join(timeout=1800)
        stop_ev.set()
        if vworker is not None:
            vworker.join(timeout=60)
        sched.close()
        rows = []
        while not out_q.empty():
            rows.append(out_q.get())
        wall = max((r["t_done"] for r in rows), default=t_start) - t_start
        ok = [r for r in rows if r["ok"]]
        from gsv_tts_tpu.utils.timing import percentile

        ttfts = [r["ttft"] for r in ok]

        def pct(q):
            p = percentile(ttfts, q)
            return round(p, 3) if p is not None else None

        rt = [r for r in ok if r["min_lead"] >= -tolerance_s]
        lead05 = percentile([r["min_lead"] for r in ok], 0.05)
        return {
            "n": n, "ok": len(ok),
            "errors": sorted({r.get("error") for r in rows
                              if r.get("error")}),
            "realtime_frac": round(len(rt) / len(ok), 3) if ok else 0.0,
            "ttft_p50_s": pct(0.5), "ttft_p99_s": pct(0.99),
            "min_lead_p05_s": round(lead05, 3) if lead05 is not None else None,
            "audio_s_total": round(sum(r["audio_s"] for r in ok), 1),
            "wave_wall_s": round(wall, 2),
            "agg_stream_s_per_s": round(sum(r["audio_s"] for r in ok) / wall, 2)
            if wall else 0.0,
        }

    # compile pass (B=1/2/4 wave programs + every vocoder bucket)
    if vocode != "none":
        for Bv in (1, 2, 4, 8):
            np.asarray(vocode_b_fn(Bv)(
                jnp.zeros((Bv, 1, 25), jnp.int32))[..., 0, :4])
    run_wave(2)
    waves = []
    for n in ns:
        w = run_wave(n)
        print(f"# saturation n={n}: ok={w['ok']} rt={w['realtime_frac']}"
              f" ttft_p50={w['ttft_p50_s']} p99={w['ttft_p99_s']}"
              f" agg={w['agg_stream_s_per_s']}", file=sys.stderr)
        waves.append(w)
    sustained = [w["n"] for w in waves
                 if w["ok"] == w["n"] and w["realtime_frac"] >= 1.0]
    return {"value": max(sustained) if sustained else 0, "waves": waves}


def bench_sharded_decode(bucket: int = 512, n_tokens: int = 250, chunk: int = 25):
    """GSPMD overhead probe (VERDICT r1 item 5): the flagship decode under a
    1×1 jax.sharding.Mesh vs the plain single-chip XLA path.  On multi-chip
    hardware the same code path runs tp>1; here it quantifies what wrapping
    the jitted step in GSPMD costs on one chip."""
    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.parallel import mesh as pmesh
    from gsv_tts_tpu.runtime.t2s_session import (SampleArgs, T2SEngine,
                                                 decode_chunk, prefill_batch)

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    dtype_name = jnp.dtype(dtype).name
    cfg = T2SConfig()
    sa = SampleArgs()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(1, cfg.phoneme_vocab_size, (1, 60)), jnp.int32)
    y = jnp.asarray(rng.randint(0, cfg.vocab_size - 1, (1, 75)), jnp.int32)
    bert = jnp.zeros((1, 60, cfg.bert_dim), jnp.float32)

    out = {}
    for label, shard in (("xla_1chip", False), ("gspmd_1x1", True)):
        params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
        params["predict_w"] = params["predict_w"] * 0.05
        eng = T2SEngine(params, cfg, gpt_cache=[(1, bucket)], dtype=dtype,
                        attn_impl="xla")
        if shard:
            eng = eng.shard(pmesh.make_mesh(1))
        k_cache, v_cache = eng._alloc_cache(1, bucket)
        state, _ = prefill_batch(eng.params, cfg, x, y, bert,
                                 jnp.full((1,), 60, jnp.int32),
                                 jnp.full((1,), 75, jnp.int32),
                                 k_cache, v_cache, jax.random.PRNGKey(1), sa,
                                 True, dtype_name)
        state, toks = decode_chunk(eng.params, cfg, state, chunk, sa, 0,
                                   dtype_name, eng.attn_impl)
        np.asarray(toks)  # compile + sync
        t0 = time.perf_counter()
        for _ in range(n_tokens // chunk):
            state, toks = decode_chunk(eng.params, cfg, state, chunk, sa, 0,
                                       dtype_name, eng.attn_impl)
        np.asarray(toks)
        out[label] = n_tokens / (time.perf_counter() - t0)
    out["gspmd_overhead_pct"] = 100.0 * (out["xla_1chip"] / out["gspmd_1x1"] - 1.0)
    return out


def bench_sovits_chunk(frames25: int = 25, n_text: int = 30, reps: int = 8):
    """Streaming vocoder chunk: enc_p + flow + HiFi-GAN for one 25-token
    (1 s) chunk at the [55]-frame bucket — the reference's CUDA-graph region
    (``models.py:406-425``)."""
    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.models import sovits as jsv

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    cfg = jsv.SovitsConfig()  # v2-class full dims
    params = jsv.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)

    rng = np.random.RandomState(0)
    codes = jnp.asarray(rng.randint(0, 1024, (1, 1, frames25)), jnp.int32)
    text = jnp.asarray(rng.randint(0, 732, (1, n_text)), jnp.int32)
    refer = jnp.asarray(rng.randn(1, cfg.spec_channels, 100).astype(np.float32), dtype)
    t50 = frames25 * 2
    bucket = 128 if t50 > 55 else 55
    noise = jnp.zeros((1, cfg.inter_channels, t50), dtype)

    @jax.jit
    def full(params, codes, text, refer, noise):
        ge = jsv.get_ge(params, cfg, refer)
        z_p, y_mask, attn, _, ge_out = jsv.decode_core(params, cfg, codes, text, ge, noise)
        pad = bucket - z_p.shape[-1]
        z_p = jnp.pad(z_p, [(0, 0), (0, 0), (0, pad)])
        y_mask = jnp.pad(y_mask, [(0, 0), (0, 0), (0, pad)])
        audio = jsv.flow_dec(params, cfg, z_p, y_mask, ge_out)
        return audio[:, :, : t50 * cfg.samples_per_frame], attn

    audio, _ = full(params, codes, text, refer, noise)
    np.asarray(audio[0, 0, :4])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        audio, _ = full(params, codes, text, refer, noise)
    np.asarray(audio[0, 0, :4])
    dt = (time.perf_counter() - t0) / reps
    audio_s = t50 / 50.0
    return {"sovits_chunk_ms": dt * 1000.0, "sovits_rtf": dt / audio_s}


def bench_vocoder_breakdown(frames25: int = 25, n_text: int = 30,
                            reps: int = 16):
    """Device-time split of the streaming vocoder chunk + flow_dec batch
    scaling — decides whether a cross-stream batched vocoder pays.

    Phases (all with ``ge`` precomputed, as the serving path caches it per
    speaker — the legacy ``bench_sovits_chunk`` re-runs ``get_ge`` per rep):
      ge      one-time speaker conditioning (MelStyleEncoder)
      core    decode_core → z_p (quantizer + MRTE + enc_p + projection)
      flow    flow_dec (flow reverse + HiFi-GAN) at the 55-frame bucket
      full    core + flow in one jitted program
      flow_bN flow_dec with a [N, ...] batch — cross-stream batching economics
    """
    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.models import sovits as jsv

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    cfg = jsv.SovitsConfig()
    params = jsv.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)

    rng = np.random.RandomState(0)
    codes = jnp.asarray(rng.randint(0, 1024, (1, 1, frames25)), jnp.int32)
    text = jnp.asarray(rng.randint(0, 732, (1, n_text)), jnp.int32)
    refer = jnp.asarray(rng.randn(1, cfg.spec_channels, 100).astype(np.float32), dtype)
    t50 = frames25 * 2
    bucket = 128 if t50 > 55 else 55
    noise = jnp.zeros((1, cfg.inter_channels, t50), dtype)

    def timeit(fn, *a, sync=lambda r: np.asarray(r).reshape(-1)[:4]):
        r = fn(*a)
        sync(r)  # compile + sync
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*a)
        sync(r)
        return (time.perf_counter() - t0) / reps * 1e3, r

    ge_fn = jax.jit(lambda p, r: jsv.get_ge(p, cfg, r))
    ms_ge, ge = timeit(ge_fn, params, refer)

    core_fn = jax.jit(lambda p, c, t, g, n: jsv.decode_core(p, cfg, c, t, g, n)[:2])
    ms_core, (z_p, y_mask) = timeit(
        core_fn, params, codes, text, ge, noise,
        sync=lambda r: np.asarray(r[0]).reshape(-1)[:4])

    pad = bucket - t50
    z_pb = jnp.pad(z_p, [(0, 0), (0, 0), (0, pad)])
    y_mb = jnp.pad(y_mask, [(0, 0), (0, 0), (0, pad)])
    flow_fn = jax.jit(lambda p, z, m, g: jsv.flow_dec(p, cfg, z, m, g))
    ms_flow, _ = timeit(flow_fn, params, z_pb, y_mb, ge)

    # split flow_dec into its two halves: flow reverse (4 coupling layers
    # of dilated-conv WN at 192ch) vs the HiFi-GAN generator (the
    # upsampling transposed-conv stack) — decides which one a conv-layout
    # or int8 pass should target
    flowrev_fn = jax.jit(
        lambda p, z, m, g: jsv.flow_reverse(p, cfg, z, m, g))
    ms_flowrev, z_rev = timeit(flowrev_fn, params, z_pb, y_mb, ge)
    gen_fn = jax.jit(lambda p, z, g: jsv.generator(p, cfg, z, g=g))
    ms_gen, _ = timeit(gen_fn, params, z_rev * y_mb, ge)

    # per-upsample-stage attribution (marginal cost of stage i = prefix
    # timing difference): which stage a conv-layout/int8 pass should hit
    gen_stage_ms = []
    prev = 0.0
    for ns in range(1, len(cfg.upsample_rates) + 1):
        fn = jax.jit(functools.partial(
            lambda p, z, g, n: jsv.generator(p, cfg, z, g=g, n_stages=n),
            n=ns))
        ms, _ = timeit(fn, params, z_rev * y_mb, ge)
        gen_stage_ms.append(round(ms - prev, 2))
        prev = ms

    @jax.jit
    def full(p, c, t, g, n):
        z, m, _, _, g_out = jsv.decode_core(p, cfg, c, t, g, n)
        z = jnp.pad(z, [(0, 0), (0, 0), (0, bucket - z.shape[-1])])
        m = jnp.pad(m, [(0, 0), (0, 0), (0, bucket - m.shape[-1])])
        a = jsv.flow_dec(p, cfg, z, m, g_out)
        return a[:, :, : t50 * cfg.samples_per_frame]
    ms_full, _ = timeit(full, params, codes, text, ge, noise)

    out = {"platform": platform, "bucket_frames": bucket,
           "conv_impl": jsv.VOCODER_CONV_IMPL,
           "ge_ms": round(ms_ge, 2), "core_ms": round(ms_core, 2),
           "flow_ms": round(ms_flow, 2),
           "flow_reverse_ms": round(ms_flowrev, 2),
           "generator_ms": round(ms_gen, 2),
           "gen_stage_marginal_ms": gen_stage_ms,
           "full_ms": round(ms_full, 2)}
    # nch control next to the production (nlc) flow path — the r3 conv
    # rewrite's win in the same tunnel window (tools/flowdec_ab.py for the
    # full sweep)
    if jsv.VOCODER_CONV_IMPL == "nlc":
        try:
            jsv.VOCODER_CONV_IMPL = "nch"
            flow_nch = jax.jit(
                lambda p, z, m, g: jsv.flow_dec(p, cfg, z, m, g))
            ms_nch, _ = timeit(flow_nch, params, z_pb, y_mb, ge)
            out["flow_nch_control_ms"] = round(ms_nch, 2)
        finally:
            jsv.VOCODER_CONV_IMPL = "nlc"
    for B in (2, 4, 8):
        zB = jnp.tile(z_pb, (B, 1, 1))
        mB = jnp.tile(y_mb, (B, 1, 1))
        gB = jnp.tile(ge, (B, 1, 1))
        ms_b, _ = timeit(flow_fn, params, zB, mB, gB)
        out[f"flow_b{B}_ms"] = round(ms_b, 2)
        out[f"flow_b{B}_per_stream_ms"] = round(ms_b / B, 2)
    return out


def bench_breakdown_b4(B: int = 4, chunk: int = 25, bucket: int = 512,
                       n_chunks: int = 12, reps: int = 3, only=None):
    """B=4 step attribution (the serving workhorse): same ablation method
    as the B=1 breakdown, on the batched whole-step kernel.  Attributes
    the ~0.5 ms/step between the packed weight stream (amortized over B),
    the strided [B, block, D] walk, the MXU chain, and the per-row VPU
    tails (sampling peels, window patches, embedding gathers)."""
    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, decode_chunk, prefill_batch

    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        return {"skipped": f"breakdown needs real TPU (platform={platform})"}
    dtype = jnp.bfloat16
    dtype_name = "bfloat16"
    cfg = T2SConfig()
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    params["predict_w"] = params["predict_w"] * 0.05
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(1, 700, (B, 64)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 1024, (B, 64)), jnp.int32)
    bert = jnp.zeros((B, 64, cfg.bert_dim), jnp.float32)
    shape = (cfg.num_layers, B, bucket, cfg.num_heads, cfg.head_dim)

    base = SampleArgs(use_prev=False, repetition_penalty=1.0)
    modes = [
        ("full", "fused_step", base),
        ("no_sampling", "fused_step",
         SampleArgs(top_k=cfg.vocab_size, top_p=1.0, repetition_penalty=1.0,
                    use_prev=False)),
        ("no_walk", "fused_step:walk", base),
        ("no_attn_mm", "fused_step:attn_mm", base),
        ("no_mlp", "fused_step:mlp", base),
        ("no_head", "fused_step:head", base),
        ("stream_only", "fused_step:mm_off", base),
        ("q8_full", "fused_step_q8", base),
        ("q8_stream_only", "fused_step_q8:mm_off", base),
        # DMA-issue-count experiments: same traffic, fewer walk DMAs
        ("wblk128", "fused_step:wblk128", base),
        ("q8_wblk128", "fused_step_q8:wblk128", base),
        ("q8_wblk256", "fused_step_q8:wblk256", base),
        # shared-max online softmax + selector-matmul segment sums (the
        # per-row VPU bookkeeping residue lever; numerics-adjacent, opt-in)
        ("shared_sm", "fused_step:shsm", base),
        ("q8_shared_sm", "fused_step_q8:shsm", base),
        ("q8_shared_sm128", "fused_step_q8:shsm128", base),
        # exact vectorized per-row softmax (r4): kills the per-row VPU
        # slice/concat loops with bit-identical numerics to "rows"
        ("vec_sm", "fused_step:vec", base),
        ("vec_sm128", "fused_step:vec128", base),
        ("q8_vec_sm", "fused_step_q8:vec", base),
        ("q8_vec_sm64", "fused_step_q8:vec64", base),
    ]
    out = {}
    if only:
        # compile-risk isolation (CLAUDE.md tunnel-fragility rule): run ONE
        # novel variant per subprocess with a hard timeout, e.g.
        #   timeout 600 python -c "from bench import bench_breakdown_b4; \
        #       print(bench_breakdown_b4(only=['shared_sm']))"
        modes = [m for m in modes if m[0] in only]
    for name, impl, sa in modes:
        try:
            best = None
            for _ in range(reps):
                st, _ = prefill_batch(params, cfg, x, y, bert,
                                      jnp.full((B,), 60, jnp.int32),
                                      jnp.full((B,), 60, jnp.int32),
                                      jnp.zeros(shape, dtype),
                                      jnp.zeros(shape, dtype),
                                      jax.random.PRNGKey(1), sa, True,
                                      dtype_name)
                st, toks = decode_chunk(params, cfg, st, chunk, sa, 10,
                                        dtype_name, impl)
                np.asarray(toks)  # compile + sync
                t0 = time.perf_counter()
                for _ in range(n_chunks):
                    st, toks = decode_chunk(params, cfg, st, chunk, sa, 10,
                                            dtype_name, impl)
                np.asarray(toks)
                dt = (time.perf_counter() - t0) / (n_chunks * chunk)
                best = dt if best is None else min(best, dt)
            out[name] = {"ms_per_step": round(best * 1e3, 4),
                         "agg_tok_s": round(B / best, 0)}
        except Exception as e:  # noqa: BLE001 — e.g. vmem OOM on a variant
            out[name] = {"error": str(e)[:200]}
    return out


def bench_vocoder_batched(frames25: int = 25, n_text: int = 30,
                          reps: int = 8, Bs=(1, 2, 4)):
    """Cross-stream batched streaming vocoder — the PRODUCTION programs of
    ``runtime/vocoder_batch.py`` (``decode_core_stream_padded_batch`` +
    bucketed ``flow_dec``) timed end to end at batch B, per-stream ms.
    This is the capacity denominator once concurrent shared-wave clients
    micro-batch their chunk vocodes (ge cached per speaker, as serving
    does)."""
    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.models import sovits as jsv
    from gsv_tts_tpu.runtime.vocoder_batch import _stream_batch_fused_jit

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    cfg = jsv.SovitsConfig()
    params = jsv.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)

    rng = np.random.RandomState(0)
    overlap = 5
    Bc = ((frames25 + 31) // 32) * 32
    Np = ((n_text + 31) // 32) * 32
    t50 = frames25 * 2
    bucket = 128 if t50 > 55 else 55

    out = {"platform": platform, "bucket_frames": bucket}
    for B in Bs:
        codes = jnp.asarray(rng.randint(0, 1024, (B, 1, Bc)), jnp.int32)
        codes_len = jnp.full((B,), frames25, jnp.int32)
        text = jnp.asarray(rng.randint(0, 732, (B, Np)), jnp.int32)
        text_len = jnp.full((B,), n_text, jnp.int32)
        ge = jnp.asarray(rng.randn(B, cfg.gin_channels, 1)
                         .astype(np.float32) * 0.1, dtype)
        noise = jnp.zeros((B, cfg.inter_channels, 2 * Bc), dtype)
        y_ov = jnp.zeros((B, cfg.hidden_channels, overlap), dtype)
        vsi = jnp.zeros((B,), jnp.int32)
        blend = jnp.zeros((B,), bool)

        def run():
            audio, attn, ov = _stream_batch_fused_jit(
                params, cfg, codes, codes_len, text, text_len, ge, noise,
                y_ov, vsi, blend, overlap, bucket)
            return audio

        audio = run()
        np.asarray(audio[0, 0, :4])  # compile + sync
        t0 = time.perf_counter()
        for _ in range(reps):
            audio = run()
        np.asarray(audio[0, 0, :4])
        ms = (time.perf_counter() - t0) / reps * 1e3
        out[f"vb{B}_ms"] = round(ms, 2)
        out[f"vb{B}_per_stream_ms"] = round(ms / B, 2)
    return out


def bench_serving_round(B: int = 4, chunk: int = 25, bucket: int = 512,
                        k_pair=(4, 16), reps: int = 3, impl: str = None,
                        n_text: int = 30):
    """MEASURE streams/chip instead of modeling it (VERDICT r4 #2).

    One serving round = one 25-token decode chunk for a B=4 wave
    (``decode_chunk``, fused kernel) + the fused batched vocoder over the
    4 fresh chunks (``_stream_batch_fused_jit`` — quantizer + MRTE + enc_p
    + flow + HiFi-GAN in one program).  K rounds are chained through a
    ``lax.scan`` inside ONE jit (the ``tools/stream_probe.py`` technique:
    the carry feeds forward, so tunnel RTT and dispatch overhead are out
    of the number), and the per-round DEVICE time is the MARGINAL rate
    between a K-long and a k-short chain: (t_K - t_k) / (K - k).

    Capacity: each round produces 1 s of audio for each of the B streams
    (25 semantic tokens @ 25 Hz), so
        streams/chip = B / round_seconds.
    The chained cache state grows kv_len by ``chunk`` per round exactly
    like a live wave; K is capped so the longest chain stays inside the
    production ``bucket``.

    MEASURE ON A QUIET HOST: a starved axon client poisons even the
    marginal rate (a CPU-saturating co-process inflated this from 15.5 to
    277 ms/round — the tunnel client needs cycles to feed the dispatch
    stream).  Quiet-box r5 reading: 15.5 ms/round → ~258 streams/chip,
    ABOVE the ~197-216 capacity model (the model adds prefill share and
    conservative vocoder grouping on top of this steady-state rate).
    """
    import jax
    import jax.numpy as jnp

    from gsv_tts_tpu.utils.timing import enable_compilation_cache
    enable_compilation_cache()

    from gsv_tts_tpu.models import sovits as jsv
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import (SampleArgs, decode_chunk,
                                                 prefill_batch)
    from gsv_tts_tpu.runtime.vocoder_batch import _stream_batch_fused_jit

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    dtype_name = jnp.dtype(dtype).name
    if impl is None:
        impl = "fused_step" if platform == "tpu" else "xla"

    cfg = T2SConfig()
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    params["predict_w"] = params["predict_w"] * 0.05
    sa = SampleArgs(use_prev=False, repetition_penalty=1.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(1, 700, (B, 64)), jnp.int32)
    y = jnp.asarray(rng.randint(0, 1024, (B, 64)), jnp.int32)
    bert = jnp.zeros((B, 64, cfg.bert_dim), jnp.float32)
    shape = (cfg.num_layers, B, bucket, cfg.num_heads, cfg.head_dim)
    state0, _ = prefill_batch(params, cfg, x, y, bert,
                              jnp.full((B,), 60, jnp.int32),
                              jnp.full((B,), 60, jnp.int32),
                              jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                              jax.random.PRNGKey(1), sa, True, dtype_name)

    scfg = jsv.SovitsConfig()  # production dims (1025-bin spec, full HiFi-GAN)
    sparams = jsv.init_params(jax.random.PRNGKey(7), scfg, dtype=dtype)
    overlap = 5
    Bc = ((chunk + 31) // 32) * 32
    Np = ((n_text + 31) // 32) * 32
    flow_bucket = 55 if 2 * chunk <= 55 else 128
    codes_len = jnp.full((B,), chunk, jnp.int32)
    text = jnp.asarray(rng.randint(0, 732, (B, Np)), jnp.int32)
    text_len = jnp.full((B,), n_text, jnp.int32)
    ge = jnp.asarray(rng.randn(B, scfg.gin_channels, 1).astype(np.float32) * 0.1,
                     dtype)
    vnoise = jnp.zeros((B, scfg.inter_channels, 2 * Bc), dtype)
    y_ov0 = jnp.zeros((B, scfg.hidden_channels, overlap), dtype)
    vsi = jnp.zeros((B,), jnp.int32)
    blend = jnp.ones((B,), bool)

    max_k = (bucket - 64 - chunk) // chunk  # keep kv_len inside the bucket
    k_lo, k_hi = min(k_pair), min(max(k_pair), max_k)
    if not 1 <= k_lo < k_hi:
        # degenerate pair (tiny bucket or k_pair) would divide by zero,
        # produce a negative marginal rate, or overrun the KV bucket
        # (pl.ds CLAMPS out-of-range window starts — silent corruption,
        # not an error)
        raise ValueError(
            f"serving-round needs k_lo < k_hi <= max_k, got k_pair="
            f"{k_pair} with max_k={max_k} (bucket={bucket}, chunk={chunk})")

    def round_body(carry, _):
        st, y_ov = carry
        st, toks = decode_chunk(params, cfg, st, chunk, sa, 0, dtype_name, impl)
        codes = jnp.clip(toks.astype(jnp.int32), 0, scfg.quantizer_bins - 1)  # [B, chunk]
        codes = jnp.pad(codes[:, None, :], [(0, 0), (0, 0), (0, Bc - chunk)])
        audio, _attn, y_ov = _stream_batch_fused_jit(
            sparams, scfg, codes, codes_len, text, text_len, ge, vnoise,
            y_ov, vsi, blend, overlap, flow_bucket)
        # tiny per-round checksum keeps the vocoder alive in the graph
        return (st, y_ov), jnp.sum(audio[:, 0, :8])

    chains = {
        k: jax.jit(lambda s, k=k: jax.lax.scan(
            round_body, (s, y_ov0), None, length=k))
        for k in (k_lo, k_hi)
    }

    times = {}
    for k, fn in chains.items():
        (st, _), sums = fn(state0)        # compile + warm
        np.asarray(sums)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            (st, _), sums = fn(state0)
            np.asarray(sums)              # host fetch = real sync on axon
            best = min(best, time.perf_counter() - t0)
        times[k] = best

    round_s = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
    return {
        "platform": platform,
        "impl": impl,
        "k_pair": [k_lo, k_hi],
        "chain_wall_s": {str(k): round(v, 4) for k, v in times.items()},
        "round_ms_measured": round(round_s * 1e3, 2),
        "streams_per_chip_measured": round(B / round_s, 1),
    }


def _guard_device_reachable(timeout_s: int = 600):
    """Fail FAST (with a recordable JSON line) instead of hanging forever
    when the TPU tunnel is dead: with a dead axon relay, jax backend init
    blocks indefinitely in C (r3 incident — see CLAUDE.md), which would
    leave the bench artifact empty.  The probe subprocess also absorbs
    the one-time ~3 min session warm-up."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        if r.returncode == 0:
            return
        err = (r.stderr or r.stdout).strip()[-200:]
    except subprocess.TimeoutExpired:
        err = f"device probe hung >{timeout_s}s (dead TPU tunnel?)"
    print(f"# DEVICE UNREACHABLE: {err}", file=sys.stderr)
    print(json.dumps({"metric": "gpt_decode_tok_s", "value": 0,
                      "unit": "tok/s", "vs_baseline": 0,
                      "extra": {"error": err}}))
    sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--skip-sovits", action="store_true")
    ap.add_argument("--skip-sharded", action="store_true",
                    help="skip the GSPMD 1x1-mesh decode overhead probe "
                         "(recorded by default so the bench artifact carries "
                         "the sharding-overhead number)")
    ap.add_argument("--sharded", action="store_true",
                    help="(kept for compatibility; the probe now runs by "
                         "default)")
    ap.add_argument("--breakdown", action="store_true",
                    help="run the B=1 plateau phase-ablation breakdown "
                         "(real TPU only) and exit")
    ap.add_argument("--breakdown-b4", action="store_true",
                    help="run the B=4 step phase-ablation breakdown "
                         "(real TPU only) and exit")
    ap.add_argument("--skip-serving", action="store_true",
                    help="skip the shared-wave serving measurement "
                         "(N staggered clients + per-client vocoder)")
    ap.add_argument("--vocoder-breakdown", action="store_true",
                    help="measure the streaming-vocoder chunk phase split "
                         "(ge/core/flow) + flow_dec batch scaling and exit")
    ap.add_argument("--saturation", action="store_true",
                    help="run the wave-scheduler saturation sweep (N "
                         "synthetic clients straight into one scheduler, "
                         "N past the capacity estimate) and exit")
    ap.add_argument("--saturation-ns", default="8,32,64,128,256",
                    help="comma list of wave sizes for --saturation")
    ap.add_argument("--saturation-vocode", default="batched",
                    choices=("batched", "solo", "none"),
                    help="vocoder path for --saturation: cross-client "
                         "micro-batched (production), per-client solo "
                         "(dispatch-bound over the tunnel), or none")
    ap.add_argument("--serving-round", action="store_true",
                    help="measure device-seconds per serving round (decode "
                         "B=4 chunk + fused batched vocoder, scan-chained "
                         "into one dispatch) and exit — the MEASURED "
                         "streams/chip, not the capacity model")
    ap.add_argument("--serving-round-impl", default=None,
                    help="attn impl for --serving-round (default: fused_step "
                         "on TPU; try fused_step_q8)")
    args = ap.parse_args()
    _guard_device_reachable()

    if args.serving_round:
        sr = bench_serving_round(impl=args.serving_round_impl)
        print(json.dumps({"metric": "serving_round_ms",
                          "value": sr["round_ms_measured"],
                          "unit": "ms device per B=4 round (1 s audio x4)",
                          "vs_baseline": 0, "extra": sr}))
        return

    if args.saturation:
        sat = bench_saturation(
            ns=tuple(int(x) for x in args.saturation_ns.split(",")),
            vocode=args.saturation_vocode)
        sat["vocode"] = args.saturation_vocode
        print(json.dumps({"metric": "serving_saturation",
                          "value": sat["value"],
                          "unit": "concurrent clients, all realtime",
                          "vs_baseline": 0, "extra": sat}))
        return

    if args.vocoder_breakdown:
        vb = bench_vocoder_breakdown()
        for k, v in vb.items():
            print(f"# {k}: {v}", file=sys.stderr)
        print(json.dumps({"metric": "vocoder_breakdown",
                          "value": vb.get("full_ms"), "unit": "ms/chunk",
                          "vs_baseline": 0, "extra": vb}))
        return

    if args.breakdown_b4:
        bd = bench_breakdown_b4()
        for k, v in bd.items():
            print(f"# {k}: {v}", file=sys.stderr)
        print(json.dumps({"metric": "b4_breakdown",
                          "value": bd.get("full", {}).get("ms_per_step")
                          if isinstance(bd.get("full"), dict) else None,
                          "unit": "ms/step", "vs_baseline": 0, "extra": bd}))
        return

    if args.breakdown:
        bd = bench_breakdown()
        for k, v in bd.items():
            print(f"# {k}: {v}", file=sys.stderr)
        print(json.dumps({"metric": "b1_breakdown", "value": bd.get(
            "full", {}).get("ms_per_tok") if isinstance(bd.get("full"), dict)
            else None, "unit": "ms/tok", "vs_baseline": 0, "extra": bd}))
        return

    extra = {}
    stats = bench_t2s_decode(n_tokens=args.tokens, chunk=args.chunk)
    chunk_ms = args.chunk * stats["decode_ms_per_token"]
    print(
        f"# platform={stats['platform']} dtype={stats['dtype']} "
        f"tok/s={stats['tok_s']:.1f} ms/tok={stats['decode_ms_per_token']:.3f} "
        f"prefill={stats['prefill_ms']:.1f}ms "
        f"(on-chip {stats['prefill_onchip_ms']:.1f}ms) "
        f"ttft(gpt)={stats['ttft_gpt_ms']:.1f}ms "
        f"gpt_rtf={stats['gpt_rtf']:.4f} compile={stats['compile_prefill_s']:.1f}s",
        file=sys.stderr)
    extra.update(
        prefill_wall_ms=round(stats["prefill_ms"], 1),
        prefill_onchip_ms=round(stats["prefill_onchip_ms"], 1),
        gpt_rtf=round(stats["gpt_rtf"], 4))
    try:
        # int8 weight-streaming decode (opt-in "fused_step_q8" /
        # TTS(quant_t2s=True)): halves the packed-weight DMA that bounds
        # the bf16 step; record both batch points next to the bf16 headline
        q1 = bench_t2s_decode(n_tokens=min(args.tokens, 400),
                              chunk=args.chunk, impl="fused_step_q8")
        q4 = bench_batched_decode(impl="fused_step_q8")
        print(f"# q8: B=1 {q1['tok_s']:.0f} tok/s "
              f"({q1['decode_ms_per_token']:.3f} ms/tok), "
              f"B=4 {q4['agg_tok_s']:.0f} agg tok/s", file=sys.stderr)
        extra.update(q8_b1_tok_s=round(q1["tok_s"], 0),
                     q8_b4_agg_tok_s=round(q4["agg_tok_s"], 0))
    except Exception as e:  # noqa: BLE001
        print(f"# q8 bench failed: {e}", file=sys.stderr)
    try:
        # int4 nibble-streaming decode (opt-in "fused_step_q4" /
        # TTS(quant_t2s="int4"), r5 VERDICT item 6): halves the q8 weight
        # DMA again; recorded next to the q8 numbers so the A/B shares the
        # bench window (tunnel variance makes cross-window deltas noisy)
        n1 = bench_t2s_decode(n_tokens=min(args.tokens, 400),
                              chunk=args.chunk, impl="fused_step_q4")
        n4 = bench_batched_decode(impl="fused_step_q4")
        print(f"# q4: B=1 {n1['tok_s']:.0f} tok/s "
              f"({n1['decode_ms_per_token']:.3f} ms/tok), "
              f"B=4 {n4['agg_tok_s']:.0f} agg tok/s", file=sys.stderr)
        extra.update(q4_b1_tok_s=round(n1["tok_s"], 0),
                     q4_b4_agg_tok_s=round(n4["agg_tok_s"], 0))
    except Exception as e:  # noqa: BLE001
        print(f"# q4 bench failed: {e}", file=sys.stderr)
    try:
        # shared-max softmax variants (":shsm"): the B=4 head-to-head and
        # the B=8 wave the q8+shared combo newly gates (rows/bf16 stop at 6)
        s4 = bench_batched_decode(impl="fused_step_q8:shsm")
        s8 = bench_batched_decode(B=8, impl="fused_step_q8:shsm")
        print(f"# q8+shared_sm: B=4 {s4['agg_tok_s']:.0f} agg tok/s, "
              f"B=8 {s8['agg_tok_s']:.0f} agg tok/s", file=sys.stderr)
        extra.update(q8_shsm_b4_agg_tok_s=round(s4["agg_tok_s"], 0),
                     q8_shsm_b8_agg_tok_s=round(s8["agg_tok_s"], 0))
    except Exception as e:  # noqa: BLE001
        print(f"# q8 shared-sm bench failed: {e}", file=sys.stderr)
    if not args.skip_sharded:
        try:
            sh = bench_sharded_decode()
            print(f"# sharded: xla_1chip={sh['xla_1chip']:.0f} tok/s, "
                  f"gspmd_1x1={sh['gspmd_1x1']:.0f} tok/s "
                  f"(GSPMD overhead {sh['gspmd_overhead_pct']:+.1f}%)",
                  file=sys.stderr)
            extra["gspmd_1x1_overhead_pct"] = round(sh["gspmd_overhead_pct"], 1)
        except Exception as e:  # noqa: BLE001
            print(f"# sharded bench failed: {e}", file=sys.stderr)
    try:
        bt = bench_batched_decode()
        print(f"# batched B={bt['batch']} [{bt['impl']}]: {bt['agg_tok_s']:.0f} "
              f"aggregate tok/s "
              f"(~{bt['streams_realtime']:.0f} concurrent realtime GPT streams)",
              file=sys.stderr)
        extra["batched_b4_agg_tok_s"] = round(bt["agg_tok_s"], 0)
    except Exception as e:  # noqa: BLE001
        print(f"# batched bench failed: {e}", file=sys.stderr)
    try:
        rf = bench_batched_refill()
        print(f"# burst refill k={rf['k']}: sequential "
              f"{rf['refill_seq_ms']:.1f}ms vs one prefill_slots dispatch "
              f"{rf['refill_batched_ms']:.1f}ms ({rf['speedup']:.2f}x)",
              file=sys.stderr)
        extra.update(refill_seq_ms=round(rf["refill_seq_ms"], 1),
                     refill_batched_ms=round(rf["refill_batched_ms"], 1))
    except Exception as e:  # noqa: BLE001
        print(f"# batched refill bench failed: {e}", file=sys.stderr)
    if not args.skip_serving:
        try:
            sv = bench_shared_serving()
            # NOTE: over the axon tunnel every 5-token wave chunk pays one
            # host round trip (tens of ms), so these wall numbers are a
            # TUNNEL-BOUND LOWER BOUND — they prove the path works under
            # concurrent load, not the chip's capacity.  A colocated host
            # pays ~0.1-0.5 ms per dispatch instead.
            print(f"# shared serving ({sv['n_clients']} staggered clients, "
                  f"wave+vocoder, TUNNEL-BOUND): {sv['agg_tok_s']:.0f} agg "
                  f"tok/s, ttft solo={sv['solo_ttft_ms']:.0f}ms "
                  f"p50={sv['p50_ttft_ms']:.0f}ms (each 5-token chunk pays "
                  f"one tunnel RTT — see CLAUDE.md)", file=sys.stderr)
            extra.update(
                served_tunnel_agg_tok_s=round(sv["agg_tok_s"], 0),
                served_tunnel_ttft_solo_ms=round(sv["solo_ttft_ms"], 0))
        except Exception as e:  # noqa: BLE001
            print(f"# shared-serving bench failed: {e}", file=sys.stderr)
    if not args.skip_sovits:
        try:
            sv = bench_sovits_chunk()
            e2e_rtf = stats["gpt_rtf"] + sv["sovits_rtf"]
            # wall TTFT includes one tunnel RTT per dispatch (tens of ms on
            # axon — pessimistic for colocated serving); the on-chip figure
            # is the honest device-time budget: amortized prefill + first
            # 25-token decode chunk + one vocoder chunk (VERDICT r2 #3)
            ttft_wall = stats["ttft_gpt_ms"] + sv["sovits_chunk_ms"]
            ttft_onchip = (stats["prefill_onchip_ms"] + chunk_ms
                           + sv["sovits_chunk_ms"])
            print(f"# sovits_chunk={sv['sovits_chunk_ms']:.1f}ms "
                  f"sovits_rtf={sv['sovits_rtf']:.4f} e2e_rtf={e2e_rtf:.4f} "
                  f"ttft_stream_wall={ttft_wall:.1f}ms "
                  f"ttft_onchip={ttft_onchip:.1f}ms "
                  f"(targets: rtf<=0.1, ttft<=130ms)",
                  file=sys.stderr)
            extra.update(
                sovits_chunk_ms=round(sv["sovits_chunk_ms"], 1),
                e2e_rtf=round(e2e_rtf, 4),
                ttft_stream_wall_ms=round(ttft_wall, 1),
                ttft_onchip_ms=round(ttft_onchip, 1))
            # end-to-end realtime stream capacity from measured DEVICE
            # times: each realtime stream consumes 25 tokens/s of B=4-wave
            # decode (25/agg device-seconds) plus one vocoder chunk/s
            if "batched_b4_agg_tok_s" in extra:
                per_stream_s = (25.0 / extra["batched_b4_agg_tok_s"]
                                + sv["sovits_chunk_ms"] / 1e3)
                cap = 1.0 / per_stream_s
                print(f"# e2e stream capacity (decode@B=4 + solo vocoder, "
                      f"device-time): ~{cap:.0f} realtime streams/chip "
                      f"({per_stream_s * 1e3:.1f} ms device per "
                      f"stream-second)", file=sys.stderr)
                extra["e2e_streams_per_chip"] = round(cap, 0)
                try:
                    vb = bench_vocoder_batched(Bs=(1, 4))
                    per_b = vb["vb4_per_stream_ms"]
                    per_stream_b = (25.0 / extra["batched_b4_agg_tok_s"]
                                    + per_b / 1e3)
                    cap_b = 1.0 / per_stream_b
                    print(f"# e2e stream capacity (decode@B=4 + BATCHED "
                          f"vocoder {per_b:.1f}ms/stream vs solo-padded "
                          f"{vb['vb1_ms']:.1f}ms): ~{cap_b:.0f} realtime "
                          f"streams/chip", file=sys.stderr)
                    extra.update(
                        vocoder_b4_per_stream_ms=per_b,
                        vocoder_b1_ms=vb["vb1_ms"],
                        e2e_streams_per_chip_batched_vocoder=round(cap_b, 0))
                    # honest serving budget: each stream also re-prefills
                    # once per utterance — charge the amortized on-chip
                    # prefill against a 10 s utterance
                    per_pf = (per_stream_b
                              + stats["prefill_onchip_ms"] / 1e3 / 10.0)
                    print(f"# e2e stream capacity incl. prefill (10 s "
                          f"utterances, {stats['prefill_onchip_ms']:.1f}ms "
                          f"on-chip prefill each): ~{1.0 / per_pf:.0f} "
                          f"realtime streams/chip", file=sys.stderr)
                    extra["e2e_streams_per_chip_incl_prefill_10s"] = \
                        round(1.0 / per_pf, 0)
                    if "q8_b4_agg_tok_s" in extra:
                        per_q8 = (25.0 / extra["q8_b4_agg_tok_s"]
                                  + per_b / 1e3)
                        cap_q8 = 1.0 / per_q8
                        print(f"# e2e stream capacity (q8 decode@B=4 + "
                              f"BATCHED vocoder): ~{cap_q8:.0f} realtime "
                              f"streams/chip", file=sys.stderr)
                        extra["e2e_streams_per_chip_q8"] = round(cap_q8, 0)
                except Exception as e:  # noqa: BLE001
                    print(f"# batched vocoder bench failed: {e}",
                          file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# sovits bench failed: {e}", file=sys.stderr)
    # MEASURED capacity (VERDICT r4 #2): K serving rounds scan-chained into
    # one dispatch, marginal device time per round.  A novel compiled chain
    # (nested scan over the fused kernel + vocoder program) runs in its own
    # subprocess with a hard timeout — a pathological Mosaic compile must
    # not take the whole bench (or the tunnel relay) down with it.
    try:
        import subprocess
        variants = [("", None)]
        if extra.get("q8_b1_tok_s"):
            variants.append(("_q8", "fused_step_q8"))
        for suffix, sr_impl in variants:
            cmd = [sys.executable, os.path.abspath(__file__), "--serving-round"]
            if sr_impl:
                cmd += ["--serving-round-impl", sr_impl]
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=1500)
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")]
            if line:
                sr = json.loads(line[-1])["extra"]
                extra[f"serving_round_ms_measured{suffix}"] = \
                    sr["round_ms_measured"]
                extra[f"e2e_streams_per_chip_measured{suffix}"] = \
                    sr["streams_per_chip_measured"]
                print(f"# MEASURED serving round{suffix or ' (bf16)'}: "
                      f"{sr['round_ms_measured']:.1f} ms device per B=4 "
                      f"round -> ~{sr['streams_per_chip_measured']:.0f} "
                      f"realtime streams/chip (chained, tunnel-free)",
                      file=sys.stderr)
            else:
                print(f"# serving-round probe{suffix} produced no JSON "
                      f"(rc={r.returncode}): {r.stderr[-300:]}",
                      file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"# serving-round probe failed: {e}", file=sys.stderr)
    # Real-checkpoint gauntlet (VERDICT r4 #5): if someone has staged the
    # released s1v3/s2Gv2ProPlus assets (see CHECKPOINT_VERIFY.json's
    # staging_manifest), run the full mel-parity + q8-quality verification
    # unprompted and record it in the bench artifact.
    try:
        import subprocess

        from verify_checkpoints import find_staged_assets
        staged = find_staged_assets("s1v3.ckpt", "s2Gv2ProPlus.pth")
        if staged:
            print(f"# real checkpoints staged in {staged}: running the "
                  f"mel-parity gauntlet", file=sys.stderr)
            cmd = [sys.executable,
                   os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "verify_checkpoints.py"),
                   "--models-dir", staged, "--quant"]
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=3600)
            tail = [ln for ln in r.stdout.strip().splitlines()][-6:]
            extra["real_checkpoint_gauntlet"] = {
                "rc": r.returncode, "models_dir": staged, "tail": tail}
            for ln in tail:
                print(f"# gauntlet: {ln}", file=sys.stderr)
        else:
            extra["real_checkpoint_gauntlet"] = "not staged (see CHECKPOINT_VERIFY.json staging_manifest)"
    except Exception as e:  # noqa: BLE001
        print(f"# real-checkpoint gauntlet failed: {e}", file=sys.stderr)
    print(json.dumps({
        "metric": "gpt_decode_tok_s",
        "value": round(stats["tok_s"], 2),
        "unit": "tok/s",
        "vs_baseline": round(stats["tok_s"] / 800.0, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
