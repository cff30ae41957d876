#!/usr/bin/env python
"""Isolate where the chained serving-round time goes (bench.py
--serving-round measured ~277 ms/round vs the ~21-25 ms component model).

Chains K rounds of each VARIANT into one jit+scan dispatch and reports the
marginal ms/round between a short and long chain:
  decode   - decode_chunk B=4 only (carry = decode state)
  vocoder  - _stream_batch_fused_jit only (fixed codes, carry = y_ov)
  full     - decode + vocoder (the bench composition)

Run on the chip:  python tools/round_isolate.py [k_lo k_hi]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    k_lo, k_hi = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (2, 6)
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
    impl = "fused_step" if platform == "tpu" else "xla"
    B, chunk, bucket, n_text = 4, 25, 512, 30

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

    scfg = jsv.SovitsConfig()
    sparams = jsv.init_params(jax.random.PRNGKey(7), scfg, dtype=dtype)
    overlap = 5
    Bc = ((chunk + 31) // 32) * 32
    Np = ((n_text + 31) // 32) * 32
    flow_bucket = 55
    codes_len = jnp.full((B,), chunk, jnp.int32)
    text = jnp.asarray(rng.randint(0, 732, (B, Np)), jnp.int32)
    text_len = jnp.full((B,), n_text, jnp.int32)
    ge = jnp.asarray(rng.randn(B, scfg.gin_channels, 1).astype(np.float32) * 0.1,
                     dtype)
    vnoise = jnp.zeros((B, scfg.inter_channels, 2 * Bc), dtype)
    y_ov0 = jnp.zeros((B, scfg.hidden_channels, overlap), dtype)
    vsi = jnp.zeros((B,), jnp.int32)
    blend = jnp.ones((B,), bool)
    codes_fixed = jnp.asarray(rng.randint(0, scfg.quantizer_bins,
                                          (B, 1, Bc)), jnp.int32)

    def dec_body(carry, _):
        st = carry
        st, toks = decode_chunk(params, cfg, st, chunk, sa, 0, dtype_name, impl)
        return st, jnp.sum(toks)

    def voc_body(carry, _):
        y_ov = carry
        audio, _a, y_ov = _stream_batch_fused_jit(
            sparams, scfg, codes_fixed, codes_len, text, text_len, ge,
            vnoise, y_ov, vsi, blend, overlap, flow_bucket)
        return y_ov, jnp.sum(audio[:, 0, :8])

    def full_body(carry, _):
        st, y_ov = carry
        st, toks = decode_chunk(params, cfg, st, chunk, sa, 0, dtype_name, impl)
        codes = jnp.clip(toks.astype(jnp.int32), 0, scfg.quantizer_bins - 1)
        codes = jnp.pad(codes[:, None, :], [(0, 0), (0, 0), (0, Bc - chunk)])
        audio, _a, y_ov = _stream_batch_fused_jit(
            sparams, scfg, codes, codes_len, text, text_len, ge, vnoise,
            y_ov, vsi, blend, overlap, flow_bucket)
        return (st, y_ov), jnp.sum(audio[:, 0, :8])

    variants = {
        "decode": (dec_body, lambda: state0),
        "vocoder": (voc_body, lambda: y_ov0),
        "full": (full_body, lambda: (state0, y_ov0)),
    }
    for name, (body, init) in variants.items():
        times = {}
        for k in (k_lo, k_hi):
            fn = jax.jit(lambda c, k=k, body=body: jax.lax.scan(
                body, c, None, length=k))
            t_c0 = time.perf_counter()
            out = fn(init())
            np.asarray(jax.tree.leaves(out)[-1])
            compile_s = time.perf_counter() - t_c0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(init())
                np.asarray(jax.tree.leaves(out)[-1])
                best = min(best, time.perf_counter() - t0)
            times[k] = best
            print(f"{name} k={k}: wall {best:.4f}s (compile {compile_s:.1f}s)",
                  flush=True)
        marg = (times[k_hi] - times[k_lo]) / (k_hi - k_lo) * 1e3
        print(f"{name}: marginal {marg:.2f} ms/round", flush=True)


if __name__ == "__main__":
    main()
