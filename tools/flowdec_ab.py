#!/usr/bin/env python
"""A/B the flow_dec conv formulations on real TPU: "nch" (the original
lax.conv_general_dilated path) vs "nlc" (channels-last tap-unrolled
matmuls + polyphase upsamples).  One impl per run when --impl is given —
use bounded subprocesses for novel compiles (CLAUDE.md tunnel rule):

    timeout 600 python tools/flowdec_ab.py --impl nlc
    timeout 600 python tools/flowdec_ab.py --impl nch
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", choices=["nch", "nlc", "both"], default="both")
    ap.add_argument("--bucket", type=int, default=55)
    ap.add_argument("--bs", type=int, nargs="*", default=[1, 4, 8])
    ap.add_argument("--reps", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gsv_tts_tpu.models import sovits as jsv
    from gsv_tts_tpu.utils.timing import enable_compilation_cache

    enable_compilation_cache()
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    cfg = jsv.SovitsConfig()
    params = jsv.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    T = args.bucket

    impls = [args.impl] if args.impl != "both" else ["nch", "nlc"]
    out = {}
    for impl in impls:
        jsv.VOCODER_CONV_IMPL = impl
        fn = jax.jit(lambda p, z, m, g: jsv.flow_dec(p, cfg, z, m, g))
        for B in args.bs:
            z = jnp.asarray(rng.randn(B, cfg.inter_channels, T)
                            .astype(np.float32), dtype)
            m = jnp.ones((B, 1, T), dtype)
            ge = jnp.asarray(rng.randn(B, cfg.gin_channels, 1)
                             .astype(np.float32) * 0.1, dtype)
            a = fn(params, z, m, ge)
            np.asarray(a[0, 0, :4])  # compile + sync
            t0 = time.perf_counter()
            for _ in range(args.reps):
                a = fn(params, z, m, ge)
            np.asarray(a[0, 0, :4])
            ms = (time.perf_counter() - t0) / args.reps * 1e3
            out[f"{impl}_b{B}_ms"] = round(ms, 2)
            out[f"{impl}_b{B}_per_stream_ms"] = round(ms / B, 2)
            print(f"{impl} B={B} T={T}: {ms:.2f} ms ({ms / B:.2f}/stream)",
                  flush=True)
        jax.clear_caches()
    print(out)


if __name__ == "__main__":
    main()
