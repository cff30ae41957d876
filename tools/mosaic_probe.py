#!/usr/bin/env python
"""Isolate the Mosaic pathology behind the dead 3D-reshape walk rewrite.

r3 context (PLAN.md "TRIED AND DEAD"): vectorizing the batched kernel's
per-row online-softmax bookkeeping via leading-dim-split reshapes
([B*block, H] -> [B, block, H], axis-1 reduces, [B, 1, 1] broadcast
compares) was token-exact in interpret mode and green on CPU, but the
REAL Mosaic compile crashed once ("report a JAX bug") and then hung
>17 min on retry — taking the axon tunnel relay down with it (see the
tpu-tunnel-fragility memory note).

This probe compiles each suspect construct in a MINIMAL standalone
kernel, one subprocess per variant with a hard timeout, so a single
pathological compile cannot wedge the session.  Run it on real TPU at
the START of a round (tunnel freshly established, nothing to lose):

    python tools/mosaic_probe.py            # all variants, 240 s each
    python tools/mosaic_probe.py reduce3d   # one variant

Variants:
  baseline   2D ops only (control — must pass)
  reduce3d   [B, block, H] axis-1 max/sum after a leading-dim split
  bcastcmp   [B, block, 1] iota + [B, 1, 1] broadcast compare mask
  combined   both, inside a fori_loop (the shape that hung)
"""
import functools
import subprocess
import sys

B, BLOCK, H = 4, 64, 16


def _kernel(variant, x_ref, o_ref):
    import jax
    import jax.numpy as jnp

    x = x_ref[:]  # [B*BLOCK, H] f32

    if variant == "baseline":
        o_ref[:] = jnp.max(x, axis=0, keepdims=True) + \
            jnp.sum(x, axis=0, keepdims=True)
        return

    if variant == "reduce3d":
        x3 = x.reshape(B, BLOCK, H)
        o_ref[:] = (jnp.max(x3, axis=1) + jnp.sum(x3, axis=1))[0:1]
        return

    if variant == "bcastcmp":
        idx = jax.lax.broadcasted_iota(jnp.int32, (B, BLOCK, 1), 1)
        lens = jnp.stack([jnp.int32(10), jnp.int32(20),
                          jnp.int32(30), jnp.int32(40)]).reshape(B, 1, 1)
        mask = idx < lens  # [B, BLOCK, 1]
        x3 = x.reshape(B, BLOCK, H)
        x3 = jnp.where(mask, x3, -1e9)
        o_ref[:] = jnp.sum(x3, axis=1)[0:1]
        return

    # combined: the full shape that hung, inside a fori_loop
    def body(i, acc):
        x3 = (x + acc[0, 0]).reshape(B, BLOCK, H)
        idx = jax.lax.broadcasted_iota(jnp.int32, (B, BLOCK, 1), 1)
        lens = jnp.stack([jnp.int32(10), jnp.int32(20),
                          jnp.int32(30), jnp.int32(40)]).reshape(B, 1, 1)
        x3 = jnp.where(idx < lens, jnp.exp(x3 - jnp.max(x3, axis=1,
                                                        keepdims=True)), 0.0)
        return acc + jnp.sum(x3, axis=1)[0:1]

    import jax

    o_ref[:] = jax.lax.fori_loop(0, 3, body, jnp.zeros((1, H), jnp.float32))


def run_variant(variant, interpret=False):
    import numpy as np

    import jax

    if interpret:
        # JAX_PLATFORMS=cpu env alone does NOT stick (CLAUDE.md) — and with
        # a dead tunnel the axon plugin probe hangs forever, so force it
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    x = jnp.asarray(np.random.RandomState(0).randn(B * BLOCK, H),
                    jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel, variant),
        out_shape=jax.ShapeDtypeStruct((1, H), jnp.float32),
        interpret=interpret,
    )(x)
    print(f"{variant}: OK {np.asarray(out).ravel()[:3]}")


def main():
    args = sys.argv[1:]
    interpret = "--interpret" in args  # CPU sanity mode (hides Mosaic!)
    variants = [a for a in args if not a.startswith("-")] or \
        ["baseline", "reduce3d", "bcastcmp", "combined"]
    if len(variants) == 1:
        run_variant(variants[0], interpret=interpret)
        return
    for v in variants:
        # one subprocess + hard timeout per variant: a pathological
        # compile must not wedge this process or the tunnel session
        try:
            r = subprocess.run([sys.executable, __file__, v],
                               capture_output=True, text=True, timeout=240)
            tail = (r.stdout + r.stderr).strip().splitlines()
            print(f"[{v}] rc={r.returncode}: "
                  f"{tail[-1] if tail else '(no output)'}")
        except subprocess.TimeoutExpired:
            print(f"[{v}] TIMEOUT (pathological compile) — STOP HERE, do "
                  f"not retry this variant (r3 retry killed the tunnel)")
            break


if __name__ == "__main__":
    main()
