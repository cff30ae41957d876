#!/usr/bin/env python
"""Per-layer weight-streaming overhead: in-kernel fori double-buffer vs a
grid-dimension pipelined loop (VERDICT r3 #2 hypothesis (c)).

The fixed per-step residue in the fused decode kernels (~0.18 ms/step B=1,
~0.41 B=4; bench.py --breakdown-b4, r3) is insensitive to every single-phase
ablation; the surviving suspect is the per-layer DMA-issue/semaphore-wait
machinery the in-kernel ``fori_loop`` double-buffer runs on the scalar core.
This probe measures EXACTLY that machinery in isolation, at flagship page
dims ([24, 512, 6144] bf16 = 6.29 MiB/page, 151 MiB total), with trivial
per-page compute:

  fori    the production pattern — ANY-space input, VMEM(2, D, W) scratch,
          make_async_copy + semaphore waits, layer fori_loop in the kernel
  grid    grid=(L,), BlockSpec (1, D, W) — Mosaic's own pipeline machinery
          issues/overlaps the HBM→VMEM copies; accumulator in scratch
  xla     jnp baseline: one einsum touching every page once (what XLA does
          with the same traffic, no Pallas at all)

If ``grid`` beats ``fori`` by ≳10% of step time, a grid-loop rewrite of the
fused kernels pays; if they match, the residue is NOT the hand-rolled DMA
machinery and hypothesis (c) closes.  One subprocess per variant with a
hard timeout (tunnel-fragility rule — never retry a hung compile inline).

    python tools/stream_probe.py          # all variants on the real chip
    python tools/stream_probe.py fori     # one variant
"""
import subprocess
import sys

L, D, W = 24, 512, 6144
REPS = 50


def _run_variant(variant: str) -> None:
    import time

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(L, D, W).astype(np.float32) * 0.02, dtype)
    x = jnp.asarray(rng.randn(1, D).astype(np.float32) * 0.1, dtype)

    if variant == "fori":
        def kernel(x_ref, w_hbm, o_ref, w_all, w_sem):
            def start(layer, slot):
                pltpu.make_async_copy(w_hbm.at[layer], w_all.at[slot],
                                      w_sem.at[slot]).start(priority=1)

            def wait(slot):
                pltpu.make_async_copy(w_hbm.at[0], w_all.at[0],
                                      w_sem.at[slot]).wait()

            start(0, 0)
            xv = x_ref[:].astype(jnp.float32)

            def body(layer, acc):
                slot = jax.lax.rem(layer, 2)
                nxt = jax.lax.rem(layer + 1, 2)

                @pl.when(layer + 1 < L)
                def _():
                    start(layer + 1, nxt)

                wait(slot)
                # one tiny matmul per page (forces the wait; ~2 us MXU)
                return acc + jnp.dot(xv, w_all[slot][:, :128].astype(
                    jnp.float32), preferred_element_type=jnp.float32)

            o_ref[:] = jax.lax.fori_loop(0, L, body,
                                         jnp.zeros((1, 128), jnp.float32))

        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, D, W), dtype),
                            pltpu.SemaphoreType.DMA((2,))],
        )
        run = jax.jit(lambda x, w: fn(x, w))
    elif variant == "grid":
        def kernel(x_ref, w_ref, o_ref, acc):
            layer = pl.program_id(0)

            @pl.when(layer == 0)
            def _():
                acc[:] = jnp.zeros_like(acc)

            xv = x_ref[:].astype(jnp.float32)
            acc[:] += jnp.dot(xv, w_ref[0][:, :128].astype(jnp.float32),
                              preferred_element_type=jnp.float32)

            @pl.when(layer == L - 1)
            def _():
                o_ref[:] = acc[:]

        fn = pl.pallas_call(
            kernel,
            grid=(L,),
            in_specs=[pl.BlockSpec((1, D), lambda i: (0, 0)),
                      pl.BlockSpec((1, D, W), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        )
        run = jax.jit(lambda x, w: fn(x, w))
    elif variant == "xla":
        def run_(x, w):
            # reduce over ALL W columns so XLA cannot narrow the weight
            # read to a slice — the full 151 MiB must stream
            full = jnp.einsum("bd,ldw->bw", x.astype(jnp.float32),
                              w.astype(jnp.float32))
            return full.reshape(1, W // 128, 128).sum(axis=1)

        run = jax.jit(run_)
    else:
        raise SystemExit(f"unknown variant {variant}")

    out = run(x, w)
    np.asarray(out)  # sync (block_until_ready can return early over axon)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = run(x, w)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    bw = (L * D * W * 2) / dt / 1e9
    print(f"{variant}: {dt * 1e3:.3f} ms/step  {bw:.0f} GB/s  "
          f"({dt / L * 1e6:.1f} us/page)")


def main():
    variants = sys.argv[1:] or ["xla", "fori", "grid"]
    if len(variants) == 1 and variants[0] in ("xla", "fori", "grid"):
        _run_variant(variants[0])
        return
    for v in variants:
        r = subprocess.run([sys.executable, __file__, v], timeout=600,
                           capture_output=True, text=True)
        out = (r.stdout + r.stderr).strip().splitlines()
        tail = [ln for ln in out if "ms/step" in ln or "Error" in ln
                or "error" in ln.lower()]
        print(tail[-1] if tail else f"{v}: NO OUTPUT (rc={r.returncode})")


if __name__ == "__main__":
    main()
