#!/usr/bin/env python
"""Per-layer weight-streaming overhead probes (VERDICT r3 #2).

The fixed per-step residue in the fused decode kernels (~0.18 ms/step B=1,
~0.41 B=4; bench.py --breakdown-b4, r3) is insensitive to every single-phase
ablation.  Two suspects, two experiments, all at flagship traffic
([24, 512, 6144] bf16 = 151 MiB/step) with trivial per-page compute:

1. hand-rolled DMA machinery (hypothesis (c)): the in-kernel ``fori_loop``
   double-buffer (production pattern) vs Mosaic's own grid pipeline vs a
   plain XLA einsum:

     fori      ANY-space input, VMEM(2, rows, W) scratch, make_async_copy +
               semaphore waits, page fori_loop in the kernel
     grid      grid=(L,), BlockSpec (1, D, W) — Mosaic issues/overlaps the
               HBM→VMEM copies; accumulator in scratch
     xla       jnp baseline: one einsum touching every page once

   r4 verdict ON CHIP: grid 0.463 / fori 0.493 / xla 0.486 ms/step — grid
   wins only ~6% (<10% threshold) ⇒ a grid rewrite of the fused kernels
   does NOT pay; hypothesis (c) closed.

2. per-DMA fixed cost (the surviving suspect): all three variants sit at
   ~20 us/page while the bf16→q8 marginal rate says the BYTES move at
   ~910 GB/s (6.9 us/page) — if the gap is a fixed issue/wait cost per
   DMA, fewer+bigger pages should approach the byte rate.  ``foriN``
   streams the SAME 151 MiB as L·D/N pages of N rows each:

     fori256   48 pages × 3.1 MiB   (half-layer pages)
     fori512   24 pages × 6.3 MiB   (== fori, the production layout)
     fori1024  12 pages × 12.6 MiB  (2-layer pages; vmem limit raised)
     fori2048   6 pages × 25.2 MiB  (4-layer pages; vmem limit raised)

TIMING SHAPE MATTERS (r4 lesson): one dispatch per step reads ~0.9 ms/step
for EVERY variant — ~0.45 ms of that is per-dispatch overhead over the
tunnel, swamping the ~0.45 ms device time.  Each variant therefore exposes
``step(x, w) -> x'`` and is timed as a REPS-long ``lax.scan`` chain inside
ONE jit (the carry feeds x forward so XLA cannot hoist the body), exactly
how the production decode_chunk amortizes its steps.

One subprocess per variant with a hard timeout (tunnel-fragility rule —
never retry a hung compile inline).

    python tools/stream_probe.py            # default variant set
    python tools/stream_probe.py fori1024   # one variant
"""
import subprocess
import sys

L, D, W = 24, 512, 6144
REPS = 100  # steps chained per dispatch
ROUNDS = 3  # timed dispatches per variant (report each; take the best)

DEFAULT = ["xla", "fori", "grid", "fori256", "fori1024", "fori2048"]


def _make_fori(rows: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.bfloat16
    pages = (L * D) // rows
    scratch_bytes = 2 * rows * W * 2
    # leave headroom for in/out/stack on top of the double buffer
    limit = max(16, (scratch_bytes >> 20) + 8) << 20

    def kernel(x_ref, w_hbm, o_ref, w_all, w_sem):
        def start(page, slot):
            pltpu.make_async_copy(w_hbm.at[page], w_all.at[slot],
                                  w_sem.at[slot]).start(priority=1)

        def wait(slot):
            pltpu.make_async_copy(w_hbm.at[0], w_all.at[0],
                                  w_sem.at[slot]).wait()

        start(0, 0)
        xv = x_ref[:].astype(jnp.float32)

        def body(page, acc):
            slot = jax.lax.rem(page, 2)
            nxt = jax.lax.rem(page + 1, 2)

            @pl.when(page + 1 < pages)
            def _():
                start(page + 1, nxt)

            wait(slot)
            # one tiny matmul per page (forces the wait); xv spans ALL
            # sublanes and the lane slice :rows is 128-aligned, so the
            # operand is read in place (no sliced-operand stack copy)
            return acc + jnp.dot(xv, w_all[slot][:, :rows].astype(
                jnp.float32), preferred_element_type=jnp.float32)

        o_ref[:] = jax.lax.fori_loop(0, pages, body,
                                     jnp.zeros((1, rows), jnp.float32))

    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, rows), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, rows, W), dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
    )
    return rows, lambda x, w: fn(x, w.reshape(pages, rows, W))


def _make_step(variant: str):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if variant == "fori":
        return _make_fori(D)
    if variant.startswith("fori") and variant[4:].isdigit():
        return _make_fori(int(variant[4:]))

    if variant == "grid":
        def kernel(x_ref, w_ref, o_ref, acc):
            layer = pl.program_id(0)

            @pl.when(layer == 0)
            def _():
                acc[:] = jnp.zeros_like(acc)

            xv = x_ref[:].astype(jnp.float32)
            acc[:] += jnp.dot(xv, w_ref[0][:, :D].astype(jnp.float32),
                              preferred_element_type=jnp.float32)

            @pl.when(layer == L - 1)
            def _():
                o_ref[:] = acc[:]

        import jax

        fn = pl.pallas_call(
            kernel,
            grid=(L,),
            in_specs=[pl.BlockSpec((1, D), lambda i: (0, 0)),
                      pl.BlockSpec((1, D, W), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, D), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
        )
        return D, lambda x, w: fn(x, w)

    if variant == "xla":
        def step(x, w):
            # reduce over ALL W columns so XLA cannot narrow the weight
            # read to a slice — the full 151 MiB must stream
            full = jnp.einsum("bd,ldw->bw", x.astype(jnp.float32),
                              w.astype(jnp.float32))
            return full.reshape(1, W // D, D).sum(axis=1)

        return D, step

    raise SystemExit(f"unknown variant {variant}")


def _run_variant(variant: str) -> None:
    import time

    import numpy as np

    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(L, D, W).astype(np.float32) * 0.02, dtype)

    rows, step = _make_step(variant)
    x0 = jnp.asarray(rng.randn(1, rows).astype(np.float32) * 0.1, dtype)

    @jax.jit
    def chain(x, w):
        def body(carry, _):
            out = step(carry, w)
            # tanh keeps the carry bounded; the data dependence chains the
            # steps so the weight stream runs once per step, back to back
            return jnp.tanh(out).astype(dtype), ()

        final, _ = jax.lax.scan(body, x, None, length=REPS)
        return final

    out = chain(x0, w)
    np.asarray(out)  # sync (block_until_ready can return early over axon)
    best = float("inf")
    times = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        np.asarray(chain(x0, w))
        dt = (time.perf_counter() - t0) / REPS
        times.append(dt)
        best = min(best, dt)
    n_pages = (L * D) // rows if variant.startswith("fori") else L
    bw = (L * D * W * 2) / best / 1e9
    detail = "/".join(f"{t * 1e3:.3f}" for t in times)
    print(f"{variant}: {best * 1e3:.3f} ms/step  {bw:.0f} GB/s  "
          f"({best / n_pages * 1e6:.1f} us/page x {n_pages})  "
          f"[rounds {detail}]")


def main():
    variants = sys.argv[1:] or DEFAULT
    if len(variants) == 1:
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
