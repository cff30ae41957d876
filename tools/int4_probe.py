#!/usr/bin/env python
"""Probe the int4 nibble-unpack construct on real TPU before wiring it
into the fused decode kernels (the r3/r4 lesson: interpret mode accepts
constructs Mosaic rejects or mis-lowers — `jnp.where` on bool branches,
[B,1,1] broadcast compares — and a pathological compile can wedge the
tunnel relay; always probe novel constructs in a subprocess with a hard
timeout first).

Construct under test (ops/fused_step.py int4 plan):
    b   = packed_int8.astype(int32)          # [D, N/2] sign-extended
    hi  = b >> 4                             # arithmetic: floor(b/16)
    u   = b & 15
    lo  = (u ^ 8) - 8                        # sign-extend low nibble
    w   = concat([lo, hi], axis=1).astype(bf16)   # [D, N] original order
    out = x @ w  (+ per-lane scale post-matmul)

Variants:
  unpack     the shift/mask/xor chain + lane concat + matmul
  unpack_dma the same but with the packed page DMA'd HBM->VMEM scratch
             (the real kernel's layout) and double-slot indexing

Run on real TPU:  python tools/int4_probe.py   (subprocess per variant,
240 s timeout each — safe at round start)
"""
import functools
import subprocess
import sys

D, N = 256, 512  # contraction rows x full-width lanes (N/2 packed bytes)


def _kernel(variant, x_ref, p_ref, s_ref, o_ref, w_vmem=None, sem=None):
    import jax.numpy as jnp

    def unpack(pb):
        b = pb.astype(jnp.int32)
        hi = b >> 4
        u = jnp.bitwise_and(b, 15)
        lo = jnp.bitwise_xor(u, 8) - 8
        return jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)

    if variant == "unpack":
        w = unpack(p_ref[:])
        out = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)
        o_ref[:] = out * s_ref[0:1]
        return

    # unpack_dma: page arrives via async copy into a 2-slot scratch and the
    # unpack reads a lane slice of slot 0 (the fused kernel's access shape)
    from jax.experimental.pallas import tpu as pltpu

    cp = pltpu.make_async_copy(p_ref, w_vmem.at[0], sem)
    cp.start(priority=1)
    cp.wait()
    w = unpack(w_vmem[0][:, 0:N // 2])
    out = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    o_ref[:] = out * s_ref[0:1]


def run_variant(variant):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    q = rng.randint(-7, 8, size=(D, N)).astype(np.int32)
    scale = (rng.rand(1, N).astype(np.float32) + 0.5) * 0.01
    lo, hi = q[:, : N // 2], q[:, N // 2:]
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(np.int8)
    x = rng.randn(8, D).astype(np.float32) * 0.1

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    scratch = []
    in_specs = [vmem, vmem if variant == "unpack" else hbm, vmem]
    if variant == "unpack_dma":
        scratch = [pltpu.VMEM((2, D, N // 2), jnp.int8),
                   pltpu.SemaphoreType.DMA]
    out = pl.pallas_call(
        functools.partial(_kernel, variant),
        in_specs=in_specs,
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        scratch_shapes=scratch,
    )(jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scale))
    out = np.asarray(out)

    want = (x.astype(np.float32) @ q.astype(np.float32)) * scale
    # bf16 operand rounding: compare against the bf16-cast reference
    xb = jnp.asarray(x, jnp.bfloat16).astype(np.float32)
    want = (np.asarray(xb) @ q.astype(np.float32)) * scale
    err = np.abs(out - want).max() / (np.abs(want).max() + 1e-9)
    print(f"{variant}: rel_err={err:.3e}")
    assert err < 1e-2, err
    print(f"{variant}: PASS")


def main():
    if len(sys.argv) > 1 and sys.argv[1] in ("unpack", "unpack_dma"):
        run_variant(sys.argv[1])
        return 0
    rc = 0
    for variant in ("unpack", "unpack_dma"):
        print(f"--- {variant} ---", flush=True)
        try:
            r = subprocess.run([sys.executable, __file__, variant],
                               timeout=240, capture_output=True, text=True)
            print(r.stdout.strip())
            if r.returncode != 0:
                print(r.stderr[-2000:])
                rc = 1
        except subprocess.TimeoutExpired:
            print(f"{variant}: TIMEOUT (Mosaic hang) — construct is dead")
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
