"""w8 (weight-only int8) MLP dot strategies (TPU).

The r3 finding: the w8 view is adaptive-STABLE (NFE 116, fixed smooth
perturbation) but no faster than bf16, blamed on Mosaic relayouts at the
in-kernel int8 -> bf16 strip casts (int8 and bf16 have different native
tilings, so every cast is a layout change op). This probe times three
Pallas kernels at the bench MLP shape (rows=448-tile over B*L=12850,
C=1024, H=4096), rep-chained in one jit:

- ``cast``:  the current _mlp_kernel_w8_lnres strategy — cast each int8
             weight strip to bf16, then a bf16 x bf16 dot.
- ``mixed``: no cast — feed the int8 strip straight into
             ``lax.dot_general(bf16, int8, preferred=f32)`` and let
             Mosaic pick the MXU mixed-precision path (if it lowers).
- ``bf16``:  speed-of-light reference with resident bf16 weights
             (16.8 MB — may exceed VMEM; expect failure or spills).

Usage: python experiments/w8_dot_probe.py {cast|mixed|bf16}
(one case per process — tunnel compile serialization)
"""
import functools
import sys
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, C, H = 12850, 1024, 4096
TILE = 448
SLICES = 4
REPS = 10


def _kernel(x_ref, w1_ref, w2_ref, o_ref, w1_v, w2_v, h_v, sem, *, mode):
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(w1_ref, w1_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(w2_ref, w2_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[:]
    hs = H // SLICES
    for j in range(SLICES):
        w = w1_v[:, j * hs:(j + 1) * hs]
        if mode == "cast":
            w = w.astype(x.dtype)
        part = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h_v[:, j * hs:(j + 1) * hs] = jnp.maximum(part, 0.0).astype(
            h_v.dtype)
    acc = jnp.zeros((x.shape[0], C), jnp.float32)
    for j in range(SLICES):
        w = w2_v[j * hs:(j + 1) * hs, :]
        if mode == "cast":
            w = w.astype(x.dtype)
        acc += jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] = (x + acc.astype(x.dtype)).astype(o_ref.dtype)


def main(mode):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (ROWS, C), jnp.bfloat16)
    wdt = jnp.bfloat16 if mode == "bf16" else jnp.int8
    if mode == "bf16":
        w1 = jax.random.normal(jax.random.PRNGKey(1), (C, H),
                               jnp.bfloat16) * 0.02
        w2 = jax.random.normal(jax.random.PRNGKey(2), (H, C),
                               jnp.bfloat16) * 0.02
    else:
        w1 = jax.random.randint(jax.random.PRNGKey(1), (C, H), -127, 128,
                                jnp.int8)
        w2 = jax.random.randint(jax.random.PRNGKey(2), (H, C), -127, 128,
                                jnp.int8)
    rp = ((ROWS + TILE - 1) // TILE) * TILE
    xp = jnp.pad(x, ((0, rp - ROWS), (0, 0)))

    def call(xp):
        return pl.pallas_call(
            functools.partial(_kernel,
                              mode="cast" if mode == "bf16" else mode),
            grid=(rp // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rp, C), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((C, H), wdt),
                pltpu.VMEM((H, C), wdt),
                pltpu.VMEM((TILE, H), jnp.bfloat16),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 2**20),
        )(xp, w1, w2)

    @jax.jit
    def run(xp):
        def body(xp, _):
            o = call(xp)
            return (xp + 0.001 * o).astype(xp.dtype), None

        xp, _ = jax.lax.scan(body, xp, None, length=REPS)
        return xp

    out = run(xp)
    _ = float(out.astype(jnp.float32).mean())
    t0 = time.perf_counter()
    out = run(xp)
    _ = float(out.astype(jnp.float32).mean())
    dt = time.perf_counter() - t0
    tf = 2 * 2 * ROWS * C * H / (dt / REPS) / 1e12
    print(f"W8DOT {mode}: {dt / REPS * 1000:.2f} ms/call "
          f"({tf:.1f} TFLOP/s eff, {REPS} reps, rows={ROWS})", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
