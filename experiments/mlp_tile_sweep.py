"""Sweep int8 MLP kernel tile shape on the full int8 sampler (TPU).

Usage: python _scratch_mlp_sweep.py ROW_TILE COL_SLICES VMEM_MB
Prints one line: the bench_sampler protocol (U-ViT-large, Euler-50,
batch 50, quant=True) img/s at that tile configuration.
"""
import sys
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from uspace_tpu.ops import mlp as mlp_mod

BATCH, STEPS, REPS = 50, 50, 2


def main(row, slices, vmem_mb):
    mlp_mod._ROW_TILE = row
    mlp_mod._COL_SLICES = slices
    mlp_mod._VMEM_LIMIT = vmem_mb * 2**20 if vmem_mb else None

    from uspace_tpu.core import flow
    from uspace_tpu.models import UViT

    model = UViT(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
                 depth=20, num_heads=16, dtype=jnp.bfloat16, quant=True)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        rng, jnp.zeros((1, 32, 32, 4), jnp.float32), jnp.zeros((1,)))
    ode = {"solver": "fixed", "solver_fix": "euler",
           "solver_fix_step": 1.0 / STEPS}

    @jax.jit
    def run(params, rng):
        def body(i, acc):
            z = jax.random.normal(jax.random.fold_in(rng, i),
                                  (BATCH, 32, 32, 4), jnp.float32)
            out = flow.decode(lambda t, x: model.apply(params, x, t)[0],
                              z, ode)
            return acc + out.mean()

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    _ = float(run(params, rng))
    t0 = time.perf_counter()
    _ = float(run(params, rng))
    per_batch = (time.perf_counter() - t0) / REPS
    print(f"SWEEP row={row} slices={slices} vmem={vmem_mb}MB: "
          f"{BATCH / per_batch:.2f} img/s", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
