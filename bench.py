"""Headline benchmark: images/sec/chip, U-ViT-large, 50-step Euler @256px.

Protocol (BASELINE.md): 256x256 generation = 4x32x32 SD-VAE latents,
U-ViT-large velocity field (embed 1024, depth 20, heads 16, patch 2 —
reference `configs/lfm_cm256_uvit_large.py:42-56`), 50 fixed Euler steps
(`config.sample.sample_steps=50`), batch = 50
(`config.sample.mini_batch_size=50`). VAE decode is excluded here, as the
metric targets the velocity-field sampling loop (the reference's hot loop,
`flow_matching.py:130-151`).

vs_baseline: the reference publishes no numbers (BASELINE.json
published:{}), so the denominator is an analytic A100 estimate:
U-ViT-large forward ~2.26e11 FLOPs (21 blocks x ~40*L*D^2, L=257, D=1024),
50 NFE -> 1.13e13 FLOPs/image; A100 fp16 312 TFLOPS at 40% MFU ->
~11.0 images/sec. vs_baseline = measured / 11.0 (north star: >= 2.0).

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_A100_IMG_PER_SEC = 11.0
BATCH = 50
STEPS = 50


def main():
    from uspace_tpu.core import flow
    from uspace_tpu.models import UViT

    model = UViT(
        img_size=32, patch_size=2, in_chans=4, embed_dim=1024, depth=20,
        num_heads=16, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 32, 32, 4), jnp.float32)
    params = model.init(rng, x0, jnp.zeros((1,)))

    def sample_batch(params, rng):
        z = jax.random.normal(rng, (BATCH, 32, 32, 4), jnp.float32)

        def vf(t, x):
            return model.apply(params, x, t)[0]

        return flow.decode(
            vf, z,
            {"solver": "fixed", "solver_fix": "euler",
             "solver_fix_step": 1.0 / STEPS},
        )

    def chained(reps):
        """reps sequential sampling batches inside one jit, reduced to a
        scalar — the host fetch of that scalar forces real execution.
        (On this tunnelled platform block_until_ready is unreliable, so
        timing uses the fetch; constant dispatch/fetch overhead cancels in
        the difference quotient below.)"""

        @jax.jit
        def run(params, rng):
            def body(i, acc):
                out = sample_batch(params, jax.random.fold_in(rng, i))
                return acc + out.mean()

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        return run

    # One compiled program, reps batches chained; the constant dispatch +
    # scalar-fetch overhead (~30 ms measured) is negligible against the
    # multi-second run, so a plain average suffices.
    reps = 2
    f = chained(reps)
    _ = float(f(params, rng))  # compile + warm
    t0 = time.perf_counter()
    _ = float(f(params, rng))
    per_batch = (time.perf_counter() - t0) / reps
    ips = BATCH / per_batch
    print(json.dumps({
        "metric": "images/sec/chip @256px U-ViT-large 50-step Euler",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_A100_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
