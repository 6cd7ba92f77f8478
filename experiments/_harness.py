"""Shared timing harness for the experiment scripts.

One place for the measurement protocol the docs cite (U-ViT-large,
Euler-50, batch 50; REPS chained batches inside ONE jit with a scalar
fetch — `block_until_ready` is a no-op on the axon tunnel, so execution
is forced by `float(...)` and the ~30 ms dispatch/fetch overhead
amortizes over the multi-second run).
"""
import time

import jax
import jax.numpy as jnp

BATCH, STEPS, REPS = 50, 50, 2


def bench_uvit_large(label, timing_reps=REPS, **model_kwargs):
    """Build U-ViT-large with ``model_kwargs`` (e.g. quant=True,
    attn_impl=...), run the headline Euler-50 batch-50 protocol, print
    and return img/s."""
    from uspace_tpu.core import flow
    from uspace_tpu.models import UViT

    model = UViT(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
                 depth=20, num_heads=16, dtype=jnp.bfloat16,
                 **model_kwargs)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        rng, jnp.zeros((1, 32, 32, 4), jnp.float32), jnp.zeros((1,)))
    ips = time_sampler(model, params, rng, label, timing_reps)
    return ips, model, params


def time_sampler(model, params, rng, label, timing_reps=REPS):
    """Time `flow.decode` over ``model`` at the headline protocol."""
    from uspace_tpu.core import flow

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

        return jax.lax.fori_loop(0, timing_reps, body, jnp.float32(0.0))

    _ = float(run(params, rng))  # compile + warm
    t0 = time.perf_counter()
    _ = float(run(params, rng))
    per_batch = (time.perf_counter() - t0) / timing_reps
    ips = BATCH / per_batch
    print(f"{label}: {ips:.2f} img/s", flush=True)
    return ips
