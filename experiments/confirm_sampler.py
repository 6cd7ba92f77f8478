"""Confirm final int8 sampler throughput + quality gate (TPU)."""
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp

BATCH, STEPS, REPS = 50, 50, 2


def main():
    from uspace_tpu.core import flow
    from uspace_tpu.models import UViT

    kw = dict(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
              depth=20, num_heads=16, dtype=jnp.bfloat16)
    model_q = UViT(quant=True, **kw)
    model = UViT(**kw)
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
            out = flow.decode(lambda t, x: model_q.apply(params, x, t)[0],
                              z, ode)
            return acc + out.mean()

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    _ = float(run(params, rng))
    t0 = time.perf_counter()
    _ = float(run(params, rng))
    per_batch = (time.perf_counter() - t0) / REPS
    print(f"CONFIRM sampler: {BATCH / per_batch:.2f} img/s", flush=True)

    @jax.jit
    def both(params, rng):
        z = jax.random.normal(rng, (8, 32, 32, 4), jnp.float32)
        a = flow.decode(lambda t, x: model.apply(params, x, t)[0], z, ode)
        b = flow.decode(lambda t, x: model_q.apply(params, x, t)[0], z, ode)
        af, bf = a.astype(jnp.float32), b.astype(jnp.float32)
        na, nb = jnp.linalg.norm(af), jnp.linalg.norm(bf)
        return jnp.vdot(af, bf) / (na * nb), jnp.linalg.norm(af - bf) / na

    cos, rel = both(params, rng)
    print(f"CONFIRM quality: cosine {float(cos):.7f} rel_l2 {float(rel):.5f}",
          flush=True)


if __name__ == "__main__":
    main()
