"""Euler-50 sampler: weight-only int8 ("w8") view vs bf16 lnmlp view.

The w8 view is the adaptive-solver-safe quantized view (no activation
rounding in the field). Early r3 it measured no faster than bf16
(int8->bf16 strip casts relayout in Mosaic); this re-measures at the
448/4 tile configuration, where each cast strip is [1024, 1024].
If w8 > bf16 here, the dopri5 bench line should switch to quant="w8".
"""
import sys
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp

BATCH, STEPS, REPS = 50, 50, 2


def main(view):
    from uspace_tpu.core import flow
    from uspace_tpu.models import UViT

    kw = dict(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
              depth=20, num_heads=16, dtype=jnp.bfloat16)
    if view == "w8":
        model = UViT(quant="w8", **kw)
    elif view == "bf16":
        model = UViT(attn_impl="pallas_lnmlp", **kw)
    else:
        raise SystemExit(view)
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
    print(f"VIEW {view}: {BATCH / per_batch:.2f} img/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
