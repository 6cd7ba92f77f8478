"""Confirm headline int8 sampler throughput + quality gate (TPU).

Usage: python experiments/confirm_sampler.py
"""
import uspace_tpu  # noqa: F401  (re-asserts JAX_PLATFORMS)
import jax
import jax.numpy as jnp

from _harness import bench_uvit_large


def main():
    from uspace_tpu.core import flow
    from uspace_tpu.models import UViT

    _, model_q, params = bench_uvit_large("CONFIRM sampler", quant=True)
    model = UViT(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
                 depth=20, num_heads=16, dtype=jnp.bfloat16)
    ode = {"solver": "fixed", "solver_fix": "euler",
           "solver_fix_step": 1.0 / 50}

    @jax.jit
    def both(params, rng):
        z = jax.random.normal(rng, (8, 32, 32, 4), jnp.float32)
        a = flow.decode(lambda t, x: model.apply(params, x, t)[0], z, ode)
        b = flow.decode(lambda t, x: model_q.apply(params, x, t)[0], z, ode)
        af, bf = a.astype(jnp.float32), b.astype(jnp.float32)
        na, nb = jnp.linalg.norm(af), jnp.linalg.norm(bf)
        return jnp.vdot(af, bf) / (na * nb), jnp.linalg.norm(af - bf) / na

    cos, rel = both(params, jax.random.PRNGKey(0))
    print(f"CONFIRM quality: cosine {float(cos):.7f} "
          f"rel_l2 {float(rel):.5f}", flush=True)


if __name__ == "__main__":
    main()
