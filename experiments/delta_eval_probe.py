"""Per-eval timing of the stage-delta field pieces (TPU).

Times, rep-chained inside one jit (block_until_ready is a no-op on the
tunnel): the model's fixed-step int8 view (the 23.9 img/s sampler's
field — the speed target), the fused base eval, and the fused delta
eval. Pinpoints which kernel eats the gap when the adaptive delta solve
underperforms.

Usage: python experiments/delta_eval_probe.py
    {view|base|delta|baseg|deltag|xbase|xdelta}
(one case per process — tunnel compile serialization)

``baseg``/``deltag``: hidden_mode="gelu" (base emits the affine
post-GELU hidden; delta drops its second GELU pass). ``basegr``/
``deltagr``: hidden_mode="grad" (base emits gelu'(e); delta is
GELU-free, dg = de * gelu'(e_b)).
"""
import sys
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp

BATCH = 50
REPS = 6


def main(case):
    from uspace_tpu.core import delta_field
    from uspace_tpu.models import UViT

    model = UViT(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
                 depth=20, num_heads=16, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        rng, jnp.zeros((1, 32, 32, 4), jnp.float32), jnp.zeros((1,)))
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 32, 32, 4),
                          jnp.float32)

    if case == "view":
        mq = UViT(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
                  depth=20, num_heads=16, dtype=jnp.bfloat16, quant=True)

        @jax.jit
        def run(p, x):
            def body(x, _):
                tb = jnp.full((BATCH,), 0.5, jnp.float32)
                f = mq.apply(p, x, tb)[0]
                return x + 0.001 * f.astype(jnp.float32), None

            x, _ = jax.lax.scan(body, x, None, length=REPS)
            return x

        args = (params, x)
    else:
        dp = jax.jit(delta_field.prepare_delta_params)(params)
        fused = case.rstrip("gr") in ("base", "delta")
        hmode = {"g": "gelu", "r": "grad"}.get(case[-1], "exact")
        if case.rstrip("gr").endswith("base"):

            @jax.jit
            def run(dp, x):
                def body(x, _):
                    f, _c = delta_field.anchored_vf_base(
                        model, dp, jnp.float32(0.5), x, fused=fused,
                        hidden_mode=hmode)
                    return x + 0.001 * f, None

                x, _ = jax.lax.scan(body, x, None, length=REPS)
                return x

        else:

            @jax.jit
            def run(dp, x):
                f0, cache = delta_field.anchored_vf_base(
                    model, dp, jnp.float32(0.5), x, fused=fused,
                    hidden_mode=hmode)

                def body(x, _):
                    f = delta_field.anchored_vf_delta(
                        model, dp, jnp.float32(0.5), x, cache, fused=fused)
                    return x + 0.001 * f, None

                x, _ = jax.lax.scan(body, x, None, length=REPS)
                return x

        args = (dp, x)

    out = run(*args)
    _ = float(out.mean())  # compile + warm
    t0 = time.perf_counter()
    out = run(*args)
    _ = float(out.mean())
    dt = time.perf_counter() - t0
    extra = " (incl. 1 base)" if "delta" in case else ""
    print(f"PROBE {case}: {dt / REPS * 1000:.2f} ms/eval{extra} "
          f"({REPS} reps, batch {BATCH})", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
