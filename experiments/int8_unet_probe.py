"""SD-UNet-large Euler-50 sampler: int8 W8A8 view vs bf16.

The conv probe (int8_conv_probe.py) showed int8 convs at 1.2-1.6x bf16
MXU rate at the UNet's stage shapes; this times the full bench-protocol
sampler (batch 50, Euler-50, reference configs/lfm_cm256_unet_large.py
geometry) with `quant=True` (Int8Conv ResBlock/up/down/proj convs +
Int8Dense transformer projections) and reports a quality check
(velocity-field cosine at mid-trajectory on perturbed params — init
params have zero-init out convs, which would make agreement vacuous).
"""
import sys
import time

import uspace_tpu  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

BATCH, STEPS, REPS = 50, 50, 2


def build(quant):
    from uspace_tpu.models import get_nnet

    return get_nnet(
        "unet_t2i", image_size=32, in_channels=4, out_channels=4,
        model_channels=256, attention_resolutions=[4, 2, 1],
        num_res_blocks=2, channel_mult=[1, 2, 4], num_head_channels=64,
        use_spatial_transformer=True, transformer_depth=1, context_dim=768,
        dtype=jnp.bfloat16, quant=quant,
    )


def main(which):
    from uspace_tpu.core import flow

    rng = jax.random.PRNGKey(0)
    model_bf = build(False)
    x0 = jnp.zeros((1, 32, 32, 4), jnp.float32)
    ctx0 = jnp.zeros((1, 77, 768), jnp.float32)
    params = jax.jit(model_bf.init)(rng, x0, jnp.zeros((1,)), ctx0)
    # perturb so zero-init convs contribute to the quality check
    @jax.jit
    def perturb(p, key):
        leaves, treedef = jax.tree_util.tree_flatten(p)
        keys = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef,
            [a + 0.02 * jax.random.normal(k, a.shape, a.dtype)
             for a, k in zip(leaves, keys)])

    params = perturb(params, jax.random.fold_in(rng, 99))
    ctx = jax.random.normal(rng, (BATCH, 77, 768), jnp.float32)
    ode = {"solver": "fixed", "solver_fix": "euler",
           "solver_fix_step": 1.0 / STEPS}

    cases = {"bf16": False, "int8": True,
             "conv8": "conv8", "dense8": "dense8"}
    todo = [which] if which in cases else list(cases)
    for name in todo:
        model = build(cases[name])

        @jax.jit
        def run(params, rng):
            def body(i, acc):
                z = jax.random.normal(jax.random.fold_in(rng, i),
                                      (BATCH, 32, 32, 4), jnp.float32)
                out = flow.decode(
                    lambda t, x: model.apply(params, x, t, ctx)[0], z, ode)
                return acc + out.mean()

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        _ = float(run(params, rng))
        t0 = time.perf_counter()
        _ = float(run(params, rng))
        per_batch = (time.perf_counter() - t0) / REPS
        print(f"unet {name}: {BATCH / per_batch:.2f} img/s", flush=True)

    if len(todo) > 1:
        # quality: one mid-trajectory field eval, int8 vs bf16
        xq = jax.random.normal(jax.random.fold_in(rng, 5),
                               (8, 32, 32, 4), jnp.float32)
        t = jnp.full((8,), 0.5)
        f_bf = jax.jit(lambda p, x: build(False).apply(p, x, t, ctx[:8])[0])
        f_q = jax.jit(lambda p, x: build(True).apply(p, x, t, ctx[:8])[0])
        a = np.asarray(f_bf(params, xq), np.float64).ravel()
        b = np.asarray(f_q(params, xq), np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        print(f"field quality int8-vs-bf16: cosine {cos:.6f} "
              f"rel-L2 {rel:.5f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "both")
