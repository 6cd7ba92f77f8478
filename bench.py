"""Headline benchmark: images/sec/chip, U-ViT-large, 50-step Euler @256px.

Protocol (BASELINE.md): 256x256 generation = 4x32x32 SD-VAE latents,
U-ViT-large velocity field (embed 1024, depth 20, heads 16, patch 2 —
reference `configs/lfm_cm256_uvit_large.py:42-56`), 50 fixed Euler steps
(`config.sample.sample_steps=50`), batch = 50
(`config.sample.mini_batch_size=50`). VAE decode is excluded here, as the
metric targets the velocity-field sampling loop (the reference's hot loop,
`flow_matching.py:130-151`).

The sampler runs the int8 W8A8 model view (ops/quant.py): same param
tree, quantized block matmuls, f32 softmax/LN/accumulation. Its quality
gate vs the bf16 view (latent cosine + relative L2 over the full 50-step
ODE from shared z) is measured in-bench and reported alongside.

Also reports training throughput (img/s/chip) at the reference per-GPU
batch (global 512 over 4 GPUs -> 128/chip, `README.md:76`), bf16 + remat
+ packed attention kernel + in-step moments resampling — the full hot
training step of `train/step.py`.

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


def _uvit(**extra):
    from uspace_tpu.models import UViT

    return UViT(
        img_size=32, patch_size=2, in_chans=4, embed_dim=1024, depth=20,
        num_heads=16, dtype=jnp.bfloat16, **extra,
    )


def _sampler(model, params_struct):
    from uspace_tpu.core import flow

    def sample_batch(params, rng):
        z = jax.random.normal(rng, (BATCH, 32, 32, 4), jnp.float32)

        def vf(t, x):
            return model.apply(params, x, t)[0]

        return flow.decode(
            vf, z,
            {"solver": "fixed", "solver_fix": "euler",
             "solver_fix_step": 1.0 / STEPS},
        )

    return sample_batch


def bench_sampler(params, rng):
    """int8 sampler throughput. Chained batches inside one jit, scalar
    fetch forces execution (block_until_ready is a no-op on the axon
    tunnel; constant dispatch/fetch overhead ~30 ms cancels in the
    multi-second run)."""
    model_q = _uvit(quant=True)
    sb = _sampler(model_q, params)
    reps = 2

    @jax.jit
    def run(params, rng):
        def body(i, acc):
            out = sb(params, jax.random.fold_in(rng, i))
            return acc + out.mean()

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _ = float(run(params, rng))  # compile + warm
    t0 = time.perf_counter()
    _ = float(run(params, rng))
    per_batch = (time.perf_counter() - t0) / reps
    return BATCH / per_batch


def bench_quality(params, rng):
    """Full-ODE latent agreement of the int8 view vs bf16 from shared z."""
    from uspace_tpu.core import flow

    model = _uvit()
    model_q = _uvit(quant=True)

    @jax.jit
    def both(params, rng):
        z = jax.random.normal(rng, (8, 32, 32, 4), jnp.float32)
        ode = {"solver": "fixed", "solver_fix": "euler",
               "solver_fix_step": 1.0 / STEPS}
        a = flow.decode(lambda t, x: model.apply(params, x, t)[0], z, ode)
        b = flow.decode(lambda t, x: model_q.apply(params, x, t)[0], z, ode)
        af, bf = a.astype(jnp.float32), b.astype(jnp.float32)
        na, nb = jnp.linalg.norm(af), jnp.linalg.norm(bf)
        return jnp.vdot(af, bf) / (na * nb), jnp.linalg.norm(af - bf) / na

    cos, rel = both(params, rng)
    return float(cos), float(rel)


def bench_train(params, rng):
    """Training img/s/chip: bf16 + remat + packed kernel + moments
    resampling, at the reference per-GPU batch (128) with fallback."""
    from uspace_tpu.train.state import TrainState, get_lr_schedule, get_optimizer
    from uspace_tpu.train.step import make_train_step

    model = _uvit(use_checkpoint=True, attn_impl="pallas_packed")
    lr = get_lr_schedule("customized", 2e-4, warmup_steps=5000)
    tx = get_optimizer("adam", lr, betas=(0.99, 0.99), weight_decay=0.03)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, lr_schedule=lr,
                           latents_from_moments=True)
    reps = 8

    for bs in (128, 64):
        try:
            batch = {"x": jax.random.normal(
                jax.random.fold_in(rng, 99), (bs, 32, 32, 8), jnp.float32)}

            @jax.jit
            def run(state, batch, rng):
                def body(i, carry):
                    st, acc = carry
                    st, m = step(st, batch, jax.random.fold_in(rng, i))
                    return st, acc + m["loss"]

                _, acc = jax.lax.fori_loop(
                    0, reps, body, (state, jnp.float32(0.0)))
                return acc

            _ = float(run(state, batch, rng))
            t0 = time.perf_counter()
            _ = float(run(state, batch, rng))
            dt = time.perf_counter() - t0
            return bs * reps / dt, bs
        except Exception:  # OOM at 128: retry at the round-1 batch
            if bs == 64:
                raise
    return 0.0, 0


def main():
    rng = jax.random.PRNGKey(0)
    model = _uvit()
    x0 = jnp.zeros((1, 32, 32, 4), jnp.float32)
    params = model.init(rng, x0, jnp.zeros((1,)))

    ips = bench_sampler(params, rng)
    cos, rel = bench_quality(params, rng)
    train_ips, train_bs = bench_train(params, rng)
    print(json.dumps({
        "metric": "images/sec/chip @256px U-ViT-large 50-step Euler",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_A100_IMG_PER_SEC, 3),
        "sampler_precision": "int8-w8a8-dynamic (f32 softmax/LN/acc)",
        "quality_latent_cosine_vs_bf16": round(cos, 5),
        "quality_latent_rel_l2_vs_bf16": round(rel, 5),
        "train_imgs_per_sec_per_chip": round(train_ips, 2),
        "train_batch_per_chip": train_bs,
    }))


if __name__ == "__main__":
    main()
