"""A/B the non-finite-skip train-step guard at the bench protocol (TPU).

The guard adds a per-leaf select over params/EMA/opt state inside the
donated step (train/step.py skip_nonfinite). XLA should fuse the select
into the update's existing elementwise pass (old values are already
live inputs), making it free — this probe verifies that at batch 128 /
packed kernel / remat_exempt=12, same protocol as the bench train line.

Usage: python experiments/nonfinite_guard_ab.py
"""
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp

BS, REPS = 128, 8


def run(skip_nonfinite: bool) -> float:
    from uspace_tpu.models import UViT
    from uspace_tpu.train.state import TrainState, get_lr_schedule, \
        get_optimizer
    from uspace_tpu.train.step import make_train_step

    model = UViT(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
                 depth=20, num_heads=16, dtype=jnp.bfloat16,
                 use_checkpoint=True, attn_impl="pallas_packed",
                 remat_exempt=12)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        rng, jnp.zeros((1, 32, 32, 4), jnp.float32), jnp.zeros((1,)))
    moments = jax.random.normal(jax.random.fold_in(rng, 9),
                                (BS, 32, 32, 8), jnp.float32)
    lr = get_lr_schedule("customized", 2e-4, warmup_steps=100)
    tx = get_optimizer("adam", lr, betas=(0.99, 0.99), weight_decay=0.03)
    step = jax.jit(make_train_step(model, tx, lr_schedule=lr,
                                   ema_rate=0.995,
                                   latents_from_moments=True,
                                   skip_nonfinite=skip_nonfinite),
                   donate_argnums=(0,))
    state = TrainState.create(params, tx)
    batch = {"x": moments}
    state, m = step(state, batch, rng)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(REPS):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / REPS
    print(f"AB skip_nonfinite={skip_nonfinite}: {dt*1e3:.1f} ms/step = "
          f"{BS/dt:.1f} img/s", flush=True)
    del state
    return dt


def main():
    run(False)
    run(True)


if __name__ == "__main__":
    main()
