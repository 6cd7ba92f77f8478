"""Training step time decomposition at the bench protocol (TPU).

Measures, at batch 128 / packed kernel / remat_exempt=12:
  1. forward loss only                      (jit loss)
  2. value_and_grad                         (fwd + bwd + remat recompute)
  3. full train step (opt + EMA, donated)   (the bench line)

Differences locate the MFU gap: bwd efficiency vs optimizer overhead.
"""
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp

BS, REPS = 128, 8


def main():
    from uspace_tpu.core import flow
    from uspace_tpu.models import UViT
    from uspace_tpu.train.state import TrainState, get_lr_schedule, \
        get_optimizer
    from uspace_tpu.train.step import make_train_step, sample_from_moments

    model = UViT(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
                 depth=20, num_heads=16, dtype=jnp.bfloat16,
                 use_checkpoint=True, attn_impl="pallas_packed",
                 remat_exempt=12)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        rng, jnp.zeros((1, 32, 32, 4), jnp.float32), jnp.zeros((1,)))
    moments = jax.random.normal(jax.random.fold_in(rng, 9),
                                (BS, 32, 32, 8), jnp.float32)

    def loss_fn(p, rng):
        x1 = sample_from_moments(moments, rng)
        vf = lambda t, x: model.apply(p, x, t)[0]
        return flow.training_loss(vf, jax.random.fold_in(rng, 1), x1,
                                  1e-4).mean()

    @jax.jit
    def fwd(p, rng):
        return loss_fn(p, rng)

    @jax.jit
    def vgrad(p, rng):
        loss, g = jax.value_and_grad(loss_fn)(p, rng)
        # fold grads to a scalar so nothing large is fetched
        return loss + sum(jnp.sum(x * 0) + x.reshape(-1)[0] * 0
                          for x in jax.tree.leaves(g))

    def timeit(fn, *args, label):
        out = fn(*args)
        _ = float(out if not isinstance(out, tuple) else out[0])
        t0 = time.perf_counter()
        for i in range(REPS):
            out = fn(*args[:-1], jax.random.fold_in(args[-1], i))
        _ = float(out if not isinstance(out, tuple) else out[0])
        dt = (time.perf_counter() - t0) / REPS
        print(f"PROBE {label}: {dt*1e3:.1f} ms/step = "
              f"{BS/dt:.1f} img/s", flush=True)
        return dt

    timeit(fwd, params, rng, label="fwd-only")
    timeit(vgrad, params, rng, label="fwd+bwd")

    lr = get_lr_schedule("customized", 2e-4, warmup_steps=100)
    tx = get_optimizer("adam", lr, betas=(0.99, 0.99), weight_decay=0.03)
    step = jax.jit(make_train_step(model, tx, lr_schedule=lr,
                                   ema_rate=0.995,
                                   latents_from_moments=True),
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
    print(f"PROBE full-step: {dt*1e3:.1f} ms/step = {BS/dt:.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
