"""Fine remat_exempt sweep for the training step (TPU, bench protocol).

Round-3 ladder measured 194.6/205.6/213.0 img/s at exempt 0/6/12 and
OOM at 16 (batch 128). This probes 13/14/15 to find the memory cliff's
exact edge; each case is the bench_train timing protocol verbatim
(donated step, per-step dispatch, 8 reps).

Run on TPU (no JAX_PLATFORMS override), detached:
  nohup python experiments/remat_sweep.py > /tmp/remat_sweep.log 2>&1 &
"""
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp

BS, REPS = 128, 8


def main():
    from uspace_tpu.models import UViT
    from uspace_tpu.train.state import TrainState, get_lr_schedule, \
        get_optimizer
    from uspace_tpu.train.step import make_train_step

    rng = jax.random.PRNGKey(0)
    lr = get_lr_schedule("customized", 2e-4, warmup_steps=100)
    tx = get_optimizer("adam", lr, betas=(0.99, 0.99), weight_decay=0.03)

    base = dict(img_size=32, patch_size=2, in_chans=4, embed_dim=1024,
                depth=20, num_heads=16, dtype=jnp.bfloat16,
                use_checkpoint=True, attn_impl="pallas_packed")
    params = jax.jit(UViT(**base).init)(
        rng, jnp.zeros((1, 32, 32, 4), jnp.float32), jnp.zeros((1,)))
    batch = {"x": jax.random.normal(jax.random.fold_in(rng, 99),
                                    (BS, 32, 32, 8), jnp.float32)}

    for exempt in (13, 14, 15):
        try:
            model = UViT(remat_exempt=exempt, **base)
            step = jax.jit(make_train_step(model, tx, lr_schedule=lr,
                                           ema_rate=0.995,
                                           latents_from_moments=True),
                           donate_argnums=(0,))
            p_copy = jax.jit(lambda p: jax.tree.map(jnp.copy, p))(params)
            state = TrainState.create(p_copy, tx)
            t_c0 = time.perf_counter()
            state, m = step(state, batch, rng)
            _ = float(m["loss"])
            compile_s = time.perf_counter() - t_c0
            t0 = time.perf_counter()
            for i in range(REPS):
                state, m = step(state, batch, jax.random.fold_in(rng, i))
            _ = float(m["loss"])
            dt = time.perf_counter() - t0
            print(f"exempt={exempt}: {BS * REPS / dt:.1f} img/s "
                  f"(compile {compile_s:.0f}s)", flush=True)
            del state
        except Exception as e:
            print(f"exempt={exempt}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
