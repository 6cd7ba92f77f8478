"""Whole-decoder check for the SD-VAE int8 decode view (codecs/vae.py
``quant=True``): times the real 256px decoder at the bench shape
(batch 50, z 32x32x4) bf16 vs int8-conv, plus a pixel-space quality
probe between the two views.

Raw conv rates at the decoder's shapes measured 1.1-1.6x bf16
(int8_conv_probe.py `vae`); this probe answers whether the dynamic
per-conv quantize passes (full activation read+write around each 3x3)
eat the win at decoder activation sizes.

Run on the real TPU (no env override), detached:
    nohup python experiments/int8_vae_decode_probe.py > /tmp/vae_decode.log 2>&1 &
"""
import time

import uspace_tpu  # noqa: F401  (platform/env hygiene)
import jax
import jax.numpy as jnp

BATCH = 50
REPS = 10


def main():
    from uspace_tpu.codecs.vae import AutoencoderKL

    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(jax.random.fold_in(rng, 1),
                          (BATCH, 32, 32, 4), jnp.float32)

    vaes = {"bf16": AutoencoderKL(dtype=jnp.bfloat16),
            "int8": AutoencoderKL(dtype=jnp.bfloat16, quant=True)}
    params = jax.jit(vaes["bf16"].init)(
        jax.random.fold_in(rng, 2), jnp.zeros((1, 256, 256, 3)), rng)

    outs = {}
    for name, vae in vaes.items():
        @jax.jit
        def run(params, z, vae=vae):
            def body(i, carry):
                # carry-dependent input so reps can't collapse
                zi = z + (carry * 1e-20).astype(z.dtype)
                img = vae.apply(params, zi, method=vae.decode)
                return carry + img.astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, REPS, body, jnp.zeros(()))

        _ = float(run(params, z))  # compile + warm
        t0 = time.perf_counter()
        _ = float(run(params, z))
        dt = time.perf_counter() - t0
        print(f"decode {name}: {BATCH * REPS / dt:7.1f} img/s "
              f"({dt / REPS * 1e3:.0f} ms/batch)", flush=True)

        one = jax.jit(lambda p, z, vae=vae: vae.apply(
            p, z, method=vae.decode).astype(jnp.float32))
        outs[name] = one(params, z[:8])

    a = jnp.ravel(outs["bf16"])
    b = jnp.ravel(outs["int8"])
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    cos = float(a @ b / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))
    print(f"quality int8-vs-bf16 decode (random init): "
          f"cos {cos:.6f} rel-L2 {rel:.5f}", flush=True)


if __name__ == "__main__":
    main()
