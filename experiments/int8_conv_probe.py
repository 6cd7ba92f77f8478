"""Does XLA-TPU run int8 convolutions on the MXU at a useful rate?

Times jax.lax.conv_general_dilated (NHWC, 3x3) at SD-UNet-large shapes
in int8 x int8 -> int32 vs bf16, chained inside one jit. If int8 convs
run >= bf16 rate, an int8 SD-UNet sampling view is worth building.
"""
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def bench(b, h, w, cin, cout, dtype, reps):
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        x = jax.random.randint(key, (b, h, w, cin), -127, 127, jnp.int8)
        k = jax.random.randint(key, (3, 3, cin, cout), -127, 127, jnp.int8)
        acc_t = jnp.int32
    else:
        x = jax.random.normal(key, (b, h, w, cin), dtype)
        k = jax.random.normal(key, (3, 3, cin, cout), dtype)
        acc_t = jnp.float32

    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def run(x, k):
        def body(i, acc):
            # carry-dependent input so the conv cannot be hoisted out
            if dtype == jnp.int8:
                xb = x + (acc % 2).astype(jnp.int8)
            else:
                xb = x + (acc > 1e30).astype(dtype)
            out = jax.lax.conv_general_dilated(
                xb, k, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=acc_t)
            # consume EVERY output element: a single-element carry lets
            # XLA DCE the conv down to one output pixel (first version of
            # this probe "measured" 700+ TFLOP/s that way)
            return acc + out.sum()

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), acc_t))

    name = "int8" if dtype == jnp.int8 else "bf16"
    try:
        _ = float(run(x, k))
    except Exception as e:
        print(f"conv {b}x{h}x{w}x{cin}->{cout} {name}: FAIL "
              f"{str(e)[:100]}", flush=True)
        return
    t0 = time.perf_counter()
    _ = float(run(x, k))
    dt = time.perf_counter() - t0
    flops = 2.0 * b * h * w * cin * cout * 9 * reps
    print(f"conv {b}x{h}x{w}x{cin}->{cout} {name}: {dt*1e3:8.1f} ms -> "
          f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "vae":
        # SD-VAE *decoder* shapes (codecs/vae.py, 32x32x4 z -> 256px RGB,
        # ch_mult 1,2,4,4): activations are huge here, so the win/loss is
        # decided by whether the dynamic-quantize HBM pass around the conv
        # costs more than the int8 MXU saves. Fewer reps: each conv at
        # 256^2 is ~1 GFLOP x batch.
        for dtype in (jnp.bfloat16, jnp.int8):
            bench(50, 32, 32, 512, 512, dtype, 100)    # mid / level 3
            bench(50, 64, 64, 512, 512, dtype, 50)     # level 2
            bench(50, 128, 128, 512, 256, dtype, 25)   # level 1
            bench(50, 256, 256, 256, 128, dtype, 12)   # level 0 entry
            bench(50, 256, 256, 128, 128, dtype, 12)   # level 0 body
    else:
        for dtype in (jnp.bfloat16, jnp.int8):
            bench(50, 32, 32, 256, 256, dtype, 400)   # top UNet stage
            bench(50, 16, 16, 512, 512, dtype, 400)   # mid stage
            bench(50, 8, 8, 1024, 1024, dtype, 400)   # bottleneck
