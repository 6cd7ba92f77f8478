"""XLA (non-Pallas) chained-matmul rate at the U-ViT MLP shapes (TPU).

The Pallas MXU probe (mxu_rate_probe.py) serializes dots behind a
whole-tensor select, so its 120-138 TFLOP/s bf16 reading is a lower
bound contaminated by the dependency gadget. This probe chains real
[R,C]x[C,H]x[H,C] matmul pairs through the carry (each pair's input is
the previous pair's output — an honest dependency, but the VPU work
between dots is one cheap scale) and reports the bf16 and int8 rates
XLA itself achieves at the model's MLP shape. This number is the
realistic dot ceiling for ANY kernel at this shape — if it's ~140, the
bf16 sampler (132 effective) is done; if it's 165+, the fused kernels
are leaving real headroom on the table.
"""
import sys
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp

ROWS, C, H, R = 13440, 1024, 4096, 30


def main(dtype_name):
    dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8}[dtype_name]
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        x = jax.random.randint(key, (ROWS, C), -127, 127, jnp.int8)
        w1 = jax.random.randint(key, (C, H), -127, 127, jnp.int8)
        w2 = jax.random.randint(key, (H, C), -127, 127, jnp.int8)

        @jax.jit
        def run(x, w1, w2):
            def body(i, acc):
                h = jax.lax.dot_general(
                    acc, w1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                h8 = (h >> 8).astype(jnp.int8)
                o = jax.lax.dot_general(
                    h8, w2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (o >> 8).astype(jnp.int8)

            return jax.lax.fori_loop(0, R, body, x).astype(jnp.int32).sum()
    else:
        x = jax.random.normal(key, (ROWS, C), dtype)
        w1 = jax.random.normal(key, (C, H), dtype) / 40.0
        w2 = jax.random.normal(key, (H, C), dtype) / 40.0

        @jax.jit
        def run(x, w1, w2):
            def body(i, acc):
                h = jax.lax.dot_general(
                    acc, w1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dtype)
                o = jax.lax.dot_general(
                    h, w2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return o.astype(dtype)

            return jax.lax.fori_loop(0, R, body, x).astype(jnp.float32).sum()

    _ = float(run(x, w1, w2))
    t0 = time.perf_counter()
    _ = float(run(x, w1, w2))
    dt = time.perf_counter() - t0
    flops = 2.0 * ROWS * C * H * 2 * R
    print(f"XLA {dtype_name} [{ROWS},{C}]x[{C},{H}]x[{H},{C}] R={R}: "
          f"{dt*1e3:.1f} ms -> {flops/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
