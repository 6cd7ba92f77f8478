"""MXU rate probe: int8 vs bf16 dot throughput inside one Pallas program.

All operands VMEM-resident, R dots chained in-kernel (carry-dependent so
the loop cannot be collapsed), one scalar fetched at the end. Prints
effective TFLOP/s (counting 2*M*K*N per dot) per dtype/shape.
"""
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_run(M, K, N, dtype, R):
    def kernel(x_ref, x1_ref, w_ref, o_ref):
        x0 = x_ref[:]
        x1 = x1_ref[:]
        w = w_ref[:]

        if dtype == jnp.int8:
            def body(i, acc):
                # carry dependency via a whole-tensor select (int8 adds
                # with a dynamic scalar failed to lower)
                xb = jax.lax.select(
                    jnp.broadcast_to(acc[0, 0] % 2 == 0, x0.shape),
                    x0, x1)
                d = jax.lax.dot_general(
                    xb, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return acc + d

            acc = jax.lax.fori_loop(
                0, R, body, jnp.zeros((M, N), jnp.int32))
            o_ref[:] = acc
        else:
            def body(i, acc):
                xb = x0 + x1 * (acc[0, 0] > 1e30).astype(dtype)
                d = jax.lax.dot_general(
                    xb, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc + d

            acc = jax.lax.fori_loop(
                0, R, body, jnp.zeros((M, N), jnp.float32))
            o_ref[:] = acc

    out_dtype = jnp.int32 if dtype == jnp.int8 else jnp.float32

    @jax.jit
    def run(x, x1, w):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        )(x, x1, w).sum()

    return run


def bench(M, K, N, dtype, R):
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        x = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
        x1 = jax.random.randint(jax.random.fold_in(key, 1),
                                (M, K), -127, 127, jnp.int8)
        w = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    else:
        x = jax.random.normal(key, (M, K), dtype)
        x1 = jax.random.normal(jax.random.fold_in(key, 1), (M, K), dtype)
        w = jax.random.normal(key, (K, N), dtype)
    run = make_run(M, K, N, dtype, R)
    try:
        _ = float(run(x, x1, w))  # compile + warm
    except Exception as e:
        print(f"M={M} K={K} N={N} {dtype.__name__}: FAIL "
              f"{str(e)[:80]}", flush=True)
        return
    t0 = time.perf_counter()
    _ = float(run(x, x1, w))
    dt = time.perf_counter() - t0
    tflops = 2.0 * M * K * N * R / dt / 1e12
    print(f"M={M} K={K} N={N} {dtype.__name__:8s} R={R}: {dt*1e3:8.2f} ms "
          f"-> {tflops:7.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    for dtype in (jnp.int8, jnp.bfloat16):
        bench(256, 1024, 512, dtype, 50_000)    # pre-sweep MLP strip
        bench(512, 1024, 512, dtype, 40_000)
        bench(256, 1024, 1024, dtype, 25_000)
        bench(512, 1024, 1024, dtype, 20_000)
        bench(288, 1024, 1024, dtype, 25_000)   # qkvproj projection shape

