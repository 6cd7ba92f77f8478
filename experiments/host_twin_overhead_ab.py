"""A/B the host-stepped Euler twin against the compiled lax.scan loop.

bench.py times the biggest samplers (T2I CFG) through a host-dispatched
twin because the tunnel's compile service crashes on the scan-of-50
programs (CLAUDE.md environment rules). The twin is step-identical
(tests/test_bench_contract.py), but it dispatches 50 separate programs
instead of one — this probe quantifies that dispatch overhead ONCE on a
model small enough that BOTH paths compile, so twin-produced bench
numbers carry a measured error bar instead of an assumed-zero one.

Async dispatch should pipeline the 50 steps on device (each step's
input is the previous output, so compute serializes identically; only
per-dispatch host latency can add). Expected: overhead ~= 50 x
round-trip dispatch cost, amortized to near-zero on multi-second
batches.

Usage: python experiments/host_twin_overhead_ab.py           (TPU)
       JAX_PLATFORMS=cpu python experiments/host_twin_overhead_ab.py --tiny
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp

BATCH, STEPS, REPS = 50, 50, 3


def main():
    import bench
    from uspace_tpu.core import flow
    from uspace_tpu.models import UViT

    if "--tiny" in sys.argv:  # CPU smoke: validates the harness only
        model = UViT(img_size=8, patch_size=4, in_chans=4, embed_dim=32,
                     depth=1, num_heads=2)
    else:
        # small enough that the scan-of-50 compiles everywhere, big
        # enough that per-step compute (~0.9 GFLOP) dominates dispatch
        model = UViT(img_size=32, patch_size=2, in_chans=4, embed_dim=256,
                     depth=8, num_heads=8, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    sz = model.img_size
    params = jax.jit(model.init)(
        rng, jnp.zeros((1, sz, sz, 4), jnp.float32), jnp.zeros((1,)))

    def vf_p(tb, x, p):
        return model.apply(p, x, tb)[0]

    @jax.jit
    def scan_run(p, z):
        return flow.decode(
            vf_p, z,
            {"solver": "fixed", "solver_fix": "euler",
             "solver_fix_step": 1.0 / STEPS},
            vf_params=p).mean()

    one = bench._host_euler_step(vf_p, STEPS)

    def twin_run(p, z):
        x = z
        for i in range(STEPS):
            x = one(p, x, jnp.int32(i))
        return float(x.mean())

    z = jax.random.normal(jax.random.fold_in(rng, 1),
                          (BATCH, sz, sz, 4), jnp.float32)

    for name, run in (("compiled-scan", lambda: float(scan_run(params, z))),
                      ("host-twin", lambda: twin_run(params, z))):
        run()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(REPS):
            run()
        dt = (time.perf_counter() - t0) / REPS
        print(f"AB {name}: {dt*1e3:.1f} ms/solve = {BATCH/dt:.2f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
