"""Pins bench.py's measurement twins to the programs they stand in for.

The tunnel backend cannot compile the biggest scan programs, so bench.py
times a host-dispatched Euler twin instead (``_host_euler_step`` /
``host_euler_solve``) and reports which path produced each number
(``t2i_path``). These tests make the twin's step-equivalence a pinned
fact rather than a comment: the host recurrence must reproduce
``flow.decode(..., euler)`` exactly (same step points, same update) for
a CFG field — the exact field bench_t2i measures."""

import numpy as np

import jax
import jax.numpy as jnp


def _tiny_cfg_field():
    from uspace_tpu.models import UViTT2I

    model = UViTT2I(img_size=8, patch_size=2, in_chans=4, embed_dim=32,
                    num_heads=4, depth=2, clip_dim=16, num_clip_token=3)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 8, 8, 4), jnp.float32)
    ctx0 = jnp.zeros((1, 3, 16), jnp.float32)
    params = model.init(rng, x0, jnp.zeros((1,)), ctx0)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (4, 3, 16))

    def vf_p(tb, x, p):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([tb, tb], axis=0)
        ctx2 = jnp.concatenate([ctx, jnp.zeros_like(ctx)], axis=0)
        v2 = model.apply(p, x2, t2, ctx2)[0]
        v_c, v_u = jnp.split(v2, 2, axis=0)
        return v_u + 2.0 * (v_c - v_u)

    return vf_p, params


def test_host_euler_twin_matches_compiled_loop():
    import bench
    from uspace_tpu.core import flow

    vf_p, params = _tiny_cfg_field()
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 4))
    steps = 7  # odd, != bench.STEPS: equivalence must not be shape luck

    twin = bench.host_euler_solve(vf_p, params, z, steps=steps)
    compiled = jax.jit(lambda p, z: flow.decode(
        vf_p, z, {"solver": "fixed", "solver_fix": "euler",
                  "solver_fix_step": 1.0 / steps},
        vf_params=p))(params, z)

    # identical step sequence -> identical floats (both paths evaluate
    # the same jitted field at the same (t, x) pairs)
    np.testing.assert_allclose(np.asarray(twin), np.asarray(compiled),
                               rtol=1e-6, atol=1e-7)


def test_bench_t2i_reports_path():
    """bench_t2i's provenance contract: returns (ips, path) with path in
    the two known execution modes."""
    import inspect

    import bench

    src = inspect.getsource(bench.run_section)
    assert "t2i_path" in src
    assert '"host-twin"' in inspect.getsource(bench.bench_t2i)
    assert '"compiled-loop"' in inspect.getsource(bench.bench_t2i)
