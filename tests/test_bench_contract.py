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


def _promotion_base():
    return {
        "dopri5_imgs_per_sec": 11.6, "dopri5_nfe": 80,
        "dopri5_rejections": 0,
        "dopri5_torchdiffeq_default_imgs_per_sec": 8.4,
        "dopri5_torchdiffeq_default_nfe": 110,
        "dopri5_vs_baseline_equal_nfe": 1.68,
        "dopri5_path": "compiled-while-loop",
        "dopri5_stage_delta_imgs_per_sec": 10.0,
        "dopri5_stage_delta_nfe": 110,
        "dopri5_stage_delta_rejections": 0,
        "dopri5_stage_delta_vs_baseline_equal_nfe": 2.0,
        "dopri5_stage_delta_path": "compiled-while-loop",
        "dopri5_stage_delta_tuned_imgs_per_sec": 13.6,
        "dopri5_stage_delta_tuned_nfe": 80,
        "dopri5_stage_delta_tuned_rejections": 0,
    }


def test_stage_delta_promotion_rules():
    """promote_stage_delta's like-for-like rules (advisor r4): promote
    only over a compiled bf16 basis, record what was promoted over, and
    leave the result untouched when the stage-delta lines lose."""
    import bench

    r = _promotion_base()
    assert bench.promote_stage_delta(r)
    assert r["dopri5_torchdiffeq_default_imgs_per_sec"] == 10.0
    assert r["dopri5_torchdiffeq_default_nfe"] == 110
    assert r["dopri5_default_view"] == "int8-stage-delta"
    assert r["dopri5_promoted_over"]["bf16_imgs_per_sec"] == 8.4
    assert r["dopri5_imgs_per_sec"] == 13.6
    assert r["dopri5_nfe"] == 80
    assert r["dopri5_tuned_promoted_over"]["bf16_imgs_per_sec"] == 11.6
    assert r["dopri5_tuned_view"] == "int8-stage-delta"

    # bf16 section fell back to the host driver -> no basis, no promotion
    r = _promotion_base()
    r["dopri5_path"] = "stages-device-fallback"
    assert not bench.promote_stage_delta(r)
    assert r["dopri5_torchdiffeq_default_imgs_per_sec"] == 8.4
    assert "dopri5_promoted_over" not in r

    # stage-delta slower than bf16 on both lines -> untouched
    r = _promotion_base()
    r["dopri5_stage_delta_imgs_per_sec"] = 8.0
    r["dopri5_stage_delta_tuned_imgs_per_sec"] = 11.0
    assert not bench.promote_stage_delta(r)
    assert r["dopri5_imgs_per_sec"] == 11.6

    # stage-delta itself on the host fallback: the default line may
    # still promote (an honest faster number), but the tuned line only
    # exists on the compiled path and must not
    r = _promotion_base()
    r["dopri5_stage_delta_path"] = "host-stages-fallback"
    assert bench.promote_stage_delta(r)
    assert r["dopri5_torchdiffeq_default_imgs_per_sec"] == 10.0
    assert "dopri5_tuned_promoted_over" not in r
    assert r["dopri5_imgs_per_sec"] == 11.6


def test_stage_delta_traced_safety_matches_static():
    """bench's dopri5 sections pass safety as a traced scalar so the 0.9
    (protocol) and 1.0 (tuned) measurements share one executable. The
    traced-safety solve must be bit-identical to baking the Python float
    into the trace — controller decisions and all."""
    from uspace_tpu.core import delta_field, solvers
    from uspace_tpu.models import UViT

    model = UViT(img_size=8, patch_size=2, in_chans=4, embed_dim=32,
                 depth=2, num_heads=2, quant=True)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 8, 4))
    params = model.init(rng, jnp.zeros((2, 8, 8, 4)), jnp.zeros((2,)))
    dp = delta_field.prepare_delta_params(params)

    def solve(dp, z, safety):
        fb, fd = delta_field.make_delta_field(model, dp)
        x1, s = solvers.odeint_adaptive(
            None, z, 0.0, 1.0, method="dopri5", rtol=1e-3, atol=1e-3,
            controller="i", safety=safety, return_stats=True,
            stage_delta=(fb, fd))
        return x1, s["nfe"]

    traced = jax.jit(solve)
    for safety in (0.9, 1.0):
        x_t, nfe_t = traced(dp, z, jnp.float32(safety))
        x_s, nfe_s = jax.jit(
            lambda dp, z, s=safety: solve(dp, z, s))(dp, z)
        assert int(nfe_t) == int(nfe_s)
        np.testing.assert_array_equal(np.asarray(x_t), np.asarray(x_s))


def test_bench_t2i_reports_path():
    """bench_t2i's provenance contract: returns (ips, path) with path in
    the two known execution modes."""
    import inspect

    import bench

    src = inspect.getsource(bench.run_section)
    assert "t2i_path" in src
    assert '"host-twin"' in inspect.getsource(bench.bench_t2i)
    assert '"compiled-loop"' in inspect.getsource(bench.bench_t2i)
