"""Unit tests for the flow-matching interpolant and ODE solvers.

The reference has no tests (SURVEY.md §4); these validate the CFM algebra
against its closed forms and the solvers against analytically solvable
fields (linear ODEs), including the exact-inversion round trip that the
editing pipeline depends on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uspace_tpu.core import flow, interpolant, solvers


class TestInterpolant:
    def test_endpoints(self, rng):
        x1 = jax.random.normal(rng, (4, 8, 8, 3))
        eps = jax.random.normal(jax.random.fold_in(rng, 1), x1.shape)
        sigma_min = 1e-4
        t0 = jnp.zeros((4,))
        t1 = jnp.ones((4,))
        # t=0 -> pure noise; t=1 -> x1 + sigma_min * eps
        np.testing.assert_allclose(
            interpolant.interpolate(x1, eps, t0, sigma_min), eps, rtol=1e-6
        )
        np.testing.assert_allclose(
            interpolant.interpolate(x1, eps, t1, sigma_min),
            x1 + sigma_min * eps,
            rtol=1e-5,
            atol=1e-6,
        )

    def test_target_velocity_is_path_derivative(self, rng):
        # d/dt x_t = x1 - (1 - sigma_min) * eps = u, independent of t
        x1 = jax.random.normal(rng, (2, 4, 4, 2))
        eps = jax.random.normal(jax.random.fold_in(rng, 1), x1.shape)
        sigma_min = 1e-4
        t = jnp.array([0.3, 0.7])
        dt = 1e-3
        fd = (
            interpolant.interpolate(x1, eps, t + dt, sigma_min)
            - interpolant.interpolate(x1, eps, t - dt, sigma_min)
        ) / (2 * dt)
        np.testing.assert_allclose(
            fd, interpolant.target_velocity(x1, eps, sigma_min), rtol=1e-3, atol=1e-4
        )

    def test_cfm_loss_shape_and_value(self, rng):
        x = jax.random.normal(rng, (3, 4, 4, 2))
        assert interpolant.cfm_loss(x, x).shape == (3,)
        np.testing.assert_allclose(interpolant.cfm_loss(x, x), 0.0, atol=1e-7)
        loss = interpolant.cfm_loss(x, jnp.zeros_like(x))
        np.testing.assert_allclose(loss, (x**2).mean(axis=(1, 2, 3)), rtol=1e-6)

    def test_training_loss_of_perfect_model_small(self, rng):
        # A model that predicts exactly u_t has zero loss.
        x1 = jax.random.normal(rng, (8, 4, 4, 1))
        sigma_min = 1e-4
        t, x_t, u_t = interpolant.sample_path(jax.random.fold_in(rng, 7), x1, sigma_min)
        loss = interpolant.cfm_loss(u_t, u_t)
        assert float(loss.max()) < 1e-10


def _linear_vf(a):
    return lambda t, x: a * x


class TestFixedSolvers:
    @pytest.mark.parametrize(
        "method,order,grids",
        [("euler", 1, (20, 40)), ("midpoint", 2, (8, 16)), ("rk4", 4, (2, 4))],
    )
    def test_exponential_convergence(self, method, order, grids):
        # dx/dt = -x, x(0)=1 -> x(1)=exp(-1); error ~ O(h^order).
        # Grids are coarse enough that the error sits above f32 noise.
        x0 = jnp.ones((2, 3))
        exact = float(np.exp(-1.0))
        errs = []
        for n in grids:
            x1 = solvers.odeint_fixed(_linear_vf(-1.0), x0, 0.0, 1.0, n, method)
            errs.append(abs(float(x1[0, 0]) - exact))
        rate = np.log2(errs[0] / max(errs[1], 1e-14))
        assert rate > order - 0.5, (errs, rate)
        assert errs[1] < 10.0 ** (-order)

    def test_time_dependent_field(self):
        # dx/dt = 2t -> x(1) = x(0) + 1
        x1 = solvers.odeint_fixed(lambda t, x: 2 * t * jnp.ones_like(x),
                                  jnp.zeros((1,)), 0.0, 1.0, 100, "rk4")
        np.testing.assert_allclose(x1, 1.0, rtol=1e-5)

    def test_reverse_time(self):
        # integrate forward then backward -> identity (exact inversion basis)
        vf = _linear_vf(0.7)
        x0 = jnp.linspace(-1, 1, 6).reshape(2, 3)
        xf = solvers.odeint_fixed(vf, x0, 0.0, 1.0, 200, "rk4")
        xb = solvers.odeint_fixed(vf, xf, 1.0, 0.0, 200, "rk4")
        np.testing.assert_allclose(xb, x0, rtol=1e-5, atol=1e-6)

    def test_aux_capture_stacks_per_step(self):
        def vf(t, x):
            return -x, {"tap": x * 2.0, "t": t}

        x1, aux = solvers.odeint_fixed(
            vf, jnp.ones((2,)), 0.0, 1.0, 10, "euler", has_aux=True
        )
        assert aux["tap"].shape == (10, 2)
        assert aux["t"].shape == (10,)
        np.testing.assert_allclose(aux["t"], jnp.arange(10) / 10, atol=1e-6)
        np.testing.assert_allclose(aux["tap"][0], 2.0)

    def test_jittable(self):
        f = jax.jit(
            lambda x: solvers.odeint_fixed(_linear_vf(-1.0), x, 0.0, 1.0, 50, "euler")
        )
        out = f(jnp.ones((4,)))
        assert out.shape == (4,)


class TestAdaptiveSolvers:
    @pytest.mark.parametrize("method", ["dopri5", "bosh3", "adaptive_heun"])
    def test_exponential(self, method):
        x0 = jnp.ones((2, 2))
        x1 = solvers.odeint_adaptive(_linear_vf(-1.0), x0, 0.0, 1.0, method=method)
        np.testing.assert_allclose(x1, np.exp(-1.0), rtol=1e-4)

    def test_tolerance_scaling(self):
        # tighter tolerance -> smaller error on a stiff-ish oscillator
        def vf(t, x):
            return jnp.stack([x[1], -25.0 * x[0]])

        x0 = jnp.array([1.0, 0.0])
        exact = np.array([np.cos(5.0), -5 * np.sin(5.0)])
        loose = solvers.odeint_adaptive(vf, x0, 0.0, 1.0, rtol=1e-3, atol=1e-3)
        tight = solvers.odeint_adaptive(vf, x0, 0.0, 1.0, rtol=1e-7, atol=1e-7)
        assert np.abs(tight - exact).max() < np.abs(loose - exact).max()
        np.testing.assert_allclose(tight, exact, rtol=1e-4, atol=1e-5)

    def test_reverse_time(self):
        vf = _linear_vf(0.5)
        x0 = jnp.ones((3,))
        xf = solvers.odeint_adaptive(vf, x0, 0.0, 1.0)
        xb = solvers.odeint_adaptive(vf, xf, 1.0, 0.0)
        np.testing.assert_allclose(xb, x0, rtol=1e-4)

    def test_jittable(self):
        f = jax.jit(lambda x: solvers.odeint_adaptive(_linear_vf(-1.0), x, 0.0, 1.0))
        np.testing.assert_allclose(f(jnp.ones((2,))), np.exp(-1.0), rtol=1e-4)

    def test_safety_as_traced_argument(self):
        """``safety`` must be acceptable as a TRACED jit argument (the
        bench sweeps controller safety without recompiling) and keep the
        tolerance contract: same accept test, so accuracy stays within
        the same order while higher safety takes fewer steps."""
        def vf(t, x):
            return jnp.stack([x[1], -25.0 * x[0]])

        x0 = jnp.array([1.0, 0.0])
        exact = np.array([np.cos(5.0), -5 * np.sin(5.0)])

        @jax.jit
        def run(x0, safety):
            return solvers.odeint_adaptive(
                vf, x0, 0.0, 1.0, rtol=1e-6, atol=1e-6, safety=safety,
                return_stats=True)

        x09, s09 = run(x0, jnp.float32(0.9))
        x10, s10 = run(x0, jnp.float32(1.0))
        np.testing.assert_allclose(x09, exact, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(x10, exact, rtol=2e-4, atol=2e-5)
        assert int(s10["accepted"]) <= int(s09["accepted"])

    def test_pi_controller_same_accuracy_fewer_rejects(self):
        """PI control keeps the tolerance contract (same accuracy on a
        known solution) and never accepts a step the I-controller's test
        would reject; on an oscillator it needs no more total steps."""
        def vf(t, x):
            return jnp.stack([x[1], -25.0 * x[0]])

        x0 = jnp.array([1.0, 0.0])
        exact = np.array([np.cos(5.0), -5 * np.sin(5.0)])
        xi, si = solvers.odeint_adaptive(vf, x0, 0.0, 1.0, rtol=1e-6,
                                         atol=1e-6, controller="i",
                                         return_stats=True)
        xp, sp = solvers.odeint_adaptive(vf, x0, 0.0, 1.0, rtol=1e-6,
                                         atol=1e-6, controller="pi",
                                         return_stats=True)
        np.testing.assert_allclose(xi, exact, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(xp, exact, rtol=1e-4, atol=1e-5)
        # PI damps the step-size dynamics: its rejection *rate* must not
        # exceed I's (the raw step counts may differ either way on a toy
        # problem; the sampler-scale NFE win is measured in bench.py)
        rej_i = (int(si["steps"]) - int(si["accepted"])) / int(si["steps"])
        rej_p = (int(sp["steps"]) - int(sp["accepted"])) / int(sp["steps"])
        assert rej_p <= rej_i + 1e-9

    def test_host_driver_matches_device_loop(self):
        """odeint_adaptive_host (python loop + one jitted RK-step
        program, for backends whose compiler can't take the full
        while_loop) must reproduce the device loop step-for-step."""
        def vf(t, x):
            return jnp.stack([x[1], -25.0 * x[0]])

        x0 = jnp.array([1.0, 0.0])
        for ctrl in ("i", "pi"):
            xd, sd = solvers.odeint_adaptive(
                vf, x0, 0.0, 1.0, rtol=1e-6, atol=1e-6, controller=ctrl,
                return_stats=True)
            xh, sh = solvers.odeint_adaptive_host(
                vf, x0, 0.0, 1.0, rtol=1e-6, atol=1e-6, controller=ctrl,
                return_stats=True)
            assert int(sd["steps"]) == sh["steps"]
            assert int(sd["accepted"]) == sh["accepted"]
            np.testing.assert_allclose(np.asarray(xh), np.asarray(xd),
                                       rtol=1e-4, atol=1e-5)

    def test_stage_dispatch_matches_fused_host(self):
        """program="stages" (per-stage dispatch; jit(vf) is the only
        program containing the field — for compiler services that reject
        even one fused RK step over a large denoiser) must take the same
        steps as the fused host program and the device loop; values agree
        to float-summation-order tolerance."""
        def vf(t, x):
            return jnp.stack([x[1], -25.0 * x[0]])

        x0 = jnp.array([1.0, 0.0])
        for method in ("dopri5", "adaptive_heun"):  # fsal and non-fsal
            for ctrl in ("i", "pi"):
                xf, sf = solvers.odeint_adaptive_host(
                    vf, x0, 0.0, 1.0, method=method, rtol=1e-6, atol=1e-6,
                    controller=ctrl, return_stats=True)
                xs, ss = solvers.odeint_adaptive_host(
                    vf, x0, 0.0, 1.0, method=method, rtol=1e-6, atol=1e-6,
                    controller=ctrl, return_stats=True, program="stages")
                assert sf["steps"] == ss["steps"], (method, ctrl)
                assert sf["accepted"] == ss["accepted"], (method, ctrl)
                np.testing.assert_allclose(np.asarray(xs), np.asarray(xf),
                                           rtol=1e-5, atol=1e-6)

    def test_host_driver_vf_params_threading(self):
        """vf_params must reach the field as an explicit argument (the
        closure-capture alternative bakes multi-GB param trees into the
        executable payload — the root cause of the tunnel's compile
        crashes) and reproduce the closure-based solve exactly."""
        w = jnp.asarray([[0.0, 1.0], [-25.0, 0.0]], jnp.float32)
        x0 = jnp.array([1.0, 0.0])

        def vf_closure(t, x):
            return w @ x

        def vf_arg(t, x, p):
            return p["w"] @ x

        for program in ("fused", "stages"):
            xc, sc = solvers.odeint_adaptive_host(
                vf_closure, x0, 0.0, 1.0, rtol=1e-6, atol=1e-6,
                return_stats=True, program=program)
            xa, sa = solvers.odeint_adaptive_host(
                vf_arg, x0, 0.0, 1.0, rtol=1e-6, atol=1e-6,
                return_stats=True, program=program, vf_params={"w": w})
            assert sc["steps"] == sa["steps"]
            np.testing.assert_array_equal(np.asarray(xc), np.asarray(xa))

    def test_stages_device_matches_device_loop(self):
        """program="stages_device" (on-device f32 controller advanced by
        tiny programs; host dispatches attempts blindly) must reproduce
        the device while_loop's step sequence, and an expected_steps
        blind-dispatch run must be an exact no-op-padded twin."""
        def vf(t, x):
            return jnp.stack([x[1], -25.0 * x[0]])

        x0 = jnp.array([1.0, 0.0])
        for method in ("dopri5", "adaptive_heun"):
            for ctrl in ("i", "pi"):
                xd, sd = solvers.odeint_adaptive(
                    vf, x0, 0.0, 1.0, method=method, rtol=1e-6, atol=1e-6,
                    controller=ctrl, return_stats=True)
                xs, ss = solvers.odeint_adaptive_host(
                    vf, x0, 0.0, 1.0, method=method, rtol=1e-6, atol=1e-6,
                    controller=ctrl, return_stats=True,
                    program="stages_device")
                assert int(sd["steps"]) == ss["steps"], (method, ctrl)
                assert int(sd["accepted"]) == ss["accepted"], (method, ctrl)
                np.testing.assert_allclose(np.asarray(xs), np.asarray(xd),
                                           rtol=1e-5, atol=1e-6)
                # blind dispatch with a deliberate overestimate: no-op
                # attempts past t1 must not change the result or stats
                xb, sb = solvers.odeint_adaptive_host(
                    vf, x0, 0.0, 1.0, method=method, rtol=1e-6, atol=1e-6,
                    controller=ctrl, return_stats=True,
                    program="stages_device",
                    expected_steps=ss["steps"] + 5)
                assert sb["steps"] == ss["steps"]
                assert sb["accepted"] == ss["accepted"]
                np.testing.assert_array_equal(np.asarray(xb),
                                              np.asarray(xs))

    def test_stage_dispatch_via_solver_kwargs(self):
        sk = {"solver": "adaptive", "solver_adaptive": "dopri5",
              "driver": "host", "program": "stages", "rtol": 1e-6,
              "atol": 1e-6}
        x1 = solvers.odeint(_linear_vf(-1.0), jnp.ones((2,)), 0.0, 1.0, sk)
        np.testing.assert_allclose(x1, np.exp(-1.0), rtol=1e-4)

    def test_stages_device_reverse_time(self):
        """Reverse-time solves (t: 1 -> 0, the encode direction) through
        stages_device: the sign-aware remaining-span clamp must track
        direction=-1, and blind no-op padding must hold there too."""
        def vf(t, x):
            return jnp.stack([x[1], -25.0 * x[0]])

        x1 = jnp.array([np.cos(5.0), -5 * np.sin(5.0)], jnp.float32)
        xd, sd = solvers.odeint_adaptive(
            vf, x1, 1.0, 0.0, rtol=1e-6, atol=1e-6, return_stats=True)
        xs, ss = solvers.odeint_adaptive_host(
            vf, x1, 1.0, 0.0, rtol=1e-6, atol=1e-6, return_stats=True,
            program="stages_device")
        assert int(sd["steps"]) == ss["steps"]
        np.testing.assert_allclose(np.asarray(xs), np.asarray(xd),
                                   rtol=1e-5, atol=1e-6)
        xb, sb = solvers.odeint_adaptive_host(
            vf, x1, 1.0, 0.0, rtol=1e-6, atol=1e-6, return_stats=True,
            program="stages_device", expected_steps=ss["steps"] + 4)
        assert sb["steps"] == ss["steps"]
        np.testing.assert_array_equal(np.asarray(xb), np.asarray(xs))
        # both recover the t=0 initial condition of the oscillator
        np.testing.assert_allclose(np.asarray(xs), [1.0, 0.0],
                                   rtol=1e-3, atol=1e-3)

    def test_vf_params_through_fixadp(self):
        """vf_params binds through the fixadp split solve too."""
        from uspace_tpu.core import flow

        a = jnp.float32(0.25)
        z = jnp.full((2, 4, 4, 4), 0.5, jnp.float32)

        def vf(tb, x, p):
            return jnp.full_like(x, 1.0) * p["a"]

        sk = {"solver": "fixadp", "solver_fix": "euler",
              "solver_fix_step": 0.05, "solver_adaptive": "dopri5",
              "rtol": 1e-6, "atol": 1e-6}
        x1 = flow.decode(vf, z, sk, t_edit=0.4, vf_params={"a": a})
        np.testing.assert_allclose(np.asarray(x1), 0.75, rtol=1e-4)

    def test_vf_params_through_flow_decode(self):
        """flow.decode/odeint thread vf_params to every solver kind:
        host drivers get it as explicit program arguments; in-graph
        solvers bind it. Field signature becomes vf(t_batch, x, p)."""
        from uspace_tpu.core import flow

        a = jnp.float32(0.25)
        z = jnp.full((2, 4, 4, 4), 0.5, jnp.float32)

        def vf(tb, x, p):
            assert tb.ndim == 1
            return jnp.full_like(x, 1.0) * p["a"]

        for sk in (
            {"solver": "fixed", "solver_fix": "euler",
             "solver_fix_step": 0.1},
            {"solver": "adaptive", "solver_adaptive": "dopri5",
             "rtol": 1e-6, "atol": 1e-6},
            {"solver": "adaptive", "solver_adaptive": "dopri5",
             "driver": "host", "program": "stages", "rtol": 1e-6,
             "atol": 1e-6},
            {"solver": "adaptive", "solver_adaptive": "dopri5",
             "driver": "host", "program": "stages_device", "rtol": 1e-6,
             "atol": 1e-6},
        ):
            x1 = flow.decode(vf, z, sk, vf_params={"a": a})
            np.testing.assert_allclose(np.asarray(x1), 0.75, rtol=1e-4)

    def test_stats_nfe_accounting(self):
        _, s = solvers.odeint_adaptive(_linear_vf(-1.0), jnp.ones((2,)),
                                       0.0, 1.0, return_stats=True)
        assert int(s["nfe"]) == 2 + 6 * int(s["steps"])  # dopri5 FSAL
        assert 0 < int(s["accepted"]) <= int(s["steps"])


class TestSolverDispatch:
    def test_fixed_kwargs(self):
        sk = {"solver": "fixed", "solver_fix": "euler", "solver_fix_step": 0.01}
        x1 = solvers.odeint(_linear_vf(-1.0), jnp.ones((2,)), 0.0, 1.0, sk)
        np.testing.assert_allclose(x1, np.exp(-1.0), rtol=1e-2)

    def test_fixadp(self):
        sk = {
            "solver": "fixadp",
            "solver_fix": "euler",
            "solver_fix_step": 0.005,
            "solver_adaptive": "dopri5",
        }
        x1 = solvers.odeint(_linear_vf(-1.0), jnp.ones((2,)), 0.0, 1.0, sk, t_mid=0.4)
        np.testing.assert_allclose(x1, np.exp(-1.0), rtol=1e-2)

    def test_default_is_dopri5(self):
        x1 = solvers.odeint(_linear_vf(-1.0), jnp.ones((2,)), 0.0, 1.0, None)
        np.testing.assert_allclose(x1, np.exp(-1.0), rtol=1e-4)

    def test_kwargs_carry_tolerances_and_controller(self):
        sk = {"solver": "adaptive", "solver_adaptive": "dopri5",
              "rtol": 1e-7, "atol": 1e-7, "controller": "pi"}
        x1 = solvers.odeint(_linear_vf(-1.0), jnp.ones((2,)), 0.0, 1.0, sk)
        np.testing.assert_allclose(x1, np.exp(-1.0), rtol=1e-6)


class TestFlowDriver:
    def test_decode_encode_roundtrip(self, rng):
        # A fixed linear velocity field: decode then encode recovers z.
        w = 0.8

        def velocity_fn(t_batch, x):
            return w * x

        z = jax.random.normal(rng, (2, 4, 4, 2))
        x = flow.decode(velocity_fn, z,
                        {"solver": "fixed", "solver_fix": "rk4",
                         "solver_fix_step": 0.02})
        z_rec = flow.encode(velocity_fn, x,
                            {"solver_fix": "rk4", "solver_fix_step": 0.02})
        np.testing.assert_allclose(z_rec, z, rtol=1e-4, atol=1e-5)

    def test_training_loss_runs_and_is_positive(self, rng):
        def velocity_fn(t, x):
            return jnp.zeros_like(x)

        x1 = jax.random.normal(rng, (4, 4, 4, 2))
        loss = flow.training_loss(velocity_fn, rng, x1, 1e-4)
        assert loss.shape == (4,)
        assert float(loss.mean()) > 0.1
