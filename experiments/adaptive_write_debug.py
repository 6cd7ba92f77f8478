"""Debug the pure-adaptive write response (editing_e2e_unet adaptive_check).

Reproduces the failing check from the full-scale trained SD-UNet editing
run on CPU (loads docs/editing_e2e_unet artifacts) and instruments it:

- fixed-step ladder (0.02, 0.01, 0.005, 0.002) to locate the continuous
  limit of the edited flow,
- dopri5 at rtol/atol 1e-5 (the harness setting) and tighter 1e-7/1e-8,
- rk4 fine fixed as a truth anchor.

If tight-tolerance dopri5 converges to the fine-fixed response, the 2.17x
ratio is pure step-size bias on a rough forcing (harness calibration
issue); if it converges to the ADAPTIVE answer, the fixed ladder is the
biased one; if it converges to neither, interp_grid/gating has a bug.

Usage: JAX_PLATFORMS=cpu python experiments/adaptive_write_debug.py
"""
import numpy as np

import uspace_tpu  # noqa: F401  (re-asserts JAX_PLATFORMS)
import jax
import jax.numpy as jnp


def main():
    from uspace_tpu.cli.dissect_common import build_session
    from uspace_tpu.cli.editing_e2e import projection_curve
    from uspace_tpu.configs.common import z_shape_hwc
    from uspace_tpu.configs.synthetic_attr_unet_e2e import get_config
    from uspace_tpu.editing.directions import latentz_delta, select_direction
    from uspace_tpu.editing.drivers import DissectSession

    wd = "docs/editing_e2e_unet"
    cfg = get_config()
    cfg.dissection.ckpt_path_to_dissect = wd + "/train/ckpts"
    print("platform:", jax.devices()[0].platform, flush=True)
    session, _ = build_session(cfg)
    z_hwc = z_shape_hwc(cfg)
    rng = jax.random.PRNGKey(cfg.seed)

    dirs = np.load(wd + "/directions_attr.npz")
    grid_all = jnp.asarray(dirs["directions"])
    grid_t0 = float(dirs["t_grid"][0])
    grid_dt = float(dirs["t_grid"][1] - dirs["t_grid"][0])
    data = np.load(wd + "/read.npz")
    z_deltas = np.asarray(latentz_delta(jnp.asarray(data["latent"]),
                                        jnp.asarray(data["attr"])))

    base_sk = dict(cfg.dissection.solver_kwargs)
    n = 16
    s_adapt = 60.0
    end_scales = [-s_adapt, 0.0, s_adapt]
    direction = select_direction(grid_all, 0)

    def response(sk, label):
        s2 = DissectSession(session.model, session.params, solver_kwargs=sk)
        sweep = s2.write_sweep(direction, end_scales, n, grid_dt=grid_dt,
                               grid_t0=grid_t0, loc="mid", t_edit=0.5,
                               rng=rng, z_shape=z_hwc)
        curve, _ = projection_curve(np.asarray(sweep, np.float32),
                                    z_deltas[0])
        resp = curve[-1] - curve[0]
        print(f"{label:34s} curve={['%.4f' % c for c in curve]} "
              f"resp={resp:+.4f}", flush=True)
        return resp

    for step in (0.02, 0.01, 0.005, 0.002):
        response({**base_sk, "solver": "fixed", "solver_fix_step": step},
                 f"fixed euler {step}")
    response({**base_sk, "solver": "fixed", "solver_fix": "rk4",
              "solver_fix_step": 0.005}, "fixed rk4 0.005")
    for tol in (1e-5, 1e-7, 1e-8):
        response({"solver": "adaptive", "solver_adaptive": "dopri5",
                  "rtol": tol, "atol": tol, "controller": "i"},
                 f"dopri5 rtol=atol={tol}")
    response({**base_sk, "solver": "fixadp", "solver_fix_step": 0.02,
              "solver_adaptive": "dopri5", "rtol": 1e-5, "atol": 1e-5,
              "controller": "i"}, "fixadp 0.02+dopri5")


if __name__ == "__main__":
    main()
