"""Reproduce the committed editing_e2e_unet adaptive-check FAIL (r4).

The committed run (harness at commit fb57266) called the adaptive-check
``write_sweep`` without ``grid_dt``; the fallback inferred it from the
session's ``solver_fix_step``, which a pure-adaptive session does not
have -> default 0.01, while the read grid was recorded at 0.02. The
forcing was therefore remapped to ``delta(2t)`` over the edit window:
the solver swept the ENTIRE 50-row grid (whose late-time rows average
1.43x the |delta| of the in-window rows) compressed into t<=0.5, at the
wrong trajectory phase. This script re-runs the identical adaptive
sweep with grid_dt forced to the buggy 0.01 and to the correct 0.02,
against the committed checkpoint + directions, demonstrating that the
buggy value reproduces the committed response (ratio ~2.17 vs the
Euler-0.02 comparator's 0.743) and the correct one lands in-gate.

Usage: JAX_PLATFORMS=cpu python experiments/adaptive_write_bug_repro.py
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
    grid_dt_true = float(dirs["t_grid"][1] - dirs["t_grid"][0])
    data = np.load(wd + "/read.npz")
    z_deltas = np.asarray(latentz_delta(jnp.asarray(data["latent"]),
                                        jnp.asarray(data["attr"])))

    n = 16
    end_scales = [-60.0, 0.0, 60.0]
    direction = select_direction(grid_all, 0)
    adaptive_sk = {"solver": "adaptive", "solver_adaptive": "dopri5",
                   "rtol": 1e-5, "atol": 1e-5, "controller": "i"}
    s2 = DissectSession(session.model, session.params,
                        solver_kwargs=adaptive_sk)
    for label, gd in (("buggy grid_dt=0.01 (r4 fallback)", 0.01),
                      (f"correct grid_dt={grid_dt_true:.2f}", grid_dt_true)):
        sweep = s2.write_sweep(direction, end_scales, n, grid_dt=gd,
                               grid_t0=grid_t0, loc="mid", t_edit=0.5,
                               rng=rng, z_shape=z_hwc)
        curve, _ = projection_curve(np.asarray(sweep, np.float32),
                                    z_deltas[0])
        resp = curve[-1] - curve[0]
        print(f"{label:34s} curve={['%.4f' % c for c in curve]} "
              f"resp={resp:+.4f} ratio_vs_euler0.02={resp / 0.7429:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
