"""End-to-end editing verification harness.

Runs the complete README workflow (reference `/root/reference/README.md:42-65`
steps 1-3: read activations → build attr/PCA directions → write/steer) against
a *trained* checkpoint and verifies quantitatively that the u-space edit moves
the intended attribute, using the classifier-free proxy: the projection of the
generated latents onto the attribute's own z-space delta direction
(``latentz_delta``, reference ``tools/utils_attr.py:145-157``) must move
monotonically with the write scale, with an effect size ≥ 1 batch-std. For the
``synthetic_attr`` dataset the ground-truth planted pattern
(``SyntheticAttrFeatures.patterns``) provides an exact second check.

A mean-difference direction at an interior tap is only defined up to *sign*:
how the decoder half uses the mid pathway (vs the long skips) fixes the
output-space orientation, and nothing in the construction pins it — which is
why the reference sweeps signed ``write_scales`` spanning ±500 and reads the
orientation off the grids. The harness calibrates it automatically (the
measured response sign is reported as ``orientation``) and verifies magnitude
+ monotonicity of the oriented response.

Outputs into ``--workdir``:
  - ``read.npz``, ``directions_attr.npz``, ``directions_pca.npz``
  - ``write_attr{a}_sweep.png`` scale-sweep grids
  - ``roundtrip.txt`` encode→decode reconstruction numbers
  - ``editing_e2e.json`` + ``editing_e2e.md`` — the projection-vs-scale
    tables and pass/fail verdicts (monotone + sign-correct response).

Usage:
    python -m uspace_tpu.cli.editing_e2e \
        --config=uspace_tpu/configs/synthetic_attr_e2e.py \
        --config.dissection.ckpt_path_to_dissect=<workdir>/ckpts \
        --workdir=e2e_out
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags, logging
from ml_collections import config_flags

FLAGS = flags.FLAGS
if "config" not in FLAGS:
    config_flags.DEFINE_config_file("config", None, "experiment config",
                                    lock_config=False)
if "workdir" not in FLAGS:
    flags.DEFINE_string("workdir", "e2e_out", "output root")
flags.mark_flags_as_required(["config"])


def _normalized(v: np.ndarray) -> np.ndarray:
    return v / max(np.linalg.norm(v), 1e-12)


def projection_matrix(sweep: np.ndarray, direction: np.ndarray) -> np.ndarray:
    """[S, B] per-sample projections of [S, B, ...] latents onto a unit
    direction."""
    u = _normalized(np.asarray(direction, np.float64).ravel())
    flat = np.asarray(sweep, np.float64).reshape(sweep.shape[0], sweep.shape[1], -1)
    return flat @ u


def projection_curve(sweep: np.ndarray, direction: np.ndarray):
    """Per-scale mean projection of [S, B, ...] latents onto a unit
    direction, plus the per-sample std at each scale."""
    proj = projection_matrix(sweep, direction)
    return ([float(x) for x in proj.mean(axis=1)],
            [float(x) for x in proj.std(axis=1)])


def paired_move_sems(proj: np.ndarray):
    """Standard error of each adjacent-scale move of a projection curve.

    The sweep decodes the SAME z batch at every scale, so adjacent-scale
    moves are paired: the noise on ``mean(proj[i+1] - proj[i])`` is the
    paired-difference SEM, not the (much larger) cross-sample spread of
    the projections themselves. Used to decide which ground-truth moves
    are statistically real (supported-pair masking below)."""
    b = proj.shape[1]
    if b < 2:
        # a single sample gives no paired-difference estimate (ddof=1
        # would divide by zero -> NaN, silently failing every >=3*SEM
        # support test); report infinite uncertainty so zero pairs are
        # supported and run() falls back to the raw monotone fraction
        # explicitly (supported_pairs == 0 in the record)
        return [float("inf")] * (proj.shape[0] - 1)
    d = proj[1:] - proj[:-1]  # [S-1, B] paired moves
    return [float(x) for x in d.std(axis=1, ddof=1) / np.sqrt(b)]


def monotone_fraction(curve, scales, mask=None) -> float:
    """Fraction of adjacent scale pairs where the projection moves the
    same way as the scale (1.0 = perfectly monotone response).

    ``mask`` (optional, one bool per adjacent pair) restricts the count
    to the pairs where it is True — used for the saturation-aware gate:
    judge the edit's monotonicity only where the model's own
    ground-truth response is monotone. With every pair masked out the
    fraction is vacuously 1.0 (the remaining gates — effect size and
    gt agreement — still apply)."""
    ok = tot = 0
    for i in range(len(curve) - 1):
        ds = scales[i + 1] - scales[i]
        if ds == 0 or (mask is not None and not mask[i]):
            continue
        tot += 1
        ok += (curve[i + 1] - curve[i]) * ds > 0
    return ok / tot if tot else 1.0


def run(config, workdir: str) -> dict:
    from ..configs.common import z_shape_hwc
    from ..data.datasets import get_dataset
    from ..data.loader import DataLoader
    from ..editing.directions import latentz_delta, select_direction
    from ..editing.drivers import build_directions_npz
    from ..utils.vis import make_grid, save_image
    from .dissect_common import build_session

    d = config.dissection
    os.makedirs(workdir, exist_ok=True)
    session, vae_decode = build_session(config)
    rng = jax.random.PRNGKey(config.seed)
    z_hwc = z_shape_hwc(config)
    scales = [float(s) for s in d.write_scales]
    edit_loc = d.get("edit_loc") or "mid"

    # -- step 1: read (encode real data, capture activations) ---------------
    read_path = os.path.join(workdir, "read.npz")
    if not os.path.exists(read_path):
        dataset = get_dataset(**dict(config.dataset))
        loader = DataLoader(dataset.get_split("train"), d.mini_batch_size,
                            shuffle=False, num_workers=config.dl.num_workers)
        out = session.read(
            iter(loader), tap=edit_loc, max_samples=d.n_samples, rng=rng,
            from_moments=config.train.get("from_moments", True),
        )
        np.savez(read_path, **out)
        logging.info("read: feats %s -> %s", out["feats"].shape, read_path)
    data = np.load(read_path)
    if "attr" not in data:
        raise ValueError("editing_e2e needs an attributed dataset "
                         "(read.npz has no 'attr')")
    num_attrs = data["attr"].shape[1]

    # -- step 2: directions (attr + pca) -------------------------------------
    attr_npz = build_directions_npz(read_path,
                                    os.path.join(workdir, "directions_attr.npz"),
                                    mode="attr")
    build_directions_npz(read_path, os.path.join(workdir, "directions_pca.npz"),
                         mode="pca", pca_n=min(int(d.pca_n), 8))
    dirs = np.load(attr_npz)
    grid_all = jnp.asarray(dirs["directions"])  # [T, A, ...]
    grid_t0 = float(dirs["t_grid"][0])
    # the delta grid's time spacing is a property of the READ artifact,
    # not of whatever solver the write runs under — pass it explicitly
    # everywhere (write_sweep's fallback infers it from the session's
    # solver_fix_step, which is wrong for adaptive sessions and for
    # fixed sessions at a different step than the read)
    grid_dt = (float(dirs["t_grid"][1] - dirs["t_grid"][0])
               if len(dirs["t_grid"]) > 1 else 0.01)

    # z-space proxy directions from the read data itself
    z_deltas = np.asarray(latentz_delta(jnp.asarray(data["latent"]),
                                        jnp.asarray(data["attr"])))

    # optional ground truth for the synthetic_attr dataset
    gt_patterns = None
    if config.dataset.get("name") == "synthetic_attr":
        from ..data.datasets import SyntheticAttrFeatures

        gt_patterns = SyntheticAttrFeatures.patterns(
            tuple(z_hwc), int(config.dataset.get("num_attrs", 4)))

    # -- step 3: write sweeps + proxy metric ---------------------------------
    n = min(int(d.n_samples), int(d.mini_batch_size), 16)
    results = []
    for a in range(num_attrs):
        sweep = session.write_sweep(
            select_direction(grid_all, a), scales, n,
            grid_dt=grid_dt, grid_t0=grid_t0, loc=edit_loc,
            t_edit=float(d.t_edit), rng=rng, z_shape=z_hwc,
        )
        sweep = np.asarray(sweep, np.float32)  # [S, B, ...]
        curve, stds = projection_curve(sweep, z_deltas[a])
        response = curve[-1] - curve[0]
        orientation = 1 if response >= 0 else -1
        oriented = [orientation * c for c in curve]
        i0 = scales.index(0.0) if 0.0 in scales else len(scales) // 2
        rec = {
            "attr": a,
            "scales": scales,
            "proj_latentz_delta": curve,
            "orientation": orientation,
            "monotone_fraction": monotone_fraction(oriented, scales),
            "response": abs(response),
            "effect_size": abs(response) / max(stds[i0], 1e-9),
        }
        if gt_patterns is not None:
            gt_curve, _ = projection_curve(sweep, gt_patterns[a])
            rec["proj_ground_truth"] = gt_curve
            gt_resp = gt_curve[-1] - gt_curve[0]
            gt_oriented = [orientation * c for c in gt_curve]
            rec["gt_monotone_fraction"] = monotone_fraction(
                gt_oriented, scales)
            # both attribute measures must move together
            rec["gt_agrees"] = bool(gt_resp * response >= 0 or gt_resp == 0)
            # saturation-aware monotonicity: strong-leverage taps (the
            # UNet bottleneck) saturate the model's OWN ground-truth
            # response at the sweep ends — the edit faithfully tracks it
            # (gt_agrees), but no edit can be scale-monotone where the
            # model itself is not. Judge the edit only on scale pairs
            # where the ground-truth projection moves monotonically AND
            # by a statistically real amount: the sweep decodes the same
            # z batch at every scale, so each gt move has a measured
            # paired-difference SEM — a move below 3 SEM is noise and
            # carries no monotonicity signal either way. This tests the
            # editing machinery, not the toy model. A supported fraction
            # is only meaningful with >= 2 supported pairs; with fewer,
            # fall back to the raw fraction instead of reporting a
            # vacuous 1.0 (advisor r4).
            gt_proj = projection_matrix(sweep, gt_patterns[a])
            gt_sems = paired_move_sems(gt_proj * orientation)
            gt_mono_pair = [
                (gt_oriented[i + 1] - gt_oriented[i])
                * (scales[i + 1] - scales[i]) > 0
                and abs(gt_oriented[i + 1] - gt_oriented[i])
                >= 3.0 * gt_sems[i]
                for i in range(len(scales) - 1)
            ]
            rec["supported_pairs"] = int(sum(gt_mono_pair))
            rec["monotone_fraction_supported"] = (
                monotone_fraction(oriented, scales, mask=gt_mono_pair)
                if rec["supported_pairs"] >= 2
                else monotone_fraction(oriented, scales))
        results.append(rec)

        flat = sweep.reshape(-1, *sweep.shape[2:])
        from .dissect_common import decode_images

        img = decode_images(vae_decode, flat, int(d.mini_batch_size))
        save_image(make_grid(img, nrow=n),
                   os.path.join(workdir, f"write_attr{a}_sweep.png"))

    # -- step 3b: the same write under adaptive / fixadp solves ---------------
    # (reference interp_ode / interp_ode_unet, libs/dissection.py:189-282,
    # flow_matching.py:153-180): adaptive steppers evaluate the field at
    # arbitrary off-grid t, so the per-timestep delta grid must be
    # INTERPOLATED (editing.specs.interp_grid). This re-runs attr 0's
    # write at the sweep endpoints under (a) a pure dopri5 solve with the
    # edit active throughout and (b) the reference's fixadp composition
    # (fixed steps while the edit is active, dopri5 after t_edit=0.5),
    # asserting the oriented response agrees with the fixed-step sweep.
    adaptive_checks = []
    if d.get("adaptive_check"):
        from ..editing.drivers import DissectSession

        base_sk = dict(d.solver_kwargs)
        # half the max sweep scale: families with strong tap leverage
        # (the UNet bottleneck) saturate at the sweep ends, which would
        # make a response-ratio comparison meaningless
        s_adapt = scales[-1] * 0.5
        end_scales = [-s_adapt, 0.0, s_adapt]
        # the comparator is the CONTINUOUS limit of the edited flow — a
        # fine-step fixed solve — not the config's coarse grid: an
        # adaptive stepper integrates the interpolated forcing
        # continuously, while a coarse fixed grid samples it at a few
        # points; on rough toy fields the two legitimately differ
        # (measured: 0.1-step response is ~0.44x the 0.02-step one on
        # the toy UNet, while adaptive matches 0.02 at ratio 1.014).
        # fixadp runs its fixed (edit-active) phase at the same fine
        # step so all three share the forcing discretization.
        fine_step = min(0.02, float(base_sk.get("solver_fix_step", 0.01)))
        ref_session = DissectSession(
            session.model, session.params,
            solver_kwargs={**base_sk, "solver": "fixed",
                           "solver_fix_step": fine_step})
        ref_sweep = ref_session.write_sweep(
            select_direction(grid_all, 0), end_scales, n,
            grid_dt=grid_dt, grid_t0=grid_t0, loc=edit_loc, t_edit=0.5,
            rng=rng, z_shape=z_hwc)
        ref_curve, _ = projection_curve(np.asarray(ref_sweep, np.float32),
                                        z_deltas[0])
        ref_resp = ref_curve[-1] - ref_curve[0]
        for solver_name, sk in (
            ("adaptive", {"solver": "adaptive", "solver_adaptive": "dopri5",
                          "rtol": 1e-5, "atol": 1e-5, "controller": "i"}),
            ("fixadp", {**base_sk, "solver": "fixadp",
                        "solver_fix_step": fine_step,
                        "solver_adaptive": "dopri5",
                        "rtol": 1e-5, "atol": 1e-5, "controller": "i"}),
        ):
            s2 = DissectSession(session.model, session.params,
                                solver_kwargs=sk)
            sweep2 = s2.write_sweep(
                select_direction(grid_all, 0), end_scales, n,
                grid_dt=grid_dt, grid_t0=grid_t0, loc=edit_loc,
                t_edit=0.5, rng=rng, z_shape=z_hwc)
            curve2, _ = projection_curve(np.asarray(sweep2, np.float32),
                                         z_deltas[0])
            resp2 = curve2[-1] - curve2[0]
            adaptive_checks.append({
                "solver": solver_name,
                "proj_latentz_delta": curve2,
                "response_vs_fixed": float(resp2 / ref_resp)
                if ref_resp else 0.0,
                "agrees": bool(resp2 * ref_resp > 0
                               and 0.5 < abs(resp2 / max(abs(ref_resp), 1e-9))
                               < 2.0),
            })
            logging.info("adaptive_check %s: response ratio %.3f",
                         solver_name,
                         adaptive_checks[-1]["response_vs_fixed"])

    # -- step 4: roundtrip (vis_reversible numbers) ---------------------------
    lat = jnp.asarray(data["latent"][:n])
    errs = session.roundtrip_error(lat)
    with open(os.path.join(workdir, "roundtrip.txt"), "w") as f:
        f.write(f"solver={session.solver_kwargs} abs_mean={errs['abs_mean']:.6f} "
                f"rel_mean={errs['rel_mean']:.6f}\n")

    # -- verdicts -------------------------------------------------------------
    min_effect = float(d.get("e2e_min_effect", 1.0) or 1.0)

    def attr_ok(r):
        # the supported fraction (pairs where the model's ground-truth
        # response is itself monotone) gates when ground truth exists;
        # the raw fraction is always reported alongside
        mono = r.get("monotone_fraction_supported", r["monotone_fraction"])
        return (mono >= 0.9
                and r["effect_size"] >= min_effect
                and r.get("gt_agrees", True))

    passed = all(attr_ok(r) for r in results)
    if adaptive_checks:
        passed = passed and all(c["agrees"] for c in adaptive_checks)
    report = {
        "config": config.dataset.get("name"),
        "nnet": config.nnet.get("name"),
        "n_read": int(data["latent"].shape[0]),
        "edit_loc": edit_loc,
        "roundtrip": {k: float(v) for k, v in errs.items()},
        "attrs": results,
        "adaptive_checks": adaptive_checks,
        "passed": bool(passed),
    }
    with open(os.path.join(workdir, "editing_e2e.json"), "w") as f:
        json.dump(report, f, indent=1)

    lines = [
        "# End-to-end editing verification", "",
        f"dataset `{report['config']}`, {report['n_read']} read samples, "
        f"edit_loc `{edit_loc}`, roundtrip rel err "
        f"{report['roundtrip']['rel_mean']:.4f}", "",
        "| attr | " + " | ".join(f"s={s:g}" for s in scales)
        + " | orient | monotone | effect | verdict |",
        "|---|" + "---|" * (len(scales) + 4),
    ]
    for r in results:
        row = " | ".join(f"{p:.2f}" for p in r["proj_latentz_delta"])
        mono = r.get("monotone_fraction_supported", r["monotone_fraction"])
        lines.append(f"| {r['attr']} | {row} | {r['orientation']:+d} "
                     f"| {mono:.2f} "
                     f"| {r['effect_size']:.1f}σ "
                     f"| {'PASS' if attr_ok(r) else 'FAIL'} |")
    if adaptive_checks:
        lines += ["", "adaptive-solver writes (interp_grid at off-grid t; "
                      "response ratio vs the fixed-step write, same edit):",
                  ""]
        for c in adaptive_checks:
            lines.append(f"- `{c['solver']}`: ratio "
                         f"{c['response_vs_fixed']:.3f} — "
                         f"{'PASS' if c['agrees'] else 'FAIL'}")
    lines += ["", f"**overall: {'PASS' if passed else 'FAIL'}**", ""]
    with open(os.path.join(workdir, "editing_e2e.md"), "w") as f:
        f.write("\n".join(lines))
    logging.info("editing_e2e: %s (report in %s)",
                 "PASS" if passed else "FAIL", workdir)
    return report


def main(argv):
    run(FLAGS.config, FLAGS.workdir)


if __name__ == "__main__":
    app.run(main)
