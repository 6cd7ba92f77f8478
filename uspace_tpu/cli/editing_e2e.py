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


def projection_curve(sweep: np.ndarray, direction: np.ndarray):
    """Per-scale mean projection of [S, B, ...] latents onto a unit
    direction, plus the per-sample std at each scale."""
    u = _normalized(np.asarray(direction, np.float64).ravel())
    flat = np.asarray(sweep, np.float64).reshape(sweep.shape[0], sweep.shape[1], -1)
    proj = flat @ u  # [S, B]
    return ([float(x) for x in proj.mean(axis=1)],
            [float(x) for x in proj.std(axis=1)])


def monotone_fraction(curve, scales) -> float:
    """Fraction of adjacent scale pairs where the projection moves the
    same way as the scale (1.0 = perfectly monotone response)."""
    ok = tot = 0
    for i in range(len(curve) - 1):
        ds = scales[i + 1] - scales[i]
        if ds == 0:
            continue
        tot += 1
        ok += (curve[i + 1] - curve[i]) * ds > 0
    return ok / max(tot, 1)


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
            grid_t0=grid_t0, loc=edit_loc, t_edit=float(d.t_edit),
            rng=rng, z_shape=z_hwc,
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
            rec["gt_monotone_fraction"] = monotone_fraction(
                [orientation * c for c in gt_curve], scales)
            # both attribute measures must move together
            rec["gt_agrees"] = bool(gt_resp * response >= 0 or gt_resp == 0)
        results.append(rec)

        flat = sweep.reshape(-1, *sweep.shape[2:])
        from .dissect_common import decode_images

        img = decode_images(vae_decode, flat, int(d.mini_batch_size))
        save_image(make_grid(img, nrow=n),
                   os.path.join(workdir, f"write_attr{a}_sweep.png"))

    # -- step 4: roundtrip (vis_reversible numbers) ---------------------------
    lat = jnp.asarray(data["latent"][:n])
    errs = session.roundtrip_error(lat)
    with open(os.path.join(workdir, "roundtrip.txt"), "w") as f:
        f.write(f"solver={session.solver_kwargs} abs_mean={errs['abs_mean']:.6f} "
                f"rel_mean={errs['rel_mean']:.6f}\n")

    # -- verdicts -------------------------------------------------------------
    min_effect = float(d.get("e2e_min_effect", 1.0) or 1.0)

    def attr_ok(r):
        return (r["monotone_fraction"] >= 0.9
                and r["effect_size"] >= min_effect
                and r.get("gt_agrees", True))

    passed = all(attr_ok(r) for r in results)
    report = {
        "config": config.dataset.get("name"),
        "n_read": int(data["latent"].shape[0]),
        "edit_loc": edit_loc,
        "roundtrip": {k: float(v) for k, v in errs.items()},
        "attrs": results,
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
        lines.append(f"| {r['attr']} | {row} | {r['orientation']:+d} "
                     f"| {r['monotone_fraction']:.2f} "
                     f"| {r['effect_size']:.1f}σ "
                     f"| {'PASS' if attr_ok(r) else 'FAIL'} |")
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
