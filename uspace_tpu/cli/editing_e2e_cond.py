"""Class-conditional generation + CFG verification on a trained model.

Completes the conditioning-mode matrix of trained-model proofs (uncond
u-space editing → `editing_e2e`, T2I → `editing_e2e_t2i`): a U-ViT with
a label token (reference `libs/uvit.py` class-conditional path, ImageNet
configs) trained on class-keyed orthonormal latent patterns
(`data/datasets.SyntheticClass`), verified via projections:

1. **conditioning** — generations for class y carry P_y (full planted
   amplitude) and none of the other classes' patterns;
2. **classifier-free guidance** with the learned null class K
   (`ImageNet256Features` convention; the `evals.sampling.cfg_velocity_fn`
   sweep s ∈ {0, 1, 3}): s=0 generates the class *mixture*, s=1 the
   conditional, s>1 amplifies the class margin.

Usage:
    python -m uspace_tpu.cli.editing_e2e_cond \
        --config=uspace_tpu/configs/synthetic_cond_e2e.py \
        --config.dissection.ckpt_path_to_dissect=<workdir>/ckpts \
        --workdir=e2e_cond_out
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
    flags.DEFINE_string("workdir", "e2e_cond_out", "output root")
flags.mark_flags_as_required(["config"])


def run(config, workdir: str) -> dict:
    from ..configs.common import z_shape_hwc
    from ..core import flow
    from ..data.datasets import SyntheticClassFeatures
    from ..evals.sampling import cfg_velocity_fn
    from ..train.step import make_velocity_fn
    from ..utils.vis import make_grid, save_image
    from .dissect_common import build_session

    d = config.dissection
    os.makedirs(workdir, exist_ok=True)
    session, _ = build_session(config)
    rng = jax.random.PRNGKey(config.seed)
    z_hwc = z_shape_hwc(config)

    dcfg = config.dataset
    K = int(dcfg.get("num_classes", 6))
    helper = SyntheticClassFeatures(
        num=1, shape=tuple(dcfg.get("shape")), num_classes=K,
        **{k: float(dcfg[k]) for k in ("base_std", "amp", "noise_std")
           if k in dcfg},
    )
    P = helper._pat.reshape(K, -1)
    amp = helper.amp

    n = min(int(d.mini_batch_size), 32)
    z = jax.random.normal(rng, (n, *z_hwc))

    def decode_with(vf):
        return np.asarray(flow.decode(vf, z, session.solver_kwargs),
                          np.float32)

    report = {"checks": {}, "n_per_setting": n}
    grids = []

    # -- check 1: conditional generation per class ---------------------------
    rows = []
    for y in range(K):
        yy = jnp.full((n,), y, jnp.int32)
        lat = decode_with(make_velocity_fn(session.model, session.params,
                                           {"y": yy}))
        proj = np.asarray(lat, np.float64).reshape(n, -1) @ P.T
        own = float(proj[:, y].mean())
        others = float(np.delete(proj, y, axis=1).mean())
        spread = float(np.delete(proj, y, axis=1).std())
        rows.append({"class": y, "own_mean": own, "other_mean": others,
                     "margin_sigma": (own - others) / max(spread, 1e-9)})
        grids.append(lat)
    cond_ok = all(r["margin_sigma"] >= 3.0 and r["own_mean"] > 0.5 * amp
                  for r in rows)
    report["checks"]["conditioning"] = {"rows": rows, "passed": cond_ok}

    # -- check 2: CFG with the learned null class ----------------------------
    cfg_ok = True
    if dcfg.get("cfg", False):
        y0 = 0
        yy = jnp.full((n,), y0, jnp.int32)
        null_y = jnp.full((n,), K, jnp.int32)  # learned null = class K
        cfg_rows = []
        for s in (0.0, 1.0, 3.0):
            vf = cfg_velocity_fn(session.model, session.params, {"y": yy},
                                 {"y": null_y}, s)
            lat = decode_with(vf)
            proj = np.asarray(lat, np.float64).reshape(n, -1) @ P.T
            cfg_rows.append({
                "guidance": s,
                "own_mean": float(proj[:, y0].mean()),
                "other_mean": float(np.delete(proj, y0, axis=1).mean()),
            })
            grids.append(lat)
        margins = [r["own_mean"] - r["other_mean"] for r in cfg_rows]
        cfg_ok = bool(abs(margins[0]) < 0.5 * margins[1]
                      and margins[2] >= 0.95 * margins[1] and margins[1] > 0)
        report["checks"]["cfg_guidance"] = {"rows": cfg_rows,
                                            "margins": margins,
                                            "passed": cfg_ok}

    report["passed"] = bool(cond_ok and cfg_ok)

    flat = np.concatenate(grids)[..., :3]
    img = (flat - flat.min()) / max(float(flat.max() - flat.min()), 1e-8)
    save_image(make_grid(img, nrow=n), os.path.join(workdir, "cond_grid.png"))
    with open(os.path.join(workdir, "editing_e2e_cond.json"), "w") as f:
        json.dump(report, f, indent=1)

    lines = ["# Class-conditional end-to-end verification", "",
             f"{n} samples per class, {K} classes, planted amp {amp}", "",
             "| class | own | others | margin |", "|---|---|---|---|"]
    for r in rows:
        lines.append(f"| {r['class']} | {r['own_mean']:.2f} "
                     f"| {r['other_mean']:.2f} | {r['margin_sigma']:.1f}σ |")
    lines += ["", f"**{'PASS' if cond_ok else 'FAIL'}**", ""]
    if "cfg_guidance" in report["checks"]:
        cg = report["checks"]["cfg_guidance"]
        lines += ["## CFG sweep (null = learned class K)", "",
                  "| guidance | own | others | margin |", "|---|---|---|---|"]
        for r, m in zip(cg["rows"], cg["margins"]):
            lines.append(f"| {r['guidance']:g} | {r['own_mean']:.2f} "
                         f"| {r['other_mean']:.2f} | {m:.2f} |")
        lines += ["", f"**{'PASS' if cg['passed'] else 'FAIL'}**", ""]
    lines += [f"**overall: {'PASS' if report['passed'] else 'FAIL'}**", ""]
    with open(os.path.join(workdir, "editing_e2e_cond.md"), "w") as f:
        f.write("\n".join(lines))
    logging.info("editing_e2e_cond: %s (report in %s)",
                 "PASS" if report["passed"] else "FAIL", workdir)
    return report


def main(argv):
    run(FLAGS.config, FLAGS.workdir)


if __name__ == "__main__":
    app.run(main)
