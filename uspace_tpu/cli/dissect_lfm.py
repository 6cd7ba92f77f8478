"""u-space dissection CLI (uncond/class-cond models).

Reference entry point: `/root/reference/dissect_lfm.py` (README steps 1-3:
read activations, build directions, write/steer). Usage:

    python -m uspace_tpu.cli.dissect_lfm --config=<cfg.py> \
        --config.dissection.dissect_name=read
    python -m uspace_tpu.cli.dissect_lfm --config=<cfg.py> \
        --config.dissection.dissect_name=build_attr       # or build_pca
    python -m uspace_tpu.cli.dissect_lfm --config=<cfg.py> \
        --config.dissection.dissect_name=write_attr \
        --config.dissection.ith_attr=31
    python -m uspace_tpu.cli.dissect_lfm --config=<cfg.py> \
        --config.dissection.dissect_name=vis_reversible

(The reference selects experiments with hardcoded if-blocks,
dissect_lfm.py:260-279 — an anti-pattern SURVEY.md flags; here every mode
is config/CLI-driven.)
"""

from __future__ import annotations

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
    flags.DEFINE_string("workdir", "dissect_out", "output root")
flags.mark_flags_as_required(["config"])


def _read_path(config):
    root = config.dissection.get("read_path_root") or "dissect/read"
    return os.path.join(root, "read.npz")


def _directions_path(config, mode):
    return os.path.join(os.path.dirname(_read_path(config)),
                        f"directions_{mode}.npz")


def run(config, workdir: str) -> None:
    from ..configs.common import z_shape_hwc
    from ..data.datasets import get_dataset
    from ..data.loader import DataLoader
    from ..editing.directions import select_direction
    from ..editing.drivers import build_directions_npz
    from ..utils.vis import make_grid, save_image
    from .dissect_common import build_session, decode_images

    d = config.dissection
    name = d.get("dissect_name")
    session, vae_decode = build_session(config)
    rng = jax.random.PRNGKey(config.seed)
    os.makedirs(workdir, exist_ok=True)

    def _cond(n):
        """Class-conditional models need labels in the write/roundtrip
        modes too (read takes them from the batch): dissection.class_label
        picks the class (default 0)."""
        if config.nnet.get("num_classes", -1) > 0:
            y = int(d.get("class_label", 0) or 0)
            return {"y": jnp.full((n,), y, jnp.int32)}
        return None

    if name == "read":
        dataset = get_dataset(**dict(config.dataset))
        loader = DataLoader(dataset.get_split("train"),
                            d.mini_batch_size, shuffle=False,
                            num_workers=config.dl.num_workers)
        edit_loc = d.get("edit_loc") or "mid"
        out = session.read(
            iter(loader), tap=edit_loc, max_samples=d.n_samples, rng=rng,
            from_moments=config.train.get("from_moments", True),
        )
        path = _read_path(config)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez(path, **out)
        logging.info("read: %d samples, feats %s -> %s",
                     len(out["latent"]), out["feats"].shape, path)
        return

    if name in ("build_attr", "build_pca"):
        mode = name.split("_")[1]
        build_directions_npz(_read_path(config), _directions_path(config, mode),
                             mode=mode, pca_n=d.pca_n)
        return

    if name in ("write_attr", "write_pca", "write_x0"):
        z_hwc = z_shape_hwc(config)
        fixed_z = None
        if d.get("fixed_z_path"):
            # raw .npy of latents, a read-phase .npz (its 'latent' key),
            # or the literal "from_read" for this config's read artifact —
            # the real-image-editing workflow (reference fixed_z_path,
            # utils_vis.py:180-187)
            fz = d.fixed_z_path
            if fz == "from_read":
                fz = _read_path(config)
            loaded = np.load(fz)
            if hasattr(loaded, "files"):
                loaded = loaded["latent"]
            fixed_z = jnp.asarray(loaded)
        if name == "write_x0":
            # z-space steering: z + scale * delta_z, then plain decode
            # (reference move_delta_z, utils_vis.py:120-135)
            data = np.load(_read_path(config))
            from ..editing.directions import latentz_delta

            delta_z = latentz_delta(jnp.asarray(data["latent"]),
                                    jnp.asarray(data["attr"]))
            delta = select_direction(delta_z[None], d.ith_attr)[0]
            n = min(d.n_samples, d.mini_batch_size)
            z = (fixed_z[:n] if fixed_z is not None
                 else jax.random.normal(rng, (n, *z_hwc)))
            outs = [session.decode(z + float(s) * delta[None],
                                   cond=_cond(n))
                    for s in d.write_scales]
            sweep = jnp.stack(outs)
        else:
            mode = name.split("_")[1]
            dirs = np.load(_directions_path(config, mode))
            grid_all = jnp.asarray(dirs["directions"])  # [T, A|K, ...]
            grid_t0 = float(dirs["t_grid"][0]) if "t_grid" in dirs else 0.0
            # grid spacing comes from the read artifact, not the solver
            grid_dt = (float(dirs["t_grid"][1] - dirs["t_grid"][0])
                       if "t_grid" in dirs and len(dirs["t_grid"]) > 1
                       else None)
            ith = d.ith_attr if mode == "attr" else d.ith_component
            delta_grid = select_direction(grid_all, ith)
            n = min(d.n_samples, d.mini_batch_size)
            is_every = (isinstance(d.t_edit, str)
                        and d.t_edit.startswith("every_"))
            sweep = session.write_sweep(
                delta_grid, list(d.write_scales), n,
                grid_dt=grid_dt, grid_t0=grid_t0,
                loc=d.get("edit_loc") or "mid",
                t_edit=1.0 if is_every else float(d.t_edit),
                gate_mode="every" if is_every else "le",
                gate_period=(float(d.t_edit.replace("every_", ""))
                             if is_every else 0.1),
                fixed_z=fixed_z, rng=rng, z_shape=z_hwc,
                cond=_cond(n),
            )
        s, b = sweep.shape[:2]
        flat = sweep.reshape(s * b, *sweep.shape[2:])
        imgs = decode_images(vae_decode, flat, d.mini_batch_size)
        out_png = os.path.join(workdir, f"{name}_sweep.png")
        save_image(make_grid(imgs, nrow=b), out_png)
        logging.info("write sweep (%d scales x %d samples) -> %s", s, b, out_png)
        return

    if name in ("vis_reversible", "eval_vf_interp"):
        dataset = get_dataset(**dict(config.dataset))
        loader = DataLoader(dataset.get_split("train"), d.mini_batch_size,
                            shuffle=False, num_workers=config.dl.num_workers)
        batch = next(iter(loader))
        x = jnp.asarray(batch["x"])
        if config.train.get("from_moments", True):  # pixel-space: x is data
            if session.vae_sample is not None:
                x = session.vae_sample(x, rng)
            else:
                from ..train.step import sample_from_moments

                x = sample_from_moments(x, rng)
        errs = session.roundtrip_error(x, cond=_cond(x.shape[0]))
        line = (f"solver={dict(d.solver_kwargs)} "
                f"abs_mean={errs['abs_mean']:.6f} rel_mean={errs['rel_mean']:.6f}")
        logging.info("roundtrip: %s", line)
        # append like the reference's delta_change.txt (utils_interp.py:5-17)
        with open(os.path.join(workdir, "delta_change.txt"), "a") as f:
            f.write(line + "\n")
        return

    raise NotImplementedError(f"dissect_name={name!r}")


def main(argv):
    run(FLAGS.config, FLAGS.workdir)


if __name__ == "__main__":
    app.run(main)
