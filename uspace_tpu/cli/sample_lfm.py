"""Standalone sampling / FID-eval CLI from a saved checkpoint.

The reference exposes its eval protocol only from inside the training
loop (`/root/reference/train_lfm.py:185-230` eval_step, fired on
eval_interval and on the final checkpoint); running it on an existing
workdir means re-entering the train script. This CLI runs the exact same
protocol — EMA weights, `config.sample` solver/mini-batch, SD-VAE
decode, `sample2dir` disjoint per-process writes, optional FID against
the dataset's stats — as a first-class command:

    python -m uspace_tpu.cli.sample_lfm \\
        --config=uspace_tpu/configs/lfm_cm256_uvit_large.py \\
        --workdir=workdir [--ckpt_step=-1] [--n_samples=0] \\
        [--out=...] [--fid]

Conditioning follows the training mode (uncond / class-cond / T2I test
contexts, like the loop's eval). Without VAE weights the raw latents are
written as per-batch .npy files instead of PNGs.
"""

from __future__ import annotations

import os
import sys
from typing import Optional

from absl import app, flags, logging
from ml_collections import config_flags

FLAGS = flags.FLAGS
if "config" not in FLAGS:
    config_flags.DEFINE_config_file("config", None, "experiment config",
                                    lock_config=False)
if "workdir" not in FLAGS:
    flags.DEFINE_string("workdir", "workdir", "output root")
flags.DEFINE_integer("ckpt_step", -1, "checkpoint step (-1 = latest)")
flags.DEFINE_integer("n_samples", 0,
                     "samples to generate (0 = config.sample.n_samples)")
flags.DEFINE_string("out", "", "output dir (default workdir/samples/<step>)")
flags.DEFINE_bool("fid", False,
                  "compute FID against the dataset's stats when available")
flags.mark_flags_as_required(["config"])


def run(config, workdir: str, ckpt_step: Optional[int] = None,
        n_samples: int = 0, out: str = "", fid: bool = False):
    """Sample (and optionally FID-eval) from a workdir checkpoint.
    Returns (out_dir, fid_or_None)."""
    import jax
    import numpy as np

    from ..evals.sampling import sample2dir
    from ..parallel import mesh as meshlib
    from ..train.loop import Experiment

    exp = Experiment(config, workdir)
    with meshlib.use_mesh(exp.mesh):
        state = exp.ckpt.restore(exp.state, ckpt_step)
        step = int(state.step)
        logging.info("sampling from checkpoint step %d", step)

        out_dir = out or os.path.join(exp.workdir, "samples", str(step))
        n = n_samples or config.sample.n_samples
        decode = exp.vae()
        params = {"params": state.ema_params["params"]}

        def sample_images(rng, k):
            cond_rng, z_rng = jax.random.split(rng)
            cond = exp.eval_cond(cond_rng, k)
            lat = exp.sample_latents(params, z_rng, k, cond)
            if decode:
                return exp.dataset.unpreprocess(np.asarray(decode(lat)))
            return np.asarray(lat)  # no VAE weights: raw latents

        sample2dir(sample_images, n, config.sample.mini_batch_size,
                   out_dir, jax.random.fold_in(exp.rng, 3 + step),
                   as_npy=not decode)
        logging.info("wrote %d samples to %s", n, out_dir)

        score = None
        if fid:
            fid_stat = getattr(exp.dataset, "fid_stat", None)
            if not decode or not fid_stat or not os.path.exists(fid_stat):
                logging.warning("FID skipped: needs VAE weights + fid stats")
            else:
                from ..evals import fid as fid_mod

                score = fid_mod.fid_given_paths(fid_stat, out_dir)
                logging.info("FID(%d) = %.4f", n, score)
                if jax.process_index() == 0:
                    with open(os.path.join(exp.workdir, "eval.log"),
                              "a") as f:
                        f.write(f"step={step} n={n} fid={score}\n")
        return out_dir, score


def main(argv):
    from ..parallel.distributed import initialize
    from .train_lfm import hparams_from_argv

    initialize()
    config = FLAGS.config
    config_name = os.path.splitext(
        os.path.basename(FLAGS["config"].config_filename))[0]
    workdir = os.path.join(FLAGS.workdir, config_name,
                           hparams_from_argv(sys.argv))
    run(config, workdir,
        ckpt_step=None if FLAGS.ckpt_step < 0 else FLAGS.ckpt_step,
        n_samples=FLAGS.n_samples, out=FLAGS.out, fid=FLAGS.fid)


if __name__ == "__main__":
    app.run(main)
