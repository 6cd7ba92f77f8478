"""Training CLI (reference `train_lfm.py:341-419` / `train_lfm_t2i.py`):

    python -m uspace_tpu.cli.train_lfm \
        --config=uspace_tpu/configs/lfm_cm256_uvit_large.py \
        --config.train.batch_size=512 --workdir=workdir

One CLI serves uncond / class-cond / T2I (mode comes from the config),
replacing the reference's per-mode scripts. The workdir auto-layout
mirrors the reference: workdir/{config_name}/{hparams-from-overrides}.
"""

from __future__ import annotations

import os
import sys

from absl import app, flags
from ml_collections import config_flags

FLAGS = flags.FLAGS
if "config" not in FLAGS:
    config_flags.DEFINE_config_file("config", None, "experiment config",
                                    lock_config=False)
if "workdir" not in FLAGS:
    flags.DEFINE_string("workdir", "workdir", "output root")
flags.mark_flags_as_required(["config"])


def hparams_from_argv(argv) -> str:
    """Experiment identity string from CLI overrides
    (reference train_lfm.py:355-371)."""
    parts = []
    for a in argv:
        if a.startswith("--config.") and "=" in a:
            k, v = a[len("--config."):].split("=", 1)
            parts.append(f"{k.split('.')[-1]}={v}")
    return "-".join(parts) or "default"


def main(argv):
    from ..parallel.distributed import initialize

    initialize()  # multi-host JAX (no-op on a single-host launch)
    config = FLAGS.config
    config_name = os.path.splitext(
        os.path.basename(FLAGS["config"].config_filename)
    )[0]
    workdir = os.path.join(FLAGS.workdir, config_name,
                           hparams_from_argv(sys.argv))
    from ..train.loop import train

    train(config, workdir)


if __name__ == "__main__":
    app.run(main)
