"""Export a trained checkpoint back to the reference's torch format:

    python -m uspace_tpu.cli.export_torch --config=<cfg.py> \
        --ckpt=workdir/.../ckpts --out=nnet_ema.pth [--use_ema=true]

The resulting ``.pth`` loads into the PyTorch reference's U-ViT /
U-ViT-T2I / SD-UNet with ``strict=True`` (verified by round-trip parity
tests) — the "switch back" path for users moving between stacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from absl import app, flags, logging
from ml_collections import config_flags

FLAGS = flags.FLAGS
if "config" not in FLAGS:
    config_flags.DEFINE_config_file("config", None, "experiment config",
                                    lock_config=False)
if "ckpt" not in FLAGS:
    flags.DEFINE_string("ckpt", None, "orbax checkpoint root (ckpts dir)")
if "out" not in FLAGS:
    flags.DEFINE_string("out", None, "output .pth path")
if "use_ema" not in FLAGS:
    flags.DEFINE_bool("use_ema", True, "export EMA params")
flags.mark_flags_as_required(["config", "ckpt", "out"])


def main(argv):
    from ..codecs.convert import (
        save_torch_state_dict,
        unet_flax_to_torch,
        uvit_flax_to_torch,
    )
    from ..train.checkpoint import CheckpointManager

    config = FLAGS.config
    # structure-free restore: no need to reconstruct the train optimizer
    src = CheckpointManager(FLAGS.ckpt).restore_params(ema=FLAGS.use_ema)
    to_torch = (unet_flax_to_torch if config.nnet.name == "unet_t2i"
                else uvit_flax_to_torch)
    sd = to_torch(src)
    save_torch_state_dict(sd, FLAGS.out)
    logging.info("exported %d tensors -> %s", len(sd), FLAGS.out)


if __name__ == "__main__":
    app.run(main)