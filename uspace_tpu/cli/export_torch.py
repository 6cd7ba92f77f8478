"""Export a trained checkpoint back to the reference's torch format:

    python -m uspace_tpu.cli.export_torch --config=<cfg.py> \
        --ckpt=workdir/.../ckpts --out=nnet_ema.pth [--use_ema=true]

The resulting ``.pth`` loads into the PyTorch reference's U-ViT /
U-ViT-T2I with ``strict=True`` (verified by round-trip parity tests) —
the "switch back" path for users moving between stacks.
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
    from ..codecs.convert import save_torch_state_dict, uvit_flax_to_torch
    from ..configs.common import nnet_kwargs, z_shape_hwc
    from ..models import get_nnet
    from ..train.checkpoint import CheckpointManager
    from ..train.state import TrainState, get_optimizer

    config = FLAGS.config
    model = get_nnet(config.nnet.name, **nnet_kwargs(config.nnet))
    x = jnp.zeros((1, *z_shape_hwc(config)), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    if config.nnet.name == "uvit_t2i":
        args = (x, t, jnp.zeros((1, config.nnet.num_clip_token,
                                 config.nnet.clip_dim)))
    elif config.nnet.get("num_classes", -1) > 0:
        args = (x, t, jnp.zeros((1,), jnp.int32))
    else:
        args = (x, t)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    state = TrainState.create(params, get_optimizer("adam", 1e-4))
    state = CheckpointManager(FLAGS.ckpt).restore(state)
    src = state.ema_params if FLAGS.use_ema else state.params
    if config.nnet.name == "unet_t2i":
        raise NotImplementedError("UNet export not wired yet; U-ViT only")
    sd = uvit_flax_to_torch(src)
    save_torch_state_dict(sd, FLAGS.out)
    logging.info("exported %d tensors -> %s", len(sd), FLAGS.out)


if __name__ == "__main__":
    app.run(main)