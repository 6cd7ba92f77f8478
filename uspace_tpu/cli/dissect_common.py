"""Shared construction for the dissect CLIs: frozen eval stack from config
(reference builds this inline in each driver — dissect_lfm.py:67-84)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from ..codecs.convert import load_torch_checkpoint, vae_torch_to_flax
from ..codecs.vae import AutoencoderKL
from ..configs.common import context_shape, nnet_kwargs, z_shape_hwc
from ..editing.drivers import DissectSession
from ..models import get_nnet


def decode_images(vae_decode, latents, mini_batch: int) -> np.ndarray:
    """Latents -> [0,1] images: chunked VAE decode when weights exist,
    min-max normalized raw channels otherwise (shared by the dissect and
    e2e CLIs)."""
    if vae_decode is None:
        arr = np.asarray(latents)[..., :3]
        return (arr - arr.min()) / max(arr.max() - arr.min(), 1e-8)
    outs = []
    for i in range(0, len(latents), mini_batch):
        outs.append(np.asarray(vae_decode(latents[i:i + mini_batch])))
    return np.clip((np.concatenate(outs) + 1) / 2, 0, 1)


def load_nnet_params(config, model, init_args) -> dict:
    """Load denoiser weights from dissection.ckpt_path_to_dissect: an
    orbax checkpoint dir (this framework; uses EMA params) or a reference
    torch ``nnet[_ema].pth``."""
    params = jax.jit(model.init)(jax.random.PRNGKey(config.seed), *init_args)
    path = config.dissection.get("ckpt_path_to_dissect") or ""
    if not path:
        logging.warning("no ckpt_path_to_dissect; random weights (smoke mode)")
        return params
    if os.path.isdir(path) and (path.endswith(".ckpt")
                                or os.path.exists(os.path.join(path, "nnet_ema.pth"))):
        # reference TrainState layout: {step}.ckpt/{nnet,nnet_ema,...}.pth
        # (tools/utils_uvit.py:124-129); prefer the EMA weights
        for name in ("nnet_ema.pth", "nnet.pth"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    if path.endswith(".pth"):
        from ..train.checkpoint import load_pretrained_nnet

        surgery = ("unet" if config.nnet.name == "unet_t2i" else None)
        return load_pretrained_nnet(path, params, surgery=surgery)
    # orbax: structure-free restore of the EMA params only (the training
    # optimizer's state layout is unknown here and must not be required)
    from ..train.checkpoint import CheckpointManager

    mgr = CheckpointManager(path)
    ema = mgr.restore_params(ema=True)
    return jax.tree.map(np.asarray, ema)


def build_session(config) -> Tuple[DissectSession, object]:
    """(session, vae_decode|None) from an experiment config."""
    z_hwc = z_shape_hwc(config)
    model = get_nnet(
        config.nnet.name,
        **nnet_kwargs(config.nnet, config.get("compute_dtype")),
    )
    x = jnp.zeros((1, *z_hwc), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    if config.nnet.name in ("uvit_t2i", "unet_t2i"):
        ctx = jnp.zeros((1, *context_shape(config)))
        init_args = (x, t, ctx)
    elif config.nnet.get("num_classes", -1) > 0:
        init_args = (x, t, jnp.zeros((1,), jnp.int32))
    else:
        init_args = (x, t)
    params = load_nnet_params(config, model, init_args)

    vae_decode = vae_sample = None
    vae_path = config.autoencoder.get("pretrained_path", "")
    if vae_path and os.path.exists(vae_path):
        vae = AutoencoderKL(
            scale_factor=config.autoencoder.get("scale_factor", 0.18215)
        )
        vparams = {"params": vae_torch_to_flax(load_torch_checkpoint(vae_path))}
        # params as explicit jit arguments (closure capture bakes the
        # tree into the executable payload)
        _dec = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))
        _smp = jax.jit(lambda p, m, rng: vae.apply(p, m, rng,
                                                   method=vae.sample))
        vae_decode = lambda z: _dec(vparams, z)
        vae_sample = lambda m, rng: _smp(vparams, m, rng)

    session = DissectSession(
        model, params,
        vae_decode=vae_decode, vae_sample=vae_sample,
        solver_kwargs=dict(config.dissection.solver_kwargs),
    )
    return session, vae_decode
