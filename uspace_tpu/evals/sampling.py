"""Sampling drivers: CFG velocity wrapper and distributed sample-to-dir.

Counterparts of the reference's ``sample2dir`` (per-rank sample ->
all-gather -> rank0 saves PNGs, `/root/reference/tools/utils_uvit.py:
264-281`) and its (vestigial) classifier-free guidance. Here CFG composes
two velocity evaluations inside the compiled ODE step:

    v = v_uncond + s * (v_cond - v_uncond)

evaluated as one batched forward over [cond ‖ uncond] so the MXU sees a
single 2B batch instead of two launches.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import flow

Array = jax.Array


def cfg_velocity_fn(model, params, cond: Dict, null_cond: Dict,
                    guidance_scale: float, **apply_kwargs) -> Callable:
    """Velocity closure with classifier-free guidance (one fused forward
    over the doubled batch)."""

    from ..train.step import make_velocity_fn

    def vf(t, x):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        merged = {}
        for k in set(cond) | set(null_cond):
            a, b = cond.get(k), null_cond.get(k)
            if a is None and b is None:
                merged[k] = None
            elif a is None or b is None:
                # a key present in only one dict would silently turn the
                # guidance into a no-op (both halves unconditional)
                raise ValueError(
                    f"cfg_velocity_fn: conditioning key {k!r} present in "
                    "only one of cond/null_cond")
            else:
                merged[k] = jnp.concatenate([a, b], axis=0)
        v2 = make_velocity_fn(model, params, merged, **apply_kwargs)(t2, x2)
        v_c, v_u = jnp.split(v2, 2, axis=0)
        return v_u + guidance_scale * (v_c - v_u)

    return vf


def sample2dir(
    sample_fn: Callable[[Array, int], Array],
    n_samples: int,
    mini_batch_size: int,
    out_dir: str,
    rng: Array,
    unpreprocess: Optional[Callable] = None,
    as_npy: bool = False,
) -> None:
    """Generate ``n_samples`` images in mini-batches and write PNGs
    (or per-batch ``.npy`` latent files with ``as_npy=True`` — the
    no-VAE-weights path of cli/sample_lfm).

    ``sample_fn(rng, n) -> [n, H, W, C]`` images in [-1, 1] (decoded) or
    [0, 1] if ``unpreprocess`` is None.

    Multi-host: every process executes the SAME sequence of compiled
    invocations (params may be sharded over a global mesh, so diverging
    program counts across hosts would desynchronize SPMD collectives);
    each batch's files are written by the process that owns it round-robin.
    """
    from ..utils.vis import save_image_batch

    pi, pc = jax.process_index(), jax.process_count()
    n_batches = math.ceil(n_samples / mini_batch_size)
    for b in range(n_batches):
        n = min(mini_batch_size, n_samples - b * mini_batch_size)
        imgs = sample_fn(jax.random.fold_in(rng, b), n)
        if b % pc != pi:
            continue  # computed everywhere (SPMD-safe), written by owner
        imgs = np.asarray(imgs)
        if unpreprocess is not None:
            imgs = unpreprocess(imgs)
        if as_npy:
            os.makedirs(out_dir, exist_ok=True)
            np.save(os.path.join(
                out_dir, f"{b * mini_batch_size}.npy"), imgs)
        else:
            save_image_batch(imgs, out_dir, start_index=b * mini_batch_size)
