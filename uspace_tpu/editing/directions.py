"""Semantic-direction builders: attribute deltas and per-timestep PCA.

Counterpart of `/root/reference/tools/utils_attr.py` (mean-difference
directions over attribute labels, :124-142) and `tools/utils_pca.py`
(per-timestep PCA over activation dumps, :13-50, faiss/sklearn). Both run
as batched XLA ops over the in-memory capture stacks from
``editing/capture.py`` instead of re-reading thousands of .npy dumps.

Shapes: ``feats`` is [N, T, ...feature] (N samples, T grid timesteps) and
results are per-timestep grids [T, A, ...] / [T, K, ...] directly usable
by :class:`~uspace_tpu.editing.specs.USpaceEdit` after selecting a row.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Public attribute vocabularies (tools/utils_attr.py:15-90; names are the
# standard CelebA / FFHQ-emotion labels).
CELEBA_ATTR40 = (
    "5_o_Clock_Shadow Arched_Eyebrows Attractive Bags_Under_Eyes Bald Bangs "
    "Big_Lips Big_Nose Black_Hair Blond_Hair Blurry Brown_Hair "
    "Bushy_Eyebrows Chubby Double_Chin Eyeglasses Goatee Gray_Hair "
    "Heavy_Makeup High_Cheekbones Male Mouth_Slightly_Open Mustache "
    "Narrow_Eyes No_Beard Oval_Face Pale_Skin Pointy_Nose Receding_Hairline "
    "Rosy_Cheeks Sideburns Smiling Straight_Hair Wavy_Hair Wearing_Earrings "
    "Wearing_Hat Wearing_Lipstick Wearing_Necklace Wearing_Necktie Young"
).split()

FFHQ_ATTR11 = [
    "gender", "smile", "no_glasses", "anger", "contempt", "disgust",
    "fear", "happiness", "neutral", "sadness", "surprise",
]


def attr_name(attr_id: int, num_attrs: int) -> str:
    vocab = {40: CELEBA_ATTR40, 11: FFHQ_ATTR11}.get(num_attrs)
    return vocab[attr_id] if vocab else f"attr_{attr_id}"


def attr_delta(feats: Array, attr: Array) -> Array:
    """mean(feats | attr=1) - mean(feats | attr=0) for one binary attr.

    feats [N, ...], attr [N] in {0,1} -> delta [...]
    (reference cal_delta_direction, utils_attr.py:124-142).
    """
    attr = attr.astype(jnp.float32)
    w_pos = attr / jnp.maximum(attr.sum(), 1.0)
    w_neg = (1.0 - attr) / jnp.maximum((1.0 - attr).sum(), 1.0)
    axes = (0,)
    shape = (-1,) + (1,) * (feats.ndim - 1)
    pos = (feats * w_pos.reshape(shape)).sum(axis=0)
    neg = (feats * w_neg.reshape(shape)).sum(axis=0)
    return pos - neg


def attr_delta_directions(feats: Array, attrs: Array) -> Array:
    """All attributes, all timesteps: feats [N, T, ...], attrs [N, A]
    -> [T, A, ...] delta grid (the in-memory equivalent of the
    per-timestep ``delta_{t:.2f}.npy`` files, utils_attr.py:160-207)."""
    deltas = jax.vmap(lambda a: attr_delta(feats, a), in_axes=1)(attrs)
    # [A, T, ...] -> [T, A, ...]
    return jnp.swapaxes(deltas, 0, 1)


def latentz_delta(latents: Array, attrs: Array) -> Array:
    """z-space (x0) directions: [N, ...], [N, A] -> [A, ...]
    (reference cal_latentz_delta, utils_attr.py:145-157)."""
    return jax.vmap(lambda a: attr_delta(latents, a), in_axes=1)(attrs)


def pca_components(
    feats: Array, n_components: int, center: bool = True
) -> Tuple[Array, Array]:
    """Top-k PCA directions of flattened features.

    feats [N, ...] -> (components [K, ...], explained_variance [K]).
    SVD on the centered data matrix (the reference uses faiss/sklearn
    PCA, tools/utils_pca.py:13-50 / tools/utils_vis.py:38-117).
    """
    n = feats.shape[0]
    flat = feats.reshape(n, -1).astype(jnp.float32)
    if center:
        flat = flat - flat.mean(axis=0, keepdims=True)
    _, s, vt = jnp.linalg.svd(flat, full_matrices=False)
    comps = vt[:n_components].reshape((n_components,) + feats.shape[1:])
    var = (s[:n_components] ** 2) / jnp.maximum(n - 1, 1)
    return comps, var


def pca_directions(feats: Array, n_components: int) -> Array:
    """Per-timestep PCA: feats [N, T, ...] -> [T, K, ...] grid (the
    in-memory ``pca{n}_{t:.2f}.npy`` equivalent)."""
    def per_t(ft):
        comps, _ = pca_components(ft, n_components)
        return comps

    return jax.vmap(per_t, in_axes=1)(feats)


def orthogonality_error(components: Array) -> float:
    """Max |<c_i, c_j>| off-diagonal — the reference's PCA sanity check
    (tools/utils_vis.py:107-114)."""
    k = components.shape[0]
    flat = components.reshape(k, -1)
    flat = flat / jnp.linalg.norm(flat, axis=1, keepdims=True)
    g = flat @ flat.T - jnp.eye(k)
    return float(jnp.abs(g).max())


def select_direction(grid: Array, ith: Union[int, str]) -> Array:
    """Pick one direction row from a [T, A, ...] grid.

    ``ith`` int -> that row; "31_39_20" -> average of listed rows
    (reference multi-attr averaging, dissection.py:55-70).
    Returns [T, ...] ready for USpaceEdit.delta_grid.
    """
    if isinstance(ith, str):
        ids = [int(tok) for tok in ith.split("_")]
        return jnp.mean(jnp.stack([grid[:, i] for i in ids]), axis=0)
    return grid[:, int(ith)]
