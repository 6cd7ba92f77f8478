"""InceptionV3 (pool3, 2048-d) feature extractor for FID, in Flax.

Counterpart of `/root/reference/tools/inception.py` (the pytorch-fid port
of the TF-weights InceptionV3). Clean-room NHWC implementation of the
torchvision InceptionV3 graph with pytorch-fid's FID modifications:
average pools inside Inception blocks exclude padding
(``count_include_pad=False``) and the final InceptionE uses a max pool in
its pool branch. Weight conversion from the pytorch-fid checkpoint
(``pt_inception-2015-12-05``) lives in :func:`inception_torch_to_flax`;
module names mirror the torch names so the mapping is mechanical.

Input contract (tools/fid_score.py / inception.py): float images in
[0, 1], NHWC; resized to 299x299 bilinear, scaled to [-1, 1].
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

POOL3_DIM = 2048


class BasicConv2d(nn.Module):
    """conv + frozen batchnorm(eps=1e-3) + relu."""

    out_ch: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avg_pool_nopad_count(x):
    """3x3 stride-1 avg pool, pad 1, count_include_pad=False
    (the pytorch-fid FID modification)."""
    ones = jnp.ones_like(x[..., :1])
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    c = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / c


def _max_pool(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), (stride, stride), "VALID")


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)),
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(
            _avg_pool_nopad_count(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        p03 = ((0, 0), (3, 3))
        p30 = ((3, 3), (0, 0))
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p03, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p30, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=p30, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p03, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p30, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p03, name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(
            _avg_pool_nopad_count(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # "avg" (7b) or "max" (7c, pytorch-fid E_2)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            pooled = _avg_pool_nopad_count(x)
        else:
            pooled = nn.max_pool(x, (3, 3), (1, 1),
                                 padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """pool3 feature extractor: images [B, H, W, 3] in [0, 1] ->
    [B, 2048] activations."""

    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.resize_input:
            b = x.shape[0]
            # antialias=False matches pytorch-fid's F.interpolate(bilinear)
            # exactly; the default antialias=True diverges on DOWNSCALES
            # (inputs larger than 299px), making FID non-comparable
            x = jax.image.resize(x, (b, 299, 299, 3), method="bilinear",
                                 antialias=False)
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)),
                        name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # global average pool -> [B, 2048]


def inception_torch_to_flax(state_dict) -> dict:
    """Convert the pytorch-fid InceptionV3 checkpoint. Torch layout:
    ``Mixed_5b.branch1x1.conv.weight`` + bn running stats."""
    import numpy as np

    flat = {}
    for k, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        parts = k.split(".")
        if parts[0] == "fc" or "AuxLogits" in parts[0]:
            continue
        mod_path, leaf = parts[:-1], parts[-1]
        if mod_path[-1] == "conv":
            if leaf != "weight":
                continue
            path = mod_path[:-1] + ["conv", "kernel"]
            arr = arr.transpose(2, 3, 1, 0)
        elif mod_path[-1] == "bn":
            name = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean", "running_var": "bn_var"}.get(leaf)
            if name is None:
                continue
            path = mod_path[:-1] + [name]
        else:
            continue
        node = flat
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return flat
