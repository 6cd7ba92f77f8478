"""Stable-Diffusion KL autoencoder (frozen codec) in Flax, NHWC.

TPU-native port of `/root/reference/libs/autoencoder.py` (the SD
first-stage VAE used to map 256px RGB <-> 4x32x32 latents): resnet
encoder/decoder stacks (ch=128, ch_mult=[1,2,4,4], 2 res blocks,
attn only in the mid block for the SD config), quant convs, and the
reparameterized ``sample`` with scale_factor=0.18215
(`autoencoder.py:413,433-439`). API parity: ``encode_moments`` /
``sample`` / ``encode`` / ``decode`` (`autoencoder.py:428-450`).

The codec is frozen: params live outside any optimizer; encode/decode are
pure jitted functions. Weight conversion from the reference's
``autoencoder_kl.pth`` lives in ``codecs/convert.py``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

SD_CONFIG = dict(  # `libs/autoencoder.py:463-476`
    ch=128,
    out_ch=3,
    ch_mult=(1, 2, 4, 4),
    num_res_blocks=2,
    attn_resolutions=(),
    in_channels=3,
    resolution=256,
    z_channels=4,
    double_z=True,
)
SD_EMBED_DIM = 4
SD_SCALE_FACTOR = 0.18215


def swish(x):
    return x * jax.nn.sigmoid(x)


def _conv3(quant, out_ch, *, dtype, name, strides=(1, 1), padding="SAME"):
    """3x3 nn.Conv or its int8 twin (same param tree). The int8 decode
    view quantizes the 3x3 convs only — they carry the decoder's FLOPs;
    raw int8 conv rate measured 1.1-1.6x bf16 at the decoder's shapes
    (experiments/int8_conv_probe.py `vae`). 1x1 convs (nin_shortcut,
    attn projections, quant convs) and the in/out boundary convs stay at
    `dtype` (small FLOPs / output precision), mirroring the SD-UNet's
    convs-only view (models/unet.py `_conv`)."""
    if quant:
        from ..models.layers import Int8Conv

        return Int8Conv(out_ch, (3, 3), strides=strides, padding=padding,
                        dtype=dtype, name=name)
    return nn.Conv(out_ch, (3, 3), strides=strides, padding=padding,
                   dtype=dtype, name=name)


class ResnetBlock(nn.Module):
    out_channels: Optional[int] = None
    dtype: Any = jnp.float32
    quant: Any = False

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm1")(x)
        h = swish(h)
        h = _conv3(self.quant, out_ch, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm2")(h)
        h = swish(h)
        h = _conv3(self.quant, out_ch, dtype=self.dtype, name="conv2")(h)
        if in_ch != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions
    (autoencoder.py:143-195)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h)
        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        w = jnp.einsum("bic,bjc->bij", q, k,
                       preferred_element_type=jnp.float32) * (c**-0.5)
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        out = jnp.einsum("bij,bjc->bic", w, v).reshape(b, hh, ww, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """k3 s2 conv with torch's asymmetric (0,1,0,1) pad
    (autoencoder.py:53-72)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """2x nearest upsample + k3 conv (autoencoder.py:35-50)."""

    dtype: Any = jnp.float32
    quant: Any = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return _conv3(self.quant, c, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x)
        curr_res = self.resolution
        for i_level, mult in enumerate(self.ch_mult):
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(out_channels=self.ch * mult, dtype=self.dtype,
                                name=f"down_{i_level}_block_{i_block}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != len(self.ch_mult) - 1:
                h = Downsample(dtype=self.dtype,
                               name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    z_channels: int = 4
    dtype: Any = jnp.float32
    quant: Any = False  # int8 decode view: 3x3 convs via Int8Conv

    @nn.compact
    def __call__(self, z):
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_res - 1)
        h = nn.Conv(block_in, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock(dtype=self.dtype, quant=self.quant,
                        name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dtype=self.dtype, quant=self.quant,
                        name="mid_block_2")(h)
        for i_level in reversed(range(num_res)):
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(out_channels=self.ch * self.ch_mult[i_level],
                                dtype=self.dtype, quant=self.quant,
                                name=f"up_{i_level}_block_{i_block}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, quant=self.quant,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm_out")(h)
        h = swish(h)
        return nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """Frozen SD KL-VAE (reference FrozenAutoencoderKL,
    autoencoder.py:412-460). NHWC; moments are [B, h, w, 2*embed_dim]
    (mean ‖ logvar on the channel axis)."""

    ddconfig: dict = None
    embed_dim: int = SD_EMBED_DIM
    scale_factor: float = SD_SCALE_FACTOR
    dtype: Any = jnp.float32
    # int8 DECODE view (sampling-time only): the decoder's 3x3 convs run
    # as int8 MXU convs (see `_conv3`). Param tree identical to the
    # plain view, encoder untouched. Quality is asset-gated against the
    # real SD weights (tests/test_assets.py) and probed at random init
    # (tests/test_codecs.py) — weight outliers can shift with the real
    # checkpoint, so treat it as an opt-in deployment view.
    quant: Any = False

    def setup(self):
        cfg = dict(self.ddconfig or SD_CONFIG)
        cfg.pop("in_channels", None)
        cfg.pop("out_ch", None)
        out_ch = (self.ddconfig or SD_CONFIG).get("out_ch", 3)
        self.encoder = Encoder(
            ch=cfg["ch"], ch_mult=tuple(cfg["ch_mult"]),
            num_res_blocks=cfg["num_res_blocks"],
            attn_resolutions=tuple(cfg["attn_resolutions"]),
            resolution=cfg["resolution"], z_channels=cfg["z_channels"],
            double_z=cfg.get("double_z", True), dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=cfg["ch"], out_ch=out_ch, ch_mult=tuple(cfg["ch_mult"]),
            num_res_blocks=cfg["num_res_blocks"],
            attn_resolutions=tuple(cfg["attn_resolutions"]),
            resolution=cfg["resolution"], z_channels=cfg["z_channels"],
            dtype=self.dtype, quant=self.quant,
        )
        zc = cfg["z_channels"]
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(zc, (1, 1), dtype=self.dtype,
                                       name="post_quant_conv")

    def encode_moments(self, x: Array) -> Array:
        return self.quant_conv(self.encoder(x))

    def sample(self, moments: Array, rng: Array) -> Array:
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return self.scale_factor * z

    def encode(self, x: Array, rng: Array) -> Array:
        return self.sample(self.encode_moments(x), rng)

    def decode(self, z: Array) -> Array:
        return self.decoder(self.post_quant_conv(z / self.scale_factor))

    def __call__(self, x, rng):  # for init
        moments = self.encode_moments(x)
        z = self.sample(moments, rng)
        return self.decode(z), moments
