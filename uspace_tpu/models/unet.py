"""Stable-Diffusion UNet velocity field (NHWC Flax).

TPU-native redesign of the reference's guided-diffusion/SD UNet
(`/root/reference/libs/sd/openaimodel.py:464-852` with
`libs/sd/attention.py` SpatialTransformer and `libs/sd/util.py` helpers):
ResBlocks with (optional scale-shift) time conditioning, cross-attention
via SpatialTransformer at the configured downsample rates, skip-cat
decoder, zero-initialized output conv. Constructor surface matches the
reference config block (`configs/lfm_cm256_unet_large.py:45-58`).

Notes:
- attention uses this package's fused kernel (ops/attention.py) for
  self-attention and XLA einsum for the (tiny-context) cross-attention;
- u-space edit hooks (head/mid/tail taps) take a
  :class:`~uspace_tpu.editing.specs.USpaceEdit` pytree — replacing
  ``dissect_helper_unet`` (`libs/sd/openaimodel.py:833-842`) including
  its adaptive-solver delta interpolation (handled by interp_grid);
- the reference's forward asserts a context even for unconditional
  configs and keeps an unused ``context_fixed`` zeros buffer
  (openaimodel.py:789-790,820): here a missing context falls back to a
  zeros [B, 1, context_dim] token, making the uncond UNet configs
  actually trainable;
- ``V_Space``/latent-1d is dead experimental code in the reference
  (SURVEY.md §2.2) and is not replicated.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..editing.specs import USpaceEdit
from ..ops.attention import multi_head_attention
from .layers import Int8Conv, Int8Dense, timestep_embedding

Array = jax.Array

zero_init = nn.initializers.zeros


def _conv(quant, features, kernel_size, *, strides=(1, 1), padding="SAME",
          kernel_init=nn.initializers.lecun_normal(), dtype, name):
    """nn.Conv or its int8 twin, same param tree either way.

    The UNet's measured-optimal int8 view (``quant=True``) quantizes the
    CONVS ONLY: on TPU the int8 MXU conv wins even with the unfused
    dynamic-quantize passes around XLA's conv (24.1 vs 21.7 img/s at the
    bench shape), while Int8Dense on the UNet's transformer shapes LOSES
    to bf16 (19.4 img/s — the quantize/dequant HBM passes around small
    [L,C] dots cost more than the int8 dots save; the U-ViT only wins
    there because its Pallas kernels quantize in-VMEM). Full W8A8
    ("w8a8") and denses-only ("dense8") stay selectable as diagnostic
    views. Measurements: experiments/int8_unet_probe.py."""
    if quant in (True, "w8a8", "conv8"):
        return Int8Conv(features, tuple(kernel_size), strides=strides,
                        padding=padding, kernel_init=kernel_init,
                        dtype=dtype, name=name)
    return nn.Conv(features, kernel_size, strides=strides, padding=padding,
                   kernel_init=kernel_init, dtype=dtype, name=name)


def _udense(quant, features, *, use_bias=True, dtype, name):
    """nn.Dense or Int8Dense with the UNet's (flax-default) init.
    See `_conv`: ``quant=True`` leaves these bf16 (measured faster)."""
    cls = Int8Dense if quant in ("w8a8", "dense8") else nn.Dense
    return cls(features, use_bias=use_bias, dtype=dtype,
               kernel_init=nn.initializers.lecun_normal(), name=name)


def group_norm(x, name):
    # GroupNorm32: fp32 normalization, 32 groups, eps 1e-5
    # (libs/sd/util.py:238-240; torch GroupNorm default eps).
    # Group count degrades gracefully for narrow (test-scale) channels.
    import math

    groups = math.gcd(32, x.shape[-1])
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, name=name)(
        x.astype(jnp.float32)
    ).astype(x.dtype)


class ResBlock(nn.Module):
    """Residual block with timestep-embedding conditioning
    (openaimodel.py:182-293)."""

    out_channels: Optional[int] = None
    use_scale_shift_norm: bool = False
    updown: int = 0  # +1 up, -1 down, 0 none (resblock_updown variants)
    dtype: Any = jnp.float32
    quant: Any = False  # False | True ("conv8") | "w8a8" | "dense8"

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = group_norm(x, "in_norm")
        h = nn.silu(h)
        if self.updown == 1:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c), "nearest")
            x = jax.image.resize(x, (b, 2 * hh, 2 * ww, c), "nearest")
        elif self.updown == -1:
            h = nn.avg_pool(h, (2, 2), (2, 2))
            x = nn.avg_pool(x, (2, 2), (2, 2))
        h = _conv(self.quant, out_ch, (3, 3), dtype=self.dtype,
                  name="in_conv")(h)
        e = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb))
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = group_norm(h, "out_norm") * (1 + scale[:, None, None, :]) \
                + shift[:, None, None, :]
            h = nn.silu(h)
        else:
            h = h + e[:, None, None, :]
            h = nn.silu(group_norm(h, "out_norm"))
        h = _conv(self.quant, out_ch, (3, 3), dtype=self.dtype,
                  kernel_init=zero_init, name="out_conv")(h)
        if in_ch != out_ch:
            # stays full precision in the quant view: its input is the
            # RAW residual stream (no GroupNorm in front), exactly where
            # per-channel outliers accumulate — and 1x1 channel-change
            # convs are a tiny FLOP fraction
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class CrossAttention(nn.Module):
    """Q from x, K/V from context (or x when self-attention)
    (libs/sd/attention.py:149-189)."""

    num_heads: int
    head_dim: int
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    quant: Any = False

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        b, l, c = x.shape
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        q = _udense(self.quant, inner, use_bias=False, dtype=self.dtype,
                    name="to_q")(x)
        k = _udense(self.quant, inner, use_bias=False, dtype=self.dtype,
                    name="to_k")(ctx)
        v = _udense(self.quant, inner, use_bias=False, dtype=self.dtype,
                    name="to_v")(ctx)
        lk = ctx.shape[1]
        q = q.reshape(b, l, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        if context is None and l == lk:
            out = multi_head_attention(q, k, v, impl=self.attn_impl)
        else:
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s * self.head_dim**-0.5, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return _udense(self.quant, c, dtype=self.dtype, name="to_out")(out)


class FeedForwardGEGLU(nn.Module):
    """GEGLU feed-forward (libs/sd/attention.py:192-229; mult=4)."""

    mult: int = 4
    dtype: Any = jnp.float32
    quant: Any = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        inner = c * self.mult
        xg = _udense(self.quant, 2 * inner, dtype=self.dtype,
                     name="geglu_proj")(x)
        xx, gate = jnp.split(xg, 2, axis=-1)
        from .layers import gelu_exact

        h = xx * gelu_exact(gate)  # erf-polynomial (fast) exact GELU
        return _udense(self.quant, c, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    quant: Any = False

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        x = x + CrossAttention(self.num_heads, self.head_dim,
                               dtype=self.dtype, attn_impl=self.attn_impl,
                               quant=self.quant, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x))
        x = x + CrossAttention(self.num_heads, self.head_dim,
                               dtype=self.dtype, attn_impl=self.attn_impl,
                               quant=self.quant, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x),
            context)
        x = x + FeedForwardGEGLU(dtype=self.dtype, quant=self.quant,
                                 name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    """1x1 proj -> transformer blocks over spatial tokens -> zero-init
    1x1 proj, residual (libs/sd/attention.py:232-277)."""

    num_heads: int
    head_dim: int
    depth: int = 1
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    quant: Any = False

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        b, h, w, c = x.shape
        inner = self.num_heads * self.head_dim
        res = x
        x = group_norm(x, "norm")
        x = _conv(self.quant, inner, (1, 1), dtype=self.dtype,
                  name="proj_in")(x)
        x = x.reshape(b, h * w, inner)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.num_heads, self.head_dim, dtype=self.dtype,
                attn_impl=self.attn_impl, quant=self.quant,
                name=f"blocks_{i}",
            )(x, context)
        x = x.reshape(b, h, w, inner)
        x = _conv(self.quant, c, (1, 1), dtype=self.dtype,
                  kernel_init=zero_init, name="proj_out")(x)
        return x + res


class AttnBlockLegacy(nn.Module):
    """QKV self-attention block for non-spatial-transformer configs
    (openaimodel.py:296-430, QKVAttentionLegacy path)."""

    num_heads: int
    dtype: Any = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        l = h * w
        hn = self.num_heads
        d = c // hn
        y = group_norm(x, "norm").reshape(b, l, c)
        qkv = nn.Conv(3 * c, (1,), dtype=self.dtype, name="qkv")(y)
        # legacy layout: channels are [H * (3d)] — split per head then qkv
        qkv = qkv.reshape(b, l, hn, 3 * d).transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = multi_head_attention(q, k, v, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, c)
        out = nn.Conv(c, (1,), dtype=self.dtype, kernel_init=zero_init,
                      name="proj_out")(out)
        return x + out.reshape(b, h, w, c)


class UNet(nn.Module):
    """SD UNetModel (reference constructor surface; NHWC activations)."""

    image_size: int = 32
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 256
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4)
    num_heads: int = -1
    num_head_channels: int = -1
    num_classes: Optional[int] = None
    use_scale_shift_norm: bool = False
    use_spatial_transformer: bool = True
    transformer_depth: int = 1
    context_dim: Optional[int] = 768
    use_checkpoint: bool = False
    legacy: bool = True
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    # int8 W8A8 sampling view (ops/quant.py): quant=True quantizes every
    # ResBlock / up/down / SpatialTransformer CONV (int8 MXU convs
    # measured 1.2-1.6x bf16, experiments/int8_conv_probe.py; whole-model
    # 24.1 vs 21.7 img/s) and leaves the transformer Denses bf16 —
    # Int8Dense at these [L,C] shapes measured a net LOSS (see _conv).
    # "w8a8"/"dense8" select the full / denses-only diagnostic views.
    # Param tree identical to the bf16 view. The in/out boundary convs
    # stay bf16 (negligible FLOPs, output precision).
    quant: Any = False  # False | True ("conv8") | "w8a8" | "dense8"

    def _heads(self, ch: int) -> Tuple[int, int]:
        if self.num_head_channels == -1:
            nh = self.num_heads if self.num_heads != -1 else 8
            return nh, ch // nh
        nh = ch // self.num_head_channels
        dim_head = self.num_head_channels
        if self.legacy:
            dim_head = (ch // nh if self.use_spatial_transformer
                        else self.num_head_channels)
        return nh, dim_head

    def _res_cls(self):
        # per-block remat (counterpart of the reference's CheckpointFunction,
        # libs/sd/util.py:122-168); ResBlock takes arrays only — remat-safe
        return nn.remat(ResBlock) if self.use_checkpoint else ResBlock

    def _attn(self, ch: int, name: str):
        nh, dh = self._heads(ch)
        if self.use_spatial_transformer:
            cls = (nn.remat(SpatialTransformer) if self.use_checkpoint
                   else SpatialTransformer)
            return cls(
                nh, dh, depth=self.transformer_depth, dtype=self.dtype,
                attn_impl=self.attn_impl, quant=self.quant, name=name,
            )
        cls = (nn.remat(AttnBlockLegacy) if self.use_checkpoint
               else AttnBlockLegacy)
        return cls(nh, dtype=self.dtype, attn_impl=self.attn_impl,
                   name=name)

    @nn.compact
    def __call__(
        self,
        x: Array,
        timesteps: Array,
        context: Optional[Array] = None,
        y: Optional[Array] = None,
        *,
        edit: Optional[USpaceEdit] = None,
        capture: Tuple[str, ...] = (),
    ):
        taps = {}
        t_scalar = timesteps[0]
        ch0 = self.model_channels
        t_emb = timestep_embedding(timesteps, ch0).astype(self.dtype)
        emb = nn.Dense(4 * ch0, dtype=self.dtype, name="time_embed_fc1")(t_emb)
        emb = nn.Dense(4 * ch0, dtype=self.dtype,
                       name="time_embed_fc2")(nn.silu(emb))
        if self.num_classes is not None:
            assert y is not None, "class-conditional UNet requires y"
            emb = emb + nn.Embed(self.num_classes, 4 * ch0, dtype=self.dtype,
                                 name="label_emb")(y)
        if self.use_spatial_transformer and context is None:
            # reference keeps a zeros context_fixed for cond-free configs
            context = jnp.zeros((x.shape[0], 1, self.context_dim), x.dtype)

        if edit is not None and edit.loc == "head":
            x = edit.apply(x, t_scalar)
        if "head" in capture:
            taps["head"] = x

        h = nn.Conv(ch0, (3, 3), padding="SAME", dtype=self.dtype,
                    name="input_blocks_0_0")(x)
        hs = [h]
        ch = ch0
        ds = 1
        idx = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = self._res_cls()(out_channels=mult * ch0,
                             use_scale_shift_norm=self.use_scale_shift_norm,
                             dtype=self.dtype, quant=self.quant,
                             name=f"input_blocks_{idx}_0")(h, emb)
                ch = mult * ch0
                if ds in self.attention_resolutions:
                    h = self._attn(ch, f"input_blocks_{idx}_1")(h, context) \
                        if self.use_spatial_transformer else \
                        self._attn(ch, f"input_blocks_{idx}_1")(h)
                hs.append(h)
                idx += 1
            if level != len(self.channel_mult) - 1:
                # torch Downsample pads 1 on both sides (k3 s2); XLA's
                # "SAME" would pad (0, 1) and shift the window grid
                h = _conv(self.quant, ch, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)), dtype=self.dtype,
                          name=f"input_blocks_{idx}_0_down")(h)
                hs.append(h)
                idx += 1
                ds *= 2

        h = self._res_cls()(use_scale_shift_norm=self.use_scale_shift_norm,
                            dtype=self.dtype, quant=self.quant,
                            name="middle_block_0")(h, emb)
        h = self._attn(ch, "middle_block_1")(h, context) \
            if self.use_spatial_transformer else \
            self._attn(ch, "middle_block_1")(h)
        h = self._res_cls()(use_scale_shift_norm=self.use_scale_shift_norm,
                            dtype=self.dtype, quant=self.quant,
                            name="middle_block_2")(h, emb)

        if edit is not None and edit.loc == "mid":
            h = edit.apply(h, t_scalar)
        if "mid" in capture:
            taps["mid"] = h

        idx = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = self._res_cls()(out_channels=ch0 * mult,
                             use_scale_shift_norm=self.use_scale_shift_norm,
                             dtype=self.dtype, quant=self.quant,
                             name=f"output_blocks_{idx}_0")(h, emb)
                ch = ch0 * mult
                if ds in self.attention_resolutions:
                    h = self._attn(ch, f"output_blocks_{idx}_1")(h, context) \
                        if self.use_spatial_transformer else \
                        self._attn(ch, f"output_blocks_{idx}_1")(h)
                if level and i == self.num_res_blocks:
                    b, hh, ww, c = h.shape
                    h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c), "nearest")
                    h = _conv(self.quant, c, (3, 3), dtype=self.dtype,
                              name=f"output_blocks_{idx}_up")(h)
                    ds //= 2
                idx += 1

        h = nn.silu(group_norm(h, "out_norm"))
        out = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                      dtype=self.dtype, kernel_init=zero_init,
                      name="out_conv")(h)

        if edit is not None and edit.loc == "tail":
            out = edit.apply(out, t_scalar)
        if "tail" in capture:
            taps["tail"] = out
        return out, taps
