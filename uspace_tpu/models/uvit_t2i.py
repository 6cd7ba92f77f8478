"""U-ViT-T2I: text-conditional U-ViT with in-context CLIP tokens.

TPU-native redesign of `/root/reference/libs/uvit_t2i.py:192-343`. Token
layout is ``[1 time, num_clip_token context, num_patches image]`` (334 for
the 256px configs — `tools/utils_t2i.py:20-22`); CLIP embeddings enter via
a linear ``context_embed`` (clip_dim -> embed_dim, `uvit_t2i.py:234`).

Attention editing (prompt-to-prompt): the reference forces O(L^2) math
attention and mutates the materialized [B,H,334,334] map whenever editing
is active (`uvit_t2i.py:91-107`). Here an :class:`AttnEdit` pytree carries
per-key-column multipliers that the attention op folds exactly into V
(see `ops/attention.py`), so edited sampling keeps the fused kernel.
Blocks are numbered 0..depth-1 in call order (in -> mid -> out), matching
the reference's ``_counter["block_id"]`` threading for per-block gating.
``capture_attn`` returns attention probabilities for selected blocks
(attention-map visualization, `tools/utils_t2i.py:141-193`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..editing.specs import AttnEdit, USpaceEdit
from .layers import (
    LN_EPS,
    Block,
    dense_init,
    timestep_embedding,
    unpatchify,
)
from .layers import PatchEmbed

Array = jax.Array


class UViTT2I(nn.Module):
    img_size: int = 32
    patch_size: int = 2
    in_chans: int = 4
    embed_dim: int = 512
    depth: int = 16
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    mlp_time_embed: bool = False
    clip_dim: int = 768
    num_clip_token: int = 77
    use_checkpoint: bool = False
    # with use_checkpoint: blocks exempted from remat (models/uvit.py)
    remat_exempt: int = 0
    conv: bool = True
    skip: bool = True
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    # quantized sampling views (True/"w8a8" | "w8"); see models/uvit.py
    quant: Any = False

    @property
    def extras(self) -> int:
        return 1 + self.num_clip_token

    @nn.compact
    def __call__(
        self,
        x: Array,
        timesteps: Array,
        context: Array,
        *,
        edit: Optional[USpaceEdit] = None,
        attn_edit: Optional[AttnEdit] = None,
        capture: Tuple[str, ...] = (),
        capture_attn: Tuple[int, ...] = (),
    ):
        """Args:
          x: latents [B, H, W, C]; timesteps [B]; context [B, 77, clip_dim].
          edit: optional u-space write edit (head/mid/tail taps, as UViT).
          attn_edit: optional p2p column rescale over the 334-token axis.
          capture: tap names for activation capture.
          capture_attn: static block ids whose attention probabilities are
            returned in taps as ``attn_{i}`` ([B, H, L, L], f32).

        Returns ``(velocity, taps)``.
        """
        taps: Dict[str, Array] = {}
        t_scalar = timesteps[0]

        if edit is not None and edit.loc == "head":
            x = edit.apply(x, t_scalar)
        if "head" in capture:
            taps["head"] = x

        num_patches = (self.img_size // self.patch_size) ** 2
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=self.embed_dim,
                       dtype=self.dtype, name="patch_embed")(x)

        t_emb = timestep_embedding(timesteps, self.embed_dim).astype(self.dtype)
        if self.mlp_time_embed:
            t_emb = nn.Dense(4 * self.embed_dim, dtype=self.dtype,
                             kernel_init=dense_init, name="time_embed_fc1")(t_emb)
            t_emb = nn.silu(t_emb)
            t_emb = nn.Dense(self.embed_dim, dtype=self.dtype,
                             kernel_init=dense_init, name="time_embed_fc2")(t_emb)
        context_tok = nn.Dense(self.embed_dim, dtype=self.dtype,
                               kernel_init=dense_init, name="context_embed")(
            context.astype(self.dtype)
        )
        x = jnp.concatenate([t_emb[:, None, :], context_tok, x], axis=1)

        pos_embed = self.param(
            "pos_embed", dense_init,
            (1, self.extras + num_patches, self.embed_dim),
        )
        x = x + pos_embed.astype(self.dtype)

        def make_block(skip: bool, name: str, use_remat: bool):
            # remat only on the pure-array training path: static kwargs
            # (block_id, capture flag) and edit pytrees must not be traced
            # through jax.checkpoint
            cls = nn.remat(Block) if use_remat else Block
            return cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale, skip=skip,
                dtype=self.dtype, attn_impl=self.attn_impl,
                quant=self.quant, name=name,
            )

        # remat_exempt blocks (evenly spread) skip remat: see models/uvit.py
        total_blocks = self.depth + 1
        k = min(self.remat_exempt, total_blocks) if self.use_checkpoint \
            else 0
        exempt = {int(j * total_blocks / k) for j in range(k)} if k \
            else set()

        def run(blk_args, x, skip, block_id):
            cap = block_id in capture_attn
            plain = not cap and attn_edit is None
            blk = make_block(*blk_args,
                             use_remat=self.use_checkpoint and plain
                             and block_id not in exempt)
            if plain:
                # array-only call (remat-safe); attention editing inactive
                return blk(x, skip) if skip is not None else blk(x)
            args = dict(t=t_scalar, attn_edit=attn_edit, block_id=block_id,
                        capture_probs=cap)
            out = blk(x, skip, **args) if skip is not None else blk(x, None, **args)
            if cap:
                out, probs = out
                taps[f"attn_{block_id}"] = probs
            return out

        block_id = 0
        skips = []
        for i in range(self.depth // 2):
            x = run((False, f"in_blocks_{i}"), x, None, block_id)
            skips.append(x)
            block_id += 1

        x = run((False, "mid_block"), x, None, block_id)
        block_id += 1

        if edit is not None and edit.loc == "mid":
            x = edit.apply(x, t_scalar)
        if "mid" in capture:
            taps["mid"] = x

        for i in range(self.depth // 2):
            x = run((True, f"out_blocks_{i}"), x, skips.pop(), block_id)
            block_id += 1

        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        patch_dim = self.patch_size**2 * self.in_chans
        x = nn.Dense(patch_dim, dtype=self.dtype, kernel_init=dense_init,
                     name="decoder_pred")(x)
        x = x[:, self.extras:, :]
        x = unpatchify(x, self.in_chans)
        if self.conv:
            x = nn.Conv(self.in_chans, kernel_size=(3, 3), padding="SAME",
                        dtype=self.dtype, name="final_layer")(x)

        if edit is not None and edit.loc == "tail":
            x = edit.apply(x, t_scalar)
        if "tail" in capture:
            taps["tail"] = x
        return x, taps
