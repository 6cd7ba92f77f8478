"""U-ViT velocity-field network (unconditional / class-conditional).

TPU-native redesign of the reference UViT (`/root/reference/libs/uvit.py:
182-351`): ViT with long skip connections over SD-VAE latents. Token layout
is ``[label? , time, patches]`` (extras = 2 with classes, else 1), learned
position embedding, depth//2 in-blocks -> mid-block -> depth//2 out-blocks
with skip fusion, linear decoder + unpatchify + 3x3 conv.

Differences from the reference (deliberate, TPU-first):

- NHWC activations; Pallas fused attention (ops/attention.py) instead of
  torch SDPA.
- Editing hooks are pure: an optional :class:`USpaceEdit` pytree applies
  ``x + gate(t)*scale*delta(t)`` at its head/mid/tail tap, and ``capture``
  returns the same tap activations as aux outputs — replacing the
  reference's np.save/np.load inside forward (`libs/dissection.py`) and
  fixing its defect that ``kwargs["edit_loc"]`` was mandatory during
  training (`libs/uvit.py:313` vs `train_lfm.py:163`).
- ``jax.checkpoint`` (remat) per block when ``use_checkpoint`` — the
  counterpart of torch.utils.checkpoint (`libs/uvit.py:148-149`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..editing.specs import USpaceEdit
from .layers import (
    LN_EPS,
    Block,
    Mlp,
    PatchEmbed,
    dense_init,
    patchify,
    timestep_embedding,
    unpatchify,
)

Array = jax.Array


class UViT(nn.Module):
    """Velocity field v_theta(x, t[, y]) -> v.

    Matches the reference constructor surface (configs/*.py `nnet` block):
    img_size, patch_size, in_chans, embed_dim, depth, num_heads, mlp_ratio,
    qkv_bias, mlp_time_embed, num_classes, use_checkpoint.
    """

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
    num_classes: int = -1
    use_checkpoint: bool = False
    # with use_checkpoint: number of blocks (evenly spread over depth)
    # EXEMPTED from remat — trades HBM for skipped backward recompute
    remat_exempt: int = 0
    conv: bool = True
    skip: bool = True
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    # quantized sampling views (ops/quant.py): True/"w8a8" = int8 W8A8
    # on the block matmuls (mlp, qkv, proj, skip_linear); "w8" = int8
    # weights with bf16 activations (zero activation-rounding noise);
    # "w8a8_mlp" = int8 W8A8 on the MLP kernels only, bf16 elsewhere
    # (measured ablation: still inflates dopri5 NFE 110 -> 194; the
    # adaptive-solver quantization is core/delta_field.py instead).
    # Embeds/decoder/norms stay bf16/f32 in every view.
    quant: Any = False

    @property
    def extras(self) -> int:
        return 2 if self.num_classes > 0 else 1

    @nn.compact
    def __call__(
        self,
        x: Array,
        timesteps: Array,
        y: Optional[Array] = None,
        *,
        edit: Optional[USpaceEdit] = None,
        capture: Tuple[str, ...] = (),
    ):
        """Args:
          x: latents [B, H, W, C] (NHWC).
          timesteps: [B] flow times in [0, 1].
          y: optional [B] int class labels (num_classes > 0 only).
          edit: optional u-space write edit applied at ``edit.loc``.
          capture: static tuple of tap names ("head", "mid", "tail") whose
            activations are returned in the aux dict (the "read" phase).

        Returns ``(velocity [B,H,W,C], taps dict)``.
        """
        taps: Dict[str, Array] = {}
        t_scalar = timesteps[0]  # batch-uniform during ODE integration

        if edit is not None and edit.loc == "head":
            x = edit.apply(x, t_scalar)
        if "head" in capture:
            taps["head"] = x

        num_patches = (self.img_size // self.patch_size) ** 2
        x = PatchEmbed(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            dtype=self.dtype, name="patch_embed",
        )(x)
        b, l, _ = x.shape

        t_emb = timestep_embedding(timesteps, self.embed_dim).astype(self.dtype)
        if self.mlp_time_embed:
            t_emb = nn.Dense(4 * self.embed_dim, dtype=self.dtype,
                             kernel_init=dense_init, name="time_embed_fc1")(t_emb)
            t_emb = nn.silu(t_emb)
            t_emb = nn.Dense(self.embed_dim, dtype=self.dtype,
                             kernel_init=dense_init, name="time_embed_fc2")(t_emb)
        tokens = [t_emb[:, None, :], x]
        if self.num_classes > 0:
            if y is None:
                raise ValueError("class-conditional UViT requires labels y")
            label_emb = nn.Embed(
                self.num_classes, self.embed_dim,
                embedding_init=dense_init, dtype=self.dtype, name="label_emb",
            )(y)
            tokens = [label_emb[:, None, :]] + tokens
        x = jnp.concatenate(tokens, axis=1)

        pos_embed = self.param(
            "pos_embed", dense_init,
            (1, self.extras + num_patches, self.embed_dim),
        )
        x = x + pos_embed.astype(self.dtype)

        # remat per block trades recompute for HBM, like torch
        # checkpointing. remat_exempt > 0 leaves that many blocks
        # (spread evenly over depth) UN-rematted: each exempt block
        # skips one forward recompute in backward at the cost of keeping
        # its internal activations — a throughput/HBM dial full-remat
        # torch checkpointing doesn't have. Param tree paths are
        # identical either way (remat does not change scopes).
        rblock = nn.remat(Block)
        total_blocks = self.depth + 1
        k = min(self.remat_exempt, total_blocks) if self.use_checkpoint \
            else 0
        exempt = {int(j * total_blocks / k) for j in range(k)} if k \
            else set()

        def make_block(skip: bool, name: str, idx: int):
            cls = Block if (not self.use_checkpoint or idx in exempt) \
                else rblock
            return cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale, skip=skip,
                dtype=self.dtype, attn_impl=self.attn_impl,
                quant=self.quant, name=name,
            )

        skips = []
        for i in range(self.depth // 2):
            x = make_block(False, f"in_blocks_{i}", i)(x)
            skips.append(x)

        x = make_block(False, "mid_block", self.depth // 2)(x)

        if edit is not None and edit.loc == "mid":
            x = edit.apply(x, t_scalar)
        if "mid" in capture:
            taps["mid"] = x

        for i in range(self.depth // 2):
            x = make_block(True, f"out_blocks_{i}",
                           self.depth // 2 + 1 + i)(x, skips.pop())

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
