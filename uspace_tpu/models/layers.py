"""Shared denoiser layers: time embedding, patch ops, transformer blocks.

Functional counterparts of `/root/reference/libs/uvit.py:26-179` and the
vendored timm pieces (`libs/timm.py`), in NHWC layout (TPU-native; the
PyTorch reference is NCHW — weight converters handle the transpose).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..editing.specs import AttnEdit
from ..ops.attention import multi_head_attention


def _packed_ok() -> bool:
    """auto mode: use the packed Pallas kernel on real TPU only (the
    interpreter is too slow for CPU tests; XLA is faster there)."""
    from ..ops.attention import _on_tpu

    return _on_tpu()

Array = jax.Array

# torch defaults the reference relies on: LayerNorm eps=1e-5, exact GELU
LN_EPS = 1e-5


def gelu_exact(x):
    """Exact (erf) GELU via the Abramowitz–Stegun polynomial
    (ops/mlp._gelu_exact, |err| <= 1.5e-7 — below bf16 resolution).
    XLA lowers jnp.erfc to a much slower transcendental sequence on the
    VPU; the polynomial measured ~25% faster on the whole MLP at the
    bench shape. Evaluated in f32 (fuses into the surrounding graph)."""
    from ..ops.mlp import _gelu_exact

    return _gelu_exact(x.astype(jnp.float32)).astype(x.dtype)


def timestep_embedding(timesteps: Array, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding, [cos | sin] order
    (reference `libs/uvit.py:26-46` — note cos first)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def patchify(imgs: Array, patch_size: int) -> Array:
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C].

    Feature order within a token is (p1, p2, C), matching the reference's
    ``B C (h p1) (w p2) -> B (h w) (p1 p2 C)`` (libs/uvit.py:49-53) so
    converted torch weights line up.
    """
    b, h, w, c = imgs.shape
    p = patch_size
    x = imgs.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, h, w, p1, p2, C
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def unpatchify(x: Array, channels: int) -> Array:
    """[B, L, p*p*C] -> [B, H, W, C] (inverse of :func:`patchify`)."""
    b, l, d = x.shape
    p = int(round((d // channels) ** 0.5))
    hw = int(round(l**0.5))
    assert hw * hw == l and p * p * channels == d, (x.shape, channels)
    x = x.reshape(b, hw, hw, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hw * p, hw * p, channels)


dense_init = nn.initializers.truncated_normal(stddev=0.02)  # timm trunc_normal_


class _DenseKernel(nn.Module):
    """Creates (and returns) Dense params at the identical tree path
    nn.Dense would — used when a fused kernel consumes the weights
    directly instead of calling the XLA matmul."""

    features: int
    use_bias: bool = False
    kernel_init: Any = dense_init

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", self.kernel_init,
                       (in_features, self.features), jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            return k, b
        return k


class _LNParams(nn.Module):
    """LayerNorm params at nn.LayerNorm's tree path, for fused kernels."""

    @nn.compact
    def __call__(self, dim: int):
        s = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return s, b


class _AttnParams(nn.Module):
    """qkv/proj params under the Attention module's scope."""

    @nn.compact
    def __call__(self, c: int):
        wqkv = _DenseKernel(3 * c, name="qkv")(c)
        wproj, bproj = _DenseKernel(c, use_bias=True, name="proj")(c)
        return wqkv, wproj, bproj


class _MlpParams(nn.Module):
    """fc1/fc2 params under the Mlp module's scope, for fused kernels."""

    hidden_dim: int

    @nn.compact
    def __call__(self, c: int):
        w1, b1 = _DenseKernel(self.hidden_dim, use_bias=True, name="fc1")(c)
        w2, b2 = _DenseKernel(c, use_bias=True, name="fc2")(self.hidden_dim)
        return w1, b1, w2, b2


class Int8Dense(nn.Module):
    """W8A8 dynamically-quantized Dense with nn.Dense's exact param tree
    (kernel [in, out] f32 + optional bias), so any checkpoint loads into
    either view. Used by the int8 sampling model view (ops/quant.py)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Any = dense_init

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import int8_dense

        k = self.param("kernel", self.kernel_init,
                       (x.shape[-1], self.features), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros,
                        (self.features,), jnp.float32)
             if self.use_bias else None)
        return int8_dense(x, k, b, out_dtype=self.dtype)


class Int8Conv(nn.Module):
    """W8A8 NHWC conv with nn.Conv's exact param tree (kernel HWIO f32 +
    bias), so any checkpoint loads into either view. Compute path:
    ops/quant.int8_conv (int8 MXU conv, int32 accum, per-image x
    per-out-channel dequant epilogue). Used by the SD-UNet's convs-only
    int8 sampling view (models/unet.py `_conv`) and the SD-VAE's int8
    decode view (codecs/vae.py)."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import int8_conv

        k = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return int8_conv(x, k, b, self.strides, self.padding,
                         out_dtype=self.dtype)


def _qmodes(quant) -> tuple:
    """Normalize the ``quant`` view flag: ``True``/"w8a8" = int8 W8A8
    (weights AND activations); "w8" = int8 weights, bf16 activations —
    a quantized view with zero activation-rounding noise in the field;
    "w8a8_mlp" = int8 W8A8 on the MLP kernels ONLY (66% of U-ViT FLOPs,
    2 of the ~5 quantization points per block), bf16 attention/proj/
    skip. Measured (TPU, experiments/adaptive_view_sweep.py): even this
    reduced activation noise inflates dopri5 NFE 110 -> 194 at
    rtol=atol=1e-5 — per-stage re-rounding has a fixed noise floor the
    embedded error estimate picks up. The view is kept as the measured
    ablation point; the adaptive-solver answer is the base-anchored
    stage-delta field (core/delta_field.py), whose rounding amplitude
    scales with the step size h.
    Returns ``(w8a8, w8, a8mlp)`` booleans."""
    return ((quant is True or quant == "w8a8"), quant == "w8",
            quant == "w8a8_mlp")


def _dense(quant, features: int, *, use_bias: bool = True,
           dtype=jnp.float32, name: str):
    """nn.Dense or its quantized twin, same param tree either way.
    Only the W8A8 view quantizes these [C, C]-sized projections — in the
    w8 view their bf16 copies are small and XLA schedules them well."""
    w8a8, _, _ = _qmodes(quant)
    cls = Int8Dense if w8a8 else nn.Dense
    return cls(features, use_bias=use_bias, dtype=dtype,
               kernel_init=dense_init, name=name)


class Mlp(nn.Module):
    """Transformer MLP (reference `libs/timm.py:96-112`)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dtype: Any = jnp.float32
    quant: Any = False  # False | True ("w8a8") | "w8"

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        if self.quant:
            # fully fused quantized MLP kernel: fc1+GELU+fc2 with the
            # hidden tensor resident in VMEM (ops/mlp.py). Params live at
            # the same tree paths nn.Dense would create.
            from ..ops.mlp import fused_mlp

            w8a8, w8, a8mlp = _qmodes(self.quant)
            w1, b1 = _DenseKernel(self.hidden_dim, use_bias=True,
                                  name="fc1")(x.shape[-1])
            w2, b2 = _DenseKernel(out_dim, use_bias=True,
                                  name="fc2")(self.hidden_dim)
            return fused_mlp(x.astype(self.dtype), w1, b1, w2, b2,
                             quant="w8" if w8 else True)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=dense_init, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dense(out_dim, dtype=self.dtype, kernel_init=dense_init,
                     name="fc2")(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with fused QKV and optional p2p edit
    (reference `libs/uvit.py:66-118`, `libs/uvit_t2i.py:67-128`)."""

    num_heads: int
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    quant: Any = False  # False | True ("w8a8") | "w8"

    @nn.compact
    def __call__(
        self,
        x: Array,
        t: Optional[Array] = None,
        attn_edit: Optional[AttnEdit] = None,
        block_id: int = 0,
        capture_probs: bool = False,
    ):
        b, l, c = x.shape
        w8a8, _, _ = _qmodes(self.quant)
        h = self.num_heads
        d = c // h
        scale = self.qk_scale or d**-0.5

        use_fused = self.attn_impl in ("pallas_packed", "pallas_qkvproj",
                                       "pallas_lnmlp") \
            or (self.attn_impl == "auto" and _packed_ok())
        if use_fused and attn_edit is None and not capture_probs:
            from ..ops.attention import (
                fused_qkv_attention,
                fused_qkvproj_attention,
            )

            if not self.qkv_bias and self.attn_impl != "pallas_packed":
                # fully fused: QKV projection happens inside the kernel;
                # the [B, L, 3C] intermediate never touches HBM — the
                # fastest *sampling* path (15.4 img/s). The kernel param
                # is created at the same tree path as nn.Dense(name="qkv")
                # would, so checkpoints interop. With quant=True the
                # projection runs int8 on the MXU (2x rate), softmax and
                # accumulation stay f32.
                # pass the f32 kernel: the quant branch fits int8 scales
                # on full-precision weights (matching Int8Dense — casting
                # to bf16 first discards mantissa ahead of scale fitting);
                # the bf16 branch casts inside the kernel call
                kernel = _DenseKernel(3 * c, name="qkv")(c)
                if not w8a8:
                    kernel = kernel.astype(self.dtype)
                out = fused_qkvproj_attention(
                    x, kernel, h, scale, quant=w8a8)
            else:
                # XLA projection + transpose-free attention kernel — the
                # fastest *training* path (backward does not recompute
                # the projection; 140 vs 124 img/s at batch 64).
                qkv_p = nn.Dense(3 * c, use_bias=self.qkv_bias,
                                 dtype=self.dtype, kernel_init=dense_init,
                                 name="qkv")(x)
                out = fused_qkv_attention(qkv_p, h, scale)
            out = _dense(self.quant, c, dtype=self.dtype, name="proj")(out)
            return out

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=dense_init, name="qkv")(x)
        qkv = qkv.reshape(b, l, 3, h, d).transpose(2, 0, 3, 1, 4)  # 3,B,H,L,D
        q, k, v = qkv[0], qkv[1], qkv[2]

        col_mult = None
        if attn_edit is not None:
            col_mult = attn_edit.effective_mult(
                t if t is not None else jnp.float32(0.0), block_id
            )

        probs = None
        if capture_probs:
            out, probs = multi_head_attention(
                q, k, v, scale=scale, col_mult=col_mult, return_probs=True
            )
        else:
            out = multi_head_attention(
                q, k, v, scale=scale, impl=self.attn_impl, col_mult=col_mult
            )
        out = out.transpose(0, 2, 1, 3).reshape(b, l, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=dense_init,
                       name="proj")(out)
        if capture_probs:
            return out, probs
        return out


class Block(nn.Module):
    """Pre-norm transformer block with optional long-skip fusion
    (reference `libs/uvit.py:121-162`)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    skip: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    quant: Any = False  # False | True ("w8a8") | "w8"

    @nn.compact
    def __call__(
        self,
        x: Array,
        skip: Optional[Array] = None,
        t: Optional[Array] = None,
        attn_edit: Optional[AttnEdit] = None,
        block_id: int = 0,
        capture_probs: bool = False,
    ):
        c = x.shape[-1]
        w8a8, w8, a8mlp = _qmodes(self.quant)
        if self.skip:
            x = _dense(self.quant, c, dtype=self.dtype,
                       name="skip_linear")(
                jnp.concatenate([x, skip], axis=-1)
            )

        # int8 whole-sub-block kernels (LN + projections + residual never
        # leave VMEM). Opt-in like the bf16 variant: measured a wash vs
        # the separate int8 kernels (20.57 vs 20.65 img/s) — kept for
        # shapes where the traffic saving beats the pipelining loss.
        if (w8a8 and self.attn_impl == "pallas_block"
                and attn_edit is None and not capture_probs
                and not self.qkv_bias):
            from ..ops.attention import fused_attention_block_q
            from ..ops.mlp import fused_mlp_block_q

            d = c // self.num_heads
            ln1_s, ln1_b = _LNParams(name="norm1")(c)
            wqkv, wproj, bproj = _AttnParams(name="attn")(c)
            x = fused_attention_block_q(
                x.astype(self.dtype), ln1_s, ln1_b, wqkv, wproj, bproj,
                self.num_heads, scale=self.qk_scale or d**-0.5, eps=LN_EPS)
            ln2_s, ln2_b = _LNParams(name="norm2")(c)
            w1, b1, w2, b2 = _MlpParams(
                int(c * self.mlp_ratio), name="mlp")(c)
            return fused_mlp_block_q(x, ln2_s, ln2_b, w1, b1, w2, b2,
                                     eps=LN_EPS)

        # whole-sub-block fusion: LN1 + qkv + attention + proj + residual
        # in one Pallas program. Opt-in only ("pallas_block"): measured
        # SLOWER than the qkvproj kernel end-to-end (14.25 vs 15.40
        # img/s) — mega-fusion defeats XLA's cross-block pipelining.
        # hybrid sampling path ("pallas_lnmlp", int8 view): LN1 folds
        # into the qkvproj kernel, LN2 into the MLP kernel — neither
        # normalized activation round-trips through HBM, while the
        # attention and MLP programs stay separate so XLA keeps its
        # cross-block pipelining (the whole-sub-block kernels lose it)
        # "pallas_lnmlp" is inference-only (the LN-fused kernels define
        # no VJP): automatic for the int8 view on TPU; explicit opt-in
        # for the bf16 view (the one adaptive solvers use)
        use_lnfused = (
            (self.attn_impl == "pallas_lnmlp"
             or (self.quant and self.attn_impl == "auto" and _packed_ok()))
            and attn_edit is None and not capture_probs and not self.qkv_bias
        )
        probs = None
        if use_lnfused:
            from ..ops.attention import fused_ln_qkvproj_attention
            from ..ops.mlp import fused_mlp_block_q

            ln1_s, ln1_b = _LNParams(name="norm1")(c)
            wqkv, wproj, bproj = _AttnParams(name="attn")(c)
            d = c // self.num_heads
            # f32 kernel into the quant branch (int8 scales fit on full
            # precision, as Int8Dense does); bf16 cast only otherwise
            a = fused_ln_qkvproj_attention(
                x.astype(self.dtype), ln1_s, ln1_b,
                wqkv if w8a8 else wqkv.astype(self.dtype),
                self.num_heads,
                scale=self.qk_scale or d**-0.5, eps=LN_EPS,
                quant=w8a8)
            if w8a8:
                from ..ops.quant import int8_dense

                x = x + int8_dense(a, wproj, bproj, out_dtype=x.dtype)
                ln2_s, ln2_b = _LNParams(name="norm2")(c)
                w1, b1, w2, b2 = _MlpParams(
                    int(c * self.mlp_ratio), name="mlp")(c)
                return fused_mlp_block_q(x, ln2_s, ln2_b, w1, b1, w2, b2,
                                         eps=LN_EPS)
            x = x + (a @ wproj.astype(self.dtype)
                     + bproj.astype(self.dtype)).astype(x.dtype)
            if w8 or a8mlp:
                # w8 view: bf16 attention/proj as above, plus the
                # weight-only-int8 fused MLP sub-block — the bf16 twin of
                # that kernel cannot run at the bench shape (16.8 MB of
                # bf16 weights, over the VMEM budget), which is exactly
                # why the plain bf16 view falls back to the unfused XLA
                # MLP below. Activations stay bf16: the field is a fixed
                # smooth perturbation, safe under adaptive step control.
                # w8a8_mlp view: same routing but the MLP runs full int8
                # W8A8 (the only quantization points in the field) —
                # measured ablation: dopri5 NFE still 194 (see _qmodes).
                ln2_s, ln2_b = _LNParams(name="norm2")(c)
                w1, b1, w2, b2 = _MlpParams(
                    int(c * self.mlp_ratio), name="mlp")(c)
                return fused_mlp_block_q(x, ln2_s, ln2_b, w1, b1, w2, b2,
                                         eps=LN_EPS,
                                         quant="w8" if w8 else True)
            # bf16: only LN1 needs folding (it feeds a pallas kernel and
            # cannot fuse); LN2 feeds the XLA MLP. The bf16 LN-fused MLP
            # kernel (fused_mlp_block_q(quant=False)) is runnable at the
            # bench shape since the scoped-VMEM raise (ops/mlp.py), but
            # measured NEUTRAL there (18.65 vs 18.61 img/s, r3): XLA's
            # unfused MLP overlaps the [B,L,4C] hidden traffic with
            # compute about as well as the kernel removes it — so the
            # simpler XLA path stays.
            x = x + Mlp(hidden_dim=int(c * self.mlp_ratio),
                        dtype=self.dtype, quant=False, name="mlp")(
                nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                             name="norm2")(x)
            )
            return x

        use_block_fused = (
            attn_edit is None and not capture_probs and not self.qkv_bias
            and self.attn_impl == "pallas_block"
        )
        if use_block_fused:
            from ..ops.attention import fused_attention_block

            ln_s, ln_b = _LNParams(name="norm1")(c)
            wqkv, wproj, bproj = _AttnParams(name="attn")(c)
            d = c // self.num_heads
            x = fused_attention_block(
                x.astype(self.dtype), ln_s, ln_b, wqkv, wproj, bproj,
                self.num_heads, scale=self.qk_scale or d**-0.5, eps=LN_EPS,
            )
        else:
            attn = Attention(
                num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, dtype=self.dtype,
                attn_impl=self.attn_impl, quant=self.quant, name="attn",
            )
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                             name="norm1")(x)
            if capture_probs:
                a, probs = attn(h, t=t, attn_edit=attn_edit,
                                block_id=block_id, capture_probs=True)
            else:
                a = attn(h, t=t, attn_edit=attn_edit, block_id=block_id)
            x = x + a
        if self.quant and self.attn_impl == "pallas_lnmlp":
            # hybrid: separate qkvproj attention kernel (keeps XLA's
            # cross-block pipelining) + LN-fused quantized MLP sub-block
            # (the LN output and hidden tensor never touch HBM)
            from ..ops.mlp import fused_mlp_block_q

            ln2_s, ln2_b = _LNParams(name="norm2")(c)
            w1, b1, w2, b2 = _MlpParams(
                int(c * self.mlp_ratio), name="mlp")(c)
            x = fused_mlp_block_q(x, ln2_s, ln2_b, w1, b1, w2, b2,
                                  eps=LN_EPS,
                                  quant=True if w8a8 else "w8")
        else:
            x = x + Mlp(hidden_dim=int(c * self.mlp_ratio), dtype=self.dtype,
                        quant=self.quant, name="mlp")(
                nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                             name="norm2")(x)
            )
        if capture_probs:
            return x, probs
        return x


class PatchEmbed(nn.Module):
    """Patchifying conv embed (reference `libs/uvit.py:165-179`)."""

    patch_size: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        p = self.patch_size
        assert h % p == 0 and w % p == 0, (x.shape, p)
        x = nn.Conv(
            self.embed_dim, kernel_size=(p, p), strides=(p, p),
            dtype=self.dtype, name="proj",
        )(x)
        return x.reshape(b, (h // p) * (w // p), self.embed_dim)
