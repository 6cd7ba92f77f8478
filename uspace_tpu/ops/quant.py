"""Int8 (W8A8) quantized matmul path for the sampling model view.

TPU v5e specs int8 x int8 -> int32 on the MXU at 2x the bf16 rate
(394 TOPS vs 197 TFLOPS peak). Measured in-kernel on this stack (r3
probe, VMEM-resident chained dots): int8 reaches 166-210 TFLOP/s vs
120-138 for bf16 at the kernels' tile shapes — i.e. ~1.5x realized, not
2x, and rising with the row-tile size. The bf16 sampler was already
near its compute ceiling, so the headroom to the >=2x-A100 north star
is this precision-level change plus traffic: quantize the big
projection matmuls (MLP fc1/fc2, attention qkv/proj, skip_linear —
together ~92% of U-ViT FLOPs) to int8 while keeping softmax, LayerNorm,
GELU, residuals and accumulation in f32/bf16; int8 weights also halve
the HBM/DMA bytes and let a whole MLP's weights sit resident in VMEM.

Scheme (standard W8A8 dynamic quantization):
- weights: symmetric per-output-channel scales, quantized once per jit
  (loop-invariant — XLA hoists the quantize out of the ODE scan);
- activations: symmetric per-token (row) scales computed on the fly;
- dequant folded into the int32->f32 epilogue: y = acc * (row_s x col_s).

This replaces the *precision* story of the reference's fp16 autocast
sampling (`/root/reference/train_lfm.py:111-117`, README fp16 launch) —
the reference has no quantized path; this is TPU-native headroom beyond
parity. Quality is gated by tests/test_quant.py (cosine/latent-MSE vs
bf16) and the bench's quality line.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# int8 symmetric range. 127 (not 128) keeps the grid symmetric.
_QMAX = 127.0


def quantize_rowwise(x: Array) -> Tuple[Array, Array]:
    """Per-row (last-axis) symmetric int8 quantization.

    Returns ``(q int8 [..., K], scale f32 [..., 1])`` with
    ``x ~= q * scale``.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    scale = amax / _QMAX
    q = jnp.clip(jnp.round(xf / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def quantize_colwise(w: Array) -> Tuple[Array, Array]:
    """Per-output-channel (column) symmetric int8 weight quantization.

    ``w`` is ``[K, N]`` (flax Dense kernel layout). Returns
    ``(q int8 [K, N], scale f32 [N])``.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8)
    scale = amax / _QMAX
    q = jnp.clip(jnp.round(wf / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def int8_matmul(
    xq: Array, x_scale: Array, wq: Array, w_scale: Array,
    out_dtype: jnp.dtype = jnp.float32,
) -> Array:
    """``(xq * x_scale) @ (wq * w_scale)`` via one int8 MXU matmul.

    xq: int8 [..., K]; x_scale: f32 [..., 1]; wq: int8 [K, N];
    w_scale: f32 [N].
    """
    acc = jax.lax.dot_general(
        xq, wq,
        ((((xq.ndim - 1),), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)


def activation_outlier_report(model, params, *inputs, norm_names=("norm1", "norm2")):
    """Per-channel activation-amax diagnostics at the int8 view's
    quantization points.

    W8A8's known failure mode is per-channel activation outliers that
    *emerge with training*: with row-wise (per-token) scales, one hot
    channel inflates every row's amax and crushes the effective
    precision of all other channels. This probes the LayerNorm outputs
    (after LN folding these are exactly the tensors the kernels
    row-quantize) via flax ``capture_intermediates`` on the standard
    (non-fused) model view — same params as the quantized view.

    Returns ``{layer_path: {"outlier_ratio", "amax", "top_channels"}}``
    where outlier_ratio = max-channel amax / median-channel amax. Ratios
    near 1 mean row scales lose nothing; >> 8 signals the standard
    mitigation (static per-channel / sub-channel scales) is needed.
    """
    def filt(mdl, method):
        return getattr(mdl, "name", "") in norm_names

    _, st = model.apply(params, *inputs, capture_intermediates=filt,
                        mutable=["intermediates"])

    report = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            if "__call__" in tree:
                val = tree["__call__"][0]
                a = jnp.abs(val.reshape(-1, val.shape[-1]).astype(jnp.float32))
                ch_amax = jnp.max(a, axis=0)
                med = jnp.median(ch_amax)
                ratio = float(jnp.max(ch_amax) / jnp.maximum(med, 1e-8))
                top = jnp.argsort(-ch_amax)[:5]
                report[path] = {
                    "outlier_ratio": ratio,
                    "amax": float(jnp.max(ch_amax)),
                    "top_channels": [int(i) for i in top],
                }
            else:
                for k, v in tree.items():
                    walk(v, f"{path}/{k}" if path else k)

    walk(st["intermediates"], "")
    return report


def quantize_convwise(w: Array) -> Tuple[Array, Array]:
    """Per-output-channel symmetric int8 quantization of an HWIO conv
    kernel. Returns ``(q int8 [..., O], scale f32 [O])``."""
    wf = w.astype(jnp.float32)
    amax = jnp.maximum(
        jnp.max(jnp.abs(wf), axis=tuple(range(wf.ndim - 1))), 1e-8)
    scale = amax / _QMAX
    q = jnp.clip(jnp.round(wf / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def int8_conv(
    x: Array,
    w: Array,
    bias: Optional[Array] = None,
    strides: Tuple[int, int] = (1, 1),
    padding="SAME",
    out_dtype: Optional[jnp.dtype] = None,
) -> Array:
    """W8A8 NHWC convolution on the int8 MXU path.

    Probe result (experiments/int8_conv_probe.py, v5e): int8 x int8 ->
    int32 convs run 164/153/211 TFLOP/s at SD-UNet-large stage shapes vs
    124-134 for bf16 — 1.2-1.6x, same headroom the dense int8 path
    exploits. Scales: per-image activation scales (batch entries never
    mix under a conv, so they factor exactly through the accumulation —
    unlike per-pixel scales, which the spatial window would mix) and
    per-output-channel weight scales. Zero padding is exact in the
    quantized domain (0 quantizes to 0). The weight quantize is
    loop-invariant and hoisted out of the ODE scan by XLA.
    """
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True), 1e-8)
    xs = amax / _QMAX
    xq = jnp.clip(jnp.round(xf / xs), -_QMAX, _QMAX).astype(jnp.int8)
    wq, ws = quantize_convwise(w)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * ws
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def int8_dense(
    x: Array, w: Array, bias: Optional[Array] = None,
    out_dtype: Optional[jnp.dtype] = None,
) -> Array:
    """Drop-in quantized replacement for ``x @ w + b``.

    ``w`` is the full-precision kernel; its quantization is
    loop-invariant and hoisted out of the ODE scan by XLA, so inside the
    sampling loop only the int8 copy is read (also halving weight HBM
    traffic vs bf16).
    """
    out_dtype = out_dtype or x.dtype
    xq, xs = quantize_rowwise(x)
    wq, ws = quantize_colwise(w)
    y = int8_matmul(xq, xs, wq, ws, out_dtype=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
