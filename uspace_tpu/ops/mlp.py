"""Fused transformer-MLP Pallas kernels (bf16 and int8 W8A8).

The U-ViT MLP (fc1 -> GELU -> fc2, hidden = 4C) is ~61% of the model's
FLOPs. Unfused, the [B*L, 4C] hidden tensor makes two HBM round trips
(fc1 write + fc2 read; ~120 MB per block at the bench shape), and the
int8 XLA path adds an int32 dequant round trip after each matmul. This
kernel keeps everything on-chip:

- grid over row tiles of the flattened [B*L, C] input;
- both weight matrices DMA'd to VMEM once (int8 halves that traffic and
  doubles MXU rate where the hardware path exists);
- fc1 computed in column slices (bounds the int32/f32 transient),
  dequant + exact GELU fused in-registers, hidden tile re-quantized
  per-row for fc2, fc2 accumulated in f32 over hidden slices;
- only the [rows, C] output tile leaves the core.

Inference-only (the sampling view); training keeps the XLA MLP whose
backward XLA already schedules well. Reference counterpart: the torch
MLP in `/root/reference/libs/timm.py:96-112` (cuDNN-fused on GPU).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

Array = jax.Array

# Tile shape swept end-to-end on the v5e int8 sampler (r3): the MXU dot
# rate rises with the row-tile M (isolated probe: 166 TFLOP/s at M=256 ->
# 206 at M=512 for int8 [M,1024]x[1024,512]), but past ~448 rows the
# kernel loses more to pipelining/VMEM pressure than the dots gain
# (sampler img/s: 256/8: 23.52, 384/8: 23.63, 384/4: 23.77, 448/4:
# 23.85, 512/4: 23.19, 512/8: 22.97). 448/4 needs the scoped-VMEM raise.
_ROW_TILE = 448
_COL_SLICES = 4  # fc1 output computed in hidden/_COL_SLICES column strips
# raise Mosaic's scoped-VMEM ceiling (default 16MB) for the tile sizes
# above; None = compiler default
_VMEM_LIMIT: Optional[int] = 32 * 2**20


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _erf_poly(x):
    """erf via Abramowitz–Stegun 7.1.26 (|err| <= 1.5e-7): Mosaic has no
    erf/erfc lowering, and 1.5e-7 is far below bf16 resolution."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """Exact (erf) GELU, matching the reference's torch GELU
    (`libs/timm.py:96-112`) to ~1e-7."""
    return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865476))


def _gelu_grad_exact(x):
    """d/dx GELU(x) = Phi(x) + x phi(x) (same erf polynomial + one
    gaussian term; |err| ~ 1e-7). Range [-0.1290, 1.1290]."""
    phi = 0.3989422804014327 * jnp.exp(-0.5 * x * x)
    return 0.5 * (1.0 + _erf_poly(x * 0.7071067811865476)) + x * phi


def _mlp_kernel_bf16(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                     w1_v, w2_v, h_v, sem, *, hidden: int, col_slices: int):
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(w1_ref, w1_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(w2_ref, w2_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[:]
    hs = hidden // col_slices
    for j in range(col_slices):
        part = jax.lax.dot_general(
            x, w1_v[:, j * hs:(j + 1) * hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0:1, j * hs:(j + 1) * hs]
        h_v[:, j * hs:(j + 1) * hs] = _gelu_exact(part).astype(h_v.dtype)
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        acc += jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs], w2_v[j * hs:(j + 1) * hs, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    o_ref[:] = (acc + b2_ref[0:1, :]).astype(o_ref.dtype)


def _mlp_kernel_bf16_lnres(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                           w2_ref, b2_ref, o_ref, w1_v, w2_v, h_v, sem,
                           *, hidden: int, eps: float, col_slices: int):
    """Whole MLP sub-block, bf16: ``x + fc2(gelu(fc1(LN(x))))`` — the
    bf16 twin of :func:`_mlp_kernel_int8_lnres` (LN output and hidden
    tensor never touch HBM). Inference-only."""
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(w1_ref, w1_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(w2_ref, w2_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[:]
    c = x.shape[-1]
    # f32 statistics, bf16 normalize (keeps the VMEM stack under the
    # scoped limit — a full f32 copy of the tile pushes it 2MB over)
    mu = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True) / c
    var = (jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                   keepdims=True) / c) - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps).astype(x.dtype)
    xln = ((x - mu.astype(x.dtype)) * inv
           * lns_ref[0:1, :].astype(x.dtype)
           + lnb_ref[0:1, :].astype(x.dtype))
    hs = hidden // col_slices
    for j in range(col_slices):
        part = jax.lax.dot_general(
            xln.astype(x.dtype), w1_v[:, j * hs:(j + 1) * hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0:1, j * hs:(j + 1) * hs]
        h_v[:, j * hs:(j + 1) * hs] = _gelu_exact(part).astype(h_v.dtype)
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        acc += jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs], w2_v[j * hs:(j + 1) * hs, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    o_ref[:] = x + (acc + b2_ref[0:1, :]).astype(o_ref.dtype)


def _mlp_kernel_int8(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                     o_ref, w1_v, w2_v, h_v, sem, *, hidden: int, col_slices: int):
    """int8 variant: weights arrive pre-quantized (int8 + per-column f32
    scales); activations are row-quantized on the VPU; both matmuls run
    int8 x int8 -> int32 on the MXU.

    The hidden tile is quantized PER COLUMN STRIP in the fc1 epilogue:
    the f32 GELU output is still in registers, so the int8 copy is the
    only hidden tensor that ever materializes (vs the earlier per-full-
    row scheme, which stored a bf16 hidden tile and re-read it f32 for a
    second quantization pass). Hidden quantization is ASYMMETRIC
    (per-row-per-strip affine, ``h ~= s*q + zp``): the GELU output is
    one-sided (min >= -0.17 in pre-activation-scale units, max >> 0), so
    a symmetric grid wastes nearly half its range — affine is ~2x finer
    at the same int8 width. The zero-point term folds into the epilogue
    as ``zp_row * colsum(w2q)`` (colsum = per-strip int32 column sums of
    the int8 weights, one cheap VPU reduction per strip)."""
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(w1_ref, w1_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(w2_ref, w2_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[:].astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-8)
    xq = jnp.round(x * (127.0 / amax)).astype(jnp.int8)
    xs = amax * (1.0 / 127.0)  # [rows, 1]
    hs = hidden // col_slices
    # fc1 + GELU + per-strip affine quantization, fused per column strip
    hscales, hzps = [], []
    for j in range(col_slices):
        part = jax.lax.dot_general(
            xq, w1_v[:, j * hs:(j + 1) * hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        deq = (part.astype(jnp.float32) * xs
               * s1_ref[0:1, j * hs:(j + 1) * hs]
               + b1_ref[0:1, j * hs:(j + 1) * hs])
        g = _gelu_exact(deq)
        gmax = jnp.max(g, axis=-1, keepdims=True)
        gmin = jnp.min(g, axis=-1, keepdims=True)
        scale = jnp.maximum(gmax - gmin, 1e-8) * (1.0 / 254.0)
        zp = (gmax + gmin) * 0.5
        h_v[:, j * hs:(j + 1) * hs] = jnp.round(
            (g - zp) / scale).astype(jnp.int8)
        hscales.append(scale)
        hzps.append(zp)
    acc = jnp.zeros((xq.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        w2s = w2_v[j * hs:(j + 1) * hs, :]
        d = jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs], w2s,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        colsum = jnp.sum(w2s.astype(jnp.int32), axis=0, keepdims=True)
        acc += (d.astype(jnp.float32) * hscales[j]
                + hzps[j] * colsum.astype(jnp.float32))
    out = acc * s2_ref[0:1, :] + b2_ref[0:1, :]
    o_ref[:] = out.astype(o_ref.dtype)


def _mlp_kernel_int8_lnres(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                           w2_ref, s2_ref, b2_ref, o_ref, w1_v, w2_v, h_v,
                           sem, *, hidden: int, eps: float, col_slices: int):
    """Whole MLP sub-block, int8: ``x + fc2(gelu(fc1(LN(x))))``. The LN
    output, hidden tensor and fc2 input never touch HBM. Hidden
    quantization is per-column-strip ASYMMETRIC affine in the fc1
    epilogue (see :func:`_mlp_kernel_int8` — the one-sided GELU output
    gets a ~2x finer grid; zero-point folds into the epilogue via
    per-strip colsums of the int8 weights)."""
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(w1_ref, w1_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(w2_ref, w2_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[:]
    c = x.shape[-1]
    mu = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True) / c
    var = (jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                   keepdims=True) / c) - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps).astype(x.dtype)
    xln = ((x - mu.astype(x.dtype)) * inv * lns_ref[0:1, :].astype(x.dtype)
           + lnb_ref[0:1, :].astype(x.dtype)).astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xln), axis=-1, keepdims=True), 1e-8)
    xq = jnp.round(xln * (127.0 / amax)).astype(jnp.int8)
    xs = amax * (1.0 / 127.0)
    hs = hidden // col_slices
    hscales, hzps = [], []
    for j in range(col_slices):
        part = jax.lax.dot_general(
            xq, w1_v[:, j * hs:(j + 1) * hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        deq = (part.astype(jnp.float32) * xs
               * s1_ref[0:1, j * hs:(j + 1) * hs]
               + b1_ref[0:1, j * hs:(j + 1) * hs])
        g = _gelu_exact(deq)
        gmax = jnp.max(g, axis=-1, keepdims=True)
        gmin = jnp.min(g, axis=-1, keepdims=True)
        scale = jnp.maximum(gmax - gmin, 1e-8) * (1.0 / 254.0)
        zp = (gmax + gmin) * 0.5
        h_v[:, j * hs:(j + 1) * hs] = jnp.round(
            (g - zp) / scale).astype(jnp.int8)
        hscales.append(scale)
        hzps.append(zp)
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        w2s = w2_v[j * hs:(j + 1) * hs, :]
        d = jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs], w2s,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        colsum = jnp.sum(w2s.astype(jnp.int32), axis=0, keepdims=True)
        acc += (d.astype(jnp.float32) * hscales[j]
                + hzps[j] * colsum.astype(jnp.float32))
    out = acc * s2_ref[0:1, :] + b2_ref[0:1, :]
    o_ref[:] = x + out.astype(o_ref.dtype)


def _mlp_kernel_w8_lnres(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                         w2_ref, s2_ref, b2_ref, o_ref, w1_v, w2_v, h_v,
                         sem, *, hidden: int, eps: float, col_slices: int):
    """Weight-only int8 ("w8") whole MLP sub-block:
    ``x + fc2(gelu(fc1(LN(x))))`` with int8 weights and bf16 activations
    /matmuls. Same argument layout as :func:`_mlp_kernel_int8_lnres`.

    Purpose: the bf16 twin of this kernel cannot run at the bench shape
    (2 x [C, 4C] bf16 weights = 16.8 MB, over the ~16 MB VMEM budget),
    which forces the bf16 sampling view onto the *unfused* XLA MLP — one
    [rows, 4C] hidden round trip plus a [rows, C] LN round trip through
    HBM per block. int8 weights (8.4 MB) fit resident; each column strip
    is cast int8 -> bf16 right before its dot (the VPU cast overlaps MXU
    work), the per-column scale folds into the f32 epilogue. Activations
    are NEVER quantized, so the resulting field is a fixed, smooth
    perturbation of the bf16 network — safe under adaptive step control,
    where W8A8's activation-rounding noise inflates the embedded error
    estimate and blows up NFE (docs/scaling.md)."""
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(w1_ref, w1_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(w2_ref, w2_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[:]
    c = x.shape[-1]
    mu = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True) / c
    var = (jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                   keepdims=True) / c) - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps).astype(x.dtype)
    xln = ((x - mu.astype(x.dtype)) * inv
           * lns_ref[0:1, :].astype(x.dtype)
           + lnb_ref[0:1, :].astype(x.dtype))
    hs = hidden // col_slices
    for j in range(col_slices):
        part = jax.lax.dot_general(
            xln, w1_v[:, j * hs:(j + 1) * hs].astype(x.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) * s1_ref[0:1, j * hs:(j + 1) * hs] \
            + b1_ref[0:1, j * hs:(j + 1) * hs]
        h_v[:, j * hs:(j + 1) * hs] = _gelu_exact(part).astype(h_v.dtype)
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        acc += jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs],
            w2_v[j * hs:(j + 1) * hs, :].astype(x.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    out = acc * s2_ref[0:1, :] + b2_ref[0:1, :]
    o_ref[:] = x + out.astype(o_ref.dtype)


def fused_mlp_block_q(
    x: Array, ln_scale: Array, ln_bias: Array,
    w1: Array, b1: Array, w2: Array, b2: Array,
    eps: float = 1e-5, interpret: Optional[bool] = None,
    quant=True,
) -> Array:
    """``x + fc2(gelu(fc1(LN(x))))`` — the complete pre-norm MLP
    sub-block (inference-only). ``quant=True``: int8 W8A8 projections;
    ``quant="w8"``: int8 weights, bf16 activations (the adaptive-solver-
    safe quantized view); ``quant=False``: bf16 projections."""
    from .quant import quantize_colwise

    if interpret is None:
        interpret = not _on_tpu()
    lead = x.shape[:-1]
    c = x.shape[-1]
    hidden = w1.shape[-1]
    x2d = x.reshape(-1, c)
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    if quant:
        w1q, s1 = quantize_colwise(w1)
        w2q, s2 = quantize_colwise(w2)
        kernel = (_mlp_kernel_w8_lnres if quant == "w8"
                  else _mlp_kernel_int8_lnres)
        out = _call_mlp(
            x2d,
            (row(ln_scale), row(ln_bias), w1q, row(s1), row(b1),
             w2q, row(s2), row(b2)),
            functools.partial(kernel, eps=eps),
            hidden, c, interpret, weights_hbm_idx={2, 5},
            h_dtype=None if quant == "w8" else jnp.int8,
        )
    else:
        out = _call_mlp(
            x2d,
            (row(ln_scale), row(ln_bias), w1.astype(x.dtype), row(b1),
             w2.astype(x.dtype), row(b2)),
            functools.partial(_mlp_kernel_bf16_lnres, eps=eps),
            hidden, c, interpret, weights_hbm_idx={2, 4},
        )
    return out.reshape(*lead, c)


def _call_mlp(x2d, args, kernel, hidden, out_dim, interpret,
              weights_hbm_idx, h_dtype=None):
    rows, c = x2d.shape
    # largest strip count <= _COL_SLICES that divides the hidden dim —
    # a non-dividing count would silently drop hidden units
    col_slices = _COL_SLICES
    while hidden % col_slices:
        col_slices -= 1
    vmem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None
    anyspace = pl.ANY if (_HAS_PLTPU and not interpret) else None
    in_specs = [pl.BlockSpec((_ROW_TILE, c), lambda i: (i, 0),
                             memory_space=vmem)]
    for idx in range(len(args)):
        in_specs.append(pl.BlockSpec(
            memory_space=anyspace if idx in weights_hbm_idx else vmem))
    wdtype = args[min(weights_hbm_idx)].dtype

    def inner(x2d, *args):
        # local rows under shard_map (rows are independent, so any
        # contiguous batch-axis split is valid); pad per shard
        r = x2d.shape[0]
        rp = _round_up(r, _ROW_TILE)
        xp = x2d if rp == r else jnp.pad(x2d, ((0, rp - r), (0, 0)))
        out = pl.pallas_call(
            functools.partial(kernel, hidden=hidden,
                              col_slices=col_slices),
            grid=(rp // _ROW_TILE,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((_ROW_TILE, out_dim), lambda i: (i, 0),
                                   memory_space=vmem),
            out_shape=jax.ShapeDtypeStruct((rp, out_dim), x2d.dtype),
            scratch_shapes=[
                pltpu.VMEM((c, hidden), wdtype),
                pltpu.VMEM((hidden, out_dim), wdtype),
                # int8 kernels store the hidden tile quantized (per-strip
                # scales); bf16/w8 kernels keep it in the activation dtype
                pltpu.VMEM((_ROW_TILE, hidden), h_dtype or x2d.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=(
                pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
                if (_VMEM_LIMIT and _HAS_PLTPU and not interpret) else None),
            interpret=interpret,
        )(xp, *args)
        return out[:r]

    from ..parallel.mesh import shard_batch_call

    return shard_batch_call(inner, (True,) + (False,) * len(args),
                            x2d, *args)


def _mlp_kernel_w8(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                   o_ref, w1_v, w2_v, h_v, sem, *, hidden: int, col_slices: int):
    """Weight-only int8 variant of :func:`_mlp_kernel_int8`: int8 weight
    DMA (and residency — bf16 copies would not fit VMEM at the bench
    shape), bf16 activations and matmuls, per-column scales folded into
    the f32 epilogues. See :func:`_mlp_kernel_w8_lnres`."""
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(w1_ref, w1_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(w2_ref, w2_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[:]
    hs = hidden // col_slices
    for j in range(col_slices):
        part = jax.lax.dot_general(
            x, w1_v[:, j * hs:(j + 1) * hs].astype(x.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) * s1_ref[0:1, j * hs:(j + 1) * hs] \
            + b1_ref[0:1, j * hs:(j + 1) * hs]
        h_v[:, j * hs:(j + 1) * hs] = _gelu_exact(part).astype(h_v.dtype)
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        acc += jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs],
            w2_v[j * hs:(j + 1) * hs, :].astype(x.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    o_ref[:] = (acc * s2_ref[0:1, :] + b2_ref[0:1, :]).astype(o_ref.dtype)


def fused_mlp(
    x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
    quant=False, interpret: Optional[bool] = None,
) -> Array:
    """``gelu(x @ w1 + b1) @ w2 + b2`` with the hidden tensor resident in
    VMEM. ``x``: [..., C]; w1: [C, H]; w2: [H, C']. ``quant=True``: both
    matmuls run int8 W8A8 (weight quantization is loop-invariant and
    hoisted out of the sampling scan); ``quant="w8"``: int8 weights only,
    bf16 matmuls. Inference-only."""
    if interpret is None:
        interpret = not _on_tpu()
    lead = x.shape[:-1]
    c = x.shape[-1]
    hidden = w1.shape[-1]
    out_dim = w2.shape[-1]
    x2d = x.reshape(-1, c)
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    if quant:
        from .quant import quantize_colwise

        w1q, s1 = quantize_colwise(w1)
        w2q, s2 = quantize_colwise(w2)
        out = _call_mlp(
            x2d, (w1q, row(s1), row(b1), w2q, row(s2), row(b2)),
            _mlp_kernel_w8 if quant == "w8" else _mlp_kernel_int8,
            hidden, out_dim, interpret,
            weights_hbm_idx={0, 3},
            h_dtype=None if quant == "w8" else jnp.int8,
        )
    elif (c * hidden + hidden * out_dim) * 2 > 12 * 2**20 and not interpret:
        # bf16 weights would overflow the ~16MB VMEM budget resident;
        # XLA schedules the unfused bf16 MLP well (~88% MFU end to end)
        cast = x.dtype
        h = _gelu_exact(
            jax.lax.dot_general(x2d, w1.astype(cast), (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + b1.astype(jnp.float32)).astype(cast)
        out = (jax.lax.dot_general(h, w2.astype(cast), (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               + b2.astype(jnp.float32)).astype(x.dtype)
    else:
        cast = x.dtype
        out = _call_mlp(
            x2d, (w1.astype(cast), row(b1), w2.astype(cast), row(b2)),
            _mlp_kernel_bf16, hidden, out_dim, interpret,
            weights_hbm_idx={0, 2},
        )
    return out.reshape(*lead, out_dim)
