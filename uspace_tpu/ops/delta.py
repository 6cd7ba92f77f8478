"""Fused Pallas kernels for the base-anchored stage-delta int8 field.

Execution engine for :mod:`uspace_tpu.core.delta_field` (see its
docstring for the algorithm and the NFE argument; VERDICT r3 #1). One RK
step evaluates the field once in full ("base", stage 2) emitting a
READ-ONLY per-block cache; every later stage ("delta") reconstructs each
linear projection as ``cached + W @ quantize(input_i - input_base)`` —
an int8 dot whose rounding amplitude is the RK stage gap O(h), not the
activation amplitude — and emits NO cache. Four kernels:

- ``_base_attn_cache_kernel``: int8 W8A8 ``attn(qkv(LN1(x)))`` (the
  proven ``_qkv_attn_kernel_qln`` layout, ops/attention.py:592) that
  additionally row-quantizes the qkv tensor to int8 and runs attention
  on the DEQUANTIZED values ("quantize-then-use"), so the int8 cache is
  bit-consistent with the base's own outputs: a zero delta reproduces
  the base exactly, and the cache rounding is part of the base
  evaluation — shared by every stage, cancelled by the embedded error
  weights (they sum to zero).
- ``_delta_attn_kernel``: ``qkv_i = deq(qkv_q) + Wq @ q8(u_i - u_b)``
  (u = LN1 of each stream, both computed in-kernel from x / x_b), exact
  attention on the reconstructed qkv, then the proj delta FOLDED IN:
  ``xm_i = (x_i - x_b) + xm_b + Wp @ q8(bf16(a_i) - a_b)`` — one kernel
  reads every operand once instead of an XLA glue chain re-reading the
  streams (the chained-delta predecessor lost ~40% of its eval time to
  exactly that glue + per-stage cache writes).
- ``_base_mlp_cache_kernel``: the int8 LN2+MLP+residual kernel
  (ops/mlp.py:_mlp_kernel_int8_lnres layout) emitting the pre-GELU
  hidden as int8 (+ per-strip scales) and the fc2 output ``m`` in bf16;
  GELU runs on the dequantized hidden (quantize-then-use again).
- ``_delta_mlp_kernel``: ``e_i = deq(e_q) + W1 @ q8(u2_i - u2_b)``,
  exact GELU difference, ``m_i = m_b + W2 @ q8(gelu(e_i) -
  gelu(deq(e_q)))``, ``o = xm_i + m_i``.

Biases cancel in every delta (they live in the cached base values), so
the delta dots are pure ``int8 x int8 -> int32`` with a two-scale f32
epilogue. Streams and the ``a`` / ``xm`` / ``m`` caches are bf16; the
wide caches (qkv, hidden) are int8 + scales — their once-per-step
rounding is shared base error, and halving their bytes keeps the delta
evaluation's extra HBM traffic hidden under its MXU time.

Layout mirrors ops/attention.py / ops/mlp.py: attention kernels run one
batch element per program ([Lp, C] rows, Lp = 32-aligned seq; caches
stored padded so delta stages re-read them with no reshape), MLP kernels
tile the flattened [B*L, C] rows; int8 weights are DMA'd to VMEM once at
program 0 and stay resident; multi-chip execution goes through
``shard_batch_call`` (one weight gather per solve, batch stays home).
Reference counterpart: none — the reference samples fp32/fp16 through
torchdiffeq (`/root/reference/flow_matching.py:38-85`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .mlp import _gelu_exact, _gelu_grad_exact

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

Array = jax.Array

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# MLP row tile. The delta kernel streams 4 tiled operands + 1 output
# (vs 1+1 for the plain int8 MLP kernel) so it runs under a wider VMEM
# limit; swept on TPU (experiments/delta_dopri5.py).
_MLP_ROW_TILE = 448
_COL_SLICES = 4
_VMEM_LIMIT: Optional[int] = 64 * 2**20


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln_f32(x, lns_ref, lnb_ref, eps):
    """f32-statistics LayerNorm over the last axis; returns f32."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    mu = jnp.sum(xf, axis=-1, keepdims=True) / c
    var = jnp.sum(jnp.square(xf), axis=-1, keepdims=True) / c \
        - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    return (xf - mu) * inv * lns_ref[0:1, :].astype(jnp.float32) \
        + lnb_ref[0:1, :].astype(jnp.float32)


def _rowquant(xf):
    """Symmetric per-row int8 quantization of an f32 tile."""
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    q = jnp.round(xf * (127.0 / amax)).astype(jnp.int8)
    return q, amax * (1.0 / 127.0)


def _heads_attention(qkv, o_ref, *, scale, seq_len, num_heads, head_dim):
    """Per-head masked softmax attention over a [Lp, 3C] qkv tile,
    written head-by-head into ``o_ref`` ([1, Lp, C])."""
    lp = qkv.shape[0]
    h, d = num_heads, head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    key_mask = col < seq_len
    for i in range(h):
        q = qkv[:, i * d:(i + 1) * d]
        k = qkv[:, (h + i) * d:(h + i + 1) * d]
        v = qkv[:, (2 * h + i) * d:(2 * h + i + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(key_mask, s, _MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l
        o_ref[0, :, i * d:(i + 1) * d] = o.astype(o_ref.dtype)


def _int8_slices(xq, w_v, n_slices):
    """int8 dot against a VMEM-resident weight, in output-column slices
    (bounds the int32/f32 transient); returns the f32 accumulator."""
    n = w_v.shape[-1]
    cs = n // n_slices
    parts = []
    for j in range(n_slices):
        acc = jax.lax.dot_general(
            xq, w_v[:, j * cs:(j + 1) * cs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        parts.append(acc.astype(jnp.float32))
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# attention-half kernels
# ---------------------------------------------------------------------------


def _base_attn_cache_kernel(x_ref, lns_ref, lnb_ref, wq_ref, ws_ref,
                            a_ref, qkvq_ref, qkvs_ref,
                            wq_v, qkv_buf, sem,
                            *, scale, seq_len, num_heads, head_dim, eps):
    """Base attention half: ``a = attn(qkv(LN1(x)))`` in int8 W8A8,
    emitting the qkv cache as int8 + per-row scale. Attention runs on
    the DEQUANTIZED cached values so a zero delta reproduces ``a``
    bit-for-bit."""
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(wq_ref, wq_v, sem)
        cp.start()
        cp.wait()

    x = x_ref[0]
    u = _ln_f32(x, lns_ref, lnb_ref, eps)
    uq, us = _rowquant(u)
    qkv = _int8_slices(uq, wq_v, 3) * us * ws_ref[0:1, :]
    cq, cs = _rowquant(qkv)
    qkvq_ref[0] = cq
    qkvs_ref[0] = cs
    qkv_buf[...] = (cq.astype(jnp.float32) * cs).astype(qkv_buf.dtype)
    _heads_attention(qkv_buf[...], a_ref, scale=scale, seq_len=seq_len,
                     num_heads=num_heads, head_dim=head_dim)


def _delta_attn_kernel(x_ref, xb_ref, qkvq_ref, qkvs_ref, ab_ref, xmb_ref,
                       lns_ref, lnb_ref, wq_ref, ws_ref, wp_ref, sp_ref,
                       xm_ref, wq_v, wp_v, qkv_buf, a_buf, sem,
                       *, scale, seq_len, num_heads, head_dim, eps):
    """Delta attention half with the proj delta folded in:
    ``qkv_i = deq(qkv_q) + Wq @ q8(LN1(x_i) - LN1(x_b))``; exact
    attention; ``xm_i = (x_i - x_b) + xm_b + Wp @ q8(bf16(a_i) - a_b)``.
    Biases cancel. No cache outputs."""
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(wq_ref, wq_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(wp_ref, wp_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[0]
    xb = xb_ref[0]
    d = _ln_f32(x, lns_ref, lnb_ref, eps) \
        - _ln_f32(xb, lns_ref, lnb_ref, eps)
    dq, ds = _rowquant(d)
    dqkv = _int8_slices(dq, wq_v, 3) * ds * ws_ref[0:1, :]
    deq_b = qkvq_ref[0].astype(jnp.float32) \
        * qkvs_ref[0].astype(jnp.float32)
    qkv_buf[...] = (deq_b + dqkv).astype(qkv_buf.dtype)
    _heads_attention(qkv_buf[...], a_buf, scale=scale, seq_len=seq_len,
                     num_heads=num_heads, head_dim=head_dim)
    # bf16 cast before the subtraction: the cached a_b is the base's
    # bf16 output, so a zero delta gives exactly da = 0
    da = a_buf[0].astype(jnp.float32) - ab_ref[0].astype(jnp.float32)
    daq, das = _rowquant(da)
    dp = _int8_slices(daq, wp_v, 1) * das * sp_ref[0:1, :]
    xm = (x.astype(jnp.float32) - xb.astype(jnp.float32)
          + xmb_ref[0].astype(jnp.float32) + dp)
    xm_ref[0] = xm.astype(xm_ref.dtype)


def _attn_specs(lp, vmem):
    def spec3(last):
        return pl.BlockSpec((1, lp, last), lambda i: (i, 0, 0),
                            memory_space=vmem)
    return spec3


def base_attn_block(x: Array, ln_scale: Array, ln_bias: Array,
                    wq: Array, ws: Array, num_heads: int, eps: float,
                    interpret: Optional[bool] = None,
                    ) -> Tuple[Array, Array, Array]:
    """Returns ``(a, qkv_q, qkv_s)`` — the attention output [B, L, C]
    (unpadded) plus the PADDED int8 qkv cache ([B, Lp, 3C] int8,
    [B, Lp, 1] f32). Weights arrive pre-quantized (int8 + col scales)."""
    if interpret is None:
        interpret = not _on_tpu()
    b, l, c = x.shape
    d = c // num_heads
    scale = float(d) ** -0.5
    lp = _round_up(l, 32)
    xp = x if lp == l else jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    vmem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None
    anyspace = pltpu.ANY if (_HAS_PLTPU and not interpret) else None
    row = lambda t: t.reshape(1, -1).astype(jnp.float32)

    def inner(xp, lns, lnb, wq, ws):
        bl = xp.shape[0]
        spec3 = _attn_specs(lp, vmem)
        params = None
        if _HAS_PLTPU and not interpret:
            params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
        return pl.pallas_call(
            functools.partial(_base_attn_cache_kernel, scale=scale,
                              seq_len=l, num_heads=num_heads, head_dim=d,
                              eps=eps),
            grid=(bl,),
            in_specs=[
                spec3(c),
                pl.BlockSpec(memory_space=vmem),      # ln scale [1, C]
                pl.BlockSpec(memory_space=vmem),      # ln bias [1, C]
                pl.BlockSpec(memory_space=anyspace),  # wq int8 (HBM)
                pl.BlockSpec(memory_space=vmem),      # ws [1, 3C]
            ],
            out_specs=(spec3(c), spec3(3 * c), spec3(1)),
            out_shape=(jax.ShapeDtypeStruct((bl, lp, c), x.dtype),
                       jax.ShapeDtypeStruct((bl, lp, 3 * c), jnp.int8),
                       jax.ShapeDtypeStruct((bl, lp, 1), jnp.float32)),
            scratch_shapes=[
                pltpu.VMEM((c, 3 * c), jnp.int8),
                pltpu.VMEM((lp, 3 * c), x.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=params,
            interpret=interpret,
        )(xp, lns, lnb, wq, ws)

    from ..parallel.mesh import shard_batch_call

    a, qkv_q, qkv_s = shard_batch_call(
        inner, (True, False, False, False, False),
        xp, row(ln_scale), row(ln_bias), wq, row(ws))
    return a[:, :l], qkv_q, qkv_s


def delta_attn_block(x: Array, xb: Array, qkv_q: Array, qkv_s: Array,
                     a_b: Array, xm_b: Array,
                     ln_scale: Array, ln_bias: Array,
                     wq: Array, ws: Array, wp: Array, sp: Array,
                     num_heads: int, eps: float,
                     interpret: Optional[bool] = None) -> Array:
    """Returns ``xm_i`` [B, L, C] — the whole attention half (qkv delta,
    exact attention, proj delta, residual) anchored at the base cache.
    ``a_b`` is the PADDED bf16 base attention output; ``qkv_q/qkv_s``
    the padded int8 cache from :func:`base_attn_block`."""
    if interpret is None:
        interpret = not _on_tpu()
    b, l, c = x.shape
    d = c // num_heads
    scale = float(d) ** -0.5
    lp = _round_up(l, 32)

    def padl(t):
        return t if t.shape[1] == lp else jnp.pad(
            t, ((0, 0), (0, lp - t.shape[1]), (0, 0)))

    xp, xbp, xmbp = padl(x), padl(xb), padl(xm_b)
    vmem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None
    anyspace = pltpu.ANY if (_HAS_PLTPU and not interpret) else None
    row = lambda t: t.reshape(1, -1).astype(jnp.float32)

    def inner(xp, xbp, qkv_q, qkv_s, a_b, xmbp, lns, lnb, wq, ws, wp, sp):
        bl = xp.shape[0]
        spec3 = _attn_specs(lp, vmem)
        params = None
        if _HAS_PLTPU and not interpret:
            params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
        return pl.pallas_call(
            functools.partial(_delta_attn_kernel, scale=scale,
                              seq_len=l, num_heads=num_heads, head_dim=d,
                              eps=eps),
            grid=(bl,),
            in_specs=[
                spec3(c), spec3(c), spec3(3 * c), spec3(1), spec3(c),
                spec3(c),
                pl.BlockSpec(memory_space=vmem),      # ln scale
                pl.BlockSpec(memory_space=vmem),      # ln bias
                pl.BlockSpec(memory_space=anyspace),  # wq int8
                pl.BlockSpec(memory_space=vmem),      # ws
                pl.BlockSpec(memory_space=anyspace),  # wp int8
                pl.BlockSpec(memory_space=vmem),      # sp
            ],
            out_specs=spec3(c),
            out_shape=jax.ShapeDtypeStruct((bl, lp, c), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((c, 3 * c), jnp.int8),
                pltpu.VMEM((c, c), jnp.int8),
                pltpu.VMEM((lp, 3 * c), x.dtype),
                pltpu.VMEM((1, lp, c), x.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=params,
            interpret=interpret,
        )(xp, xbp, qkv_q, qkv_s, a_b, xmbp, lns, lnb, wq, ws, wp, sp)

    from ..parallel.mesh import shard_batch_call

    xm = shard_batch_call(
        inner,
        (True, True, True, True, True, True) + (False,) * 6,
        xp, xbp, qkv_q, qkv_s, a_b, xmbp,
        row(ln_scale), row(ln_bias), wq, row(ws), wp, row(sp))
    return xm[:, :l]


# ---------------------------------------------------------------------------
# MLP-half kernels
# ---------------------------------------------------------------------------


def _base_mlp_cache_kernel(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                           w2_ref, s2_ref, b2_ref,
                           o_ref, eq_ref, es_ref, m_ref,
                           w1_v, w2_v, h_v, sem,
                           *, hidden: int, eps: float, col_slices: int,
                           gq_ref=None, gs_ref=None, gz_ref=None):
    """Base MLP half: int8 W8A8 ``o = x + fc2(gelu(fc1(LN2(x))))``
    emitting the pre-GELU hidden as int8 (+ per-strip per-row scales)
    and the fc2 output ``m`` in bf16. GELU consumes the DEQUANTIZED
    hidden so a zero delta reproduces ``m`` exactly. The fc2 input is
    quantized per-strip asymmetric-affine (one-sided GELU output, see
    ops/mlp.py:_mlp_kernel_int8).

    With ``gq/gs/gz`` refs bound (the ``emit_gelu`` variant), the
    affine-quantized post-GELU hidden the kernel already feeds fc2 is
    ALSO written out (int8 + per-strip scale/zero-point), so delta
    stages can anchor the GELU difference at ``deq(g_q)`` instead of
    recomputing ``gelu(deq(e_q))`` — dropping the delta kernel's
    second GELU pass (the measured VPU gap vs the base kernel, see
    experiments/delta_mlp_sweep.py)."""
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(w1_ref, w1_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(w2_ref, w2_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[:]
    xln = _ln_f32(x, lns_ref, lnb_ref, eps)
    xq, xs = _rowquant(xln)
    hs = hidden // col_slices
    hscales, hzps = [], []
    for j in range(col_slices):
        part = jax.lax.dot_general(
            xq, w1_v[:, j * hs:(j + 1) * hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        e = (part.astype(jnp.float32) * xs
             * s1_ref[0:1, j * hs:(j + 1) * hs]
             + b1_ref[0:1, j * hs:(j + 1) * hs])
        eamax = jnp.maximum(jnp.max(jnp.abs(e), axis=-1, keepdims=True),
                            1e-8)
        eq = jnp.round(e * (127.0 / eamax)).astype(jnp.int8)
        eq_ref[:, j * hs:(j + 1) * hs] = eq
        es = eamax * (1.0 / 127.0)
        es_ref[:, j:j + 1] = es
        g = _gelu_exact(eq.astype(jnp.float32) * es)
        gmax = jnp.max(g, axis=-1, keepdims=True)
        gmin = jnp.min(g, axis=-1, keepdims=True)
        sc = jnp.maximum(gmax - gmin, 1e-8) * (1.0 / 254.0)
        zp = (gmax + gmin) * 0.5
        gq = jnp.round((g - zp) / sc).astype(jnp.int8)
        h_v[:, j * hs:(j + 1) * hs] = gq
        if gq_ref is not None:
            gq_ref[:, j * hs:(j + 1) * hs] = gq
            gs_ref[:, j:j + 1] = sc
            gz_ref[:, j:j + 1] = zp
        hscales.append(sc)
        hzps.append(zp)
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        w2s = w2_v[j * hs:(j + 1) * hs, :]
        dd = jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs], w2s,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        colsum = jnp.sum(w2s.astype(jnp.int32), axis=0, keepdims=True)
        acc += (dd.astype(jnp.float32) * hscales[j]
                + hzps[j] * colsum.astype(jnp.float32))
    m = acc * s2_ref[0:1, :] + b2_ref[0:1, :]
    mq = m.astype(m_ref.dtype)
    m_ref[:] = mq
    o_ref[:] = x + mq.astype(o_ref.dtype)


def _base_mlp_cache_kernel_g(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref,
                             b1_ref, w2_ref, s2_ref, b2_ref,
                             o_ref, eq_ref, es_ref, m_ref,
                             gq_ref, gs_ref, gz_ref,
                             w1_v, w2_v, h_v, sem,
                             *, hidden: int, eps: float, col_slices: int):
    """``emit_gelu`` entry point: positional-ref binding for the three
    extra post-GELU cache outputs (pallas passes refs positionally in
    in/out/scratch order)."""
    return _base_mlp_cache_kernel(
        x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
        b2_ref, o_ref, eq_ref, es_ref, m_ref, w1_v, w2_v, h_v, sem,
        hidden=hidden, eps=eps, col_slices=col_slices,
        gq_ref=gq_ref, gs_ref=gs_ref, gz_ref=gz_ref)


def _base_mlp_cache_kernel_gr(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref,
                              b1_ref, w2_ref, s2_ref, b2_ref,
                              o_ref, gpq_ref, gps_ref, m_ref,
                              w1_v, w2_v, h_v, sem,
                              *, hidden: int, eps: float, col_slices: int):
    """Linearized-hidden ("grad") base MLP half: instead of the
    pre-GELU hidden, emit ``gelu'(e)`` (int8, per-row-per-strip
    symmetric scales) — the anchor for the NO-GELU delta kernel
    ``dg = de * gelu'(e_b)``. The base itself consumes the EXACT f32
    hidden (no e-quantization pass needed: the delta never re-evaluates
    the GELU, and a zero stage delta gives dg = 0 bit-exactly by
    construction). fc2 consumes the affine-quantized GELU output as in
    the other base variants."""
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(w1_ref, w1_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(w2_ref, w2_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[:]
    xln = _ln_f32(x, lns_ref, lnb_ref, eps)
    xq, xs = _rowquant(xln)
    hs = hidden // col_slices
    hscales, hzps = [], []
    for j in range(col_slices):
        part = jax.lax.dot_general(
            xq, w1_v[:, j * hs:(j + 1) * hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        e = (part.astype(jnp.float32) * xs
             * s1_ref[0:1, j * hs:(j + 1) * hs]
             + b1_ref[0:1, j * hs:(j + 1) * hs])
        gp = _gelu_grad_exact(e)
        gpq, gps = _rowquant(gp)
        gpq_ref[:, j * hs:(j + 1) * hs] = gpq
        gps_ref[:, j:j + 1] = gps
        g = _gelu_exact(e)
        gmax = jnp.max(g, axis=-1, keepdims=True)
        gmin = jnp.min(g, axis=-1, keepdims=True)
        sc = jnp.maximum(gmax - gmin, 1e-8) * (1.0 / 254.0)
        zp = (gmax + gmin) * 0.5
        h_v[:, j * hs:(j + 1) * hs] = jnp.round(
            (g - zp) / sc).astype(jnp.int8)
        hscales.append(sc)
        hzps.append(zp)
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        w2s = w2_v[j * hs:(j + 1) * hs, :]
        dd = jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs], w2s,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        colsum = jnp.sum(w2s.astype(jnp.int32), axis=0, keepdims=True)
        acc += (dd.astype(jnp.float32) * hscales[j]
                + hzps[j] * colsum.astype(jnp.float32))
    m = acc * s2_ref[0:1, :] + b2_ref[0:1, :]
    mq = m.astype(m_ref.dtype)
    m_ref[:] = mq
    o_ref[:] = x + mq.astype(o_ref.dtype)


def _delta_mlp_kernel_lin(x_ref, xb_ref, gpq_ref, gps_ref, mb_ref,
                          lns_ref, lnb_ref, w1_ref, s1_ref, w2_ref,
                          s2_ref, o_ref, w1_v, w2_v, h_v, sem,
                          *, hidden: int, eps: float, col_slices: int):
    """Linearized delta MLP half — NO GELU evaluation at all:
    ``dg = de * gelu'(e_b)`` (cached int8 slope), ``m_i = m_b +
    W2 @ q8(dg)``, ``o = x_i + m_i``. Streams match the two-GELU
    kernel's count (gp_q replaces e_q; no second hidden operand) while
    the transcendental VPU work (2x erf-poly + exp + divide per
    element) drops to one multiply. Numerics: the omitted remainder is
    ``de^2/2 * gelu''`` — O(h^2), SMOOTH in (t, x, h) (no quantization
    floor), and a zero stage delta is bit-exact (dg = 0 exactly). The
    O(h^2) defect is below the solver tolerance at the working step
    sizes; NFE parity is pinned by tests/test_delta_field.py and
    re-measured in-protocol by bench.py."""
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(w1_ref, w1_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(w2_ref, w2_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[:]
    xb = xb_ref[:]
    d = _ln_f32(x, lns_ref, lnb_ref, eps) \
        - _ln_f32(xb, lns_ref, lnb_ref, eps)
    dq, ds = _rowquant(d)
    hs = hidden // col_slices
    hscales = []
    for j in range(col_slices):
        part = jax.lax.dot_general(
            dq, w1_v[:, j * hs:(j + 1) * hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        de = part.astype(jnp.float32) * ds \
            * s1_ref[0:1, j * hs:(j + 1) * hs]
        gp = gpq_ref[:, j * hs:(j + 1) * hs].astype(jnp.float32) \
            * gps_ref[:, j:j + 1].astype(jnp.float32)
        dg = de * gp
        amax = jnp.maximum(jnp.max(jnp.abs(dg), axis=-1, keepdims=True),
                           1e-8)
        h_v[:, j * hs:(j + 1) * hs] = jnp.round(
            dg * (127.0 / amax)).astype(jnp.int8)
        hscales.append(amax * (1.0 / 127.0))
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        dd = jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs], w2_v[j * hs:(j + 1) * hs, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        acc += dd.astype(jnp.float32) * hscales[j]
    m = mb_ref[:].astype(jnp.float32) + acc * s2_ref[0:1, :]
    o_ref[:] = x + m.astype(o_ref.dtype)


def _delta_mlp_kernel_g(x_ref, xb_ref, eq_ref, es_ref, gq_ref, gs_ref,
                        gz_ref, mb_ref,
                        lns_ref, lnb_ref, w1_ref, s1_ref, w2_ref, s2_ref,
                        o_ref, w1_v, w2_v, h_v, sem,
                        *, hidden: int, eps: float, col_slices: int):
    """GELU-cache delta MLP half: one GELU pass instead of two.

    ``dg = gelu(deq(e_q) + de) - deq_affine(g_q)`` — anchored at the
    post-GELU hidden the base ACTUALLY fed fc2, so the base's hidden
    quantization residual ``r = gelu(e_b) - deq(g_q)`` cancels exactly
    in the reconstruction: ``m_i = m_b + W2 @ q8(dg)`` with ``m_b =
    fc2(deq(g_q))`` gives ``fc2(gelu(e_i))`` with no ``-W2 r`` term
    (the two-GELU variant carries it). Cost: the second GELU (the
    measured VPU gap vs the base kernel) is replaced by a 2-op affine
    dequant + one extra int8 stream. A zero stage delta is no longer
    bit-exact: ``dg -> r``, re-rounded per stage at amplitude
    ``amax(r)/127`` ~ range/64k — two orders below bf16's own
    activation rounding (range/256), so the dopri5 error estimate
    cannot see it (NFE pinned by tests/test_delta_field.py)."""
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(w1_ref, w1_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(w2_ref, w2_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[:]
    xb = xb_ref[:]
    d = _ln_f32(x, lns_ref, lnb_ref, eps) \
        - _ln_f32(xb, lns_ref, lnb_ref, eps)
    dq, ds = _rowquant(d)
    hs = hidden // col_slices
    hscales = []
    for j in range(col_slices):
        part = jax.lax.dot_general(
            dq, w1_v[:, j * hs:(j + 1) * hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        de = part.astype(jnp.float32) * ds \
            * s1_ref[0:1, j * hs:(j + 1) * hs]
        eb = eq_ref[:, j * hs:(j + 1) * hs].astype(jnp.float32) \
            * es_ref[:, j:j + 1].astype(jnp.float32)
        gb = gq_ref[:, j * hs:(j + 1) * hs].astype(jnp.float32) \
            * gs_ref[:, j:j + 1].astype(jnp.float32) \
            + gz_ref[:, j:j + 1].astype(jnp.float32)
        dg = _gelu_exact(eb + de) - gb
        amax = jnp.maximum(jnp.max(jnp.abs(dg), axis=-1, keepdims=True),
                           1e-8)
        h_v[:, j * hs:(j + 1) * hs] = jnp.round(
            dg * (127.0 / amax)).astype(jnp.int8)
        hscales.append(amax * (1.0 / 127.0))
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        dd = jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs], w2_v[j * hs:(j + 1) * hs, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        acc += dd.astype(jnp.float32) * hscales[j]
    m = mb_ref[:].astype(jnp.float32) + acc * s2_ref[0:1, :]
    o_ref[:] = x + m.astype(o_ref.dtype)


def _delta_mlp_kernel(x_ref, xb_ref, eq_ref, es_ref, mb_ref,
                      lns_ref, lnb_ref, w1_ref, s1_ref, w2_ref, s2_ref,
                      o_ref, w1_v, w2_v, h_v, sem,
                      *, hidden: int, eps: float, col_slices: int):
    """Delta MLP half: ``e_i = deq(e_q) + W1 @ q8(u2_i - u2_b)``;
    ``m_i = m_b + W2 @ q8(gelu(e_i) - gelu(deq(e_q)))``;
    ``o = x_i + m_i``. Biases cancel; the hidden delta uses symmetric
    per-row-per-strip scales (two-sided, unlike the base's one-sided
    GELU output). No cache outputs."""
    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(w1_ref, w1_v, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(w2_ref, w2_v, sem)
        cp2.start()
        cp2.wait()

    x = x_ref[:]
    xb = xb_ref[:]
    d = _ln_f32(x, lns_ref, lnb_ref, eps) \
        - _ln_f32(xb, lns_ref, lnb_ref, eps)
    dq, ds = _rowquant(d)
    hs = hidden // col_slices
    hscales = []
    for j in range(col_slices):
        part = jax.lax.dot_general(
            dq, w1_v[:, j * hs:(j + 1) * hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        de = part.astype(jnp.float32) * ds \
            * s1_ref[0:1, j * hs:(j + 1) * hs]
        eb = eq_ref[:, j * hs:(j + 1) * hs].astype(jnp.float32) \
            * es_ref[:, j:j + 1].astype(jnp.float32)
        dg = _gelu_exact(eb + de) - _gelu_exact(eb)
        amax = jnp.maximum(jnp.max(jnp.abs(dg), axis=-1, keepdims=True),
                           1e-8)
        h_v[:, j * hs:(j + 1) * hs] = jnp.round(
            dg * (127.0 / amax)).astype(jnp.int8)
        hscales.append(amax * (1.0 / 127.0))
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        dd = jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs], w2_v[j * hs:(j + 1) * hs, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        acc += dd.astype(jnp.float32) * hscales[j]
    m = mb_ref[:].astype(jnp.float32) + acc * s2_ref[0:1, :]
    o_ref[:] = x + m.astype(o_ref.dtype)


def _mlp_call(kernel, x2d, cached, rest, hidden, out_shapes, interpret):
    """Shared row-tiled pallas_call wrapper for the MLP-half kernels.
    ``cached`` = row-aligned tensors ([rows, C/H/slices]); ``rest`` =
    (lns, lnb, weights/scales/biases). ``out_shapes`` = list of
    (last_dim, dtype)."""
    rows, c = x2d.shape
    col_slices = _COL_SLICES
    while hidden % col_slices:
        col_slices -= 1
    vmem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None
    anyspace = pltpu.ANY if (_HAS_PLTPU and not interpret) else None
    tile = _MLP_ROW_TILE

    def inner(x2d, *flat):
        r = x2d.shape[0]
        rp = _round_up(r, tile)

        def padr(t):
            return t if t.shape[0] == rp else jnp.pad(
                t, ((0, rp - t.shape[0]),) + ((0, 0),) * (t.ndim - 1))

        xp = padr(x2d)
        cached_l = [padr(t) for t in flat[:len(cached)]]
        rest_l = flat[len(cached):]

        def tspec(last):
            return pl.BlockSpec((tile, last), lambda i: (i, 0),
                                memory_space=vmem)

        in_specs = [tspec(c)] + [tspec(t.shape[-1]) for t in cached_l]
        for t in rest_l:
            in_specs.append(pl.BlockSpec(
                memory_space=anyspace if t.dtype == jnp.int8 else vmem))
        out = pl.pallas_call(
            functools.partial(kernel, hidden=hidden,
                              col_slices=col_slices),
            grid=(rp // tile,),
            in_specs=in_specs,
            out_specs=tuple(tspec(last) for last, _ in out_shapes),
            out_shape=tuple(jax.ShapeDtypeStruct((rp, last), dt)
                            for last, dt in out_shapes),
            scratch_shapes=[
                pltpu.VMEM((c, hidden), jnp.int8),
                pltpu.VMEM((hidden, c), jnp.int8),
                pltpu.VMEM((tile, hidden), jnp.int8),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=(
                pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
                if (_VMEM_LIMIT and _HAS_PLTPU and not interpret)
                else None),
            interpret=interpret,
        )(xp, *cached_l, *rest_l)
        out = out if isinstance(out, (tuple, list)) else (out,)
        return tuple(t[:r] for t in out)

    from ..parallel.mesh import shard_batch_call

    flat = list(cached) + list(rest)
    batched = (True,) + (True,) * len(cached) + (False,) * len(rest)
    return shard_batch_call(inner, batched, x2d, *flat)


def base_mlp_block(x: Array, ln_scale: Array, ln_bias: Array,
                   w1q: Array, s1: Array, b1: Array,
                   w2q: Array, s2: Array, b2: Array,
                   eps: float, interpret: Optional[bool] = None,
                   mode: str = "e"):
    """Base MLP half with a selectable hidden-cache layout:

    - ``mode="e"``: ``(o, e_q, e_s, m)`` — int8 pre-GELU hidden
      ([rows, H] + [rows, n_slices] scales) and the bf16 fc2 output;
      anchor for the exact two-GELU delta kernel.
    - ``mode="e+g"``: appends ``(g_q, g_s, g_z)`` — the affine
      post-GELU hidden fc2 consumed; anchor for the one-GELU kernel.
    - ``mode="grad"``: ``(o, gp_q, gp_s, m)`` — ``gelu'(e)`` int8
      instead of the pre-GELU hidden; anchor for the linearized
      (no-GELU) delta kernel. The base consumes the exact f32 hidden.

    ``x``: [..., C]; weights pre-quantized."""
    if interpret is None:
        interpret = not _on_tpu()
    lead = x.shape[:-1]
    c = x.shape[-1]
    hidden = w1q.shape[-1]
    col_slices = _COL_SLICES
    while hidden % col_slices:
        col_slices -= 1
    row = lambda t: t.reshape(1, -1).astype(jnp.float32)
    kernel = {"e": _base_mlp_cache_kernel,
              "e+g": _base_mlp_cache_kernel_g,
              "grad": _base_mlp_cache_kernel_gr}[mode]
    out_shapes = [(c, x.dtype), (hidden, jnp.int8),
                  (col_slices, jnp.float32), (c, x.dtype)]
    if mode == "e+g":
        out_shapes += [(hidden, jnp.int8), (col_slices, jnp.float32),
                       (col_slices, jnp.float32)]
    out = _mlp_call(
        functools.partial(kernel, eps=eps),
        x.reshape(-1, c), [],
        (row(ln_scale), row(ln_bias), w1q, row(s1), row(b1),
         w2q, row(s2), row(b2)),
        hidden, out_shapes, interpret)
    o, e_q, e_s, m = out[:4]
    head = (o.reshape(*lead, c), e_q.reshape(-1, hidden),
            e_s, m.reshape(*lead, c))
    return head + tuple(out[4:]) if mode == "e+g" else head


def delta_mlp_block(x: Array, xb: Array, e_q: Array, e_s: Array,
                    m_b: Array, ln_scale: Array, ln_bias: Array,
                    w1q: Array, s1: Array, w2q: Array, s2: Array,
                    eps: float, interpret: Optional[bool] = None,
                    gelu_cache: Optional[Tuple[Array, Array, Array]] = None,
                    grad: bool = False) -> Array:
    """Returns ``o_i`` [..., C] — the whole MLP half anchored at the
    base cache (``e_q/e_s`` from :func:`base_mlp_block`, row-aligned).
    ``gelu_cache=(g_q, g_s, g_z)`` (from ``base_mlp_block(...,
    mode="e+g")``) selects the one-GELU kernel variant. With
    ``grad=True``, ``e_q``/``e_s`` are interpreted as the cached
    ``gelu'(e_b)`` (``mode="grad"``) and the linearized no-GELU kernel
    runs."""
    if interpret is None:
        interpret = not _on_tpu()
    lead = x.shape[:-1]
    c = x.shape[-1]
    hidden = w1q.shape[-1]
    row = lambda t: t.reshape(1, -1).astype(jnp.float32)
    cached = [xb.reshape(-1, c), e_q, e_s]
    kernel = _delta_mlp_kernel_lin if grad else _delta_mlp_kernel
    if gelu_cache is not None:
        cached += list(gelu_cache)
        kernel = _delta_mlp_kernel_g
    cached.append(m_b.reshape(-1, c))
    (o,) = _mlp_call(
        functools.partial(kernel, eps=eps),
        x.reshape(-1, c), cached,
        (row(ln_scale), row(ln_bias), w1q, row(s1), w2q, row(s2)),
        hidden, [(c, x.dtype)], interpret)
    return o.reshape(*lead, c)
