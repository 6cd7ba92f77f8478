"""Delta-MLP kernel cost attribution + tiling sweep (TPU).

KPROBE r5: base MLP 3.77 ms/call, delta MLP 4.74 (+26%) at tile 448 /
4 slices. The delta kernel differs from the base by: 3 extra streamed
operands (xb bf16, e_q int8 [T,H], m_b bf16), one extra LN, an eb
dequant + SECOND GELU (dg = gelu(eb+de) - gelu(eb)), and a second
per-strip row-quant. This script times:

- ``tile_R_S[_V]``: the real delta_mlp_block with _MLP_ROW_TILE=R,
  _COL_SLICES=S (and optional vmem limit V MB) monkeypatched — the
  legal knob sweep.
- ``nog``: an ATTRIBUTION-ONLY kernel variant with the second GELU and
  eb dequant removed (numerically WRONG — measures what the double-GELU
  path costs).
- ``nostream``: ATTRIBUTION-ONLY variant that drops the e_q/m_b streams
  (dg = gelu(de) fiction — measures the extra operand-streaming cost).

Usage: python experiments/delta_mlp_sweep.py {tile_448_4|tile_448_2|
    tile_224_4|tile_896_4|nog|nostream} (one case per process)
"""
import functools
import sys
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, C, H = 50, 257, 1024, 4096
REPS = 10


def _nog_kernel(x_ref, xb_ref, eq_ref, es_ref, mb_ref, lns_ref, lnb_ref,
                w1_ref, s1_ref, w2_ref, s2_ref, o_ref, w1_v, w2_v, h_v,
                sem, *, hidden, eps, col_slices):
    """delta MLP without the eb dequant + second GELU (WRONG numerics:
    dg := gelu(de)). Streams identical to the real kernel."""
    from uspace_tpu.ops.delta import _ln_f32, _rowquant
    from uspace_tpu.ops.mlp import _gelu_exact

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
    d = _ln_f32(x, lns_ref, lnb_ref, eps) - _ln_f32(xb, lns_ref, lnb_ref,
                                                    eps)
    dq, ds = _rowquant(d)
    hs = hidden // col_slices
    hscales = []
    for j in range(col_slices):
        part = jax.lax.dot_general(
            dq, w1_v[:, j * hs:(j + 1) * hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        de = part.astype(jnp.float32) * ds * s1_ref[0:1, j * hs:(j + 1) * hs]
        # ATTRIBUTION ONLY: no eb dequant, single GELU
        dg = _gelu_exact(de) + 0.0 * es_ref[0:1, 0:1]
        amax = jnp.maximum(jnp.max(jnp.abs(dg), axis=-1, keepdims=True),
                           1e-8)
        h_v[:, j * hs:(j + 1) * hs] = jnp.round(
            dg * (127.0 / amax)).astype(jnp.int8)
        hscales.append(amax * (1.0 / 127.0))
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        dd = jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs], w2_v[j * hs:(j + 1) * hs, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc += dd.astype(jnp.float32) * hscales[j]
    m = mb_ref[:].astype(jnp.float32) + acc * s2_ref[0:1, :]
    o_ref[:] = x + m.astype(o_ref.dtype)


def _nostream_kernel(x_ref, xb_ref, lns_ref, lnb_ref, w1_ref, s1_ref,
                     w2_ref, s2_ref, o_ref, w1_v, w2_v, h_v, sem,
                     *, hidden, eps, col_slices):
    """delta MLP without the e_q/e_s/m_b streams (WRONG numerics):
    measures what the extra operand streaming costs."""
    from uspace_tpu.ops.delta import _ln_f32, _rowquant
    from uspace_tpu.ops.mlp import _gelu_exact

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
    d = _ln_f32(x, lns_ref, lnb_ref, eps) - _ln_f32(xb, lns_ref, lnb_ref,
                                                    eps)
    dq, ds = _rowquant(d)
    hs = hidden // col_slices
    hscales = []
    for j in range(col_slices):
        part = jax.lax.dot_general(
            dq, w1_v[:, j * hs:(j + 1) * hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        de = part.astype(jnp.float32) * ds * s1_ref[0:1, j * hs:(j + 1) * hs]
        dg = _gelu_exact(de + 0.1) - _gelu_exact(de - 0.1)  # 2 GELUs kept
        amax = jnp.maximum(jnp.max(jnp.abs(dg), axis=-1, keepdims=True),
                           1e-8)
        h_v[:, j * hs:(j + 1) * hs] = jnp.round(
            dg * (127.0 / amax)).astype(jnp.int8)
        hscales.append(amax * (1.0 / 127.0))
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for j in range(col_slices):
        dd = jax.lax.dot_general(
            h_v[:, j * hs:(j + 1) * hs], w2_v[j * hs:(j + 1) * hs, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc += dd.astype(jnp.float32) * hscales[j]
    o_ref[:] = x + acc.astype(o_ref.dtype) * 0.001


def _variant_call(kernel, n_stream, x2d, cached, rest, hidden, interpret):
    """Minimal copy of ops.delta._mlp_call for the attribution kernels
    (no shard_batch_call: single device)."""
    from uspace_tpu.ops.delta import _COL_SLICES, _MLP_ROW_TILE, _round_up

    rows, c = x2d.shape
    tile = _MLP_ROW_TILE
    rp = _round_up(rows, tile)

    def padr(t):
        return t if t.shape[0] == rp else jnp.pad(
            t, ((0, rp - t.shape[0]),) + ((0, 0),) * (t.ndim - 1))

    xp = padr(x2d)
    cached_l = [padr(t) for t in cached]

    def tspec(last):
        return pl.BlockSpec((tile, last), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [tspec(c)] + [tspec(t.shape[-1]) for t in cached_l]
    for t in rest:
        in_specs.append(pl.BlockSpec(
            memory_space=pltpu.ANY if t.dtype == jnp.int8 else pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(kernel, hidden=hidden, eps=1e-5,
                          col_slices=_COL_SLICES),
        grid=(rp // tile,),
        in_specs=in_specs,
        out_specs=tspec(c),
        out_shape=jax.ShapeDtypeStruct((rp, c), x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, hidden), jnp.int8),
            pltpu.VMEM((hidden, c), jnp.int8),
            pltpu.VMEM((tile, hidden), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
    )(xp, *cached_l, *rest)
    return out[:rows]


def main(case):
    from uspace_tpu.models.layers import LN_EPS
    from uspace_tpu.ops import delta as D
    from uspace_tpu.ops.quant import quantize_colwise

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    x = jax.random.normal(ks[0], (B, L, C), jnp.bfloat16)
    xb = x + 0.01 * jax.random.normal(ks[1], (B, L, C), jnp.bfloat16)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)

    def quant(shape, key):
        w = jax.random.normal(key, shape, jnp.float32) * 0.02
        return quantize_colwise(w)

    w1, w1s = quant((C, H), ks[4])
    w2, w2s = quant((H, C), ks[5])
    b1 = jnp.zeros((H,), jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)
    _, eq, es, mb = D.base_mlp_block(xb, lns, lnb, w1, w1s, b1,
                                     w2, w2s, b2, LN_EPS)
    row = lambda t: t.reshape(1, -1).astype(jnp.float32)

    if case.startswith("tile_"):
        parts = case.split("_")
        D._MLP_ROW_TILE = int(parts[1])
        D._COL_SLICES = int(parts[2])
        if len(parts) > 3:
            D._VMEM_LIMIT = int(parts[3]) * 2**20

        @jax.jit
        def run(x, xb, eq, es, mb):
            def body(x, _):
                o = D.delta_mlp_block(x, xb, eq, es, mb, lns, lnb,
                                      w1, w1s, w2, w2s, LN_EPS)
                return (x + 0.001 * o).astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=REPS)
            return x

        args = (x, xb, eq, es, mb)
    elif case == "nog":

        @jax.jit
        def run(x, xb, eq, es, mb):
            x2, xb2 = x.reshape(-1, C), xb.reshape(-1, C)

            def body(x2, _):
                o = _variant_call(
                    _nog_kernel, 5, x2,
                    [xb2, eq, es, mb.reshape(-1, C)],
                    (row(lns), row(lnb), w1, row(w1s), w2, row(w2s)),
                    H, False)
                return (x2 + 0.001 * o).astype(x2.dtype), None

            x2, _ = jax.lax.scan(body, x2, None, length=REPS)
            return x2

        args = (x, xb, eq, es, mb)
    elif case == "nostream":

        @jax.jit
        def run(x, xb):
            x2, xb2 = x.reshape(-1, C), xb.reshape(-1, C)

            def body(x2, _):
                o = _variant_call(
                    _nostream_kernel, 1, x2, [xb2],
                    (row(lns), row(lnb), w1, row(w1s), w2, row(w2s)),
                    H, False)
                return (x2 + 0.001 * o).astype(x2.dtype), None

            x2, _ = jax.lax.scan(body, x2, None, length=REPS)
            return x2

        args = (x, xb)
    else:
        raise SystemExit(f"unknown case {case}")

    out = run(*args)
    _ = float(out.astype(jnp.float32).mean())
    t0 = time.perf_counter()
    out = run(*args)
    _ = float(out.astype(jnp.float32).mean())
    dt = time.perf_counter() - t0
    print(f"DMLPSWEEP {case}: {dt / REPS * 1000:.2f} ms/call "
          f"({REPS} reps, B={B} L={L} C={C} H={H})", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
