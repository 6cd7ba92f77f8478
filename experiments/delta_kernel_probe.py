"""Per-kernel timing of the anchored stage-delta suite (TPU).

Times each of the four ops/delta.py kernels in isolation at the real
U-ViT-large bench shapes (batch 50, L=257, C=1024, H=4096), rep-chained
inside one jit, plus the proven ops/mlp.py int8 MLP kernel as the
speed-of-light reference for the MLP half. Attribution for the delta
eval's cost gap vs the base eval (experiments/delta_eval_probe.py).

Usage: python experiments/delta_kernel_probe.py \
    {battn|dattn|bmlp|dmlp|refmlp|bmlpg|dmlpg} (one case per process)

``bmlpg``/``dmlpg``: the gelu-cache variants (base additionally emits
the affine post-GELU hidden; delta anchors there and drops its second
GELU pass — the r5 attack on the dmlp-vs-bmlp VPU gap).
"""
import sys
import time

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp

B, L, C, H = 50, 257, 1024, 4096
HEADS = 16
REPS = 10


def main(case):
    from uspace_tpu.models.layers import LN_EPS
    from uspace_tpu.ops import delta as D
    from uspace_tpu.ops.quant import quantize_colwise

    # "<case>@TILE[_SLICES[_VMEMMB]]" overrides the ops.delta tiling for
    # this process (e.g. dmlpg@224, dmlpg@224_4_96)
    if "@" in case:
        case, spec = case.split("@", 1)
        parts = spec.split("_")
        D._MLP_ROW_TILE = int(parts[0])
        if len(parts) > 1:
            D._COL_SLICES = int(parts[1])
        if len(parts) > 2:
            D._VMEM_LIMIT = int(parts[2]) * 2**20
        print(f"tiling override: tile={D._MLP_ROW_TILE} "
              f"slices={D._COL_SLICES} vmem={D._VMEM_LIMIT}", flush=True)

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    x = jax.random.normal(ks[0], (B, L, C), jnp.bfloat16)
    xb = x + 0.01 * jax.random.normal(ks[1], (B, L, C), jnp.bfloat16)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)

    def quant(shape, key):
        w = jax.random.normal(key, shape, jnp.float32) * 0.02
        return quantize_colwise(w)

    wq, wqs = quant((C, 3 * C), ks[2])
    wp, wps = quant((C, C), ks[3])
    w1, w1s = quant((C, H), ks[4])
    w2, w2s = quant((H, C), ks[5])
    b1 = jnp.zeros((H,), jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)

    if case == "battn":

        @jax.jit
        def run(x):
            def body(x, _):
                a, qq, qs = D.base_attn_block(x, lns, lnb, wq, wqs,
                                              HEADS, LN_EPS)
                return (x + 0.001 * a).astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=REPS)
            return x

        args = (x,)
    elif case == "dattn":
        a0, qq, qs = D.base_attn_block(xb, lns, lnb, wq, wqs, HEADS, LN_EPS)
        xmb = xb

        @jax.jit
        def run(x, xb, qq, qs, a0, xmb):
            def body(x, _):
                xm = D.delta_attn_block(x, xb, qq, qs,
                                        jnp.pad(a0, ((0, 0), (0, 31), (0, 0))),
                                        xmb, lns, lnb, wq, wqs, wp, wps,
                                        HEADS, LN_EPS)
                return (x + 0.001 * xm).astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=REPS)
            return x

        args = (x, xb, qq, qs, a0, xmb)
    elif case == "bmlp":

        @jax.jit
        def run(x):
            def body(x, _):
                o, eq, es, m = D.base_mlp_block(x, lns, lnb, w1, w1s, b1,
                                                w2, w2s, b2, LN_EPS)
                return (x + 0.001 * o).astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=REPS)
            return x

        args = (x,)
    elif case == "dmlp":
        _, eq, es, mb = D.base_mlp_block(xb, lns, lnb, w1, w1s, b1,
                                         w2, w2s, b2, LN_EPS)

        @jax.jit
        def run(x, xb, eq, es, mb):
            def body(x, _):
                o = D.delta_mlp_block(x, xb, eq, es, mb, lns, lnb,
                                      w1, w1s, w2, w2s, LN_EPS)
                return (x + 0.001 * o).astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=REPS)
            return x

        args = (x, xb, eq, es, mb)
    elif case == "bmlpg":

        @jax.jit
        def run(x):
            def body(x, _):
                o, eq, es, m, gq, gs, gz = D.base_mlp_block(
                    x, lns, lnb, w1, w1s, b1, w2, w2s, b2, LN_EPS,
                    mode="e+g")
                return (x + 0.001 * o).astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=REPS)
            return x

        args = (x,)
    elif case == "dmlpg":
        _, eq, es, mb, gq, gs, gz = D.base_mlp_block(
            xb, lns, lnb, w1, w1s, b1, w2, w2s, b2, LN_EPS,
            mode="e+g")

        @jax.jit
        def run(x, xb, eq, es, gq, gs, gz, mb):
            def body(x, _):
                o = D.delta_mlp_block(x, xb, eq, es, mb, lns, lnb,
                                      w1, w1s, w2, w2s, LN_EPS,
                                      gelu_cache=(gq, gs, gz))
                return (x + 0.001 * o).astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=REPS)
            return x

        args = (x, xb, eq, es, gq, gs, gz, mb)
    elif case == "bmlpgr":

        @jax.jit
        def run(x):
            def body(x, _):
                o, gpq, gps, m = D.base_mlp_block(
                    x, lns, lnb, w1, w1s, b1, w2, w2s, b2, LN_EPS,
                    mode="grad")
                return (x + 0.001 * o).astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=REPS)
            return x

        args = (x,)
    elif case == "dmlpgr":
        _, gpq, gps, mb = D.base_mlp_block(
            xb, lns, lnb, w1, w1s, b1, w2, w2s, b2, LN_EPS, mode="grad")

        @jax.jit
        def run(x, xb, gpq, gps, mb):
            def body(x, _):
                o = D.delta_mlp_block(x, xb, gpq, gps, mb, lns, lnb,
                                      w1, w1s, w2, w2s, LN_EPS,
                                      grad=True)
                return (x + 0.001 * o).astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=REPS)
            return x

        args = (x, xb, gpq, gps, mb)
    elif case == "refmlp":
        from uspace_tpu.ops.mlp import fused_mlp_block_q

        w1f = jax.random.normal(ks[4], (C, H), jnp.float32) * 0.02
        w2f = jax.random.normal(ks[5], (H, C), jnp.float32) * 0.02

        @jax.jit
        def run(x):
            def body(x, _):
                o = fused_mlp_block_q(x, lns, lnb, w1f, b1, w2f, b2,
                                      eps=LN_EPS, quant=True)
                return (x + 0.001 * o).astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=REPS)
            return x

        args = (x,)
    else:
        raise SystemExit(f"unknown case {case}")

    out = run(*args)
    _ = float(out.astype(jnp.float32).mean())
    t0 = time.perf_counter()
    out = run(*args)
    _ = float(out.astype(jnp.float32).mean())
    dt = time.perf_counter() - t0
    print(f"KPROBE {case}: {dt / REPS * 1000:.2f} ms/call "
          f"({REPS} reps, B={B} L={L} C={C} H={H})", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
