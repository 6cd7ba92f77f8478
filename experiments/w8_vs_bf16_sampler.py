"""Euler-50 sampler: weight-only int8 ("w8") view vs bf16 lnmlp view.

Usage: python experiments/w8_vs_bf16_sampler.py {w8|bf16}

The w8 view is the adaptive-solver-safe quantized view (no activation
rounding in the field). Measured r3 at the 448/4 tiles: w8 18.20 vs
bf16 18.61 img/s — the int8->bf16 strip-cast relayouts still cost more
than the halved weight DMA saves, so bf16 stays the adaptive pick.
"""
import sys

import uspace_tpu  # noqa: F401  (re-asserts JAX_PLATFORMS)

from _harness import bench_uvit_large


def main(view):
    if view == "w8":
        bench_uvit_large("VIEW w8", quant="w8")
    elif view == "bf16":
        bench_uvit_large("VIEW bf16", attn_impl="pallas_lnmlp")
    else:
        raise SystemExit(view)


if __name__ == "__main__":
    main(sys.argv[1])
