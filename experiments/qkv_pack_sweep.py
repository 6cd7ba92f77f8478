"""Sweep batch-packing of the int8 LN-qkvproj kernel on the sampler.

Usage: python experiments/qkv_pack_sweep.py BPP [BPP...]
"""
import sys

import uspace_tpu  # noqa: F401  (re-asserts JAX_PLATFORMS)

from _harness import bench_uvit_large


def main(bpps):
    from uspace_tpu.ops import attention as A

    for bpp in bpps:
        A._QKV_BATCH_PACK = bpp
        bench_uvit_large(f"QKVPACK bpp={bpp}", quant=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]])
