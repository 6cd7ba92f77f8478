"""Sweep int8 MLP kernel tile shape on the full int8 sampler (TPU).

Usage: python experiments/mlp_tile_sweep.py ROW_TILE COL_SLICES VMEM_MB
(VMEM_MB=0 keeps the compiler default scoped limit.)

Prints one line: the bench_sampler protocol (U-ViT-large, Euler-50,
batch 50, quant=True) img/s at that tile configuration. r3 ladder:
256/8: 23.52, 384/8/32: 23.63, 384/4/32: 23.77, 448/8/32: 23.77,
448/4/32: 23.85 (chosen), 512/4/64: 23.19, 512/8/64: 22.97,
320/8/32: 23.49; 384/8 at the default 16MB limit fails to compile
(scoped-VMEM OOM by 672KB).
"""
import sys

import uspace_tpu  # noqa: F401  (re-asserts JAX_PLATFORMS)

from _harness import bench_uvit_large


def main(row, slices, vmem_mb):
    from uspace_tpu.ops import mlp as mlp_mod

    mlp_mod._ROW_TILE = row
    mlp_mod._COL_SLICES = slices
    mlp_mod._VMEM_LIMIT = vmem_mb * 2**20 if vmem_mb else None
    bench_uvit_large(f"SWEEP row={row} slices={slices} vmem={vmem_mb}MB",
                     quant=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
