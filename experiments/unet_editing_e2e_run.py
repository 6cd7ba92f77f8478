"""Full-scale trained SD-UNet u-space editing proof (docs/editing_e2e_unet.md).

Runs the complete reference UNet-editing workflow (dissect_helper_unet +
interp_ode_unet, `/root/reference/libs/dissection.py:189-282`, `:73-112`)
on a model trained in THIS run: 3k-step train of the toy self-attention
UNet on the attribute-structured synthetic latents
(configs/synthetic_attr_unet_e2e), then read -> attr directions -> write
sweeps at the mid (h-space) tap, including writes under pure-dopri5 and
fixadp solves (interp_grid at off-grid t). Artifacts land in
docs/editing_e2e_unet/; the narrative doc wraps them.

Usage: python experiments/unet_editing_e2e_run.py [workdir]
(CPU note: any ad-hoc run must go through uspace_tpu's import first —
it re-asserts JAX_PLATFORMS; default here is the TPU tunnel.)
"""
import json
import sys
import time

import uspace_tpu  # noqa: F401
import jax


def main(workdir="docs/editing_e2e_unet"):
    from uspace_tpu.cli.editing_e2e import run
    from uspace_tpu.configs.synthetic_attr_unet_e2e import get_config
    from uspace_tpu.train.loop import train

    cfg = get_config()
    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.time()
    train_wd = workdir + "/train"
    train(cfg, train_wd)
    print(f"train done in {time.time() - t0:.0f}s", flush=True)
    cfg.dissection.ckpt_path_to_dissect = train_wd + "/ckpts"
    report = run(cfg, workdir)
    print("EDITING_E2E_UNET " + json.dumps(
        {"passed": report["passed"],
         "attrs": [{k: r[k] for k in
                    ("attr", "effect_size", "monotone_fraction",
                     "monotone_fraction_supported", "gt_agrees",
                     "orientation")} for r in report["attrs"]],
         "adaptive_checks": report["adaptive_checks"],
         "roundtrip": report["roundtrip"]}), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:2])
