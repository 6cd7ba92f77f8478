"""Probe: does XLA hoist loop-invariant weight all-gathers out of the
compiled ODE scan when sampling with fsdp-sharded params? (VERDICT r3
weak #5 — shard_batch_call passes weights with in_specs=P(), one explicit
all-gather per kernel call, and those calls sit inside the 50-step scan.)

Counts all-gather ops per HLO computation of the compiled sampler and
reports whether any land inside the while-loop body.

Run: JAX_PLATFORMS=cpu python experiments/gather_hoist_probe.py
"""

import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import uspace_tpu  # noqa: F401
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def gather_counts_by_computation(hlo_text: str):
    """{computation_name: n_all_gather_ops}; HLO text computations start
    at column 0 with `name {` (ENTRY-prefixed for the entry)."""
    counts, name = {}, None
    for line in hlo_text.splitlines():
        m = re.match(r"^(?:ENTRY )?%?([\w\.\-]+)[^=]*\{", line)
        if m and not line.startswith(" "):
            name = m.group(1)
            continue
        if name and re.search(r"\ball-gather(-start)?\(", line):
            counts[name] = counts.get(name, 0) + 1
    return counts


def build_sampler(attn_impl, quant, n_steps, fsdp=4, tp=1):
    from uspace_tpu.core import flow
    from uspace_tpu.models import UViT
    from uspace_tpu.parallel import mesh as meshlib

    model = UViT(img_size=8, patch_size=2, in_chans=4, embed_dim=64,
                 depth=2, num_heads=4, attn_impl=attn_impl, quant=quant)
    mesh = meshlib.create_mesh(dp=8 // (fsdp * tp), fsdp=fsdp, tp=tp)
    z = jnp.zeros((16, 8, 8, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), z[:1], jnp.zeros((1,)))
    p_sh = meshlib.params_shardings(params, mesh)
    b_sh = meshlib.batch_sharding(mesh)
    sk = {"solver": "fixed", "solver_fix": "euler",
          "solver_fix_step": 1.0 / n_steps}

    def sample(p, z):
        vf = lambda t, x: model.apply(p, x, t)[0]
        return flow.decode(vf, z, sk)

    with meshlib.use_mesh(mesh):
        lowered = jax.jit(sample, in_shardings=(p_sh, b_sh),
                          out_shardings=b_sh).lower(params, z)
        compiled = lowered.compile()
    return compiled.as_text()


def report(attn_impl, quant, n_steps):
    txt = build_sampler(attn_impl, quant, n_steps)
    counts = gather_counts_by_computation(txt)
    in_body = {k: v for k, v in counts.items() if "body" in k or "while" in k}
    total = sum(counts.values())
    print(f"[{attn_impl} quant={quant} steps={n_steps}] total all-gathers: "
          f"{total}; by computation: {counts}")
    print(f"  inside while/body computations: {sum(in_body.values())} "
          f"{in_body}")
    return counts


if __name__ == "__main__":
    for impl, quant in (("xla", False), ("pallas_lnmlp", True)):
        for steps in (2, 8):
            report(impl, quant, steps)
