"""Compiled-HLO regression checks for the sharded sampling path.

``shard_batch_call`` feeds loop-invariant weights into ``shard_map`` with
``in_specs=P()`` — an explicit all-gather per kernel call, and the calls
sit inside the ODE scan body (parallel/mesh.py). These tests pin that XLA
hoists those gathers out of the compiled while loop (one gather per
weight per SOLVE, not per step): the all-gather count must be invariant
to the step count and zero all-gathers may appear inside non-entry
(while-body) computations. Measured r4: 44 (xla impl) / 50 (int8
pallas_lnmlp) gathers, all in the entry computation, identical at 2 and
8 steps (experiments/gather_hoist_probe.py).
"""

import re

import jax
import jax.numpy as jnp
import pytest

from uspace_tpu.core import flow
from uspace_tpu.models import UViT
from uspace_tpu.parallel import mesh as meshlib


def _gather_counts(hlo_text: str):
    counts, name = {}, None
    for line in hlo_text.splitlines():
        m = re.match(r"^(?:ENTRY )?%?([\w\.\-]+)[^=]*\{", line)
        if m and not line.startswith(" "):
            name = m.group(1)
            continue
        if name and re.search(r"\ball-gather(-start)?\(", line):
            counts[name] = counts.get(name, 0) + 1
    return counts


def _compile_sampler(attn_impl, quant, n_steps):
    model = UViT(img_size=8, patch_size=2, in_chans=4, embed_dim=64,
                 depth=2, num_heads=4, attn_impl=attn_impl, quant=quant)
    mesh = meshlib.create_mesh(dp=2, fsdp=4, tp=1)
    z = jnp.zeros((16, 8, 8, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), z[:1], jnp.zeros((1,)))
    p_sh = meshlib.params_shardings(params, mesh)
    b_sh = meshlib.batch_sharding(mesh)
    sk = {"solver": "fixed", "solver_fix": "euler",
          "solver_fix_step": 1.0 / n_steps}

    def sample(p, z):
        return flow.decode(lambda t, x: model.apply(p, x, t)[0], z, sk)

    with meshlib.use_mesh(mesh):
        return jax.jit(sample, in_shardings=(p_sh, b_sh),
                       out_shardings=b_sh).lower(params, z).compile().as_text()


@pytest.mark.slow
@pytest.mark.parametrize("attn_impl,quant", [("xla", False),
                                             ("pallas_lnmlp", True)])
def test_weight_gathers_hoisted_out_of_ode_loop(attn_impl, quant):
    c2 = _gather_counts(_compile_sampler(attn_impl, quant, 2))
    c8 = _gather_counts(_compile_sampler(attn_impl, quant, 8))

    def split(counts):
        entry = {k: v for k, v in counts.items() if k.startswith("main")}
        return sum(entry.values()), sum(counts.values()) - sum(entry.values())

    entry2, body2 = split(c2)
    entry8, body8 = split(c8)
    # no per-step weight gather: nothing inside while/body computations
    assert body2 == 0 and body8 == 0, (c2, c8)
    # one-gather-per-solve: count invariant to the step count
    assert entry2 == entry8 > 0, (c2, c8)
