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


def test_stage_delta_cache_never_gathered():
    """The stage-delta adaptive solve under a dp/fsdp mesh: the per-block
    cache is a batch-sharded ACTIVATION created and consumed inside the
    dopri5 while body — an all-gather of it would necessarily sit in a
    non-entry (loop-body) computation. Pin: zero all-gathers outside the
    entry; the (fsdp-sharded) weight gathers hoist to the entry as in the
    fixed-step samplers above (VERDICT r4 #4)."""
    from uspace_tpu.core import delta_field, solvers

    model = UViT(img_size=8, patch_size=2, in_chans=4, embed_dim=64,
                 depth=2, num_heads=4, dtype=jnp.bfloat16)
    mesh = meshlib.create_mesh(dp=2, fsdp=4, tp=1)
    z = jnp.zeros((16, 8, 8, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), z[:1], jnp.zeros((1,)))
    dp_tree = delta_field.prepare_delta_params(params)
    dp_sh = meshlib.params_shardings(dp_tree, mesh)
    b_sh = meshlib.batch_sharding(mesh)
    rep = meshlib.replicated(mesh)

    def solve(dpt, z):
        fb, fd = delta_field.make_delta_field(model, dpt)
        x1, s = solvers.odeint_adaptive(
            None, z, 0.0, 1.0, method="dopri5", rtol=1e-3, atol=1e-3,
            controller="i", safety=0.9, return_stats=True,
            stage_delta=(fb, fd))
        return x1, s["nfe"]

    with meshlib.use_mesh(mesh):
        hlo = jax.jit(solve, in_shardings=(dp_sh, b_sh),
                      out_shardings=(b_sh, rep)
                      ).lower(dp_tree, z).compile().as_text()
    counts = _gather_counts(hlo)
    entry = sum(v for k, v in counts.items() if k.startswith("main"))
    body = sum(counts.values()) - entry
    assert body == 0, counts
    assert entry > 0, counts


def test_sharded_write_sweep_matches_single_device():
    """interp_grid-driven u-space writes and activation capture under a
    dp>1 mesh: edits are batch-local, so under pure batch sharding the
    sharded write must equal the single-device one to f32 noise — XLA
    tiles/fuses the per-device batch-2 program differently from the
    batch-16 one, reordering f32 partial sums by ~2e-7 (measured), so
    bit-equality is not attainable even with replicated weights; the
    pin demands <=1e-6, six orders below the edit response it guards.
    VERDICT r4 #6; reference:
    `/root/reference/libs/dissection.py:138-180`."""
    import numpy as np

    from uspace_tpu.core import flow
    from uspace_tpu.editing.capture import capture_trajectory
    from uspace_tpu.editing.specs import USpaceEdit
    from uspace_tpu.train.step import make_velocity_fn

    model = UViT(img_size=8, patch_size=2, in_chans=4, embed_dim=32,
                 depth=2, num_heads=4, attn_impl="xla")
    mesh = meshlib.create_mesh(dp=8, fsdp=1, tp=1)
    z = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 8, 4))
    params = model.init(jax.random.PRNGKey(0), z[:1], jnp.zeros((1,)))
    # mid-tap grid [T, L, C]; interp_grid gathers it at every solver t
    edit = USpaceEdit(delta_grid=0.1 * jnp.ones((11, 17, 32)),
                      scale=jnp.float32(5.0), grid_dt=0.1, t_edit=0.5,
                      loc="mid")
    sk = {"solver": "fixed", "solver_fix": "euler", "solver_fix_step": 0.1}

    def write(p, z):
        vf = make_velocity_fn(model, p, {}, edit=edit)
        return flow.decode(vf, z, sk)

    p_sh = meshlib.params_shardings(params, mesh)
    b_sh = meshlib.batch_sharding(mesh)
    with meshlib.use_mesh(mesh):
        out_sh = jax.jit(write, in_shardings=(p_sh, b_sh),
                         out_shardings=b_sh)(params, z)
    out_ref = jax.jit(write)(params, z)
    assert float(jnp.abs(out_sh - out_ref).max()) <= 1e-6
    # ...and the edit the bound guards is real: the write visibly moves
    # the latents relative to an un-edited decode

    def plain(p, z):
        return flow.decode(make_velocity_fn(model, p, {}), z, sk)

    assert float(jnp.abs(out_ref - jax.jit(plain)(params, z)).max()) > 1e-3

    # capture under the mesh (read phase of the same workflow)
    with meshlib.use_mesh(mesh):
        z_enc, stacks = capture_trajectory(
            model, jax.device_put(params, p_sh),
            jax.device_put(z, b_sh), taps=("mid",),
            direction="encode", num_steps=5)
    z_ref, stacks_ref = capture_trajectory(model, params, z,
                                           taps=("mid",), num_steps=5,
                                           direction="encode")
    assert float(jnp.abs(z_enc - z_ref).max()) <= 1e-6
    np.testing.assert_allclose(np.asarray(stacks["mid"]),
                               np.asarray(stacks_ref["mid"]), atol=1e-6)
