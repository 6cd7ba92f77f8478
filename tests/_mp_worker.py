"""Subprocess body for tests/test_multiprocess.py — runs the framework as
real ``jax.distributed`` processes on CPU.

Roles:
  single <out.npz>                     — 8 local virtual devices, 1 process
  worker <out.npz> <coord> <n> <pid>   — 4 local virtual devices, joins the
                                         2-process cluster (8 global devices)

Both roles execute the IDENTICAL global computation (same dp2 x fsdp2 x tp2
mesh over 8 devices, same deterministic batches), so the parent test can
assert the 2-process run reproduces single-process numerics bit-for-bit —
the multi-chip correctness claim the virtual-mesh dryrun cannot make
(reference deployment shape: ``accelerate launch --multi_gpu
--num_processes 4``, /root/reference/README.md:76, train_lfm.py:29).
"""

import os
import re
import sys

# `python tests/_mp_worker.py` puts tests/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup_platform(n_local_devices: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_local_devices}"
    ).strip()


def main() -> None:
    role, out_path = sys.argv[1], sys.argv[2]
    _setup_platform(4 if role == "worker" else 8)

    import uspace_tpu  # noqa: F401  (re-asserts cpu before jax backends init)
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from uspace_tpu.parallel import distributed

    if role == "worker":
        coord, nproc, pid = sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
        distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid
        )
        assert jax.process_count() == nproc, jax.process_count()
        assert jax.process_index() == pid
    else:
        pid = 0
    assert jax.device_count() == 8, jax.devices()

    out = dict(role=role, pid=pid)
    out.update(_train_steps())
    if role == "worker":
        out.update(_collectives(pid))
        out.update(_loader_partition(pid))
        distributed.barrier("test-final")
        out["barrier_ok"] = 1
    np.savez(out_path, **out)
    print(f"[{role}:{pid}] wrote {out_path}")


def _train_steps() -> dict:
    """Three sharded train steps over the global dp2 x fsdp2 x tp2 mesh on
    deterministic batches; returns loss bits + per-leaf param sums (computed
    under the SAME shardings in both roles, so reduction order matches and
    bit-for-bit comparison is meaningful)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uspace_tpu.models import UViT
    from uspace_tpu.parallel import mesh as meshlib
    from uspace_tpu.train.state import TrainState, get_lr_schedule, get_optimizer
    from uspace_tpu.train.step import make_train_step

    model = UViT(img_size=8, patch_size=2, in_chans=4, embed_dim=64,
                 depth=2, num_heads=4, attn_impl="xla")
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)))
    lr = get_lr_schedule("customized", 1e-4)
    tx = get_optimizer("adam", lr, weight_decay=0.03)
    state = TrainState.create(params, tx)

    mesh = meshlib.create_mesh(dp=2, fsdp=2, tp=2)  # 8 GLOBAL devices
    st_sh = meshlib.state_shardings(state, mesh)
    b_sh = meshlib.batch_sharding(mesh)
    rep = meshlib.replicated(mesh)
    state = jax.device_put(state, st_sh)
    step = jax.jit(
        make_train_step(model, tx, lr_schedule=lr),
        in_shardings=(st_sh, {"x": b_sh}, rep),
        out_shardings=(st_sh, rep),
    )
    step_rng = jax.device_put(jax.random.PRNGKey(1), rep)

    gen = np.random.default_rng(7)
    losses = []
    for _ in range(3):
        gb = gen.standard_normal((16, 8, 8, 4)).astype(np.float32)
        garr = jax.make_array_from_callback(gb.shape, b_sh,
                                            lambda idx: gb[idx])
        state, m = step(state, {"x": garr}, step_rng)
        losses.append(np.float32(m["loss"]))

    # per-leaf f32 sums of the final params — same shardings both roles,
    # so XLA's reduction order (and thus the bits) must match
    sums = jax.jit(
        lambda s: jnp.stack([jnp.sum(l) for l in jax.tree.leaves(s.params)]),
        out_shardings=rep,
    )(state)
    return {"losses": np.asarray(losses), "param_sums": np.asarray(sums)}


def _collectives(pid: int) -> dict:
    """process_allgather must return the identical global set on every
    rank; barrier must return."""
    import numpy as np

    from uspace_tpu.parallel import distributed

    local = np.full((2, 3), float(pid), np.float32) + np.arange(3)
    gathered = distributed.process_allgather(local)
    distributed.barrier("test-after-allgather")
    return {"allgather": np.asarray(gathered)}


def _loader_partition(pid: int) -> dict:
    """Per-process DataLoader shards must partition the index space: gather
    the sample ids every rank consumed in epoch 0 and return them for the
    parent's disjoint-union check."""
    import jax
    import numpy as np

    from uspace_tpu.data.loader import DataLoader
    from uspace_tpu.parallel import distributed

    class _IdDataset:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"x": np.float32(i)}

    loader = DataLoader(_IdDataset(), batch_size=4, seed=3,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())
    ids = np.concatenate([b["x"] for b in loader.epoch(0)]).astype(np.int64)
    all_ids = distributed.process_allgather(ids)
    return {"loader_ids_local": ids, "loader_ids_all": np.asarray(all_ids)}


if __name__ == "__main__":
    main()
