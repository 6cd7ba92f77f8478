"""Device mesh and sharding layout.

The reference scales out with data-parallel DDP only (HF accelerate /
NCCL, `/root/reference/train_lfm.py:29,78-83`). The TPU-native design is a
single ``jax.sharding.Mesh`` with three axes:

- ``dp``   — pure data parallelism (batch sharding; gradient psum is
             compiled into the step by GSPMD),
- ``fsdp`` — batch sharding *and* parameter/optimizer-state sharding
             (ZeRO-style; params gather on use),
- ``tp``   — tensor parallelism over attention heads / MLP hidden dim
             (Megatron layout via GSPMD sharding propagation).

Shardings are expressed as ``NamedSharding`` trees over the parameter
pytree; collectives ride ICI, inserted by XLA. The reference's explicit
collectives map as: DDP grad all-reduce -> psum compiled into jit; loss
``gather`` -> replicated loss output; sample gather -> process_allgather
(evals/sampling.py).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

AXES = ("dp", "fsdp", "tp")


def create_mesh(
    dp: Optional[int] = None, fsdp: int = 1, tp: int = 1, devices=None
) -> Mesh:
    """Build a [dp, fsdp, tp] mesh; dp defaults to all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % (fsdp * tp) == 0, (n, fsdp, tp)
        dp = n // (fsdp * tp)
    assert dp * fsdp * tp == n, (dp, fsdp, tp, n)
    try:
        # topology-aware assignment: axes map onto the physical ICI
        # torus so fsdp/tp collectives ride neighboring links
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((dp, fsdp, tp),
                                                  devices=devices)
    except Exception:  # virtual/CPU device sets without topology info
        dev_array = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(dev_array, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the batch axis over dp x fsdp; replicate over tp."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def batch_pspec() -> P:
    return P(("dp", "fsdp"))


# --- parameter layout -------------------------------------------------------

# Megatron-style TP rules for the transformer blocks: column-parallel into
# attention/MLP, row-parallel out. Matched against the flax param path.
_TP_RULES = (
    (r"attn/qkv/kernel$", (None, "tp")),
    (r"attn/qkv/bias$", ("tp",)),
    (r"attn/proj/kernel$", ("tp", None)),
    (r"mlp/fc1/kernel$", (None, "tp")),
    (r"mlp/fc1/bias$", ("tp",)),
    (r"mlp/fc2/kernel$", ("tp", None)),
)


def _spec_for(path: str, shape, mesh: Mesh) -> P:
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp, fsdp = axis_sizes.get("tp", 1), axis_sizes.get("fsdp", 1)
    spec = [None] * len(shape)
    if tp > 1:
        for pat, rule in _TP_RULES:
            if re.search(pat, path):
                for i, ax in enumerate(rule):
                    if ax is not None and shape[i] % tp == 0:
                        spec[i] = ax
                break
    if fsdp > 1:
        # ZeRO-shard the largest still-unsharded axis that divides evenly
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if spec[i] is None and shape[i] % fsdp == 0 and shape[i] >= fsdp:
                spec[i] = "fsdp"
                break
    return P(*spec)


def _path_str(kp) -> str:
    """Flax key-path -> "a/b/c" (shared by the layout helpers)."""
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)


def params_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a parameter pytree (TP + FSDP layout)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    specs = {_path_str(kp): _spec_for(_path_str(kp), v.shape, mesh)
             for kp, v in flat}

    def assign(kp, v):
        return NamedSharding(mesh, specs[_path_str(kp)])

    return jax.tree_util.tree_map_with_path(assign, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


BATCH_AXES = ("dp", "fsdp")


def constrain(x: Array, *spec) -> Array:
    """``with_sharding_constraint`` with a bare PartitionSpec, applied
    only when an ambient mesh (``jax.set_mesh`` / ``use_mesh``) is
    active, every named axis in ``spec`` exists on it, and each
    constrained dim divides by its axis size — a no-op otherwise.

    Lets model code pin activation layouts around Pallas kernels (GSPMD
    treats pallas_call as opaque and can pick pathological transitions —
    "involuntary full rematerialization") without threading a mesh
    handle through the module tree.
    """
    try:
        m = jax.sharding.get_abstract_mesh()
    except Exception:  # pragma: no cover - older jax
        return x
    if m is None or m.empty:
        return x
    sizes = dict(zip(m.axis_names, m.axis_sizes))

    def keep(entry, dim):
        if entry is None:
            return None
        axes = entry if isinstance(entry, (tuple, list)) else (entry,)
        total = 1
        for a in axes:
            if a not in sizes:
                return None
            total *= sizes[a]
        if total <= 1 or dim % total != 0:
            return None
        return tuple(axes) if len(axes) > 1 else axes[0]

    cleaned = [keep(e, d) for e, d in zip(spec, x.shape)]
    if all(c is None for c in cleaned):
        return x
    return jax.lax.with_sharding_constraint(x, P(*cleaned))


def shard_batch_call(fn, batched, *args):
    """Run ``fn(*args)`` under ``shard_map`` over the ambient mesh's
    batch axes (dp/fsdp), sharding dim 0 of ``args[i]`` where
    ``batched[i]`` and replicating the rest; falls back to a direct call
    when no ambient mesh is active, the batch axes are absent/size-1, or
    a batched dim 0 does not divide.

    This is how the Pallas sampling/training kernels scale out: GSPMD
    treats ``pallas_call`` as an opaque custom call and, lacking a
    partitioning rule, replicates its operands (logging "involuntary
    full rematerialization"). Under shard_map each device runs the
    kernel on its batch shard; weights enter replicated (one explicit
    gather, half traffic for int8 copies) and the activation never
    leaves its home device.
    """
    try:
        m = jax.sharding.get_abstract_mesh()
    except Exception:  # pragma: no cover - older jax
        return fn(*args)
    if m is None or m.empty:
        return fn(*args)
    sizes = dict(zip(m.axis_names, m.axis_sizes))
    axes = tuple(a for a in BATCH_AXES if sizes.get(a, 1) > 1)
    n = int(np.prod([sizes[a] for a in axes])) if axes else 1
    if n <= 1:
        return fn(*args)
    for b, a in zip(batched, args):
        if b and (a.ndim == 0 or a.shape[0] % n != 0):
            return fn(*args)
    from jax.sharding import PartitionSpec as PS

    in_specs = tuple(PS(axes) if b else PS() for b in batched)
    wrapped = jax.shard_map(fn, mesh=m, in_specs=in_specs,
                            out_specs=PS(axes), check_vma=False)
    return wrapped(*args)


def use_mesh(mesh: Mesh):
    """Context manager installing ``mesh`` as the ambient mesh so
    :func:`constrain` (bare-PartitionSpec sharding hints inside model
    code) activates. Wrap jit *calls* (or trace+execute) with this."""
    ctx = getattr(jax.sharding, "use_mesh", None)
    if ctx is None:  # pragma: no cover - older jax
        ctx = jax.set_mesh
    return ctx(mesh)


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """Shardings for a full TrainState: params/ema/opt-state follow the
    parameter layout (optimizer moments mirror their parameter); scalars
    replicated."""

    p_sh = params_shardings(state.params, mesh)

    def like_params(subtree):
        # optimizer states contain param-shaped moments plus scalars
        def pick(path, leaf):
            if hasattr(leaf, "shape") and leaf.ndim > 0:
                return NamedSharding(
                    mesh, _spec_for(_path_str(path), leaf.shape, mesh)
                )
            return replicated(mesh)

        return jax.tree_util.tree_map_with_path(pick, subtree)

    return type(state)(
        step=replicated(mesh),
        params=p_sh,
        ema_params=p_sh,
        opt_state=like_params(state.opt_state),
    )
