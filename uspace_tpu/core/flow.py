"""Continuous-normalizing-flow driver: training loss, decode, encode.

TPU-native counterpart of the reference ``CNF`` wrapper
(`/root/reference/flow_matching.py:15-180`). Functional rather than a
module: the caller supplies a velocity closure ``vf(t, x) -> dx/dt``
(conditioning and params closed over) and everything compiles under jit.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from . import interpolant, solvers

Array = jax.Array


def training_loss(
    velocity_fn: Callable[[Array, Array], Array],
    rng: Array,
    x1: Array,
    sigma_min: float,
) -> Array:
    """Per-sample OT-CFM loss (reference ``CNF.training_losses``,
    flow_matching.py:88-100). ``velocity_fn(t[B], x_t) -> v``."""
    t, x_t, u_t = interpolant.sample_path(rng, x1, sigma_min)
    v = velocity_fn(t, x_t)
    return interpolant.cfm_loss(v, u_t)


def _scalar_to_batch_vf(velocity_fn: Callable, batch: int) -> Callable:
    """Adapt a per-sample-timestep model to the scalar-t ODE interface
    (reference CNF.forward expands scalar t, flow_matching.py:30-33).
    Extra positional args (the ``vf_params`` calling convention) pass
    through untouched."""

    def vf(t, x, *args):
        return velocity_fn(jnp.full((batch,), t, dtype=jnp.float32), x,
                           *args)

    return vf


def decode(
    velocity_fn: Callable,
    z: Array,
    solver_kwargs: Optional[dict] = None,
    t_edit: Optional[float] = None,
    has_aux: bool = False,
    vf_params: Any = None,
) -> Any:
    """Integrate noise->data, t: 0 -> 1 (reference CNF.decode,
    flow_matching.py:130-151; fixadp split at ``t_edit``).

    ``vf_params``: optional parameter pytree threaded to the field as an
    explicit argument (``velocity_fn(t_batch, x, vf_params)``). Required
    for host-driven adaptive solves at production model sizes — closure
    capture bakes the tree into the compiled step programs (see
    solvers.odeint_adaptive_host)."""
    vf = _scalar_to_batch_vf(velocity_fn, z.shape[0])
    return solvers.odeint(
        vf, z, 0.0, 1.0, solver_kwargs=solver_kwargs, t_mid=t_edit,
        has_aux=has_aux, vf_params=vf_params,
    )


def encode(
    velocity_fn: Callable,
    x: Array,
    solver_kwargs: Optional[dict] = None,
    has_aux: bool = False,
    vf_params: Any = None,
) -> Any:
    """Exact inversion data->noise, t: 1 -> 0, always fixed-step
    (reference CNF.encode, flow_matching.py:102-125). ``vf_params``:
    see :func:`decode`."""
    sk = dict(solver_kwargs or {})
    sk["solver"] = "fixed"
    sk.setdefault("solver_fix", "euler")
    sk.setdefault("solver_fix_step", 0.01)
    vf = _scalar_to_batch_vf(velocity_fn, x.shape[0])
    return solvers.odeint(vf, x, 1.0, 0.0, solver_kwargs=sk,
                          has_aux=has_aux, vf_params=vf_params)
