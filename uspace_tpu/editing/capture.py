"""Trajectory recording ("read" phase) — on-device activation capture.

The reference records u-space activations by np.save-ing the tap tensor
to ``{batch_id}_{t:.2f}.npy`` from *inside* the denoiser forward on every
ODE step (`/root/reference/libs/dissection.py:126-137`), then re-loading
the dump directory offline (`tools/utils_attr.py:160-207`). Here the
fixed-step solver scans the capture out as a ``[T, B, ...]`` device array
in the same compiled program that integrates the ODE — no filesystem in
the loop, and the full trajectory stays batched for direction building.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import flow, solvers
from ..train.step import make_velocity_fn

Array = jax.Array


def capture_trajectory(
    model,
    params,
    x: Array,
    *,
    cond: Optional[Dict[str, Any]] = None,
    taps: Tuple[str, ...] = ("mid",),
    direction: str = "encode",
    num_steps: int = 100,
    method: str = "euler",
) -> Tuple[Array, Dict[str, Array]]:
    """Integrate the ODE while recording activation taps.

    direction="encode": data -> noise (t: 1 -> 0), the reference's read
    protocol (dissect_lfm.py:209-236 uses CNF.encode with euler/0.01).
    direction="decode": noise -> data (t: 0 -> 1).

    Returns (final_state, {tap: [T, B, ...]}) plus the capture time grid
    under key "t" — grid times are the step *start* times, matching the
    reference's one-save-per-step naming.
    """
    b = x.shape[0]
    t0, t1 = (1.0, 0.0) if direction == "encode" else (0.0, 1.0)

    @jax.jit
    def run(params, x, cond):
        # params/cond as jit ARGUMENTS: a concrete closure would bake
        # the tree into the executable payload (fatal on remote-compile
        # backends at production sizes)
        vf_plain = make_velocity_fn(model, params, cond, capture=taps)

        def vf_scalar(t, x):
            v, tap_vals = vf_plain(jnp.full((b,), t, jnp.float32), x)
            tap_vals = dict(tap_vals)
            tap_vals["t"] = t
            return v, tap_vals

        return solvers.odeint_fixed(
            vf_scalar, x, t0, t1, num_steps, method=method, has_aux=True
        )

    return run(params, x, cond or {})


def captures_to_grid(stack: Array, ts: Array) -> Array:
    """Reorder a [T, ...] capture stack (in integration order) onto the
    ascending-time grid i*grid_dt used by :class:`USpaceEdit` /
    direction files. Encode trajectories run t: 1 -> 0 so they arrive
    reversed; this sorts by recorded time."""
    order = jnp.argsort(ts)
    return stack[order]
