"""Edit specifications: tensor-valued replacements for dissection hooks.

The reference edits the denoiser mid-forward with filesystem side effects —
per-ODE-step ``np.save``/``np.load`` of activation deltas keyed by the
wall-clock timestep string (`/root/reference/libs/dissection.py:115-282`)
and in-place attention-map mutation (`tools/utils_t2i.py:196-296`). None of
that can live inside a compiled loop, and it serializes the hot path on
host IO.

Here an edit is a small pytree carried through ``lax.scan``:

- :class:`USpaceEdit` — "write" edits. A precomputed delta *grid* (one
  delta per grid timestep, already attribute-selected/averaged — the
  equivalent of ``delta_{t:.2f}.npy`` / ``pca{n}_{t:.2f}.npy`` files) is
  gathered + linearly interpolated at the current ODE time entirely
  on-device (covers the adaptive-solver interpolation of
  ``interp_ode_unet``, dissection.py:73-112), gated by the ``should_edit``
  schedule (dissection.py:21-34), scaled, and added to the activation at
  the head/mid/tail tap.
- :class:`AttnEdit` — prompt-to-prompt column rescale for T2I attention.
  Holds a per-(example, key-token) multiplier; the attention op folds it
  exactly into V (see ``ops/attention.py``), gated by ``t <= t_edit`` and
  per-block selection (`tools/utils_t2i.py:227-238,285-288`).

"Read" (activation capture) needs no spec: models return activation taps
as auxiliary outputs, which fixed-step solvers stack across ODE steps.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


def interp_grid(grid: Array, t: Array, grid_dt: float,
                grid_t0: float = 0.0) -> Array:
    """Linearly interpolate a per-timestep grid ``[n, ...]`` at time ``t``.

    grid[i] is the delta recorded at t = grid_t0 + i * grid_dt (encode-
    phase captures start at t = dt, not 0). On-grid times return the
    exact entry; off-grid times (adaptive solvers) lerp between
    neighbors — the on-device equivalent of ``interp_ode_unet``
    (dissection.py:73-112).
    """
    n = grid.shape[0]
    pos = jnp.clip((t - grid_t0) / grid_dt, 0.0, n - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    w = (pos - lo.astype(pos.dtype)).astype(grid.dtype)
    return (1.0 - w) * grid[lo] + w * grid[hi]


def schedule_gate(
    t: Array, t_edit: float, mode: str = "le", period: float = 0.1,
    grid_dt: float = 0.01,
) -> Array:
    """0/1 gate reproducing ``should_edit`` (dissection.py:21-34).

    - mode="le":    edit when t <= t_edit (and t != 0, the reference's
                    '0.00' skip).
    - mode="every": edit when t is a multiple of ``period`` (reference
                    "every_X" schedules), to within half a grid step.
    """
    t32 = jnp.asarray(t, jnp.float32)
    nonzero = t32 > 0.5 * grid_dt
    if mode == "le":
        g = (t32 <= t_edit + 1e-6) & nonzero
    elif mode == "every":
        r = jnp.abs(t32 / period - jnp.round(t32 / period))
        g = (r * period < 0.5 * grid_dt) & nonzero
    else:
        raise ValueError(f"unknown schedule mode {mode!r}")
    return g.astype(jnp.float32)


@struct.dataclass
class USpaceEdit:
    """u-space "write" edit: ``x <- x + gate(t) * scale * delta(t)``.

    Covers the reference's write_attr / write_pca / write_x0 modes
    (dissection.py:138-180) — the delta grid is whatever direction builder
    produced it (attribute delta, PCA component, or zeros for write_x0).
    """

    delta_grid: Array  # [n_grid, ...] one delta per grid time (no batch dim)
    scale: Array  # scalar write_scale (traced: scale sweeps vmap over it)
    grid_dt: float = struct.field(pytree_node=False, default=0.01)
    grid_t0: float = struct.field(pytree_node=False, default=0.0)
    t_edit: float = struct.field(pytree_node=False, default=1.0)
    gate_mode: str = struct.field(pytree_node=False, default="le")
    gate_period: float = struct.field(pytree_node=False, default=0.1)
    loc: str = struct.field(pytree_node=False, default="mid")  # head|mid|tail

    def apply(self, x: Array, t: Array) -> Array:
        """Apply at a tap point. ``x`` is [B, ...]; ``t`` a scalar time."""
        delta = interp_grid(self.delta_grid, t, self.grid_dt, self.grid_t0)
        gate = schedule_gate(
            t, self.t_edit, self.gate_mode, self.gate_period, self.grid_dt
        )
        return x + (gate * self.scale).astype(x.dtype) * delta[None].astype(x.dtype)


@struct.dataclass
class AttnEdit:
    """Prompt-to-prompt attention rescale (T2I).

    ``col_mult`` multiplies post-softmax attention columns of target
    context tokens (`tools/utils_t2i.py:209-222`; token layout [1 time,
    77 context, 256 image], target ids pre-offset by the time token).
    Applied only while decoding (the caller simply omits the edit during
    encode — `utils_t2i.py:276-278`) and when ``t <= t_edit``.
    """

    col_mult: Array  # [B, L] per-key multiplier (1.0 = untouched)
    t_edit: float = struct.field(pytree_node=False, default=1.0)
    # which attention blocks to edit; None = all (utils_t2i.py:227-238)
    block_ids: Optional[Tuple[int, ...]] = struct.field(
        pytree_node=False, default=None
    )

    def effective_mult(self, t: Array, block_id: int) -> Optional[Array]:
        """[B, L] multiplier for this block at time t, or None if inactive."""
        if self.block_ids is not None and block_id not in self.block_ids:
            return None
        gate = (jnp.asarray(t, jnp.float32) <= self.t_edit + 1e-6).astype(
            self.col_mult.dtype
        )
        return 1.0 + gate * (self.col_mult - 1.0)


def p2p_col_mult(
    batch: int,
    seq_len: int,
    target_ids: Array,
    multiplier,
    time_tokens: int = 1,
) -> Array:
    """Build the [B, L] column multiplier for p2p rescale.

    ``target_ids``: [B, max_targets] int32 context-token indices (pad with
    -1); indices are context-relative and get offset by the time token(s),
    matching ``_target_ids + TIME_TOKEN_NUM`` (utils_t2i.py:213).
    ``multiplier``: scalar or [B] per-example multiplier list.
    """
    mult = jnp.broadcast_to(jnp.asarray(multiplier, jnp.float32), (batch,))
    cols = jnp.ones((batch, seq_len), jnp.float32)
    ids = jnp.asarray(target_ids, jnp.int32)
    valid = ids >= 0
    # padding (-1) maps OUT OF RANGE so mode="drop" discards it — mapping
    # it to column 0 would collide with a real target when time_tokens=0
    # (duplicate-index .set order is undefined in XLA)
    ids_off = jnp.where(valid, ids + time_tokens, seq_len)
    b_idx = jnp.arange(batch)[:, None].repeat(ids.shape[1], axis=1)
    cols = cols.at[b_idx.reshape(-1), ids_off.reshape(-1)].set(
        jnp.broadcast_to(mult[:, None], ids.shape).reshape(-1), mode="drop"
    )
    return cols
