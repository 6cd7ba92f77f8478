"""Conditional flow matching (OT-CFM) interpolant algebra.

The reference defines the rectified/OT conditional path (see
`/root/reference/flow_matching.py:88-100`):

    t ~ U[0, 1]                       (per sample)
    x_t = t * x1 + (1 - (1 - sigma_min) * t) * eps,   eps ~ N(0, I)
    u_t = x1 - (1 - sigma_min) * eps                  (target velocity)
    loss = mean_{CHW} (v_theta(x_t, t) - u_t)^2       (per-sample)

Sampling integrates dx/dt = v_theta(x, t) from t=0 (noise) to t=1 (data);
encoding (exact inversion) integrates from t=1 to t=0.

Everything here is pure and shape-polymorphic: ``x`` may be ``[B, H, W, C]``
(NHWC latents — TPU-native layout) or any ``[B, ...]`` array.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _expand_t(t: Array, x: Array) -> Array:
    """Broadcast per-sample t [B] against x [B, ...]."""
    return t.reshape(t.shape + (1,) * (x.ndim - t.ndim))


def interpolate(x1: Array, eps: Array, t: Array, sigma_min: float) -> Array:
    """x_t on the OT-CFM path between noise ``eps`` (t=0) and data ``x1`` (t=1)."""
    t_ = _expand_t(t, x1)
    return t_ * x1 + (1.0 - (1.0 - sigma_min) * t_) * eps


def target_velocity(x1: Array, eps: Array, sigma_min: float) -> Array:
    """Conditional target velocity u_t = x1 - (1 - sigma_min) * eps (t-independent)."""
    return x1 - (1.0 - sigma_min) * eps


def sample_path(
    rng: Array, x1: Array, sigma_min: float
) -> Tuple[Array, Array, Array]:
    """Draw (t, x_t, u_t) for a batch of data samples x1.

    Returns per-sample ``t`` [B], noisy point ``x_t`` and target velocity
    ``u_t`` with the same shape as ``x1``.
    """
    rng_t, rng_eps = jax.random.split(rng)
    b = x1.shape[0]
    t = jax.random.uniform(rng_t, (b,), dtype=x1.dtype)
    eps = jax.random.normal(rng_eps, x1.shape, dtype=x1.dtype)
    x_t = interpolate(x1, eps, t, sigma_min)
    u_t = target_velocity(x1, eps, sigma_min)
    return t, x_t, u_t


def cfm_loss(pred_velocity: Array, u_t: Array) -> Array:
    """Per-sample MSE over all non-batch axes (matches reference
    ``.square().mean(dim=(1, 2, 3))``)."""
    d = (pred_velocity.astype(jnp.float32) - u_t.astype(jnp.float32)) ** 2
    return d.mean(axis=tuple(range(1, d.ndim)))
