"""Dissection drivers: the read / direction-build / write / roundtrip flows.

High-level orchestration equivalent to the reference's dissect entry
points (`/root/reference/dissect_lfm.py`, `dissect_lfm_t2i.py`,
`tools/utils_vis.py`), re-designed around in-memory capture grids instead
of .npy dump directories (the on-disk .npz artifacts remain, but they are
written once per phase, not once per ODE step).

Flows:
- read:        real latents -> exact inversion with activation capture ->
               (latents, attrs, activation grid) saved as one .npz
               (reference dissect_lfm.py:209-236 + utils_vis.py:370-417).
- directions:  attr deltas / per-timestep PCA over the read artifact
               (reference tools/utils_attr.py / utils_pca.py __main__s).
- write sweep: decode with a USpaceEdit over write_scales from shared
               noise -> [S, B, ...] latents -> optional VAE decode ->
               scale-sweep grid (reference sample_for_hspace_vis,
               utils_vis.py:138-257).
- roundtrip:   encode->decode reconstruction error (vis_reversible /
               cal_delta_change, dissect_lfm.py:162-207,
               tools/utils_interp.py:5-17).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from ..core import flow
from ..train.step import make_velocity_fn, sample_from_moments
from .capture import capture_trajectory, captures_to_grid
from .directions import attr_delta_directions, pca_directions
from .specs import AttnEdit, USpaceEdit

Array = jax.Array


class DissectSession:
    """Frozen eval stack: denoiser params + optional VAE, with the
    encode/decode/capture primitives the flows compose."""

    def __init__(self, model, params, vae_decode: Optional[Callable] = None,
                 vae_sample: Optional[Callable] = None,
                 solver_kwargs: Optional[dict] = None):
        self.model = model
        self.params = params
        self.vae_decode = vae_decode
        self.vae_sample = vae_sample
        self.solver_kwargs = dict(
            solver_kwargs
            or {"solver": "fixed", "solver_fix": "euler",
                "solver_fix_step": 0.01}
        )
        self._jit_cache: Dict[Any, Callable] = {}

    # -- primitives ----------------------------------------------------------

    def _vf(self, cond: Optional[Dict] = None, **kw):
        return make_velocity_fn(self.model, self.params, cond or {}, **kw)

    def _cached(self, key, builder):
        """One jitted program per call structure, with params/operands
        as explicit ARGUMENTS (a concrete params closure would bake the
        tree into the executable payload and re-trace per call)."""
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jit_cache[key] = jax.jit(builder)
        return fn

    def encode(self, x: Array, cond: Optional[Dict] = None,
               attn_edit: Optional[AttnEdit] = None) -> Array:
        """Exact inversion x -> z (never applies attention edits: the
        reference disables editing in the encode direction,
        utils_t2i.py:276-278)."""

        def go(params, x, cond):
            vf = make_velocity_fn(self.model, params, cond)
            return flow.encode(vf, x, self.solver_kwargs)

        return self._cached("encode", go)(self.params, x, cond or {})

    def decode(self, z: Array, cond: Optional[Dict] = None,
               edit: Optional[USpaceEdit] = None,
               attn_edit: Optional[AttnEdit] = None,
               t_edit: Optional[float] = None) -> Array:
        has_e, has_a = edit is not None, attn_edit is not None

        def go(params, z, cond, edit, attn_edit):
            kw = {}
            if has_e:
                kw["edit"] = edit
            if has_a:
                kw["attn_edit"] = attn_edit
            vf = make_velocity_fn(self.model, params, cond, **kw)
            return flow.decode(vf, z, self.solver_kwargs, t_edit=t_edit)

        fn = self._cached(("decode", has_e, has_a, t_edit), go)
        return fn(self.params, z, {} if cond is None else cond, edit,
                  attn_edit)

    # -- read phase -----------------------------------------------------------

    def num_grid_steps(self) -> int:
        step = self.solver_kwargs.get("solver_fix_step", 0.01)
        return max(1, round(1.0 / step))

    def read(
        self,
        batches,
        tap: str = "mid",
        from_moments: bool = True,
        rng: Optional[Array] = None,
        max_samples: Optional[int] = None,
    ) -> Dict[str, np.ndarray]:
        """Encode real data while capturing ``tap`` activations.

        ``batches``: iterable of dicts with 'x' (moments or latents) and
        optional 'attr'/'y'/'context'. Returns {'latent': [N, ...],
        'attr': [N, A]?, 'feats': [N, T, ...], 't_grid': [T]}.
        """
        rng = jax.random.PRNGKey(0) if rng is None else rng
        lat, attrs, feats = [], [], []
        t_grid = None
        n_seen = 0
        for i, batch in enumerate(batches):
            x = jnp.asarray(batch["x"])
            if from_moments:
                if self.vae_sample is not None:
                    x = self.vae_sample(x, jax.random.fold_in(rng, i))
                else:
                    x = sample_from_moments(x, jax.random.fold_in(rng, i))
            cond = {k: jnp.asarray(batch[k]) for k in ("y", "context")
                    if k in batch}
            z, stacks = capture_trajectory(
                self.model, self.params, x, cond=cond, taps=(tap,),
                direction="encode", num_steps=self.num_grid_steps(),
                method=self.solver_kwargs.get("solver_fix", "euler"),
            )
            grid = captures_to_grid(stacks[tap], stacks["t"])
            if t_grid is None:
                t_grid = np.sort(np.asarray(stacks["t"]))
            lat.append(np.asarray(z))
            feats.append(np.asarray(grid).swapaxes(0, 1))  # [B, T, ...]
            if "attr" in batch:
                attrs.append(np.asarray(batch["attr"]))
            n_seen += x.shape[0]
            if max_samples and n_seen >= max_samples:
                break
        # f32 on the way out: np.save round-trips ml_dtypes bfloat16 as
        # raw void ("|V2"), which nothing can load back — a bf16 compute
        # model must not poison the read artifact
        out = {
            "latent": np.concatenate(lat).astype(np.float32),
            "feats": np.concatenate(feats).astype(np.float32),
            "t_grid": np.asarray(t_grid, np.float32),
        }
        if attrs:
            out["attr"] = np.concatenate(attrs)
        return out

    # -- write phase ----------------------------------------------------------

    def write_sweep(
        self,
        delta_grid: Array,
        write_scales: Sequence[float],
        n_samples: int,
        *,
        loc: str = "mid",
        t_edit: float = 1.0,
        gate_mode: str = "le",
        gate_period: float = 0.1,
        grid_dt: Optional[float] = None,
        grid_t0: float = 0.0,
        cond: Optional[Dict] = None,
        fixed_z: Optional[Array] = None,
        rng: Optional[Array] = None,
        z_shape: Tuple[int, ...] = (32, 32, 4),
    ) -> Array:
        """Decode the same noise under each write scale ->
        [S, B, ...latents] (reference sample_for_hspace_vis,
        utils_vis.py:138-257). One compiled program reused across scales
        (scale is a traced scalar).

        ``grid_dt`` is the DELTA GRID's time spacing (from the read
        artifact's ``t_grid``) — always pass it when the grid came from
        a different session. The fallback (this session's
        solver_fix_step) is only correct when the same fixed-step
        session produced the read; a pure-adaptive session has NO
        sensible default — it raises rather than silently remapping the
        forcing onto the wrong times (the r4 editing_e2e FAIL was
        exactly this: the 0.01 default compressed a 0.02-spaced grid to
        delta(2t); experiments/adaptive_write_bug_repro.py)."""
        rng = jax.random.PRNGKey(0) if rng is None else rng
        if fixed_z is not None:
            z = jnp.asarray(fixed_z)[:n_samples]
        else:
            z = jax.random.normal(rng, (n_samples, *z_shape))
        gd = grid_dt or self.solver_kwargs.get("solver_fix_step")
        if gd is None:
            raise ValueError(
                "write_sweep needs grid_dt: this session has no "
                "solver_fix_step to infer it from (adaptive solver), and "
                "a wrong spacing silently rescales the edit forcing in "
                "time. Pass the read artifact's t_grid spacing.")
        edit0 = USpaceEdit(
            delta_grid=jnp.asarray(delta_grid), scale=jnp.float32(0.0),
            grid_dt=gd, grid_t0=grid_t0, t_edit=t_edit,
            gate_mode=gate_mode, gate_period=gate_period, loc=loc,
        )

        @jax.jit
        def one_scale(params, scale):
            # params as an explicit argument: closure capture would bake
            # the tree into the executable (compile-payload bloat; fatal
            # on remote-compile backends at production model sizes)
            e = edit0.replace(scale=scale)
            vf = make_velocity_fn(self.model, params, cond or {}, edit=e)
            # t_edit doubles as the fixadp split point (the reference's
            # interp_ode/interp_ode_unet composition: fixed steps while
            # the edit is active, adaptive after — flow_matching.py:
            # 153-180); fixed/adaptive solvers ignore it
            return flow.decode(vf, z, self.solver_kwargs, t_edit=t_edit)

        outs = [one_scale(self.params, jnp.float32(s))
                for s in write_scales]
        return jnp.stack(outs)

    # -- correctness probes ---------------------------------------------------

    def roundtrip_error(self, x: Array, cond: Optional[Dict] = None
                        ) -> Dict[str, float]:
        """encode -> decode reconstruction error (the reference's
        vis_reversible / cal_delta_change quality probe)."""
        z = self.encode(x, cond)
        rec = self.decode(z, cond)
        err = jnp.abs(rec - x)
        rel = jnp.linalg.norm((rec - x).reshape(x.shape[0], -1), axis=1) / (
            jnp.linalg.norm(x.reshape(x.shape[0], -1), axis=1) + 1e-12
        )
        return {
            "abs_max": float(err.max()),
            "abs_mean": float(err.mean()),
            "rel_mean": float(rel.mean()),
        }


def build_directions_npz(
    read_npz: str,
    out_path: str,
    mode: str = "attr",
    pca_n: int = 50,
) -> str:
    """Offline direction building over a read artifact
    (reference tools/utils_attr.py:210-253 / utils_pca.py __main__)."""
    data = np.load(read_npz)
    feats = jnp.asarray(data["feats"])  # [N, T, ...]
    if mode == "attr":
        if "attr" not in data:
            raise ValueError(f"{read_npz} has no attrs; read with a "
                             "conditional dataset")
        grid = attr_delta_directions(feats, jnp.asarray(data["attr"]))
    elif mode == "pca":
        grid = pca_directions(feats, pca_n)
    else:
        raise ValueError(mode)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, directions=np.asarray(grid), t_grid=data["t_grid"],
             mode=mode)
    logging.info("directions (%s) %s -> %s", mode, grid.shape, out_path)
    return out_path
