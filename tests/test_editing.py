"""Editing toolkit tests: capture, direction building (attr/PCA),
injection semantics, schedules, attention editing helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uspace_tpu.editing import (
    USpaceEdit,
    attr_delta_directions,
    capture_trajectory,
    captures_to_grid,
    interp_grid,
    latentz_delta,
    local_prompt_rewrite,
    pca_directions,
    phrase_target_ids,
    schedule_gate,
    select_direction,
    slice_context_attention,
)
from uspace_tpu.editing.directions import orthogonality_error, pca_components
from uspace_tpu.models import UViT


class TestSchedules:
    def test_le_gate(self):
        assert float(schedule_gate(0.3, t_edit=0.5)) == 1.0
        assert float(schedule_gate(0.7, t_edit=0.5)) == 0.0
        # t=0 never edits (reference '0.00' skip, dissection.py:22-23)
        assert float(schedule_gate(0.0, t_edit=0.5)) == 0.0

    def test_every_gate(self):
        g = lambda t: float(schedule_gate(t, t_edit=1.0, mode="every",
                                          period=0.1, grid_dt=0.01))
        assert g(0.2) == 1.0
        assert g(0.25) == 0.0
        assert g(0.0) == 0.0

    def test_interp_grid_exact_and_lerp(self):
        grid = jnp.arange(11, dtype=jnp.float32)[:, None]  # value = index
        np.testing.assert_allclose(interp_grid(grid, 0.03, 0.01), 3.0)
        np.testing.assert_allclose(interp_grid(grid, 0.035, 0.01), 3.5)
        # clipped at the ends
        np.testing.assert_allclose(interp_grid(grid, 0.5, 0.01), 10.0)


class TestDirections:
    def test_attr_delta_exact(self, np_rng):
        # two clusters separated by a known offset in one attribute
        base = np_rng.normal(size=(50, 4)).astype(np.float32)
        attr = (np.arange(50) % 2).astype(np.int32)
        offset = np.array([1.0, -2.0, 0.5, 0.0], np.float32)
        feats = base + attr[:, None] * offset
        from uspace_tpu.editing.directions import attr_delta

        d = attr_delta(jnp.asarray(feats), jnp.asarray(attr))
        mean_diff = feats[attr == 1].mean(0) - feats[attr == 0].mean(0)
        np.testing.assert_allclose(d, mean_diff, rtol=1e-5, atol=1e-5)

    def test_attr_directions_shape(self, np_rng):
        feats = jnp.asarray(np_rng.normal(size=(20, 5, 2, 2)).astype(np.float32))
        attrs = jnp.asarray((np_rng.random((20, 3)) > 0.5).astype(np.int32))
        grid = attr_delta_directions(feats, attrs)
        assert grid.shape == (5, 3, 2, 2)
        lz = latentz_delta(feats[:, 0], attrs)
        assert lz.shape == (3, 2, 2)

    def test_pca_recovers_dominant_direction(self, np_rng):
        direction = np.array([3.0, 4.0, 0.0, 0.0], np.float32) / 5.0
        coeff = np_rng.normal(size=(200, 1)).astype(np.float32) * 5
        noise = np_rng.normal(size=(200, 4)).astype(np.float32) * 0.01
        feats = coeff * direction + noise
        comps, var = pca_components(jnp.asarray(feats), 2)
        c0 = np.asarray(comps[0])
        c0 = c0 / np.linalg.norm(c0)
        assert abs(abs(float(c0 @ direction)) - 1.0) < 1e-3
        assert float(var[0]) > 10 * float(var[1])
        assert orthogonality_error(comps) < 1e-4

    def test_pca_directions_per_timestep(self, np_rng):
        feats = jnp.asarray(np_rng.normal(size=(30, 4, 2, 3)).astype(np.float32))
        grid = pca_directions(feats, 2)
        assert grid.shape == (4, 2, 2, 3)

    def test_select_direction_multi_attr_average(self):
        grid = jnp.stack([jnp.full((3, 2), float(a)) for a in range(4)], axis=1)
        one = select_direction(grid, 2)
        np.testing.assert_allclose(one, 2.0)
        avg = select_direction(grid, "1_3")
        np.testing.assert_allclose(avg, 2.0)


class TestCapture:
    def test_capture_roundtrip_grid(self, rng):
        model = UViT(img_size=8, patch_size=2, in_chans=4, embed_dim=32,
                     depth=2, num_heads=4, attn_impl="xla")
        x = jax.random.normal(rng, (2, 8, 8, 4))
        params = model.init(rng, x, jnp.zeros((2,)))
        z, stacks = capture_trajectory(
            model, params, x, taps=("mid",), direction="encode", num_steps=10
        )
        assert z.shape == x.shape
        assert stacks["mid"].shape == (10, 2, 17, 32)  # 1+16 tokens
        assert stacks["t"].shape == (10,)
        # encode runs t: 1 -> 0; grid reorder sorts ascending
        ordered = captures_to_grid(stacks["mid"], stacks["t"])
        ts_sorted = np.sort(np.asarray(stacks["t"]))
        np.testing.assert_allclose(ts_sorted, np.asarray(stacks["t"])[::-1])
        np.testing.assert_allclose(ordered[0], stacks["mid"][-1])

    def test_write_read_consistency(self, rng):
        """Inject a delta built from captured activations: edit at scale 0
        is a no-op; nonzero scale shifts the mid activations."""
        model = UViT(img_size=8, patch_size=2, in_chans=4, embed_dim=32,
                     depth=2, num_heads=4, attn_impl="xla")
        x = jax.random.normal(rng, (4, 8, 8, 4))
        params = model.init(rng, x, jnp.zeros((4,)))
        _, stacks = capture_trajectory(model, params, x, taps=("mid",),
                                       direction="decode", num_steps=5)
        grid = captures_to_grid(stacks["mid"].mean(axis=1), stacks["t"])
        edit0 = USpaceEdit(delta_grid=grid, scale=jnp.float32(0.0),
                           grid_dt=0.2, loc="mid")
        v0, _ = model.apply(params, x, jnp.full((4,), 0.4), edit=edit0)
        v_plain, _ = model.apply(params, x, jnp.full((4,), 0.4))
        np.testing.assert_allclose(v0, v_plain, atol=1e-6)
        edit1 = edit0.replace(scale=jnp.float32(1.0))
        v1, _ = model.apply(params, x, jnp.full((4,), 0.4), edit=edit1)
        assert float(jnp.abs(v1 - v_plain).max()) > 1e-5


class TestAttnEditHelpers:
    def test_local_prompt_modes(self):
        caps = ["a cat on a mat", "a cat sleeping"]
        tk = {"token_dissect": "lp_replace", "lp_replace_from": "cat",
              "lp_replace_to": "dog"}
        assert local_prompt_rewrite(caps, tk) == [
            "a dog on a mat", "a dog sleeping"]
        tk = {"token_dissect": "lp_remove", "lp_to_remove": "on a mat"}
        assert local_prompt_rewrite(caps, tk)[0] == "a cat  "
        tk = {"token_dissect": "lp_add", "lp_to_add": "in snow"}
        assert local_prompt_rewrite(caps, tk)[1] == "a cat sleeping , in snow"
        assert local_prompt_rewrite(caps, {"token_dissect": None}) == caps

    def test_phrase_target_ids(self):
        class Tok:
            def encode(self, text):
                return [0] + [ord(c) for c in text.replace(" ", "")] + [1]

            def decode(self, items):
                return "".join(chr(i) for i in items)

        ids = phrase_target_ids(["ab cd", "cd ab"], "cd", Tok(),
                                max_targets=4)
        assert ids.shape == (2, 4)
        assert list(ids[0][:2]) == [3, 4]
        assert list(ids[1][:2]) == [1, 2]
        assert ids[0][2] == -1

    def test_phrase_target_ids_explicit(self):
        # "ids:..." form: explicit context-token indices, no tokenizer
        # (the p2p CLI path for non-CLIP contexts)
        ids = phrase_target_ids(["", ""], "ids:1,4", None, max_targets=4)
        assert ids.shape == (2, 4)
        assert list(ids[0]) == [1, 4, -1, -1]
        assert list(ids[1]) == [1, 4, -1, -1]

    def test_slice_context_attention(self):
        b, h = 2, 3
        n_img, n_ctx = 16, 5
        L = 1 + n_ctx + n_img
        probs = jnp.zeros((b, h, L, L)).at[:, :, -n_img:, 1:1 + n_ctx].set(0.25)
        sl = slice_context_attention(probs, n_img, n_ctx)
        assert sl.shape == (b, n_img, n_ctx)
        np.testing.assert_allclose(sl, 0.25)


class TestAdaptiveSolverEditing:
    def test_edit_inside_while_loop(self, rng):
        """USpaceEdit must work inside the adaptive (dopri5) solver: the
        reference needs host-side delta interpolation for this
        (interp_ode_unet); here interp_grid gathers on-device."""
        from uspace_tpu.core import flow

        model = UViT(img_size=8, patch_size=2, in_chans=4, embed_dim=32,
                     depth=2, num_heads=4, attn_impl="xla")
        x0 = jax.random.normal(rng, (2, 8, 8, 4))
        params = model.init(rng, x0, jnp.zeros((2,)))
        edit = USpaceEdit(delta_grid=jnp.ones((11, 8, 8, 4)),
                          scale=jnp.float32(0.3), grid_dt=0.1,
                          t_edit=0.5, loc="head")

        def vf(t, x, e=None):
            return model.apply(params, x, t, edit=e)[0]

        sk = {"solver": "adaptive", "solver_adaptive": "dopri5"}
        plain = flow.decode(lambda t, x: vf(t, x), x0, sk)
        edited = flow.decode(lambda t, x: vf(t, x, edit), x0, sk)
        assert float(jnp.abs(edited - plain).max()) > 1e-5
        # gated-off edit identical under the adaptive solver too
        off = edit.replace(t_edit=-1.0)
        same = flow.decode(lambda t, x: vf(t, x, off), x0, sk)
        np.testing.assert_allclose(same, plain, atol=1e-6)

    def test_fixadp_write_path(self, rng):
        """fixadp decode (fixed until t_edit, adaptive after) with an
        active edit — the reference's editing solver configuration."""
        from uspace_tpu.core import flow

        model = UViT(img_size=8, patch_size=2, in_chans=4, embed_dim=32,
                     depth=2, num_heads=4, attn_impl="xla")
        x0 = jax.random.normal(rng, (2, 8, 8, 4))
        params = model.init(rng, x0, jnp.zeros((2,)))
        edit = USpaceEdit(delta_grid=jnp.ones((11, 8, 8, 4)),
                          scale=jnp.float32(0.3), grid_dt=0.1,
                          t_edit=0.4, loc="mid",
                          )
        edit = edit.replace(delta_grid=jnp.ones((11, 17, 32)))
        sk = {"solver": "fixadp", "solver_fix": "euler",
              "solver_fix_step": 0.1, "solver_adaptive": "dopri5"}

        def vf(e):
            return lambda t, x: model.apply(params, x, t, edit=e)[0]

        out = flow.decode(vf(edit), x0, sk, t_edit=0.4)
        plain = flow.decode(vf(None), x0, sk, t_edit=0.4)
        assert out.shape == x0.shape
        assert float(jnp.abs(out - plain).max()) > 1e-6
