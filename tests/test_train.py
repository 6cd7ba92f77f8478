"""Training-step tests: optimization sanity, EMA, moments sampling, and
multi-device sharding (dp/fsdp/tp over the 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uspace_tpu.models import UViT
from uspace_tpu.parallel import mesh as meshlib
from uspace_tpu.train.state import TrainState, ema_update, get_lr_schedule, get_optimizer
from uspace_tpu.train.step import make_sample_fn, make_train_step, sample_from_moments


def _setup(num_classes=-1, **kw):
    model = UViT(img_size=8, patch_size=2, in_chans=4, embed_dim=32, depth=2,
                 num_heads=4, num_classes=num_classes, attn_impl="xla", **kw)
    x = jnp.ones((4, 8, 8, 4))
    t = jnp.zeros((4,))
    args = (x, t) if num_classes <= 0 else (x, t, jnp.zeros((4,), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), *args)
    lr = get_lr_schedule("customized", 1e-3, warmup_steps=5)
    tx = get_optimizer("adam", lr, weight_decay=0.0)
    state = TrainState.create(params, tx)
    return model, tx, state, lr


class TestTrainStep:
    def test_loss_decreases_overfit(self, rng):
        model, tx, state, lr = _setup()
        step = jax.jit(make_train_step(model, tx, lr_schedule=lr))
        batch = {"x": jax.random.normal(rng, (4, 8, 8, 4))}
        losses = []
        for _ in range(30):
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses[:3] + losses[-3:]
        assert int(state.step) == 30
        assert np.isfinite(losses).all()

    def test_warmup_lr(self):
        lr = get_lr_schedule("customized", 1e-3, warmup_steps=10)
        assert float(lr(0)) == 0.0
        np.testing.assert_allclose(float(lr(5)), 5e-4)
        np.testing.assert_allclose(float(lr(100)), 1e-3)

    def test_ema_moves_toward_params(self):
        p = {"w": jnp.ones((3,))}
        e = {"w": jnp.zeros((3,))}
        out = ema_update(p, e, rate=0.9)
        np.testing.assert_allclose(out["w"], 0.1)

    def test_class_conditional_step(self, rng):
        model, tx, state, lr = _setup(num_classes=5)
        step = jax.jit(make_train_step(model, tx))
        batch = {"x": jnp.ones((4, 8, 8, 4)), "y": jnp.array([0, 1, 2, 3])}
        state, m = step(state, batch, rng)
        assert np.isfinite(float(m["loss"]))

    def test_moments_resampling(self, rng):
        mean = jnp.ones((2, 4, 4, 4))
        logvar = jnp.full((2, 4, 4, 4), -30.0)  # ~zero std
        moments = jnp.concatenate([mean, logvar], axis=-1)
        z = sample_from_moments(moments, rng, scale_factor=0.5)
        np.testing.assert_allclose(z, 0.5, atol=1e-4)
        # nonzero variance -> different draws
        moments = jnp.concatenate([mean, jnp.zeros_like(logvar)], axis=-1)
        z1 = sample_from_moments(moments, jax.random.PRNGKey(1))
        z2 = sample_from_moments(moments, jax.random.PRNGKey(2))
        assert float(jnp.abs(z1 - z2).max()) > 1e-3

    def test_nonfinite_batch_is_skipped(self, rng):
        """Failure detection: a NaN batch must not touch params/EMA/opt
        state (the update is skipped, the step counter advances, the
        metric flags it) and training continues on the next good batch."""
        model, tx, state, lr = _setup()
        step = jax.jit(make_train_step(model, tx, lr_schedule=lr))
        good = {"x": jax.random.normal(rng, (4, 8, 8, 4))}
        state, m = step(state, good, rng)
        assert float(m["nonfinite_skip"]) == 0.0
        before = jax.tree.leaves(state.params)

        bad = {"x": good["x"].at[0, 0, 0, 0].set(jnp.nan)}
        state, m = step(state, bad, rng)
        assert float(m["nonfinite_skip"]) == 1.0
        assert not np.isfinite(float(m["loss"]))
        after = jax.tree.leaves(state.params)
        for a, b in zip(before, after):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        assert int(state.step) == 2  # counter advanced past the bad batch

        state, m = step(state, good, rng)  # recovery: finite update
        assert float(m["nonfinite_skip"]) == 0.0
        assert np.isfinite(float(m["loss"]))
        assert not np.array_equal(np.asarray(jax.tree.leaves(state.params)[0]),
                                  np.asarray(before[0]))

    def test_sample_fn_shapes(self, rng):
        model, tx, state, lr = _setup()
        sample_fn = make_sample_fn(model, (8, 8, 4), sample_steps=5)
        out = sample_fn(state.ema_params, rng, 2)
        assert out.shape == (2, 8, 8, 4)
        assert np.isfinite(np.asarray(out)).all()


class TestFusedAdam:
    """The fused single-pass Adam+EMA update (train/step._fused_adam_ema)
    must match the optax chain it replaces AND torch.optim.Adam (the
    reference's optimizer, `tools/utils_uvit.py:50-78`) step for step."""

    def test_fused_matches_chain_and_torch(self):
        import optax
        import torch

        from uspace_tpu.train.state import FusedAdam
        from uspace_tpu.train.step import _fused_adam_ema

        rng = jax.random.PRNGKey(3)
        params = {"a": jax.random.normal(rng, (16, 8)),
                  "b": jnp.ones((8,)) * 0.5}
        lr = get_lr_schedule("customized", 1e-2, warmup_steps=3)
        tx = get_optimizer("adam", lr, betas=(0.9, 0.99), weight_decay=0.03)
        assert isinstance(tx, FusedAdam)
        state_f = TrainState.create(params, tx)
        state_c = TrainState.create(params, tx)

        tparams = {k: torch.tensor(np.asarray(v), requires_grad=True)
                   for k, v in params.items()}
        topt = torch.optim.Adam(tparams.values(), lr=1.0, betas=(0.9, 0.99),
                                eps=1e-8, weight_decay=0.03)

        for i in range(5):
            g = {k: jax.random.normal(jax.random.fold_in(rng, 10 * i + j),
                                      v.shape) * 0.1
                 for j, (k, v) in enumerate(params.items())}
            # fused single-pass path
            p_f, e_f, os_f = _fused_adam_ema(tx, state_f, g, ema_rate=0.9)
            state_f = state_f.replace(step=state_f.step + 1, params=p_f,
                                      ema_params=e_f, opt_state=os_f)
            # plain optax chain + apply + ema
            upd, os_c = tx.update(g, state_c.opt_state, state_c.params)
            p_c = optax.apply_updates(state_c.params, upd)
            e_c = ema_update(p_c, state_c.ema_params, 0.9)
            state_c = state_c.replace(step=state_c.step + 1, params=p_c,
                                      ema_params=e_c, opt_state=os_c)
            # torch Adam (schedule applied as per-step lr)
            for k, tp in tparams.items():
                tp.grad = torch.tensor(np.asarray(g[k]))
            for group in topt.param_groups:
                group["lr"] = float(lr(i))
            topt.step()

        for k in params:
            np.testing.assert_allclose(
                np.asarray(state_f.params[k]), np.asarray(state_c.params[k]),
                rtol=1e-5, atol=1e-7, err_msg=f"fused vs chain: {k}")
            np.testing.assert_allclose(
                np.asarray(state_f.params[k]),
                tparams[k].detach().numpy(),
                rtol=1e-5, atol=1e-6, err_msg=f"fused vs torch: {k}")
            np.testing.assert_allclose(
                np.asarray(state_f.ema_params[k]),
                np.asarray(state_c.ema_params[k]),
                rtol=1e-5, atol=1e-7, err_msg=f"ema: {k}")
        # opt_state structure and moments identical (checkpoint compat)
        assert jax.tree.structure(state_f.opt_state) == \
            jax.tree.structure(state_c.opt_state)
        for a, b in zip(jax.tree.leaves(state_f.opt_state),
                        jax.tree.leaves(state_c.opt_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_fused_adamw_matches_chain(self):
        import optax

        from uspace_tpu.train.state import FusedAdam
        from uspace_tpu.train.step import _fused_adam_ema

        rng = jax.random.PRNGKey(4)
        params = {"w": jax.random.normal(rng, (8, 8))}
        lr = get_lr_schedule("customized", 5e-3, warmup_steps=0)
        tx = get_optimizer("adamw", lr, betas=(0.9, 0.999),
                           weight_decay=0.1)
        assert isinstance(tx, FusedAdam)
        state_f = TrainState.create(params, tx)
        state_c = TrainState.create(params, tx)
        for i in range(4):
            g = {"w": jax.random.normal(jax.random.fold_in(rng, i),
                                        (8, 8)) * 0.2}
            p_f, e_f, os_f = _fused_adam_ema(tx, state_f, g, ema_rate=0.99)
            state_f = state_f.replace(step=state_f.step + 1, params=p_f,
                                      ema_params=e_f, opt_state=os_f)
            upd, os_c = tx.update(g, state_c.opt_state, state_c.params)
            p_c = optax.apply_updates(state_c.params, upd)
            e_c = ema_update(p_c, state_c.ema_params, 0.99)
            state_c = state_c.replace(step=state_c.step + 1, params=p_c,
                                      ema_params=e_c, opt_state=os_c)
        np.testing.assert_allclose(np.asarray(state_f.params["w"]),
                                   np.asarray(state_c.params["w"]),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(state_f.ema_params["w"]),
                                   np.asarray(state_c.ema_params["w"]),
                                   rtol=1e-5, atol=1e-7)

    def test_grad_clip_falls_back_to_chain(self):
        from uspace_tpu.train.state import FusedAdam

        lr = get_lr_schedule("customized", 1e-3)
        tx = get_optimizer("adam", lr, grad_clip=1.0)
        assert not isinstance(tx, FusedAdam)


class TestMeshSharding:
    def test_mesh_axes(self):
        m = meshlib.create_mesh(dp=2, fsdp=2, tp=2)
        assert m.axis_names == ("dp", "fsdp", "tp")
        assert m.devices.shape == (2, 2, 2)

    def test_tp_param_layout(self):
        model, tx, state, lr = _setup()
        m = meshlib.create_mesh(dp=2, fsdp=1, tp=4)
        sh = meshlib.params_shardings(state.params, m)
        flat = jax.tree_util.tree_flatten_with_path(sh)[0]
        by_path = {"/".join(str(getattr(k, "key", k)) for k in kp): v
                   for kp, v in flat}
        qkv = [v for p, v in by_path.items() if p.endswith("qkv/kernel")]
        assert qkv and all(v.spec == jax.sharding.PartitionSpec(None, "tp")
                           for v in qkv)
        proj = [v for p, v in by_path.items() if p.endswith("attn/proj/kernel")]
        assert proj and all(v.spec == jax.sharding.PartitionSpec("tp", None)
                            for v in proj)

    def test_sharded_train_step_matches_single_device(self, rng):
        """dp=2 x fsdp=2 x tp=2 sharded step must produce the same loss and
        (numerically close) parameters as the unsharded step."""
        model, tx, state, lr = _setup()
        batch = {"x": jax.random.normal(rng, (8, 8, 8, 4))}
        step_fn = make_train_step(model, tx)

        # single device
        s1, m1 = jax.jit(step_fn)(state, batch, rng)

        # sharded
        mesh = meshlib.create_mesh(dp=2, fsdp=2, tp=2)
        st_sh = meshlib.state_shardings(state, mesh)
        b_sh = {"x": meshlib.batch_sharding(mesh)}
        state_p = jax.device_put(state, st_sh)
        batch_p = jax.device_put(batch, b_sh)
        step_sharded = jax.jit(
            step_fn,
            in_shardings=(st_sh, b_sh, meshlib.replicated(mesh)),
            out_shardings=(st_sh, meshlib.replicated(mesh)),
        )
        s2, m2 = step_sharded(state_p, batch_p, jax.device_put(rng, meshlib.replicated(mesh)))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        l1 = jax.tree.leaves(s1.params)
        l2 = jax.tree.leaves(s2.params)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestShardMapKernels:
    """parallel.mesh.shard_batch_call: the Pallas kernels' scale-out path
    (engaged only under an ambient mesh) must match the mesh-less result
    exactly and fall back cleanly when the batch does not divide."""

    def _packed_case(self, rng, b):
        from uspace_tpu.ops.attention import fused_qkv_attention

        qkv = jax.random.normal(rng, (b, 17, 3 * 4 * 16)) * 0.3
        return qkv, lambda q: fused_qkv_attention(q, 4)

    def test_packed_kernel_matches_under_mesh(self, rng):
        qkv, fn = self._packed_case(rng, 8)
        ref = fn(qkv)
        mesh = meshlib.create_mesh(dp=2, fsdp=2, tp=2)
        with meshlib.use_mesh(mesh):
            out = jax.jit(fn)(qkv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_non_divisible_batch_falls_back(self, rng):
        qkv, fn = self._packed_case(rng, 3)  # 3 % 4 != 0
        ref = fn(qkv)
        mesh = meshlib.create_mesh(dp=2, fsdp=2, tp=2)
        with meshlib.use_mesh(mesh):
            out = jax.jit(fn)(qkv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_mlp_kernel_matches_under_mesh(self, rng):
        from uspace_tpu.ops.mlp import fused_mlp

        x = jax.random.normal(rng, (8, 17, 32)) * 0.5
        k = jax.random.fold_in
        w1 = jax.random.normal(k(rng, 1), (32, 64)) * 0.1
        b1 = jnp.zeros((64,))
        w2 = jax.random.normal(k(rng, 2), (64, 32)) * 0.1
        b2 = jnp.zeros((32,))
        fn = lambda x: fused_mlp(x, w1, b1, w2, b2)
        ref = fn(x)
        mesh = meshlib.create_mesh(dp=2, fsdp=2, tp=2)
        with meshlib.use_mesh(mesh):
            out = jax.jit(fn)(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_int8_lnmlp_block_under_mesh(self, rng):
        from uspace_tpu.models.layers import Block

        x = (jax.random.normal(rng, (8, 17, 64)) * 0.5).astype(jnp.bfloat16)
        blk = Block(num_heads=4, dtype=jnp.bfloat16, quant=True,
                    attn_impl="pallas_lnmlp")
        params = blk.init(rng, x)
        ref = blk.apply(params, x)
        mesh = meshlib.create_mesh(dp=2, fsdp=2, tp=2)
        with meshlib.use_mesh(mesh):
            out = jax.jit(lambda p, x: blk.apply(p, x))(params, x)
        # int8 rounding ties can flip one grid step under different
        # instruction orderings; demand near-total elementwise equality
        a = np.asarray(out, np.float32)
        b = np.asarray(ref, np.float32)
        frac = np.mean(~np.isclose(a, b, rtol=1e-5, atol=1e-6))
        assert frac < 1e-3, frac
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.05)


class TestShardedSampling:
    def test_sampler_shards_over_mesh(self, rng):
        """The compiled ODE sampler must run with the batch sharded over
        dp x fsdp (eval-time data parallelism)."""
        from uspace_tpu.core import flow

        model, tx, state, lr = _setup()
        mesh = meshlib.create_mesh(dp=4, fsdp=2, tp=1)
        b_sh = meshlib.batch_sharding(mesh)
        p_sh = meshlib.params_shardings(state.params, mesh)
        params = jax.device_put(state.params, p_sh)
        z = jax.device_put(jax.random.normal(rng, (16, 8, 8, 4)), b_sh)

        @jax.jit
        def sample(params, z):
            vf = lambda t, x: model.apply(params, x, t)[0]
            return flow.decode(vf, z, {"solver": "fixed",
                                       "solver_fix": "euler",
                                       "solver_fix_step": 0.25})

        out = sample(params, z)
        assert out.shape == (16, 8, 8, 4)
        assert np.isfinite(np.asarray(out)).all()


class TestDistributedInit:
    def test_single_host_noop(self, monkeypatch):
        """initialize() must be safe to call unconditionally from the
        train CLI: on a plain single-host launch (no coordinator env) it
        does nothing, and num_processes=1 short-circuits."""
        from uspace_tpu.parallel.distributed import initialize

        for var in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                    "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
            monkeypatch.delenv(var, raising=False)
        initialize()  # no coordinator anywhere: returns without init
        initialize(num_processes=1)

    def test_single_worker_hostnames_noop(self, monkeypatch):
        """A single-entry TPU_WORKER_HOSTNAMES (tunneled/dev single-chip
        runtimes export it) is NOT a multi-host signal — initialize()
        must no-op instead of demanding a coordinator address."""
        from uspace_tpu.parallel.distributed import initialize

        for var in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                    "MEGASCALE_COORDINATOR_ADDRESS"):
            monkeypatch.delenv(var, raising=False)
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
        initialize()  # single worker: returns without init
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
        with pytest.raises(Exception):
            initialize()  # two workers, no coordinator: must fail fast

    def test_context_shape_fallbacks(self):
        from uspace_tpu.configs.common import base_config, context_shape, d

        cfg = base_config()
        cfg.nnet = d(name="uvit_t2i", num_clip_token=9, clip_dim=24)
        assert context_shape(cfg) == (9, 24)
        cfg.nnet = d(name="unet_t2i", context_dim=32)
        assert context_shape(cfg) == (77, 32)  # no dataset block: CLIP 77
        cfg.dataset = d(name="synthetic_t2i", num_tokens=6)
        assert context_shape(cfg) == (6, 32)
