"""End-to-end training loop (latent flow matching, all conditioning modes).

TPU-native redesign of the reference's three near-identical loops
(`/root/reference/train_lfm.py`, `train_lfm_t2i.py`, `train_ffmm.py`):
one loop driven by config. Differences by design:

- the hot path is ONE jitted, donated, mesh-sharded step (moments
  resampling + CFM loss + grad psum + Adam + EMA);
- input is per-process sharded on host, assembled into global arrays with
  ``jax.make_array_from_process_local_data`` (replaces accelerate DDP);
- checkpoints are single orbax saves of the TrainState pytree;
- eval/vis sampling runs the compiled ODE loop, decodes with the Flax VAE
  when weights are available, and records FID when stats exist
  (eval-as-test, reference train_lfm.py:309-325).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from ..configs.common import context_shape, nnet_kwargs, z_shape_hwc
from ..data.datasets import get_dataset
from ..data.loader import DataLoader
from ..models import get_nnet
from ..parallel import mesh as meshlib
from ..utils.logging_utils import MetricsWriter, dct2str, set_logger
from ..utils.vis import make_grid, save_image
from .checkpoint import CheckpointManager, load_pretrained_nnet, try_resume
from .preemption import GracefulShutdown
from .state import TrainState, get_lr_schedule, get_optimizer
from .step import make_train_step, make_velocity_fn

Array = jax.Array


class Experiment:
    """Builds model/optimizer/state/shardings/dataloaders from a config."""

    def __init__(self, config, workdir: Optional[str] = None):
        self.config = config
        self.workdir = workdir or os.path.join(
            config.get("workdir", "workdir"), "default"
        )
        os.makedirs(self.workdir, exist_ok=True)

        # mesh
        p = config.parallel
        dp = None if p.dp in (-1, None) else p.dp
        self.mesh = meshlib.create_mesh(dp=dp, fsdp=p.fsdp, tp=p.tp)

        # dataset + loader
        self.dataset = get_dataset(**dict(config.dataset))
        data_shards = int(np.prod(self.mesh.devices.shape[:2]))  # dp*fsdp
        assert config.train.batch_size % data_shards == 0, (
            f"global batch {config.train.batch_size} must divide over "
            f"dp*fsdp={data_shards} (sharding would fail at step 1)")
        assert config.train.batch_size % jax.process_count() == 0
        self.local_batch = config.train.batch_size // jax.process_count()
        self.loader = DataLoader(
            self.dataset.get_split("train"),
            self.local_batch,
            seed=config.seed,
            num_workers=config.dl.num_workers,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )

        # model + state. Two views over the SAME parameters: training
        # prefers the packed kernel (its VJP does not recompute the QKV
        # projection), sampling prefers the fully fused projection kernel
        # (selected by "auto" on TPU). Param trees are identical.
        kw = nnet_kwargs(config.nnet, config.get("compute_dtype"))
        self.model = get_nnet(config.nnet.name, **kw)
        if ("attn_impl" not in config.nnet
                and config.nnet.name != "unet_t2i"
                and jax.default_backend() == "tpu"):
            self.train_model = get_nnet(config.nnet.name, **kw,
                                        attn_impl="pallas_packed")
        else:
            self.train_model = self.model
        rng = jax.random.PRNGKey(config.seed)
        self.rng = rng
        z_hwc = z_shape_hwc(config)
        init_args = self._init_args(z_hwc)
        params = jax.jit(self.model.init)(rng, *init_args)
        if config.get("pretrained_path"):
            path = config.pretrained_path
            if os.path.exists(path):
                logging.info("loading pretrained nnet from %s", path)
                params = load_pretrained_nnet(
                    path, params, surgery=config.get("pretrained_surgery")
                )
            else:
                logging.warning("pretrained_path %s missing; fresh init", path)

        self.lr_schedule = get_lr_schedule(
            config.lr_scheduler.name,
            config.optimizer.lr,
            warmup_steps=config.lr_scheduler.get("warmup_steps", 0),
            total_steps=config.train.n_steps,
        )
        gc = config.train.get("grad_clip", -1.0)
        self.tx = get_optimizer(
            config.optimizer.name,
            self.lr_schedule,
            betas=tuple(config.optimizer.betas),
            weight_decay=config.optimizer.weight_decay,
            grad_clip=gc if gc and gc > 0 else None,
        )
        state = TrainState.create(params, self.tx)

        # shardings + placement
        self.state_sharding = meshlib.state_shardings(state, self.mesh)
        self.batch_sharding = meshlib.batch_sharding(self.mesh)
        self.replicated = meshlib.replicated(self.mesh)
        self.state = jax.device_put(state, self.state_sharding)

        self.ckpt = CheckpointManager(os.path.join(self.workdir, "ckpts"))

        self._train_step = None
        self._vae = None
        self._vae_params = None
        self._sample_fns = {}
        # host-path stage-delta machinery, cached by callable identity:
        # odeint_adaptive_host jits what it's handed, so fresh lambdas
        # (or a fresh jax.jit wrapper) per eval batch would re-trace the
        # whole field every call
        self._host_delta_pairs = {}
        self._delta_prepare = None

    def _init_args(self, z_hwc):
        x = jnp.zeros((1, *z_hwc), jnp.float32)
        t = jnp.zeros((1,), jnp.float32)
        mode = self.config.train.mode
        if mode == "t2i":
            ctx = jnp.zeros((1, *context_shape(self.config)), jnp.float32)
            return (x, t, ctx)
        if mode == "cond" or self.config.nnet.get("num_classes", -1) > 0:
            return (x, t, jnp.zeros((1,), jnp.int32))
        return (x, t)

    # --- device input ------------------------------------------------------

    def put_batch(self, batch: Dict[str, Any]) -> Dict[str, Array]:
        out = {}
        for k, v in batch.items():
            if isinstance(v, list):  # strings stay host-side
                continue
            out[k] = jax.make_array_from_process_local_data(
                self.batch_sharding, np.asarray(v)
            )
        return out

    # --- compiled steps ----------------------------------------------------

    def train_step_fn(self):
        if self._train_step is None:
            step = make_train_step(
                self.train_model,
                self.tx,
                sigma_min=self.config.dynamic.sigma_min,
                ema_rate=self.config.train.get("ema_rate", 0.9999),
                lr_schedule=self.lr_schedule,
                latents_from_moments=self.config.train.get("from_moments", True),
                vae_scale=self.config.autoencoder.get("scale_factor", 0.18215),
                skip_nonfinite=self.config.train.get("skip_nonfinite", True),
            )
            self._train_step = jax.jit(
                step,
                in_shardings=(self.state_sharding, None, self.replicated),
                out_shardings=(self.state_sharding, self.replicated),
                donate_argnums=(0,),
            )
        return self._train_step

    # --- codecs -------------------------------------------------------------

    def vae(self):
        """(decode_fn, available) — Flax VAE decode when weights exist."""
        if self._vae is None:
            from ..codecs.convert import load_torch_checkpoint, vae_torch_to_flax
            from ..codecs.vae import AutoencoderKL

            path = self.config.autoencoder.get("pretrained_path", "")
            vae = AutoencoderKL(
                scale_factor=self.config.autoencoder.get("scale_factor", 0.18215)
            )
            if path and os.path.exists(path):
                sd = load_torch_checkpoint(path)
                self._vae_params = {"params": vae_torch_to_flax(sd)}
                # params as an explicit jit argument (closure capture
                # bakes them into the executable payload)
                dec = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))
                self._vae = lambda z: dec(self._vae_params, z)
            else:
                self._vae = False
        return self._vae

    # --- sampling -----------------------------------------------------------

    def solver_kwargs(self, sample_steps: Optional[int] = None) -> Dict:
        """Eval-sampling solver from ``config.sample.solver_kwargs``
        (reference eval_step decodes with its ODE defaults —
        train_lfm.py:200; the fixed-Euler default here matches the
        reference sample_fn's sample_steps protocol)."""
        steps = sample_steps or self.config.sample.sample_steps
        sk = dict(self.config.sample.get(
            "solver_kwargs",
            {"solver": "fixed", "solver_fix": "euler", "solver_fix_step": -1.0},
        ))
        if sk.get("solver", "fixed") == "fixed" and \
                float(sk.get("solver_fix_step", -1.0) or -1.0) <= 0:
            sk["solver_fix_step"] = 1.0 / steps
        return sk

    def sample_latents(self, params, rng, n: int,
                       cond: Optional[Dict] = None,
                       sample_steps: Optional[int] = None) -> Array:
        from ..core import flow
        from ..evals.sampling import cfg_velocity_fn

        z = jax.random.normal(rng, (n, *z_shape_hwc(self.config)))
        cfg_scale = float(self.config.sample.get("cfg_scale", 0.0) or 0.0)
        cond = cond or {}
        sk = self.solver_kwargs(sample_steps)
        use_cfg = cfg_scale > 0 and bool(cond)
        null = self.null_cond(cond) if use_cfg else {}
        # config-surface knob for the int8 base-anchored stage-delta
        # field (core/delta_field.py — NFE parity with bf16 under
        # adaptive step control; the bench's promoted dopri5 line):
        #   sample.solver_kwargs.field = "stage_delta_int8"
        # optional: .hidden_mode ("grad" default), .safety (0.9/1.0).
        # The pair is built inside the jitted sample_fn from the traced
        # params, so the executable stays params-free.
        field = sk.pop("field", None)
        hidden_mode = sk.pop("hidden_mode", None)
        if field not in (None, "", "stage_delta_int8"):
            raise NotImplementedError(f"solver_kwargs.field={field!r}")
        if field:
            # fixadp is deliberately NOT allowed: this eval-sampling
            # surface has no t_edit split point to give the fixed
            # segment (fixadp editing runs through editing/drivers.py)
            if sk.get("solver", "fixed") != "adaptive":
                raise ValueError(
                    "field=stage_delta_int8 needs solver=adaptive — "
                    "fixed-step solves should use the plain int8 view "
                    "(model quant=True) instead")
            if use_cfg or cond:
                # the delta field evaluates the bare uncond UViT; CFG /
                # conditioned fields keep their measured-best paths
                # (fused-2B CFG kernel, class embeds)
                raise NotImplementedError(
                    "stage_delta_int8 sampling is uncond-only")

            from ..core import delta_field
            from ..models import UViT

            if not isinstance(self.model, UViT):
                raise NotImplementedError(
                    "stage_delta_int8 is built for the UViT family "
                    "(core/delta_field.py block layout)")

            def attach_stage_delta(sk2, params):
                dp = delta_field.prepare_delta_params(params)
                sk2 = dict(sk2)
                sk2["stage_delta"] = delta_field.make_delta_field(
                    self.model, dp, hidden_mode=hidden_mode)
                return sk2
        if sk.get("driver") == "host":
            # host-driven adaptive solve: a Python loop, not jittable —
            # eager path (odeint threads nothing big; tunnel-scale use
            # goes through solvers.odeint_adaptive_host directly)
            if field:
                # host-path stage-delta is param-threaded (closure
                # capture would bake the quantized tree into every
                # compiled step program — the tunnel crash mode)
                from ..core import solvers as solverslib

                if self._delta_prepare is None:
                    self._delta_prepare = jax.jit(
                        delta_field.prepare_delta_params)
                dp = self._delta_prepare(params)
                hm = hidden_mode or delta_field.DEFAULT_HIDDEN_MODE
                pair = self._host_delta_pairs.get(hm)
                if pair is None:
                    pair = self._host_delta_pairs[hm] = (
                        lambda t, x, p: delta_field.anchored_vf_base(
                            self.model, p, t, x, hidden_mode=hm),
                        lambda t, x, c, p: delta_field.anchored_vf_delta(
                            self.model, p, t, x, c))
                sk = dict(sk)
                sk["stage_delta"] = pair
                sk.setdefault("program", "stages")
                return solverslib.odeint(None, z, 0.0, 1.0,
                                         solver_kwargs=sk, vf_params=dp)
            vf = (cfg_velocity_fn(self.model, params, cond, null, cfg_scale)
                  if use_cfg else make_velocity_fn(self.model, params, cond))
            return flow.decode(vf, z, sk)
        # ONE cached jitted program per (solver, cfg, cond-keys) with
        # params/z/cond as explicit arguments: no re-trace per eval, no
        # param tree baked into the executable payload
        key = (tuple(sorted((k, repr(v)) for k, v in sk.items())),
               field, hidden_mode, use_cfg and cfg_scale,
               tuple(sorted(cond)))
        fn = self._sample_fns.get(key)
        if fn is None:
            def sample_fn(params, z, cond, null):
                vf = (cfg_velocity_fn(self.model, params, cond, null,
                                      cfg_scale)
                      if use_cfg
                      else make_velocity_fn(self.model, params, cond))
                sk_run = attach_stage_delta(sk, params) if field else sk
                return flow.decode(vf, z, sk_run)

            fn = self._sample_fns[key] = jax.jit(sample_fn)
        return fn(params, z, cond, null)

    def null_cond(self, cond: Dict[str, Any]) -> Dict[str, Any]:
        """Null conditioning for CFG: the dataset's empty CLIP context
        (datasets.py empty_context.npy) or the learned null class K."""
        null = {}
        if cond.get("context") is not None:
            empty = getattr(self.dataset, "empty_context", None)
            if empty is not None:
                e = jnp.asarray(empty)
                null["context"] = jnp.broadcast_to(
                    e[None], cond["context"].shape)
            else:
                null["context"] = jnp.zeros_like(cond["context"])
        if cond.get("y") is not None and self.dataset.K:
            # the learned null label is class K (labels 0..K-1 are real,
            # model num_classes=K+1 — ImageNet256Features cfg wiring);
            # K-1 here would guide against a REAL class
            null_label = getattr(self.dataset, "null_label", None)
            null["y"] = jnp.full_like(
                cond["y"],
                self.dataset.K if null_label is None else null_label,
            )
        return null

    def eval_cond(self, rng, n: int) -> Dict[str, Any]:
        """Conditioning for eval sampling, by mode."""
        mode = self.config.train.mode
        if mode == "t2i":
            test = self.dataset.get_split("test")
            idx = np.asarray(
                jax.random.randint(rng, (n,), 0, len(test))
            )
            ctx = np.stack([test[int(i)]["context"] for i in idx])
            return {"context": jnp.asarray(ctx)}
        if self.dataset.has_label:
            return {"y": self.dataset.sample_label(rng, n)}
        return {}


def train(config, workdir: Optional[str] = None) -> TrainState:
    exp = Experiment(config, workdir)
    # ambient mesh: activates the Pallas kernels' shard_map scale-out
    # path (parallel.mesh.shard_batch_call) for the whole run
    with meshlib.use_mesh(exp.mesh):
        return _train_body(exp, config)


def _train_body(exp: "Experiment", config) -> TrainState:
    cfg = config
    set_logger("info", os.path.join(exp.workdir, "train.log"))
    is_main = jax.process_index() == 0
    # optional experiment tracker (reference train_lfm.py:44-52 inits
    # wandb on the main process): config.tracker = {name: "wandb",
    # project, run_name, mode}; metrics always land in metrics.jsonl too
    tracker = dict(cfg.get("tracker") or {})
    use_wandb = is_main and tracker.get("name") == "wandb"
    metrics_w = MetricsWriter(
        os.path.join(exp.workdir, "metrics.jsonl"),
        use_wandb=use_wandb,
        wandb_kwargs=dict(
            project=tracker.get("project", "lfm_uvit"),
            name=tracker.get("run_name") or None,
            mode=tracker.get("mode", "online"),
            config=config.to_dict() if hasattr(config, "to_dict") else None,
        ) if use_wandb else None,
    )

    state = try_resume(exp.ckpt, exp.state)
    start_step = int(state.step)
    if start_step:
        logging.info("resumed at step %d", start_step)
    step_fn = exp.train_step_fn()
    # fast-forward the data order to the resume point: interrupted +
    # resumed runs consume the exact batch sequence of an uninterrupted
    # one (index slicing, no wasted IO — data/loader.py)
    data = exp.loader.infinite(start_step=start_step)
    rng = jax.random.fold_in(exp.rng, 1)

    profile_dir = cfg.train.get("profile_dir", None)
    fid_by_step: Dict[int, float] = {}
    stop = GracefulShutdown()
    with stop:
        state, preempted = _train_steps(
            exp, cfg, state, step_fn, data, rng, metrics_w,
            profile_dir, fid_by_step, start_step, is_main, stop)
    step = int(state.step)
    if preempted:
        return state  # preempted: checkpoint already written

    exp.ckpt.save(state, step, wait=True)
    # best-FID checkpoint selection + final full-size eval on it
    # (reference train_lfm.py:328-338)
    if fid_by_step:
        best = min(fid_by_step, key=fid_by_step.get)
        logging.info("best small-FID %.3f at step %d", fid_by_step[best], best)
        if is_main:
            with open(os.path.join(exp.workdir, "best_ckpt.txt"), "w") as f:
                f.write(f"{best} {fid_by_step[best]}\n")
        best_state = exp.ckpt.restore(state, best)
        final_fid = (_eval_fid(exp, best_state, best,
                               n_samples=cfg.sample.n_samples,
                               tag="final") if is_main else None)
        if final_fid is not None:
            logging.info("final FID (%d samples) %.4f",
                         cfg.sample.n_samples, final_fid)
            metrics_w.write(best, {"final_fid": final_fid})
    return state


def _train_steps(exp: "Experiment", cfg, state, step_fn, data, rng,
                 metrics_w, profile_dir, fid_by_step, start_step,
                 is_main, stop: GracefulShutdown):
    """The step loop. Returns ``(state, preempted)``; on preemption the
    final checkpoint has already been written (wait=True)."""
    t_last = time.time()
    step = start_step
    while step < cfg.train.n_steps:
        if profile_dir and step == start_step + 10:
            jax.profiler.start_trace(profile_dir)
        batch = exp.put_batch(next(data))
        state, m = step_fn(state, batch, rng)
        step += 1
        if profile_dir and step == start_step + 13:
            jax.profiler.stop_trace()
            logging.info("profile trace -> %s", profile_dir)

        if step % cfg.train.log_interval == 0 and is_main:
            dt = time.time() - t_last
            ips = cfg.train.log_interval * cfg.train.batch_size / max(dt, 1e-9)
            t_last = time.time()
            scalars = {k: float(v) for k, v in m.items()}
            scalars["imgs_per_sec"] = ips
            logging.info("step %d %s", step, dct2str(scalars))
            metrics_w.write(step, scalars)

        if step % cfg.train.eval_interval == 0:
            _vis(exp, state, step)

        if step % cfg.train.save_interval == 0:
            exp.ckpt.save(state, step)
            # FID runs on the main process only (eval sampling is
            # replicated work; writing from every host would duplicate
            # metrics.jsonl records)
            fid = _eval_fid(exp, state, step) if is_main else None
            if fid is not None:
                fid_by_step[step] = fid
                metrics_w.write(step, {"fid": fid})

        # graceful preemption: SIGTERM latched by the guard, or the
        # distributed runtime's synchronized notice (orbax). Save ONE
        # final checkpoint and exit; resume continues bit-exactly
        # (data order fast-forwarded above, step rng keyed on
        # state.step). The reference loses everything since its last
        # periodic save here.
        if stop.requested or exp.ckpt.reached_preemption(step):
            if profile_dir and start_step + 10 < step < start_step + 13:
                jax.profiler.stop_trace()
            if exp.ckpt.latest_step() != step:  # skip double-save when
                # the signal landed on a save_interval step
                exp.ckpt.save(state, step, wait=True)
            else:
                exp.ckpt.wait()
            logging.info("preemption at step %d: checkpoint saved, "
                         "exiting cleanly", step)
            if is_main:
                metrics_w.write(step, {"preempted": 1.0})
            return state, True

    if profile_dir and start_step + 10 < step < start_step + 13:
        jax.profiler.stop_trace()  # run ended inside the trace window
    return state, False


def _vis(exp: Experiment, state: TrainState, step: int) -> None:
    """Periodic sample grid (reference train_lfm.py:250-306)."""
    cfg = exp.config
    n = cfg.vis_num
    rng = jax.random.fold_in(exp.rng, 2 + step)
    cond_rng, z_rng = jax.random.split(rng)
    cond = exp.eval_cond(cond_rng, n)
    latents = exp.sample_latents(
        {"params": state.ema_params["params"]}, z_rng, n, cond
    )
    decode = exp.vae()
    out_path = os.path.join(exp.workdir, "vis", f"{step}.png")
    if decode:
        imgs = np.asarray(decode(latents))
        imgs = exp.dataset.unpreprocess(imgs)
        if jax.process_index() == 0:
            save_image(make_grid(imgs), out_path)
    else:
        # no VAE weights: save normalized latent channels as a grid
        lat = np.asarray(latents)
        lat = (lat - lat.min()) / max(lat.max() - lat.min(), 1e-8)
        if jax.process_index() == 0:
            save_image(make_grid(lat[..., :3]), out_path)
    logging.info("vis saved: %s", out_path)


def _eval_fid(exp: Experiment, state: TrainState, step: int,
              n_samples: Optional[int] = None, tag: str = ""):
    """FID eval when stats+weights exist (reference eval_step,
    train_lfm.py:185-230). Per-save evals are capped small; the final
    best-checkpoint eval uses the config's full n_samples."""
    cfg = exp.config
    fid_stat = getattr(exp.dataset, "fid_stat", None)
    if not fid_stat or not os.path.exists(fid_stat):
        return None
    try:
        from ..evals import fid as fid_mod
    except ImportError:
        return None
    # config.sample.fid_decode: "vae" (default — latent models decode to
    # pixels first) | "identity" (pixel-space models: samples ARE images,
    # reference train_ffmm.py evaluates on pixels directly).
    # config.sample.fid_weights: inception weights path override;
    # "random" runs a random-init featurizer so the whole pipeline
    # (sample -> decode -> featurize -> Frechet -> best-ckpt) can be
    # exercised without the pytorch-fid asset.
    if cfg.sample.get("fid_decode", "vae") == "identity":
        decode = lambda z: z  # noqa: E731
    else:
        decode = exp.vae()
        if not decode:
            return None
    fid_weights = cfg.sample.get("fid_weights", None) or None

    def sample_images(rng, n):
        cond_rng, z_rng = jax.random.split(rng)
        cond = exp.eval_cond(cond_rng, n)
        lat = exp.sample_latents(
            {"params": state.ema_params["params"]}, z_rng, n, cond
        )
        return exp.dataset.unpreprocess(np.asarray(decode(lat)))

    out_dir = os.path.join(exp.workdir, "eval", f"{step}{tag}")
    from ..evals.sampling import sample2dir

    n_eval = n_samples or min(cfg.sample.n_samples, 2048)
    sample2dir(
        lambda rng, n: sample_images(rng, n),
        n_eval, cfg.sample.mini_batch_size, out_dir,
        jax.random.fold_in(exp.rng, 3 + step),
    )
    try:
        return fid_mod.fid_given_paths(fid_stat, out_dir,
                                       weights_path=fid_weights)
    except FileNotFoundError as e:  # missing inception weights: skip FID,
        logging.warning("FID skipped: %s", e)  # never kill a training run
        return None
