"""End-to-end T2I conditioning + prompt-to-prompt editing verification.

The T2I analog of `cli/editing_e2e.py`: runs the reference's
`dissect_lfm_t2i.py` editing repertoire (p2p column rescale,
`tools/utils_t2i.py:209-238`; local-prompt context rewrite,
`utils_t2i.py:240-275`) against a *trained* U-ViT-T2I checkpoint on the
caption-structured synthetic dataset (`data/datasets.SyntheticT2I`), and
verifies quantitatively via projections onto the planted per-word
patterns ``P_w``:

1. **conditioning** — generations from context (w1, w2) carry P_{w1} and
   P_{w2} but not the other vocabulary patterns;
2. **p2p rescale** — multiplying the attention columns of w1's context
   token moves P_{w1} content monotonically with the multiplier while
   leaving P_{w2} (the untouched word) comparatively stable;
3. **local-prompt rewrite** — swapping w1's embedding for w3's moves the
   generation from P_{w1} to P_{w3};
4. **classifier-free guidance** (when the config trains with context
   dropout, ``dataset.cfg=True``) — the guidance sweep s ∈ {0, 1, 3} via
   ``evals.sampling.cfg_velocity_fn``: s=0 (unconditional) erases the
   caption's margin, s≥1 restores/amplifies it — the working-CFG
   requirement of BASELINE config #3 (the reference's own CFGDataset
   raises NotImplementedError).

Outputs ``editing_e2e_t2i.{json,md}`` + sweep grids into ``--workdir``.

Usage:
    python -m uspace_tpu.cli.editing_e2e_t2i \
        --config=uspace_tpu/configs/synthetic_t2i_e2e.py \
        --config.dissection.ckpt_path_to_dissect=<workdir>/ckpts \
        --workdir=e2e_t2i_out
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags, logging
from ml_collections import config_flags

FLAGS = flags.FLAGS
if "config" not in FLAGS:
    config_flags.DEFINE_config_file("config", None, "experiment config",
                                    lock_config=False)
if "workdir" not in FLAGS:
    flags.DEFINE_string("workdir", "e2e_t2i_out", "output root")
flags.mark_flags_as_required(["config"])


def _projections(lat: np.ndarray, patterns: np.ndarray) -> np.ndarray:
    """[B, ...] latents x [V, ...] unit patterns -> [B, V]."""
    flat = np.asarray(lat, np.float64).reshape(lat.shape[0], -1)
    p = np.asarray(patterns, np.float64).reshape(patterns.shape[0], -1)
    return flat @ p.T


def run(config, workdir: str) -> dict:
    from ..configs.common import z_shape_hwc
    from ..data.datasets import SyntheticT2IFeatures
    from ..editing.specs import AttnEdit, p2p_col_mult
    from ..utils.vis import make_grid, save_image
    from .dissect_common import build_session

    d = config.dissection
    os.makedirs(workdir, exist_ok=True)
    session, _ = build_session(config)
    rng = jax.random.PRNGKey(config.seed)
    z_hwc = z_shape_hwc(config)

    dcfg = config.dataset
    vocab = int(dcfg.get("vocab", 6))
    num_tokens = int(dcfg.get("num_tokens", 8))
    ctx_dim = int(dcfg.get("ctx_dim", 32))
    helper = SyntheticT2IFeatures(
        num=1, shape=tuple(dcfg.get("shape")), vocab=vocab,
        num_tokens=num_tokens, ctx_dim=ctx_dim,
        **{k: float(dcfg[k]) for k in ("base_std", "amp", "noise_std",
                                       "ctx_scale") if k in dcfg},
    )
    P = helper._pat  # [V, ...] unit patterns
    amp = helper.amp

    n = min(int(d.mini_batch_size), 32)
    z = jax.random.normal(rng, (n, *z_hwc))
    # the p2p column-rescale check needs the joint-attention token layout
    # ([time, ctx, patches]); the SD-UNet family conditions via
    # cross-attention instead and is verified on checks 1/3/4
    has_joint_attn = config.nnet.name == "uvit_t2i"
    if has_joint_attn:
        n_patches = (z_hwc[0] // int(config.nnet.patch_size)) ** 2
        seq_len = 1 + num_tokens + n_patches

    def gen(ctx_row, attn_edit=None):
        ctx = jnp.broadcast_to(jnp.asarray(ctx_row)[None],
                               (n, num_tokens, ctx_dim))
        out = session.decode(z, cond={"context": ctx}, attn_edit=attn_edit)
        return np.asarray(out, np.float32)

    report = {"checks": {}}
    grids = []

    # -- check 1: conditioning ------------------------------------------------
    assert vocab >= 4, "the verification protocol needs >= 4 words"
    pairs = [(0, 1), (2, 3), (1, 2), (0, vocab - 1)]
    cond_rows = []
    base_lat = {}
    for (a, b) in pairs:
        lat = gen(helper.context_of(a, b))
        base_lat[(a, b)] = lat
        proj = _projections(lat, P)  # [n, V]
        present = float(proj[:, [a, b]].mean())
        absent_ids = [w for w in range(vocab) if w not in (a, b)]
        absent = float(proj[:, absent_ids].mean())
        spread = float(proj[:, absent_ids].std())
        cond_rows.append({
            "pair": [a, b], "present_mean": present, "absent_mean": absent,
            "margin_sigma": (present - absent) / max(spread, 1e-9),
        })
        grids.append(lat)
    cond_ok = all(r["margin_sigma"] >= 3.0 and
                  r["present_mean"] > 0.5 * amp for r in cond_rows)
    report["checks"]["conditioning"] = {"rows": cond_rows, "passed": cond_ok}

    # -- check 2: p2p column rescale on w1's token ---------------------------
    a, b = pairs[0]
    p2p_ok = True
    if has_joint_attn:
        mults = [0.0, 0.5, 1.0, 1.5, 2.0]
        p2p_rows = []
        for m in mults:
            cols = p2p_col_mult(n, seq_len, jnp.full((n, 1), 1, jnp.int32), m)
            lat = gen(helper.context_of(a, b),
                      attn_edit=AttnEdit(col_mult=cols))
            proj = _projections(lat, P)
            p2p_rows.append({"mult": m,
                             "proj_target": float(proj[:, a].mean()),
                             "proj_other": float(proj[:, b].mean())})
            grids.append(lat)
        t_curve = [r["proj_target"] for r in p2p_rows]
        o_curve = [r["proj_other"] for r in p2p_rows]
        t_span = t_curve[-1] - t_curve[0]
        monotone = all((t_curve[i + 1] - t_curve[i]) * t_span >= 0
                       for i in range(len(t_curve) - 1))
        # suppressing the token (mult 0) must cut the word's content vs
        # baseline (mult 1) far more than it disturbs the untouched word
        i1 = mults.index(1.0)
        target_drop = t_curve[i1] - t_curve[0]
        other_drift = abs(o_curve[i1] - o_curve[0])
        p2p_ok = bool(monotone and target_drop > 0.25 * amp
                      and other_drift < 0.5 * target_drop)
        report["checks"]["p2p_rescale"] = {
            "word": a, "rows": p2p_rows, "monotone": monotone,
            "target_drop_mult0": target_drop,
            "other_drift_mult0": other_drift,
            "passed": p2p_ok,
        }
    else:
        report["checks"]["p2p_rescale"] = {
            "skipped": True,
            "reason": "cross-attention family: joint-attention token "
                      "rescale does not apply",
        }

    # -- check 3: local-prompt rewrite (w1 -> w3) ----------------------------
    c = pairs[1][0]  # a word absent from (a, b)
    lat_orig = base_lat[(a, b)]
    lat_new = gen(helper.context_of(c, b))
    po, pn = _projections(lat_orig, P), _projections(lat_new, P)
    lp = {
        "from_word": a, "to_word": c, "kept_word": b,
        "old_word_before": float(po[:, a].mean()),
        "old_word_after": float(pn[:, a].mean()),
        "new_word_before": float(po[:, c].mean()),
        "new_word_after": float(pn[:, c].mean()),
        "kept_word_before": float(po[:, b].mean()),
        "kept_word_after": float(pn[:, b].mean()),
    }
    lp_ok = bool(
        lp["new_word_after"] - lp["new_word_before"] > 0.5 * amp
        and lp["old_word_before"] - lp["old_word_after"] > 0.5 * amp
        and abs(lp["kept_word_after"] - lp["kept_word_before"]) < 0.5 * amp
    )
    lp["passed"] = lp_ok
    report["checks"]["local_prompt"] = lp
    grids.append(lat_new)

    # -- check 4: classifier-free guidance (cfg-trained models only) ---------
    cfg_ok = True
    if dcfg.get("cfg", False):
        from ..evals.sampling import cfg_velocity_fn
        from ..core import flow as flow_mod

        ctx_row = helper.context_of(a, b)
        ctx_full = jnp.broadcast_to(jnp.asarray(ctx_row)[None],
                                    (n, num_tokens, ctx_dim))
        null_ctx = jnp.zeros_like(ctx_full)
        cfg_rows = []
        for s in (0.0, 1.0, 3.0):
            vf = cfg_velocity_fn(session.model, session.params,
                                 {"context": ctx_full},
                                 {"context": null_ctx}, s)
            lat = np.asarray(flow_mod.decode(vf, z, session.solver_kwargs),
                             np.float32)
            proj = _projections(lat, P)
            absent_ids = [w for w in range(vocab) if w not in (a, b)]
            cfg_rows.append({
                "guidance": s,
                "present_mean": float(proj[:, [a, b]].mean()),
                "absent_mean": float(proj[:, absent_ids].mean()),
            })
            grids.append(lat)
        margins = [r["present_mean"] - r["absent_mean"] for r in cfg_rows]
        # s=0 is unconditional (no caption information), s=1 the plain
        # conditional model, s>1 amplified guidance
        cfg_ok = bool(abs(margins[0]) < 0.5 * margins[1]
                      and margins[2] >= 0.95 * margins[1]
                      and margins[1] > 0)
        report["checks"]["cfg_guidance"] = {"rows": cfg_rows,
                                            "margins": margins,
                                            "passed": cfg_ok}

    passed = cond_ok and p2p_ok and lp_ok and cfg_ok
    report["passed"] = bool(passed)
    report["n_per_setting"] = n

    flat = np.concatenate(grids)[:, :, :, :3]
    img = (flat - flat.min()) / max(float(flat.max() - flat.min()), 1e-8)
    save_image(make_grid(img, nrow=n), os.path.join(workdir, "t2i_sweeps.png"))
    with open(os.path.join(workdir, "editing_e2e_t2i.json"), "w") as f:
        json.dump(report, f, indent=1)

    lines = ["# T2I end-to-end verification", "",
             f"{n} samples per setting, vocab {vocab}, planted amp {amp}", "",
             "## 1. conditioning (present vs absent pattern projections)", "",
             "| pair | present | absent | margin |", "|---|---|---|---|"]
    for r in cond_rows:
        lines.append(f"| {tuple(r['pair'])} | {r['present_mean']:.2f} "
                     f"| {r['absent_mean']:.2f} | {r['margin_sigma']:.1f}σ |")
    lines += ["", f"**{'PASS' if cond_ok else 'FAIL'}**", ""]
    if has_joint_attn:
        lines += [f"## 2. p2p rescale of word {a}'s token", "",
                  "| mult | proj(word) | proj(other) |", "|---|---|---|"]
        for r in p2p_rows:
            lines.append(f"| {r['mult']:g} | {r['proj_target']:.2f} "
                         f"| {r['proj_other']:.2f} |")
        lines += ["", f"monotone={monotone}, drop@0={target_drop:.2f}, "
                  f"other drift={other_drift:.2f} — "
                  f"**{'PASS' if p2p_ok else 'FAIL'}**", ""]
    else:
        lines += ["## 2. p2p rescale — n/a (cross-attention family; "
                  "joint-attention token rescale does not apply)", ""]
    lines += [f"## 3. local-prompt rewrite {a}→{c} (keep {b})", "",
              f"word {a}: {lp['old_word_before']:.2f} → "
              f"{lp['old_word_after']:.2f}; "
              f"word {c}: {lp['new_word_before']:.2f} → "
              f"{lp['new_word_after']:.2f}; "
              f"word {b}: {lp['kept_word_before']:.2f} → "
              f"{lp['kept_word_after']:.2f} — "
              f"**{'PASS' if lp_ok else 'FAIL'}**", ""]
    if "cfg_guidance" in report["checks"]:
        cg = report["checks"]["cfg_guidance"]
        lines += ["## 4. classifier-free guidance sweep", "",
                  "| guidance | present | absent | margin |", "|---|---|---|---|"]
        for r, m in zip(cg["rows"], cg["margins"]):
            lines.append(f"| {r['guidance']:g} | {r['present_mean']:.2f} "
                         f"| {r['absent_mean']:.2f} | {m:.2f} |")
        lines += ["", f"**{'PASS' if cg['passed'] else 'FAIL'}**", ""]
    lines += [f"**overall: {'PASS' if passed else 'FAIL'}**", ""]
    with open(os.path.join(workdir, "editing_e2e_t2i.md"), "w") as f:
        f.write("\n".join(lines))
    logging.info("editing_e2e_t2i: %s (report in %s)",
                 "PASS" if passed else "FAIL", workdir)
    return report


def main(argv):
    run(FLAGS.config, FLAGS.workdir)


if __name__ == "__main__":
    app.run(main)
