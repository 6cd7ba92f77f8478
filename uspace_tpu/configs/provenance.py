"""Provenance-encoded dissection paths.

Counterpart of the reference's ``update_config`` family
(`/root/reference/configs/config_utils.py:11-56`,
`config_utils_t2i.py`, `configs_utils_common.py:4-12`): derive
``vis_path`` / ``read_path_root`` strings that encode the experiment
identity (nnet, dataset, solver, checkpoint epoch, edit target) so
artifacts from different settings never collide.
"""

from __future__ import annotations

import os

from ..editing.directions import attr_name


def solver_desc(solver_kwargs) -> str:
    """configs_utils_common.construct_solver_desc equivalent."""
    sk = dict(solver_kwargs)
    kind = sk.get("solver", "adaptive")
    if kind == "fixed":
        return f"{sk['solver_fix']}_step{sk['solver_fix_step']}"
    if kind == "adaptive":
        return f"{sk['solver_adaptive']}"
    if kind == "fixadp":
        return (f"{sk['solver_fix']}_step{sk['solver_fix_step']}"
                f"-{sk['solver_adaptive']}")
    raise NotImplementedError(f"unknown solver {kind!r}")


def epoch_id_from_path(path: str) -> int:
    """Checkpoint step from '.../130000.ckpt/nnet.pth' or an orbax dir
    '.../ckpts/130000' (reference get_epoch_id_from_path)."""
    if not path:
        return 0
    parts = [p for p in path.split("/") if p]
    for p in reversed(parts):
        stem = p.split(".")[0]
        if stem.isdigit():
            return int(stem)
    return 0


def update_config(config):
    """Fill dissection.vis_path / read_path_root with provenance strings
    when unset (reference update_config, config_utils.py:11-56)."""
    d = config.dissection
    num_attrs = 40 if "celeba" in config.dataset.name.lower() else 11
    a_name = attr_name(int(d.ith_attr), num_attrs)
    ep = epoch_id_from_path(d.get("ckpt_path_to_dissect") or "")
    sdesc = solver_desc(d.solver_kwargs)
    if not d.get("vis_path"):
        d.vis_path = os.path.join(
            "dissections_vis",
            "_".join([
                config.nnet.name, config.dataset.name,
                str(d.get("dissect_name")), a_name,
                f"attr{int(d.ith_attr)}",
                f"fixz{0 if not d.get('fixed_z_path') else 1}",
                f"ep{ep}", sdesc, f"t_edit{d.t_edit}",
                str(d.get("edit_loc")), f"com{int(d.ith_component)}",
            ]),
        )
    if not d.get("read_path_root"):
        d.read_path_root = "mid_feat/" + "_".join([
            config.nnet.name, "realimg", config.dataset.name,
            f"ep{ep}", sdesc, str(d.get("edit_loc")),
            f"n{d.n_samples}",
        ])
    return config
