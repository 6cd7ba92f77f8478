"""Integration test: full training loop on the synthetic config (checkpoint,
vis, metrics, resume) — the CPU-feasible end-to-end slice of BASELINE
config #1, run at toy scale."""

import glob
import json
import os

import pytest


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path):
    from uspace_tpu.configs.synthetic_smoke import get_config
    from uspace_tpu.train.loop import train

    cfg = get_config()
    wd = str(tmp_path / "run")
    state = train(cfg, wd)
    assert int(state.step) == cfg.train.n_steps

    # artifacts
    steps = sorted(int(os.path.basename(p))
                   for p in glob.glob(wd + "/ckpts/[0-9]*"))
    assert steps == [5, 10]
    assert os.path.exists(wd + "/vis/10.png")
    recs = [json.loads(l) for l in open(wd + "/metrics.jsonl")]
    assert recs and all("loss" in r for r in recs)

    # resume continues from the latest checkpoint
    cfg.train.n_steps = 12
    state2 = train(cfg, wd)
    assert int(state2.step) == 12
