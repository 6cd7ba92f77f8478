"""Utility tests: image grids, ptp vis helpers, metrics writer, timers."""

import json

import numpy as np

from uspace_tpu.utils.logging_utils import MetricsWriter, cnt_params, dct2str
from uspace_tpu.utils.profiling import StepTimer, trace
from uspace_tpu.utils.ptp_vis import text_under_image, view_images
from uspace_tpu.utils.vis import make_grid, save_image


class TestVis:
    def test_make_grid_layout(self):
        imgs = np.zeros((5, 4, 4, 3), np.float32)
        grid = make_grid(imgs, nrow=3, pad=1)
        assert grid.shape == (2 * 5 + 1, 3 * 5 + 1, 3)

    def test_save_image(self, tmp_path):
        p = str(tmp_path / "x.png")
        save_image(np.random.rand(8, 8, 3).astype(np.float32), p)
        from PIL import Image

        assert Image.open(p).size == (8, 8)


class TestPtpVis:
    def test_text_under_image(self):
        img = np.zeros((16, 32, 3), np.uint8)
        out = text_under_image(img, "hello")
        assert out.shape == (46, 32, 3)

    def test_view_images(self, tmp_path):
        imgs = np.full((4, 8, 8, 3), 128, np.uint8)
        canvas = view_images(imgs, num_rows=2,
                             out_path=str(tmp_path / "v.png"))
        assert canvas.ndim == 3
        assert (tmp_path / "v.png").exists()


class TestLoggingUtils:
    def test_metrics_writer_jsonl(self, tmp_path):
        w = MetricsWriter(str(tmp_path / "m.jsonl"))
        w.write(5, {"loss": 1.25, "tag": "a"})
        rec = json.loads(open(tmp_path / "m.jsonl").read())
        assert rec["step"] == 5 and rec["loss"] == 1.25 and rec["tag"] == "a"

    def test_metrics_writer_callback_sink(self, tmp_path):
        got = []
        w = MetricsWriter(str(tmp_path / "m.jsonl"),
                          sinks=[lambda s, rec: got.append((s, rec))])
        w.add_sink(lambda s, rec: got.append(("second", rec["loss"])))
        w.write(3, {"loss": 0.5})
        assert got[0][0] == 3 and got[0][1]["loss"] == 0.5
        assert got[1] == ("second", 0.5)

    def test_metrics_writer_wandb_missing_degrades(self, tmp_path,
                                                   monkeypatch):
        import builtins
        real_import = builtins.__import__

        def fake_import(name, *a, **k):
            if name == "wandb":
                raise ImportError("no wandb")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", fake_import)
        w = MetricsWriter(str(tmp_path / "m.jsonl"), use_wandb=True,
                          wandb_kwargs={"project": "x"})
        w.write(1, {"loss": 2.0})  # must not raise
        assert w._wandb is None

    def test_dct2str_and_cnt(self):
        assert "a=1.5" in dct2str({"a": 1.5})
        assert cnt_params({"w": np.zeros((3, 4)), "b": np.zeros(4)}) == 16


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer(batch_size=8, skip_first=1)
        assert t.tick() is None  # skipped compile step
        assert t.tick() is None  # window start
        out = t.tick()
        assert out and out["imgs_per_sec"] > 0

    def test_trace_noop(self):
        with trace(None):
            pass  # no-op path


def test_strip_prefix_in_dir(tmp_path):
    """utils.misc.strip_prefix_in_dir (reference tools/utils_misc.py):
    strips the *leading* prefix only and refuses to clobber."""
    from uspace_tpu.utils.misc import strip_prefix_in_dir

    d = tmp_path / "feats"
    d.mkdir()
    for name in ("tail_a.npy", "tail_b_tail_x.npy", "keep.npy"):
        (d / name).write_text("x")
    out = strip_prefix_in_dir(str(d), "tail_")
    names = sorted(p.name for p in d.iterdir())
    assert names == ["a.npy", "b_tail_x.npy", "keep.npy"]  # interior kept
    assert len(out) == 2
    # collision protection
    (d / "tail_keep.npy").write_text("x")
    import pytest

    with pytest.raises(FileExistsError):
        strip_prefix_in_dir(str(d), "tail_")
