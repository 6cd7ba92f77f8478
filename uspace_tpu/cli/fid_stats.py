"""Precompute FID reference statistics for a dataset image directory
(reference `tools/fid_score.py:228-236` save_statistics_of_path):

    python -m uspace_tpu.cli.fid_stats --images=<dir> \
        --out=assets/fid_stats/fid_stats_cm256.npz \
        --inception=assets/fid/pt_inception-2015-12-05.pth
"""

from __future__ import annotations

from absl import app, flags, logging

FLAGS = flags.FLAGS
if "images" not in FLAGS:
    flags.DEFINE_string("images", None, "image directory")
if "out" not in FLAGS:
    flags.DEFINE_string("out", None, "output .npz path")
if "inception" not in FLAGS:
    flags.DEFINE_string("inception", None, "pytorch-fid inception weights")
if "batch_size" not in FLAGS:
    flags.DEFINE_integer("batch_size", 50, "")
flags.mark_flags_as_required(["images", "out"])


def main(argv):
    from ..evals.fid import InceptionFeaturizer, save_statistics_of_path

    feat = InceptionFeaturizer(FLAGS.inception)
    save_statistics_of_path(FLAGS.images, FLAGS.out, feat, FLAGS.batch_size)
    logging.info("stats -> %s", FLAGS.out)


if __name__ == "__main__":
    app.run(main)