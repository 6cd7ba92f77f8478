"""Asset validation CLI: run the real-weights parity battery over every
asset from ``docs/assets.md`` that exists on disk.

    python -m uspace_tpu.cli.validate_assets \
        [--vae=...] [--clip=...] [--uvit=...] [--sd_unet=...] \
        [--inception=...] [--work_dir=/tmp/uspace_validate]

Prints a PASS/FAIL/SKIP table; exits non-zero if any present asset
fails. The pytest equivalents live in tests/test_assets.py (they skip
instead of printing SKIP rows).
"""

from __future__ import annotations

import json
import sys

from absl import app, flags

from ..evals import asset_validation as av

FLAGS = flags.FLAGS
for key, default in av.DEFAULT_ASSETS.items():
    if key not in FLAGS:
        flags.DEFINE_string(key, default, f"path to the {key} asset")
if "work_dir" not in FLAGS:
    flags.DEFINE_string("work_dir", "/tmp/uspace_validate",
                        "scratch dir for smoke outputs")


def main(argv):
    assets = {k: getattr(FLAGS, k) for k in av.DEFAULT_ASSETS}
    results = av.run_all(assets, work_dir=FLAGS.work_dir)
    failed = 0
    for r in results:
        status = ("SKIP" if r["ok"] is None
                  else "PASS" if r["ok"] else "FAIL")
        failed += status == "FAIL"
        detail = {k: v for k, v in r.items() if k not in ("name", "ok")}
        print(f"{status:5s} {r['name']:28s} "
              f"{json.dumps(detail, default=str)[:200]}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    app.run(main)
