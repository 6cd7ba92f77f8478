"""Small filesystem helpers.

Counterpart of `/root/reference/tools/utils_misc.py` (the dissection
workflow's dump-directory cleanup: strip a stage prefix like ``tail_``
off every file in a feature dir so downstream loaders see plain names).
The reference uses ``str.replace(prefix, "")`` which would also delete
*interior* occurrences of the prefix; this strips the leading occurrence
only.
"""

from __future__ import annotations

import glob
import os
from typing import List


def strip_prefix_in_dir(path: str, prefix: str = "tail_") -> List[str]:
    """Rename every ``<prefix><name>`` file in ``path`` to ``<name>``.

    Returns the new paths of the renamed files. Refuses to overwrite an
    existing target (raises ``FileExistsError``) rather than silently
    clobbering a previous dump.
    """
    renamed = []
    for f in sorted(glob.glob(os.path.join(path, "*"))):
        base = os.path.basename(f)
        if not base.startswith(prefix) or base == prefix:
            continue
        target = os.path.join(path, base[len(prefix):])
        if os.path.exists(target):
            raise FileExistsError(target)
        os.rename(f, target)
        renamed.append(target)
    return renamed
