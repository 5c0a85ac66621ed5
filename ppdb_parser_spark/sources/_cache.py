"""Atomic build-once cache directories for generated fixtures.

Build into a process-private tmp dir, then rename into place — so a second
process (or a parallel driver invocation) racing on the same fixture either
wins the rename or adopts the winner's output; nobody ever reads a
half-written pack.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable


def ensure_cached_dir(final_dir: str, build: Callable[[str], None]) -> str:
    """Return ``final_dir`` with ``build(dir)`` applied exactly once
    (marker: ``_SUCCESS``), atomically under concurrent callers."""
    marker = os.path.join(final_dir, "_SUCCESS")
    if os.path.exists(marker):
        return final_dir
    tmp = f"{final_dir}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    build(tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    try:
        os.rename(tmp, final_dir)
    except OSError:
        # another process completed first — use theirs
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(marker):
            raise
    return final_dir
