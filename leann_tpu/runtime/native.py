"""Shared build-on-demand logic for the csrc/ native libraries.

The .so binaries are NOT checked in (platform-specific); every loader goes
through :func:`ensure_built`, which (re)builds via ``make`` whenever the
library is missing OR its .cpp source is newer than the binary — so edits to
csrc/*.cpp are never silently ignored by a stale artifact.
"""

import logging
import os
import subprocess

logger = logging.getLogger(__name__)

CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")


def ensure_built(stem: str, timeout: int = 120) -> str:
    """Return the path to a fresh ``lib<stem>.so``, building if missing or
    stale vs ``<stem>.cpp``. Raises on missing source or failed build — the
    callers wrap this in their own fallback handling."""
    lib_path = os.path.join(CSRC, f"lib{stem}.so")
    cpp_path = os.path.join(CSRC, f"{stem}.cpp")
    if not os.path.exists(cpp_path):
        raise FileNotFoundError(cpp_path)
    if (not os.path.exists(lib_path)
            or os.path.getmtime(cpp_path) > os.path.getmtime(lib_path)):
        subprocess.run(["make", "-C", CSRC, f"lib{stem}.so"],
                       check=True, capture_output=True, timeout=timeout)
    return lib_path
