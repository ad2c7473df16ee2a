"""Build-on-first-use for the native components (g++ -> .so, ctypes).

The image bans pip/apt installs but ships g++; we compile the small C++
sources into shared objects next to this file, cached by source mtime.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
_CACHE: dict[str, ctypes.CDLL | None] = {}

_LINK_FLAGS = {
    "bgzf": ["-lz", "-lpthread"],
    "bamrec": ["-lpthread"],
    "fastq": ["-lpthread"],
}


def load_library(name: str) -> ctypes.CDLL | None:
    """Compile (if stale) and load lib<name>.so; None if build fails."""
    if name in _CACHE:
        return _CACHE[name]
    src = _DIR / f"{name}.cpp"
    so = _DIR / f"lib{name}.so"
    lib: ctypes.CDLL | None = None
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                   str(src), "-o", str(so)] + _LINK_FLAGS.get(name, [])
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(so))
    except (OSError, subprocess.SubprocessError):
        lib = None
    _CACHE[name] = lib
    return lib
