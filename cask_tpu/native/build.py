"""Build the native preprocessing core (g++ → shared library).

No pybind11 in this image, so the ABI is plain C consumed via ctypes.
The library is compiled lazily on first use and cached next to the
source; a stale cache (source newer than .so) triggers a rebuild.
Failures are non-fatal — every native routine has a numpy fallback.
"""

from __future__ import annotations

import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "preprocess.cpp")
_LIB = os.path.join(_HERE, "_libcasknative.so")
_lock = threading.Lock()


def lib_path(rebuild: bool = False) -> Optional[str]:
    """Path to the built library, building if needed; None if unbuildable."""
    with _lock:
        try:
            fresh = (
                os.path.exists(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
            )
            if fresh and not rebuild:
                return _LIB
            cxx = os.environ.get("CXX", "g++")
            cmd = [
                cxx, "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", "-o", _LIB, _SRC,
            ]
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
            if r.returncode != 0:
                # retry without -march=native (portability)
                cmd.remove("-march=native")
                r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
            if r.returncode != 0:
                return None
            return _LIB
        except (OSError, subprocess.SubprocessError):
            return None
