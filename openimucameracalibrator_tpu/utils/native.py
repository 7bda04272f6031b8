"""Build/load helper for the framework's native (C++) components.

Shared objects are compiled on demand with the system toolchain into the
package's ``native/build`` directory and cached by source mtime; loading
goes through ctypes (no pybind11 dependency).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LOCK = threading.Lock()
_CACHE: dict = {}


class NativeBuildError(RuntimeError):
    pass


def load_library(name: str) -> ctypes.CDLL:
    """Load lib<name>.so, compiling native/<name>.cc first if needed."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_NATIVE_DIR, f"{name}.cc")
        if not os.path.exists(src):
            raise NativeBuildError(f"native source not found: {src}")
        os.makedirs(_BUILD_DIR, exist_ok=True)
        out = os.path.join(_BUILD_DIR, f"lib{name}.so")
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", out, src]
            proc = subprocess.run(cmd, capture_output=True, text=True)
            if proc.returncode != 0:
                raise NativeBuildError(
                    f"building {name} failed:\n{proc.stderr[-4000:]}")
        lib = ctypes.CDLL(out)
        _CACHE[name] = lib
        return lib
