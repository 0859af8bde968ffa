"""On-demand build of the native host library (g++ -O3 shared object).

No pybind11 in this environment; the C API is consumed via ctypes. The
.so is cached next to the sources and rebuilt when any source is newer.
"""

from __future__ import annotations

import os
import subprocess
import threading

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libfemtpu.so")
_lock = threading.Lock()


def build_native(force: bool = False) -> str:
    with _lock:
        srcs = [
            os.path.join(_SRC_DIR, f)
            for f in sorted(os.listdir(_SRC_DIR))
            if f.endswith(".cpp")
        ]
        if not force and os.path.exists(_LIB_PATH):
            lib_mtime = os.path.getmtime(_LIB_PATH)
            if all(os.path.getmtime(s) <= lib_mtime for s in srcs):
                return _LIB_PATH
        cmd = [
            "g++",
            "-O3",
            "-march=native",
            "-std=c++17",
            "-shared",
            "-fPIC",
            "-Wall",
            "-o",
            _LIB_PATH,
            *srcs,
            "-lz",
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _LIB_PATH
