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
_BASELINE_PATH = os.path.join(os.path.dirname(__file__), "fem_baseline")
_lock = threading.Lock()

_CXXFLAGS = ["-O3", "-march=native", "-std=c++17", "-Wall"]


def _stale(target: str, srcs: list[str]) -> bool:
    if not os.path.exists(target):
        return True
    t = os.path.getmtime(target)
    return any(os.path.getmtime(s) > t for s in srcs)


_MAINS = ("baseline.cpp", "tsan_stress.cpp")  # standalone binaries


def _sources(exclude_main: bool) -> list[str]:
    out = []
    for f in sorted(os.listdir(_SRC_DIR)):
        if f.endswith(".cpp") and (not exclude_main or f not in _MAINS):
            out.append(os.path.join(_SRC_DIR, f))
    return out


def build_native(force: bool = False) -> str:
    """Build the shared library consumed via ctypes."""
    with _lock:
        srcs = _sources(exclude_main=True)
        hdrs = [
            os.path.join(_SRC_DIR, f)
            for f in os.listdir(_SRC_DIR)
            if f.endswith(".h")
        ]
        if force or _stale(_LIB_PATH, srcs + hdrs):
            cmd = ["g++", *_CXXFLAGS, "-pthread", "-shared", "-fPIC", "-o", _LIB_PATH, *srcs, "-lz"]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _LIB_PATH


def build_baseline(force: bool = False) -> str:
    """Build the standalone fem_baseline CPU mapper binary."""
    with _lock:
        src = os.path.join(_SRC_DIR, "baseline.cpp")
        hdrs = [
            os.path.join(_SRC_DIR, f)
            for f in os.listdir(_SRC_DIR)
            if f.endswith(".h")
        ]
        if force or _stale(_BASELINE_PATH, [src] + hdrs):
            cmd = ["g++", *_CXXFLAGS, "-pthread", "-o", _BASELINE_PATH, src, "-lz"]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _BASELINE_PATH


def build_tsan_stress(force: bool = False) -> str:
    """Build the ThreadSanitizer stress binary (tsan_stress.cpp + the
    library sources, -O1 -fsanitize=thread). Raises on toolchains without
    TSAN support; callers (tests/test_native.py) skip in that case."""
    target = os.path.join(os.path.dirname(__file__), "tsan_stress")
    with _lock:
        srcs = [os.path.join(_SRC_DIR, "tsan_stress.cpp")] + _sources(
            exclude_main=True
        )
        hdrs = [
            os.path.join(_SRC_DIR, f)
            for f in os.listdir(_SRC_DIR)
            if f.endswith(".h")
        ]
        if force or _stale(target, srcs + hdrs):
            cmd = [
                "g++", "-O1", "-g", "-std=c++17", "-Wall",
                "-fsanitize=thread", "-pthread", "-o", target, *srcs, "-lz",
            ]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        return target
