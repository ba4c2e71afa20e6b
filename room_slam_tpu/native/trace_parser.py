"""ctypes binding for the native trace parser (trace_parser.cc).

Builds lazily with g++ on first use (cached as ``libtraceparser.so`` next to
this file); any failure — no compiler, parse anomaly — falls back to the
python parser in data/formats.py. Set ``ROOM_SLAM_TPU_NO_NATIVE=1`` to
disable entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "trace_parser.cc"
_LIB = _HERE / "libtraceparser.so"
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    if os.environ.get("ROOM_SLAM_TPU_NO_NATIVE"):
        _failed = True
        return None
    try:
        if (not _LIB.exists()
                or _LIB.stat().st_mtime < _SRC.stat().st_mtime):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", str(_SRC),
                 "-o", str(_LIB)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB))
        lib.parse_trace_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
        lib.parse_trace_file.restype = ctypes.c_long
        lib.free_trace.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.free_trace.restype = None
        _lib = lib
    except Exception:  # noqa: BLE001 - build/load failure => python fallback
        _failed = True
    return _lib


def parse_trace_file(path: str) -> Optional[np.ndarray]:
    """Parse a trace JSON file natively -> ``[N, 4]`` float32 (x, y, z, t),
    or None if the native path is unavailable / declined the file."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.parse_trace_file(path.encode(), ctypes.byref(out))
    if n < 0:
        return None
    try:
        if n == 0:
            return np.zeros((0, 4), dtype=np.float32)
        arr = np.ctypeslib.as_array(out, shape=(n, 4)).copy()
    finally:
        if n > 0:
            lib.free_trace(out)
    return arr
