"""Native (C++) host-runtime components, loaded via ctypes.

The reference's control plane is native compiled code end to end (Fortran
grid init, C GPTL timers — SURVEY.md §2.1/§2.4); here the device compute
path is JAX/XLA and the host control plane is Python, with the
scaling-critical table construction in C++:

* gridtables.cpp — point-coincidence grouping + DSS partner tables +
  element neighbor lists + unique-point owners (cube_mod/dof_mod/
  schedule_mod analog).  O(N) with hashing; the numpy fallback in
  grid/cubesphere.py is O(N log N) with Python-level group loops.

The shared library is compiled on first use with g++ (cached beside the
source, keyed on source mtime); if no compiler is available the callers
fall back to the pure-numpy implementations, so the native path is an
accelerator, never a requirement.  Set TRANSPORT_SE_NO_NATIVE=1 to force
the fallback (used by tests to compare both paths).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gridtables.cpp")
_SO = os.path.join(_DIR, "_gridtables.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if os.environ.get("TRANSPORT_SE_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        fresh = (os.path.exists(_SO)
                 and os.path.getmtime(_SO) >= os.path.getmtime(_SRC))
        if not fresh and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.build_point_tables.restype = ctypes.c_int64
        lib.build_point_tables.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def build_point_tables(xyz: np.ndarray, np2: int, quantum: float):
    """Run the native table builder.

    Returns (gid[N] int32, part_idx[N,3] int32, part_mask[N,3] bool,
    nbr[E,9] int32, uniq_src[ngid] int64) or None if unavailable.
    Raises RuntimeError on grouping failure (same conditions as the
    numpy path's multiplicity/neighbor checks).
    """
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, dtype=np.float64)
    n = xyz.shape[0]
    E = n // np2
    gid = np.empty(n, dtype=np.int32)
    part_idx = np.empty((n, 3), dtype=np.int32)
    part_mask = np.empty((n, 3), dtype=np.uint8)
    nbr = np.empty((E, 9), dtype=np.int32)
    uniq_src = np.empty(n, dtype=np.int64)
    ngid = np.zeros(1, dtype=np.int64)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.build_point_tables(
        p(xyz, ctypes.c_double), n, np2, quantum,
        p(gid, ctypes.c_int32), p(part_idx, ctypes.c_int32),
        p(part_mask, ctypes.c_uint8), p(nbr, ctypes.c_int32),
        p(uniq_src, ctypes.c_int64), p(ngid, ctypes.c_int64))
    if rc == -1:
        raise RuntimeError("grid point multiplicity > 4 (native)")
    if rc == -2:
        raise RuntimeError("element has > 8 neighbors (native)")
    if rc != 0:
        raise RuntimeError(f"native table builder failed rc={rc}")
    k = int(ngid[0])
    return gid, part_idx, part_mask.astype(bool), nbr, uniq_src[:k].copy()
