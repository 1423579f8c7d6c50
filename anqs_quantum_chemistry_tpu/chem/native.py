"""ctypes bindings for the native Slater-Condon builder (csrc/).

Compiled on demand with g++ (cached next to the source); falls back to the
pure-Python path in chem/fci.py when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _csrc_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "csrc"
    )


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_csrc_dir(), "slater_condon.cpp")
    # Build into a cache dir keyed by source content hash: mtimes are
    # meaningless after a fresh clone and the binary is never checked in.
    import hashlib

    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(_csrc_dir(), os.pardir, ".cache")
    lib_path = os.path.join(
        os.path.abspath(cache_dir), f"libslater_condon_{tag}.so"
    )
    try:
        os.makedirs(os.path.dirname(lib_path), exist_ok=True)
        if not os.path.exists(lib_path):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, src],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(lib_path)
        lib.slater_condon_build.restype = ctypes.c_int64
        lib.slater_condon_build.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_double,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def sparse_hamiltonian_native(dets, h1, v, tol: float = 1e-14):
    """COO (rows, cols, vals) of H over sorted determinant list, or None."""
    lib = _load()
    if lib is None:
        return None
    dets_arr = np.ascontiguousarray(dets, dtype=np.uint64)
    h1_arr = np.ascontiguousarray(h1, dtype=np.float64)
    v_arr = np.ascontiguousarray(v, dtype=np.float64)
    n_so = h1_arr.shape[0]

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    null_i = ctypes.POINTER(ctypes.c_int64)()
    null_d = ctypes.POINTER(ctypes.c_double)()
    nnz = lib.slater_condon_build(
        ptr(dets_arr, ctypes.c_uint64), len(dets_arr), n_so,
        ptr(h1_arr, ctypes.c_double), ptr(v_arr, ctypes.c_double),
        tol, 0, null_i, null_i, null_d,
    )
    rows = np.empty(nnz, dtype=np.int64)
    cols = np.empty(nnz, dtype=np.int64)
    vals = np.empty(nnz, dtype=np.float64)
    filled = lib.slater_condon_build(
        ptr(dets_arr, ctypes.c_uint64), len(dets_arr), n_so,
        ptr(h1_arr, ctypes.c_double), ptr(v_arr, ctypes.c_double),
        tol, 1,
        ptr(rows, ctypes.c_int64), ptr(cols, ctypes.c_int64),
        ptr(vals, ctypes.c_double),
    )
    assert filled == nnz
    return rows, cols, vals
