"""ctypes loader for the native host kernels (csrc/kidhost.cpp).

Compiles on first use with ``g++ -O2 -shared -fPIC`` into the package
directory and falls back to the pure-numpy implementations when no
compiler is available — the native path is a performance feature
(makeberg-scale bond init is O(n) here vs O(n^2) in numpy), never a
correctness requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "csrc", "kidhost.cpp")
    so = os.path.join(here, "_kidhost.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", so,
                            src], check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.kid_bond_init.restype = ctypes.c_int64
        lib.kid_bond_init.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_double, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
        ]
        lib.kid_conglom_label.restype = None
        lib.kid_conglom_label.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def bond_init(lon, lat, R, crit_const, latlon, Rearth, max_bonds):
    """Cell-hashed bond table; returns (bond_idx, bond_len, n_bonds).

    Same semantics as the numpy path in forces.initialize_bonds_host:
    partners in ascending slot order, first ``max_bonds`` kept,
    n_bonds = uncapped partner count.
    """
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native kidhost unavailable")
    n = len(lon)
    bond_idx = np.full((n, max_bonds), -1, np.int32)
    bond_len = np.zeros((n, max_bonds), np.float64)
    n_bonds = np.zeros((n,), np.float64)
    lib.kid_bond_init(n, np.ascontiguousarray(lon, np.float64),
                      np.ascontiguousarray(lat, np.float64),
                      np.ascontiguousarray(R, np.float64),
                      float(crit_const), int(bool(latlon)), float(Rearth),
                      int(max_bonds), bond_idx, bond_len, n_bonds)
    return bond_idx, bond_len, n_bonds


def conglom_label(bond_idx):
    """Union-find connected components; 1-based ids, 0 for unbonded."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native kidhost unavailable")
    bond_idx = np.ascontiguousarray(bond_idx, np.int32)
    n, B = bond_idx.shape
    labels = np.zeros((n,), np.int32)
    lib.kid_conglom_label(n, bond_idx, B, labels)
    return labels
