"""ctypes bindings for the native golden kernels.

Builds ``src/golden_kernels.cpp`` with g++ on first use (cached next to the
source); exposes numpy-facing wrappers. These are the framework's native
(C++) components — independent oracles for the JAX ops and a host-side
fallback, standing in for the reference's four closed-source MEX binaries.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "golden_kernels.cpp")
_SO = os.path.join(_DIR, "src", "golden_kernels.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
    return _SO


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_build())
        dp = ctypes.POINTER(ctypes.c_double)
        i64 = ctypes.c_int64
        dbl = ctypes.c_double
        _lib.proj_soc.argtypes = [dp, dp, i64, i64]
        _lib.bfd2d.argtypes = [dp, dp, dp, dp, i64, i64, i64, dbl, dbl]
        _lib.bfd_conj2d.argtypes = [dp, dp, dp, dp, i64, i64, i64, dbl]
        _lib.rb_sgs.argtypes = [dp, dp, i64, i64, i64, dbl, dbl, ctypes.c_int]
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def proj_soc(z: np.ndarray) -> np.ndarray:
    """Row-wise Lorentz projection; z has shape (cols, *cells)."""
    z = np.ascontiguousarray(z, np.float64)
    cols = z.shape[0]
    cells = z.size // cols
    out = np.empty_like(z)
    lib().proj_soc(_ptr(out), _ptr(z), cells, cols)
    return out


def bfd2d(q0, by, bx, nt, ny, nx, scale_bf, scale_d) -> np.ndarray:
    q0 = np.ascontiguousarray(q0, np.float64)
    by = np.ascontiguousarray(by, np.float64)
    bx = np.ascontiguousarray(bx, np.float64)
    z = np.empty((10, nt - 1, ny, nx), np.float64)
    lib().bfd2d(_ptr(z), _ptr(q0), _ptr(by), _ptr(bx), nt, ny, nx,
                float(scale_bf), float(scale_d))
    return z


def bfd_conj2d(x, nt, ny, nx, scale_bf) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    x = np.ascontiguousarray(x, np.float64)
    q0 = np.empty((nt - 1, ny, nx), np.float64)
    by = np.empty((nt, ny - 1, nx), np.float64)
    bx = np.empty((nt, ny, nx - 1), np.float64)
    lib().bfd_conj2d(_ptr(q0), _ptr(by), _ptr(bx), _ptr(x), nt, ny, nx,
                     float(scale_bf))
    return q0, by, bx


def rb_sgs(phi, rhs, scale, eps=0.0, its=1) -> np.ndarray:
    phi = np.array(phi, np.float64)  # updated in place on a copy
    rhs = np.ascontiguousarray(rhs, np.float64)
    nt, ny, nx = phi.shape
    lib().rb_sgs(_ptr(phi), _ptr(rhs), nt, ny, nx, float(scale), float(eps),
                 int(its))
    return phi
