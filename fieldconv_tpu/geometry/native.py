"""ctypes binding for libgeomcore.so (geometry/csrc/geomcore.cpp).

Loads lazily; callers fall back to the pure-Python path when the library is
not built.  Build with `make -C fieldconv_tpu/geometry/csrc`.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "csrc", "libgeomcore.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.gc_mesh_build.restype = ctypes.c_int
    lib.gc_mesh_build.argtypes = [
        f64p, ctypes.c_int64, i64p, ctypes.c_int64,
        i64p, i64p, f64p, f64p, f64p, f64p, f64p, u8p, f64p, f64p,
    ]
    lib.gc_cg_solve.restype = ctypes.c_int
    lib.gc_cg_solve.argtypes = [
        i64p, i64p, f64p, ctypes.c_int64, f64p, f64p, ctypes.c_int64,
        ctypes.c_double, ctypes.c_int64,
    ]
    lib.gc_cg_solve_complex.restype = ctypes.c_int
    lib.gc_cg_solve_complex.argtypes = [
        i64p, i64p, f64p, f64p, ctypes.c_int64, f64p, f64p, f64p, f64p,
        ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
    ]
    lib.gc_fps.restype = None
    lib.gc_fps.argtypes = [f64p, ctypes.c_int64, ctypes.c_int64,
                           ctypes.c_int64, i64p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def mesh_build(pos: np.ndarray, faces: np.ndarray):
    """Run the native halfedge/frame assembly.  Returns a dict of arrays
    (see geomcore.cpp gc_mesh_build docs) or None if unavailable/failed."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    faces = np.ascontiguousarray(faces, dtype=np.int64)
    n, m = len(pos), len(faces)
    H = 3 * m
    out = dict(
        he=np.empty((H, 2), np.int64),
        he_twin=np.empty(H, np.int64),
        he_angle=np.empty(H, np.float64),
        corner=np.empty(H, np.float64),
        cot_half=np.empty(H, np.float64),
        rot_re=np.empty(H, np.float64),
        rot_im=np.empty(H, np.float64),
        boundary=np.empty(n, np.uint8),
        angle_sum=np.empty(n, np.float64),
        mass=np.empty(n, np.float64),
    )
    rc = lib.gc_mesh_build(
        pos, n, faces.reshape(-1), m,
        out["he"].reshape(-1), out["he_twin"], out["he_angle"], out["corner"],
        out["cot_half"], out["rot_re"], out["rot_im"], out["boundary"],
        out["angle_sum"], out["mass"],
    )
    if rc != 0:
        return None
    return out


def cg_solve(A_csr, b: np.ndarray, tol=1e-10, maxiter=10000) -> np.ndarray:
    """Native Jacobi-CG for SPD CSR systems; b (n,) or (n, S)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libgeomcore.so not built")
    b2 = np.ascontiguousarray(
        b.reshape(len(b), -1) if b.ndim > 1 else b[:, None], dtype=np.float64
    )
    x = np.zeros_like(b2)
    rc = lib.gc_cg_solve(
        A_csr.indptr.astype(np.int64), A_csr.indices.astype(np.int64),
        np.ascontiguousarray(A_csr.data, np.float64), A_csr.shape[0],
        b2, x, b2.shape[1], tol, maxiter,
    )
    if rc < 0:
        raise RuntimeError("CG did not converge")
    return x.reshape(b.shape)


def cg_solve_complex(A_csr, b: np.ndarray, tol=1e-10, maxiter=10000) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("libgeomcore.so not built")
    b2 = b.reshape(len(b), -1) if b.ndim > 1 else b[:, None]
    br = np.ascontiguousarray(b2.real, np.float64)
    bi = np.ascontiguousarray(b2.imag, np.float64)
    xr = np.zeros_like(br)
    xi = np.zeros_like(bi)
    rc = lib.gc_cg_solve_complex(
        A_csr.indptr.astype(np.int64), A_csr.indices.astype(np.int64),
        np.ascontiguousarray(A_csr.data.real, np.float64),
        np.ascontiguousarray(A_csr.data.imag, np.float64),
        A_csr.shape[0], br, bi, xr, xi, br.shape[1], tol, maxiter,
    )
    if rc < 0:
        raise RuntimeError("complex CG did not converge")
    return (xr + 1j * xi).reshape(b.shape)


def fps(pos: np.ndarray, n_samples: int, start: int = 0) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("libgeomcore.so not built")
    pos = np.ascontiguousarray(pos, np.float64)
    out = np.empty(n_samples, np.int64)
    lib.gc_fps(pos, len(pos), n_samples, start, out)
    return out
