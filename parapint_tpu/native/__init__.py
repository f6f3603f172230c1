"""Native (C++) host components.

``bk_ldl.cpp`` provides the pivoted Bunch-Kaufman LDL^T factorization (the
HSL MA27 role of the reference).  It is compiled on demand with g++ into the
package directory and loaded through ctypes — no pybind11 dependency.
"""

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bk_ldl.cpp")
_lock = threading.Lock()
_lib = None


def _lib_path() -> str:
    """Shared-object path keyed by the source content hash.

    The binary is never committed (it is .gitignore'd); naming it by the
    sha256 of bk_ldl.cpp means a stale or tampered build artifact can never
    be loaded for changed source — the loader only ever dlopens the build
    of exactly this source text.
    """
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_HERE, f"libbkldl-{digest}.so")


def _build(lib_path: str) -> None:
    tmp = lib_path + f".tmp{os.getpid()}"
    cmd = [
        "g++",
        "-O3",
        "-fopenmp",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, lib_path)


def load():
    """Load (building from source if necessary) the native library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib_path = _lib_path()
        if not os.path.exists(lib_path):
            _build(lib_path)
        lib = ctypes.CDLL(lib_path)
        i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
        lib.bk_factor_batched.argtypes = [f64p, ctypes.c_int, ctypes.c_int, i32p, i32p]
        lib.bk_factor_batched.restype = None
        lib.bk_solve_batched.argtypes = [
            f64p,
            ctypes.c_int,
            ctypes.c_int,
            i32p,
            f64p,
            ctypes.c_int,
        ]
        lib.bk_solve_batched.restype = None
        lib.bk_inertia_batched.argtypes = [
            f64p,
            ctypes.c_int,
            ctypes.c_int,
            i32p,
            i32p,
            i32p,
            i32p,
        ]
        lib.bk_inertia_batched.restype = None
        _lib = lib
        return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def bk_factor(A: np.ndarray):
    """Factor a batch of symmetric matrices.

    A: (nb, n, n) float64, C-contiguous.  NOTE the kernel is written for
    column-major storage, so factoring the row-major buffer actually factors
    A^T per block; symmetric input makes this a no-op.

    Returns (factors, ipiv, infos): factors overwrite a copy of A.
    """
    lib = load()
    A = np.ascontiguousarray(A, dtype=np.float64).copy()
    nb, n, n2 = A.shape
    assert n == n2
    ipiv = np.zeros((nb, n), dtype=np.int32)
    infos = np.zeros(nb, dtype=np.int32)
    lib.bk_factor_batched(A, nb, n, ipiv, infos)
    return A, ipiv, infos


def bk_solve(factors: np.ndarray, ipiv: np.ndarray, B: np.ndarray):
    """Solve for a batch: B is (nb, nrhs, n) row-major (each RHS is one row,
    matching the column-major kernel's (n, nrhs) layout)."""
    lib = load()
    nb, n, _ = factors.shape
    B = np.ascontiguousarray(B, dtype=np.float64).copy()
    nrhs = B.shape[1]
    assert B.shape == (nb, nrhs, n)
    lib.bk_solve_batched(factors, nb, n, ipiv, B, nrhs)
    return B


def bk_inertia(factors: np.ndarray, ipiv: np.ndarray):
    lib = load()
    nb, n, _ = factors.shape
    pos = np.zeros(nb, dtype=np.int32)
    neg = np.zeros(nb, dtype=np.int32)
    zero = np.zeros(nb, dtype=np.int32)
    lib.bk_inertia_batched(factors, nb, n, ipiv, pos, neg, zero)
    return pos, neg, zero
