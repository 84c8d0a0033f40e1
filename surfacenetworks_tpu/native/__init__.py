"""ctypes bindings for the native host runtime (csrc/snx_native.cc).

The native library covers the host-side hot path of data loading — mesh
operator assembly straight into the padded-ELL device layout — replacing the
reference's libigl C++ dependency (geom_utils.py:200-260) and the host half
of its CUDA sparse runtime (COO→CSR conversion, batch_csr.cu).  Every entry
point has a NumPy fallback in :mod:`surfacenetworks_tpu.geometry.mesh_ops` /
:mod:`surfacenetworks_tpu.sparse.ell`; parity between the two is pinned by
``tests/test_native.py``.

The shared library is built on first use with ``g++`` (no pip involved) and
cached next to the source.  ``available()`` reports whether the native path
is usable; all public helpers silently fall back when it is not.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libsnx_native.so")
_SRC = os.path.join(_CSRC, "snx_native.cc")

_lock = threading.Lock()
_lib = None
_tried = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _build() -> bool:
    """Compile csrc/snx_native.cc to libsnx_native.so.  Returns success."""
    if not os.path.exists(_SRC):
        return False
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-march=native",
        "-fPIC",
        "-std=c++17",
        "-shared",
        "-o",
        _SO,
        _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SNX_NO_NATIVE"):
            return None
        stale = not os.path.exists(_SO) or (
            os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        )
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.snx_abi_version.restype = ctypes.c_int32
        if lib.snx_abi_version() != 1:
            return None
        lib.snx_igl_laplacian_ell.restype = ctypes.c_int32
        lib.snx_igl_laplacian_ell.argtypes = [
            _f64p, ctypes.c_int64, _i32p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            _i32p, _f32p, _i32p, _f32p,
        ]
        lib.snx_mesh_laplacian_ell.restype = ctypes.c_int32
        lib.snx_mesh_laplacian_ell.argtypes = [
            _f64p, ctypes.c_int64, _i32p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            _i32p, _f32p, _i32p, _f32p,
        ]
        lib.snx_dirac_coeffs.restype = ctypes.c_int32
        lib.snx_dirac_coeffs.argtypes = [
            _f64p, ctypes.c_int64, _i32p, ctypes.c_int64, ctypes.c_int32,
            _f32p, _i32p, _i32p, _f32p, _f32p, _f32p,
        ]
        lib.snx_csr_to_ell.restype = ctypes.c_int32
        lib.snx_csr_to_ell.argtypes = [
            _i64p, _i32p, _f32p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32, _i32p, _f32p,
        ]
        lib.snx_csr_to_ell_both.restype = ctypes.c_int32
        lib.snx_csr_to_ell_both.argtypes = [
            _i64p, _i32p, _f32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            _i32p, _f32p, _i32p, _f32p,
        ]
        lib.snx_vertex_normals.restype = None
        lib.snx_vertex_normals.argtypes = [_f64p, ctypes.c_int64, _i32p, ctypes.c_int64, _f32p]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library loaded (builds it on first call)."""
    return _load() is not None


def _prep(V: np.ndarray, F: np.ndarray):
    V = np.ascontiguousarray(V, dtype=np.float64)
    F = np.ascontiguousarray(F, dtype=np.int32)
    return V, F


def igl_laplacian_ell_arrays(
    V: np.ndarray,
    F: np.ndarray,
    n_rows: int,
    k: int,
    k_t: int | None = None,
    hack: float | None = 1.0,
):
    """igl-convention Laplacian as padded-ELL (fwd + transpose) arrays.

    Returns ``(fwd_cols, fwd_vals, bwd_cols, bwd_vals)`` or ``None`` when the
    native library is unavailable.  Raises ``ValueError`` when ``k``/``k_t``
    is smaller than the max row degree (mirrors ell_from_scipy).
    """
    lib = _load()
    if lib is None:
        return None
    V, F = _prep(V, F)
    k_t = k if k_t is None else k_t
    fwd_cols = np.empty((n_rows, k), np.int32)
    fwd_vals = np.empty((n_rows, k), np.float32)
    bwd_cols = np.empty((n_rows, k_t), np.int32)
    bwd_vals = np.empty((n_rows, k_t), np.float32)
    rc = lib.snx_igl_laplacian_ell(
        V, V.shape[0], F, F.shape[0],
        0.0 if hack is None else float(hack), 0 if hack is None else 1,
        n_rows, k, k_t, fwd_cols, fwd_vals, bwd_cols, bwd_vals,
    )
    if rc:
        raise ValueError(f"ELL k too small: need {rc}")
    return fwd_cols, fwd_vals, bwd_cols, bwd_vals


def mesh_laplacian_ell_arrays(V: np.ndarray, F: np.ndarray, n_rows: int, k: int, k_t: int | None = None):
    """mesh.py-convention Laplacian as padded-ELL (fwd + transpose) arrays."""
    lib = _load()
    if lib is None:
        return None
    V, F = _prep(V, F)
    k_t = k if k_t is None else k_t
    fwd_cols = np.empty((n_rows, k), np.int32)
    fwd_vals = np.empty((n_rows, k), np.float32)
    bwd_cols = np.empty((n_rows, k_t), np.int32)
    bwd_vals = np.empty((n_rows, k_t), np.float32)
    rc = lib.snx_mesh_laplacian_ell(
        V, V.shape[0], F, F.shape[0], n_rows, k, k_t,
        fwd_cols, fwd_vals, bwd_cols, bwd_vals,
    )
    if rc:
        raise ValueError(f"ELL k too small: need {rc}")
    return fwd_cols, fwd_vals, bwd_cols, bwd_vals


def laplacian_ell_operator(
    V: np.ndarray,
    F: np.ndarray,
    n_rows: int,
    k: int,
    k_t: int | None = None,
    convention: str = "igl",
    hack: float | None = 1.0,
):
    """Assemble an :class:`~surfacenetworks_tpu.sparse.ell.EllOperator`
    straight from (V, F) — native when possible, scipy fallback otherwise.

    This is the data-loading fast path: the scipy intermediate of
    ``geometry.igl_style_laplacian`` → ``sparse.operator_from_scipy`` is
    skipped entirely when the native library is present.
    """
    from surfacenetworks_tpu.sparse.ell import EllMatrix, EllOperator

    k_t = k if k_t is None else k_t
    if convention == "igl":
        arrays = igl_laplacian_ell_arrays(V, F, n_rows, k, k_t, hack=hack)
    elif convention == "mesh":
        arrays = mesh_laplacian_ell_arrays(V, F, n_rows, k, k_t)
    else:
        raise ValueError(f"unknown convention {convention!r}")
    if arrays is not None:
        from surfacenetworks_tpu.sparse.ell import _ell_window

        fc, fv, bc, bv = arrays
        return EllOperator(
            fwd=EllMatrix(cols=fc, vals=fv, n_cols=n_rows,
                          window=_ell_window(fc, fv, n_rows)),
            bwd=EllMatrix(cols=bc, vals=bv, n_cols=n_rows,
                          window=_ell_window(bc, bv, n_rows)),
        )
    # NumPy fallback
    from surfacenetworks_tpu.geometry import mesh_ops
    from surfacenetworks_tpu.sparse.ell import operator_from_scipy

    if convention == "igl":
        L = mesh_ops.igl_style_laplacian(V, F, hack=hack)
    else:
        L = mesh_ops.mesh_laplacian(V, F)
    return operator_from_scipy(L.tocsr(), k=k, n_rows=n_rows, n_cols=n_rows)


def dirac_coeffs(V: np.ndarray, F: np.ndarray, max_valence: int | None = None):
    """Native Dirac coefficient tables; falls back to mesh_ops.dirac_coeffs."""
    from surfacenetworks_tpu.geometry import mesh_ops

    lib = _load()
    if lib is None:
        return mesh_ops.dirac_coeffs(V, F, max_valence=max_valence)
    V, F = _prep(V, F)
    n, m = V.shape[0], F.shape[0]
    if max_valence is None:
        Kv = int(np.bincount(F.reshape(-1), minlength=n).max()) if m else 1
    else:
        Kv = max_valence
    q_fv = np.empty((m, 3, 4), np.float32)
    vf_face = np.empty((n, Kv), np.int32)
    vf_corner = np.empty((n, Kv), np.int32)
    q_vf = np.empty((n, Kv, 4), np.float32)
    q_bwd_v = np.empty((n, Kv, 4), np.float32)
    q_bwd_f = np.empty((m, 3, 4), np.float32)
    lib.snx_dirac_coeffs(V, n, F, m, Kv, q_fv, vf_face, vf_corner, q_vf, q_bwd_v, q_bwd_f)
    return mesh_ops.DiracCoeffs(
        F=F, q_fv=q_fv, vf_face=vf_face, vf_corner=vf_corner, q_vf=q_vf,
        q_bwd_v=q_bwd_v, q_bwd_f=q_bwd_f, n_vertices=n, n_faces=m,
    )


def csr_to_ell_arrays(csr, n_rows: int, k: int):
    """Pack a scipy CSR matrix into ELL (cols, vals) natively; None if
    unavailable."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(csr.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(csr.indices, dtype=np.int32)
    data = np.ascontiguousarray(csr.data, dtype=np.float32)
    cols = np.empty((n_rows, k), np.int32)
    vals = np.empty((n_rows, k), np.float32)
    rc = lib.snx_csr_to_ell(indptr, indices, data, csr.shape[0], n_rows, k, cols, vals)
    if rc:
        raise ValueError(f"ELL k too small: need {rc}")
    return cols, vals


def ell_operator_from_csr(csr, n_rows: int, k: int, k_t: int):
    """Native CSR -> EllOperator (fwd + stored transpose); None if the
    library is unavailable.  One pass, no scipy transpose."""
    lib = _load()
    if lib is None:
        return None
    from surfacenetworks_tpu.sparse.ell import EllMatrix, EllOperator

    indptr = np.ascontiguousarray(csr.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(csr.indices, dtype=np.int32)
    data = np.ascontiguousarray(csr.data, dtype=np.float32)
    cols = np.empty((n_rows, k), np.int32)
    vals = np.empty((n_rows, k), np.float32)
    t_cols = np.empty((n_rows, k_t), np.int32)
    t_vals = np.empty((n_rows, k_t), np.float32)
    rc = lib.snx_csr_to_ell_both(
        indptr, indices, data, csr.shape[0], csr.shape[1],
        n_rows, k, k_t, cols, vals, t_cols, t_vals,
    )
    if rc:
        raise ValueError(f"ELL k too small: need {rc}")
    from surfacenetworks_tpu.sparse.ell import _ell_window

    return EllOperator(
        fwd=EllMatrix(cols=cols, vals=vals, n_cols=n_rows,
                      window=_ell_window(cols, vals, n_rows)),
        bwd=EllMatrix(cols=t_cols, vals=t_vals, n_cols=n_rows,
                      window=_ell_window(t_cols, t_vals, n_rows)),
    )


def vertex_normals(V: np.ndarray, F: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals — native or NumPy fallback."""
    lib = _load()
    if lib is None:
        from surfacenetworks_tpu.geometry import mesh_ops

        return mesh_ops.vertex_normals(V, F).astype(np.float32)
    V, F = _prep(V, F)
    out = np.empty((V.shape[0], 3), np.float32)
    lib.snx_vertex_normals(V, V.shape[0], F, F.shape[0], out)
    return out
