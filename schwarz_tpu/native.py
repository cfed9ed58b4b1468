"""ctypes bindings for the native setup kernels (native/setup_ops.cpp).

The reference's setup path is C++ (restricted_schwarz.cpp:55-304); ours is
numpy with an optional native fast path for the per-subdomain hot loops (BFS
closure, ELL split, CSR permutation).  The library is built with
``make -C native`` (attempted automatically once per process); if unavailable
— or if ``SCHWARZ_TPU_NATIVE=0`` — everything falls back to the numpy
implementations in :mod:`schwarz_tpu.core.decompose`, which are semantically
identical (tests assert bit-equality).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_I64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_I32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_I8 = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
_F64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _native_dir() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parent.parent / "native"


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SCHWARZ_TPU_NATIVE", "1") == "0":
        return None
    so = _native_dir() / "libschwz_setup.so"
    # ALWAYS invoke make: it is a no-op when the .so is newer than the
    # source, and it rebuilds after setup_ops.cpp edits (a stale library
    # would silently validate the bit-equality tests against old code)
    try:
        subprocess.run(
            ["make", "-C", str(_native_dir())],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        pass
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None

    c = ctypes.c_int64
    lib.schwz_closure.argtypes = [
        c, _I64, _I64, c, c, c, _I8, _I64, ctypes.POINTER(c), _I64,
        ctypes.POINTER(c),
    ]
    lib.schwz_closure.restype = ctypes.c_int
    lib.schwz_row_widths.argtypes = [
        _I64, _I64, _I64, _I64, c, c, ctypes.POINTER(c), ctypes.POINTER(c),
    ]
    lib.schwz_row_widths.restype = ctypes.c_int
    lib.schwz_ell_fill.argtypes = [
        _I64, _I64, _F64, _I64, _I64, c, c, c, c, _I32, _F64, _I32, _F64,
    ]
    lib.schwz_ell_fill.restype = ctypes.c_int
    lib.schwz_permute_csr.argtypes = [
        c, _I64, _I64, _F64, _I64, _I64, _I64, _I64, _F64,
    ]
    lib.schwz_permute_csr.restype = ctypes.c_int
    lib.schwz_hem.argtypes = [c, _I64, _I64, _I64, _I64, _I64, _I64]
    lib.schwz_hem.restype = c
    lib.schwz_fm_refine.argtypes = [c, _I64, _I64, _I8, _I64, c, c, c, c]
    lib.schwz_fm_refine.restype = c
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


def closure(indptr, indices, first, last, rings, visited_buf, n):
    """Native BFS closure; returns (closure_rows, ghost_rows)."""
    lib = load()
    out_c = np.empty(n, dtype=np.int64)
    out_g = np.empty(n, dtype=np.int64)
    nrows = ctypes.c_int64()
    nghost = ctypes.c_int64()
    rc = lib.schwz_closure(
        n, indptr, indices, int(first), int(last), int(rings),
        visited_buf, out_c, ctypes.byref(nrows), out_g, ctypes.byref(nghost),
    )
    assert rc == 0
    return out_c[: nrows.value].copy(), out_g[: nghost.value].copy()


def row_widths(indptr, indices, g2l, closure_rows, rows_count):
    lib = load()
    wl = ctypes.c_int64()
    wi = ctypes.c_int64()
    rc = lib.schwz_row_widths(
        indptr, indices, g2l, closure_rows, closure_rows.shape[0],
        int(rows_count), ctypes.byref(wl), ctypes.byref(wi),
    )
    assert rc == 0
    return wl.value, wi.value


def ell_fill(indptr, indices, values, g2l, closure_rows, rows_count,
             lcols, lvals, icols, ivals):
    """Fill pre-allocated (R_rows, W) ELL arrays for one subdomain in place."""
    lib = load()
    Wl = lvals.shape[1] if lvals.size else 0
    Wi = ivals.shape[1] if ivals.size else 0
    rc = lib.schwz_ell_fill(
        indptr, indices, values, g2l, closure_rows, closure_rows.shape[0],
        int(rows_count), Wl, Wi,
        lcols.reshape(-1), lvals.reshape(-1),
        icols.reshape(-1), ivals.reshape(-1),
    )
    assert rc == 0


def heavy_edge_matching(indptr, indices, weights, order):
    """Native HEM coarsening level; returns (coarse_map, n_coarse)."""
    lib = load()
    n = indptr.shape[0] - 1
    matched = np.empty(n, dtype=np.int64)
    coarse_map = np.empty(n, dtype=np.int64)
    nc = lib.schwz_hem(
        n,
        np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int64),
        np.ascontiguousarray(weights, np.int64),
        np.ascontiguousarray(order, np.int64),
        matched, coarse_map,
    )
    return coarse_map, int(nc)


def fm_refine(ptr, cols, side_i8, weights, lo, hi, size0, rounds):
    """Native FM refinement rounds (bit-identical to the python heapq path);
    side_i8 updated in place, returns the final side-0 weight."""
    lib = load()
    n = ptr.shape[0] - 1
    return int(lib.schwz_fm_refine(
        n,
        np.ascontiguousarray(ptr, np.int64),
        np.ascontiguousarray(cols, np.int64),
        side_i8,
        np.ascontiguousarray(weights, np.int64),
        int(lo), int(hi), int(size0), int(rounds),
    ))


def permute_csr(n, indptr, indices, values, perm, iperm):
    lib = load()
    out_indptr = np.empty(n + 1, dtype=np.int64)
    out_indices = np.empty(indices.shape[0], dtype=np.int64)
    out_values = np.empty(values.shape[0], dtype=np.float64)
    rc = lib.schwz_permute_csr(
        n, indptr, indices, values, perm, iperm,
        out_indptr, out_indices, out_values,
    )
    assert rc == 0
    return out_indptr, out_indices, out_values
