"""MatrixMarket reader (reference reads .mtx via Ginkgo,
source/initialization.cpp:204-213, then sorts columns)."""

from __future__ import annotations

import numpy as np

from schwarz_tpu.models.csr import CSRMatrix


def read_mtx(path: str, dtype=np.float64) -> CSRMatrix:
    """Read a MatrixMarket coordinate file into CSR (symmetric storage expanded)."""
    with open(path, "r") as f:
        header = f.readline().strip().lower()
        if not header.startswith("%%matrixmarket"):
            raise ValueError(f"{path}: not a MatrixMarket file")
        symmetric = "symmetric" in header
        pattern = "pattern" in header
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        nrows, ncols, nnz = (int(t) for t in line.split())
        data = np.loadtxt(f, dtype=np.float64, ndmin=2, max_rows=nnz)

    rows = data[:, 0].astype(np.int64) - 1
    cols = data[:, 1].astype(np.int64) - 1
    vals = (
        np.ones(len(rows), dtype=dtype) if pattern else data[:, 2].astype(dtype)
    )
    if symmetric:
        off = rows != cols
        rows, cols = (
            np.concatenate([rows, cols[off]]),
            np.concatenate([cols, rows[off]]),
        )
        vals = np.concatenate([vals, vals[off]])
    from schwarz_tpu.exceptions import assert_square

    assert_square(nrows, ncols, f"matrix {path}")
    return CSRMatrix.from_coo(rows, cols, vals, nrows)
