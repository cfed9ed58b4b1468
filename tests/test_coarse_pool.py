"""Spectral coarse-space process pool (core/coarse.py + _spectral_worker.py).

The pool is an optimization with a silent serial fallback, so a worker
regression would otherwise never fail a test (ADVICE round 2): force the
pool path and check it agrees with the serial path.
"""

import numpy as np
import pytest

from schwarz_tpu import laplacian_2d
from schwarz_tpu.core import coarse


def _subspace_gap(u, v):
    """Largest principal-angle sine between the column spans of u and v."""
    qu, _ = np.linalg.qr(u)
    qv, _ = np.linalg.qr(v)
    s = np.linalg.svd(qu.T @ qv, compute_uv=False)
    return float(np.sqrt(max(0.0, 1.0 - s.min() ** 2)))


def test_pool_path_matches_serial(monkeypatch):
    A = laplacian_2d(16).to_scipy()
    boundaries = np.array([0, 128, 256])
    q = 4
    serial = coarse.neumann_spectral_vectors(A, boundaries, q, workers=1)
    # force the pool: make every Lanczos block pool-eligible
    monkeypatch.setattr(coarse, "_PARALLEL_MIN_WORK", 1)
    called = {}
    orig = coarse._solve_blocks_subprocess

    def spy(payloads, n_workers):
        called["n"] = len(payloads)
        called["workers"] = n_workers
        return orig(payloads, n_workers)

    monkeypatch.setattr(coarse, "_solve_blocks_subprocess", spy)
    pooled = coarse.neumann_spectral_vectors(A, boundaries, q, workers=2)
    assert called == {"n": 2, "workers": 2}, "pool path did not engage"
    for u, v in zip(serial, pooled):
        assert u.shape == v.shape == (128, q)
        # same eigenspace; rounding may differ across BLAS thread pools
        assert _subspace_gap(u, v) < 1e-7


def test_worker_failure_falls_back_to_none(capsys):
    # a crashing worker must return None (callers then run serially),
    # log its stderr, and leak no processes.  A malformed payload makes the
    # worker die on matrix construction (before its eigsh fallback).
    bad = (np.ones(3), np.zeros(3, np.int32), np.zeros(2, np.int64),
           80, 3, 1e-6)  # indptr wrong length -> csc_matrix raises
    out = coarse._solve_blocks_subprocess([bad, _tiny_payload()], 2)
    assert out is None
    assert "falling back to serial" in capsys.readouterr().err


def _tiny_payload():
    import scipy.sparse as sp

    Asym = sp.random(80, 80, density=0.05, format="csc", random_state=0)
    Asym = (Asym + Asym.T + 10 * sp.eye(80)).tocsc()
    return (Asym.data, Asym.indices, Asym.indptr, 80, 3, 1e-6)


def test_worker_timeout_kills_and_falls_back(monkeypatch):
    monkeypatch.setattr(coarse, "_WORKER_TIMEOUT_S", 0.01)
    out = coarse._solve_blocks_subprocess([_tiny_payload()] * 2, 2)
    assert out is None  # timed out -> serial fallback; workers were killed


def test_build_prolongator_rejects_unsorted_boundaries():
    vecs = [np.ones((4, 1)), np.ones((4, 1))]
    with pytest.raises(AssertionError, match="sorted"):
        coarse.build_prolongator(vecs, np.array([0, 8, 4]), 8, 1)
