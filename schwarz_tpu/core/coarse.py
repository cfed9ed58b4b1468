"""Host-side spectral coarse-space construction (GenEO-style).

Shared by the synchronous two-level solver (`ras.RASolver`, which ships the
basis to device as a padded batched array) and the free-running
iterative-refinement drivers (`ops.async_ras.iterative_refinement_run`,
which applies the coarse correction on host between kernel launches —
two-level *asynchronous* Schwarz: coarse solves at the restart
synchronization points, barrier-free one-level iteration in between).

The construction is fully algebraic.  Per subdomain (a contiguous row range
of the matrix), take the ``q`` lowest eigenvectors of the NEUMANN block:
the diagonal block ``A_ss`` with the exterior rowsums restored on the
diagonal, which undoes the Dirichlet clamping ``A_ss`` carries at subdomain
interfaces.  Plain Dirichlet-block eigenvectors vanish at the interfaces —
exactly where the Schwarz error concentrates — and measure WORSE than
contiguous index aggregates; the Neumann modes are interface-free
near-kernel vectors (the lowest is the constant, so q = 1 recovers the
span of Nicolaides' piecewise-constant space).  Cf. Spillane et al. (GenEO)
and Neumann-Neumann coarse spaces.  Beyond the reference, which is strictly
one-level (it has no coarse space at all).
"""

from __future__ import annotations

import numpy as np


def neumann_spectral_vectors(A, boundaries, q: int):
    """Per-subdomain Neumann-block eigenvectors.

    ``A``: scipy sparse (n, n); ``boundaries``: (S+1,) row offsets of the
    contiguous subdomains; ``q``: vectors per subdomain (clipped to the
    subdomain size).  Returns a list of (n_s, k) float64 arrays.
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    A = A.tocsr()
    total_rowsum = np.asarray(A.sum(axis=1)).ravel()
    out = []
    for sd in range(len(boundaries) - 1):
        lo, hi = int(boundaries[sd]), int(boundaries[sd + 1])
        n_s = hi - lo
        if n_s == 0:
            out.append(np.zeros((0, 0)))
            continue
        k = min(q, n_s)
        Ass = A[lo:hi, lo:hi]
        local_rowsum = np.asarray(Ass.sum(axis=1)).ravel()
        ext = total_rowsum[lo:hi] - local_rowsum
        A_neu = Ass + sp.diags(ext)
        Asym = (0.5 * (A_neu + A_neu.T)).tocsc()
        # the Neumann block is singular (constant near-kernel): shift-invert
        # just below zero keeps the factorization definite while targeting
        # the lowest modes
        scale = float(np.abs(Asym.diagonal()).max()) or 1.0
        if k >= n_s - 1 or n_s <= 64:
            _, v = np.linalg.eigh(Asym.toarray())
            vecs = v[:, :k]
        else:
            # deterministic Lanczos start: ARPACK's default v0 is random,
            # which rotates degenerate eigenspaces between calls — two
            # otherwise-identical setups would build (slightly) different
            # coarse spaces and bit-different solves
            v0 = np.random.default_rng(12345).standard_normal(n_s)
            try:
                _, vecs = spla.eigsh(Asym, k=k, sigma=-1e-8 * scale,
                                     which="LM", v0=v0)
            except Exception:
                _, v = np.linalg.eigh(Asym.toarray())
                vecs = v[:, :k]
        out.append(np.asarray(vecs, np.float64))
    return out


def build_prolongator(vectors, boundaries, n: int, q: int):
    """Sparse prolongator V (n, S q) with per-subdomain block columns.

    Columns of subdomains smaller than ``q`` stay zero-padded (their
    Galerkin rows are fixed by the caller)."""
    import scipy.sparse as sp

    vrows, vcols, vvals = [], [], []
    S = len(boundaries) - 1
    for sd in range(S):
        lo, hi = int(boundaries[sd]), int(boundaries[sd + 1])
        vecs = vectors[sd]
        for j in range(vecs.shape[1]):
            vrows.append(np.arange(lo, hi, dtype=np.int64))
            vcols.append(np.full(hi - lo, sd * q + j, dtype=np.int64))
            vvals.append(vecs[:, j])
    if not vrows:
        return sp.csr_matrix((n, S * q))
    return sp.csr_matrix(
        (np.concatenate(vvals), (np.concatenate(vrows),
                                 np.concatenate(vcols))),
        shape=(n, S * q),
    )


class HostCoarse:
    """Host-side coarse correction ``r -> V A_c^{-1} V^T r``.

    ``A_c = V^T A V`` is the Galerkin coarse matrix; zero (padded) coarse
    DOFs get identity rows, so their corrections are exactly zero.
    """

    def __init__(self, A, boundaries, q: int):
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        boundaries = np.asarray(boundaries)
        vectors = neumann_spectral_vectors(A, boundaries, q)
        n = A.shape[0]
        self.V = build_prolongator(vectors, boundaries, n, q)
        A_c_s = (self.V.T @ (A @ self.V)).tocsc()
        dim = A_c_s.shape[0]
        empty = np.asarray(np.abs(A_c_s).sum(axis=1)).ravel() == 0
        if empty.any():
            # padded coarse DOFs: identity rows keep A_c nonsingular
            A_c_s = (A_c_s + sp.diags(empty.astype(np.float64))).tocsc()
        self.A_c = np.asarray(A_c_s.todense()) if dim <= 2048 else A_c_s
        if dim <= 2048:
            try:
                inv = np.linalg.inv(self.A_c)
            except np.linalg.LinAlgError:
                inv = np.linalg.pinv(self.A_c)
            self._solve_c = lambda rc: inv @ rc
        else:
            # large coarse spaces: the Galerkin matrix is block-sparse
            # (subdomain-neighbor coupling only) — a sparse LU scales where
            # a dense (qS)^2 inverse does not
            try:
                lu = spla.splu(A_c_s)
                self._solve_c = lu.solve
            except RuntimeError:
                # exactly-singular Galerkin matrix (floating/pure-Neumann
                # operator whose near-kernel sits in the coarse space):
                # pseudo-solve, matching the dense path's pinv fallback
                inv = np.linalg.pinv(np.asarray(A_c_s.todense()))
                self._solve_c = lambda rc: inv @ rc

    def solve(self, r: np.ndarray) -> np.ndarray:
        """The coarse correction for residual ``r`` (same length as rows
        of ``V``)."""
        rc = self.V.T @ np.asarray(r, np.float64)
        return self.V @ self._solve_c(rc)


def equal_strip_boundaries(n: int, num_subdomains: int) -> np.ndarray:
    """(S+1,) contiguous equal-strip row offsets — any partition of unity
    yields a valid coarse space, so drivers whose kernel partition is not
    a contiguous permutation just use strips of the original ordering."""
    return np.linspace(0, n, num_subdomains + 1).astype(np.int64)
