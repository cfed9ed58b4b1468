"""Independent numpy emulation of the reference RAS loop, for history parity.

Follows the exact per-iteration order of SchwarzBase::run
(schwarz_base.cpp:387-452) with the SolverRAS kernels: exchange (implicit —
numpy sees the global vector), update_boundary (restricted_schwarz.cpp:991-1017),
check_convergence (solve.cpp:795-955, allgather variant), exact local solve,
local_to_global (communicate.cpp:64-94, solution_based).  Deliberately written
against scipy — shares no code with schwarz_tpu's solver — so matching residual
histories validates the jitted SPMD loop against an independent implementation
of the reference algorithm's semantics.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def reference_ras(A, b, first_row, closures, tol, max_iters):
    """Run RAS; returns (x, local_resnorm_history, global_resnorm_history,
    converged_iter).  ``closures[p]`` lists subdomain p's interior+overlap rows
    (global indices); interface = couplings leaving the closure."""
    A = sp.csr_matrix(A)
    N = A.shape[0]
    S = len(closures)
    locals_ = []
    for p in range(S):
        rows = np.asarray(closures[p])
        in_closure = np.zeros(N, dtype=bool)
        in_closure[rows] = True
        sub = A[rows]
        # split columns into closure (local matrix) and exterior (interface)
        sub_coo = sub.tocoo()
        mask_local = in_closure[sub_coo.col]
        g2l = np.full(N, -1)
        g2l[rows] = np.arange(rows.size)
        A_loc = sp.csr_matrix(
            (
                sub_coo.data[mask_local],
                (sub_coo.row[mask_local], g2l[sub_coo.col[mask_local]]),
            ),
            shape=(rows.size, rows.size),
        )
        A_int = sp.csr_matrix(
            (
                sub_coo.data[~mask_local],
                (sub_coo.row[~mask_local], sub_coo.col[~mask_local]),
            ),
            shape=(rows.size, N),
        )
        lu = spla.splu(A_loc.tocsc())
        locals_.append((rows, A_loc, A_int, lu))

    x = np.zeros(N)
    local_hist, global_hist = [], []
    rn0 = np.full(S, -1.0)
    grn0 = -1.0
    for it in range(max_iters):
        # update_boundary + local residual per subdomain
        rhs_eff, local_rn = [], np.zeros(S)
        for p, (rows, A_loc, A_int, lu) in enumerate(locals_):
            be = b[rows] - A_int @ x
            r = be - A_loc @ x[rows]
            rhs_eff.append(be)
            local_rn[p] = np.linalg.norm(r)
        rn0 = np.where(rn0 < 0, local_rn, rn0)
        grn = local_rn.sum()
        if grn0 < 0:
            grn0 = grn
        local_hist.append(local_rn.copy())
        global_hist.append(grn)
        if grn / grn0 <= tol:
            return x, np.array(local_hist), np.array(global_hist), it
        # local solves + scatter interior slices
        x_new = x.copy()
        for p, (rows, A_loc, A_int, lu) in enumerate(locals_):
            z = lu.solve(rhs_eff[p])
            lo, hi = first_row[p], first_row[p + 1]
            interior_mask_rows = (rows >= lo) & (rows < hi)
            x_new[rows[interior_mask_rows]] = z[interior_mask_rows]
        x = x_new
    return x, np.array(local_hist), np.array(global_hist), max_iters
