"""Local subdomain solvers, batched over the subdomain axis.

TPU-native replacement for the reference's local-solver menu (C13/C14,
source/solve.cpp:196-792): Ginkgo CG/GMRES become batched matrix-free Krylov
loops over the padded ELL operators; CHOLMOD/UMFPACK/Ginkgo-TRS direct solves
become batched *dense* Cholesky/LU factorizations whose triangular solves run on
the MXU (level-scheduled sparse triangular solves do not map to wide SIMD).
"""

from schwarz_tpu.solvers.cg import cg_solve
from schwarz_tpu.solvers.gmres import gmres_solve
from schwarz_tpu.solvers.direct import (
    cholesky_factor,
    cholesky_solve,
    lu_factor,
    lu_solve,
)
from schwarz_tpu.solvers.precond import make_preconditioner

__all__ = [
    "cg_solve",
    "gmres_solve",
    "cholesky_factor",
    "cholesky_solve",
    "lu_factor",
    "lu_solve",
    "make_preconditioner",
]
