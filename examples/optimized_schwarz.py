#!/usr/bin/env python
"""Optimized Schwarz tour: O-RAS Robin transmission conditions, Krylov
acceleration, and the indefinite-Helmholtz workflow.

Three progressively harder configurations of the same machinery:

1. One-level RAS on a Poisson problem — classical vs ``oras_weight="auto"``
   (Robin transmission; typically 2-4x fewer outer iterations).
2. FGMRES acceleration (RAS as a preconditioner) on top of O-RAS.
3. Helmholtz: the stationary iteration diverges on indefinite problems; the
   FGMRES + O-RAS combination (Robin conditions double as approximate
   absorbing boundaries) converges.

Run on any JAX backend; for a CPU device mesh:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/optimized_schwarz.py
"""

import numpy as np

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve
from schwarz_tpu.config import LocalSolver
from schwarz_tpu.models import helmholtz_2d


def true_res(A, b, r):
    x = np.asarray(r.solution)
    return (np.linalg.norm(A.to_scipy() @ x - np.asarray(b))
            / np.linalg.norm(np.asarray(b)))


def main():
    # --- 1. classical vs O-RAS on Poisson --------------------------------
    A = laplacian_2d(32)
    b = generate_rhs(A.n)
    base = Settings(overlap=2, tolerance=1e-8, max_iters=400)
    r_classic = solve(A, b, base, num_subdomains=8)
    r_oras = solve(A, b, base.replace(oras_weight="auto"), num_subdomains=8)
    print(f"Poisson 32^2, 8 subdomains:")
    print(f"  classical RAS : {r_classic.iters:4d} iters, "
          f"true residual {true_res(A, b, r_classic):.1e}")
    print(f"  O-RAS (auto)  : {r_oras.iters:4d} iters, "
          f"true residual {true_res(A, b, r_oras):.1e}")

    # --- 2. FGMRES acceleration on top ------------------------------------
    r_accel = solve(A, b, base.replace(oras_weight="auto",
                                       accelerator="fgmres"),
                    num_subdomains=8)
    print(f"  FGMRES + O-RAS: {r_accel.iters:4d} iters, "
          f"true residual {true_res(A, b, r_accel):.1e}")

    # --- 2b. FSAI(0) under capped two-stage locals ------------------------
    # the production configuration: inexact local solves with a hard
    # iteration cap — a stronger approximate inverse buys outer iterations
    from schwarz_tpu.config import Precond

    capped = base.replace(tolerance=1e-6, local_max_iters=6,
                          local_tolerance=1e-10)
    r_jac = solve(A, b, capped.replace(precond=Precond.jacobi),
                  num_subdomains=8)
    r_fsai = solve(A, b, capped.replace(precond=Precond.fsai),
                   num_subdomains=8)
    print(f"  capped locals (6 CG its): jacobi {r_jac.iters:4d} vs "
          f"FSAI {r_fsai.iters:4d} outers, "
          f"true residual {true_res(A, b, r_fsai):.1e}")

    # --- 3. indefinite Helmholtz ------------------------------------------
    H = helmholtz_2d(32)
    bh = generate_rhs(H.n)
    hard = Settings(overlap=3, tolerance=1e-8, max_iters=200,
                    local_solver=LocalSolver.iterative_gmres)
    r_st = solve(H, bh, hard.replace(max_iters=120), num_subdomains=4)
    r_h = solve(H, bh, hard.replace(accelerator="fgmres", oras_weight=-0.5),
                num_subdomains=4)
    print(f"Helmholtz 32^2, 4 subdomains:")
    print(f"  stationary RAS: converged={r_st.converged} "
          f"(diverges on indefinite operators)")
    print(f"  FGMRES + O-RAS: {r_h.iters:4d} iters, "
          f"true residual {true_res(H, bh, r_h):.1e}")
    assert r_oras.iters < r_classic.iters and r_h.converged


if __name__ == "__main__":
    main()
