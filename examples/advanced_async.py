#!/usr/bin/env python
"""Advanced configuration tour: METIS partitioning, GMRES locals, asynchronous
(stale-halo) iteration with decentralized convergence detection, neighbor
(ppermute) halo transport, mixed-precision halos, and checkpointing."""

import tempfile

from schwarz_tpu import (
    CommSettings,
    GlobalConvergence,
    HaloStrategy,
    LocalSolver,
    Partition,
    Settings,
    advection_diffusion_2d,
    generate_rhs,
)
from schwarz_tpu.config import ConvergenceSettings
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ras import RASolver

A = advection_diffusion_2d(48)           # non-symmetric operator
b = generate_rhs(A.n)
settings = Settings(
    partition=Partition.metis,
    overlap=3,
    local_solver=LocalSolver.iterative_gmres,
    non_symmetric_matrix=True,
    restart_iter=30,
    # mixed-precision halos floor the attainable local residual around ~3e-6
    # (received values carry f32 quantization); pick the tolerance accordingly
    tolerance=1e-5,
    max_iters=500,
    halo_dtype="float32",                # mixed-precision halos under f64
    comm=CommSettings(
        onesided=True,                   # asynchronous (stale-halo) iteration
        staleness=2,
        strategy=HaloStrategy.neighbor,  # packed ppermute rounds
    ),
    convergence=ConvergenceSettings(
        method=GlobalConvergence.decentralized,
    ),
)
dec = decompose(A, b, settings, num_subdomains=4)
solver = RASolver(dec)

ckpt = tempfile.mktemp(suffix=".npz")
result = solver.run(checkpoint_path=ckpt)
print(f"converged={result.converged} iters={result.iters} "
      f"rel={result.relative_residual_norm:.3e}")

# resume from the checkpoint (e.g. to continue with a larger budget)
state = solver.load_checkpoint(ckpt)
again = solver.run(resume_state=state)
print(f"resumed from iteration {int(state['it'])}: "
      f"converged={again.converged} iters={again.iters}")
