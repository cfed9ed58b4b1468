"""schwarz_tpu — a TPU-native restricted additive Schwarz (RAS) solver framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`pratikvn/schwarz-lib <https://github.com/pratikvn/schwarz-lib>`_ (C++14 MPI +
Ginkgo + CUDA), re-architected for TPU: padded batched subdomain operators
sharded over a device mesh, jitted ``lax.while_loop`` outer iteration, halo
exchange as ICI collectives / Pallas remote DMA, and batched dense direct or
matrix-free Krylov local solves.

Quick start::

    import numpy as np
    from schwarz_tpu import Settings, laplacian_2d, generate_rhs, solve

    A = laplacian_2d(64)                       # 4096 x 4096 Poisson
    b = generate_rhs(A.n, random=False)
    result = solve(A, b, Settings(overlap=3), num_subdomains=4)
    assert result.converged

The reference computes in float64 (settings.hpp:526-537); import of this package
enables ``jax_enable_x64`` unless ``SCHWARZ_TPU_NO_X64`` is set in the
environment (float32 compute can then be selected per-solve via
``Settings(dtype="float32")``).
"""

import os as _os

import jax as _jax

if not _os.environ.get("SCHWARZ_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

from schwarz_tpu.config import (  # noqa: E402
    CommSettings,
    ConvergenceSettings,
    GlobalConvergence,
    HaloStrategy,
    LocalCriterion,
    LocalSolver,
    Metadata,
    Partition,
    Precond,
    Settings,
)
from schwarz_tpu.models import (  # noqa: E402
    fem_p1_advection,
    fem_p1_elasticity,
    fem_p1_poisson,
    CSRMatrix,
    advection_diffusion_2d,
    anisotropic_diffusion_2d,
    generate_rhs,
    laplacian_2d,
    read_mtx,
)
from schwarz_tpu.core import decompose  # noqa: E402
from schwarz_tpu.ras import RASolver, RASResult, solve  # noqa: E402

__version__ = "0.2.0"

__all__ = [
    "Settings",
    "CommSettings",
    "ConvergenceSettings",
    "Partition",
    "LocalSolver",
    "Precond",
    "HaloStrategy",
    "GlobalConvergence",
    "LocalCriterion",
    "Metadata",
    "CSRMatrix",
    "laplacian_2d",
    "anisotropic_diffusion_2d",
    "advection_diffusion_2d",
    "fem_p1_poisson",
    "fem_p1_advection",
    "fem_p1_elasticity",
    "read_mtx",
    "generate_rhs",
    "decompose",
    "RASolver",
    "RASResult",
    "solve",
]
