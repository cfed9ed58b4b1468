"""Problem generators and matrix I/O — the "model families" of the framework.

TPU-native equivalent of reference C4 (source/initialization.cpp:196-272 matrix
generation / MatrixMarket reading) and the deal.II FEM drivers (C32,
benchmarking/dealii_ex_6.cpp / _ex_9.cpp): instead of FEM assembly through deal.II we
generate the equivalent assembled operators directly (Poisson, anisotropic diffusion,
advection-diffusion) as host CSR, which then feed the decomposition pipeline.
"""

from schwarz_tpu.models.csr import CSRMatrix
from schwarz_tpu.models.laplacian import laplacian_2d
from schwarz_tpu.models.fem import (
    advection_diffusion_2d,
    anisotropic_diffusion_2d,
    helmholtz_2d,
    laplacian_3d,
)
from schwarz_tpu.models.fem_assembly import (
    fem_p1_advection,
    fem_p1_elasticity,
    fem_p1_poisson,
)
from schwarz_tpu.models.mtx import matrix_path, read_mtx, write_mtx
from schwarz_tpu.models.rhs import generate_rhs

__all__ = [
    "CSRMatrix",
    "laplacian_2d",
    "laplacian_3d",
    "helmholtz_2d",
    "anisotropic_diffusion_2d",
    "advection_diffusion_2d",
    "fem_p1_poisson",
    "fem_p1_advection",
    "fem_p1_elasticity",
    "read_mtx",
    "write_mtx",
    "matrix_path",
    "generate_rhs",
]
