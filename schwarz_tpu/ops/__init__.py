"""Device compute kernels: batched ELL SpMV, indexed gather/scatter, dense
factorizations/triangular solves.

Pure-XLA implementations live here; Pallas TPU kernels for the hot paths are in
:mod:`schwarz_tpu.ops.pallas_kernels` and are selected automatically on TPU.
"""

from schwarz_tpu.ops.spmv import ell_spmv, ell_spmv_batched, ell_to_dense
from schwarz_tpu.ops.gather_scatter import (
    gather_values,
    scatter_values,
    GatherOp,
)

__all__ = [
    "ell_spmv",
    "ell_spmv_batched",
    "ell_to_dense",
    "gather_values",
    "scatter_values",
    "GatherOp",
]
