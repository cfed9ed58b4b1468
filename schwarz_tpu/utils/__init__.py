"""Utilities: timing/metrics instruments, CSV writers, validation helpers.

Reference C28/C29 (include/utils.hpp, benchmarking/bench_base.hpp:178-273,
source/schwarz_base.cpp:50-70).
"""

from schwarz_tpu.utils.timing import StageTimer, STAGES
from schwarz_tpu.utils.io_csv import (
    write_timings,
    write_comm_data,
    write_iters_and_residuals,
)
from schwarz_tpu.utils.validation import validate_permutation, find_duplicates

__all__ = [
    "StageTimer",
    "STAGES",
    "write_timings",
    "write_comm_data",
    "write_iters_and_residuals",
    "validate_permutation",
    "find_duplicates",
]
