"""Host-side setup pipeline: partitioning, overlap decomposition, halo planning.

These run once at setup time (numpy; optional C++ acceleration in ``native/``),
mirroring the reference's rank-0 setup path (C5 partition_tools.hpp, C6
restricted_schwarz.cpp:55-304, C7 :307-604) — but producing *padded, static-shape*
batched plans that the TPU compute path consumes.
"""

from schwarz_tpu.core.partition import (
    partition_regular_1d,
    partition_regular_2d,
    partition_metis,
    make_partition,
)
from schwarz_tpu.core.decompose import decompose, Decomposition

__all__ = [
    "partition_regular_1d",
    "partition_regular_2d",
    "partition_metis",
    "make_partition",
    "decompose",
    "Decomposition",
]
