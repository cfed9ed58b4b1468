"""SPMD layer: device mesh, halo exchange collectives, convergence protocols.

TPU-native replacement for the reference's MPI layer (C7-C10, C16-C19): per-rank
MPI processes become ``shard_map`` over a ``jax.sharding.Mesh`` axis ``'subd'``;
two-sided Isend/Irecv halo exchange and one-sided MPI_Put/Get windows become XLA
collectives over ICI (``all_gather`` / ``ppermute``) and Pallas remote DMA.
"""

from schwarz_tpu.parallel.mesh import make_mesh, SUBD_AXIS
from schwarz_tpu.parallel.exchange import exchange_halo_allgather

__all__ = ["make_mesh", "SUBD_AXIS", "exchange_halo_allgather"]
