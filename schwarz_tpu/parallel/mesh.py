"""Device mesh construction.

The reference binds one subdomain per MPI rank (``num_subdomains = comm_size``,
initialization.cpp:74) with node-locality detection (utils.cpp:41-78).  Here one
*device* owns a contiguous block of ``S / D`` subdomains on mesh axis ``'subd'``;
ICI vs DCN locality is XLA's job once shardings are annotated.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

SUBD_AXIS = "subd"


def make_mesh(devices: Optional[Sequence] = None) -> jax.sharding.Mesh:
    """1-D mesh over all (or the given) devices with axis ``'subd'``."""
    if devices is None:
        devices = jax.devices()
    return jax.sharding.Mesh(np.array(devices), (SUBD_AXIS,))


def subdomain_sharding(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    """Sharding that splits the leading (subdomain) axis across the mesh."""
    return jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(SUBD_AXIS)
    )


def replicated_sharding(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
