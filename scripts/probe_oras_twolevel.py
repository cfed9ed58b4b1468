"""Sweep the O-RAS Robin weight under two_level on the CPU mesh.

Round-1 measurement: two_level + c=-0.8 hurts (117 -> 137 iters or
stalls) on 128^2/16 at the f32 floor.  Question: does a smaller |c| help
when the coarse space is on?  Sweep c for one- and two-level configs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve  # noqa: E402
from schwarz_tpu.config import Partition  # noqa: E402

A = laplacian_2d(128)
b = generate_rhs(A.n, random=False)

for two_level in (False, True):
    for c in (0.0, -0.1, -0.2, -0.4, -0.6, -0.8):
        s = Settings(
            partition=Partition.regular2d, overlap=6, tolerance=1e-4,
            max_iters=400, local_tolerance=1e-6, local_max_iters=20,
            two_level=two_level, oras_weight=c,
        )
        r = solve(A, b, s, num_subdomains=16)
        print(f"two_level={two_level} c={c:+.1f} -> iters={r.iters} "
              f"conv={r.converged} rel={r.relative_residual_norm:.2e}",
              flush=True)
