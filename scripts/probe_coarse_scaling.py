"""Probe: outer iterations vs subdomain count S — the coarse-space
scalability story (CPU mesh).  One-level Schwarz degrades as S grows
(information moves one overlap width per iteration); the coarse spaces
restore S-independence, the spectral one at a far lower iteration level.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/probe_coarse_scaling.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve  # noqa: E402
from schwarz_tpu.config import Partition, Precond  # noqa: E402


def iters(A, b, s, S):
    r = solve(A, b, s, num_subdomains=S)
    return r.iters if r.converged else -r.iters


if __name__ == "__main__":
    A = laplacian_2d(128)
    b = generate_rhs(A.n)
    base = Settings(overlap=4, tolerance=1e-7, max_iters=2000,
                    partition=Partition.regular2d,
                    precond=Precond.block_jacobi, local_max_iters=30,
                    row_pad_multiple=64, dtype="float64")
    print(f"{'S':>4s} {'one-level':>10s} {'aggs q=8':>10s} "
          f"{'spectral q=8':>13s}", flush=True)
    for S in (4, 16, 64):
        r1 = iters(A, b, base, S)
        r2 = iters(A, b, base.replace(two_level=True, coarse_aggregates=8),
                   S)
        r3 = iters(A, b, base.replace(two_level=True, coarse_aggregates=8,
                                      coarse_space="spectral"), S)
        print(f"{S:4d} {r1:10d} {r2:10d} {r3:13d}", flush=True)
