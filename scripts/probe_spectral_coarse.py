"""Probe: spectral (GenEO-style) vs aggregate coarse space — outer iteration
counts at equal coarse-space size on the CPU mesh.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/probe_spectral_coarse.py
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

import time  # noqa: E402

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve  # noqa: E402
from schwarz_tpu.config import Partition, Precond  # noqa: E402
from schwarz_tpu.models.fem import anisotropic_diffusion_2d  # noqa: E402


def trial(A, b, s, S, tag):
    t0 = time.time()
    r = solve(A, b, s, num_subdomains=S)
    print(f"{tag:46s} iters={r.iters:4d} conv={r.converged} "
          f"rel={r.relative_residual_norm:.2e} wall={time.time()-t0:.1f}s",
          flush=True)
    return r.iters


def sweep(A, b, base, S, name):
    print(f"--- {name} ---", flush=True)
    trial(A, b, base.replace(two_level=False), S, "one-level")
    for q in (1, 4, 16):
        trial(A, b, base.replace(coarse_aggregates=q), S, f"aggregates q={q}")
    for q in (1, 4, 16):
        trial(A, b, base.replace(coarse_aggregates=q,
                                 coarse_space="spectral"), S,
              f"spectral   q={q}")


if __name__ == "__main__":
    base = Settings(overlap=4, tolerance=1e-7, max_iters=800,
                    two_level=True, partition=Partition.regular2d,
                    precond=Precond.block_jacobi, local_max_iters=20,
                    row_pad_multiple=128, dtype="float64")
    n = 128
    A = laplacian_2d(n)
    b = generate_rhs(A.n)
    sweep(A, b, base, 16, f"laplacian {n}^2 / 16 subdomains")

    Aa = anisotropic_diffusion_2d(96, eps=100.0, theta=0.5)
    ba = generate_rhs(Aa.n)
    sweep(Aa, ba, base.replace(partition=Partition.metis), 8,
          "anisotropic 96^2 eps=100 theta=0.5 / 8 subdomains / metis")
