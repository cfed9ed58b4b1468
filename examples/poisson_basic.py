#!/usr/bin/env python
"""Basic usage: solve a 2-D Poisson problem with 4 overlapping subdomains.

Run on any JAX backend; for a CPU device mesh:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/poisson_basic.py
"""

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve

A = laplacian_2d(64)                     # 4096 x 4096 five-point stencil
b = generate_rhs(A.n)
result = solve(
    A, b,
    Settings(overlap=4, tolerance=1e-8, max_iters=300),
    num_subdomains=4,
)
print(f"converged={result.converged} in {result.iters} outer iterations")
print(f"true relative residual: {result.relative_residual_norm:.3e}")
