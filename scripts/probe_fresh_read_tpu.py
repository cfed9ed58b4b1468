"""Probe: fresh_read vs guaranteed-slot consume, native on the v5e chip.

Self-ring (D=1, 8 subdomains folded) at staleness B=3: every message has
landed by consume time, so fresh_read should shrink the effective
staleness from 3 to 1 and detect in fewer free-running iterations.
"""
import numpy as np

import jax

print("platform:", jax.devices()[0].platform, flush=True)

from schwarz_tpu import generate_rhs, laplacian_2d
from schwarz_tpu.ops.async_ras import AsyncRASolver

A = laplacian_2d(32)
b = generate_rhs(A.n, random=False)

for fresh in (False, True):
    s = AsyncRASolver(A, b, num_subdomains=8, overlap=2, tolerance=1e-4,
                      staleness=3, ninner=10, chunk_rounds=10,
                      fresh_read=fresh)
    x, info = s.run(max_rounds=200)
    import scipy.sparse.linalg as spla

    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    print(f"fresh_read={fresh}: converged={info['converged']} "
          f"done_at={info['done_at']} hits={info['fresh_read_hits']} "
          f"rel={info['relative_residual_norm']:.2e} err={err:.2e}",
          flush=True)
