"""Probe: 2-D free-running kernel native on the v5e chip (folded 2x2).

Runs the whole 2x2 asynchronous block solve of a 128^2 Poisson system on
ONE chip (ply = plx = 2 window fold, self-ring DMAs) with interpret=False.
"""
import time

import numpy as np

import jax

print("platform:", jax.devices()[0].platform, flush=True)

from schwarz_tpu import generate_rhs, laplacian_2d
from schwarz_tpu.ops.async_ras_2d import AsyncRASolver2D
from schwarz_tpu.parallel.mesh import make_mesh

A = laplacian_2d(128)
b = generate_rhs(A.n, random=False)
mesh = make_mesh(jax.devices()[:1])
t0 = time.time()
s = AsyncRASolver2D(A, b, px=2, py=2, tolerance=2e-3, staleness=1,
                    ninner=30, chunk_rounds=20, mesh=mesh)
print("setup", time.time() - t0, "fold", (s.ply, s.plx), flush=True)
t0 = time.time()
x, info = s.run(max_rounds=400)
print("run", time.time() - t0, flush=True)
print({k: info[k] for k in ("converged", "relative_residual_norm",
                            "rounds", "device_grid")}, flush=True)
import scipy.sparse.linalg as spla

x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
print("err vs direct:", err, flush=True)
