#!/usr/bin/env python
"""Sweep the blocked-trisolve panel size on the bench shapes (v5e).

bench.py measures direct_apply='blocked' at pick_trisolve_block(R) = 256
for R = 1280 (0.60-0.69 of the factor-streaming roofline).  Fewer,
bigger panels mean fewer sequential steps; this sweeps the divisors of R
to see whether the default leaves anything on the table.

Run: python scripts/probe_trisolve_block.py   (default env = axon TPU)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from schwarz_tpu.config import Settings
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.models import generate_rhs, laplacian_2d
from schwarz_tpu.solvers.direct import (
    block_diag_inverses,
    blocked_cholesky_solve,
    cholesky_factor,
    cholesky_solve,
)


def chain_time(step, x0, reps=100, tries=3):
    def chain(reps, x):
        return jax.lax.fori_loop(0, reps, lambda i, c: step(c), x)

    jc = jax.jit(chain, static_argnums=0)
    jax.block_until_ready(jc(2, x0))
    best = np.inf
    for _ in range(tries):
        t0 = time.perf_counter()
        jax.block_until_ready(jc(reps, x0))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    S = 16
    A = laplacian_2d(128)
    b = generate_rhs(A.n, random=False)
    dec = decompose(A, b, Settings(overlap=2, dtype=jnp.float32,
                                   row_pad_multiple=128), S)
    v = jnp.asarray(dec.lmat_vals, jnp.float32)
    c = jnp.asarray(dec.lmat_cols)
    L = jax.jit(cholesky_factor)(v, c)
    L.block_until_ready()
    R = int(L.shape[-1])
    rhs0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((S, R)), jnp.float32
    )
    print(f"S={S} R={R}")
    x_ref = jax.jit(cholesky_solve)(L, rhs0)

    def noop(bb):
        return bb * 1.000001 * 1e-6 + 1.0

    t0 = chain_time(noop, rhs0)
    tri_elems = S * R * (R + 1)
    for blk in [d for d in (128, 160, 256, 320, 640, 1280) if R % d == 0]:
        Dinv = jax.jit(block_diag_inverses, static_argnums=1)(L, blk)
        Dinv.block_until_ready()

        def step(bb, Dinv=Dinv):
            return blocked_cholesky_solve(L, Dinv, bb) * 1e-6 + 1.0

        x = jax.jit(lambda bb, Dinv=Dinv: blocked_cholesky_solve(
            L, Dinv, bb))(rhs0)
        err = float(jnp.abs(x - x_ref).max() / jnp.abs(x_ref).max())
        t = chain_time(step, rhs0) - t0
        print(f"blk={blk:5d} nb={R // blk:3d}: {t*1e6:9.1f} us  "
              f"{tri_elems / t / 1e9:7.2f} Gel/s  relerr={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
