"""Batched restarted GMRES local solver.

Replaces the reference's Ginkgo GMRES+restart path for non-symmetric local
matrices (solve.cpp:486-570, selected by ``non_symmetric_matrix``,
restart = ``restart_iter``).  One restart cycle runs a fixed ``m``-step batched
Arnoldi (static shapes — TPU-friendly) and solves the small (m+1, m) least-squares
problem per subdomain; cycles repeat until the residual-norm reduction criterion
or the total iteration budget is met (Combined criterion, solve.cpp:469-478).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from schwarz_tpu.ops.spmv import ell_spmv_batched
from schwarz_tpu.solvers.cg import KrylovResult, _dot


def gmres_solve(
    vals: jax.Array,
    cols: jax.Array,
    b: jax.Array,
    x0: jax.Array,
    tol: float,
    max_iters: int,
    restart: int = 30,
    precond: Optional[Callable[[jax.Array], jax.Array]] = None,
    apply_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> KrylovResult:
    """Solve (generally non-symmetric) ``A_s x_s = b_s`` batched; left-preconditioned."""
    S, R = b.shape
    m = int(restart)
    if apply_fn is None:
        apply_fn = lambda x: ell_spmv_batched(vals, cols, x)  # noqa: E731
    M = precond if precond is not None else (lambda r: r)
    eps = jnp.finfo(b.dtype).eps
    tiny = jnp.finfo(b.dtype).tiny

    r0 = M(b - apply_fn(x0))
    rnorm0 = jnp.sqrt(_dot(r0, r0))
    target = tol * rnorm0
    max_cycles = -(-max_iters // m)

    def arnoldi_cycle(x):
        """One m-step Arnoldi + least-squares update; returns (x_new, rnorm)."""
        r = M(b - apply_fn(x))
        beta = jnp.sqrt(_dot(r, r))
        v0 = r / jnp.maximum(beta, tiny)[:, None]
        V = jnp.zeros((S, m + 1, R), dtype=b.dtype).at[:, 0].set(v0)
        H = jnp.zeros((S, m + 1, m), dtype=b.dtype)

        def step(j, carry):
            V, H = carry
            w = M(apply_fn(V[:, j]))
            # modified Gram-Schmidt against v_0..v_j (static loop bound m, masked)
            def mgs(i, carry_w):
                w, H = carry_w
                hij = jnp.where(i <= j, _dot(V[:, i], w), 0.0)
                w = w - hij[:, None] * V[:, i]
                H = H.at[:, i, j].set(jnp.where(i <= j, hij, H[:, i, j]))
                return w, H

            w, H = jax.lax.fori_loop(0, m, lambda i, c: mgs(i, c), (w, H))
            hnext = jnp.sqrt(_dot(w, w))
            H = H.at[:, j + 1, j].set(hnext)
            vnext = w / jnp.maximum(hnext, tiny)[:, None]
            V = V.at[:, j + 1].set(vnext)
            return V, H

        V, H = jax.lax.fori_loop(0, m, step, (V, H))

        # least squares min || beta e1 - H y || via normal equations on the small
        # (m+1, m) system (well-conditioned for modest m; Givens version later)
        e1 = jnp.zeros((S, m + 1), dtype=b.dtype).at[:, 0].set(beta)

        def solve_ls(Hs, rhs):
            G = Hs.T @ Hs + eps * jnp.eye(m, dtype=b.dtype)
            y = jnp.linalg.solve(G, Hs.T @ rhs)
            res = rhs - Hs @ y
            return y, jnp.sqrt(res @ res)

        y, rnorm = jax.vmap(solve_ls)(H, e1)
        dx = jnp.einsum("smr,sm->sr", V[:, :m], y)
        return x + dx, rnorm

    def cond(state):
        x, rnorm, cycles, active = state
        return jnp.any(active) & (cycles < max_cycles)

    def body(state):
        x, rnorm, cycles, active = state
        x_new, rnorm_new = arnoldi_cycle(x)
        x = jnp.where(active[:, None], x_new, x)
        rnorm = jnp.where(active, rnorm_new, rnorm)
        return x, rnorm, cycles + 1, active & (rnorm > target)

    active0 = rnorm0 > jnp.maximum(target, 0.0)
    x, rnorm, cycles, _ = jax.lax.while_loop(
        cond, body, (x0, rnorm0, jnp.int32(0), active0)
    )
    rel = rnorm / jnp.where(rnorm0 > 0, rnorm0, 1.0)
    return KrylovResult(x=x, iters=cycles * m * jnp.ones(S, jnp.int32), rel_resnorm=rel)
