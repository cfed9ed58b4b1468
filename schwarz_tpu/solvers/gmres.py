"""Batched restarted GMRES local solver.

Replaces the reference's Ginkgo GMRES+restart path for non-symmetric local
matrices (solve.cpp:486-570, selected by ``non_symmetric_matrix``,
restart = ``restart_iter``).  One restart cycle runs an ``m``-step batched
Arnoldi with Givens-rotation QR of the Hessenberg matrix — the rotated rhs
entry gives the residual norm at every step, so subdomains freeze as soon as
they meet the reduction criterion (Combined criterion, solve.cpp:469-478)
while the rest of the batch continues; all shapes static (TPU-friendly).
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
    tiny = jnp.finfo(b.dtype).tiny

    r0 = M(b - apply_fn(x0))
    rnorm0 = jnp.sqrt(_dot(r0, r0))
    target = tol * rnorm0
    max_cycles = -(-max_iters // m)

    def arnoldi_cycle(x, inner_count):
        """One m-step Givens-GMRES cycle; returns (x_new, rnorm, inner_count)."""
        r = M(b - apply_fn(x))
        beta = jnp.sqrt(_dot(r, r))
        v0 = r / jnp.maximum(beta, tiny)[:, None]
        V = jnp.zeros((S, m + 1, R), dtype=b.dtype).at[:, 0].set(v0)
        Rm = jnp.zeros((S, m, m), dtype=b.dtype)      # upper-triangular factor
        g = jnp.zeros((S, m + 1), dtype=b.dtype).at[:, 0].set(beta)
        cs = jnp.zeros((S, m), dtype=b.dtype)
        sn = jnp.zeros((S, m), dtype=b.dtype)
        active0 = beta > target

        def step(j, carry):
            V, Rm, g, cs, sn, active, inner = carry
            w = M(apply_fn(V[:, j]))
            # modified Gram-Schmidt against v_0..v_j (static bound, masked)
            h = jnp.zeros((S, m + 1), dtype=b.dtype)

            def mgs(i, c):
                w, h = c
                hij = jnp.where(i <= j, _dot(V[:, i], w), 0.0)
                w = w - hij[:, None] * V[:, i]
                return w, h.at[:, i].set(hij)

            w, h = jax.lax.fori_loop(0, m, mgs, (w, h))
            hnext = jnp.sqrt(_dot(w, w))
            vnext = w / jnp.maximum(hnext, tiny)[:, None]
            V = V.at[:, j + 1].set(
                jnp.where(active[:, None], vnext, V[:, j + 1])
            )
            # apply previous Givens rotations to the new column
            def rot(i, hcol):
                hi = hcol[:, i]
                hip = hcol[:, i + 1]
                new_i = jnp.where(i < j, cs[:, i] * hi + sn[:, i] * hip, hi)
                new_ip = jnp.where(i < j, -sn[:, i] * hi + cs[:, i] * hip, hip)
                return hcol.at[:, i].set(new_i).at[:, i + 1].set(new_ip)

            h = jax.lax.fori_loop(0, m, rot, h.at[:, j + 1].set(hnext))
            hj, hj1 = h[:, j], h[:, j + 1]
            denom = jnp.sqrt(hj * hj + hj1 * hj1)
            c_new = jnp.where(denom > 0, hj / jnp.maximum(denom, tiny), 1.0)
            s_new = jnp.where(denom > 0, hj1 / jnp.maximum(denom, tiny), 0.0)
            cs = cs.at[:, j].set(jnp.where(active, c_new, cs[:, j]))
            sn = sn.at[:, j].set(jnp.where(active, s_new, sn[:, j]))
            # update R column and the rotated rhs
            newcol = h.at[:, j].set(c_new * hj + s_new * hj1)[:, :m]
            Rm = Rm.at[:, :, j].set(
                jnp.where(active[:, None], newcol, Rm[:, :, j])
            )
            gj = g[:, j]
            g = g.at[:, j].set(jnp.where(active, c_new * gj, g[:, j]))
            g = g.at[:, j + 1].set(jnp.where(active, -s_new * gj, g[:, j + 1]))
            inner = inner + active.astype(jnp.int32)
            # total-iteration budget (Ginkgo Combined criterion semantics):
            # without this a subdomain could run to the end of its last
            # cycle, m-1 iterations past max_iters
            active = (active & (jnp.abs(g[:, j + 1]) > target)
                      & (inner < max_iters))
            return V, Rm, g, cs, sn, active, inner

        V, Rm, g, cs, sn, active, inner_count = jax.lax.fori_loop(
            0, m, step, (V, Rm, g, cs, sn, active0, inner_count)
        )

        # back substitution on the (masked) triangular factor
        y = jnp.zeros((S, m), dtype=b.dtype)

        def back(jj, y):
            j = m - 1 - jj
            s_ = g[:, j] - jnp.einsum("sk,sk->s", Rm[:, j, :], y)
            diag = Rm[:, j, j]
            yj = jnp.where(jnp.abs(diag) > 0, s_ / jnp.where(diag == 0, 1.0, diag), 0.0)
            return y.at[:, j].set(yj)

        y = jax.lax.fori_loop(0, m, back, y)
        dx = jnp.einsum("smr,sm->sr", V[:, :m], y)
        x_new = x + dx
        rnorm = M(b - apply_fn(x_new))
        return x_new, jnp.sqrt(_dot(rnorm, rnorm)), inner_count

    def cond(state):
        x, rnorm, cycles, active, inner = state
        return jnp.any(active) & (cycles < max_cycles)

    def body(state):
        x, rnorm, cycles, active, inner = state
        x_new, rnorm_new, inner = arnoldi_cycle(x, inner)
        x = jnp.where(active[:, None], x_new, x)
        rnorm = jnp.where(active, rnorm_new, rnorm)
        return x, rnorm, cycles + 1, active & (rnorm > target), inner

    active0 = rnorm0 > jnp.maximum(target, 0.0)
    inner0 = jnp.zeros(S, jnp.int32)
    x, rnorm, cycles, _, inner = jax.lax.while_loop(
        cond, body, (x0, rnorm0, jnp.int32(0), active0, inner0)
    )
    rel = rnorm / jnp.where(rnorm0 > 0, rnorm0, 1.0)
    return KrylovResult(x=x, iters=inner, rel_resnorm=rel)
