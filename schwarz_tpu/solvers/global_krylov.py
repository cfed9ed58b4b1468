"""Distributed flexible GMRES over the subdomain mesh.

Krylov acceleration of the Schwarz method: instead of iterating the RAS fixed
point (the reference's only mode), solve the *global* system with FGMRES
preconditioned by one RAS application (local solves + optional coarse
correction).  Flexible GMRES tolerates the nonsymmetric/inexact RAS
preconditioner; for SPD and non-symmetric operators alike this typically cuts
outer iterations by several-fold — the standard production deployment of
Schwarz methods (Schwarz-as-preconditioner), beyond the reference's
stationary-solver scope.

All vectors live in the interior layout (Sl, R_int) sharded over ``'subd'``;
global inner products are ``psum`` reductions.  Designed to run inside
``shard_map`` (the caller supplies SPMD ``matvec``/``precond`` closures).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from schwarz_tpu.parallel.mesh import SUBD_AXIS


class FGMRESResult(NamedTuple):
    x: jax.Array            # (Sl, R_int)
    iters: jax.Array        # () total Krylov iterations
    rel_resnorm: jax.Array  # () final ||r|| / ||b||
    hist: jax.Array         # (max_iters + 2,) residual-norm history
    state: tuple            # resumable cycle carry (x, rnorm, it, cycles,
                            # active, hist) — chunked execution / checkpoint


def _gdot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jax.lax.psum(jnp.sum(a * b), SUBD_AXIS)


def fgmres(
    matvec: Callable[[jax.Array], jax.Array],
    precond: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array,
    tol: float,
    max_iters: int,
    restart: int,
    state: tuple | None = None,
    cycle_budget: int | None = None,
) -> FGMRESResult:
    """Right-preconditioned flexible GMRES(restart); SPMD inside shard_map.

    ``state`` (a prior result's ``.state``) resumes mid-solve at a restart
    boundary; ``cycle_budget`` caps the restart cycles executed THIS call
    (chunked execution: each cycle is one bounded XLA-visible unit, so a
    chunked run stays under device watchdog limits and is checkpointable).
    Results are identical to the unchunked run because FGMRES(restart)
    discards the Krylov basis at every restart anyway.
    """
    m = int(restart)
    Sl, R = b.shape
    dtype = b.dtype
    tiny = jnp.finfo(dtype).tiny

    bnorm = jnp.sqrt(_gdot(b, b))
    target = tol * jnp.maximum(bnorm, tiny)
    max_cycles = -(-max_iters // m)

    def cycle(carry):
        x, rnorm, it_total, cycles, active, hist = carry
        r = b - matvec(x)
        beta = jnp.sqrt(_gdot(r, r))
        V = jnp.zeros((m + 1, Sl, R), dtype).at[0].set(
            r / jnp.maximum(beta, tiny)
        )
        Z = jnp.zeros((m, Sl, R), dtype)
        Rm = jnp.zeros((m, m), dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)

        def step(j, c):
            V, Z, Rm, g, cs, sn, act, it_tot, hist = c
            z = precond(V[j])
            w = matvec(z)
            Z = Z.at[j].set(jnp.where(act, z, Z[j]))
            h = jnp.zeros(m + 1, dtype)

            def mgs(i, cw):
                w, h = cw
                hij = jnp.where(i <= j, _gdot(V[i], w), 0.0)
                return w - hij * V[i], h.at[i].set(hij)

            w, h = jax.lax.fori_loop(0, m, mgs, (w, h))
            hnext = jnp.sqrt(_gdot(w, w))
            V = V.at[j + 1].set(
                jnp.where(act, w / jnp.maximum(hnext, tiny), V[j + 1])
            )
            h = h.at[j + 1].set(hnext)

            def rot(i, hc):
                hi, hip = hc[i], hc[i + 1]
                ni = jnp.where(i < j, cs[i] * hi + sn[i] * hip, hi)
                nip = jnp.where(i < j, -sn[i] * hi + cs[i] * hip, hip)
                return hc.at[i].set(ni).at[i + 1].set(nip)

            h = jax.lax.fori_loop(0, m, rot, h)
            hj, hj1 = h[j], h[j + 1]
            den = jnp.sqrt(hj * hj + hj1 * hj1)
            c_new = jnp.where(den > 0, hj / jnp.maximum(den, tiny), 1.0)
            s_new = jnp.where(den > 0, hj1 / jnp.maximum(den, tiny), 0.0)
            cs = cs.at[j].set(jnp.where(act, c_new, cs[j]))
            sn = sn.at[j].set(jnp.where(act, s_new, sn[j]))
            Rm = Rm.at[:, j].set(
                jnp.where(act, h.at[j].set(c_new * hj + s_new * hj1)[:m],
                          Rm[:, j])
            )
            gj = g[j]
            g = g.at[j].set(jnp.where(act, c_new * gj, g[j]))
            g = g.at[j + 1].set(jnp.where(act, -s_new * gj, g[j + 1]))
            it_tot = it_tot + act.astype(jnp.int32)
            hist = jax.lax.dynamic_update_index_in_dim(
                hist, jnp.where(act, jnp.abs(g[j + 1]), hist[it_tot]),
                it_tot, 0,
            )
            act = act & (jnp.abs(g[j + 1]) > target) & (it_tot < max_iters)
            return V, Z, Rm, g, cs, sn, act, it_tot, hist

        act0 = active & (beta > target)
        V, Z, Rm, g, cs, sn, act, it_total, hist = jax.lax.fori_loop(
            0, m, step, (V, Z, Rm, g, cs, sn, act0, it_total, hist)
        )

        # back substitution (masked columns have zero diagonals)
        y = jnp.zeros(m, dtype)

        def back(jj, y):
            j = m - 1 - jj
            s_ = g[j] - Rm[j, :] @ y
            diag = Rm[j, j]
            yj = jnp.where(
                jnp.abs(diag) > 0, s_ / jnp.where(diag == 0, 1.0, diag), 0.0
            )
            return y.at[j].set(yj)

        y = jax.lax.fori_loop(0, m, back, y)
        dx = jnp.einsum("m,msr->sr", y, Z)
        x = jnp.where(active, x + dx, x)
        r2 = b - matvec(x)
        rnorm_new = jnp.sqrt(_gdot(r2, r2))
        rnorm = jnp.where(active, rnorm_new, rnorm)
        active = active & (rnorm > target) & (it_total < max_iters)
        return x, rnorm, it_total, cycles + 1, active, hist

    if state is None:
        r0 = b - matvec(x0)
        rnorm0 = jnp.sqrt(_gdot(r0, r0))
        hist0 = jnp.zeros(max_iters + 2, dtype).at[0].set(rnorm0)
        carry = (
            x0, rnorm0, jnp.int32(0), jnp.int32(0),
            rnorm0 > target, hist0,
        )
    else:
        x_s, rn_s, it_s, cy_s, _, h_s = state
        # re-derive activity under THIS call's tolerance/iteration budget:
        # a resumed solve may carry a larger max_iters than the run that
        # checkpointed (resume-with-larger-budget workflow) — and then the
        # checkpointed history array is too short: grow it, or writes past
        # its end would silently clamp onto the last slot
        if h_s.shape[0] < max_iters + 2:
            h_s = jnp.zeros(max_iters + 2, h_s.dtype).at[
                : h_s.shape[0]
            ].set(h_s)
        carry = (x_s, rn_s, it_s, cy_s,
                 (rn_s > target) & (it_s < max_iters), h_s)
    cycle_stop = (
        jnp.int32(max_cycles) if cycle_budget is None
        else jnp.minimum(jnp.int32(max_cycles),
                         carry[3] + jnp.int32(cycle_budget))
    )
    out = jax.lax.while_loop(
        lambda c: c[4] & (c[3] < cycle_stop), cycle, carry
    )
    x, rnorm, iters, cycles, _, hist = out
    rel = rnorm / jnp.maximum(bnorm, tiny)
    return FGMRESResult(x=x, iters=iters, rel_resnorm=rel, hist=hist,
                        state=out)
