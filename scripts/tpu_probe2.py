#!/usr/bin/env python
"""DIA SpMV rep-scaling on TPU + correctness cross-check vs CPU-computed oracle."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from schwarz_tpu import Settings, generate_rhs, laplacian_2d  # noqa: E402
from schwarz_tpu.core.decompose import decompose  # noqa: E402
from schwarz_tpu.ops.dia import dia_ell_spmv, split_dia_ell  # noqa: E402
from schwarz_tpu.ops.spmv import ell_spmv_batched  # noqa: E402


def log(*a):
    print(*a, flush=True)


log("devices:", jax.devices())
A = laplacian_2d(1024)
b = generate_rhs(A.n, random=False)
dec = decompose(A, b, Settings(overlap=3, dtype="float32", row_pad_multiple=128), 16)
hyb = split_dia_ell(dec.lmat_vals, dec.lmat_cols, dec.rows_count)
log("offsets:", hyb.offsets, "rem rows:", hyb.rem_rows.shape, "Wr:", hyb.rem_vals.shape)

dv = jnp.asarray(hyb.dia_vals, jnp.float32)
rr = jnp.asarray(hyb.rem_rows)
rv = jnp.asarray(hyb.rem_vals, jnp.float32)
rc = jnp.asarray(hyb.rem_cols)
R = dec.meta.max_rows
nnz = int((dec.lmat_vals != 0).sum())
x0 = jnp.ones((16, dec.meta.max_ext), jnp.float32)

# correctness first: single SpMV vs numpy ELL oracle
y_dev = np.asarray(dia_ell_spmv(hyb.offsets, dv, rr, rv, rc, x0))
x_np = np.ones((16, dec.meta.max_ext), np.float32)
y_ref = np.einsum(
    "srw,srw->sr", dec.lmat_vals,
    np.take_along_axis(
        x_np[:, : R], np.minimum(dec.lmat_cols.reshape(16, -1), R - 1), 1
    ).reshape(dec.lmat_cols.shape),
)
log("single-spmv max err vs oracle:", float(np.abs(y_dev - y_ref).max()))


def mk(reps):
    @jax.jit
    def chain(dvv, rrr, rvv, rcc, x):
        def body(_, xx):
            y = dia_ell_spmv(hyb.offsets, dvv, rrr, rvv, rcc, xx)
            return xx.at[:, :R].set(y * 1e-6 + 1.0)
        return jax.lax.fori_loop(0, reps, body, x)
    return chain


prev = None
for reps in [10, 100, 400]:
    ch = mk(reps)
    t0 = time.time()
    r = ch(dv, rr, rv, rc, x0)
    r.block_until_ready()
    log(f"reps={reps} compile+run {time.time()-t0:.2f}s")
    t0 = time.perf_counter()
    out = ch(dv, rr, rv, rc, x0)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    log(f"reps={reps} total={dt*1e3:.2f}ms per={dt/reps*1e6:.2f}us "
        f"nnz/s={nnz/(dt/reps):.3e} checksum={float(out.sum()):.6e}")
log("DONE")
