"""Worker for the 2-process jax.distributed CPU-mesh test.

Each process owns 4 virtual CPU devices; the two processes form one 8-device
global mesh.  Cross-process halo rounds then ride the distributed runtime
(the DCN role), while intra-process rounds stay host-local (the ICI role) —
the reference's node-locality hierarchy (source/utils.cpp:41-78) exercised
for real across OS processes.

Run: python distributed_worker.py <pid> <nproc> <port> [ndev_local=4]
Prints one line: ``WORKER_OK rel=<true relative residual>`` on success.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
ndev = int(sys.argv[4]) if len(sys.argv) > 4 else 4
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + f" --xla_force_host_platform_device_count={ndev}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc,
    process_id=pid,
)

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from schwarz_tpu import (  # noqa: E402
    CommSettings,
    HaloStrategy,
    Settings,
    generate_rhs,
    laplacian_2d,
)
from schwarz_tpu.core.decompose import decompose  # noqa: E402
from schwarz_tpu.parallel.mesh import make_mesh  # noqa: E402
from schwarz_tpu.ras import RASolver  # noqa: E402

assert len(jax.devices()) == ndev * nproc, jax.devices()
assert len(jax.local_devices()) == ndev

A = laplacian_2d(16)
b = generate_rhs(A.n, random=False)
S = ndev * nproc
s = Settings(overlap=3, tolerance=1e-7, max_iters=300, dtype="float64",
             comm=CommSettings(strategy=HaloStrategy.neighbor))
dec = decompose(A, b, s, S)
mesh = make_mesh(np.array(jax.devices()))
solver = RASolver(dec, mesh=mesh)

# locality-aware plan: with 2 hosts x 4 devices some rounds MUST be DCN and
# ICI rounds must come first
nx = solver._neighbor_plan
assert nx.round_is_dcn is not None
assert any(nx.round_is_dcn), nx.round_is_dcn
first_dcn = nx.round_is_dcn.index(True)
assert all(nx.round_is_dcn[first_dcn:]), "ICI rounds must precede DCN rounds"

st = solver.init_state()
final = solver._run_fn(solver._plan, st)
nconv = int(final["nconv"])
it = int(final["it"])
assert nconv >= S, (nconv, it)

x_own = multihost_utils.process_allgather(final["x_own"], tiled=True)
x_own = np.asarray(x_own).reshape(S, -1)
x_perm = np.zeros(dec.meta.global_size)
for p in range(S):
    lo, hi = dec.first_row[p], dec.first_row[p + 1]
    x_perm[lo:hi] = x_own[p, : hi - lo]
resid = dec.global_rhs - dec.global_matrix.to_scipy() @ x_perm
rel = float(np.linalg.norm(resid) / np.linalg.norm(dec.global_rhs))
assert rel < 1e-5, rel

# two-level with the DISTRIBUTED CG coarse solve: the row-sharded Galerkin
# matvec all_gathers the coefficient vector ACROSS PROCESSES and the psum
# dots ride the distributed runtime — the scalable coarse mode proven on a
# genuinely multi-controller mesh
s2 = s.replace(two_level=True, coarse_aggregates=2,
               coarse_space="spectral", coarse_solver="cg")
dec2 = decompose(A, b, s2, S)
solver2 = RASolver(dec2, mesh=mesh)
st2 = solver2.init_state()
final2 = solver2._run_fn(solver2._plan, st2)
assert int(final2["nconv"]) >= S
it2 = int(final2["it"])
x2 = multihost_utils.process_allgather(final2["x_own"], tiled=True)
x2 = np.asarray(x2).reshape(S, -1)
x2_perm = np.zeros(dec2.meta.global_size)
for p in range(S):
    lo, hi = dec2.first_row[p], dec2.first_row[p + 1]
    x2_perm[lo:hi] = x2[p, : hi - lo]
resid2 = dec2.global_rhs - dec2.global_matrix.to_scipy() @ x2_perm
rel2 = float(np.linalg.norm(resid2) / np.linalg.norm(dec2.global_rhs))
assert rel2 < 1e-5, rel2
assert it2 <= it, (it2, it)   # the coarse space must not slow it down

print(f"WORKER_OK rel={rel:.3e} iters={it} rel2={rel2:.3e} iters2={it2}",
      flush=True)
