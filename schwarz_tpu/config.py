"""Configuration system for the TPU-native restricted additive Schwarz framework.

This is the TPU-native equivalent of the reference Settings / Metadata structs
(reference: include/settings.hpp:77-305 ``Settings`` and :318-496 ``Metadata``).
Instead of C++ structs threaded by mutable reference through mixin classes, we use
frozen dataclasses: :class:`Settings` is static configuration (hashable, usable as a
jit static argument) and :class:`Metadata` is the derived per-run description produced
by setup.  All mutable per-iteration state lives in the :class:`~schwarz_tpu.ras`
solver-state pytree instead.

Knob coverage (reference include/settings.hpp):
  - executor choice          -> jax platform / Mesh (settings.hpp:80-90)
  - partition_settings       -> Partition enum      (settings.hpp:94-102)
  - overlap                  -> overlap             (settings.hpp:107-108)
  - matrix_filename / explicit_laplacian -> problem spec lives in models/ drivers
  - use_mixed_precision      -> halo_dtype          (settings.hpp:122)
  - local_solver_settings    -> LocalSolver enum    (settings.hpp:142-151)
  - non_symmetric_matrix / restart_iter / reset_local_crit_iter
                             -> same names          (settings.hpp:156-166)
  - use_precond              -> precond             (settings.hpp:181)
  - comm_settings            -> CommSettings        (settings.hpp:217-268)
  - convergence_settings     -> ConvergenceSettings (settings.hpp:273-290)
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax.numpy as jnp


class Partition(enum.Enum):
    """Partitioning strategy (reference include/settings.hpp:94-102).

    ``zoltan`` / ``custom`` are NOT_IMPLEMENTED in the reference
    (source/initialization.cpp:295-297, 321-327); here ``custom`` is supported by
    passing explicit ``partition_indices`` to setup, and ``zoltan`` is subsumed by
    ``metis`` (our pure graph-bisection partitioner).
    """

    regular = "regular"          # contiguous 1-D row blocks
    regular2d = "regular2d"      # square grid blocks (5-pt Laplacian domains)
    metis = "metis"              # graph partition (recursive bisection + refinement)
    custom = "custom"            # user-provided partition_indices


class LocalSolver(enum.Enum):
    """Local subdomain solver (reference include/settings.hpp:142-151).

    The TPU mapping of the reference's menu:
      - ``iterative_cg``     <- iterative_solver_ginkgo + symmetric (solve.cpp:571-652)
      - ``iterative_gmres``  <- iterative_solver_ginkgo + non_symmetric (solve.cpp:486-570)
      - ``direct_cholesky``  <- direct_solver_cholmod   (solve.cpp:92-143): batched
        *dense* Cholesky on device — dense factors feed the MXU, replacing CHOLMOD's
        host supernodal factorization + GPU triangular solves.
      - ``direct_lu``        <- direct_solver_umfpack / direct_solver_ginkgo
        (solve.cpp:144-173, 281-455): batched dense LU + pivoting on device.
    """

    iterative_cg = "cg"
    iterative_gmres = "gmres"
    direct_cholesky = "cholesky"
    direct_lu = "lu"


class Precond(enum.Enum):
    """Local preconditioner (reference solve.cpp:490-556: none / block-Jacobi /
    ParILU / ISAI).  TPU menu: none, diagonal Jacobi, block-Jacobi (batched dense
    diagonal-block inverses applied on the MXU), and FSAI(0) — the factorized
    sparse approximate inverse (Kolotilina-Yeremin), the SPD-safe counterpart
    of the reference's ISAI: M = G^T G with G on the lower pattern of A,
    applied as two SpMVs (gather-free DIA shifts on banded operators) —
    no triangular substitution anywhere, which is exactly why it fits TPUs
    where ParILU's two trisolves per apply do not."""

    none = "none"
    jacobi = "jacobi"
    block_jacobi = "block_jacobi"
    fsai = "fsai"
    # ILU(0) on A's own pattern — the reference's ParILU role
    # (solve.cpp:490-556) built TPU-first: the factorization runs once on
    # the host at setup (like CHOLMOD/UMFPACK, solve.cpp:92-173) and the
    # apply replaces the two SIMD-hostile triangular SUBSTITUTIONS with
    # ``ilu_sweeps`` truncated-Neumann (Jacobi) sweeps per factor — pure
    # SpMVs (gather-free DIA shifts on banded operators), the standard
    # iterative-trisolve formulation for wide-vector hardware.
    ilu = "ilu"


class HaloStrategy(enum.Enum):
    """How overlap/halo values of the iterate travel between devices.

    The reference's comm matrix (README.md:63-79; include/settings.hpp:217-268)
    is {onesided, twosided} x {put, get} x {gathered, one_by_one} MPI.  The
    TPU-native equivalents:
      - ``all_gather``: replicate interior slices via ``lax.all_gather`` over ICI and
        gather halo values locally.  Simple, bandwidth-heavy; the analogue of the
        reference's "global_solution on every rank" design (schwarz_base.cpp:340).
      - ``neighbor``:  per-neighbor packed buffers moved with ``lax.ppermute`` /
        ``ragged_all_to_all`` rounds — the analogue of gathered Isend/Irecv
        (restricted_schwarz.cpp:855-973).
      - ``rdma``: Pallas ``make_async_remote_copy`` one-sided remote DMA with
        semaphores — the analogue of MPI_Put/Get windows (restricted_schwarz.cpp:714-852).
    """

    all_gather = "all_gather"
    neighbor = "neighbor"
    rdma = "rdma"


class GlobalConvergence(enum.Enum):
    """Global convergence detection (reference C16-C19).

    - ``allgather``:     sum of all local norms, trust-local detection
                         (solve.cpp:888-948, ``enable_global_check``)
    - ``allreduce``:     count converged ranks via psum (solve.cpp:949-953)
    - ``tree``:          centralized binary-tree push-up/push-down protocol
                         (Yamazaki 2019; include/conv_tools.hpp:146-209) emulated as a
                         per-iteration int32 state machine over the mesh
    - ``decentralized``: leader-election bit-vector gossip (Bahi 2005;
                         include/conv_tools.hpp:212-275)
    """

    allgather = "allgather"
    allreduce = "allreduce"
    tree = "tree"
    decentralized = "decentralized"


class LocalCriterion(enum.Enum):
    """Local convergence criterion (reference settings.hpp:282-288):
    ``solution_based`` overwrites the interior slice each iteration;
    ``residual_based`` accumulates (communicate.cpp:81-93)."""

    solution_based = "solution_based"
    residual_based = "residual_based"


@dataclasses.dataclass(frozen=True)
class CommSettings:
    """Communication paradigm settings (reference include/settings.hpp:217-268).

    ``enable_onesided`` selects the asynchronous path; on TPU the synchronous
    emulation keeps all devices in one program but allows *stale* halos
    (``staleness`` > 0 reproduces the one-sided algorithm's tolerance of delayed
    neighbor data, cf. the skipped iteration-0 exchange restricted_schwarz.cpp:725).
    ``enable_overlap`` double-buffers the halo so communication of iterate k
    overlaps with the local solve of iterate k (restricted_schwarz.cpp:855-973).
    """

    onesided: bool = False
    overlap_comm: bool = False         # <- comm_settings.enable_overlap
    # Exact comm/compute overlap (the reference's enable_overlap WITHOUT
    # changing the iterate, restricted_schwarz.cpp:886-892,924-943): with a
    # LINEAR local solver (direct Cholesky, explicit-inverse apply) the
    # solve splits as  z = A_loc^-1 b_loc  -  A_loc^-1[:, iface] (A_iface
    # x_ext).  The first term is loop-invariant (hoisted at build); only
    # the O(R x Oi) boundary correction waits on the exchange, so the
    # halo collective overlaps everything else the scheduler has — and the
    # fixed point is unchanged (a linear-algebra identity, unlike
    # overlap_comm's one-iteration-stale halo).  Requires
    # local_solver='cholesky', direct_apply='inverse', solution-based
    # updates, no O-RAS; the solver raises otherwise.
    overlap_split: bool = False
    strategy: HaloStrategy = HaloStrategy.all_gather
    staleness: int = 0                 # halo age in iterations for async emulation
    # Free-running mode only: consume the freshest fully-ARRIVED message
    # instead of the guaranteed (staleness-old) slot.  The kernel peeks the
    # newer slots' DMA recv semaphores (no extra sync, flow control
    # unchanged), so the effective staleness shrinks to the actual arrival
    # lag — useful when staleness > 1 is set for latency tolerance but
    # neighbors usually keep up.  No effect at staleness <= 1.
    fresh_read: bool = False
    # one-sided strategy matrix (README.md:63-79, comm_helpers.hpp:55-180),
    # effective when strategy == rdma:
    #   - put: sender-initiated push of the packed buffer (MPI_Put gathered)
    #   - get: receiver-initiated request+reply (MPI_Get; ICI RDMA is
    #     push-only, so get is realized as request-semaphore + serve — the
    #     way RDMA NICs implement get themselves)
    # exactly one of enable_put/enable_get must be set.
    enable_put: bool = False
    enable_get: bool = True
    # one remote DMA per element instead of per packed buffer
    # (transfer_one_by_one, comm_helpers.hpp:58-89)
    enable_one_by_one: bool = False
    # flush discipline for one_by_one element DMAs (comm_helpers.hpp:128-149):
    # "flush-all" issues every element DMA then completes them together;
    # "flush-local" completes each transfer before issuing the next.  For
    # gathered (single-DMA) transfers the disciplines coincide.
    flush_type: str = "flush-all"
    # window-locking discipline.  "lock-all" (MPI_Win_lock_all at setup =
    # passive target, no per-transfer locks) is exactly the Pallas RDMA
    # semantics (DMA semaphores, no target-side locking) and is the only
    # supported value; "lock-local" (per-transfer MPI_Win_lock) has no ICI
    # analogue — the solver raises NotImplementedFeature on it.
    lock_type: str = "lock-all"
    # Host-staged transfers (schwarz_base.cpp:344-348) exist in the reference
    # solely to support non-device-aware MPI.  TPU ICI collectives operate on
    # HBM directly; there is no non-device-aware transport to work around, so
    # True raises NotImplementedFeature (fail loudly, don't parse silently).
    stage_through_host: bool = False


@dataclasses.dataclass(frozen=True)
class ConvergenceSettings:
    """Convergence detection settings (reference include/settings.hpp:273-290)."""

    method: GlobalConvergence = GlobalConvergence.allgather
    criterion: LocalCriterion = LocalCriterion.solution_based
    # put vs propagate for async residual-norm sharing (conv_tools.hpp:55-142):
    put_all_local_residual_norms: bool = True
    enable_accumulate: bool = False
    # delay global checks for the first 5% of max_iters (solve.cpp:992-996)
    enable_global_check_iter_offset: bool = False


@dataclasses.dataclass(frozen=True)
class Settings:
    """All user-tunable knobs (reference include/settings.hpp:77-305).

    Frozen and hashable so the whole object can be a static argument to jitted
    setup/solve functions; numeric/dtype fields that feed traced computation are
    read at trace time.
    """

    partition: Partition = Partition.regular
    overlap: int = 2                         # MINIMAL_OVERLAP (settings.hpp:64,108)
    local_solver: LocalSolver = LocalSolver.iterative_cg
    non_symmetric_matrix: bool = False
    restart_iter: int = 30                   # GMRES restart (settings.hpp:161)
    reset_local_crit_iter: int = -1          # (settings.hpp:166)
    precond: Precond = Precond.none
    block_jacobi_block_size: int = 16
    # truncated-Neumann sweeps per triangular factor in the ILU(0) apply
    # (Precond.ilu): z ~= U^-1 L^-1 r with each inverse expanded to
    # ``ilu_sweeps`` Jacobi iterations — exact as sweeps -> R, and 2-4 are
    # the standard operating range for iterative trisolves on wide-vector
    # hardware
    ilu_sweeps: int = 3
    max_iters: int = 100                     # outer iterations (bench_base.hpp:55)
    tolerance: float = 1e-6                  # outer rel. residual (bench_base.hpp:54)
    local_tolerance: float = 1e-12           # inner reduction factor (bench_base.hpp:56)
    local_max_iters: int = -1                # -1: local_size_x (solve.cpp:723-728)
    # direct-solve application: "trisolve" = batched forward/back
    # substitution on the factors (the reference's LowerTrs/UpperTrs role,
    # solve.cpp:711-720); "inverse" = setup-time explicit A^-1 applied as
    # ONE batched MXU matmul per solve — far faster applies on TPU at the
    # cost of squared conditioning in the apply (safe for the SPD subdomain
    # blocks; cholesky only); "blocked" = MXU panel substitution with
    # pre-inverted diagonal blocks — keeps the factor's conditioning while
    # replacing the scalar-unit substitution with matmuls (cholesky only)
    direct_apply: str = "trisolve"
    comm: CommSettings = dataclasses.field(default_factory=CommSettings)
    convergence: ConvergenceSettings = dataclasses.field(
        default_factory=ConvergenceSettings)
    # Value dtype for the solve; reference computes in double (settings.hpp:526-537).
    dtype: str = "float64"
    # Mixed-precision halo dtype (settings.hpp:122 use_mixed_precision pairs double
    # compute with float halo buffers); None = same as dtype.
    halo_dtype: Optional[str] = None
    # Mixed-precision LOCAL SOLVES (iterative refinement): residuals and the
    # iterate stay in ``dtype`` while the local subdomain solves run in this
    # dtype — f64 outer + f32 inner reaches f64 tolerances at f32 local-solve
    # speed (requires/implies the residual_based correction update).
    # None = same as dtype.  SURVEY.md §7 "f32-compute/f64-accumulate".
    local_compute_dtype: Optional[str] = None
    metis_objtype: str = "edgecut"           # (settings.hpp:176)
    # Debug / output toggles (settings.hpp:127-207)
    debug_print: bool = False
    print_matrices: bool = False
    # dump the full final solver state to schwarz_debug_out.npz after run()
    write_debug_out: bool = False
    write_iters_and_residuals: bool = False
    # Record-logger role (settings.hpp:196, solve.cpp:479-485): per-execution
    # progress lines (iteration, converged count, global norm) on stderr.
    # Residual/inner-iteration histories are always recorded regardless (they
    # live in the loop carry and cost nothing observable).
    enable_logging: bool = False
    # Staggered-round flag (settings.hpp:212, bench_base.hpp:59-60):
    # declared in the reference but read nowhere in its source — dead in
    # v1.  Kept for flag parity; True raises NotImplementedFeature.
    shifted_iter: bool = False
    # padding multiple for subdomain row counts (TPU lane alignment)
    row_pad_multiple: int = 8
    # SpMV storage for the local operator: "dia" = dominant-diagonal + ELL
    # remainder (gather-free shifts; the TPU-native format — see ops/dia.py),
    # "ell" = pure padded ELL, "auto" = dia when diagonals cover >= 50% of nnz
    spmv_format: str = "auto"
    # max dense diagonals extracted by the DIA split: more diagonals shrink
    # the (scalar-gather-bound) ELL remainder at the cost of denser bands —
    # worth raising for wide-overlap regular2d/metis closures
    dia_max_diags: int = 16
    # operator used INSIDE iterative local solves: "exact" applies
    # DIA + remainder; "dia_only" drops the ELL remainder from the inner
    # operator ONLY (residuals/convergence keep exact A — another
    # solve/check split).  Requires the residual-based criterion (the
    # correction form keeps the fixed point under any preconditioner; the
    # solution-based form would drift and stall — the constructor enforces
    # this).  Measured on the flagship regular2d/overlap-6 config the
    # remainder coupling IS the preconditioner quality (14 -> 101 outer
    # iterations when dropped), so "exact" stays the default; "dia_only" is
    # for closures whose remainder is genuinely marginal.
    inner_operator: str = "exact"
    # Pallas kernel for the DIA SpMV: "auto" = on TPU when shape/dtype allow,
    # "on" / "off" force
    use_pallas: str = "auto"
    # Fused Pallas x_ext assembly (ops/halo_pallas.py): ONE launch issuing
    # all interior-window + halo-run copies on the DMA engines, replacing
    # the ~85 dynamic_update_slice dispatches of the XLA runs path
    # (measured 0.8% of the copy roofline on v5e — round-2 verdict).
    # "auto" = on TPU when a run plan exists, dtypes match, and the output
    # fits VMEM; "on" forces (interpret mode on CPU meshes), "off" disables.
    halo_fused: str = "auto"
    # Fused whole-solve CG Pallas kernel (ops/fused_cg.py): runs the entire
    # batched local CG loop in ONE kernel launch with all state VMEM-resident.
    # Targets the launch-bound small-subdomain regime (each XLA inner iteration
    # otherwise costs ~10 dispatches).  Opt-in; requires local_solver='cg', a
    # pure-DIA operator (zero ELL remainder), f32 local compute,
    # none/jacobi preconditioner, and row_pad_multiple=128 — the constructor
    # raises with the recipe when a requirement is missing.
    fused_local_cg: bool = False
    # O-RAS (optimized Schwarz, Robin transmission conditions).  The LOCAL
    # SOLVE operator's boundary rows (rows carrying interface couplings) get
    # diag += c * sum_j |a_ij| over the dropped (ghost) couplings, and the
    # local rhs carries the matching c*D*trace term with the NEIGHBOR's trace
    # from the halo exchange, so the fixed point stays exactly A x = b.
    # Ghost elimination of a Robin condition (d/dn + p) u = g gives this form
    # with c in (-1, 0]: c = 0 is classical Dirichlet RAS (reference
    # behavior; its own O-RAS checkbox is unimplemented), c -> -1 approaches
    # Neumann, and the optimized Robin parameter sits in between — measured
    # optimum c ~ -0.85 cuts outer iterations ~3-4x on Laplacian/advection
    # model problems.  Convergence checks keep the true A (solve-operator /
    # check-operator split).  "auto" is coarse-space-aware: c = -0.8
    # one-level (improved every measured one-level configuration, 1.1-4.5x
    # fewer iterations across Laplacian/anisotropic/advection x overlaps
    # 2-8 x 4-16 subdomains, never regressed) and c = -0.6 with
    # two_level=True (the coarse space already removes the smooth error
    # modes the strongest Robin weight targets: measured on 128^2/16,
    # -0.8 regresses at the f32 floor (155 -> 189 iters) while -0.6 is
    # the sweep optimum in BOTH dtypes — 148 f32 / 105 f64 vs 155/120
    # classical; scripts/probe_oras_twolevel.py).  Pass an explicit float
    # to tune per problem.  Also honored by the free-running kernels
    # (preconditioner form on the in-kernel correction CG; measured
    # 384 -> 128 detection rounds at 64^2/8 strips with one-grid-row
    # overlap, c=-0.8 — see the BENCHMARKING.md overlap-regime table).
    oras_weight: object = 0.0   # float, or the string "auto"
    # Two-level RAS: additive Nicolaides (piecewise-constant per subdomain)
    # coarse correction each iteration.  BEYOND the reference (which is
    # strictly one-level); off by default for parity, on for scalability in
    # the subdomain count.
    two_level: bool = False
    # Richer aggregation coarse space: split every subdomain's interior into
    # q equal contiguous sub-aggregates (q coarse DOFs per subdomain instead
    # of Nicolaides' one).  The restriction/prolongation stay gather-free
    # (reshape segment sums / broadcasts) and the (q S)^2 coarse solve stays
    # replicated-trivial; larger q kills more low-frequency error per outer
    # iteration at negligible cost.  Must divide the padded interior width
    # (aggregates mode); only meaningful with two_level=True.
    coarse_aggregates: int = 1
    # What the q coarse DOFs per subdomain ARE:
    #   - "aggregates": piecewise-constant indicator over q equal contiguous
    #     interior chunks (q = 1 is classic Nicolaides).  Zero setup cost,
    #     geometric quality.
    #   - "spectral":  the q lowest eigenvectors of each subdomain's interior
    #     diagonal block A_ss (a GenEO-style spectral coarse space, computed
    #     once at setup on host).  Captures exactly the local near-kernel the
    #     one-level method propagates slowest — markedly fewer outer
    #     iterations per coarse DOF than geometric chunks, especially on
    #     anisotropic / unstructured operators where contiguous index chunks
    #     don't follow the physics.  Runtime cost is identical in shape to
    #     aggregates (one small einsum per side instead of a reshape-sum);
    #     the (q S)^2 Galerkin coarse matrix V^T A V stays replicated.
    coarse_space: str = "aggregates"
    # How the (qS)-dimensional Galerkin coarse system is solved each
    # application: "dense" = row-sharded replicated inverse, one matmul
    # (computed once at setup — optimal up to a few thousand coarse DOFs);
    # "cg" = distributed CG on the ROW-SHARDED coarse matrix (matvec = one
    # all_gather of the coefficient vector + a local product, dots = psum)
    # — nothing (qS)^2 is inverted or replicated, so the coarse space
    # scales with the subdomain count (e.g. spectral q=64 at S=256 would
    # need a 16384^2 inverse in dense mode).  A_c is SPD for SPD A; keep
    # "dense" for non-symmetric operators.
    coarse_solver: str = "dense"
    # Krylov acceleration: "none" iterates the RAS fixed point (reference
    # behavior); "fgmres" solves the global system with flexible GMRES
    # preconditioned by one RAS application — typically several-fold fewer
    # outer iterations (Schwarz-as-preconditioner, the standard production
    # deployment; beyond the reference's stationary-only scope).
    accelerator: str = "none"
    # TRUE free-running asynchronous mode (ops/async_ras.py): one
    # multi-iteration Pallas kernel launch per chunk, devices iterating at
    # independent rates on bounded-staleness one-sided halos with in-band
    # gossip detection (the reference's research configuration,
    # restricted_schwarz.cpp:714-852).  Requires a banded operator, regular
    # partition, one subdomain per device, f32 — the plan builder raises
    # NotImplementedFeature otherwise.  comm.staleness sets the halo age
    # bound B; local_max_iters (>0) sets the inner CG budget per outer
    # iteration.
    free_running: bool = False

    @property
    def value_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def halo_value_dtype(self):
        return jnp.dtype(self.halo_dtype) if self.halo_dtype else self.value_dtype

    def replace(self, **kw) -> "Settings":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class Metadata:
    """Static, derived description of a decomposed problem — the immutable subset of
    the reference ``Metadata`` struct (include/settings.hpp:318-496).  Sizes here are
    the *padded* (static-shape) sizes used on device; exact per-subdomain sizes live
    as arrays inside the decomposition plan.

    Mutable run state of the reference Metadata (iter_count, residual norms, timing
    structs) lives in the solver-state pytree / metrics module instead.
    """

    global_size: int
    num_subdomains: int
    overlap: int
    # padded per-subdomain sizes (uniform across subdomains; TPU static shapes)
    max_interior: int       # padded interior rows   (metadata.local_size)
    max_rows: int           # padded interior+overlap (metadata.local_size_x)
    max_ext: int            # padded interior+overlap+ghost ring
    ell_width_local: int    # ELL nnz/row of padded local matrices
    ell_width_interface: int
    nnz_global: int

    def __post_init__(self):
        assert self.max_interior <= self.max_rows <= self.max_ext
