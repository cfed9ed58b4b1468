"""Metrics/CSV utility tests (C28/C29)."""

import numpy as np

from schwarz_tpu.utils import (
    STAGES,
    StageTimer,
    write_comm_data,
    write_iters_and_residuals,
    write_timings,
)
from schwarz_tpu.utils.validation import (
    dump_csr_csv,
    find_duplicates,
    validate_permutation,
)


def test_stage_timer_summary():
    t = StageTimer()
    for _ in range(3):
        with t.time("local_solve"):
            pass
    s = t.summary()
    assert s["local_solve"]["count"] == 3
    assert s["local_solve"]["total"] >= s["local_solve"]["max"]
    assert set(STAGES) == {
        "boundary_exchange", "boundary_update", "convergence_check",
        "local_solve", "expand_local_vec",
    }


def test_write_timings_csv(tmp_path):
    t = StageTimer()
    with t.time("boundary_exchange"):
        pass
    p = tmp_path / "t.csv"
    write_timings(t.summary(), str(p))
    lines = p.read_text().splitlines()
    assert lines[0] == "func,total,avg,min,med,max"
    assert lines[1].startswith("boundary_exchange,")


def test_write_comm_data_csv(tmp_path):
    cm = np.array([[0, 3], [2, 0]])
    p = tmp_path / "c.csv"
    write_comm_data(cm, 7, str(p), locality=np.ones((2, 2), bool))
    lines = p.read_text().splitlines()
    assert lines[1] == "0,1,3,2,7,1"
    assert lines[2] == "1,0,2,3,7,1"


def test_write_iters_and_residuals(tmp_path):
    lh = np.array([[1.0, 2.0], [0.5, 1.0]])
    gh = np.array([3.0, 1.5])
    ih = np.array([[4, 5], [2, 3]])
    write_iters_and_residuals(lh, gh, ih, str(tmp_path) + "/")
    f0 = (tmp_path / "iter_res_00.csv").read_text().splitlines()
    assert f0[0] == "iter,local_resnorm,global_resnorm,inner_iters"
    assert f0[1] == "0,1,3,4"
    assert (tmp_path / "iter_res_01.csv").exists()


def test_validation_helpers(tmp_path):
    assert validate_permutation(np.array([2, 0, 1]))
    assert not validate_permutation(np.array([0, 0, 1]))
    assert not validate_permutation(np.array([0, 1, 3]))
    assert find_duplicates(np.array([1, 2, 2, 3]), 2) == 2
    from schwarz_tpu.models import laplacian_2d

    A = laplacian_2d(3)
    dump_csr_csv(A, str(tmp_path / "m.csv"))
    lines = (tmp_path / "m.csv").read_text().splitlines()
    assert lines[0] == "row,col,value"
    assert len(lines) == A.nnz + 1


def test_solve_accepts_scipy_matrix():
    """solve() converts scipy-sparse inputs (bench_ras.cpp's matrix path)."""
    import numpy as np

    from schwarz_tpu import Settings, laplacian_2d, solve

    A = laplacian_2d(16).to_scipy()
    b = np.ones(A.shape[0])
    r = solve(A, b, Settings(overlap=2, tolerance=1e-8, max_iters=200),
              num_subdomains=4)
    assert r.converged
    res = np.linalg.norm(A @ np.asarray(r.solution) - b) / np.linalg.norm(b)
    assert res < 1e-7


def test_neighbor_locality_shape():
    """C22 analogue: ICI/DCN locality matrix is (S, S) bool, True on-diagonal."""
    import numpy as np

    from schwarz_tpu import Settings, generate_rhs, laplacian_2d
    from schwarz_tpu.core.decompose import decompose
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(16)
    dec = decompose(A, generate_rhs(A.n), Settings(overlap=2), 4)
    loc = RASolver(dec).neighbor_locality()
    assert loc.shape == (4, 4) and loc.dtype == bool
    assert np.all(np.diag(loc))    # a subdomain is local to itself
