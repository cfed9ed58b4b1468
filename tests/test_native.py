"""Native C++ setup kernels must be bit-identical to the numpy reference path
(schwarz_tpu/native.py <-> core/decompose.py)."""

import numpy as np
import pytest

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, native
from schwarz_tpu.config import Partition
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.models import anisotropic_diffusion_2d

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _decompose_both(mat, rhs, settings, S, monkeypatch):
    dec_native = decompose(mat, rhs, settings, S)
    # force the numpy fallback
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    dec_numpy = decompose(mat, rhs, settings, S)
    monkeypatch.setattr(native, "_TRIED", False)
    return dec_native, dec_numpy


@pytest.mark.parametrize(
    "partition,overlap",
    [(Partition.regular, 2), (Partition.regular, 4), (Partition.metis, 3)],
)
def test_native_matches_numpy(partition, overlap, monkeypatch):
    A = anisotropic_diffusion_2d(12)
    b = generate_rhs(A.n)
    s = Settings(partition=partition, overlap=overlap)
    dn, dp = _decompose_both(A, b, s, 4, monkeypatch)
    np.testing.assert_array_equal(dn.rows_count, dp.rows_count)
    np.testing.assert_array_equal(dn.ghost_count, dp.ghost_count)
    np.testing.assert_array_equal(dn.local_to_global, dp.local_to_global)
    np.testing.assert_array_equal(dn.lmat_cols, dp.lmat_cols)
    np.testing.assert_array_equal(dn.lmat_vals, dp.lmat_vals)
    np.testing.assert_array_equal(dn.imat_cols, dp.imat_cols)
    np.testing.assert_array_equal(dn.imat_vals, dp.imat_vals)
    np.testing.assert_array_equal(dn.halo_src, dp.halo_src)
    np.testing.assert_array_equal(dn.local_rhs, dp.local_rhs)
    np.testing.assert_array_equal(dn.comm_matrix, dp.comm_matrix)
    np.testing.assert_array_equal(
        dn.global_matrix.col_idxs, dp.global_matrix.col_idxs
    )
    np.testing.assert_array_equal(
        dn.global_matrix.values, dp.global_matrix.values
    )


def test_native_setup_speed():
    # the native path should not be slower than numpy on a mid-size problem
    import time

    A = laplacian_2d(64)
    b = generate_rhs(A.n)
    s = Settings(overlap=3)
    t0 = time.perf_counter()
    decompose(A, b, s, 8)
    t_native = time.perf_counter() - t0
    assert native.available()
    assert t_native < 30.0  # sanity bound; real speed check in bench


def test_fm_refine_native_matches_python():
    # the native FM kernel must be bit-identical to the python heapq path
    import os
    import subprocess
    import sys

    import numpy as np

    from schwarz_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    # compare full partitions computed with and without the native path
    code = (
        "import os, numpy as np\n"
        "from schwarz_tpu.models import laplacian_2d\n"
        "from schwarz_tpu.core.partition import partition_metis\n"
        "A = laplacian_2d(48)\n"
        "p = partition_metis(A, 6)\n"
        "np.save(os.environ['OUT'], p)\n"
    )
    outs = {}
    for tag, flag in (("native", "1"), ("python", "0")):
        out = f"/tmp/fm_part_{tag}.npy"
        env = dict(os.environ, SCHWARZ_TPU_NATIVE=flag, OUT=out,
                   JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
        subprocess.run([sys.executable, "-c", code], check=True, env=env)
        outs[tag] = np.load(out)
    np.testing.assert_array_equal(outs["native"], outs["python"])
