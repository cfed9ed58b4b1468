"""Native-proof gate (ops/native_gate.py): the policy that no Pallas kernel
defaults on without a compile+execute proof, with failures degrading to the
XLA fallback instead of crashing (round-3 verdict item 2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from schwarz_tpu.ops import native_gate


@pytest.fixture(autouse=True)
def _fresh_cache():
    native_gate.reset_cache()
    yield
    native_gate.reset_cache()


def test_probe_pass_and_compare():
    ok, reason = native_gate.native_probe(
        ("t1",), lambda: jnp.arange(8.0), compare=lambda: jnp.arange(8.0))
    assert ok and reason is None


def test_probe_catches_exceptions_as_negative_answer():
    def boom():
        raise RuntimeError("Mosaic failed to compile TPU kernel: nope")

    ok, reason = native_gate.native_probe(("t2",), boom)
    assert not ok
    assert "RuntimeError" in reason and "Mosaic" in reason


def test_probe_detects_result_mismatch():
    ok, reason = native_gate.native_probe(
        ("t3",), lambda: jnp.zeros(4), compare=lambda: jnp.ones(4))
    assert not ok
    assert "mismatch" in reason


def test_probe_caches_per_key():
    calls = []

    def fn():
        calls.append(1)
        return jnp.zeros(2)

    for _ in range(3):
        ok, _ = native_gate.native_probe(("t4",), fn)
        assert ok
    assert len(calls) == 1

    # a different key probes again
    native_gate.native_probe(("t5",), fn)
    assert len(calls) == 2


def test_solver_records_probe_reason_on_cpu_force():
    # CPU meshes skip the native probe (interpret mode); the tiled plan
    # gate still records why fused is off for unaligned layouts — covered
    # in test_halo_pallas.  Here: the probe cache is reachable through the
    # public entry point used by RASolver.
    import numpy as _np

    ok, reason = native_gate.native_probe(
        ("t6",),
        lambda: jnp.asarray(_np.arange(4.0)),
        compare=lambda: jnp.asarray(_np.arange(4.0)),
    )
    assert ok, reason
