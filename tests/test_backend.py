"""Bounded backend selection (utils/backend.py).

Reference role: per-rank executor selection with fail-fast on an unusable
backend (source/schwarz_base.cpp:86-123; utils.cpp:164-167).  The TPU-build
failure mode is a dead tunnel that hangs jax.devices(); these tests pin the
probe/fallback decision table without needing a dead tunnel.
"""

import warnings

import pytest

from schwarz_tpu.utils import backend as be
from schwarz_tpu.utils.backend import ExecutorError, ensure_backend


@pytest.fixture
def probe_env(monkeypatch):
    """Force the probe to actually run (no skip conditions)."""
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("SCHWARZ_TPU_SKIP_PROBE", raising=False)
    monkeypatch.setattr(be, "_jax_backend_initialized", lambda: False)
    return monkeypatch


def test_cpu_pins_platform(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert ensure_backend("cpu") == "cpu"
    import os

    assert os.environ["JAX_PLATFORMS"] == "cpu"


def test_unknown_executor_raises():
    with pytest.raises(ExecutorError, match="unknown executor"):
        ensure_backend("cuda")


def test_auto_healthy_probe_selects_default(probe_env):
    probe_env.setattr(be, "probe_default_backend", lambda t: True)
    assert ensure_backend("auto") == "default"


def test_auto_dead_tunnel_falls_back_to_cpu(probe_env):
    import os

    probe_env.setattr(be, "probe_default_backend", lambda t: False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert ensure_backend("auto") == "cpu"
    assert any("falling back to CPU" in str(x.message) for x in w)
    assert os.environ["JAX_PLATFORMS"] == "cpu"


def test_tpu_dead_tunnel_raises_actionable(probe_env):
    probe_env.setattr(be, "probe_default_backend", lambda t: False)
    with pytest.raises(ExecutorError, match="did not respond"):
        ensure_backend("tpu")


def test_probe_skipped_when_backend_initialized(probe_env):
    probe_env.setattr(be, "_jax_backend_initialized", lambda: True)

    def boom(t):  # pragma: no cover - must not be called
        raise AssertionError("probe ran despite initialized backend")

    probe_env.setattr(be, "probe_default_backend", boom)
    assert ensure_backend("auto") == "default"


def test_probe_skipped_when_platform_pinned(probe_env):
    probe_env.setenv("JAX_PLATFORMS", "cpu")

    def boom(t):  # pragma: no cover
        raise AssertionError("probe ran despite pinned JAX_PLATFORMS")

    probe_env.setattr(be, "probe_default_backend", boom)
    assert ensure_backend("auto") == "default"


def test_probe_timeout_env_zero_skips(probe_env, monkeypatch):
    monkeypatch.setenv("SCHWARZ_TPU_PROBE_TIMEOUT_S", "0")

    def boom(t):  # pragma: no cover
        raise AssertionError("probe ran despite zero timeout")

    probe_env.setattr(be, "probe_default_backend", boom)
    assert ensure_backend("auto") == "default"


def test_real_probe_runs_quickly_on_cpu(monkeypatch):
    # the actual child-process probe against a pinned-CPU environment
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert be.probe_default_backend(timeout_s=120.0)
