"""Bounded backend selection with a dead-tunnel fallback.

The reference selects its executor per rank and fails fast on an unusable
one (source/schwarz_base.cpp:86-123: omp/cuda/reference dispatch plus a
CUDA device sanity check, utils.cpp:164-167).  On this platform the
analogous failure mode is a tunneled TPU backend whose first
``jax.devices()`` call HANGS for ~30 minutes before raising — so the
user-facing entry points (cli ``--executor auto`` and :func:`solve`) probe
the backend in a child process with a wall timeout first, and either fall
back to CPU with a notice (``auto``) or raise :class:`ExecutorError` with
an actionable message (explicit ``tpu``).

The probe is skipped whenever it cannot help: the executor is already CPU,
``JAX_PLATFORMS`` pins a platform, JAX has already initialised a backend in
this process (tests, library use after first jit), or
``SCHWARZ_TPU_SKIP_PROBE=1``.
"""

from __future__ import annotations

import os
import subprocess
import sys
import warnings

from schwarz_tpu.exceptions import SchwarzError


class ExecutorError(SchwarzError):
    """Requested executor unusable (reference role: the unknown-executor /
    no-CUDA-device failures of schwarz_base.cpp:86-123, utils.cpp:164-167).
    """


def _jax_backend_initialized() -> bool:
    """True iff a JAX backend already exists in this process (probing then
    cannot change anything and would only add latency)."""
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:
        return False


def probe_default_backend(timeout_s: float) -> bool:
    """``import jax; jax.devices()`` in a child process, bounded by a wall
    timeout.  Returns False on timeout or nonzero exit."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def ensure_backend(executor: str = "auto",
                   probe_timeout_s: float | None = None) -> str:
    """Bound backend init for ``executor`` in {auto, tpu, cpu}.

    Returns the platform actually selected ("default", "tpu" or "cpu") and
    sets ``JAX_PLATFORMS`` for fallbacks.  Must run before the first JAX
    backend use in the process to have any effect.
    """
    if executor == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        return "cpu"
    if executor not in ("auto", "tpu"):
        raise ExecutorError(
            f"unknown executor '{executor}' (want auto|tpu|cpu; the "
            "reference accepts omp|cuda|reference, schwarz_base.cpp:116-122)")
    if probe_timeout_s is None:
        probe_timeout_s = float(
            os.environ.get("SCHWARZ_TPU_PROBE_TIMEOUT_S", "60"))
    skip = (
        os.environ.get("SCHWARZ_TPU_SKIP_PROBE") == "1"
        or probe_timeout_s <= 0
        or os.environ.get("JAX_PLATFORMS", "") != ""
        or _jax_backend_initialized()
    )
    if skip or probe_default_backend(probe_timeout_s):
        return executor if executor == "tpu" else "default"
    if executor == "tpu":
        raise ExecutorError(
            f"TPU backend did not respond within {probe_timeout_s:.0f}s "
            "(dead tunnel?).  Retry, raise SCHWARZ_TPU_PROBE_TIMEOUT_S, or "
            "run with --executor cpu.")
    warnings.warn(
        f"default backend did not respond within {probe_timeout_s:.0f}s; "
        "falling back to CPU (pass --executor tpu to fail instead)",
        RuntimeWarning, stacklevel=2)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    return "cpu"
