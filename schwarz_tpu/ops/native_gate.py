"""Native compile+execute gate for Pallas kernels (round-3 verdict item 2).

Policy: no Pallas kernel defaults on without a native compile+execute proof
on the actual backend, run once at solver build.  A Mosaic failure degrades
to the XLA fallback path (with the reason recorded on the solver) instead of
crashing the solve — shipping a kernel that was only ever validated in
interpret mode (the round-3 regression, BENCH_r03 rc=1) is structurally
impossible this way.

The proof result is cached per (process, key): repeated solver builds with
the same kernel/shape signature pay one probe compile total.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import numpy as np

_CACHE: dict = {}


def native_probe(
    key,
    fn: Callable,
    *args,
    compare: Optional[Callable] = None,
) -> Tuple[bool, Optional[str]]:
    """Compile + execute ``fn(*args)`` on the real backend once per ``key``.

    Returns ``(ok, reason)``; ``reason`` is the failure class + message (or a
    mismatch note when ``compare`` — a reference implementation on the same
    args — disagrees).  Never raises: any exception is the gate's negative
    answer.
    """
    if key in _CACHE:
        return _CACHE[key]
    try:
        out = jax.block_until_ready(fn(*args))
        ok, reason = True, None
        if compare is not None:
            ref = np.asarray(jax.block_until_ready(compare(*args)))
            ok = bool(np.array_equal(np.asarray(out), ref))
            if not ok:
                reason = "native result mismatch vs reference path"
    except Exception as e:  # the gate converts crashes into fallbacks
        ok, reason = False, f"{type(e).__name__}: {str(e)[:300]}"
    _CACHE[key] = (ok, reason)
    return ok, reason


def reset_cache() -> None:
    """Test hook: forget previous probe outcomes."""
    _CACHE.clear()
