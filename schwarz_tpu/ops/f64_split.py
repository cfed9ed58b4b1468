"""Lossless hi/lo f32 split of EMULATED f64 arrays (TPU).

TPU f64 is a float32-pair emulation (x = hi + lo with |lo| <= ulp(hi)/2):
``f32(x)`` recovers the high word exactly and ``x - hi`` IS the low word,
so the split round-trips bit-exactly THERE.  XLA scalarizes gathers and
scatters of the emulated pairs (profiled at 0.4-2.2 GB/s on the 512^2
flagship); two f32 gathers / scatter-sets plus one fused f64 add run at
full vector speed.  On CPU f64 is native (52-bit mantissa — a two-float
split would LOSE bits) and gathers/scatters are fast anyway, so the
callers gate on :func:`f64_emulated`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def f64_emulated() -> bool:
    """True where f64 is a float32-pair emulation (non-CPU backends)."""
    return jax.default_backend() != "cpu"


def split_f64(x: jax.Array):
    """(hi, lo) f32 pair with ``hi + lo == x`` exactly under emulation."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo
