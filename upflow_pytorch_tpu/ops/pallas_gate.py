"""Trace-time kill switch for every Pallas fast path.

The Pallas kernels (conv, warp, feature-warp, correlation, corr-norm,
sgu-final) all assume they see FULL-width unsharded arrays; under GSPMD
spatial sharding a kernel would either force a full all-gather or read
wrong halos.  Sharded entry points (``parallel/step.py``) wrap tracing
in ``disable_pallas()`` so every dispatch predicate turns itself off —
the XLA formulations partition cleanly (GSPMD inserts the halo
exchanges/collectives) and stay numerically exact.

This is a *trace-time* mechanism: the flag only needs to be active while
JAX traces the wrapped function (dispatch predicates run in Python at
trace time), so a plain context manager around the traced call works
under ``jax.jit``.
"""

from __future__ import annotations

import contextlib
import threading

_state = threading.local()


def pallas_disabled() -> bool:
    """True while inside a ``disable_pallas()`` scope (this thread)."""
    return getattr(_state, "disabled", False)


@contextlib.contextmanager
def disable_pallas():
    """Force every Pallas dispatch predicate to the XLA path."""
    prev = getattr(_state, "disabled", False)
    _state.disabled = True
    try:
        yield
    finally:
        _state.disabled = prev
