"""Trace-time context routing solver adapters to kernel-sharded paths.

``auto_sharded_pipeline`` traces whole configurations (pyramid levels,
warps, filters, adapter protocol) for GSPMD — but GSPMD cannot partition a
Pallas call, so by default every solver body must be XLA (``force_xla``).
This context is the escape hatch that keeps the VALIDATED kernels in
multi-chip pipelines: while active, the HS and Liu-Shen adapters route
their solves through the shard_map-composed kernel paths
(parallel/sharded_pallas.py) on the context's mesh — per-device tiled
kernels with T-deep ppermute halos — while everything around them
(prefilter, resize, warping, LK/FB solves) stays GSPMD-partitioned XLA.

Import-cycle note: this module must stay dependency-free (the models import
it inside ``compute`` at call time; parallel/__init__ imports models via
sharded.py).
"""

from __future__ import annotations

import contextlib
import contextvars

# context-local (not process-global): a concurrent trace on another thread
# must not inherit this trace's mesh routing
_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "kernel_shard_ctx", default=None
)


@contextlib.contextmanager
def kernel_sharded_solvers(mesh, interpret: bool = False):
    """While active, solver adapters (HS/LS/LK/FB) dispatch to the
    kernel-sharded paths on ``mesh`` when the local tile shapes support them
    (per-solve graceful fallback otherwise)."""
    token = _CTX.set((mesh, interpret))
    try:
        yield
    finally:
        _CTX.reset(token)


def current_kernel_shard():
    """(mesh, interpret) of the active context, or None."""
    return _CTX.get()
