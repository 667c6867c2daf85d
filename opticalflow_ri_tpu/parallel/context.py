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

_CTX = None  # (mesh, interpret) while active


@contextlib.contextmanager
def kernel_sharded_solvers(mesh, interpret: bool = False):
    """While active, HS/LS adapter solves dispatch to the kernel-sharded
    paths on ``mesh`` when the local tile shapes support them (per-solve
    graceful fallback otherwise)."""
    global _CTX
    prev = _CTX
    _CTX = (mesh, interpret)
    try:
        yield
    finally:
        _CTX = prev


def current_kernel_shard():
    """(mesh, interpret) of the active context, or None."""
    return _CTX
