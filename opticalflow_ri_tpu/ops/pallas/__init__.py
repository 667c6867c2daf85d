"""Pallas TPU kernels — the native kernel layer.

The reference's native layer is two OpenCL C files (SURVEY.md section 2.2);
here the equivalents are Mosaic/Pallas kernels.  Each kernel has an XLA
fallback in its solver (``impl="xla"``): Pallas engages on TPU backends for
shapes that tile cleanly, and the fallbacks keep CPU tests and odd shapes
working.  Parity between both paths is asserted in tests.

Dispatch policy (``pallas_default_on``): the kernels that measured FASTER than
XLA on hardware (Farneback updateMatrices 8x, blur5+flow 1.4x, LK Gauss-Newton
2.3x, whole-solve HS 2.6x, temporal-blocked tiled HS 4.5x at 2048^2 — see
scripts/pallas_ab_results.json) default ON for TPU backends; whole-solve
Liu-Shen measures ~parity and stays ON (bit-identical, saves nothing either
way).  On the tunneled 'axon' backend, server-side Mosaic
compiles hang the device, so Pallas only engages when the client-side compile
path (PALLAS_AXON_REMOTE_COMPILE=1, read by the interpreter at start-up) is
active.  OFRI_DISABLE_PALLAS=1 force-disables everything.

Arbitrary image shapes: the LK GN, updateMatrices and blur5 kernels
zero-pad their fields to the f32 (8, 128) tile and crop the outputs, so the
fast path engages off the tile grid too (validated on hardware at 500x700:
LK max|d| 3.4e-4 vs XLA, Farneback 2.6e-6 vs CPU).

Known limitation: the policy keys on ``jax.default_backend()``, not the
device a trace targets — running a solver on an explicit CPU device inside
a TPU-default process needs OFRI_DISABLE_PALLAS=1.
"""

import contextlib as _contextlib
import os as _os

_FORCE_XLA_DEPTH = 0


@_contextlib.contextmanager
def force_xla():
    """Trace-time override: dispatch every solver to its XLA path.

    Used while tracing GSPMD auto-sharded pipelines — XLA's SPMD partitioner
    cannot partition a Pallas custom call (it would replicate the whole
    computation on every device), whereas the plain XLA ops partition into
    halo exchanges and collectives.  The hand-tuned shard_map solvers don't
    need this: inside shard_map a kernel runs on the local shard, which is
    exactly right."""
    global _FORCE_XLA_DEPTH
    _FORCE_XLA_DEPTH += 1
    try:
        yield
    finally:
        _FORCE_XLA_DEPTH -= 1


def pallas_default_on() -> bool:
    """True when the measured-faster Pallas kernels should engage."""
    if _FORCE_XLA_DEPTH:
        return False
    if _os.environ.get("OFRI_DISABLE_PALLAS") == "1":
        return False
    import jax

    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    if backend == "cpu":
        return False
    if _os.environ.get("OFRI_ENABLE_PALLAS") == "1":
        return True
    if backend == "axon":
        return _os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
    return True
