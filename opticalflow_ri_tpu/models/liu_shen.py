"""Liu-Shen physics-based optical flow (continuity-equation refiner), TPU-native.

Functional re-design of the reference implementation
(ref: src/PhysicsBasedOpticalFlowLiuShen.py).  The fixed-point iteration —
twelve 3x3 stencils assembling (bu, bv) plus the 2x2-inverse update — runs
inside one jitted ``lax.while_loop`` (tolerance 1e-8, max 60 iterations,
ref: :88-89,:141), so each iteration is a fused VPU pass with no host round
trips, unlike the reference's per-iteration scipy convolutions (ref: :142-148).

Numerics parity notes:
  * all stencils are correlations with the original MATLAB kernels — the
    reference flips them (ref: :116-121) precisely so scipy's convolve becomes
    correlation; we correlate directly;
  * border modes: 'nearest' (replicate) everywhere except the H-kernel terms
    and the cmtx neighbour-count field, which use zero padding (ref: :61,:144);
  * both frames are normalised by their own global maxima (ref: :96-97) — on
    a sharded run this becomes a psum-style global reduction;
  * the solver's "u" axis is image *rows*; the adapter swaps components on the
    way in and out exactly like the reference (ref: :37-39).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from opticalflow_ri_tpu.ops.stencil import correlate3x3

# Original (MATLAB-orientation) kernels; applied as correlations.
_K_D1 = np.array([[0, -1, 0], [0, 0, 0], [0, 1, 0]], np.float32) / 2.0   # d/drow
_K_D2 = _K_D1.T                                                          # d/dcol
_K_F1 = np.array([[0, 1, 0], [0, 0, 0], [0, 1, 0]], np.float32)          # row-neighbour sum
_K_F2 = _K_F1.T
_K_M = np.array([[1, 0, -1], [0, 0, 0], [-1, 0, 1]], np.float32) / 4.0   # mixed derivative
_K_D2ND = np.array([[0, 1, 0], [0, -2, 0], [0, 1, 0]], np.float32)       # 2nd deriv (rows)
_K_H = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], np.float32)           # 8-neighbour sum


def _d1(x):
    return correlate3x3(x, _K_D1, "nearest")


def _d2(x):
    return correlate3x3(x, _K_D2, "nearest")


def liu_shen_precompute(im1, im2, h):
    """Iteration-invariant fields: image products, RHS constants and the
    per-pixel 2x2 inverse system (ref: :47-73, :124-128)."""
    iix = im1 * _d1(im1)
    iiy = im1 * _d2(im1)
    ii = im1 * im1
    dt = im2 - im1
    ixt = im1 * _d1(dt)
    iyt = im1 * _d2(dt)

    h = jnp.float32(h)
    cmtx = correlate3x3(jnp.ones_like(im1), _K_H, "constant")
    a11 = im1 * (correlate3x3(im1, _K_D2ND, "nearest") - 2.0 * im1) - h * cmtx
    a22 = im1 * (correlate3x3(im1, _K_D2ND.T, "nearest") - 2.0 * im1) - h * cmtx
    a12 = im1 * correlate3x3(im1, _K_M, "nearest")
    det = a11 * a22 - a12 * a12
    b11 = a22 / det
    b12 = -a12 / det
    b22 = a11 / det
    return (iix, iiy, ii, ixt, iyt, b11, b12, b22)


def liu_shen_iteration(u, v, fields, h):
    """One fixed-point update (ref: :142-150); shared with the Pallas kernel
    and the sharded halo-exchange path."""
    iix, iiy, ii, ixt, iyt, b11, b12, b22 = fields
    h = jnp.float32(h)
    bu = (
        2.0 * iix * _d1(u)
        + iix * _d2(v)
        + iiy * _d1(v)
        + ii * correlate3x3(u, _K_F1, "nearest")
        + ii * correlate3x3(v, _K_M, "nearest")
        + h * correlate3x3(u, _K_H, "constant")
        + ixt
    )
    bv = (
        iiy * _d1(u)
        + iix * _d2(u)
        + 2.0 * iiy * _d2(v)
        + ii * correlate3x3(u, _K_M, "nearest")
        + ii * correlate3x3(v, _K_F2, "nearest")
        + h * correlate3x3(v, _K_H, "constant")
        + iyt
    )
    u_new = -(b11 * bu + b12 * bv)
    v_new = -(b12 * bu + b22 * bv)
    return u_new, v_new


def _ls_impl(shape) -> str:
    """Static dispatch: the fused VMEM-resident kernel measured 3.1x the XLA
    while_loop on a v5e (0.29 vs 0.90 ms, 512^2, max|d|~5e-10 —
    scripts/pallas_ab_results.json) when the backend policy allows.  Unlike
    Horn-Schunck (one stencil per iteration, XLA wins), Liu-Shen's twelve
    3x3 stencils per iteration stream the fields from HBM twelve times under
    XLA, which residency eliminates."""
    from opticalflow_ri_tpu.ops.pallas import pallas_default_on

    if not pallas_default_on():
        return "xla"
    from opticalflow_ri_tpu.ops.pallas.liu_shen_iter import ls_supports_pallas

    return "pallas" if ls_supports_pallas(shape) else "xla"


@partial(jax.jit, static_argnames=("max_iter", "impl"))
def liu_shen_solve(im1, im2, h, u0, v0, max_iter: int = 60, tol: float = 1e-8,
                   impl: str = "auto"):
    """Run the Liu-Shen fixed-point solve.  Component convention matches the
    reference's internal one (u along rows); see the adapter for the swap.
    ``impl="pallas"`` uses the fused VMEM-resident kernel (TPU only)."""
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    im1 = im1 / jnp.max(im1)
    im2 = im2 / jnp.max(im2)

    fields = liu_shen_precompute(im1, im2, h)

    if impl == "auto":
        impl = _ls_impl(im1.shape)

    if impl == "pallas":
        from opticalflow_ri_tpu.ops.pallas.liu_shen_iter import liu_shen_iterate_pallas

        return liu_shen_iterate_pallas(
            h, fields, u0.astype(jnp.float32), v0.astype(jnp.float32),
            max_iter=max_iter, tol=tol,
        )

    npix = jnp.float32(im1.shape[-2] * im1.shape[-1])

    def cond(state):
        _, _, err, k = state
        return jnp.logical_and(err > tol, k < max_iter)

    def body(state):
        u, v, _, k = state
        u_new, v_new = liu_shen_iteration(u, v, fields, h)
        err = (jnp.linalg.norm(u_new - u) + jnp.linalg.norm(v_new - v)) / npix
        return (u_new, v_new, err, k + 1)

    init = (u0.astype(jnp.float32), v0.astype(jnp.float32), jnp.float32(1e8), 0)
    u, v, err, k = lax.while_loop(cond, body, init)
    err = jnp.where(k > 0, err, jnp.float32(0.0))
    return u, v, err


class LiuShenOpticalFlowAlgoAdapter:
    """Driver adapter; swaps flow components in/out like the reference
    (ref: src/PhysicsBasedOpticalFlowLiuShen.py:37-39)."""

    def __init__(self, alpha):
        self.alpha = alpha

    def compute(self, im1, im2, U, V):
        im1 = jnp.asarray(im1)
        # impl resolved HERE (trace time of any outer jit) so the inner jit's
        # cache key reflects the dispatch decision (e.g. force_xla contexts)
        rv, ru, err = liu_shen_solve(
            im1, jnp.asarray(im2), float(self.alpha),
            jnp.asarray(V), jnp.asarray(U), impl=_ls_impl(im1.shape),
        )
        return [ru, rv, err]

    def getAlgoName(self):
        return "Liu-Shen Physics based OF"

    def hasGenericPyramidalDefaults(self):
        return False
