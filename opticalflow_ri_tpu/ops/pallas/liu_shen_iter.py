"""Fused Liu-Shen fixed-point iteration as a single Pallas TPU kernel.

One launch runs the whole tolerance-controlled fixed-point solve with every
field VMEM-resident: the twelve 3x3 stencils assembling (bu, bv), the 2x2
inverse update, and the global error reduction all happen on-chip, replacing
the reference's twelve scipy convolutions + Numba update per iteration
(ref: src/PhysicsBasedOpticalFlowLiuShen.py:142-150).

State: 14 persistent fields + temporaries; a 512x512 problem is ~14.7 MB of
state, well inside a v5e core's 128 MB VMEM (hardware-proven at 512^2 —
stage ls_whole_pallas_512 in scripts/pallas_ab_results.json).  Dispatch
lives in models/liu_shen.py; beyond the residency cap the XLA while_loop
(or the validated tiled kernel) takes over.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_nearest(x):
    rows = jnp.concatenate([x[:1, :], x, x[-1:, :]], axis=0)
    return jnp.concatenate([rows[:, :1], rows, rows[:, -1:]], axis=1)


def _pad_zero(x):
    h, w = x.shape
    z_row = jnp.zeros((1, w), x.dtype)
    rows = jnp.concatenate([z_row, x, z_row], axis=0)
    z_col = jnp.zeros((h + 2, 1), x.dtype)
    return jnp.concatenate([z_col, rows, z_col], axis=1)


def _shifts(p, h, w):
    c = lambda dy, dx: p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
    return c


def _ls_kernel(h_ref, iix_ref, iiy_ref, ii_ref, ixt_ref, iyt_ref,
               b11_ref, b12_ref, b22_ref, u0_ref, v0_ref,
               u_out, v_out, err_out, *, max_iter: int, tol: float, npix: float):
    hreg = h_ref[0, 0]
    iix = iix_ref[:]
    iiy = iiy_ref[:]
    ii = ii_ref[:]
    ixt = ixt_ref[:]
    iyt = iyt_ref[:]
    b11 = b11_ref[:]
    b12 = b12_ref[:]
    b22 = b22_ref[:]
    h, w = iix.shape

    def stencils(z):
        """All five 'nearest'-border stencil results for one field; the
        mixed-derivative kernel is rank-1 ([1,0,-1]⊗[1,0,-1]/4) so it is a
        column difference of a row difference (cf. models.liu_shen
        ls_field_stencils)."""
        p = _pad_nearest(z)
        c = _shifts(p, h, w)
        d1 = (c(1, 0) - c(-1, 0)) * 0.5
        d2 = (c(0, 1) - c(0, -1)) * 0.5
        f1 = c(-1, 0) + c(1, 0)
        f2 = c(0, -1) + c(0, 1)
        rdiff = p[:, 2:] - p[:, :-2]
        m = (rdiff[2:, :] - rdiff[:-2, :]) * 0.25
        return d1, d2, f1, f2, m

    def ring_zero(z):
        """8-neighbour sum in separable form [1,1,1]⊗[1,1,1] − δ."""
        zp = _pad_zero(z)
        p = zp[:-2, :] + zp[1:-1, :] + zp[2:, :]
        return p[:, :w] + p[:, 1 : w + 1] + p[:, 2 : w + 2] - z

    def body(state):
        u, v, _, k = state
        du1, du2, fu1, _, mu = stencils(u)
        dv1, dv2, _, fv2, mv = stencils(v)
        bu = (iix * (2.0 * du1 + dv2) + iiy * dv1 + ii * (fu1 + mv)
              + hreg * ring_zero(u) + ixt)
        bv = (iiy * (du1 + 2.0 * dv2) + iix * du2 + ii * (mu + fv2)
              + hreg * ring_zero(v) + iyt)
        u_new = -(b11 * bu + b12 * bv)
        v_new = -(b12 * bu + b22 * bv)
        err = (
            jnp.sqrt(jnp.sum((u_new - u) ** 2)) + jnp.sqrt(jnp.sum((v_new - v) ** 2))
        ) / npix
        return (u_new, v_new, err, k + 1)

    def cond(state):
        _, _, err, k = state
        return jnp.logical_and(err > tol, k < max_iter)

    u, v, err, k = lax.while_loop(
        cond, body, (u0_ref[:], v0_ref[:], jnp.float32(1e8), 0)
    )
    u_out[:] = u
    v_out[:] = v
    err_out[0, 0] = jnp.where(k > 0, err, 0.0)


@partial(jax.jit, static_argnames=("max_iter", "tol", "interpret"))
def liu_shen_iterate_pallas(h_reg, fields, u0, v0, max_iter: int = 60,
                            tol: float = 1e-8, interpret: bool = False):
    """Run the fixed-point solve on precomputed fields; returns (u, v, err)."""
    iix, iiy, ii, ixt, iyt, b11, b12, b22 = fields
    h, w = iix.shape
    npix = float(h * w)
    h_arr = jnp.asarray(h_reg, jnp.float32).reshape(1, 1)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    u, v, err = pl.pallas_call(
        partial(_ls_kernel, max_iter=max_iter, tol=tol, npix=npix),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)] + [vmem] * 10,
        out_specs=(vmem, vmem, pl.BlockSpec(memory_space=pltpu.SMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(h_arr, iix, iiy, ii, ixt, iyt, b11, b12, b22, u0, v0)
    return u, v, err[0, 0]


# Whole-state residency cap.  14 persistent f32 fields; hardware-proven at
# 512^2 (state 14.7 MB, stage ls_whole_pallas_512 in
# scripts/pallas_ab_results.json: compiles, bit-identical, ~parity with XLA).
# Round 2's 12 MB cap excluded 512^2 and pushed the flagship size onto an
# unproven tiled kernel (VERDICT.md round 2) — raise this only together with
# a larger-shape A/B entry.
_STATE_CAP_BYTES = 16 * 1024 * 1024


def ls_supports_pallas(shape) -> bool:
    h, w = shape[-2], shape[-1]
    state_bytes = 14 * h * w * 4
    return (
        len(shape) == 2 and h % 8 == 0 and w % 128 == 0
        and state_bytes <= _STATE_CAP_BYTES
    )
