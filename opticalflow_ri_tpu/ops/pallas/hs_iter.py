"""Fused Horn-Schunck Jacobi relaxation as a single Pallas TPU kernel.

The XLA path (models/horn_schunck.py) runs the Jacobi loop as a fori_loop of
fused stencil HLOs — fast, but every iteration still streams U/V through HBM
when XLA chooses not to keep them resident.  This kernel pins the entire
working set (derivative fields + flow iterates) in VMEM and runs ALL
iterations in one kernel launch: zero HBM traffic between iterations, which
is the speed-of-light design for PIV-sized images (a 512x512 problem's whole
state is ~8 MB).

Replaces, in spirit, the reference's per-iteration scipy-convolve + Numba
round trip (ref: src/HornSchunck.py:62-71); numerics match the XLA path to
float32 round-off (the denominator is applied as a precomputed reciprocal).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 3x3 neighbour-average weights (ref: src/HornSchunck.py:87-89)
_W_EDGE = 1.0 / 6.0
_W_DIAG = 1.0 / 12.0


def _avg3x3_mirror(x):
    """Mirror-border weighted neighbour average, fully vectorised on the VPU.

    Separable form ([1,2,1]⊗[1,2,1] − 4·δ)/12 — see ops.stencil.hs_avg3x3."""
    # mirror pad by 1 in both dims: (a b c | b) style (edge not repeated)
    rows = jnp.concatenate([x[1:2, :], x, x[-2:-1, :]], axis=0)
    p = jnp.concatenate([rows[:, 1:2], rows, rows[:, -2:-1]], axis=1)
    two = jnp.float32(2.0)
    ph = p[:, :-2] + two * p[:, 1:-1] + p[:, 2:]
    q = ph[:-2, :] + two * ph[1:-1, :] + ph[2:, :]
    return (q - jnp.float32(4.0) * x) * jnp.float32(1.0 / 12.0)


def _avg3x3_mirror_roll(x, iy, ix):
    """Same average via circular rotates + mirror border fixups: no padded
    copy of the field is materialised per iteration (tpu.rotate keeps the
    shifts in-register).  ``iy``/``ix`` are precomputed row/col iotas.

    The mirror pad is separable, so shifting with mirror semantics composes:
    shift_y then shift_x of the already-fixed row shift gives the diagonal
    neighbours exactly."""
    h, w = x.shape

    def sh_y(a, d):  # a[i] = x[i+d] with mirror at the border
        r = jnp.roll(a, -d, axis=0)
        edge = a[1:2, :] if d < 0 else a[h - 2 : h - 1, :]
        bad = 0 if d < 0 else h - 1
        return jnp.where(iy == bad, jnp.broadcast_to(edge, (h, w)), r)

    def sh_x(a, d):
        r = jnp.roll(a, -d, axis=1)
        edge = a[:, 1:2] if d < 0 else a[:, w - 2 : w - 1]
        bad = 0 if d < 0 else w - 1
        return jnp.where(ix == bad, jnp.broadcast_to(edge, (h, w)), r)

    two = jnp.float32(2.0)
    p = sh_x(x, -1) + two * x + sh_x(x, 1)
    q = sh_y(p, -1) + two * p + sh_y(p, 1)
    return (q - jnp.float32(4.0) * x) * jnp.float32(1.0 / 12.0)


def _hs_kernel(alpha_ref, fx_ref, fy_ref, ft_ref, u0_ref, v0_ref,
               u_out, v_out, *, niter: int, variant: str = "roll"):
    fx = fx_ref[:]
    fy = fy_ref[:]
    ft = ft_ref[:]
    alpha = alpha_ref[0, 0]
    rdenom = 1.0 / (alpha * alpha + fx * fx + fy * fy)

    h, w = fx.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    if variant == "roll":
        avg = lambda a: _avg3x3_mirror_roll(a, iy, ix)
    else:
        avg = _avg3x3_mirror

    def body(_, uv):
        u, v = uv
        u_avg = avg(u)
        v_avg = avg(v)
        der = (fx * u_avg + fy * v_avg + ft) * rdenom
        return (u_avg - fx * der, v_avg - fy * der)

    u, v = lax.fori_loop(0, niter, body, (u0_ref[:], v0_ref[:]))
    u_out[:] = u
    v_out[:] = v


def hs_supports_pallas(shape) -> bool:
    """Whole-image VMEM residency: tiled lanes/sublanes and ~<= 12 MB state."""
    h, w = shape[-2], shape[-1]
    state_bytes = 8 * h * w * 4
    return (
        len(shape) == 2
        and h % 8 == 0
        and w % 128 == 0
        and state_bytes <= 12 * 1024 * 1024
    )


@partial(jax.jit, static_argnames=("niter", "variant"))
def hs_iterate_pallas(fx, fy, ft, u0, v0, alpha, niter: int,
                      variant: str = "roll"):
    """Run ``niter`` Jacobi iterations with the whole state VMEM-resident."""
    h, w = fx.shape
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_hs_kernel, niter=niter, variant=variant),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            vmem, vmem, vmem, vmem, vmem,
        ],
        out_specs=(vmem, vmem),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(niter) * 25 * h * w,
            bytes_accessed=7 * h * w * 4,
            transcendentals=0,
        ),
    )(alpha_arr, fx, fy, ft, u0, v0)
    return out
