"""Temporal-blocked tiled Horn-Schunck Jacobi kernel for large images.

The whole-state kernel (hs_iter.py) needs the full working set in VMEM, which
caps it at roughly 512^2.  Beyond that the XLA fori_loop streams U/V (+ the
three derivative fields) through HBM on EVERY Jacobi iteration — measured ~4x
off the HBM roofline at 2048^2 (bench_details.json size_scaling).  This kernel
applies classic stencil temporal blocking: T iterations per launch on
y-stripes with a T-deep halo, so HBM sees the fields once per T iterations
instead of once per iteration (~10x traffic reduction at T=20).

Boundary trick — NO in-kernel border logic: the caller mirror-pads every
field by T (jnp.pad mode="reflect", matching the reference's mirror border,
ref: src/HornSchunck.py:66-68).  The Jacobi operator commutes with mirror
symmetry, so a T-deep reflected extension evolves exactly like its interior
mirror image for T iterations: extension row -j stays equal to row j through
iteration T-j, which is precisely as long as the interior needs it.  The
kernel is therefore a pure wraparound stencil; wrapped values at stripe edges
are garbage that creeps inward 1 px/iteration and never crosses the T-halo
into the output region.

Per stripe the kernel manually DMAs (BH+2T, W+2T) slabs of the six fields
(fx, fy, ft, 1/denom, u, v) from HBM into VMEM (BlockSpec blocks cannot
overlap, and a stripe needs its neighbours' halo rows), runs T fused Jacobi
iterations with jnp.roll (in-register rotates), and writes the (BH, W)
interior through the standard output pipeline.

Replaces the reference's per-iteration scipy filter2 + Numba update
(ref: src/HornSchunck.py:52-71) at scale; numerics match the XLA loop to f32
round-off.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_W_EDGE = 1.0 / 6.0
_W_DIAG = 1.0 / 12.0

# default iterations fused per launch (== halo depth == mirror-pad depth)
DEFAULT_T_BLOCK = 20
# VMEM budget for the six landing buffers + loop live set.  A v5e core has
# 128 MB VMEM; 48 MB for the resident fields leaves ample room for the
# pipelined output blocks and Mosaic's own buffers.  Budget-bound stripe
# heights cost redundant halo compute (bh=64 at 2048^2 was 1.6x redundant
# and measured 24.8 ms; bh=256 cuts redundancy to 1.16x).
_VMEM_BUDGET = 48 * 1024 * 1024
_N_FIELDS_RESIDENT = 11  # 6 DMA buffers + u/v carries + ~3 temporaries


def _avg3x3_wrap(x):
    """Mirror-free 3x3 neighbour average; wraparound cells are stale-halo
    garbage by construction (see module docstring).

    Separable form: 1/12·[[1,2,1],[2,0,2],[1,2,1]] = ([1,2,1]⊗[1,2,1]
    − 4·δ)/12, cutting the 8-roll form to 4 rolls (2 lane-dim) and ~9 VPU
    ops — the kernel is VPU-bound, so this is a direct speedup.  The
    staleness reach is unchanged (1 px per axis per iteration)."""
    two = jnp.float32(2.0)
    p = jnp.roll(x, 1, axis=1) + two * x + jnp.roll(x, -1, axis=1)
    q = jnp.roll(p, 1, axis=0) + two * p + jnp.roll(p, -1, axis=0)
    return (q - jnp.float32(4.0) * x) * jnp.float32(1.0 / 12.0)


def _lane_pad(n: int) -> int:
    return -(-n // 128) * 128


def stripe_height(h: int, w: int, t_block: int) -> int | None:
    """Largest stripe height whose working set fits the VMEM budget."""
    for bh in (256, 128, 64, 32, 16, 8):
        if h % bh:
            continue
        buf = (bh + 2 * t_block) * _lane_pad(w + 2 * t_block) * 4
        if _N_FIELDS_RESIDENT * buf <= _VMEM_BUDGET:
            return bh
    return None


def hs_tiled_supports_pallas(shape, t_block: int = DEFAULT_T_BLOCK) -> bool:
    h, w = shape[-2], shape[-1]
    return (
        len(shape) == 2
        and h % 8 == 0
        and w % 128 == 0
        and h > t_block + 1  # jnp.pad reflect needs pad <= size-1
        and w > t_block + 1
        and stripe_height(h, w, t_block) is not None
    )


def _hs_tiled_kernel(fx_hbm, fy_hbm, ft_hbm, rd_hbm, u_hbm, v_hbm,
                     u_out, v_out,
                     fx_b, fy_b, ft_b, rd_b, u_b, v_b, sems,
                     *, t_iters: int, bh: int, w: int, pad: int):
    row0 = pl.program_id(0) * bh  # stripe halo start in padded coords

    copies = [
        pltpu.make_async_copy(
            src.at[pl.ds(row0, bh + 2 * pad), :], dst, sems.at[k]
        )
        for k, (src, dst) in enumerate(
            [(fx_hbm, fx_b), (fy_hbm, fy_b), (ft_hbm, ft_b),
             (rd_hbm, rd_b), (u_hbm, u_b), (v_hbm, v_b)]
        )
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    fx = fx_b[:]
    fy = fy_b[:]
    ft = ft_b[:]
    rd = rd_b[:]

    def body(_, uv):
        u, v = uv
        u_avg = _avg3x3_wrap(u)
        v_avg = _avg3x3_wrap(v)
        der = (fx * u_avg + fy * v_avg + ft) * rd
        return (u_avg - fx * der, v_avg - fy * der)

    u, v = lax.fori_loop(0, t_iters, body, (u_b[:], v_b[:]))
    u_out[:] = u[pad : pad + bh, pad : pad + w]
    v_out[:] = v[pad : pad + bh, pad : pad + w]


@partial(jax.jit, static_argnames=("t_iters", "bh", "pad", "w"))
def _launch(fxp, fyp, ftp, rdp, up, vp, t_iters: int, bh: int, pad: int,
            w: int):
    hp, wp = fxp.shape
    h = hp - 2 * pad
    buf = lambda: pltpu.VMEM((bh + 2 * pad, wp), jnp.float32)
    out_spec = pl.BlockSpec((bh, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    return pl.pallas_call(
        partial(_hs_tiled_kernel, t_iters=t_iters, bh=bh, w=w, pad=pad),
        grid=(h // bh,),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ),
        in_specs=[hbm_spec] * 6,
        out_specs=(out_spec, out_spec),
        scratch_shapes=[buf() for _ in range(6)] + [pltpu.SemaphoreType.DMA((6,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(t_iters) * 30 * hp * wp,
            bytes_accessed=8 * hp * wp * 4,
            transcendentals=0,
        ),
    )(fxp, fyp, ftp, rdp, up, vp)


@partial(jax.jit, static_argnames=("niter", "t_block", "interpret"))
def hs_iterate_pallas_tiled(fx, fy, ft, u0, v0, alpha, niter: int,
                            t_block: int = DEFAULT_T_BLOCK,
                            interpret: bool = False):
    """Run ``niter`` Jacobi iterations, ``t_block`` per kernel launch.

    Same (fx, fy, ft, u0, v0, alpha) -> (u, v) contract as
    hs_iter.hs_iterate_pallas; designed for images too large for whole-state
    VMEM residency (>= ~1024^2).
    """
    h, w = fx.shape
    bh = stripe_height(h, w, t_block)
    if bh is None:
        raise ValueError(f"no stripe height fits VMEM for shape {(h, w)}")
    alpha = jnp.float32(alpha)
    rd = 1.0 / (alpha * alpha + fx * fx + fy * fy)

    # Mirror-pad by T, then round the padded width up to a lane multiple —
    # Mosaic requires lane-dim slices 128-aligned, so the kernel always copies
    # full-width rows.  The extra right columns are edge-pad garbage adjacent
    # to the mirror ring; by the staleness argument they never reach the
    # output (the ring is exactly T deep).
    wpad = (-(w + 2 * t_block)) % 128

    def mirror(z):
        z = jnp.pad(z, t_block, mode="reflect")
        return jnp.pad(z, ((0, 0), (0, wpad)), mode="edge") if wpad else z
    fxp = mirror(fx.astype(jnp.float32))
    fyp = mirror(fy.astype(jnp.float32))
    ftp = mirror(ft.astype(jnp.float32))
    rdp = mirror(rd.astype(jnp.float32))

    launch = _launch_interpret if interpret else _launch
    u, v = u0.astype(jnp.float32), v0.astype(jnp.float32)
    done = 0
    while done < niter:
        t = min(t_block, niter - done)
        u, v = launch(fxp, fyp, ftp, rdp, mirror(u), mirror(v),
                      t, bh, t_block, w)
        done += t
    return u, v


@partial(jax.jit, static_argnames=("t_iters", "bh", "pad", "w"))
def _launch_interpret(fxp, fyp, ftp, rdp, up, vp, t_iters, bh, pad, w):
    """interpret=True variant for CPU validation of the kernel logic."""
    hp, wp = fxp.shape
    h = hp - 2 * pad
    buf = lambda: pltpu.VMEM((bh + 2 * pad, wp), jnp.float32)
    out_spec = pl.BlockSpec((bh, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    return pl.pallas_call(
        partial(_hs_tiled_kernel, t_iters=t_iters, bh=bh, w=w, pad=pad),
        grid=(h // bh,),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ),
        in_specs=[hbm_spec] * 6,
        out_specs=(out_spec, out_spec),
        scratch_shapes=[buf() for _ in range(6)] + [pltpu.SemaphoreType.DMA((6,))],
        interpret=True,
    )(fxp, fyp, ftp, rdp, up, vp)
