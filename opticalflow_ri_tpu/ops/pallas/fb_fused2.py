"""Fused Farneback iteration loop, take 2: matmul-fold window blur.

The first fused-loop kernel (fb_fused.py) kept M VMEM-resident but applied
the blur border rules with 64 single-column scratch stores per iteration —
its Mosaic compile overran 40 minutes and was dropped.  This variant removes
every store from the loop body: the separable window blur (taps + reflect-101
or replicate border) is expressed as two FOLD MATRICES precomputed on host —

    tmp  = A_y @ M_c          A_y[r, s] = sum of taps[j] with
    blur = tmp @ B_x                      border(r + j - half) == s

— so the whole blur is 10 MXU matmuls per iteration (f32, HIGHEST precision)
and the loop body is pure values: um contraction (the separable tent form of
tent_sample.py) -> 2 fold matmuls per channel -> 2x2 solve, carried through a
``lax.fori_loop``.  One launch runs the entire per-level iteration schedule
(m0 = um(f0); f_{i+1} = solve(blur(m_i)); m_{i+1} = um(f_{i+1}) — same five
um calls as the reference, ref: src/Farneback_PyCL.py:587-595).

Parity: the tent contraction matches the two-kernel path exactly (same
separable order); the blur reassociates the separable taps into row/column
dot products, so flow parity is to f32 round-off (hardware A/B stages
``fb_fused2_*``), not bit-identical.

OUTCOME (round-4 hardware probe): the store-free body fixed the compile-time
pathology, but Mosaic's scoped-VMEM accounting for the unrolled loop body
(contraction temporaries + fold matmul operands, all live across the fori
body) needs 343 MB against the chip's 128 MB — whole-loop FB fusion at 512^2
structurally exceeds VMEM however the borders are expressed.  The two-kernel
path (tent_sample + blur5_flow, banded, M through HBM between launches) is
the design point; this module stays as the documented negative result and an
interpret-mode reference (never registered, unreachable from default
dispatch).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow_ri_tpu.models.farneback import BORDER_RAMP


@lru_cache(maxsize=None)
def _fold_matrix(n: int, taps: tuple, mode: str, scale: float) -> np.ndarray:
    """(n, n) matrix folding the 1-D correlation + border rule: out[r] =
    sum_s F[r, s] * src[s]."""
    half = len(taps) // 2
    f = np.zeros((n, n), np.float64)
    for r in range(n):
        for j, w in enumerate(taps):
            idx = r + j - half
            if mode == "mirror":  # reflect-101
                if idx < 0:
                    idx = -idx
                if idx >= n:
                    idx = 2 * (n - 1) - idx
            else:  # replicate
                idx = min(max(idx, 0), n - 1)
            f[r, idx] += w
    return (f * scale).astype(np.float32)


def _fb_fused2_kernel(r1p_ref, r0_ref, ay_ref, bx_ref, fx0_ref, fy0_ref,
                      fx_out, fy_out, *, n_iters: int, R: int,
                      rows: int, cols: int):
    nshift = 2 * R + 1
    win = r1p_ref[:]
    r0 = r0_ref[:]
    ay = ay_ref[:]
    bx = bx_ref[:]

    ys = lax.broadcasted_iota(jnp.int32, (rows, cols), 0).astype(jnp.float32)
    xs = lax.broadcasted_iota(jnp.int32, (rows, cols), 1).astype(jnp.float32)

    def ramp_at(d):
        return jnp.where(
            d < 2, jnp.float32(BORDER_RAMP[0]),
            jnp.where(d < 5, jnp.float32(BORDER_RAMP[2]), jnp.float32(1.0)),
        )

    xi = lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    yi = lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    ramp = (
        ramp_at(xi) * ramp_at(yi)
        * ramp_at(cols - xi - 1) * ramp_at(rows - yi - 1)
    )

    def body(_, carry):
        flowx, flowy = carry

        # ---- updateMatrices (separable tent contraction, tent_sample.py) --
        dxc = jnp.clip(flowx, float(-R), R - 1e-3)
        dyc = jnp.clip(flowy, float(-R), R - 1e-3)
        wys = [jnp.maximum(0.0, 1.0 - jnp.abs(dyc - (sy - R)))
               for sy in range(nshift)]
        s = jnp.zeros((5, rows, cols), jnp.float32)
        for sx in range(nshift):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxc - (sx - R)))
            cols_s = win[:, :, sx : sx + cols]
            t = jnp.zeros((5, rows, cols), jnp.float32)
            for sy in range(nshift):
                t = t + wys[sy][None] * cols_s[:, sy : sy + rows, :]
            s = s + wx[None] * t

        inside = ((jnp.floor(xs + flowx) >= 0) & (jnp.floor(ys + flowy) >= 0)
                  & (jnp.floor(xs + flowx) < cols - 1)
                  & (jnp.floor(ys + flowy) < rows - 1))
        r2 = jnp.where(inside, s[0], 0.0)
        r3 = jnp.where(inside, s[1], 0.0)
        r4 = jnp.where(inside, (r0[2] + s[2]) * 0.5, r0[2])
        r5 = jnp.where(inside, (r0[3] + s[3]) * 0.5, r0[3])
        r6 = jnp.where(inside, (r0[4] + s[4]) * 0.25, r0[4] * 0.5)
        r2 = ((r0[0] - r2) * 0.5 + r4 * flowy + r6 * flowx) * ramp
        r3 = ((r0[1] - r3) * 0.5 + r6 * flowy + r5 * flowx) * ramp
        r4 = r4 * ramp
        r5 = r5 * ramp
        r6 = r6 * ramp
        m = [
            r4 * r4 + r6 * r6,
            (r4 + r5) * r6,
            r5 * r5 + r6 * r6,
            r4 * r2 + r6 * r3,
            r6 * r2 + r5 * r3,
        ]

        # ---- window blur as fold matmuls (MXU, f32 highest precision) -----
        blur = []
        for c in range(5):
            tmp = jax.lax.dot(ay, m[c], precision=lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
            blur.append(jax.lax.dot(tmp, bx,
                                    precision=lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32))

        # ---- regularised 2x2 solve ---------------------------------------
        g11, g12, g22, h1, h2 = blur
        det_inv = 1.0 / (g11 * g22 - g12 * g12 + jnp.float32(1e-3))
        return ((g11 * h2 - g12 * h1) * det_inv,
                (g22 * h1 - g12 * h2) * det_inv)

    fx, fy = lax.fori_loop(0, n_iters, body, (fx0_ref[:], fy0_ref[:]))
    fx_out[:] = fx
    fy_out[:] = fy


def fb_fused2_supports_pallas(shape, sample_max_shift, ksize: int) -> bool:
    """Always False on hardware: the naive residency model (~40 MB at 512^2)
    under-counts Mosaic's scoped-VMEM accounting of the unrolled loop body
    by ~8x — the real 512^2 requirement is 343 MB (module docstring).  Kept
    so callers can see the negative result programmatically; interpret mode
    still runs for reference."""
    return False


@partial(jax.jit, static_argnames=("n_iters", "sample_max_shift", "kernel",
                                   "mode", "scale", "interpret"))
def fb_fused2_pallas(r0, r1, fx0, fy0, n_iters: int, kernel: tuple, mode: str,
                     scale: float = 1.0, sample_max_shift: int = 5,
                     interpret: bool = False):
    """One launch for the whole Farneback iteration loop; returns
    (flowx, flowy).  Same contract as n_iters rounds of
    update_matrices_dispatch + _blur_flow_dispatch."""
    R = int(sample_max_shift)
    taps = tuple(float(w) for w in kernel)
    _, rows, cols = r0.shape

    r1p = jnp.pad(r1, ((0, 0), (R, R + 1), (R, R + 1)), mode="edge")
    ay = jnp.asarray(_fold_matrix(rows, taps, mode, 1.0))
    bx = jnp.asarray(_fold_matrix(cols, taps, mode, float(scale))).T

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    fx, fy = pl.pallas_call(
        partial(_fb_fused2_kernel, n_iters=int(n_iters), R=R, rows=rows,
                cols=cols),
        out_shape=(
            jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        ),
        in_specs=[vmem] * 6,
        out_specs=(vmem, vmem),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n_iters) * (
                rows * cols * 5 * ((2 * R + 1) ** 2 * 2 + 10)
                + 5 * 2 * 2 * rows * cols * (rows + cols) // 2
            ),
            bytes_accessed=(r1p.size + r0.size + 4 * rows * cols) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        r1p.astype(jnp.float32), r0.astype(jnp.float32), ay, bx,
        fx0.astype(jnp.float32), fy0.astype(jnp.float32),
    )
    return fx, fy
