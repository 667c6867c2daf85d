"""Whole-resident fused Farneback iteration loop as one Pallas TPU kernel.

The two-kernel path (tent_sample.update_matrices_pallas + blur5_flow) runs
2*n_iters kernel launches per level with the 5-plane M field round-tripping
HBM between them; the fb_breakdown probe measured ~45 us of per-launch
overhead alone (loop 2.82 ms vs 2.36 ms sum-of-parts at 512^2).  This kernel
keeps EVERYTHING resident in VMEM — R0, the R-padded R1, M, the blur
scratch, the flow carries — and runs the full iteration loop in a single
launch:

    for i in n_iters:   (lax.fori_loop; taps/shifts python-unrolled)
        M    = updateMatrices(flow)        # separable tent contraction
        tmp  = blur_y(pad_rows(M))         # border rule applied in-kernel
        Mb   = blur_x(pad_cols(tmp))       #   via reflected/replicated copies
        flow = solve2x2(Mb)                # +1e-3 regulariser

which is exactly the reference's per-level schedule
(ref: src/Farneback_PyCL.py:587-595 -> optical_flow_farneback.cl:198-429):
m0 = um(f0); f_{i+1} = solve(blur(m_i)); m_{i+1} = um(f_{i+1}) — the same
five um calls, reassociated as um-first inside the loop body.

Border rules match the stencil path: reflect-101 rows/cols for the Gaussian
window blur, replicate for the box filter, applied by writing the pad strips
of the VMEM scratch each iteration (32 static row copies + 2*half
single-column stores — cheap next to the contraction).

Whole-field VMEM residency caps this at ~512^2 (both 5-plane fields, the
scratch and the shift slab together); larger fields keep the banded
two-kernel path.  Parity with that path is to f32 round-off (same separable
summation order as the rewritten tent_sample kernel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow_ri_tpu.models.farneback import BORDER_RAMP


def _fb_fused_kernel(r1p_ref, r0_ref, fx0_ref, fy0_ref, fx_out, fy_out,
                     a_scr, b_scr, *, n_iters: int, R: int, taps: tuple,
                     mode: str, scale: float, rows: int, cols: int):
    nshift = 2 * R + 1
    ntap = len(taps)
    half = ntap // 2

    win = r1p_ref[:]
    r0 = r0_ref[:]

    # iteration-invariant pieces: pixel coordinates and the border ramp
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

        # ---- updateMatrices: separable tent contraction + M assembly ----
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

        fx_pos = xs + flowx
        fy_pos = ys + flowy
        inside = (jnp.floor(fx_pos) >= 0) & (jnp.floor(fy_pos) >= 0) & (
            jnp.floor(fx_pos) < cols - 1) & (jnp.floor(fy_pos) < rows - 1)

        r2 = jnp.where(inside, s[0], 0.0)
        r3 = jnp.where(inside, s[1], 0.0)
        r4 = jnp.where(inside, (r0[2] + s[2]) * 0.5, r0[2])
        r5 = jnp.where(inside, (r0[3] + s[3]) * 0.5, r0[3])
        r6 = jnp.where(inside, (r0[4] + s[4]) * 0.25, r0[4] * 0.5)
        r2 = (r0[0] - r2) * 0.5
        r3 = (r0[1] - r3) * 0.5
        r2 = r2 + r4 * flowy + r6 * flowx
        r3 = r3 + r6 * flowy + r5 * flowx
        r2 = r2 * ramp
        r3 = r3 * ramp
        r4 = r4 * ramp
        r5 = r5 * ramp
        r6 = r6 * ramp
        m = jnp.stack([
            r4 * r4 + r6 * r6,
            (r4 + r5) * r6,
            r5 * r5 + r6 * r6,
            r4 * r2 + r6 * r3,
            r6 * r2 + r5 * r3,
        ])

        # ---- y-pass: row-padded scratch, then 33 sublane-shifted FMAs ----
        a_scr[:, half : half + rows, :] = m
        for r in range(half):
            if mode == "mirror":  # reflect-101
                a_scr[:, half - 1 - r, :] = m[:, r + 1, :]
                a_scr[:, half + rows + r, :] = m[:, rows - 2 - r, :]
            else:  # replicate
                a_scr[:, half - 1 - r, :] = m[:, 0, :]
                a_scr[:, half + rows + r, :] = m[:, rows - 1, :]
        a = a_scr[:]
        tmp = None
        for j, wgt in enumerate(taps):
            term = a[:, j : j + rows, :] * jnp.float32(wgt)
            tmp = term if tmp is None else tmp + term

        # ---- x-pass: col-padded scratch, then 33 lane-shifted FMAs ----
        b_scr[:, :, half : half + cols] = tmp
        for c in range(half):
            if mode == "mirror":
                b_scr[:, :, half - 1 - c] = tmp[:, :, c + 1]
                b_scr[:, :, half + cols + c] = tmp[:, :, cols - 2 - c]
            else:
                b_scr[:, :, half - 1 - c] = tmp[:, :, 0]
                b_scr[:, :, half + cols + c] = tmp[:, :, cols - 1]
        b = b_scr[:]
        blur = None
        for j, wgt in enumerate(taps):
            term = b[:, :, j : j + cols] * jnp.float32(wgt)
            blur = term if blur is None else blur + term
        if scale != 1.0:
            blur = blur * jnp.float32(scale)

        # ---- regularised 2x2 solve (ref: optical_flow_farneback.cl:408) ---
        g11, g12, g22, h1, h2 = blur[0], blur[1], blur[2], blur[3], blur[4]
        det_inv = 1.0 / (g11 * g22 - g12 * g12 + jnp.float32(1e-3))
        return ((g11 * h2 - g12 * h1) * det_inv,
                (g22 * h1 - g12 * h2) * det_inv)

    fx, fy = lax.fori_loop(0, n_iters, body, (fx0_ref[:], fy0_ref[:]))
    fx_out[:] = fx
    fy_out[:] = fy


def fb_fused_supports_pallas(shape, sample_max_shift, ksize: int) -> bool:
    """Everything must sit in VMEM together: R-padded R1, R0, the two blur
    scratches, M and the weight temporaries (~12 field-sized arrays)."""
    rows, cols = shape[-2], shape[-1]
    if sample_max_shift is None:
        return False
    if rows % 8 or cols % 128:
        return False
    half = ksize // 2
    field = 5 * rows * cols * 4
    r1p = 5 * (rows + 2 * sample_max_shift + 1) * (
        cols + 2 * sample_max_shift + 1) * 4
    total = r1p + 3 * field + 5 * (rows + 2 * half) * cols * 4 \
        + 5 * rows * (cols + 2 * half) * 4 \
        + (2 * sample_max_shift + 6) * rows * cols * 4
    return total <= 72 * 1024 * 1024


@partial(jax.jit, static_argnames=("n_iters", "sample_max_shift", "kernel",
                                   "mode", "scale", "interpret"))
def fb_fused_pallas(r0, r1, fx0, fy0, n_iters: int, kernel: tuple, mode: str,
                    scale: float = 1.0, sample_max_shift: int = 5,
                    interpret: bool = False):
    """Run the whole Farneback iteration loop in one launch; returns
    (flowx, flowy).  Same (R0, R1, flow-in) -> flow-out contract as n_iters
    rounds of update_matrices_dispatch + _blur_flow_dispatch."""
    R = int(sample_max_shift)
    taps = tuple(float(w) for w in kernel)
    half = len(taps) // 2
    _, rows, cols = r0.shape

    r1p = jnp.pad(r1, ((0, 0), (R, R + 1), (R, R + 1)), mode="edge")

    scr_a = pltpu.VMEM((5, rows + 2 * half, cols), jnp.float32)
    scr_b = pltpu.VMEM((5, rows, cols + 2 * half), jnp.float32)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    fx, fy = pl.pallas_call(
        partial(_fb_fused_kernel, n_iters=int(n_iters), R=R, taps=taps,
                mode=mode, scale=float(scale), rows=rows, cols=cols),
        out_shape=(
            jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        ),
        in_specs=[vmem] * 4,
        out_specs=(vmem, vmem),
        scratch_shapes=[scr_a, scr_b],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n_iters) * rows * cols * 5
            * ((2 * R + 1) ** 2 * 2 + 4 * len(taps) + 10),
            bytes_accessed=(r1p.size + r0.size + 4 * rows * cols) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        r1p.astype(jnp.float32), r0.astype(jnp.float32),
        fx0.astype(jnp.float32), fy0.astype(jnp.float32),
    )
    return fx, fy
