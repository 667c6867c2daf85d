"""Fused Farneback updateMatrices as a Pallas TPU kernel.

The XLA path (models/farneback.py:update_matrices) expresses the bilinear
sample of the 5-plane R1 field at the flow-displaced position as a dense
tent-weight contraction over (2R+1)^2 static shifts.  XLA materialises that
contraction as a long chain of shifted multiply-adds streaming R1 from HBM
~(2R+1)^2 times per call — the dominant HBM traffic of the whole Farneback
solve (5 calls per level).

This kernel runs the contraction with R1 pinned whole in VMEM and the flow /
output M field banded over a row grid: R1 is read from HBM exactly once per
call, every shifted access hits VMEM, and the full M assembly (difference
blend, border-attenuation ramp, normal-equation products —
ref: src/optical_flow_farneback.cl:256-348) is fused into the same pass so
the intermediate sampled field never exists in HBM.

Numerics: the same clipped tent weights and inside/outside branches as the
XLA path; the contraction applies the weights separably with sx outermost
(lane-rotate hoisting — see the kernel comment), so parity is to f32
round-off of the sampled field rather than bit-identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow_ri_tpu.models.farneback import BORDER_RAMP


def _update_matrices_kernel(r1p_ref, r0_ref, fx_ref, fy_ref, m_ref,
                            *, R: int, rows: int, cols: int, band: int):
    """One row-band: dense tent contraction from VMEM + fused M assembly.

    rows/cols are the TRUE image dims (for the inside mask and border ramp);
    array shapes may be zero-padded to the (8, 128) tile (cp below) — padded
    pixels are cropped by the caller."""
    i = pl.program_id(0)
    y0 = i * band  # first global row of this band
    cp = fx_ref.shape[-1]

    flowx = fx_ref[:]
    flowy = fy_ref[:]

    dxc = jnp.clip(flowx, float(-R), R - 1e-3)
    dyc = jnp.clip(flowy, float(-R), R - 1e-3)

    nshift = 2 * R + 1

    # One aligned VMEM load covering every y-shift (Mosaic requires dynamic
    # sublane-dim offsets to be 8-aligned; y0 = i*band is, y0+sy is not), then
    # static in-register slices per shift.  sx is the OUTER loop so each of
    # the nshift lane-dim slices (a cross-lane rotate of the whole 5-channel
    # slab — the expensive op class here) happens once, with the nshift
    # sublane slices (cheap) inside; tent weights are applied separably
    # (sum_sx wx * (sum_sy wy * win)).  This is nshift lane rotates instead
    # of the round-3 kernel's nshift^2, at the cost of the f32 summation
    # order — parity with the XLA path is to f32 round-off (see the um_pallas
    # A/B stages), no longer bit-identical.
    win = r1p_ref[:, pl.ds(y0, band + nshift - 1), :]
    wys = [jnp.maximum(0.0, 1.0 - jnp.abs(dyc - (sy - R)))
           for sy in range(nshift)]
    s = jnp.zeros((5, band, cp), jnp.float32)
    for sx in range(nshift):
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxc - (sx - R)))
        cols_s = win[:, :, sx : sx + cp]
        t = jnp.zeros((5, band, cp), jnp.float32)
        for sy in range(nshift):
            t = t + wys[sy][None] * cols_s[:, sy : sy + band, :]
        s = s + wx[None] * t

    # global pixel coordinates of this band
    # Mosaic rejects float iota; build int32 and convert.
    ys = jax.lax.broadcasted_iota(jnp.int32, (band, cp), 0).astype(jnp.float32) + y0
    xs = jax.lax.broadcasted_iota(jnp.int32, (band, cp), 1).astype(jnp.float32)
    fx_pos = xs + flowx
    fy_pos = ys + flowy
    x1i = jnp.floor(fx_pos)
    y1i = jnp.floor(fy_pos)
    inside = (x1i >= 0) & (y1i >= 0) & (x1i < cols - 1) & (y1i < rows - 1)

    r0 = r0_ref[:]
    r2 = jnp.where(inside, s[0], 0.0)
    r3 = jnp.where(inside, s[1], 0.0)
    r4 = jnp.where(inside, (r0[2] + s[2]) * 0.5, r0[2])
    r5 = jnp.where(inside, (r0[3] + s[3]) * 0.5, r0[3])
    r6 = jnp.where(inside, (r0[4] + s[4]) * 0.25, r0[4] * 0.5)

    r2 = (r0[0] - r2) * 0.5
    r3 = (r0[1] - r3) * 0.5
    r2 = r2 + r4 * flowy + r6 * flowx
    r3 = r3 + r6 * flowy + r5 * flowx

    # border attenuation ramp (ref: optical_flow_farneback.cl:254).  A table
    # gather does not vectorise under Mosaic; the 6-entry ramp collapses to a
    # two-threshold select on the distance-to-edge.
    def ramp_at(d):
        return jnp.where(
            d < 2, jnp.float32(BORDER_RAMP[0]),
            jnp.where(d < 5, jnp.float32(BORDER_RAMP[2]), jnp.float32(1.0)),
        )

    xi = jax.lax.broadcasted_iota(jnp.int32, (band, cp), 1)
    yi = jax.lax.broadcasted_iota(jnp.int32, (band, cp), 0) + y0
    scale = (
        ramp_at(xi) * ramp_at(yi)
        * ramp_at(cols - xi - 1) * ramp_at(rows - yi - 1)
    )
    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale

    m_ref[0] = r4 * r4 + r6 * r6
    m_ref[1] = (r4 + r5) * r6
    m_ref[2] = r5 * r5 + r6 * r6
    m_ref[3] = r4 * r2 + r6 * r3
    m_ref[4] = r6 * r2 + r5 * r3


def _update_matrices_sparse_kernel(r1p_ref, r0_ref, fx_ref, fy_ref, m_ref,
                                   s_scr, t_scr,
                                   *, R: int, rows: int, cols: int,
                                   band: int):
    """Dense-kernel semantics with DATA-DEPENDENT shift skipping: a tent
    weight plane that is zero over the whole band contributes exactly
    nothing, so its lane rotate / sublane slices / FMAs are branched away
    with ``pl.when`` (scf.if — a real runtime branch, not predication).

    On calibrated PIV flow (|d| <= 4 px, smooth), a 32-row band's y-flow
    range spans ~2-3 of the 2R+1 y-shifts and its x-flow range ~a few
    x-shifts, so the 121-term contraction executes ~10-30 terms; worst case
    (range-10 flow everywhere in one band) it executes all 121 plus the
    branch overhead.  Numerically the skipped terms are identically zero;
    residual diffs vs the dense kernel are compiler mul-add fusion choices
    across the scf.if structure (~1e-5 relative, same class as the
    um_channel separable-order diff).

    Accumulators live in VMEM scratch (s_scr/t_scr) because values cannot
    carry through scf.if regions — only ref side effects can."""
    i = pl.program_id(0)
    y0 = i * band
    cp = fx_ref.shape[-1]

    flowx = fx_ref[:]
    flowy = fy_ref[:]
    dxc = jnp.clip(flowx, float(-R), R - 1e-3)
    dyc = jnp.clip(flowy, float(-R), R - 1e-3)
    nshift = 2 * R + 1

    win = r1p_ref[:, pl.ds(y0, band + nshift - 1), :]
    wys = [jnp.maximum(0.0, 1.0 - jnp.abs(dyc - (sy - R)))
           for sy in range(nshift)]
    ay = [jnp.max(wys[sy]) > 0.0 for sy in range(nshift)]
    s_scr[:] = jnp.zeros((5, band, cp), jnp.float32)
    for sx in range(nshift):
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxc - (sx - R)))

        @pl.when(jnp.max(wx) > 0.0)
        def _sx_body(sx=sx, wx=wx):
            cols_s = win[:, :, sx : sx + cp]  # the lane rotate, skipped too
            t_scr[:] = jnp.zeros((5, band, cp), jnp.float32)
            for sy in range(nshift):
                @pl.when(ay[sy])
                def _sy_body(sy=sy):
                    t_scr[:] += wys[sy][None] * cols_s[:, sy : sy + band, :]
            s_scr[:] += wx[None] * t_scr[:]

    s = s_scr[:]

    # assembly tail identical to _update_matrices_kernel
    ys = jax.lax.broadcasted_iota(jnp.int32, (band, cp), 0).astype(jnp.float32) + y0
    xs = jax.lax.broadcasted_iota(jnp.int32, (band, cp), 1).astype(jnp.float32)
    fx_pos = xs + flowx
    fy_pos = ys + flowy
    x1i = jnp.floor(fx_pos)
    y1i = jnp.floor(fy_pos)
    inside = (x1i >= 0) & (y1i >= 0) & (x1i < cols - 1) & (y1i < rows - 1)

    r0 = r0_ref[:]
    r2 = jnp.where(inside, s[0], 0.0)
    r3 = jnp.where(inside, s[1], 0.0)
    r4 = jnp.where(inside, (r0[2] + s[2]) * 0.5, r0[2])
    r5 = jnp.where(inside, (r0[3] + s[3]) * 0.5, r0[3])
    r6 = jnp.where(inside, (r0[4] + s[4]) * 0.25, r0[4] * 0.5)

    r2 = (r0[0] - r2) * 0.5
    r3 = (r0[1] - r3) * 0.5
    r2 = r2 + r4 * flowy + r6 * flowx
    r3 = r3 + r6 * flowy + r5 * flowx

    def ramp_at(d):
        return jnp.where(
            d < 2, jnp.float32(BORDER_RAMP[0]),
            jnp.where(d < 5, jnp.float32(BORDER_RAMP[2]), jnp.float32(1.0)),
        )

    xi = jax.lax.broadcasted_iota(jnp.int32, (band, cp), 1)
    yi = jax.lax.broadcasted_iota(jnp.int32, (band, cp), 0) + y0
    scale = (
        ramp_at(xi) * ramp_at(yi)
        * ramp_at(cols - xi - 1) * ramp_at(rows - yi - 1)
    )
    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale

    m_ref[0] = r4 * r4 + r6 * r6
    m_ref[1] = (r4 + r5) * r6
    m_ref[2] = r5 * r5 + r6 * r6
    m_ref[3] = r4 * r2 + r6 * r3
    m_ref[4] = r6 * r2 + r5 * r3


@partial(jax.jit, static_argnames=("sample_max_shift", "band", "interpret"))
def update_matrices_sparse_pallas(flowx, flowy, r0, r1,
                                  sample_max_shift: int = 5,
                                  band: int | None = None,
                                  interpret: bool = False):
    """Drop-in for update_matrices_pallas with data-dependent shift skipping
    (see _update_matrices_sparse_kernel).  Registry-gated as 'um_sparse' —
    stays out of default dispatch until its hardware A/B stages are
    committed (ops/pallas/validated.py policy)."""
    R = int(sample_max_shift)
    _, rows, cols = r0.shape
    ph, pw = _align2(rows, cols)
    rp, cp = rows + ph, cols + pw
    if band is None:
        band = _um_whole_band(_um_padded_bytes(r0.shape, R))
    while band > 8 and rp % band != 0:
        band //= 2
    band = min(band, rp)
    assert rp % band == 0
    r1p = jnp.pad(r1, ((0, 0), (R, R + 1), (R, R + 1)), mode="edge")
    r1p = jnp.pad(r1p, ((0, 0), (0, ph), (0, pw)))
    r0 = jnp.pad(r0, ((0, 0), (0, ph), (0, pw)))
    flowx = jnp.pad(flowx, ((0, ph), (0, pw)))
    flowy = jnp.pad(flowy, ((0, ph), (0, pw)))

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    band_spec = lambda nch: pl.BlockSpec(
        (nch, band, cp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    band2 = pl.BlockSpec((band, cp), lambda i: (i, 0), memory_space=pltpu.VMEM)

    nshift = 2 * R + 1
    out = pl.pallas_call(
        partial(_update_matrices_sparse_kernel, R=R, rows=rows, cols=cols,
                band=band),
        out_shape=jax.ShapeDtypeStruct((5, rp, cp), jnp.float32),
        grid=(pl.cdiv(rp, band),),
        in_specs=[vmem, band_spec(5), band2, band2],
        out_specs=band_spec(5),
        scratch_shapes=[
            pltpu.VMEM((5, band, cp), jnp.float32),
            pltpu.VMEM((5, band, cp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(rows) * cols * (nshift * nshift * 10 + 40) * 5,
            bytes_accessed=(5 * rows * cols * 3 + 2 * rows * cols) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(r1p, r0, flowx.astype(jnp.float32), flowy.astype(jnp.float32))
    return out[:, :rows, :cols]


def _align2(h: int, w: int):
    """Bottom/right zero-padding up to the f32 (8, 128) tile."""
    return (-h) % 8, (-w) % 128


def _um_whole_band(r1p_bytes: int) -> int:
    """Row band for the whole-field kernels: 32 in the small-residency
    regime (hardware-probed through 1024^2), 16 beyond it — the band=16
    working set (double-buffered outputs + r0/flow bands + 2 scratch,
    ~1.5 MB at 2048^2) is what left room for the 89.8 MB whole-R1 stack
    inside the 100 MB scoped-VMEM limit (scripts/um_whole_2048_probe.json,
    round 5: compiled and ran, 2.03x the channel-sparse kernel)."""
    return 32 if r1p_bytes <= 48 * 1024 * 1024 else 16


def _um_padded_bytes(shape, sample_max_shift: int) -> int:
    """TRUE VMEM residency of the whole-R1 stack: the (rows+2R+1, cols+2R+1)
    semantic halo, the wrapper's (8, 128) tile alignment AND Mosaic's own
    rounding of the resident buffer to the f32 tile — at 2048^2 the naive
    cols+2R+1 count is 84.8 MB where the real padded buffer is
    5*2064*2176*4 = 89.8 MB (the size the compile reports charge)."""
    rows, cols = shape[-2], shape[-1]
    R = int(sample_max_shift)
    ph, pw = _align2(rows, cols)
    rr = rows + ph + 2 * R + 1
    cc = cols + pw + 2 * R + 1
    rr += (-rr) % 8
    cc += (-cc) % 128
    return 5 * rr * cc * 4


def update_matrices_dense_supports_pallas(shape, sample_max_shift) -> bool:
    """Envelope of the DENSE whole-field kernel: its accumulators are
    carried as values through the unrolled contraction (not scratch refs),
    so the compiler charges the live temporaries on the VMEM stack — at
    2048^2 band 16 it OOMs at 125.9 MB of 100 where the sparse kernel
    (scratch-ref accumulators) fits.  The hardware-probed dense envelope
    stays at the 48 MB whole-R1 cap (1024^2)."""
    if sample_max_shift is None:
        return False
    return _um_padded_bytes(shape, sample_max_shift) <= 48 * 1024 * 1024


def update_matrices_supports_pallas(shape, sample_max_shift) -> bool:
    """Banded kernel needs R1 whole in VMEM plus a band working set
    (arbitrary shapes are tile-aligned by zero-pad + crop in the wrapper)."""
    if sample_max_shift is None:
        return False
    # Envelope calibrated against the scoped-VMEM model + hardware probes
    # on the TRUE Mosaic-padded residency (_um_padded_bytes): 24 MB
    # (1024^2, band 32, fb_size_probe.json) and 89.8 MB (2048^2, band 16,
    # um_whole_2048_probe.json) both compile and run; the band-16 working
    # set keeps the model under the 100 MB limit up to ~91 MB of padded
    # whole-R1 residency.
    return _um_padded_bytes(shape, sample_max_shift) <= 91 * 1024 * 1024


@partial(jax.jit, static_argnames=("sample_max_shift", "band", "interpret"))
def update_matrices_pallas(flowx, flowy, r0, r1, sample_max_shift: int = 5,
                           band: int | None = None, interpret: bool = False):
    """Drop-in replacement for models.farneback.update_matrices (dense path)."""
    R = int(sample_max_shift)
    _, rows, cols = r0.shape
    ph, pw = _align2(rows, cols)
    rp, cp = rows + ph, cols + pw
    if band is None:
        band = _um_whole_band(_um_padded_bytes(r0.shape, R))
    while band > 8 and rp % band != 0:
        band //= 2
    band = min(band, rp)
    assert rp % band == 0
    # semantic edge pad first (the R-halo), THEN the tile-alignment zero pad
    # (padded pixels are outside the inside-mask and cropped anyway)
    r1p = jnp.pad(r1, ((0, 0), (R, R + 1), (R, R + 1)), mode="edge")
    r1p = jnp.pad(r1p, ((0, 0), (0, ph), (0, pw)))
    r0 = jnp.pad(r0, ((0, 0), (0, ph), (0, pw)))
    flowx = jnp.pad(flowx, ((0, ph), (0, pw)))
    flowy = jnp.pad(flowy, ((0, ph), (0, pw)))

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    band_spec = lambda nch: pl.BlockSpec(
        (nch, band, cp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    band2 = pl.BlockSpec((band, cp), lambda i: (i, 0), memory_space=pltpu.VMEM)

    nshift = 2 * R + 1
    out = pl.pallas_call(
        partial(_update_matrices_kernel, R=R, rows=rows, cols=cols, band=band),
        out_shape=jax.ShapeDtypeStruct((5, rp, cp), jnp.float32),
        grid=(pl.cdiv(rp, band),),
        in_specs=[vmem, band_spec(5), band2, band2],
        out_specs=band_spec(5),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(rows) * cols * (nshift * nshift * 10 + 40) * 5,
            bytes_accessed=(5 * rows * cols * 3 + 2 * rows * cols) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(r1p, r0, flowx.astype(jnp.float32), flowy.astype(jnp.float32))
    return out[:, :rows, :cols]


def _tent_sample_channel_kernel(r1p_ref, fx_ref, fy_ref, s_out, *, R: int,
                                band: int):
    """One (channel, row-band) cell: separable tent contraction with the
    channel's R1 plane resident in VMEM.  Factorising the tent weights
    (sum_sy wy * (sum_sx wx * win)) costs nshift^2 + nshift FMAs per
    channel instead of sharing nshift^2 dense weight products across the 5
    channels — the price of channel blocking, which is what lets 2048^2
    (86 MB all-channel field) run from VMEM at all."""
    i = pl.program_id(1)
    y0 = i * band
    cp = fx_ref.shape[-1]

    flowx = fx_ref[:]
    flowy = fy_ref[:]
    dxc = jnp.clip(flowx, float(-R), R - 1e-3)
    dyc = jnp.clip(flowy, float(-R), R - 1e-3)
    nshift = 2 * R + 1

    win = r1p_ref[0, pl.ds(y0, band + nshift - 1), :]
    # wx is sy-invariant: hoist the 2R+1 weight planes out of the sy loop
    # (the 2048^2 band-256 variant OOM'd VMEM at 212 M largely from unrolled
    # live temporaries; small bands + hoisted weights keep pressure low)
    wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(dxc - (sx - R)))
           for sx in range(nshift)]
    acc = jnp.zeros((band, cp), jnp.float32)
    for sy in range(nshift):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dyc - (sy - R)))
        rows_s = win[sy : sy + band, :]
        t = jnp.zeros((band, cp), jnp.float32)
        for sx in range(nshift):
            t = t + wxs[sx] * rows_s[:, sx : sx + cp]
        acc = acc + wy * t
    s_out[0] = acc


def update_matrices_channel_supports_pallas(shape, sample_max_shift) -> bool:
    """One R1 channel plane (not all five) must fit VMEM double-buffered."""
    rows, cols = shape[-2], shape[-1]
    if sample_max_shift is None:
        return False
    ph, pw = _align2(rows, cols)
    ch_bytes = (rows + ph + 2 * sample_max_shift + 1) * (
        cols + pw + 2 * sample_max_shift + 1
    ) * 4
    # 18 MB/plane admits exactly the hardware-probed envelope (2048^2 R=6:
    # 17.0 MB, scripts/fb_size_probe.json + pallas_ab_results.json:um_channel);
    # larger unprobed shapes (~2700^2, wide non-square) stay on the XLA path
    # until probed — a scoped-VMEM compile OOM there would be a hard failure.
    return ch_bytes <= 18 * 1024 * 1024


def _tent_sample_channel_sparse_kernel(r1p_ref, fx_ref, fy_ref, s_out,
                                       acc_scr, t_scr, *, R: int, band: int):
    """Channel-blocked tent sampling with data-dependent shift skipping —
    the _update_matrices_sparse_kernel treatment applied to the channel
    kernel: a whole-band zero tent-weight plane contributes exactly
    nothing, so its slices/FMAs are branched away with pl.when.  Wins on
    in-solve flow sequences (see the 'um_sparse' registry note); worst
    case all branches are taken plus overhead.  Accumulators live in VMEM
    scratch (values cannot carry through scf.if regions)."""
    i = pl.program_id(1)
    y0 = i * band
    cp = fx_ref.shape[-1]

    flowx = fx_ref[:]
    flowy = fy_ref[:]
    dxc = jnp.clip(flowx, float(-R), R - 1e-3)
    dyc = jnp.clip(flowy, float(-R), R - 1e-3)
    nshift = 2 * R + 1

    win = r1p_ref[0, pl.ds(y0, band + nshift - 1), :]
    wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(dxc - (sx - R)))
           for sx in range(nshift)]
    ax = [jnp.max(wxs[sx]) > 0.0 for sx in range(nshift)]
    acc_scr[:] = jnp.zeros((band, cp), jnp.float32)
    for sy in range(nshift):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dyc - (sy - R)))

        @pl.when(jnp.max(wy) > 0.0)
        def _sy_body(sy=sy, wy=wy):
            rows_s = win[sy : sy + band, :]
            t_scr[:] = jnp.zeros((band, cp), jnp.float32)
            for sx in range(nshift):
                @pl.when(ax[sx])
                def _sx_body(sx=sx):
                    t_scr[:] += wxs[sx] * rows_s[:, sx : sx + cp]
            acc_scr[:] += wy * t_scr[:]
    s_out[0] = acc_scr[:]


def _tent_sample_channel_sparse2d_kernel(r1p_ref, fx_ref, fy_ref, s_out,
                                         acc_scr, t_scr, *, R: int,
                                         band: int, cblk: int):
    """Channel-blocked tent sampling with 2-D (row-band x column-block)
    shift skipping.  The 1-D sparse kernel's skip granularity is a full-width
    row band: on calibrated PIV flow whose u-component varies ALONG x (the
    parabolic profile), a 32x2048 band spans most of the x-tent range and
    few sx branches skip — measured only 1.35x dense.  Tiling the lane dim
    at ``cblk`` makes the activity window the local flow range of a
    (band, cblk) tile, where both components span ~1-2 px and the 121-term
    contraction drops to ~10-20 terms.

    The lane-dim tile offset is dynamic (program_id) and Mosaic requires
    128-aligned dynamic lane offsets, so the kernel loads an aligned
    (band + 2R, cblk + 2R+1 rounded up to lanes) superset and applies the
    shift as static sub-slices — the same aligned-superset trick as the
    dense kernel's sublane handling."""
    i = pl.program_id(1)
    cb = pl.program_id(2)
    y0 = i * band
    x0 = cb * cblk
    nshift = 2 * R + 1
    ext = _lane_ext(nshift)

    flowx = fx_ref[:]
    flowy = fy_ref[:]
    dxc = jnp.clip(flowx, float(-R), R - 1e-3)
    dyc = jnp.clip(flowy, float(-R), R - 1e-3)

    # aligned superset: x0 is a cblk multiple (>=128-aligned), width a lane
    # multiple covering the +nshift-1 shift reach; shifts become static
    # sub-slices
    win = r1p_ref[0, pl.ds(y0, band + nshift - 1), pl.ds(x0, cblk + ext)]

    wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(dxc - (sx - R)))
           for sx in range(nshift)]
    ax = [jnp.max(wxs[sx]) > 0.0 for sx in range(nshift)]
    acc_scr[:] = jnp.zeros((band, cblk), jnp.float32)
    for sy in range(nshift):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dyc - (sy - R)))

        @pl.when(jnp.max(wy) > 0.0)
        def _sy_body(sy=sy, wy=wy):
            rows_s = win[sy : sy + band, :]
            t_scr[:] = jnp.zeros((band, cblk), jnp.float32)
            for sx in range(nshift):
                @pl.when(ax[sx])
                def _sx_body(sx=sx):
                    t_scr[:] += wxs[sx] * rows_s[:, sx : sx + cblk]
            acc_scr[:] += wy * t_scr[:]
    s_out[0] = acc_scr[:]


def _lane_ext(nshift: int) -> int:
    """Lane-dim superset extension: the shift reach rounded up to lanes."""
    return ((nshift - 1 + 127) // 128) * 128


def tent_sample_channel_call(r1p, fxp, fyp, R: int, band: int = 32,
                             interpret: bool = False, sparse: bool = False):
    """Channel-blocked tent sampling from a PRE-PADDED R1 field: ``r1p`` is
    (5, rp + 2R+1, cp + 2R+1) — (R, R+1)-deep semantic halo (edge padding on
    a single device, real neighbour rows from exchange_halo in the sharded
    composition) followed by the caller's (rp - rows) tile-alignment zero
    pad; ``fxp``/``fyp`` are (rp, cp).  Returns the sampled field (5, rp, cp)
    (tail alignment rows/cols are garbage — crop).  Shared by
    update_matrices_channel_pallas and parallel/sharded_pallas.py's
    rows-sharded Farneback iteration."""
    rp, cp = fxp.shape
    while band > 8 and rp % band != 0:
        band //= 2
    band = min(band, rp)
    assert rp % band == 0
    assert r1p.shape == (5, rp + 2 * R + 1, cp + 2 * R + 1), (
        r1p.shape, rp, cp)

    nshift = 2 * R + 1
    if sparse == "2d":
        cblk = 256
        while cblk > 128 and cp % cblk != 0:
            cblk //= 2
        if cp % cblk == 0:
            # aligned-superset lane pad: the kernel loads (cblk + ext)-wide
            # windows at cblk-multiple offsets, so the plane must extend to
            # cp + ext (zero lanes beyond the semantic halo are loaded but
            # never enter the contraction — shifts reach only +nshift-1)
            ext = _lane_ext(nshift)
            r1p2 = jnp.pad(r1p, ((0, 0), (0, 0), (0, ext - nshift)))
            chan = pl.BlockSpec((1, r1p2.shape[1], r1p2.shape[2]),
                                lambda c, i, cb: (c, 0, 0),
                                memory_space=pltpu.VMEM)
            tile2 = pl.BlockSpec((band, cblk), lambda c, i, cb: (i, cb),
                                 memory_space=pltpu.VMEM)
            outspec = pl.BlockSpec((1, band, cblk),
                                   lambda c, i, cb: (c, i, cb),
                                   memory_space=pltpu.VMEM)
            return pl.pallas_call(
                partial(_tent_sample_channel_sparse2d_kernel, R=R, band=band,
                        cblk=cblk),
                out_shape=jax.ShapeDtypeStruct((5, rp, cp), jnp.float32),
                grid=(5, rp // band, cp // cblk),
                in_specs=[chan, tile2, tile2],
                out_specs=outspec,
                scratch_shapes=[pltpu.VMEM((band, cblk), jnp.float32),
                                pltpu.VMEM((band, cblk), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=112 * 1024 * 1024,
                ),
                cost_estimate=pl.CostEstimate(
                    flops=5 * rp * cp * (nshift * nshift + 3 * nshift) * 2,
                    bytes_accessed=(r1p2.size + 2 * fxp.size
                                    + 5 * rp * cp) * 4,
                    transcendentals=0,
                ),
                interpret=interpret,
            )(r1p2.astype(jnp.float32), fxp.astype(jnp.float32),
              fyp.astype(jnp.float32))
        sparse = True  # indivisible lane dim: fall back to the 1-D variant

    chan = pl.BlockSpec((1, r1p.shape[1], r1p.shape[2]),
                        lambda c, i: (c, 0, 0), memory_space=pltpu.VMEM)
    band2 = pl.BlockSpec((band, cp), lambda c, i: (i, 0),
                         memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((1, band, cp), lambda c, i: (c, i, 0),
                           memory_space=pltpu.VMEM)
    if sparse:
        kern = partial(_tent_sample_channel_sparse_kernel, R=R, band=band)
        scratch = [pltpu.VMEM((band, cp), jnp.float32),
                   pltpu.VMEM((band, cp), jnp.float32)]
    else:
        kern = partial(_tent_sample_channel_kernel, R=R, band=band)
        scratch = []
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((5, rp, cp), jnp.float32),
        grid=(5, rp // band),
        in_specs=[chan, band2, band2],
        out_specs=outspec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * rp * cp * (nshift * nshift + 3 * nshift) * 2,
            bytes_accessed=(r1p.size + 2 * fxp.size + 5 * rp * cp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(r1p.astype(jnp.float32), fxp.astype(jnp.float32),
      fyp.astype(jnp.float32))


@partial(jax.jit, static_argnames=("sample_max_shift", "band", "interpret",
                                   "sparse"))
def update_matrices_channel_pallas(flowx, flowy, r0, r1,
                                   sample_max_shift: int = 5,
                                   band: int = 32, interpret: bool = False,
                                   sparse: bool = False):
    """updateMatrices for fields beyond all-channel VMEM residency:
    channel-blocked Pallas tent sampling + the shared XLA M assembly
    (models.farneback.assemble_m).  Summation order differs from the dense
    kernel (separable weights), so parity is to f32 round-off, not
    bit-identical.  ``sparse=True`` uses the shift-skipping variant
    ('um_channel_sparse' registry entry)."""
    from opticalflow_ri_tpu.models.farneback import assemble_m

    R = int(sample_max_shift)
    _, rows, cols = r0.shape
    ph, pw = _align2(rows, cols)

    r1p = jnp.pad(r1, ((0, 0), (R, R + 1), (R, R + 1)), mode="edge")
    r1p = jnp.pad(r1p, ((0, 0), (0, ph), (0, pw)))
    fxp = jnp.pad(flowx, ((0, ph), (0, pw)))
    fyp = jnp.pad(flowy, ((0, ph), (0, pw)))

    s = tent_sample_channel_call(r1p, fxp, fyp, R, band, interpret, sparse)
    s = s[:, :rows, :cols]

    ys = jax.lax.broadcasted_iota(jnp.float32, (rows, cols), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (rows, cols), 1)
    x1i = jnp.floor(xs + flowx).astype(jnp.int32)
    y1i = jnp.floor(ys + flowy).astype(jnp.int32)
    inside = (x1i >= 0) & (y1i >= 0) & (x1i < cols - 1) & (y1i < rows - 1)
    return assemble_m(s, r0, flowx, flowy, inside)
