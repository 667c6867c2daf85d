"""Driver warp (displacement tent contraction) as a Pallas TPU kernel.

The pyramidal driver's symmetric warp (ref:
src/GenericPyramidalOpticalFlow.py:198-201 via ops/warp.py) samples each
image at per-pixel displaced positions; the XLA path expresses it as a
dense tent-weight contraction over (2R+1)^2 = 289 static shifts (R=8) that
re-streams the padded image per shift — at ~1.4 ms per 512^2 pair with
runtime flows it is the largest glue item in every pyramidal configuration
(the glue probe's 0.60 ms figure was a constant-folded underestimate; see
HISTORY below).

This kernel is the single-channel instance of the proven tent_sample
pattern: the padded image resident in VMEM, output rows banded, sx as the
OUTER loop so each lane-dim slice (cross-lane rotate — the expensive op
class) happens once with the cheap sublane slices inside, and tent weights
applied separably.  Both images of the symmetric pair go through one launch
as a leading grid dimension (each with its own displacement field).

Parity vs the XLA contraction is to f32 round-off (separable summation
order), measured relative in the ``warp_tent`` A/B stages.

HISTORY: the round-4 A/B recorded the dense kernel LOSING 2x to XLA
(2.19 vs 1.09 ms) and it stayed unregistered — but that baseline's
displacement fields were jit-closure CONSTANTS, so XLA folded much of the
tent into fixed weights (the same trap as the glue probe's 0.60 ms warp
figure).  The round-5 re-measure with flows threaded as RUNTIME arguments
(warp_tent_sparse stages) shows the real picture at 512^2: XLA 1.41 ms,
dense kernel 0.27, and the shift-skipping SPARSE variant below 0.145 —
9.8x XLA on calibrated flows (parity 1.4e-7 relative).  On wild flows
(|d/2| ~ 7 of R=8) the dense kernel is best (0.23 vs sparse 0.52; XLA
1.09) — the default dispatch registers the sparse variant, optimising the
calibrated regime this library is for (the um_sparse philosophy); wild
configs still run ~2x faster than the old XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_tent_kernel(imgp_ref, dy_ref, dx_ref, out_ref, *, R: int,
                      band: int):
    cp = dx_ref.shape[-1]
    nshift = 2 * R + 1
    i = pl.program_id(1)
    y0 = i * band

    dyc = jnp.clip(dy_ref[0], float(-R), R - 1e-3)
    dxc = jnp.clip(dx_ref[0], float(-R), R - 1e-3)

    win = imgp_ref[0, pl.ds(y0, band + nshift - 1), :]
    wys = [jnp.maximum(0.0, 1.0 - jnp.abs(dyc - (sy - R)))
           for sy in range(nshift)]
    acc = jnp.zeros((band, cp), jnp.float32)
    for sx in range(nshift):
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxc - (sx - R)))
        cols_s = win[:, sx : sx + cp]
        t = jnp.zeros((band, cp), jnp.float32)
        for sy in range(nshift):
            t = t + wys[sy] * cols_s[sy : sy + band, :]
        acc = acc + wx * t
    out_ref[0] = acc


def _warp_tent_sparse_kernel(imgp_ref, dy_ref, dx_ref, out_ref,
                             acc_scr, t_scr, *, R: int, band: int):
    """Dense warp-tent semantics with the um_sparse shift-skipping
    treatment (round 5): a whole-band zero tent-weight plane contributes
    nothing, so its lane rotate / sublane slices / FMAs are branched away
    with ``pl.when``.  On calibrated flows (|d/2| <= 2 px) a 32-row band
    touches ~3x3 of the 289 R=8 shifts, which is exactly the regime where
    the dense kernel's 17 lane rotates per band lost 2x to XLA."""
    cp = dx_ref.shape[-1]
    nshift = 2 * R + 1
    i = pl.program_id(1)
    y0 = i * band

    dyc = jnp.clip(dy_ref[0], float(-R), R - 1e-3)
    dxc = jnp.clip(dx_ref[0], float(-R), R - 1e-3)

    win = imgp_ref[0, pl.ds(y0, band + nshift - 1), :]
    wys = [jnp.maximum(0.0, 1.0 - jnp.abs(dyc - (sy - R)))
           for sy in range(nshift)]
    ay = [jnp.max(wys[sy]) > 0.0 for sy in range(nshift)]
    acc_scr[:] = jnp.zeros((band, cp), jnp.float32)
    for sx in range(nshift):
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxc - (sx - R)))

        @pl.when(jnp.max(wx) > 0.0)
        def _sx_body(sx=sx, wx=wx):
            cols_s = win[:, sx : sx + cp]  # the lane rotate, skipped too
            t_scr[:] = jnp.zeros((band, cp), jnp.float32)
            for sy in range(nshift):
                @pl.when(ay[sy])
                def _sy_body(sy=sy):
                    t_scr[:] += wys[sy] * cols_s[sy : sy + band, :]
            acc_scr[:] += wx * t_scr[:]
    out_ref[0] = acc_scr[:]


def _align2(h: int, w: int):
    return (-h) % 8, (-w) % 128


def warp_tent_supports_pallas(shape, max_shift: int) -> bool:
    """Each padded image plane must fit VMEM beside the band working set."""
    rows, cols = shape[-2], shape[-1]
    ph, pw = _align2(rows, cols)
    plane = (rows + ph + 2 * max_shift + 1) * (cols + pw + 2 * max_shift + 1) * 4
    return plane <= 40 * 1024 * 1024


@partial(jax.jit, static_argnames=("max_shift", "band", "interpret",
                                   "sparse"))
def warp_pair_tent_pallas(im1, im2, dy1, dx1, dy2, dx2, max_shift: int = 8,
                          band: int = 32, interpret: bool = False,
                          sparse: bool = False):
    """Warp im1 by (dy1, dx1) and im2 by (dy2, dx2) in one launch; same
    contract as two ops.warp.displacement_warp_tent calls."""
    R = int(max_shift)
    rows, cols = im1.shape
    ph, pw = _align2(rows, cols)
    rp, cp = rows + ph, cols + pw
    while band > 8 and rp % band != 0:
        band //= 2
    band = min(band, rp)
    assert rp % band == 0

    def prep(img):
        p = jnp.pad(img.astype(jnp.float32), ((R, R + 1), (R, R + 1)),
                    mode="edge")
        return jnp.pad(p, ((0, ph), (0, pw)))

    imgs = jnp.stack([prep(im1), prep(im2)])
    dys = jnp.stack([jnp.pad(dy1.astype(jnp.float32), ((0, ph), (0, pw))),
                     jnp.pad(dy2.astype(jnp.float32), ((0, ph), (0, pw)))])
    dxs = jnp.stack([jnp.pad(dx1.astype(jnp.float32), ((0, ph), (0, pw))),
                     jnp.pad(dx2.astype(jnp.float32), ((0, ph), (0, pw)))])

    img_spec = pl.BlockSpec((1, imgs.shape[1], imgs.shape[2]),
                            lambda c, i: (c, 0, 0), memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((1, band, cp), lambda c, i: (c, i, 0),
                             memory_space=pltpu.VMEM)
    nshift = 2 * R + 1
    if sparse:
        kern = partial(_warp_tent_sparse_kernel, R=R, band=band)
        scratch = [pltpu.VMEM((band, cp), jnp.float32),
                   pltpu.VMEM((band, cp), jnp.float32)]
    else:
        kern = partial(_warp_tent_kernel, R=R, band=band)
        scratch = []
    out = pl.pallas_call(
        kern,
        grid=(2, rp // band),
        out_shape=jax.ShapeDtypeStruct((2, rp, cp), jnp.float32),
        in_specs=[img_spec, band_spec, band_spec],
        out_specs=band_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * cols * (nshift * nshift * 2 + 4 * nshift),
            bytes_accessed=(imgs.size + dys.size + dxs.size
                            + 2 * rows * cols) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(imgs, dys, dxs)
    return out[0, :rows, :cols], out[1, :rows, :cols]
