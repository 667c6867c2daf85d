"""Fused Farneback window-blur + flow solve as a Pallas TPU kernel.

Each Farneback iteration blurs the 5-plane normal-equation field M with a
separable window filter and immediately solves the per-pixel regularised 2x2
system (ref: optical_flow_farneback.cl:198-253 gaussianBlur5 / :350-406
boxFilter5, then :408-429 updateFlow).  The blurred M exists only to feed
that solve — XLA still materialises it (plus the separable x-pass
intermediate) in HBM every iteration.

This kernel keeps the padded M whole in VMEM, runs both separable passes and
the 2x2 solve per row band, and writes only the two flow planes: the blurred
field and the x-pass intermediate never touch HBM.  Output rows are banded
with the x-pass recomputed over the band's 2*half-row halo (band 64, halo 16
-> 1.5x redundant x-pass flops, all VPU-cheap).

Padding (reflect-101 for the Gaussian window, replicate for the box filter)
is applied by the XLA caller; the kernel does valid correlation only, so the
border semantics stay bit-identical to the stencil path.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow_ri_tpu.ops.padding import pad2d


def _blur5_flow_kernel(mp_ref, fx_out, fy_out, *, taps, rows: int, cols: int,
                       band: int, scale: float):
    # rows/cols are the true dims; array shapes may be tile-aligned (cp) —
    # padded pixels blur zeros and are cropped by the caller.
    i = pl.program_id(0)
    y0 = i * band
    n = len(taps)
    half = n // 2
    cp = fx_out.shape[-1]

    # y-pass first, then x-pass — the same order as the stencil path
    # (gaussian_blur5/box_filter5 correlate axis=-2 then axis=-1), keeping
    # f32 summation order and therefore results bit-identical.
    src = mp_ref[:, pl.ds(y0, band + 2 * half), :]
    tmp = None
    for j, w in enumerate(taps):
        term = src[:, j : j + band, :] * jnp.float32(w)
        tmp = term if tmp is None else tmp + term

    blur = None
    for j, w in enumerate(taps):
        term = tmp[:, :, j : j + cp] * jnp.float32(w)
        blur = term if blur is None else blur + term
    if scale != 1.0:
        blur = blur * jnp.float32(scale)

    # regularised 2x2 solve (ref: optical_flow_farneback.cl:408-429)
    g11, g12, g22, h1, h2 = blur[0], blur[1], blur[2], blur[3], blur[4]
    det_inv = 1.0 / (g11 * g22 - g12 * g12 + jnp.float32(1e-3))
    fx_out[:] = (g11 * h2 - g12 * h1) * det_inv
    fy_out[:] = (g22 * h1 - g12 * h2) * det_inv


def _align2(h: int, w: int):
    """Bottom/right zero-padding up to the f32 (8, 128) tile."""
    return (-h) % 8, (-w) % 128


def blur5_flow_supports_pallas(shape, ksize: int) -> bool:
    rows, cols = shape[-2], shape[-1]
    ph, pw = _align2(rows, cols)
    half = ksize // 2
    mp_bytes = 5 * (rows + ph + 2 * half) * (cols + pw + 2 * half) * 4
    # 48 MB admits 1024^2 (22.3 MB whole-M residency; hardware-probed,
    # scripts/fb_size_probe.json); 2048^2 stays on the XLA path.
    return mp_bytes <= 48 * 1024 * 1024


def blur5_flow_call(mp, taps: tuple, rp: int, cp: int, scale: float,
                    band: int = 16, interpret: bool = False):
    """Whole-M-resident blur+solve from a PRE-PADDED field: ``mp`` is
    (5, rp + 2*half, cp + 2*half) — half-deep semantic halo (border-rule
    padding on a single device, real neighbour rows from exchange_halo in
    the sharded composition) plus the caller's tile-alignment zero pad
    folded into rp/cp.  Returns (rp, cp) flow planes (alignment tail is
    garbage — crop).  Shared by blur5_flow_pallas and the rows-sharded
    Farneback iteration (parallel/sharded_pallas.py)."""
    n = len(taps)
    half = n // 2
    while band > 8 and rp % band != 0:
        band //= 2
    assert rp % band == 0
    assert mp.shape == (5, rp + 2 * half, cp + 2 * half), (mp.shape, rp, cp)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    band2 = pl.BlockSpec((band, cp), lambda i: (i, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_blur5_flow_kernel, taps=taps, rows=rp, cols=cp,
                band=band, scale=float(scale)),
        out_shape=(
            jax.ShapeDtypeStruct((rp, cp), jnp.float32),
            jax.ShapeDtypeStruct((rp, cp), jnp.float32),
        ),
        grid=(rp // band,),
        in_specs=[vmem],
        out_specs=(band2, band2),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(rp) * cp * 5 * (4 * n + 10),
            bytes_accessed=(5 * rp * cp + 2 * rp * cp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(mp.astype(jnp.float32))


@partial(jax.jit, static_argnames=("kernel", "mode", "scale", "band", "interpret"))
def blur5_flow_pallas(m, kernel: tuple, mode: str, scale: float = 1.0,
                      band: int = 16, interpret: bool = False):
    # band 16 keeps the scoped-VMEM footprint under XLA's ~18 MB cap for
    # custom calls inside while/scan bodies (observed: band 64 requested
    # 27 MB inside lax.scan and failed to allocate)
    """Blur the 5-plane field with the separable 1-D ``kernel`` (border
    ``mode``) and solve for flow; returns (flowx, flowy)."""
    taps = tuple(float(w) for w in kernel)
    half = len(taps) // 2
    _, rows, cols = m.shape
    ph, pw = _align2(rows, cols)
    rp, cp = rows + ph, cols + pw

    # semantic border pad first, then the tile-alignment zero pad (true
    # pixels only ever read the semantic halo; padded outputs are cropped)
    mp = pad2d(m, ((half, half), (half, half)), mode)
    mp = jnp.pad(mp, ((0, 0), (0, ph), (0, pw)))

    fxp, fyp = blur5_flow_call(mp, taps, rp, cp, float(scale), band, interpret)
    return fxp[:rows, :cols], fyp[:rows, :cols]


# ---------------------------------------------------------------------------
# Banded variant for fields beyond whole-M VMEM residency (2048^2+)
# ---------------------------------------------------------------------------

def _blur5_flow_banded_kernel(mp_hbm, fx_out, fy_out, slab, sem, *, taps,
                              band: int, w: int, half: int, scale: float):
    """One row band: DMA a (5, band+2*half, Wp) slab of the pre-padded M
    from HBM (BlockSpec blocks cannot overlap, and bands need their
    neighbours' halo rows — the hs_tiled manual-DMA pattern), run both
    separable passes and the 2x2 solve in VMEM, write only the flow band."""
    i = pl.program_id(0)
    n = len(taps)

    cp = pltpu.make_async_copy(
        mp_hbm.at[:, pl.ds(i * band, band + 2 * half), :], slab, sem
    )
    cp.start()
    cp.wait()

    src = slab[:]
    tmp = None
    for j, wgt in enumerate(taps):
        term = src[:, j : j + band, :] * jnp.float32(wgt)
        tmp = term if tmp is None else tmp + term
    blur = None
    for j, wgt in enumerate(taps):
        term = tmp[:, :, j : j + w] * jnp.float32(wgt)
        blur = term if blur is None else blur + term
    if scale != 1.0:
        blur = blur * jnp.float32(scale)

    g11, g12, g22, h1, h2 = blur[0], blur[1], blur[2], blur[3], blur[4]
    det_inv = 1.0 / (g11 * g22 - g12 * g12 + jnp.float32(1e-3))
    fx_out[:] = (g11 * h2 - g12 * h1) * det_inv
    fy_out[:] = (g22 * h1 - g12 * h2) * det_inv


def blur5_flow_banded_supports(shape, ksize: int, band: int = 64) -> bool:
    rows, cols = shape[-2], shape[-1]
    half = ksize // 2
    if rows % 8 or cols % 128 or rows % band:
        return False
    wp = cols + 2 * half + (-(cols + 2 * half)) % 128
    # slab + tmp + blur + flow bands, double-buffered headroom
    need = (5 * (band + 2 * half) * wp + 2 * 5 * band * wp + 4 * band * wp) * 4
    return need <= 48 * 1024 * 1024


@partial(jax.jit, static_argnames=("kernel", "mode", "scale", "band",
                                   "interpret"))
def blur5_flow_banded_pallas(m, kernel: tuple, mode: str, scale: float = 1.0,
                             band: int = 64, interpret: bool = False):
    """Banded blur5+updateFlow for large fields: same contract as
    blur5_flow_pallas, M streamed through VMEM one (band + window) slab at a
    time instead of resident whole."""
    taps = tuple(float(x) for x in kernel)
    half = len(taps) // 2
    _, rows, cols = m.shape
    if rows % band or cols % 128:
        # grid=(rows // band,) would silently truncate, leaving the tail
        # rows uninitialised — mirror ls_tiled's stripe-height guard rather
        # than rely on the dispatch-site blur5_flow_banded_supports check
        raise ValueError(
            f"blur5_flow_banded_pallas needs rows % band == 0 and "
            f"cols % 128 == 0; got ({rows}, {cols}) with band {band}"
        )
    wpad = (-(cols + 2 * half)) % 128

    mp = pad2d(m, ((half, half), (half, half)), mode)
    if wpad:
        mp = jnp.pad(mp, ((0, 0), (0, 0), (0, wpad)), mode="edge")
    mp = mp.astype(jnp.float32)
    wp = mp.shape[2]

    out_spec = pl.BlockSpec((band, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    fx, fy = pl.pallas_call(
        partial(_blur5_flow_banded_kernel, taps=taps, band=band, w=cols,
                half=half, scale=float(scale)),
        grid=(rows // band,),
        out_shape=(
            jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((5, band + 2 * half, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(rows) * cols * 5 * 4 * len(taps),
            bytes_accessed=(mp.size + 2 * rows * cols) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(mp)
    return fx, fy
