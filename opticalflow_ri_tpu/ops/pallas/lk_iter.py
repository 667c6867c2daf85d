"""Dense Lucas-Kanade Gauss-Newton iterations as Pallas TPU kernels.

The XLA path (models/lucas_kanade.py) precomputes the shift-plane stacks
T1/T2 — (nshift^2, H, W) weighted window sums — and then runs the
Gauss-Newton fixed point as a fori_loop whose every iteration re-streams the
full T stacks (~350 MB at 512x512, R=6) from HBM through a dense tent-weight
contraction.  Five iterations cost five full passes.

Two kernels, increasingly fused:

``lk_gn_iterate_pallas`` tiles the image into row bands, loads each band's T
block into VMEM ONCE, and runs ALL Gauss-Newton iterations for that band
in-register: HBM reads drop from n_iter full passes to exactly one.
Iterations are independent across pixels (each pixel's window state is its
own), so banding is exact — numerics match the XLA path to f32 round-off.

``lk_fused_pallas`` goes further: it also BUILDS the band's shift planes
inside the kernel (product + hierarchical window sums straight from the
padded J image and the gradient stacks, into VMEM scratch), so the ~350 MB
plane stack never exists in HBM at all — the kernel's HBM traffic is just
the images, gradients and per-pixel solve fields.  MEASURED SLOWER than the
two-stage path on a v5e (5.9 vs 5.1 ms at 512^2, plus a ~29 min Mosaic
compile of the 169-plane unrolled build): the per-band build repeats the
31-row window halo (~2x redundant VPU work at band 32) that XLA's streamed
global build pays once, and the build is VPU-bound, not HBM-bound.  Kept as
explicit opt-in (impl="pallas_fused") to document the design point; the
production path is the two-stage one.

Semantics preserved from the reference kernel via the XLA path (ref:
src/pyrlkDenseLargeW.cl:304-669): f32 window-origin tracking for the
out-of-bounds bail, the x32.0f delta scale, the |delta|<0.01 early-exit mask,
and the singular-window passthrough handled by the caller.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STEP_EPS = 0.01


def _lk_gn_kernel(row0_ref, t1_ref, t2_ref, ia11_ref, ia12_ref, ia22_ref,
                  c1_ref, c2_ref, act0_ref, px0_ref, py0_ref, px_out, py_out,
                  status_out, *, n_iter: int, R: int, hw: int, h: int, w: int,
                  band: int):
    # h/w are the TRUE image dims (for the out-of-bounds bail); array shapes
    # may be zero-padded up to the (8, 128) tile (wp below) — padded pixels
    # run the loop on zero fields and are cropped by the caller.
    # row0 (SMEM scalar) is the GLOBAL image row of this call's first row —
    # nonzero when the caller stripe-stages the solve over row blocks
    # (px/py stay in global window-origin coordinates, so the oob bail and
    # the v = py + hw - ii update need the true row index).
    i = pl.program_id(0)
    y0 = i * band + row0_ref[0, 0]
    wp = px0_ref.shape[-1]

    nshift = 2 * R + 1
    ia11 = ia11_ref[:]
    ia12 = ia12_ref[:]
    ia22 = ia22_ref[:]
    c1 = c1_ref[:]
    c2 = c2_ref[:]

    # Mosaic rejects float iota; build int32 and convert.
    jj = lax.broadcasted_iota(jnp.int32, (band, wp), 1).astype(jnp.float32)
    ii = (lax.broadcasted_iota(jnp.int32, (band, wp), 0) + y0).astype(jnp.float32)

    def gn_body(_, state):
        # all carries are f32 vectors (incl. the active/status masks):
        # Mosaic cannot legalize a bool vector through the scf.for carry.
        px, py, active, status = state
        oob = ((px < -hw) | (px >= w) | (py < -hw) | (py >= h)).astype(jnp.float32)
        status = status * (1.0 - active * oob)
        active = active * (1.0 - oob)

        u = px + hw - jj
        v = py + hw - ii
        uc = jnp.clip(u, float(-R), R - 1e-3)
        vc = jnp.clip(v, float(-R), R - 1e-3)

        # static unrolled SEPARABLE contraction — Mosaic cannot lower a nested
        # scf.for, and static plane indices avoid dynamic VMEM addressing.
        # tent(uc-sx)*tent(vc-sy) factorises, so contracting sy inside sx
        # costs nshift^2 + nshift FMAs per stack instead of nshift^2 weight
        # evaluations + FMAs (~4x fewer VPU ops than the dense form).
        wys = [
            jnp.maximum(0.0, 1.0 - jnp.abs(vc - float(sy - R)))
            for sy in range(nshift)
        ]
        s1 = jnp.zeros((band, wp), jnp.float32)
        s2 = jnp.zeros((band, wp), jnp.float32)
        for sx in range(nshift):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(uc - float(sx - R)))
            ty1 = jnp.zeros((band, wp), jnp.float32)
            ty2 = jnp.zeros((band, wp), jnp.float32)
            for sy in range(nshift):
                ty1 = ty1 + wys[sy] * t1_ref[sy * nshift + sx]
                ty2 = ty2 + wys[sy] * t2_ref[sy * nshift + sx]
            s1 = s1 + wx * ty1
            s2 = s2 + wx * ty2
        b1 = s1 - c1
        b2 = s2 - c2

        dx = (ia12 * b2 - ia22 * b1) * 32.0
        dy = (ia12 * b1 - ia11 * b2) * 32.0

        px = px + dx * active
        py = py + dy * active
        small = ((jnp.abs(dx) < _STEP_EPS) & (jnp.abs(dy) < _STEP_EPS)).astype(
            jnp.float32
        )
        active = active * (1.0 - small)
        return (px, py, active, status)

    state0 = (
        px0_ref[:],
        py0_ref[:],
        act0_ref[:],
        jnp.ones((band, wp), jnp.float32),
    )
    px, py, _, status = lax.fori_loop(0, n_iter, gn_body, state0)
    px_out[:] = px
    py_out[:] = py
    status_out[:] = status


def _align2(h: int, w: int):
    """Bottom/right zero-padding up to the f32 (8, 128) tile."""
    return (-h) % 8, (-w) % 128


def lk_gn_supports_pallas(h: int, w: int, max_shift: int) -> bool:
    """Banded T blocks (two stacks) must fit VMEM with room for the scalars
    (arbitrary shapes are tile-aligned by zero-pad + crop inside the
    wrapper)."""
    nshift2 = (2 * max_shift + 1) ** 2
    wp = w + _align2(h, w)[1]
    t_block_bytes = 2 * nshift2 * 8 * wp * 4
    # 20 MB admits 2048^2 at R=5 (15.9 MB T-block pair; ~32 MB double-
    # buffered — hardware-probed, scripts/lk_size_probe.json); the XLA
    # fallback at that size pays a ~3.9 GB plane transpose before its loop.
    return t_block_bytes <= 20 * 1024 * 1024


@partial(jax.jit, static_argnames=("n_iter", "R", "hw", "band", "interpret",
                                   "img_h", "img_w"))
def lk_gn_iterate_pallas(t1, t2, ia11, ia12, ia22, c1, c2, ok, px0, py0,
                         n_iter: int, R: int, hw: int, band: int = 8,
                         interpret: bool = False, row0: int = 0,
                         img_h: int | None = None, img_w: int | None = None):
    """Run the LK Gauss-Newton loop; returns (px, py, status).

    ``t1``/``t2`` are (nshift^2, H, W) shift-plane stacks; the remaining
    fields are (H, W).  ``ok`` is the non-singular-window mask (bool).
    Arbitrary shapes: inputs are zero-padded to the f32 (8, 128) tile and the
    outputs cropped — padded pixels solve on zero fields, which is harmless.
    ``row0``/``img_h``/``img_w``: when the caller stripe-stages the solve,
    the stack covers global rows [row0, row0 + H) of an (img_h, img_w) image
    and px/py stay in global coordinates (row0 is an SMEM scalar, so stripes
    share one compiled kernel).
    """
    s_dim, h, w = t1.shape
    img_h = h if img_h is None else img_h
    img_w = w if img_w is None else img_w
    ph, pw = _align2(h, w)
    pad2 = lambda x: jnp.pad(x, ((0, ph), (0, pw)))
    pad3 = lambda x: jnp.pad(x, ((0, 0), (0, ph), (0, pw)))
    hp, wp = h + ph, w + pw
    while band > 8 and hp % band != 0:
        band //= 2
    assert hp % band == 0

    f32 = lambda x: pad2(x.astype(jnp.float32))
    band2 = pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bandt = pl.BlockSpec((s_dim, band, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1, 1)
    out = pl.pallas_call(
        partial(_lk_gn_kernel, n_iter=n_iter, R=R, hw=hw, h=img_h, w=img_w,
                band=band),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        ),
        grid=(hp // band,),
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM), bandt, bandt]
        + [band2] * 8,
        out_specs=(band2, band2, band2),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n_iter) * (2 * R + 1) ** 2 * 6 * h * w,
            bytes_accessed=(2 * s_dim + 11) * h * w * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        row0_arr,
        pad3(t1.astype(jnp.float32)), pad3(t2.astype(jnp.float32)),
        f32(ia11), f32(ia12), f32(ia22), f32(c1), f32(c2),
        pad2(ok.astype(jnp.float32)), f32(px0), f32(py0),
    )
    return tuple(o[:h, :w] for o in out)


def _lk_fused_kernel(jslab_ref, g_ref, ia11_ref, ia12_ref, ia22_ref, c1_ref,
                     c2_ref, act0_ref, px0_ref, py0_ref, px_out, py_out,
                     status_out, t_scr, *, n_iter: int, R: int, hw: int,
                     h: int, w: int, band: int, runs_y: tuple, runs_x: tuple):
    """One row band: build this band's shift planes into VMEM scratch
    (product + the shared hierarchical window-sum decomposition), then run
    all Gauss-Newton iterations against them."""
    from opticalflow_ri_tpu.ops.window_sums import wsum2d

    i = pl.program_id(0)
    y0 = i * band
    nshift = 2 * R + 1
    ext = 31  # window offsets span the 32-sample grid: GRID - 1 extra rows

    # aligned whole-band loads (y0 = i*band keeps sublane offsets 8-aligned),
    # then static in-register slices per shift
    jslab = jslab_ref[pl.ds(y0, band + ext + 2 * R), :]
    g = g_ref[:, pl.ds(y0, band + ext), :]

    for sy in range(nshift):
        jrows = jslab[sy : sy + band + ext, :]
        for sx in range(nshift):
            # leading stack dim via broadcasting (a [None, ...] index mixes
            # newaxis with slices and lowers to an unsupported Mosaic gather)
            prod = jrows[:, sx : sx + w + ext] * g
            t = wsum2d(prod, runs_y, runs_x, hw, band, w, hierarchical=True)
            t_scr[0, sy * nshift + sx] = t[0]
            t_scr[1, sy * nshift + sx] = t[1]

    ia11 = ia11_ref[:]
    ia12 = ia12_ref[:]
    ia22 = ia22_ref[:]
    c1 = c1_ref[:]
    c2 = c2_ref[:]

    jj = lax.broadcasted_iota(jnp.int32, (band, w), 1).astype(jnp.float32)
    ii = lax.broadcasted_iota(jnp.int32, (band, w), 0).astype(jnp.float32) + y0

    def gn_body(_, state):
        px, py, active, status = state
        oob = ((px < -hw) | (px >= w) | (py < -hw) | (py >= h)).astype(jnp.float32)
        status = status * (1.0 - active * oob)
        active = active * (1.0 - oob)

        u = px + hw - jj
        v = py + hw - ii
        uc = jnp.clip(u, float(-R), R - 1e-3)
        vc = jnp.clip(v, float(-R), R - 1e-3)

        wys = [
            jnp.maximum(0.0, 1.0 - jnp.abs(vc - float(sy - R)))
            for sy in range(nshift)
        ]
        s1 = jnp.zeros((band, w), jnp.float32)
        s2 = jnp.zeros((band, w), jnp.float32)
        for sx in range(nshift):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(uc - float(sx - R)))
            ty1 = jnp.zeros((band, w), jnp.float32)
            ty2 = jnp.zeros((band, w), jnp.float32)
            for sy in range(nshift):
                ty1 = ty1 + wys[sy] * t_scr[0, sy * nshift + sx]
                ty2 = ty2 + wys[sy] * t_scr[1, sy * nshift + sx]
            s1 = s1 + wx * ty1
            s2 = s2 + wx * ty2
        b1 = s1 - c1
        b2 = s2 - c2

        dx = (ia12 * b2 - ia22 * b1) * 32.0
        dy = (ia12 * b1 - ia11 * b2) * 32.0

        px = px + dx * active
        py = py + dy * active
        small = ((jnp.abs(dx) < _STEP_EPS) & (jnp.abs(dy) < _STEP_EPS)).astype(
            jnp.float32
        )
        active = active * (1.0 - small)
        return (px, py, active, status)

    state0 = (
        px0_ref[:],
        py0_ref[:],
        act0_ref[:],
        jnp.ones((band, w), jnp.float32),
    )
    px, py, _, status = lax.fori_loop(0, n_iter, gn_body, state0)
    px_out[:] = px
    py_out[:] = py
    status_out[:] = status


def _fused_band(h: int, max_shift: int, w: int) -> int:
    """Largest band (<=64) dividing h whose scratch stack fits ~24 MB."""
    nshift2 = (2 * max_shift + 1) ** 2
    band = 64
    while band > 8 and (h % band != 0 or 2 * nshift2 * band * w * 4 > 24 * 1024 * 1024):
        band //= 2
    return band


def lk_fused_supports_pallas(h: int, w: int, max_shift: int) -> bool:
    band = _fused_band(h, max_shift, w)
    return h % band == 0 and w % 128 == 0 and h % 8 == 0


@partial(jax.jit, static_argnames=("n_iter", "R", "hw", "runs_y", "runs_x",
                                   "band", "interpret"))
def lk_fused_pallas(jslab, g_pair, ia11, ia12, ia22, c1, c2, act0, px0, py0,
                    n_iter: int, R: int, hw: int, runs_y: tuple, runs_x: tuple,
                    band: int | None = None, interpret: bool = False):
    """Fully fused LK: shift-plane build + Gauss-Newton, planes in VMEM only.

    ``jslab`` is the replicate-padded J image covering rows/cols
    [-(hw+R), {h,w}-1 + 31-hw + R]; ``g_pair`` the (2, h+31, w+31) Scharr
    gradient stack over offsets [-hw, 31-hw]; the rest are (h, w) solve
    fields.  Returns (px, py, status) window origins like the GN kernel.
    """
    h, w = ia11.shape
    if band is None:
        band = _fused_band(h, R, w)
    assert h % band == 0

    nshift = 2 * R + 1
    f32 = lambda x: x.astype(jnp.float32)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    band2 = pl.BlockSpec((band, w), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_lk_fused_kernel, n_iter=n_iter, R=R, hw=hw, h=h, w=w,
                band=band, runs_y=tuple(runs_y), runs_x=tuple(runs_x)),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ),
        grid=(h // band,),
        in_specs=[vmem, vmem] + [band2] * 8,
        out_specs=(band2, band2, band2),
        scratch_shapes=[pltpu.VMEM((2, nshift * nshift, band, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=h * w * nshift * nshift * (25 + 4 * int(n_iter)),
            bytes_accessed=(jslab.size + g_pair.size + 11 * h * w) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        f32(jslab), f32(g_pair), f32(ia11), f32(ia12), f32(ia22), f32(c1),
        f32(c2), f32(act0), f32(px0), f32(py0),
    )
    return out
