"""shard_map-composed Pallas solvers: multi-chip runs that keep single-chip
kernel performance.

The GSPMD path (parallel/auto.py) must trace XLA-only solver bodies — the
SPMD partitioner cannot partition a Pallas custom call — so an auto-sharded
run forfeits the 2.5–19x hardware-validated kernel wins.  This module closes
that gap the shard_map way: every device runs the *validated temporal-blocked
tiled kernel* (ops/pallas/hs_tiled.py, ls_tiled.py) on its LOCAL tile, and
T-deep halos move over ICI via ``exchange_halo`` between kernel launches —
one ppermute round per T solver iterations, exactly the collective schedule
of the XLA temporal-blocked path (parallel/sharded.py:_hs_body_tblocked).

Correctness composition (no new kernel math):

  * Horn-Schunck: the hs_tiled kernel has no border logic at all — the
    caller supplies a T-deep apron and wraparound garbage creeps 1 px per
    iteration without crossing it.  Here the apron is real neighbour data
    (interior tiles) or the global mirror ring (global-border tiles, which
    self-evolves under the Jacobi operator); both are the already-proven
    halo arguments.
  * Liu-Shen: the ls_tiled kernel applies the exact global y-border rules
    in-kernel, gated by two traced flags (top_border/bot_border).  A global
    border device passes 1.0 (synthetic pad -> apply nearest/zero rules);
    an interior device passes 0.0 (real halo rows -> plain stale-halo
    evolution).  x borders are global on every stripe, so the Liu-Shen
    kernel path shards ROWS only (spec P('y', None)); mesh 'x' devices hold
    width-replicas.

Numerical parity with the single-device kernels is exact where halo data is
exact (all ops are elementwise/rolls), asserted ≤1e-5 in tests and the
driver dryrun.  Ref anchors: src/HornSchunck.py:52-71 (the loop being
scaled), src/PhysicsBasedOpticalFlowLiuShen.py:88-150.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from opticalflow_ri_tpu.parallel.halo import exchange_halo
from opticalflow_ri_tpu.parallel import sharded as _sh
from opticalflow_ri_tpu.models import liu_shen as ls
from opticalflow_ri_tpu.ops.stencil import correlate3x3_padded


def _psum_spatial(z, axes):
    return lax.psum(jnp.sum(z, axis=(-2, -1)), axes)


# ---------------------------------------------------------------------------
# Horn-Schunck
# ---------------------------------------------------------------------------

def hs_shard_kernel_supported(h_loc: int, w_loc: int,
                              t_block: int, interpret: bool = False) -> bool:
    """Can the hs_tiled kernel run on an (h_loc, w_loc) local tile?"""
    from opticalflow_ri_tpu.ops.pallas.hs_tiled import stripe_height

    if h_loc <= t_block + 1 or w_loc <= t_block + 1:  # mirror ring needs n+1
        return False
    if not interpret and (h_loc % 8 or w_loc % 128):
        return False
    return stripe_height(h_loc, w_loc, t_block) is not None


def pick_hs_shard_t(mesh, shape, interpret: bool = False) -> int | None:
    """Largest supported T-block for a kernel-sharded HS solve of ``shape``
    on ``mesh`` (None if no tiling works — caller falls back gracefully).
    Consults the hardware-validated registry: deregistering hs_tiled removes
    it from every dispatch path, including this one (policy-is-code)."""
    from opticalflow_ri_tpu.ops.pallas.validated import is_validated

    if not is_validated("hs_tiled"):
        return None
    my = mesh.shape["y"]
    mx = mesh.shape["x"]
    h, w = shape[-2], shape[-1]
    if h % my or w % mx:
        return None
    for t in (20, 8):
        if hs_shard_kernel_supported(h // my, w // mx, t, interpret):
            return t
    return None


def _hs_body_shardkernel(im1, im2, u0, v0, *, alpha, niter, t_block, bh,
                         interpret):
    """Per-device body: derivatives on the local tile, then niter Jacobi
    iterations in ceil(niter/T) launches of the validated hs_tiled kernel,
    with one T-deep halo exchange per launch."""
    from opticalflow_ri_tpu.ops.pallas.hs_tiled import _launch, _launch_interpret

    fx, fy, ft = _sh._hs_derivatives_local(im1, im2)
    alpha = jnp.float32(alpha)
    rd = 1.0 / (alpha * alpha + fx * fx + fy * fy)

    t = int(t_block)
    h = im1.shape[-2]
    w = im1.shape[-1]
    # same width alignment scheme as hs_tiled.hs_iterate_pallas_tiled: the
    # edge-pad columns sit beyond the T-deep halo and never reach the output
    wpad = (-(w + 2 * t)) % 128

    def pad(z):
        z = exchange_halo(z, t, "mirror")
        return jnp.pad(z, ((0, 0), (0, wpad)), mode="edge") if wpad else z

    fxp, fyp, ftp, rdp = pad(fx), pad(fy), pad(ft), pad(rd)

    launch = _launch_interpret if interpret else _launch
    u, v = u0.astype(jnp.float32), v0.astype(jnp.float32)
    done = 0
    while done < niter:
        k = min(t, niter - done)
        u, v = launch(fxp, fyp, ftp, rdp, pad(u), pad(v), k, bh, t, w)
        done += k

    npix = _psum_spatial(jnp.ones_like(u), _sh._SPATIAL)
    err = (
        jnp.sqrt(_psum_spatial((u - u0) ** 2, _sh._SPATIAL))
        + jnp.sqrt(_psum_spatial((v - v0) ** 2, _sh._SPATIAL))
    ) / npix
    return u, v, err


@partial(jax.jit,
         static_argnames=("mesh", "alpha", "niter", "t_block", "bh",
                          "interpret"))
def _hs_kernel_run(mesh, im1, im2, u0, v0, alpha, niter, t_block, bh,
                   interpret):
    spec = P("y", "x")
    f = shard_map(
        partial(_hs_body_shardkernel, alpha=alpha, niter=niter,
                t_block=t_block, bh=bh, interpret=interpret),
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, P()),
        check_vma=False,
    )
    return f(
        im1.astype(jnp.float32), im2.astype(jnp.float32),
        u0.astype(jnp.float32), v0.astype(jnp.float32),
    )


def hs_solve_sharded_kernel(mesh, im1, im2, alpha, niter, u0, v0,
                            t_block: int = 20, interpret: bool = False):
    """Spatially-sharded Horn-Schunck running the validated Pallas kernel on
    every device's local tile; same contract as sharded.hs_solve_sharded."""
    from opticalflow_ri_tpu.ops.pallas.hs_tiled import stripe_height

    my = mesh.shape["y"]
    mx = mesh.shape["x"]
    h_loc = im1.shape[-2] // my
    w_loc = im1.shape[-1] // mx
    if not hs_shard_kernel_supported(h_loc, w_loc, t_block, interpret):
        raise ValueError(
            f"hs kernel-sharded path unsupported for local tile "
            f"({h_loc}, {w_loc}), t_block {t_block}")
    bh = stripe_height(h_loc, w_loc, t_block)
    return _hs_kernel_run(mesh, im1, im2, u0, v0, float(alpha), int(niter),
                          int(t_block), bh, bool(interpret))


# ---------------------------------------------------------------------------
# Liu-Shen (rows-only decomposition; see module docstring)
# ---------------------------------------------------------------------------

_Y_ONLY = ("y",)


def ls_shard_kernel_supported(h_loc: int, w: int, t_block: int,
                              interpret: bool = False) -> bool:
    from opticalflow_ri_tpu.ops.pallas.ls_tiled import ls_stripe_height

    if h_loc <= t_block:
        return False
    if not interpret and (h_loc % 8 or w % 128):
        return False
    return ls_stripe_height(h_loc, w, t_block) is not None


def pick_ls_shard_t(mesh, shape, interpret: bool = False) -> int | None:
    """Largest supported T-block for a rows-sharded Liu-Shen kernel solve.
    Registry-gated like pick_hs_shard_t."""
    from opticalflow_ri_tpu.ops.pallas.validated import is_validated

    if not is_validated("ls_tiled"):
        return None
    my = mesh.shape["y"]
    h, w = shape[-2], shape[-1]
    if h % my:
        return None
    for t in (16, 8, 4):
        if ls_shard_kernel_supported(h // my, w, t, interpret):
            return t
    return None


def _pad_x(z, n, mode):
    """x-apron via the global border rule — the tile spans the full width,
    so plain padding IS the global rule (no exchange)."""
    jmode = {"mirror": "reflect", "symmetric": "symmetric",
             "nearest": "edge", "constant": "constant"}[mode]
    return jnp.pad(z, ((0, 0), (n, n)), mode=jmode)


def _corr3_sharded_y(z, kernel, mode):
    zp = _pad_x(exchange_halo(z, ((1, 1), (0, 0)), mode), 1, mode)
    return correlate3x3_padded(zp, kernel, z.shape[-2], z.shape[-1])


def _ls_body_shardkernel(im1, im2, u0, v0, *, h_reg, max_iter, tol, t_block,
                         bh, interpret):
    from opticalflow_ri_tpu.ops.pallas.ls_tiled import _launch

    im1 = im1 / lax.pmax(jnp.max(im1), _Y_ONLY)
    im2 = im2 / lax.pmax(jnp.max(im2), _Y_ONLY)
    h_regf = jnp.float32(h_reg)

    # precompute on local tiles with 1-px halo stencils (mirrors
    # models.liu_shen.liu_shen_precompute / sharded._ls_body exactly)
    c = _corr3_sharded_y
    iix = im1 * c(im1, ls._K_D1, "nearest")
    iiy = im1 * c(im1, ls._K_D2, "nearest")
    ii = im1 * im1
    dt = im2 - im1
    ixt = im1 * c(dt, ls._K_D1, "nearest")
    iyt = im1 * c(dt, ls._K_D2, "nearest")
    cmtx = c(jnp.ones_like(im1), ls._K_H, "constant")
    a11 = im1 * (c(im1, ls._K_D2ND, "nearest") - 2.0 * im1) - h_regf * cmtx
    a22 = im1 * (c(im1, ls._K_D2ND.T, "nearest") - 2.0 * im1) - h_regf * cmtx
    a12 = im1 * c(im1, ls._K_M, "nearest")
    det = a11 * a22 - a12 * a12
    fields = (iix, iiy, ii, ixt, iyt, a22 / det, -a12 / det, a11 / det)

    t = int(t_block)
    me = lax.axis_index("y")
    p = lax.axis_size("y")
    topf = (me == 0).astype(jnp.float32)
    botf = (me == p - 1).astype(jnp.float32)
    h_arr = jnp.stack([h_regf, topf, botf]).reshape(1, 3)

    # iteration-invariant fields padded once; 'nearest' synthesises the
    # global-border apron (content is overwritten in-kernel there anyway)
    pad_y = lambda z: exchange_halo(z, ((t, t), (0, 0)), "nearest")
    fields_p = tuple(pad_y(f) for f in fields)

    h_glob = im1.shape[-2] * p
    npix = jnp.float32(h_glob * im1.shape[-1])

    def block(u, v, k):
        u2, v2, u2p, v2p = _launch(h_arr, fields_p, pad_y(u), pad_y(v), k,
                                   bh, t, interpret)
        err = (
            jnp.sqrt(_psum_spatial((u2 - u2p) ** 2, _Y_ONLY))
            + jnp.sqrt(_psum_spatial((v2 - v2p) ** 2, _Y_ONLY))
        ) / npix
        return u2, v2, err

    u = u0.astype(jnp.float32)
    v = v0.astype(jnp.float32)
    n_full, rem = divmod(max_iter, t)

    def cond(state):
        _, _, err, k = state
        return jnp.logical_and(err > tol, k < n_full)

    def body(state):
        u, v, _, k = state
        u, v, err = block(u, v, t)
        return (u, v, err, k + 1)

    u, v, err, k_blocks = lax.while_loop(cond, body, (u, v, jnp.float32(1e8), 0))
    if rem:
        ur, vr, er = block(u, v, rem)
        run_tail = jnp.logical_and(err > tol, k_blocks == n_full)
        u = jnp.where(run_tail, ur, u)
        v = jnp.where(run_tail, vr, v)
        err = jnp.where(run_tail, er, err)
    err = jnp.where(jnp.logical_or(k_blocks > 0, jnp.float32(rem) > 0), err,
                    jnp.float32(0.0))
    return u, v, err


@partial(jax.jit,
         static_argnames=("mesh", "h_reg", "max_iter", "tol", "t_block",
                          "bh", "interpret"))
def _ls_kernel_run(mesh, im1, im2, u0, v0, h_reg, max_iter, tol, t_block,
                   bh, interpret):
    spec = P("y", None)
    f = shard_map(
        partial(_ls_body_shardkernel, h_reg=h_reg, max_iter=max_iter,
                tol=tol, t_block=t_block, bh=bh, interpret=interpret),
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, P()),
        check_vma=False,
    )
    return f(
        im1.astype(jnp.float32), im2.astype(jnp.float32),
        u0.astype(jnp.float32), v0.astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# Farneback (rows-only decomposition of the per-level iteration loop)
# ---------------------------------------------------------------------------
#
# The Farneback hot loop — updateMatrices (tent sampling + M assembly) and
# the fused window-blur+flow-solve, n_iters times per level — dominates the
# solve (scripts/fb_breakdown.json: 2.23 of 2.91 ms at 512^2).  Both of its
# validated kernels take CALLER-padded fields and do valid-only work
# (ops/pallas/tent_sample.py:tent_sample_channel_call,
# blur5_flow.py:blur5_flow_call), so they compose into shard_map with
# exchange_halo supplying the padding and ZERO kernel changes:
#
#   * R1 is iteration-INVARIANT: its (R, R+1)-row sampling apron is
#     exchanged once per level, not per iteration;
#   * the flow fields feeding the tent contraction are per-pixel local —
#     updateMatrices needs NO per-iteration collective at all;
#   * only the blurred M needs fresh halos: one (half = windowSize//2)-row
#     exchange per iteration, the collective schedule the reference's
#     whole-image blur implies (ref: src/optical_flow_farneback.cl:198-253);
#   * the M assembly's inside-mask and border-attenuation ramp take global
#     row coordinates (models.farneback.assemble_m row0/img_rows).
#
# Pyramid glue (bit-exact blur, PIL-BILINEAR resize, polynomial expansion)
# stays outside the shard_map — GSPMD partitions those dense separable ops
# well; the kernels the partitioner CANNOT handle are exactly the loop ones.
# Ref: src/optical_flow_farneback.cl:198-429 (the kernels whose TPU
# replacements this keeps in multi-chip runs).

def fb_shard_supported(mesh, shape, window_size: int, R: int = 5,
                       interpret: bool = False) -> bool:
    """Can the rows-sharded Farneback iteration run for a level of ``shape``
    on ``mesh``?  Registry-gated; per-level graceful fallback otherwise."""
    from opticalflow_ri_tpu.ops.pallas.validated import is_validated

    if not (is_validated("um_channel") and is_validated("blur5")):
        return False
    my = mesh.shape["y"]
    h, w = shape[-2], shape[-1]
    if h % my:
        return False
    h_loc = h // my
    half = window_size // 2
    # the blur halo needs half (+1 for the mirror rule's edge exclusion)
    # rows from each neighbour; the sampler halo needs R+1
    if my > 1 and h_loc < max(half + 1, R + 1):
        return False  # halo would exceed the neighbour tile extent
    if interpret:
        return True
    from opticalflow_ri_tpu.ops.pallas.blur5_flow import blur5_flow_supports_pallas
    from opticalflow_ri_tpu.ops.pallas.tent_sample import (
        update_matrices_channel_supports_pallas,
    )

    return (update_matrices_channel_supports_pallas((5, h_loc, w), R)
            and blur5_flow_supports_pallas((5, h_loc, w), window_size))


def _fb_iter_body(r0, r1, fx, fy, *, taps, mode, post_scale, n_iters, R,
                  h_glob, interpret):
    from opticalflow_ri_tpu.models import farneback as fb
    from opticalflow_ri_tpu.ops.padding import pad2d
    from opticalflow_ri_tpu.ops.pallas.blur5_flow import blur5_flow_call
    from opticalflow_ri_tpu.ops.pallas.tent_sample import (
        tent_sample_channel_call,
    )
    from opticalflow_ri_tpu.ops.pallas.validated import is_validated

    # in-solve flow sequences skip most shifts (the um_sparse win);
    # registry-gated like every kernel choice
    sparse = is_validated("um_channel_sparse")

    _, h_loc, w = r0.shape
    row0 = lax.axis_index("y") * h_loc
    half = len(taps) // 2
    ph, pw = (-h_loc) % 8, (-w) % 128
    rp, cp = h_loc + ph, w + pw

    # R1 sampling apron: once per level (iteration-invariant)
    r1p = exchange_halo(r1, ((R, R + 1), (0, 0)), "nearest")
    r1p = jnp.pad(r1p, ((0, 0), (0, 0), (R, R + 1)), mode="edge")
    r1p = jnp.pad(r1p, ((0, 0), (0, ph), (0, pw)))

    ys = (lax.broadcasted_iota(jnp.float32, (h_loc, w), 0)
          + row0.astype(jnp.float32))
    xs = lax.broadcasted_iota(jnp.float32, (h_loc, w), 1)

    def um(fx, fy):
        fxp = jnp.pad(fx, ((0, ph), (0, pw)))
        fyp = jnp.pad(fy, ((0, ph), (0, pw)))
        s = tent_sample_channel_call(r1p, fxp, fyp, R, interpret=interpret,
                                     sparse=sparse)[:, :h_loc, :w]
        x1i = jnp.floor(xs + fx)
        y1i = jnp.floor(ys + fy)
        inside = ((x1i >= 0) & (y1i >= 0)
                  & (x1i < w - 1) & (y1i < h_glob - 1))
        return fb.assemble_m(s, r0, fx, fy, inside, row0=row0,
                             img_rows=h_glob)

    def blur_flow(m):
        mp = exchange_halo(m, ((half, half), (0, 0)), mode)
        mp = pad2d(mp, ((0, 0), (half, half)), mode)
        mp = jnp.pad(mp, ((0, 0), (0, ph), (0, pw)))
        fxn, fyn = blur5_flow_call(mp, taps, rp, cp, post_scale,
                                   interpret=interpret)
        return fxn[:h_loc, :w], fyn[:h_loc, :w]

    m = um(fx.astype(jnp.float32), fy.astype(jnp.float32))
    for i in range(n_iters):
        fx, fy = blur_flow(m)
        if i < n_iters - 1:
            m = um(fx, fy)
    return fx, fy


@partial(jax.jit,
         static_argnames=("mesh", "taps", "mode", "post_scale", "n_iters",
                          "R", "h_glob", "interpret"))
def _fb_iter_run(mesh, r0, r1, fx, fy, taps, mode, post_scale, n_iters, R,
                 h_glob, interpret):
    spec3 = P(None, "y", None)
    spec2 = P("y", None)
    f = shard_map(
        partial(_fb_iter_body, taps=taps, mode=mode, post_scale=post_scale,
                n_iters=n_iters, R=R, h_glob=h_glob, interpret=interpret),
        mesh=mesh,
        in_specs=(spec3, spec3, spec2, spec2),
        out_specs=(spec2, spec2),
        check_vma=False,
    )
    return f(r0.astype(jnp.float32), r1.astype(jnp.float32),
             fx.astype(jnp.float32), fy.astype(jnp.float32))


def farneback_iterate_sharded(mesh, r0, r1, fx, fy, window_size: int,
                              use_gaussian: bool, n_iters: int, R: int = 5,
                              interpret: bool = False):
    """One Farneback level's iteration loop, rows-sharded with per-device
    validated kernels (see the section comment); same numerics contract as
    the single-device loop in models.farneback.farneback_solve."""
    from opticalflow_ri_tpu.models.farneback import _window_blur_spec

    k, mode, post_scale = _window_blur_spec(window_size, use_gaussian)
    return _fb_iter_run(mesh, r0, r1, fx, fy,
                        tuple(float(x) for x in k), mode, float(post_scale),
                        int(n_iters), int(R), int(r0.shape[-2]),
                        bool(interpret))


def farneback_solve_sharded(mesh, im1, im2, u0, v0, window_size=33,
                            n_iters=5, poly_n=7, poly_sigma=1.5,
                            use_gaussian=True, pyr_scale=0.5, pyr_levels=1,
                            sample_max_shift: int = 5,
                            interpret: bool = False):
    """Whole Farneback pipeline with the per-level iteration loop
    rows-sharded (validated kernels per device); pyramid glue stays dense
    XLA for GSPMD.  Levels whose shape the mesh cannot tile fall back to the
    XLA loop — parity with models.farneback.farneback_solve either way."""
    from opticalflow_ri_tpu.models import farneback as fb

    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    u0 = u0.astype(jnp.float32)
    v0 = v0.astype(jnp.float32)
    rows, cols = im1.shape
    plan = fb._level_plan(rows, cols, pyr_scale, pyr_levels - 1)
    R = int(sample_max_shift)

    prev = None
    for lvl in plan:
        h, w = lvl["height"], lvl["width"]
        if prev is None:
            fx = fb.pil_resize(u0, (h, w), "bilinear") * jnp.float32(lvl["scale"])
            fy = fb.pil_resize(v0, (h, w), "bilinear") * jnp.float32(lvl["scale"])
        else:
            fx = fb.pil_resize(prev[0], (h, w), "bilinear") * jnp.float32(1.0 / pyr_scale)
            fy = fb.pil_resize(prev[1], (h, w), "bilinear") * jnp.float32(1.0 / pyr_scale)

        ra = fb.poly_expansion(
            fb.pil_resize(fb.gaussian_blur(im1, lvl["smooth"], lvl["sigma"]),
                          (h, w), "bilinear"),
            poly_n, poly_sigma,
        )
        rb = fb.poly_expansion(
            fb.pil_resize(fb.gaussian_blur(im2, lvl["smooth"], lvl["sigma"]),
                          (h, w), "bilinear"),
            poly_n, poly_sigma,
        )

        if fb_shard_supported(mesh, (h, w), window_size, R, interpret):
            fx, fy = farneback_iterate_sharded(
                mesh, ra, rb, fx, fy, window_size, use_gaussian, n_iters,
                R, interpret)
        else:
            m = fb.update_matrices(fx, fy, ra, rb, R)
            for i in range(n_iters):
                if use_gaussian:
                    mb = fb.gaussian_blur5(m, window_size,
                                           window_size / 2 * 0.3)
                else:
                    mb = fb.box_filter5(m, window_size // 2)
                fx, fy = fb.update_flow(mb)
                if i < n_iters - 1:
                    m = fb.update_matrices(fx, fy, ra, rb, R)
        prev = (fx, fy)

    return prev


# ---------------------------------------------------------------------------
# Dense Lucas-Kanade (rows-only decomposition)
# ---------------------------------------------------------------------------
#
# LK is the easy case for sharding: given the halo-extended images, every
# output pixel's Gauss-Newton iteration is independent (the shift planes and
# structure tensor are iteration-INVARIANT windowed sums), so the whole solve
# needs exactly ONE halo exchange — the (GRID + R + 1)-row image apron — and
# zero per-iteration collectives.  Each device then runs the validated
# build+GN kernel pair (ops/pallas/lk_build.py, lk_iter.py) on its local row
# block, stripe-staged exactly like the single-chip large-image path; the GN
# kernel's row0/img_h globals keep the out-of-bounds bail and window-origin
# tracking in global coordinates.  Ref: src/pyrlkDenseLargeW.cl:304-669 (the
# per-pixel kernel whose TPU replacement this keeps in multi-chip runs).

_LK_GRID = 32  # the CL kernel's 32-sample window grid


def _lk_halo(hw: int, R: int) -> int:
    """Image apron rows each side: window offsets span [-hw, GRID-1-hw],
    shifts [-R, R], gradients +-1 (matches models.lucas_kanade's pad)."""
    return _LK_GRID + R + 1


def pick_lk_shard_stripe(mesh, shape, half_window: int = 13,
                         max_shift: int = 5,
                         interpret: bool = False) -> int | None:
    """Stripe height for a rows-sharded kernel LK solve of ``shape`` on
    ``mesh`` (None -> caller falls back to the GSPMD/XLA path).  Gated on
    the hardware-validated registry like every kernel dispatch."""
    from opticalflow_ri_tpu.ops.pallas.validated import is_validated

    if not (is_validated("lk_build") and is_validated("lk_gn")):
        return None
    my = mesh.shape["y"]
    h, w = shape[-2], shape[-1]
    if h % my:
        return None
    h_loc = h // my
    if my > 1 and h_loc < _lk_halo(half_window, max_shift):
        return None  # halo would exceed the neighbour tile extent
    if interpret:
        return h_loc
    from opticalflow_ri_tpu.ops.pallas.lk_build import (
        lk_build_supports_pallas, lk_striped_height,
    )
    from opticalflow_ri_tpu.ops.pallas.lk_iter import lk_gn_supports_pallas

    if not lk_gn_supports_pallas(h_loc, w, max_shift):
        return None
    if lk_build_supports_pallas(h_loc, w, max_shift):
        return h_loc
    if is_validated("lk_striped"):
        return lk_striped_height(h_loc, w, max_shift)
    return None


def _lk_body_shardkernel(im1, im2, u0, v0, *, hw, n_iter, R, asym, stripe,
                         interpret):
    from opticalflow_ri_tpu.models import lucas_kanade as lk
    from opticalflow_ri_tpu.oracle.lucas_kanade import window_mask
    from opticalflow_ri_tpu.ops.window_sums import runs_from_mask
    from opticalflow_ri_tpu.ops.pallas.lk_build import lk_build_planes_pallas
    from opticalflow_ri_tpu.ops.pallas.lk_iter import lk_gn_iterate_pallas

    h_loc, w = im1.shape[-2], im1.shape[-1]
    p = lax.axis_size("y")
    row0 = lax.axis_index("y") * h_loc
    h_glob = h_loc * p

    win = 2 * hw + 1
    runs_x = runs_from_mask(window_mask(win, asym[0], asym[1]))
    runs_y = runs_from_mask(window_mask(win, asym[2], asym[3]))

    pad = _lk_halo(hw, R)

    def pad_full(z):
        # y apron: real neighbour rows (interior) / replicate (global border
        # == the single-device jnp.pad edge); x spans the full width, so
        # plain edge padding IS the global rule
        zy = exchange_halo(z, ((pad, pad), (0, 0)), "nearest")
        return jnp.pad(zy, ((0, 0), (pad, pad)), mode="edge")

    ipad = pad_full(im1.astype(jnp.float32))
    jpad = pad_full(im2.astype(jnp.float32))
    g_pair, slab, ia11, ia12, ia22, c1, c2, ok = lk.lk_solve_fields(
        ipad, jpad, hw, R, runs_y, runs_x, h_loc, w
    )

    jj = lax.broadcasted_iota(jnp.float32, (h_loc, w), 1)
    ii = (lax.broadcasted_iota(jnp.float32, (h_loc, w), 0)
          + row0.astype(jnp.float32))
    u0 = u0.astype(jnp.float32)
    v0 = v0.astype(jnp.float32)
    px0 = jj + u0 - hw
    py0 = ii + v0 - hw

    core_w = w + _LK_GRID - 1
    parts = []
    for s0 in range(0, h_loc, stripe):
        sh = min(stripe, h_loc - s0)
        slab_s = lax.dynamic_slice(
            slab, (s0, 0), (sh + _LK_GRID - 1 + 2 * R, slab.shape[1]))
        g_s = lax.dynamic_slice(
            g_pair, (0, s0, 0), (2, sh + _LK_GRID - 1, core_w))
        t1s, t2s = lk_build_planes_pallas(slab_s, g_s, hw, R, runs_y, runs_x,
                                          interpret=interpret)
        sl = slice(s0, s0 + sh)
        parts.append(lk_gn_iterate_pallas(
            t1s, t2s, ia11[sl], ia12[sl], ia22[sl], c1[sl], c2[sl],
            ok[sl], px0[sl], py0[sl], n_iter, R, hw,
            row0=row0 + s0, img_h=h_glob, img_w=w, interpret=interpret,
        ))
    if len(parts) == 1:
        px, py, status = parts[0]
    else:
        px = jnp.concatenate([q[0] for q in parts], axis=0)
        py = jnp.concatenate([q[1] for q in parts], axis=0)
        status = jnp.concatenate([q[2] for q in parts], axis=0)

    u = jnp.where(ok, px + hw - jj, u0)
    v = jnp.where(ok, py + hw - ii, v0)
    status = jnp.where(ok, status, 0.0)
    return u, v, status


@partial(jax.jit,
         static_argnames=("mesh", "hw", "n_iter", "R", "asym", "stripe",
                          "interpret"))
def _lk_kernel_run(mesh, im1, im2, u0, v0, hw, n_iter, R, asym, stripe,
                   interpret):
    spec = P("y", None)
    f = shard_map(
        partial(_lk_body_shardkernel, hw=hw, n_iter=n_iter, R=R, asym=asym,
                stripe=stripe, interpret=interpret),
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )
    return f(
        im1.astype(jnp.float32), im2.astype(jnp.float32),
        u0.astype(jnp.float32), v0.astype(jnp.float32),
    )


def lk_solve_sharded_kernel(mesh, im1, im2, u0, v0, half_window: int = 13,
                            n_iter: int = 5, asym=(0, 0, 0, 0),
                            max_shift: int = 5, interpret: bool = False):
    """Rows-sharded dense LK running the validated build+GN Pallas kernels
    per device; same contract as models.lucas_kanade.lk_dense_solve
    (returns (u, v, status))."""
    stripe = pick_lk_shard_stripe(mesh, im1.shape, half_window, max_shift,
                                  interpret)
    if stripe is None:
        raise ValueError(
            f"lk kernel-sharded path unsupported for shape "
            f"{tuple(im1.shape)} on mesh y={mesh.shape['y']}")
    return _lk_kernel_run(mesh, im1, im2, u0, v0, int(half_window),
                          int(n_iter), int(max_shift), tuple(asym),
                          int(stripe), bool(interpret))


def liu_shen_solve_sharded_kernel(mesh, im1, im2, h_reg, u0, v0,
                                  max_iter: int = 60, tol: float = 1e-8,
                                  t_block: int = 20, interpret: bool = False):
    """Rows-sharded Liu-Shen running the validated ls_tiled kernel per device
    (internal component convention, like sharded.liu_shen_solve_sharded)."""
    from opticalflow_ri_tpu.ops.pallas.ls_tiled import ls_stripe_height

    my = mesh.shape["y"]
    h_loc = im1.shape[-2] // my
    w = im1.shape[-1]
    if not ls_shard_kernel_supported(h_loc, w, t_block, interpret):
        raise ValueError(
            f"ls kernel-sharded path unsupported for local tile "
            f"({h_loc}, {w}), t_block {t_block}")
    bh = ls_stripe_height(h_loc, w, t_block)
    return _ls_kernel_run(mesh, im1, im2, u0, v0, float(h_reg),
                          int(max_iter), float(tol), int(t_block), bh,
                          bool(interpret))
