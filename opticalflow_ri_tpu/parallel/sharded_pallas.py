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
