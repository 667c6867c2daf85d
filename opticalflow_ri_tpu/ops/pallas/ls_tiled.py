"""Temporal-blocked tiled Liu-Shen fixed-point kernel for large images.

The whole-state kernel (liu_shen_iter.py) needs all ten persistent fields in
VMEM, which caps it at ~512^2.  Beyond that the XLA while_loop streams the
fields through HBM on every iteration — measured 2.5x off the HBM roofline at
2048^2 (scripts/ls_size_scaling.json), and temporal blocking goes *below*
that roofline because the fields are read once per T iterations instead of
once per iteration.

Same stripe scheme as hs_tiled.py: T iterations per launch on full-width
y-stripes with a T-deep halo DMAed from HBM; halo values go stale one row per
iteration and never cross into the output region.  Unlike Horn-Schunck
(mirror border, which self-evolves under a mirror-padded extension) Liu-Shen
mixes two border rules — 'nearest' (replicate) for the derivative stencils
and zero padding for the 8-neighbour ring term
(ref: src/PhysicsBasedOpticalFlowLiuShen.py:116-121,:144 via the kernels in
models/liu_shen.py) — so the kernel applies the exact global rules in-kernel:

  * x borders are global on every stripe (stripes span the full width):
    roll-based shifts with per-column fixes (replicate or zero);
  * y borders: an in-image row mask zeroes pad rows for the ring term, and
    the 'nearest' stencils read a maintained extension where out-of-image
    rows are overwritten with the nearest image row each iteration — for the
    top/bottom stripes those masks select real pad rows, for interior
    stripes they select nothing (their halo is real neighbour data).

Convergence semantics: the reference checks ``err > tol`` after every
iteration; one launch runs T iterations, so the caller checks the (exact,
globally-reduced) error of each block's LAST iteration and can overrun the
reference's stopping point by at most T-1 iterations — each of which moves
the solution by less than the already-met tolerance.  Parity with the XLA
path is exact for tol=0 (fixed trip count); the dispatch default only uses
this path for shapes the whole-state kernel cannot hold.

Error plumbing: the kernel outputs BOTH the last state (u_T, v_T) and the
second-to-last (u_{T-1}, v_{T-1}) through the standard blocked-VMEM output
pipeline — the exact output pattern hs_tiled.py proved on hardware — and the
caller reduces the reference error metric ||u_T - u_{T-1}||_F in one XLA
pass.  (The first cut wrote per-stripe error partials through a blocked
(1, 2) SMEM output spec, which Mosaic refuses to lower — block dims must
divide the native tile or equal the array dims — so every LiuSE config
crashed on hardware; see VERDICT.md round 2.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# T=16 measured consistently faster than 20 on hardware (1024^2: 2.81 vs
# 3.00 ms, 2048^2: 9.86 vs 10.5 — scripts/round4_tuning.json,
# hs_ls_limiter.json; the kernel is VPU-bound, and lower T trims the halo
# redundancy) and checks the tolerance closer to the reference's
# per-iteration cadence.
DEFAULT_T_BLOCK = 16

# 10 DMA slabs + u/v/u_prev/v_prev carries + ~6 stencil temporaries, (BH+2T, W)
_N_FIELDS_RESIDENT = 20
_VMEM_BUDGET = 64 * 1024 * 1024


def ls_stripe_height(h: int, w: int, t_block: int) -> int | None:
    # bh >= t_block keeps the above/below-image pad rows confined to the
    # first/last stripe, where the kernel's static replicate-row indices
    # (slab rows pad and pad+bh-1) are the true first/last image rows.
    for bh in (256, 128, 64, 32, 16, 8):
        if h % bh or bh < t_block:
            continue
        buf = (bh + 2 * t_block) * w * 4
        if _N_FIELDS_RESIDENT * buf <= _VMEM_BUDGET:
            return bh
    return None


def ls_tiled_supports_pallas(shape, t_block: int = DEFAULT_T_BLOCK) -> bool:
    h, w = shape[-2], shape[-1]
    return (
        len(shape) == 2
        and h % 8 == 0
        and w % 128 == 0
        and h > t_block  # edge pad + staleness argument need T < H
        and ls_stripe_height(h, w, t_block) is not None
    )


def _ls_tiled_kernel(h_ref,
                     iix_hbm, iiy_hbm, ii_hbm, ixt_hbm, iyt_hbm,
                     b11_hbm, b12_hbm, b22_hbm, u_hbm, v_hbm,
                     u_out, v_out, up_out, vp_out,
                     iix_b, iiy_b, ii_b, ixt_b, iyt_b,
                     b11_b, b12_b, b22_b, u_b, v_b, sems,
                     *, t_iters: int, bh: int, w: int, pad: int,
                     n_stripes: int, img_h: int):
    pid = pl.program_id(0)
    row0 = pid * bh  # stripe slab start in padded coords
    sh = bh + 2 * pad  # slab height

    copies = [
        pltpu.make_async_copy(src.at[pl.ds(row0, sh), :], dst, sems.at[k])
        for k, (src, dst) in enumerate([
            (iix_hbm, iix_b), (iiy_hbm, iiy_b), (ii_hbm, ii_b),
            (ixt_hbm, ixt_b), (iyt_hbm, iyt_b),
            (b11_hbm, b11_b), (b12_hbm, b12_b), (b22_hbm, b22_b),
            (u_hbm, u_b), (v_hbm, v_b),
        ])
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    hreg = h_ref[0, 0]
    # y-border flags (1.0 = the pad rows on that side are synthetic and the
    # global border rules apply; 0.0 = they are REAL neighbour rows from a
    # shard_map halo exchange and must evolve as plain stale-halo data, like
    # hs_tiled's).  Traced scalars so one compiled kernel serves every device
    # position in an SPMD program.
    top_border = h_ref[0, 1]
    bot_border = h_ref[0, 2]
    iix = iix_b[:]
    iiy = iiy_b[:]
    ii = ii_b[:]
    ixt = ixt_b[:]
    iyt = iyt_b[:]
    b11 = b11_b[:]
    b12 = b12_b[:]
    b22 = b22_b[:]

    # global padded row index of each slab row, and the exact-border masks
    row = (
        lax.broadcasted_iota(jnp.int32, (sh, w), 0) + row0
    )
    col = lax.broadcasted_iota(jnp.int32, (sh, w), 1)
    above = (row < pad).astype(jnp.float32) * top_border   # stripe 0 only
    below = (row >= pad + img_h).astype(jnp.float32) * bot_border  # last stripe
    in_img = 1.0 - above - below
    col_first = (col == 0).astype(jnp.float32)
    col_last = (col == w - 1).astype(jnp.float32)

    one = jnp.float32(1.0)

    def x_east(z, border):
        """z[:, x+1] with the global right-border rule applied."""
        r = jnp.roll(z, -1, axis=1)
        fix = z if border == "nearest" else jnp.zeros_like(z)
        return r * (one - col_last) + fix * col_last

    def x_west(z, border):
        r = jnp.roll(z, 1, axis=1)
        fix = z if border == "nearest" else jnp.zeros_like(z)
        return r * (one - col_first) + fix * col_first

    def body(_, carry):
        u, v, _, _ = carry

        def nearest_ext(z):
            """Out-of-image rows overwritten with the nearest image row each
            iteration — the evolving 'nearest' y-extension.  Slab rows pad
            and pad+bh-1 are the first/last image rows exactly when the
            stripe is the global top/bottom one, which is also the only case
            where the masks select anything."""
            top_row = z[pad : pad + 1, :]
            bot_row = z[pad + bh - 1 : pad + bh, :]
            return (z * in_img + top_row * above + bot_row * below)

        def stencils(z):
            ze = nearest_ext(z)
            n1 = jnp.roll(ze, 1, axis=0)   # y-1 neighbour (slab wraparound
            s1 = jnp.roll(ze, -1, axis=0)  # rows live in the stale halo)
            e1 = x_east(ze, "nearest")
            w1 = x_west(ze, "nearest")
            d1 = (s1 - n1) * jnp.float32(0.5)
            d2 = (e1 - w1) * jnp.float32(0.5)
            f1 = n1 + s1
            f2 = w1 + e1
            rd = e1 - w1
            m = (jnp.roll(rd, -1, axis=0) - jnp.roll(rd, 1, axis=0)) * jnp.float32(0.25)
            return d1, d2, f1, f2, m

        def ring_zero(z):
            z0 = z * in_img  # zero padding in y is exact for every stripe
            p = jnp.roll(z0, 1, axis=0) + z0 + jnp.roll(z0, -1, axis=0)
            return x_west(p, "zero") + p + x_east(p, "zero") - z0

        du1, du2, fu1, _, mu = stencils(u)
        dv1, dv2, _, fv2, mv = stencils(v)
        bu = (iix * (2.0 * du1 + dv2) + iiy * dv1 + ii * (fu1 + mv)
              + hreg * ring_zero(u) + ixt)
        bv = (iiy * (du1 + 2.0 * dv2) + iix * du2 + ii * (mu + fv2)
              + hreg * ring_zero(v) + iyt)
        u_new = -(b11 * bu + b12 * bv)
        v_new = -(b12 * bu + b22 * bv)
        # carry the pre-update state too: the caller's error metric needs
        # (u_T - u_{T-1}) and scalar outputs do not lower (module doc)
        return (u_new, v_new, u, v)

    u, v, u_prev, v_prev = lax.fori_loop(
        0, t_iters, body, (u_b[:], v_b[:], u_b[:], v_b[:])
    )
    u_out[:] = u[pad : pad + bh, :]
    v_out[:] = v[pad : pad + bh, :]
    up_out[:] = u_prev[pad : pad + bh, :]
    vp_out[:] = v_prev[pad : pad + bh, :]


def _launch(h_arr, fields_p, up, vp, t_iters: int, bh: int, pad: int,
            interpret: bool):
    hp, w = up.shape
    img_h = hp - 2 * pad
    n_stripes = img_h // bh
    buf = lambda: pltpu.VMEM((bh + 2 * pad, w), jnp.float32)
    out_spec = pl.BlockSpec((bh, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=int(t_iters) * 60 * hp * w,
            bytes_accessed=14 * hp * w * 4,
            transcendentals=0,
        )
    field = lambda: jax.ShapeDtypeStruct((img_h, w), jnp.float32)
    return pl.pallas_call(
        partial(_ls_tiled_kernel, t_iters=t_iters, bh=bh, w=w, pad=pad,
                n_stripes=n_stripes, img_h=img_h),
        grid=(n_stripes,),
        out_shape=(field(), field(), field(), field()),
        in_specs=[pl.BlockSpec((1, 3), memory_space=pltpu.SMEM)] + [hbm] * 10,
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        scratch_shapes=[buf() for _ in range(10)] + [pltpu.SemaphoreType.DMA((10,))],
        interpret=interpret,
        **kwargs,
    )(h_arr, *fields_p, up, vp)


@partial(jax.jit, static_argnames=("max_iter", "tol", "t_block", "bh",
                                   "interpret"))
def liu_shen_iterate_pallas_tiled(h_reg, fields, u0, v0, max_iter: int = 60,
                                  tol: float = 1e-8,
                                  t_block: int = DEFAULT_T_BLOCK,
                                  bh: int | None = None,
                                  interpret: bool = False):
    """Temporal-blocked Liu-Shen solve on precomputed fields; same
    (h, fields, u0, v0) -> (u, v, err) contract as liu_shen_iterate_pallas.
    ``err`` is the reference error metric of the last executed iteration;
    the tolerance is tested every ``t_block`` iterations (see module doc)."""
    iix = fields[0]
    h, w = iix.shape
    if bh is None:
        bh = ls_stripe_height(h, w, t_block)
    if bh is None:
        raise ValueError(f"no stripe height fits VMEM for shape {(h, w)}")
    if bh < t_block or h % bh:
        raise ValueError(f"stripe height {bh} invalid for shape {(h, w)}, "
                         f"t_block {t_block}")
    npix = jnp.float32(h * w)
    # single-device solve: both y borders are global (flags 1.0) — identical
    # masks to the pre-flag kernel
    h_arr = jnp.stack([
        jnp.asarray(h_reg, jnp.float32),
        jnp.float32(1.0), jnp.float32(1.0),
    ]).reshape(1, 3)

    pad_y = lambda z: jnp.pad(z.astype(jnp.float32), ((t_block, t_block), (0, 0)),
                              mode="edge")
    fields_p = tuple(pad_y(f) for f in fields)

    def block(u, v, t):
        u2, v2, u2p, v2p = _launch(h_arr, fields_p, pad_y(u), pad_y(v), t, bh,
                                   t_block, interpret)
        # reference error metric of the block's last iteration (ref:
        # src/PhysicsBasedOpticalFlowLiuShen.py:75-80): Frobenius norms of the
        # last update, reduced globally in one fused XLA pass
        err = (jnp.sqrt(jnp.sum((u2 - u2p) ** 2))
               + jnp.sqrt(jnp.sum((v2 - v2p) ** 2))) / npix
        return u2, v2, err

    u = u0.astype(jnp.float32)
    v = v0.astype(jnp.float32)

    n_full, rem = divmod(max_iter, t_block)

    def cond(state):
        _, _, err, k = state
        return jnp.logical_and(err > tol, k < n_full)

    def body(state):
        u, v, _, k = state
        u, v, err = block(u, v, t_block)
        return (u, v, err, k + 1)

    u, v, err, k_blocks = lax.while_loop(
        cond, body, (u, v, jnp.float32(1e8), 0)
    )
    if rem:
        # the tail block only runs if the tolerance is still unmet
        ur, vr, er = block(u, v, rem)
        run_tail = jnp.logical_and(err > tol, k_blocks == n_full)
        u = jnp.where(run_tail, ur, u)
        v = jnp.where(run_tail, vr, v)
        err = jnp.where(run_tail, er, err)
    err = jnp.where(jnp.logical_or(k_blocks > 0, jnp.float32(rem) > 0), err,
                    jnp.float32(0.0))
    return u, v, err
