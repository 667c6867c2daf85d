"""Dense-LK shift-plane build as a Pallas TPU kernel.

The XLA build (models/lucas_kanade.py:lk_build_planes) streams one
window-sum pass per (row-shift, col-shift) pair over the full image:
2*(2R+1)^2 hierarchical passes whose intermediates (the sqrt-L base boxes
and the x-pass results) round-trip HBM between the XLA fusions.  This
kernel computes the same planes band-resident: for one row shift sy and one
row band, the J slice, both gradient products, and every window-sum
intermediate live in VMEM; only the finished (nshift^2, H, W) plane stacks
are written to HBM — once, in exactly the sy-major/sx-minor layout the
band-resident GN kernel (lk_iter.py) consumes.

Grid = (nshift, n_bands) with bands innermost: the sy-shifted slab block is
re-fetched only when sy changes (nshift DMAs of ~1 MB), and the gradient
stack stays resident for the whole launch.  The row shift is applied on the
XLA side by stacking the 2R+1 row-shifted copies of the J slab
(``slab_stack``): a dynamic ``sy`` offset inside the kernel would break
Mosaic's 8-aligned sublane-offset rule, while the stacked copy turns it
into a BlockSpec index — the ~13 MB copy costs ~30 us of HBM traffic.

Summation order matches the XLA build exactly for the same ``mode`` (same
windowed_sum_axis decomposition, x-axis pass then y-axis pass) — the
hardware parity stage measures max_abs_diff 0.0 (bit-identical).

Ref parity anchor: the planes feed the Gauss-Newton solve of
src/pyrlkDenseLargeW.cl:304-669 (see models/lucas_kanade.py docstring).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow_ri_tpu.ops.window_sums import windowed_sum_axis

_GRID = 32  # the CL kernel's 32-sample window grid
_EXT = _GRID - 1


def _lk_build_kernel(slab_ref, g_ref, *outs, nshift: int,
                     hw: int, h: int, w: int, band: int,
                     runs_y: tuple, runs_x: tuple, mode):
    i = pl.program_id(1)
    y0 = i * band
    core_w = w + _EXT

    jband = slab_ref[0, pl.ds(y0, band + _EXT), :]
    gs = [g_ref[k, pl.ds(y0, band + _EXT), :] for k in range(len(outs))]

    for sx in range(nshift):
        js = jband[:, sx : sx + core_w]
        for g, out in zip(gs, outs):
            xs = windowed_sum_axis(js * g, runs_x, hw, 1, w,
                                   hierarchical=mode)
            out[sx] = windowed_sum_axis(xs, runs_y, hw, 0, band,
                                        hierarchical=mode)


def _build_band(h: int, w: int, nshift: int, ng: int = 2) -> int | None:
    """Largest band dividing h whose output blocks + intermediates fit the
    VMEM budget.  Bigger bands win: the x-pass recomputes a 31-row halo per
    band, so band=512 pays 6% redundant work where band=64 pays 48% — the
    v5e sweep (scripts/lk_build_band_sweep.json) measured 1.31 ms at
    band 512 vs 2.92 ms at band 64 for the 512^2 ladder build.

    ``ng``: gradient stacks emitted per launch.  ng=1 (the round-5 split
    build: one pallas_call per gradient) halves the double-buffered output
    term, admitting band 256 at (512, 2048) stripes where ng=2 is forced
    down to 128 — 12% x-pass halo recompute instead of 24%."""
    core_h, core_w = h + _EXT, w + _EXT
    for band in (h, 512, 256, 128, 64, 32, 16, 8):
        if band > h or h % band:
            continue
        # Scoped-vmem model calibrated against hardware OOM reports
        # (112 M limit): 1024^2 band-512 needs 113.4 M and 2048^2 band-128
        # needs 113.1 M (both OOM); 512^2 band-512 and 1024^2 band-256
        # compile and run.  Double-buffered outputs + slab + gradients +
        # ~12 live band-row intermediates.
        total = (2 * (ng * nshift * band * w * 4)
                 + core_h * (core_w + nshift - 1) * 4
                 + ng * core_h * core_w * 4
                 + 12 * (band + _EXT) * core_w * 4)
        if total <= 96 * 1024 * 1024:
            return band
    return None


def lk_striped_height(h: int, w: int, max_shift: int) -> int | None:
    """Stripe height for the stripe-staged build+GN path (large images whose
    whole-image plane stack would be GBs of HBM): the build kernel runs per
    row stripe with an efficient internal band (>= 128 — below that the
    x-pass halo recompute loses to XLA, lk_build_band_sweep), the GN kernel
    consumes each stripe's stack, and only one stripe's stack (~0.5 GB at
    2048^2) ever exists in HBM.  Prefers the tallest stripe (fewer launches,
    lower across-stripe slab re-read)."""
    nshift = 2 * max_shift + 1
    for stripe in (512, 256, 128):
        if h % stripe:
            continue
        band = _build_band(stripe, w, nshift)
        if band is not None and band >= 128:
            return stripe
    return None


def lk_build_supports_pallas(h: int, w: int, max_shift: int) -> bool:
    """Bands must tile h; the slab block, gradient stack, output blocks and
    band intermediates must fit VMEM together."""
    if h % 8 != 0:
        return False
    nshift = 2 * max_shift + 1
    # below band 128 the x-pass halo recompute loses to the XLA streamed
    # build (band-64 measured 0.885x XLA at 512^2, lk_build_band_sweep)
    band = _build_band(h, w, nshift)
    return band is not None and band >= 128


def _build_call(slab_stack, g, band, nshift, hw, h, w, core_h, core_w,
                runs_y, runs_x, mode, interpret):
    """One build launch emitting len(g) plane stacks at row band ``band``."""
    ng = g.shape[0]
    kern = partial(_lk_build_kernel, nshift=nshift, hw=hw, h=h, w=w,
                   band=band, runs_y=tuple(runs_y), runs_x=tuple(runs_x),
                   mode=mode)
    out = pl.pallas_call(
        kern,
        out_shape=tuple(
            jax.ShapeDtypeStruct((nshift * nshift, h, w), jnp.float32)
            for _ in range(ng)
        ),
        grid=(nshift, h // band),
        in_specs=[
            pl.BlockSpec((1, core_h, slab_stack.shape[2]),
                         lambda sy, i: (sy, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, core_h, core_w),
                         lambda sy, i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((nshift, band, w), lambda sy, i: (sy, i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(ng)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=ng * nshift * nshift * h * w * 24,
            bytes_accessed=(slab_stack.size + g.size
                            + ng * nshift * nshift * h * w) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(slab_stack, g.astype(jnp.float32))
    return out


def lk_build_split_engages(h: int, w: int, max_shift: int) -> bool:
    """True when the per-gradient split build admits a strictly larger band
    than the fused two-stack build — less x-pass halo recompute wins
    (registry-gated at the dispatch site as 'lk_build_split')."""
    nshift = 2 * max_shift + 1
    b2 = _build_band(h, w, nshift, ng=2)
    b1 = _build_band(h, w, nshift, ng=1)
    return b1 is not None and (b2 is None or b1 > b2)


@partial(jax.jit, static_argnames=("hw", "R", "runs_y", "runs_x", "band",
                                   "mode", "interpret", "split_g"))
def lk_build_planes_pallas(slab, g_pair, hw: int, R: int, runs_y: tuple,
                           runs_x: tuple, band: int | None = None,
                           mode="ladder", interpret: bool = False,
                           split_g: str = "auto"):
    """Shift-plane stacks T1/T2 of shape ((2R+1)^2, h, w), sy-major.

    ``slab`` is the replicate-padded J image covering rows/cols
    [-(hw+R), {h,w}-1 + (GRID-1-hw) + R] relative to the pixel grid;
    ``g_pair`` the (2, h+GRID-1, w+GRID-1) gradient stack over window
    offsets [-hw, GRID-1-hw] (see models/lucas_kanade.py).

    ``split_g``: "auto" issues TWO per-gradient launches when that admits a
    strictly larger band (half the double-buffered output VMEM; the slab
    stack is re-read from HBM, ~30 us — the x-pass halo recompute saved is
    VPU time, the binding resource) and the registry lists
    'lk_build_split'; "never"/"always" pin it for A/B runs.
    """
    nshift = 2 * R + 1
    _, core_h, core_w = g_pair.shape
    h, w = core_h - _EXT, core_w - _EXT

    use_split = False
    if split_g == "always":
        use_split = True
    elif split_g == "auto" and band is None:
        from opticalflow_ri_tpu.ops.pallas.validated import is_validated

        use_split = (is_validated("lk_build_split")
                     and lk_build_split_engages(h, w, R))

    if band is None:
        band = _build_band(h, w, nshift, ng=1 if use_split else 2)
    if band is None or h % band:
        raise ValueError(
            f"lk_build_planes_pallas: no VMEM-feasible band divides h={h} "
            f"for shape ({h}, {w}) with {nshift}^2 shifts — use the XLA "
            f"build (lk_build_planes) for this shape"
        )

    # 2R+1 row-shifted slab views, stacked: turns the kernel's row shift
    # into a BlockSpec index (dynamic sublane offsets must be 8-aligned).
    slab_stack = jnp.stack(
        [jax.lax.dynamic_slice(slab, (sy, 0), (core_h, slab.shape[1]))
         for sy in range(nshift)]
    ).astype(jnp.float32)

    args = (band, nshift, hw, h, w, core_h, core_w, runs_y, runs_x, mode,
            interpret)
    if use_split:
        (t1s,) = _build_call(slab_stack, g_pair[0:1], *args)
        (t2s,) = _build_call(slab_stack, g_pair[1:2], *args)
    else:
        t1s, t2s = _build_call(slab_stack, g_pair, *args)
    return t1s, t2s
