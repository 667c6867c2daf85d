"""Farneback polynomial-expansion optical flow, TPU-native.

Re-design of the reference's OpenCL port (ref: src/Farneback_PyCL.py +
src/optical_flow_farneback.cl) as ONE jitted XLA program per
(image shape, config): the reference round-trips every buffer host<->device on
every sub-step (ref: src/Farneback_PyCL.py:226-235 and friends, ~20
full-image copies per iteration); here the entire internal pyramid — blurs,
polynomial expansions, matrix updates, flow solves — is traced once and fused
by XLA, with data resident in HBM/VMEM throughout.

Mapping of the five device kernels (SURVEY.md section 2.2):
  * polynomialExpansion -> separable g/xg/xxg correlations (replicate border)
    + Gram-inverse combination (kernels :72-133);
  * gaussianBlur / gaussianBlur5 -> separable correlations, reflect-101
    border (:135-253); boxFilter5 -> separable box sums, replicate (:350-406);
  * updateMatrices -> 4-tap bilinear gather of R1 at the flow-displaced
    position + border-ramp attenuation (:254-348);
  * updateFlow -> fused elementwise 2x2 solve with +1e-3 regulariser
    (:408-429).

Plane layout is (5, H, W): leading channel dim keeps the W axis on the VPU
lanes (the reference stacks 5 row-blocks in one matrix, an OpenCL-ism).

The host-side pyramid logic (level sizing, PIL-BILINEAR flow rescaling, the
bit-exact blur kernels, smoothSize = max(round(5*sigma)|1, 3)) matches
ref: src/Farneback_PyCL.py:462-604; `fastPyramids` stays unimplemented there
and is intentionally not reproduced.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from opticalflow_ri_tpu.ops.stencil import correlate1d
from opticalflow_ri_tpu.ops.resize import pil_resize
from opticalflow_ri_tpu.ops.kernels_bitexact import get_gaussian_kernel_bit_exact

BORDER_RAMP = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472, 1.0], np.float32)


@lru_cache(maxsize=None)
def prepare_poly_gaussian(n: int, sigma: float):
    """g/xg/xxg bases + Gram-inverse constants
    (ref: src/Farneback_PyCL.py:124-172), host-side, cached."""
    if sigma < 1.19209289550781250000000000000000000e-7:
        sigma = n * 0.3
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-x * x / (2 * sigma * sigma))
    g = (g / g.sum()).astype(np.float32)
    xg = (x * g).astype(np.float32)
    xxg = (x * x * g).astype(np.float32)

    G = np.zeros((6, 6), np.float64)
    gd = g.astype(np.float64)
    for yy in range(-n, n + 1):
        for xx in range(-n, n + 1):
            w = gd[yy + n] * gd[xx + n]
            G[0, 0] += w
            G[1, 1] += w * xx * xx
            G[3, 3] += w * xx**4
            G[5, 5] += w * xx * xx * yy * yy
    G[2, 2] = G[0, 3] = G[0, 4] = G[3, 0] = G[4, 0] = G[1, 1]
    G[4, 4] = G[3, 3]
    G[3, 4] = G[4, 3] = G[5, 5]
    inv = np.linalg.inv(G)
    return g, xg, xxg, (
        np.float32(inv[1, 1]), np.float32(inv[0, 3]),
        np.float32(inv[3, 3]), np.float32(inv[5, 5]),
    )


def poly_expansion(src: jnp.ndarray, n: int, sigma: float,
                   impl: str = "auto") -> jnp.ndarray:
    """(H, W) -> (5, H, W) polynomial-expansion field.

    ``impl``: "vpu" pins the shift-add stencil chain, "matmul" pins the MXU
    banded-matmul path (ops/matmul_filter.py), "auto" consults the backend
    policy + validated registry (the 2n+1-tap bases are wide enough for the
    MXU to win at large sizes — hardware A/B stage ``poly_matmul`` in
    scripts/pallas_ab_results.json)."""
    g, xg, xxg, (ig11, ig03, ig33, ig55) = prepare_poly_gaussian(n, float(sigma))

    use_matmul = False
    if impl != "vpu":
        from opticalflow_ri_tpu.ops.matmul_filter import matmul_supports

        if impl == "matmul":
            use_matmul = matmul_supports(src.shape, 2 * n + 1)
        elif impl == "auto":
            from opticalflow_ri_tpu.ops.pallas import pallas_default_on
            from opticalflow_ri_tpu.ops.pallas.validated import is_validated

            # size floor: the MXU win is proven for the large-field class
            # (poly_matmul A/B at 2048^2); small pyramid levels stay on the
            # fused VPU chain
            use_matmul = (
                pallas_default_on() and is_validated("poly_matmul")
                and src.shape[-2] * src.shape[-1] >= 2048 * 2048
                and matmul_supports(src.shape, 2 * n + 1)
            )

    if use_matmul:
        # stacked Toeplitz blocks: each input block is loaded once and
        # contracted against all kernels — 4 passes over HBM instead of 9
        from opticalflow_ri_tpu.ops.matmul_filter import (
            matmul_correlate1d, matmul_correlate1d_multi,
        )

        v = matmul_correlate1d_multi(src, (g, xg, xxg), axis=-2,
                                     mode="nearest")
        ve, vo, vx2 = v[0], v[1], v[2]
        be = matmul_correlate1d_multi(ve, (g, xg, xxg), axis=-1,
                                      mode="nearest")
        b1, b2, b4 = be[0], be[1], be[2]
        bo = matmul_correlate1d_multi(vo, (g, xg), axis=-1, mode="nearest")
        b3, b6 = bo[0], bo[1]
        b5 = matmul_correlate1d(vx2, g, axis=-1, mode="nearest")
    else:
        ve = correlate1d(src, g, axis=-2, mode="nearest")
        vo = correlate1d(src, xg, axis=-2, mode="nearest")
        vx2 = correlate1d(src, xxg, axis=-2, mode="nearest")

        b1 = correlate1d(ve, g, axis=-1, mode="nearest")
        b2 = correlate1d(ve, xg, axis=-1, mode="nearest")
        b4 = correlate1d(ve, xxg, axis=-1, mode="nearest")
        b3 = correlate1d(vo, g, axis=-1, mode="nearest")
        b6 = correlate1d(vo, xg, axis=-1, mode="nearest")
        b5 = correlate1d(vx2, g, axis=-1, mode="nearest")

    return jnp.stack([
        b3 * ig11,
        b2 * ig11,
        b1 * ig03 + b5 * ig33,
        b1 * ig03 + b4 * ig33,
        b6 * ig55,
    ])


def _blur_kernel(n: int, sigma: float) -> np.ndarray:
    _, k = get_gaussian_kernel_bit_exact(n, sigma)
    return np.float32(k)


def gaussian_blur(src, smooth_size: int, sigma: float):
    k = _blur_kernel(smooth_size, float(sigma))
    out = correlate1d(src, k, axis=-2, mode="mirror")
    return correlate1d(out, k, axis=-1, mode="mirror")


def gaussian_blur5(m, smooth_size: int, sigma: float):
    k = _blur_kernel(smooth_size, float(sigma))
    out = correlate1d(m, k, axis=-2, mode="mirror")
    return correlate1d(out, k, axis=-1, mode="mirror")


def box_filter5(m, ksize_half: int):
    k = np.ones(2 * ksize_half + 1, np.float32)
    out = correlate1d(m, k, axis=-2, mode="nearest")
    out = correlate1d(out, k, axis=-1, mode="nearest")
    return out * jnp.float32(1.0 / (2 * ksize_half + 1) ** 2)


def update_matrices(flowx, flowy, r0, r1, sample_max_shift: int | None = 5):
    """Assemble the 5-plane normal-equation field M
    (ref: optical_flow_farneback.cl:256-348).

    The bilinear sample of R1 at the flow-displaced position runs, by default,
    as a dense tent-weight contraction over static shifts in
    [-sample_max_shift, sample_max_shift]^2 — a fused VPU multiply-reduce that
    beats TPU gathers ~3x.  Flows beyond that range (outside this library's
    <=4 px calibrated regime) would sample clamped; pass
    ``sample_max_shift=None`` for the exact gather path.

    Default R=5 since round 4 (was 6): flows <= 4.99 px still sample exactly
    (the tent needs shifts floor(d) and floor(d)+1), transient clamps moved
    the bundled-pair solve by <= 4.5e-5 px vs the exact R=12 sampler, and the
    contraction shrinks 169 -> 121 shifts (-28%).  Pass 6 to restore the old
    envelope.
    """
    _, rows, cols = r0.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (rows, cols), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (rows, cols), 1)
    fx = xs + flowx
    fy = ys + flowy
    x1i = jnp.floor(fx).astype(jnp.int32)
    y1i = jnp.floor(fy).astype(jnp.int32)

    inside = (x1i >= 0) & (y1i >= 0) & (x1i < cols - 1) & (y1i < rows - 1)

    if sample_max_shift is not None:
        R = int(sample_max_shift)
        dxc = jnp.clip(flowx, -R, R - 1e-3)
        dyc = jnp.clip(flowy, -R, R - 1e-3)
        rp = jnp.pad(r1, ((0, 0), (R, R + 1), (R, R + 1)), mode="edge")
        s = jnp.zeros_like(r1)
        for sy in range(-R, R + 1):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dyc - sy))
            for sx in range(-R, R + 1):
                w = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dxc - sx))
                s = s + w[None] * rp[:, R + sy : R + sy + rows, R + sx : R + sx + cols]
    else:
        fxf = fx - jnp.floor(fx)
        fyf = fy - jnp.floor(fy)
        x1c = jnp.clip(x1i, 0, cols - 2)
        y1c = jnp.clip(y1i, 0, rows - 2)
        a00 = (1 - fxf) * (1 - fyf)
        a01 = fxf * (1 - fyf)
        a10 = (1 - fxf) * fyf
        a11 = fxf * fyf
        flat = r1.reshape(5, rows * cols)
        i00 = (y1c * cols + x1c).reshape(-1)
        t00 = jnp.take(flat, i00, axis=1).reshape(5, rows, cols)
        t01 = jnp.take(flat, i00 + 1, axis=1).reshape(5, rows, cols)
        t10 = jnp.take(flat, i00 + cols, axis=1).reshape(5, rows, cols)
        t11 = jnp.take(flat, i00 + cols + 1, axis=1).reshape(5, rows, cols)
        s = a00 * t00 + a01 * t01 + a10 * t10 + a11 * t11

    return assemble_m(s, r0, flowx, flowy, inside)


def assemble_m(s, r0, flowx, flowy, inside, row0=0, img_rows: int | None = None):
    """The non-sampling tail of updateMatrices: difference blend, border
    attenuation ramp and normal-equation products
    (ref: optical_flow_farneback.cl:310-346).  Shared by the XLA sampler
    above, the channel-blocked Pallas sampler
    (ops/pallas/tent_sample.py:update_matrices_channel_pallas) and the
    rows-sharded Farneback iteration (parallel/sharded_pallas.py), whose
    tiles cover global rows [row0, row0 + rows) of an img_rows-tall image —
    the border ramp attenuates at GLOBAL borders only."""
    rows, cols = flowx.shape
    img_rows = rows if img_rows is None else img_rows
    r2 = jnp.where(inside, s[0], 0.0)
    r3 = jnp.where(inside, s[1], 0.0)
    r4 = jnp.where(inside, (r0[2] + s[2]) * 0.5, r0[2])
    r5 = jnp.where(inside, (r0[3] + s[3]) * 0.5, r0[3])
    r6 = jnp.where(inside, (r0[4] + s[4]) * 0.25, r0[4] * 0.5)

    r2 = (r0[0] - r2) * 0.5
    r3 = (r0[1] - r3) * 0.5
    r2 = r2 + r4 * flowy + r6 * flowx
    r3 = r3 + r6 * flowy + r5 * flowx

    ramp = jnp.asarray(BORDER_RAMP)
    xi = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    yi = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) + row0
    scale = (
        ramp[jnp.minimum(xi, 5)] * ramp[jnp.minimum(yi, 5)]
        * ramp[jnp.minimum(cols - xi - 1, 5)]
        * ramp[jnp.minimum(img_rows - yi - 1, 5)]
    )
    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale

    return jnp.stack([
        r4 * r4 + r6 * r6,
        (r4 + r5) * r6,
        r5 * r5 + r6 * r6,
        r4 * r2 + r6 * r3,
        r6 * r2 + r5 * r3,
    ])


def _um_impl(shape, sample_max_shift=5) -> str:
    """Static dispatch for update_matrices: the Pallas VMEM-resident kernel
    (5.4x the XLA contraction on a v5e at the R=5 default, parity to f32
    round-off — relative 1.5e-7; the round-4 separable reorder traded
    bit-identity for hoisted lane rotates —
    scripts/pallas_ab_results.json) when the backend policy allows, else XLA.
    The data-dependent shift-skipping variant ('um_sparse') takes precedence
    once hardware-validated: on calibrated PIV flow it branches away most of
    the 121-term contraction (scripts/fb_limiter.json)."""
    from opticalflow_ri_tpu.ops.pallas import pallas_default_on
    from opticalflow_ri_tpu.ops.pallas.validated import is_validated

    if not pallas_default_on():
        return "xla"
    from opticalflow_ri_tpu.ops.pallas.tent_sample import (
        update_matrices_channel_supports_pallas,
        update_matrices_dense_supports_pallas,
        update_matrices_supports_pallas,
    )

    if is_validated("um_sparse") and update_matrices_supports_pallas(
            shape, sample_max_shift):
        return "pallas_sparse"
    # the dense whole-field kernel's envelope is tighter than the sparse
    # one's (value-carried accumulators OOM the VMEM stack at 2048^2)
    if is_validated("um") and update_matrices_dense_supports_pallas(
            shape, sample_max_shift):
        return "pallas"
    if update_matrices_channel_supports_pallas(shape, sample_max_shift):
        # ("um_channel_sparse2d" is a hardware-proven negative result and
        # is deliberately absent from this ladder — sparse="2d" pins it)
        if is_validated("um_channel_sparse"):
            return "pallas_channel_sparse"
        if is_validated("um_channel"):
            return "pallas_channel"
    return "xla"


def update_matrices_dispatch(flowx, flowy, r0, r1, sample_max_shift=5,
                             impl: str = "auto"):
    """update_matrices with static impl selection (trace-time env + shape).
    ``impl="pallas"`` picks the best VALIDATED kernel for the shape (like
    "auto" but without re-consulting the backend policy); the
    ``pallas_sparse`` / ``pallas_dense`` / ``pallas_channel`` values pin a
    specific kernel for A/B runs."""
    if impl == "pallas_mmblur":
        impl = "pallas"  # the mmblur pin only affects the blur dispatch
    if impl == "auto":
        impl = _um_impl(r0.shape, sample_max_shift)
    elif impl == "pallas":
        from opticalflow_ri_tpu.ops.pallas.tent_sample import (
            update_matrices_channel_supports_pallas,
            update_matrices_supports_pallas,
        )
        from opticalflow_ri_tpu.ops.pallas.validated import is_validated

        from opticalflow_ri_tpu.ops.pallas.tent_sample import (
            update_matrices_dense_supports_pallas,
        )

        if (is_validated("um_sparse") and update_matrices_supports_pallas(
                r0.shape, sample_max_shift)):
            impl = "pallas_sparse"
        elif not update_matrices_dense_supports_pallas(r0.shape,
                                                       sample_max_shift):
            if update_matrices_channel_supports_pallas(r0.shape,
                                                       sample_max_shift):
                if is_validated("um_channel_sparse"):
                    impl = "pallas_channel_sparse"
                elif is_validated("um_channel"):
                    impl = "pallas_channel"
                else:
                    impl = "xla"
            else:
                impl = "xla"
    elif impl == "pallas_dense":
        # the dense whole-field kernel has a tighter VMEM envelope than the
        # sparse one (value-carried accumulators; see
        # update_matrices_dense_supports_pallas) — beyond it, the pin falls
        # to the dense CHANNEL kernel rather than a compile-time OOM
        from opticalflow_ri_tpu.ops.pallas.tent_sample import (
            update_matrices_channel_supports_pallas,
            update_matrices_dense_supports_pallas,
        )

        if update_matrices_dense_supports_pallas(r0.shape, sample_max_shift):
            impl = "pallas"
        elif update_matrices_channel_supports_pallas(r0.shape,
                                                     sample_max_shift):
            impl = "pallas_channel"
        else:
            impl = "xla"
    if impl == "pallas_sparse":
        from opticalflow_ri_tpu.ops.pallas.tent_sample import (
            update_matrices_sparse_pallas,
        )

        return update_matrices_sparse_pallas(flowx, flowy, r0, r1,
                                             sample_max_shift)
    if impl == "pallas":
        from opticalflow_ri_tpu.ops.pallas.tent_sample import update_matrices_pallas

        return update_matrices_pallas(flowx, flowy, r0, r1, sample_max_shift)
    if impl in ("pallas_channel", "pallas_channel_sparse",
                "pallas_channel_sparse2d"):
        from opticalflow_ri_tpu.ops.pallas.tent_sample import (
            update_matrices_channel_pallas,
        )

        sparse = {"pallas_channel": False, "pallas_channel_sparse": True,
                  "pallas_channel_sparse2d": "2d"}[impl]
        return update_matrices_channel_pallas(
            flowx, flowy, r0, r1, sample_max_shift, sparse=sparse)
    return update_matrices(flowx, flowy, r0, r1, sample_max_shift)


def _window_blur_spec(window_size: int, use_gaussian: bool):
    """(taps, border mode, post-scale) of the per-iteration window blur."""
    if use_gaussian:
        return _blur_kernel(window_size, window_size / 2 * 0.3), "mirror", 1.0
    half = window_size // 2
    return (np.ones(2 * half + 1, np.float32), "nearest",
            1.0 / (2 * half + 1) ** 2)


# NOTE: there is deliberately NO fused whole-loop dispatch here.  Whole-loop
# fusion was attempted twice in round 4 and closed as a hardware-proven
# negative result (scoped-VMEM OOM at 343 MB of 128 for the store-free
# variant) — see ops/pallas/fb_fused2.py and PARITY.md.  The two-kernel
# banded path below is the design point.


def _blur_flow_dispatch(m, window_size: int, use_gaussian: bool,
                        impl: str = "auto"):
    """window-blur M then solve for flow, fused in one Pallas pass (measured
    2.1x the stencil + elementwise path on a v5e, bit-identical —
    scripts/pallas_ab_results.json) when the backend policy allows."""
    from opticalflow_ri_tpu.ops.pallas import pallas_default_on
    from opticalflow_ri_tpu.ops.pallas.validated import is_validated
    from opticalflow_ri_tpu.ops.matmul_filter import (
        blur5_flow_matmul, matmul_supports,
    )

    k, mode, scale = _window_blur_spec(window_size, use_gaussian)
    taps = tuple(float(w) for w in k)

    if impl in ("pallas_sparse", "pallas_dense", "pallas_channel",
                "pallas_channel_sparse", "pallas_channel_sparse2d"):
        impl = "pallas"  # um-kernel pins only affect the um dispatch

    if impl == "pallas_mmblur":
        # forced MXU banded-matmul blur (A/B pin)
        if matmul_supports(m.shape, len(k)):
            return blur5_flow_matmul(m, taps, mode, scale)
        impl = "pallas"

    if impl == "pallas" or (
        impl == "auto" and pallas_default_on() and is_validated("blur5")
    ):
        from opticalflow_ri_tpu.ops.pallas.blur5_flow import (
            blur5_flow_banded_pallas, blur5_flow_banded_supports,
            blur5_flow_pallas, blur5_flow_supports_pallas,
        )

        # MXU banded-matmul path (ops/matmul_filter.py): preferred from
        # 1024^2 up — 1.7x the whole-VMEM kernel at 1024^2 (blur 0.58 ->
        # 0.34 ms, full solve 8.38 -> 6.50, scripts/fb_mm_1024_probe.json)
        # and 11.9x the banded DMA-slab kernel at 2048^2
        # (pallas_ab_results.json:blur5_matmul_*).  At 512^2 the whole-VMEM
        # kernel stays ahead (0.109 vs 0.125 ms).
        mm_ok = is_validated("blur5_matmul") and matmul_supports(m.shape,
                                                                len(k))
        big = m.shape[-2] * m.shape[-1] >= 1024 * 1024
        whole_ok = blur5_flow_supports_pallas(m.shape, len(k))
        # beyond whole-M VMEM residency: matmul, then the banded DMA-slab
        # kernel (bit-identical to the whole kernel; 2048^2 hardware A/B in
        # pallas_ab_results.json:blur5_banded_*)
        if mm_ok and (big or not whole_ok):
            return blur5_flow_matmul(m, taps, mode, scale)
        if whole_ok:
            return blur5_flow_pallas(m, taps, mode, scale)
        if is_validated("blur5_banded") and blur5_flow_banded_supports(
                m.shape, len(k)):
            return blur5_flow_banded_pallas(m, taps, mode, scale)

    if use_gaussian:
        m = gaussian_blur5(m, window_size, window_size / 2 * 0.3)
    else:
        m = box_filter5(m, window_size // 2)
    return update_flow(m)


def update_flow(m):
    """Regularised per-pixel 2x2 solve (ref: optical_flow_farneback.cl:408-429)."""
    g11, g12, g22, h1, h2 = m[0], m[1], m[2], m[3], m[4]
    det_inv = 1.0 / (g11 * g22 - g12 * g12 + jnp.float32(1e-3))
    return (g11 * h2 - g12 * h1) * det_inv, (g22 * h1 - g12 * h2) * det_inv


def _level_plan(rows, cols, pyr_scale, levels):
    """Static per-level geometry, cropped at min size 32
    (ref: src/Farneback_PyCL.py:468-487, :508-515)."""
    min_size = 32
    scale = 1.0
    final_levels = 0
    while final_levels < levels:
        scale *= pyr_scale
        if cols * scale < min_size or rows * scale < min_size:
            break
        final_levels += 1
    plan = []
    for k in range(final_levels, -1, -1):
        s = pyr_scale**k
        sigma = (1.0 / s - 1.0) * 0.5
        smooth = max(int(round(sigma * 5)) | 1, 3)
        plan.append(
            dict(scale=s, sigma=sigma, smooth=smooth,
                 width=int(round(cols * s)), height=int(round(rows * s)))
        )
    return plan


@partial(
    jax.jit,
    static_argnames=("window_size", "n_iters", "poly_n", "poly_sigma",
                     "use_gaussian", "pyr_scale", "pyr_levels", "impl"),
)
def farneback_solve(im1, im2, u0, v0, window_size=33, n_iters=5, poly_n=7,
                    poly_sigma=1.5, use_gaussian=True, pyr_scale=0.5,
                    pyr_levels=1, impl: str = "auto"):
    """Whole Farneback pipeline as one XLA program.  ``impl`` picks the
    kernel layer for updateMatrices/blur5 ("auto" consults the backend
    policy at trace time; resolve it OUTSIDE any containing jit if the
    decision must be part of this jit's cache key — see the adapter)."""
    from opticalflow_ri_tpu.ops.pallas import pallas_default_on

    if impl == "auto":
        impl = "pallas" if pallas_default_on() else "xla"
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    u0 = u0.astype(jnp.float32)
    v0 = v0.astype(jnp.float32)
    rows, cols = im1.shape
    plan = _level_plan(rows, cols, pyr_scale, pyr_levels - 1)

    prev = None
    for lvl in plan:
        h, w = lvl["height"], lvl["width"]
        if prev is None:
            fx = pil_resize(u0, (h, w), "bilinear") * jnp.float32(lvl["scale"])
            fy = pil_resize(v0, (h, w), "bilinear") * jnp.float32(lvl["scale"])
        else:
            fx = pil_resize(prev[0], (h, w), "bilinear") * jnp.float32(1.0 / pyr_scale)
            fy = pil_resize(prev[1], (h, w), "bilinear") * jnp.float32(1.0 / pyr_scale)

        # an "xla"-pinned solve must stay pure XLA-stencil end to end (A/B
        # baselines depend on it) — poly's own "auto" would consult only
        # the backend policy, not this solve's pin
        poly_impl = "vpu" if impl == "xla" else "auto"
        ra = poly_expansion(
            pil_resize(gaussian_blur(im1, lvl["smooth"], lvl["sigma"]), (h, w), "bilinear"),
            poly_n, poly_sigma, impl=poly_impl,
        )
        rb = poly_expansion(
            pil_resize(gaussian_blur(im2, lvl["smooth"], lvl["sigma"]), (h, w), "bilinear"),
            poly_n, poly_sigma, impl=poly_impl,
        )

        m = update_matrices_dispatch(fx, fy, ra, rb, impl=impl)
        for i in range(n_iters):
            fx, fy = _blur_flow_dispatch(m, window_size, use_gaussian,
                                         impl=impl)
            if i < n_iters - 1:
                m = update_matrices_dispatch(fx, fy, ra, rb, impl=impl)
        prev = (fx, fy)

    return prev


class FarnebackAdapter:
    """Driver adapter with the reference constructor surface
    (ref: src/Farneback_PyCL.py:65-122)."""

    def __init__(self, windowSize: int = 33, Niters: int = 5, polyN: int = 7,
                 polySigma: float = 1.5, useGaussian: bool = True,
                 pyrScale: float = 0.5, pyramidalLevels: int = 1,
                 provideGenericPyramidalDefaults: bool = True):
        assert pyramidalLevels >= 1, "Pyramidal levels must be >= 1"
        if windowSize % 2 == 0:
            raise ValueError("windowSize must be an odd value")
        assert polyN in (5, 7)
        self.windowSize = windowSize
        self.numIters = Niters
        self.polyN = int(polyN)
        self.polySigma = polySigma
        self.useGaussianFilter = useGaussian
        self.pyrScale = pyrScale
        self.pyramidalLevels = pyramidalLevels
        self.provideGenericPyramidalDefaults = provideGenericPyramidalDefaults

    def compute(self, im1, im2, U, V):
        from opticalflow_ri_tpu.ops.pallas import pallas_default_on

        im1 = jnp.asarray(im1)

        # kernel-sharded context (parallel/context.py): inside an
        # auto-sharded pipeline trace, run the per-level iteration loop
        # rows-sharded with per-device validated kernels (um_channel +
        # blur5) so multi-chip Farneback keeps the kernel wins; per-level
        # graceful fallback inside farneback_solve_sharded.
        from opticalflow_ri_tpu.parallel.context import current_kernel_shard

        ctx = current_kernel_shard()
        if ctx is not None:
            mesh, interp = ctx
            from opticalflow_ri_tpu.parallel.sharded_pallas import (
                farneback_solve_sharded, fb_shard_supported,
            )

            if fb_shard_supported(mesh, im1.shape, self.windowSize,
                                  interpret=interp):
                fx, fy = farneback_solve_sharded(
                    mesh, im1, jnp.asarray(im2), jnp.asarray(U),
                    jnp.asarray(V), window_size=self.windowSize,
                    n_iters=self.numIters, poly_n=self.polyN,
                    poly_sigma=float(self.polySigma),
                    use_gaussian=self.useGaussianFilter,
                    pyr_scale=float(self.pyrScale),
                    pyr_levels=self.pyramidalLevels, interpret=interp,
                )
                return fx, fy, "Unknown"

        # impl resolved HERE (trace time of any outer jit) so the inner jit's
        # cache key reflects the dispatch decision (e.g. force_xla contexts)
        impl = "pallas" if pallas_default_on() else "xla"
        fx, fy = farneback_solve(
            jnp.asarray(im1), jnp.asarray(im2), jnp.asarray(U), jnp.asarray(V),
            window_size=self.windowSize, n_iters=self.numIters,
            poly_n=self.polyN, poly_sigma=float(self.polySigma),
            use_gaussian=self.useGaussianFilter, pyr_scale=float(self.pyrScale),
            pyr_levels=self.pyramidalLevels, impl=impl,
        )
        # the reference reports no numeric error from this solver (:602)
        return fx, fy, "Unknown"

    def getAlgoName(self):
        return "TPU Farneback"

    def hasGenericPyramidalDefaults(self):
        return self.provideGenericPyramidalDefaults

    def getGenericPyramidalDefaults(self):
        return {"warping": False, "scaling": True}
