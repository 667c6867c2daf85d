"""Pallas kernel parity (interpreter mode on CPU; compiled path exercised on
TPU via OFRI_ENABLE_PALLAS=1)."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from opticalflow_ri_tpu.models.horn_schunck import hs_solve
from opticalflow_ri_tpu.ops.stencil import hs_derivatives
from opticalflow_ri_tpu.ops.pallas import hs_iter as hk


def test_hs_pallas_kernel_matches_xla_interpret():
    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    d2 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    z = jnp.zeros_like(d1)

    ux, vx, _ = hs_solve(d1, d2, 21.0, 10, z, z, impl="xla")

    fx, fy, ft = hs_derivatives(d1, d2)
    up, vp = pl.pallas_call(
        partial(hk._hs_kernel, niter=10),
        out_shape=(jax.ShapeDtypeStruct((64, 128), jnp.float32),) * 2,
        interpret=True,
    )(jnp.float32(21.0).reshape(1, 1), fx, fy, ft, z, z)

    np.testing.assert_allclose(np.asarray(up), np.asarray(ux), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vx), rtol=1e-5, atol=1e-5)


def test_liu_shen_pallas_kernel_matches_xla_interpret():
    from opticalflow_ri_tpu.models.liu_shen import liu_shen_solve, liu_shen_precompute
    from opticalflow_ri_tpu.ops.pallas.liu_shen_iter import liu_shen_iterate_pallas

    rng = np.random.default_rng(1)
    d1 = jnp.asarray(rng.uniform(1, 255, (32, 128)).astype(np.float32))
    d2 = jnp.asarray(rng.uniform(1, 255, (32, 128)).astype(np.float32))
    z = jnp.zeros_like(d1)

    ux, vx, ex = liu_shen_solve(d1, d2, 500.0, z, z, max_iter=8)

    n1 = d1 / jnp.max(d1)
    n2 = d2 / jnp.max(d2)
    fields = liu_shen_precompute(n1, n2, 500.0)
    up, vp, ep = liu_shen_iterate_pallas(500.0, fields, z, z, max_iter=8,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(up), np.asarray(ux), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vx), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(ep), float(ex), rtol=1e-3, atol=1e-9)


def test_farneback_update_matrices_pallas_matches_xla_interpret():
    from opticalflow_ri_tpu.models.farneback import poly_expansion, update_matrices
    from opticalflow_ri_tpu.ops.pallas.tent_sample import update_matrices_pallas

    rng = np.random.default_rng(2)
    im1 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    ra = poly_expansion(im1, 7, 1.5)
    rb = poly_expansion(im2, 7, 1.5)
    fx = jnp.asarray(rng.uniform(-5, 5, (64, 128)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-5, 5, (64, 128)).astype(np.float32))

    m_ref = update_matrices(fx, fy, ra, rb)
    m_pal = update_matrices_pallas(fx, fy, ra, rb, interpret=True)
    scale = float(jnp.max(jnp.abs(m_ref)))
    np.testing.assert_allclose(
        np.asarray(m_pal), np.asarray(m_ref), atol=1e-6 * scale, rtol=1e-5
    )


def test_farneback_update_matrices_sparse_matches_dense_interpret():
    """The shift-skipping sparse kernel matches the dense kernel to f32
    round-off (skipped terms are identically zero; residual diffs are
    compiler mul-add fusion choices across the scf.if structure), on both
    smooth PIV-like flow (branches skip) and adversarial random flow (every
    branch taken)."""
    from opticalflow_ri_tpu.models.farneback import poly_expansion
    from opticalflow_ri_tpu.ops.pallas.tent_sample import (
        update_matrices_pallas, update_matrices_sparse_pallas,
    )

    rng = np.random.default_rng(2)
    im1 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    ra = poly_expansion(im1, 7, 1.5)
    rb = poly_expansion(im2, 7, 1.5)

    yy = np.arange(64, dtype=np.float32)[:, None] * np.ones((1, 128), np.float32)
    smooth = (jnp.asarray(2.0 * np.sin(yy / 20.0)),
              jnp.asarray(1.5 * np.cos(yy / 30.0)))
    rand = (jnp.asarray(rng.uniform(-8, 8, (64, 128)).astype(np.float32)),
            jnp.asarray(rng.uniform(-8, 8, (64, 128)).astype(np.float32)))
    for fx, fy in (smooth, rand):
        m_d = update_matrices_pallas(fx, fy, ra, rb, interpret=True)
        m_s = update_matrices_sparse_pallas(fx, fy, ra, rb, interpret=True)
        scale = float(jnp.max(jnp.abs(m_d)))
        np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_d),
                                   atol=2e-5 * scale, rtol=1e-3)


def test_lk_build_split_matches_fused_interpret():
    """The per-gradient split build (two launches, larger band) must be
    bit-identical to the fused two-stack build — same kernel body, same
    summation order, only the launch structure differs."""
    from opticalflow_ri_tpu.oracle.lucas_kanade import window_mask
    from opticalflow_ri_tpu.ops.window_sums import runs_from_mask
    from opticalflow_ri_tpu.ops.pallas.lk_build import (
        lk_build_planes_pallas, lk_build_split_engages,
    )

    rng = np.random.default_rng(0)
    hw, R = 13, 5
    h, w = 32, 64
    core_h, core_w = h + 31, w + 31
    slab = jnp.asarray(
        rng.normal(0, 1, (core_h + 2 * R, core_w + 2 * R)).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1, (2, core_h, core_w)).astype(np.float32))
    runs = runs_from_mask(window_mask(27, 0, 0))
    a1, a2 = lk_build_planes_pallas(slab, g, hw, R, runs, runs,
                                    interpret=True, split_g="never")
    b1, b2 = lk_build_planes_pallas(slab, g, hw, R, runs, runs,
                                    interpret=True, split_g="always")
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))

    # engagement: only where the split admits a strictly larger band
    assert lk_build_split_engages(512, 2048, 5)
    assert not lk_build_split_engages(512, 512, 5)


def test_farneback_update_matrices_channel_sparse_interpret():
    """Shift-skipping variant of the channel-blocked sampler matches the
    non-sparse channel kernel to f32 round-off on smooth and adversarial
    flow."""
    from opticalflow_ri_tpu.models.farneback import poly_expansion
    from opticalflow_ri_tpu.ops.pallas.tent_sample import (
        update_matrices_channel_pallas,
    )

    rng = np.random.default_rng(3)
    im1 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    ra = poly_expansion(im1, 7, 1.5)
    rb = poly_expansion(im2, 7, 1.5)
    yy = np.arange(64, dtype=np.float32)[:, None] * np.ones((1, 128), np.float32)
    flows = [
        (jnp.asarray(2.0 * np.sin(yy / 20.0)), jnp.asarray(1.5 * np.cos(yy / 30.0))),
        (jnp.asarray(rng.uniform(-8, 8, (64, 128)).astype(np.float32)),
         jnp.asarray(rng.uniform(-8, 8, (64, 128)).astype(np.float32))),
    ]
    for fx, fy in flows:
        m_c = update_matrices_channel_pallas(fx, fy, ra, rb, interpret=True)
        for sp in (True, "2d"):
            m_s = update_matrices_channel_pallas(fx, fy, ra, rb,
                                                 interpret=True, sparse=sp)
            scale = float(jnp.max(jnp.abs(m_c)))
            np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_c),
                                       atol=2e-5 * scale, rtol=1e-3)


def test_farneback_update_matrices_channel_sparse2d_multiblock_interpret():
    """The 2-D tiled sparse sampler across multiple 256-wide column blocks
    (the lane-superset static-sub-slice path) matches the XLA contraction."""
    from opticalflow_ri_tpu.models.farneback import poly_expansion, update_matrices
    from opticalflow_ri_tpu.ops.pallas.tent_sample import (
        update_matrices_channel_pallas,
    )

    rng = np.random.default_rng(7)
    im1 = jnp.asarray(rng.uniform(0, 255, (32, 512)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (32, 512)).astype(np.float32))
    ra = poly_expansion(im1, 7, 1.5)
    rb = poly_expansion(im2, 7, 1.5)
    ys, xs = np.mgrid[0:32, 0:512].astype(np.float32)
    fx = jnp.asarray(3.5 * (1 - (2 * xs / 512 - 1) ** 2) - 1.0)
    fy = jnp.asarray(2.0 * (2 * ys / 32 - 1))
    ref = update_matrices(fx, fy, ra, rb)
    got = update_matrices_channel_pallas(fx, fy, ra, rb, interpret=True,
                                         sparse="2d")
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5 * scale, rtol=1e-3)


def test_lk_gn_pallas_matches_xla_interpret(monkeypatch):
    import opticalflow_ri_tpu.ops.pallas.lk_iter as lki
    from opticalflow_ri_tpu.models.lucas_kanade import lk_dense_solve

    rng = np.random.default_rng(3)
    im1 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    im2 = jnp.roll(im1, (1, 2), axis=(0, 1)) + jnp.asarray(
        rng.normal(0, 2, (64, 128)).astype(np.float32)
    )
    z = jnp.zeros((64, 128), jnp.float32)

    u_x, v_x, s_x = lk_dense_solve(im1, im2, z, z, impl="xla")

    import opticalflow_ri_tpu.ops.pallas.lk_build as lkb

    orig = lki.lk_gn_iterate_pallas
    monkeypatch.setattr(
        lki, "lk_gn_iterate_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    orig_b = lkb.lk_build_planes_pallas
    monkeypatch.setattr(
        lkb, "lk_build_planes_pallas",
        lambda *a, **k: orig_b(*a, **{**k, "interpret": True}),
    )
    u_p, v_p, s_p = lk_dense_solve(im1, im2, z, z, impl="pallas")

    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))


def test_lk_gn_pallas_asymmetric_window_and_flow_init(monkeypatch):
    import opticalflow_ri_tpu.ops.pallas.lk_iter as lki
    from opticalflow_ri_tpu.models.lucas_kanade import lk_dense_solve

    rng = np.random.default_rng(4)
    im1 = jnp.asarray(rng.uniform(0, 255, (32, 128)).astype(np.float32))
    im2 = jnp.roll(im1, (0, 1), axis=(0, 1))
    u0 = jnp.full((32, 128), 0.5, jnp.float32)
    v0 = jnp.full((32, 128), -0.25, jnp.float32)

    u_x, v_x, s_x = lk_dense_solve(im1, im2, u0, v0, asym=(0, 1, 0, 1), impl="xla")

    import opticalflow_ri_tpu.ops.pallas.lk_build as lkb

    orig = lki.lk_gn_iterate_pallas
    monkeypatch.setattr(
        lki, "lk_gn_iterate_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    orig_b = lkb.lk_build_planes_pallas
    monkeypatch.setattr(
        lkb, "lk_build_planes_pallas",
        lambda *a, **k: orig_b(*a, **{**k, "interpret": True}),
    )
    u_p, v_p, s_p = lk_dense_solve(im1, im2, u0, v0, asym=(0, 1, 0, 1), impl="pallas")

    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))


def test_farneback_blur5_flow_pallas_full_solve_interpret(monkeypatch):
    """Fused blur+flow kernel inside the whole Farneback solve on synthetic
    particle data (random noise makes the 2x2 solve ill-conditioned and
    amplifies f32 round-off meaninglessly)."""
    import opticalflow_ri_tpu.models.farneback as fbm
    from opticalflow_ri_tpu.ops.pallas import blur5_flow as bf
    from opticalflow_ri_tpu.utils.synthetic import particle_image_pair

    im1, im2, _, _ = particle_image_pair(shape=(128, 128), seed=7)
    im1 = jnp.asarray(im1, jnp.float32)
    im2 = jnp.asarray(im2, jnp.float32)
    z = jnp.zeros_like(im1)

    f_ref = fbm.farneback_solve(im1, im2, z, z)

    orig_kernel = fbm._blur_kernel

    def patched_dispatch(m, window_size, use_gaussian, **kwargs):
        if use_gaussian:
            k = orig_kernel(window_size, window_size / 2 * 0.3)
            mode, scale = "mirror", 1.0
        else:
            half = window_size // 2
            k = np.ones(2 * half + 1, np.float32)
            mode, scale = "nearest", 1.0 / (2 * half + 1) ** 2
        return bf.blur5_flow_pallas(
            m, tuple(float(w) for w in k), mode, scale, interpret=True
        )

    monkeypatch.setattr(fbm, "_blur_flow_dispatch", patched_dispatch)
    jax.clear_caches()
    f_pal = fbm.farneback_solve(im1, im2, z, z)
    jax.clear_caches()

    np.testing.assert_allclose(np.asarray(f_pal[0]), np.asarray(f_ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_pal[1]), np.asarray(f_ref[1]), atol=1e-4)


def test_farneback_blur5_flow_pallas_box_filter_interpret(monkeypatch):
    import opticalflow_ri_tpu.models.farneback as fbm
    from opticalflow_ri_tpu.ops.pallas import blur5_flow as bf
    from opticalflow_ri_tpu.utils.synthetic import particle_image_pair

    im1, im2, _, _ = particle_image_pair(shape=(128, 128), seed=8)
    im1 = jnp.asarray(im1, jnp.float32)
    im2 = jnp.asarray(im2, jnp.float32)
    z = jnp.zeros_like(im1)

    f_ref = fbm.farneback_solve(im1, im2, z, z, use_gaussian=False)

    orig_kernel = fbm._blur_kernel

    def patched_dispatch(m, window_size, use_gaussian, **kwargs):
        if use_gaussian:
            k = orig_kernel(window_size, window_size / 2 * 0.3)
            mode, scale = "mirror", 1.0
        else:
            half = window_size // 2
            k = np.ones(2 * half + 1, np.float32)
            mode, scale = "nearest", 1.0 / (2 * half + 1) ** 2
        return bf.blur5_flow_pallas(
            m, tuple(float(w) for w in k), mode, scale, interpret=True
        )

    monkeypatch.setattr(fbm, "_blur_flow_dispatch", patched_dispatch)
    jax.clear_caches()
    f_pal = fbm.farneback_solve(im1, im2, z, z, use_gaussian=False)
    jax.clear_caches()

    np.testing.assert_allclose(np.asarray(f_pal[0]), np.asarray(f_ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_pal[1]), np.asarray(f_ref[1]), atol=1e-4)


def test_pallas_supports_gating_new_kernels():
    from opticalflow_ri_tpu.ops.pallas.tent_sample import update_matrices_supports_pallas
    from opticalflow_ri_tpu.ops.pallas.lk_iter import lk_gn_supports_pallas

    from opticalflow_ri_tpu.ops.pallas.tent_sample import (
        update_matrices_dense_supports_pallas,
    )

    assert update_matrices_supports_pallas((5, 512, 512), 6)
    assert not update_matrices_supports_pallas((5, 512, 512), None)  # gather path
    assert update_matrices_supports_pallas((5, 515, 512), 6)  # tile-align pad
    # round 5: 2048^2 whole-R1 residency (~85-90 MB) is INSIDE the sparse
    # kernel's probed envelope (band 16, um_whole_2048_probe.json)...
    assert update_matrices_supports_pallas((5, 2048, 2048), 6)
    assert not update_matrices_supports_pallas((5, 2560, 2560), 5)  # beyond it
    # ...but beyond the DENSE whole kernel's (value-carried accumulators
    # OOM'd the VMEM stack at 125.9 MB of 100 — see the envelope docstring)
    assert update_matrices_dense_supports_pallas((5, 1024, 1024), 5)
    assert not update_matrices_dense_supports_pallas((5, 2048, 2048), 5)

    assert lk_gn_supports_pallas(512, 512, 6)
    assert lk_gn_supports_pallas(513, 512, 6)   # tile-align pad
    assert lk_gn_supports_pallas(512, 500, 6)   # tile-align pad
    assert not lk_gn_supports_pallas(512, 4096, 6)  # T band exceeds VMEM


def test_hs_supports_pallas_gating():
    assert hk.hs_supports_pallas((512, 512))
    assert not hk.hs_supports_pallas((513, 512))   # sublane misalignment
    assert not hk.hs_supports_pallas((512, 500))   # lane misalignment
    assert not hk.hs_supports_pallas((2048, 2048))  # exceeds VMEM budget


def test_lk_fused_pallas_matches_xla_interpret(monkeypatch):
    import opticalflow_ri_tpu.ops.pallas.lk_iter as lki
    from opticalflow_ri_tpu.models.lucas_kanade import lk_dense_solve

    rng = np.random.default_rng(5)
    im1 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    im2 = jnp.roll(im1, (1, 2), axis=(0, 1)) + jnp.asarray(
        rng.normal(0, 2, (64, 128)).astype(np.float32)
    )
    z = jnp.zeros((64, 128), jnp.float32)

    u_x, v_x, s_x = lk_dense_solve(im1, im2, z, z, impl="xla")

    orig = lki.lk_fused_pallas
    monkeypatch.setattr(
        lki, "lk_fused_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    u_p, v_p, s_p = lk_dense_solve(im1, im2, z, z, impl="pallas_fused")

    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))


def test_lk_fused_pallas_asym_and_flow_init_interpret(monkeypatch):
    import opticalflow_ri_tpu.ops.pallas.lk_iter as lki
    from opticalflow_ri_tpu.models.lucas_kanade import lk_dense_solve

    rng = np.random.default_rng(6)
    im1 = jnp.asarray(rng.uniform(0, 255, (32, 128)).astype(np.float32))
    im2 = jnp.roll(im1, (0, 1), axis=(0, 1))
    u0 = jnp.full((32, 128), 0.5, jnp.float32)
    v0 = jnp.full((32, 128), -0.25, jnp.float32)

    u_x, v_x, s_x = lk_dense_solve(im1, im2, u0, v0, asym=(1, 0, 0, 1), impl="xla")

    orig = lki.lk_fused_pallas
    monkeypatch.setattr(
        lki, "lk_fused_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    u_p, v_p, s_p = lk_dense_solve(im1, im2, u0, v0, asym=(1, 0, 0, 1),
                                   impl="pallas_fused")

    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))


def test_lk_gn_pallas_odd_shape_interpret(monkeypatch):
    """Tile-alignment padding: kernels accept shapes off the (8, 128) grid."""
    import opticalflow_ri_tpu.ops.pallas.lk_iter as lki
    from opticalflow_ri_tpu.models.lucas_kanade import lk_dense_solve

    rng = np.random.default_rng(7)
    im1 = jnp.asarray(rng.uniform(0, 255, (60, 130)).astype(np.float32))
    im2 = jnp.roll(im1, (1, 1), axis=(0, 1))
    z = jnp.zeros((60, 130), jnp.float32)

    u_x, v_x, s_x = lk_dense_solve(im1, im2, z, z, impl="xla")

    import opticalflow_ri_tpu.ops.pallas.lk_build as lkb

    orig = lki.lk_gn_iterate_pallas
    monkeypatch.setattr(
        lki, "lk_gn_iterate_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    orig_b = lkb.lk_build_planes_pallas
    monkeypatch.setattr(
        lkb, "lk_build_planes_pallas",
        lambda *a, **k: orig_b(*a, **{**k, "interpret": True}),
    )
    u_p, v_p, s_p = lk_dense_solve(im1, im2, z, z, impl="pallas")

    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))


def test_farneback_um_blur5_pallas_odd_shape_interpret():
    """update_matrices + blur5 kernels on a shape off the (8, 128) grid."""
    from opticalflow_ri_tpu.models.farneback import (
        poly_expansion, update_matrices, gaussian_blur5, update_flow,
        _blur_kernel,
    )
    from opticalflow_ri_tpu.ops.pallas.tent_sample import update_matrices_pallas
    from opticalflow_ri_tpu.ops.pallas.blur5_flow import blur5_flow_pallas

    rng = np.random.default_rng(8)
    im1 = jnp.asarray(rng.uniform(0, 255, (44, 150)).astype(np.float32))
    im2 = jnp.roll(im1, (1, 2), axis=(0, 1))
    r0 = poly_expansion(im1, 5, 1.1)
    r1 = poly_expansion(im2, 5, 1.1)
    fx = jnp.asarray(rng.uniform(-3, 3, (44, 150)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-3, 3, (44, 150)).astype(np.float32))

    m_x = update_matrices(fx, fy, r0, r1, 6)
    m_p = update_matrices_pallas(fx, fy, r0, r1, 6, interpret=True)
    # padded-lane fusion reassociates f32 sums at the ulp level
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_x),
                               rtol=1e-6, atol=1e-4)

    k = _blur_kernel(15, 15 / 2 * 0.3)
    fx_x, fy_x = update_flow(gaussian_blur5(m_x, 15, 15 / 2 * 0.3))
    fx_p, fy_p = blur5_flow_pallas(m_x, tuple(float(x) for x in k), "mirror",
                                   1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(fx_p), np.asarray(fx_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fy_p), np.asarray(fy_x),
                               rtol=1e-5, atol=1e-5)


def test_pallas_policy_force_xla(monkeypatch):
    """force_xla() vetoes the dispatch even when the backend would allow it."""
    import jax as _jax
    import opticalflow_ri_tpu.ops.pallas as pp

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert pp.pallas_default_on()
    with pp.force_xla():
        assert not pp.pallas_default_on()
        with pp.force_xla():
            assert not pp.pallas_default_on()
        assert not pp.pallas_default_on()
    assert pp.pallas_default_on()

    monkeypatch.setenv("OFRI_DISABLE_PALLAS", "1")
    assert not pp.pallas_default_on()
    monkeypatch.delenv("OFRI_DISABLE_PALLAS")
    monkeypatch.setattr(_jax, "default_backend", lambda: "axon")
    monkeypatch.delenv("PALLAS_AXON_REMOTE_COMPILE", raising=False)
    assert not pp.pallas_default_on()  # server-side Mosaic compiles wedge
    monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
    assert pp.pallas_default_on()


def test_hs_tiled_pallas_matches_xla_interpret():
    """Temporal-blocked stripes + mirror-pad trick == global mirror Jacobi,
    incl. a remainder launch (niter % t_block != 0) and nonzero flow init."""
    from opticalflow_ri_tpu.ops.pallas.hs_tiled import (
        hs_iterate_pallas_tiled, hs_tiled_supports_pallas, stripe_height,
    )

    rng = np.random.default_rng(1)
    shape = (128, 256)
    d1 = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    d2 = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    u0 = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    v0 = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))

    ux, vx, _ = hs_solve(d1, d2, 21.0, 45, u0, v0, impl="xla")
    fx, fy, ft = hs_derivatives(d1, d2)
    up, vp = hs_iterate_pallas_tiled(fx, fy, ft, u0, v0, 21.0, 45,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(up), np.asarray(ux), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vx), rtol=1e-5, atol=1e-5)

    assert hs_tiled_supports_pallas((2048, 2048))
    assert hs_tiled_supports_pallas((1024, 1024))
    assert not hs_tiled_supports_pallas((100, 130))  # off-tile
    assert stripe_height(2048, 2048, 20) is not None


def test_ls_tiled_pallas_matches_xla_interpret():
    """Temporal-blocked Liu-Shen stripes with exact in-kernel border rules
    ('nearest' stencils + zero-pad ring) == the XLA while_loop, across
    multi-stripe grids including global top/bottom stripes, with a tail
    block (max_iter % t_block != 0) and nonzero flow init."""
    from opticalflow_ri_tpu.models.liu_shen import (
        liu_shen_precompute, liu_shen_solve,
    )
    from opticalflow_ri_tpu.ops.pallas.ls_tiled import (
        liu_shen_iterate_pallas_tiled, ls_stripe_height, ls_tiled_supports_pallas,
    )

    rng = np.random.default_rng(5)
    for (h, w, bh, t) in [(128, 256, 32, 8), (96, 128, 16, 12)]:
        a = jnp.asarray(rng.uniform(1, 255, (h, w)).astype(np.float32))
        b = jnp.asarray(rng.uniform(1, 255, (h, w)).astype(np.float32))
        u0 = jnp.asarray(rng.uniform(-0.5, 0.5, (h, w)).astype(np.float32))
        v0 = jnp.asarray(rng.uniform(-0.5, 0.5, (h, w)).astype(np.float32))

        ux, vx, ex = liu_shen_solve(a, b, 10.0, u0, v0, max_iter=30, tol=0.0,
                                    impl="xla")
        an = a / jnp.max(a)
        bn = b / jnp.max(b)
        fields = liu_shen_precompute(an, bn, 10.0)
        ut, vt, et = liu_shen_iterate_pallas_tiled(
            10.0, fields, u0, v0, max_iter=30, tol=0.0, t_block=t, bh=bh,
            interpret=True)
        np.testing.assert_allclose(np.asarray(ut), np.asarray(ux),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vt), np.asarray(vx),
                                   rtol=1e-5, atol=1e-6)
        # the error metric of the last iteration matches the reference's
        np.testing.assert_allclose(float(et), float(ex), rtol=1e-3)

    assert ls_tiled_supports_pallas((1024, 1024))
    assert ls_tiled_supports_pallas((2048, 2048))
    assert not ls_tiled_supports_pallas((100, 130))
    assert ls_stripe_height(2048, 2048, 20) >= 20


def test_ls_tiled_tol_hit_mid_block_overruns_at_most_t_minus_1():
    """Convergence semantics at a tolerance boundary: the tiled path checks
    the error once per T-iteration block, so when the reference's per-
    iteration check (ref: src/PhysicsBasedOpticalFlowLiuShen.py:88-89,:141)
    would stop at iteration k, the tiled path stops at the next block
    boundary ceil(k/T)*T — an overrun of at most T-1 iterations — and its
    output must equal the XLA path run for exactly that many iterations."""
    from opticalflow_ri_tpu.models.liu_shen import (
        liu_shen_iteration, liu_shen_precompute, liu_shen_solve,
    )
    from opticalflow_ri_tpu.ops.pallas.ls_tiled import (
        liu_shen_iterate_pallas_tiled,
    )

    rng = np.random.default_rng(11)
    h, w, t = 64, 128, 8
    a = jnp.asarray(rng.uniform(1, 255, (h, w)).astype(np.float32))
    b = jnp.asarray(rng.uniform(1, 255, (h, w)).astype(np.float32))
    z = jnp.zeros((h, w), jnp.float32)
    an = a / jnp.max(a)
    bn = b / jnp.max(b)
    fields = liu_shen_precompute(an, bn, 10.0)
    npix = float(h * w)

    # find the reference stopping iteration k for a tolerance that hits
    # mid-block (not a multiple of t)
    u, v = z, z
    errs = []
    for _ in range(40):
        u_new, v_new = liu_shen_iteration(u, v, fields, 10.0)
        errs.append(
            float(
                (jnp.linalg.norm(u_new - u) + jnp.linalg.norm(v_new - v)) / npix
            )
        )
        u, v = u_new, v_new
    # pick tol between errs[k-1] and errs[k] with k%t != 0 so the reference
    # would stop after k iterations, strictly inside a block
    k = 11
    assert k % t != 0
    tol = (errs[k - 1] + errs[k]) / 2.0
    assert errs[k] <= tol < errs[k - 1]

    ut, vt, et = liu_shen_iterate_pallas_tiled(
        10.0, fields, z, z, max_iter=40, tol=tol, t_block=t, bh=16,
        interpret=True)

    k_tiled = -(-k // t) * t  # next block boundary: overrun <= t-1
    ux, vx, ex = liu_shen_solve(a, b, 10.0, z, z, max_iter=k_tiled, tol=0.0,
                                impl="xla")
    np.testing.assert_allclose(np.asarray(ut), np.asarray(ux),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vt), np.asarray(vx),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(et), errs[k_tiled - 1], rtol=1e-3)
    # and the error it stopped at meets the tolerance
    assert float(et) <= tol


def test_validated_registry_matches_ab_artifact():
    """The no-unproven-kernel-default-ON rule, as a test: every kernel the
    default dispatch can select must have committed hardware A/B evidence —
    a compile-parity stage and a timed stage in scripts/pallas_ab_results.json
    (round 2 shipped an unmeasured kernel default-ON and crashed 5/10 bench
    configs on the TPU; see VERDICT.md)."""
    import json
    import os

    from opticalflow_ri_tpu.ops.pallas.validated import VALIDATED_KERNELS

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "scripts", "pallas_ab_results.json")
    with open(path) as f:
        ab = json.load(f)

    for kernel, (parity_stage, timed_stage) in VALIDATED_KERNELS.items():
        assert parity_stage in ab, f"{kernel}: no parity stage {parity_stage}"
        assert "max_abs_diff" in ab[parity_stage], (
            f"{kernel}: {parity_stage} has no hardware parity diff")
        # stages marked relative record diff/scale — hold them to a much
        # tighter bar so switching a stage to relative cannot quietly admit
        # a kernel that is 1e-3 RELATIVE off (0.25 absolute on an O(255)
        # field) under the absolute 1e-3 contract everyone else meets
        bar = 1e-5 if ab[parity_stage].get("relative") else 1e-3
        assert ab[parity_stage]["max_abs_diff"] <= bar, (
            f"{kernel}: hardware parity diff too large "
            f"({ab[parity_stage]['max_abs_diff']} > {bar})")
        assert timed_stage in ab, f"{kernel}: no timed stage {timed_stage}"
        timed = ab[timed_stage]
        assert any(k.endswith("marginal_ms") for k in timed), (
            f"{kernel}: {timed_stage} has no marginal timing")
        assert "skipped" not in timed, f"{kernel}: timed stage was skipped"


def test_default_dispatch_paths_all_validated(monkeypatch):
    """Force the dispatch policy ON and enumerate every impl the default
    ("auto") paths can return across representative shapes; each Pallas impl
    must map to a validated-registry entry."""
    import opticalflow_ri_tpu.ops.pallas as pp
    from opticalflow_ri_tpu.ops.pallas.validated import is_validated

    monkeypatch.setattr(pp, "pallas_default_on", lambda: True)

    from opticalflow_ri_tpu.models.horn_schunck import _pick_impl
    from opticalflow_ri_tpu.models.liu_shen import _ls_impl
    from opticalflow_ri_tpu.models.lucas_kanade import _lk_impl
    from opticalflow_ri_tpu.models.farneback import _um_impl

    impl_to_kernel = {
        ("hs", "pallas"): "hs_whole", ("hs", "pallas_tiled"): "hs_tiled",
        ("ls", "pallas"): "ls_whole", ("ls", "pallas_tiled"): "ls_tiled",
        ("lk", "pallas"): "lk_gn", ("um", "pallas"): "um",
        ("um", "pallas_channel"): "um_channel",
        ("um", "pallas_sparse"): "um_sparse",
        ("um", "pallas_channel_sparse"): "um_channel_sparse",
        ("um", "pallas_channel_sparse2d"): "um_channel_sparse2d",
    }
    shapes = [(256, 256), (512, 512), (1024, 1024), (2048, 2048), (500, 700)]
    for shape in shapes:
        for fam, impl in [
            ("hs", _pick_impl(shape)),
            ("ls", _ls_impl(shape)),
            ("lk", _lk_impl(shape[0], shape[1], 6)),
            ("um", _um_impl((5,) + shape)),
        ]:
            if impl == "xla":
                continue
            kernel = impl_to_kernel[(fam, impl)]
            assert is_validated(kernel), (
                f"default dispatch for {fam}@{shape} selects unproven "
                f"kernel {kernel}")

    # large-image sub-dispatches are registry-gated too: the validated
    # stripe-staged LK path engages at 2048^2, while the unregistered
    # fused FB loop must stay off the default path everywhere
    from opticalflow_ri_tpu.models.lucas_kanade import (
        _lk_build_impl, _lk_striped_impl)

    assert not _lk_build_impl(2048, 2048, 5)
    assert _lk_striped_impl(2048, 2048, 5)


def test_lk_build_pallas_matches_xla_build_interpret():
    """Band-resident shift-plane build kernel is bit-identical to the XLA
    hierarchical build (same windowed_sum_axis decomposition, same order)."""
    from jax import lax

    from opticalflow_ri_tpu.models.lucas_kanade import (
        lk_build_planes, _GRID)
    from opticalflow_ri_tpu.oracle.lucas_kanade import window_mask
    from opticalflow_ri_tpu.ops.pallas.lk_build import (
        lk_build_planes_pallas, lk_build_supports_pallas)
    from opticalflow_ri_tpu.ops.window_sums import runs_from_mask

    rng = np.random.default_rng(7)
    hw, R = 13, 5
    runs = runs_from_mask(window_mask(2 * hw + 1, 0, 0))
    runs_asym = runs_from_mask(window_mask(2 * hw + 1, 1, 0))
    for (h, w), (ry, rx) in [((64, 128), (runs, runs)),
                             ((72, 200), (runs, runs_asym))]:
        pad = hw + (_GRID - hw) + R + 1
        im = rng.uniform(0, 255, (h, w)).astype(np.float32)
        jpad = jnp.pad(jnp.asarray(im), pad, mode="edge")
        gp = jnp.asarray(rng.normal(0, 50, (2, h + _GRID - 1, w + _GRID - 1))
                         .astype(np.float32))
        oi = pad - hw
        slab = lax.dynamic_slice(
            jpad, (oi - R, oi - R),
            (h + _GRID - 1 + 2 * R, w + _GRID - 1 + 2 * R))
        # the dispatch gate excludes sub-128 bands (halo-dominated) but the
        # kernel itself is exercised here at any aligned shape
        for mode in (True, "ladder"):
            t1x, t2x = lk_build_planes(slab, gp, ry, rx, hw, h, w, R,
                                       hierarchical=mode)
            t1p, t2p = lk_build_planes_pallas(slab, gp, hw, R, ry, rx,
                                              mode=mode, interpret=True)
            np.testing.assert_array_equal(np.asarray(t1p), np.asarray(t1x))
            np.testing.assert_array_equal(np.asarray(t2p), np.asarray(t2x))


def test_lk_build_dispatch_envelope():
    """The band chooser's VMEM model (calibrated against hardware OOM
    reports) admits the proven shapes and excludes the OOM'd ones."""
    from opticalflow_ri_tpu.ops.pallas.lk_build import (
        _build_band, lk_build_supports_pallas)

    assert _build_band(512, 512, 11) == 512      # compiled+ran, 1.31 ms
    assert _build_band(1024, 1024, 11) == 256    # band 512 OOM'd at 113.4M
    assert lk_build_supports_pallas(512, 512, 5)
    assert lk_build_supports_pallas(1024, 1024, 5)
    # 2048^2: best fitting band is 64 — halo-dominated, kernel stays out
    assert not lk_build_supports_pallas(2048, 2048, 5)
    assert not lk_build_supports_pallas(500, 700, 5)  # h % 8 != 0


def test_um_channel_pallas_matches_xla_interpret():
    """Channel-blocked tent sampler (for fields beyond all-channel VMEM
    residency) matches the XLA update_matrices to f32 round-off — the
    separable weight factorisation reorders the contraction, so parity is
    relative, not bit-identical."""
    from opticalflow_ri_tpu.models.farneback import (
        poly_expansion, update_matrices)
    from opticalflow_ri_tpu.ops.pallas.tent_sample import (
        update_matrices_channel_pallas)

    rng = np.random.default_rng(11)
    im1 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    ra = poly_expansion(im1, 7, 1.5)
    rb = poly_expansion(im2, 7, 1.5)
    fx = jnp.asarray(rng.uniform(-5, 5, (64, 128)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-5, 5, (64, 128)).astype(np.float32))

    m_ref = update_matrices(fx, fy, ra, rb, 6)  # same R on both sides — the
    # +-5 px test flows straddle the R=5 default's clamp boundary
    m_pal = update_matrices_channel_pallas(fx, fy, ra, rb, 6, band=16,
                                           interpret=True)
    scale = float(jnp.max(jnp.abs(m_ref)))
    np.testing.assert_allclose(
        np.asarray(m_pal), np.asarray(m_ref), atol=2e-6 * scale, rtol=1e-4)


def test_lk_striped_build_gn_matches_xla_interpret(monkeypatch):
    """Stripe-staged build+GN (large-image path: per-stripe Pallas build ->
    per-stripe GN with global row0/img dims through the SMEM scalar) == the
    XLA path.  Stripe height forced small so multiple stripes exercise the
    row0 != 0 coordinate handling."""
    import opticalflow_ri_tpu.ops.pallas.lk_iter as lki
    import opticalflow_ri_tpu.ops.pallas.lk_build as lkb
    from opticalflow_ri_tpu.models.lucas_kanade import lk_dense_solve

    rng = np.random.default_rng(9)
    im1 = jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32))
    im2 = jnp.roll(im1, (1, 2), axis=(0, 1)) + jnp.asarray(
        rng.normal(0, 2, (96, 128)).astype(np.float32)
    )
    u0 = jnp.full((96, 128), 0.25, jnp.float32)
    v0 = jnp.full((96, 128), -0.5, jnp.float32)

    u_x, v_x, s_x = lk_dense_solve(im1, im2, u0, v0, max_shift=2, impl="xla")

    orig = lki.lk_gn_iterate_pallas
    monkeypatch.setattr(
        lki, "lk_gn_iterate_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    orig_b = lkb.lk_build_planes_pallas
    monkeypatch.setattr(
        lkb, "lk_build_planes_pallas",
        lambda *a, **k: orig_b(*a, **{**k, "interpret": True}),
    )
    monkeypatch.setattr(lkb, "lk_striped_height", lambda h, w, r: 32)
    u_p, v_p, s_p = lk_dense_solve(im1, im2, u0, v0, max_shift=2,
                                   impl="pallas_striped")

    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))


def test_blur5_flow_banded_matches_whole_interpret():
    """Banded DMA-slab blur5+updateFlow (large-field path) is BIT-IDENTICAL
    to the whole-VMEM kernel (same op order, slab-streamed), both border
    modes.  (A raw-noise M makes the 2x2 solve ill-conditioned, so the
    stencil-path comparison lives in the well-conditioned full-solve tests.)"""
    from opticalflow_ri_tpu.models.farneback import _blur_kernel
    from opticalflow_ri_tpu.ops.pallas.blur5_flow import (
        blur5_flow_banded_pallas, blur5_flow_banded_supports,
        blur5_flow_pallas)

    rng = np.random.default_rng(17)
    m = jnp.asarray(rng.normal(0, 1, (5, 64, 128)).astype(np.float32))

    kg = tuple(float(x) for x in _blur_kernel(33, 33 / 2 * 0.3))
    fxw, fyw = blur5_flow_pallas(m, kg, "mirror", 1.0, interpret=True)
    fxb, fyb = blur5_flow_banded_pallas(m, kg, "mirror", 1.0, band=8,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(fxb), np.asarray(fxw))
    np.testing.assert_array_equal(np.asarray(fyb), np.asarray(fyw))

    kb = tuple([1.0] * 33)
    fxw, fyw = blur5_flow_pallas(m, kb, "nearest", 1.0 / 33 ** 2,
                                 interpret=True)
    fxb, fyb = blur5_flow_banded_pallas(m, kb, "nearest", 1.0 / 33 ** 2,
                                        band=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(fxb), np.asarray(fxw))
    np.testing.assert_array_equal(np.asarray(fyb), np.asarray(fyw))

    assert blur5_flow_banded_supports((5, 2048, 2048), 33)
    assert not blur5_flow_banded_supports((5, 2050, 2048), 33)


def test_fb_fused2_matmul_fold_matches_unfused_interpret():
    """Fused iteration loop v2 (matmul-fold blur, store-free body) == the
    unfused XLA sequence for both window-blur modes."""
    from opticalflow_ri_tpu.models.farneback import (
        poly_expansion, update_matrices, _blur_flow_dispatch,
        _window_blur_spec,
    )
    from opticalflow_ri_tpu.ops.pallas.fb_fused2 import (
        fb_fused2_pallas, fb_fused2_supports_pallas)

    rng = np.random.default_rng(23)
    im1 = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    im2 = jnp.roll(im1, (1, 2), axis=(0, 1)) + jnp.asarray(
        rng.normal(0, 2, (64, 128)).astype(np.float32))
    r0 = poly_expansion(im1, 7, 1.5)
    r1 = poly_expansion(im2, 7, 1.5)
    z = jnp.zeros((64, 128), jnp.float32)

    for use_gaussian in (True, False):
        fx, fy = z, z
        m = update_matrices(fx, fy, r0, r1)
        for i in range(3):
            fx, fy = _blur_flow_dispatch(m, 33, use_gaussian, impl="xla")
            if i < 2:
                m = update_matrices(fx, fy, r0, r1)

        k, mode, scale = _window_blur_spec(33, use_gaussian)
        ff, gf = fb_fused2_pallas(r0, r1, z, z, 3,
                                  tuple(float(x) for x in k), mode, scale,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(ff), np.asarray(fx),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(fy),
                                   rtol=1e-4, atol=1e-4)

    # hardware-probed negative result: the unrolled loop body scoped-VMEM
    # OOMs (343 MB of 128 at 512^2), so the kernel is never supported
    # compiled — interpret mode above documents the semantics
    assert not fb_fused2_supports_pallas((512, 512), 5, 33)
    assert not fb_fused2_supports_pallas((1024, 1024), 5, 33)


def test_warp_tent_pallas_matches_xla_interpret():
    """Pallas driver-warp kernel (both images, one launch, separable
    weights) == the XLA tent contraction to f32 round-off."""
    from opticalflow_ri_tpu.ops.warp import displacement_warp_tent
    from opticalflow_ri_tpu.ops.pallas.warp_tent import (
        warp_pair_tent_pallas, warp_tent_supports_pallas)

    rng = np.random.default_rng(29)
    im1 = jnp.asarray(rng.uniform(0, 255, (48, 136)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (48, 136)).astype(np.float32))
    u = jnp.asarray(rng.uniform(-6, 6, (48, 136)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-6, 6, (48, 136)).astype(np.float32))

    w1r = displacement_warp_tent(im1, -v / 2, -u / 2, 8)
    w2r = displacement_warp_tent(im2, v / 2, u / 2, 8)
    for sp in (False, True):   # dense and shift-skipping sparse variants
        w1p, w2p = warp_pair_tent_pallas(im1, im2, -v / 2, -u / 2,
                                         v / 2, u / 2, 8, interpret=True,
                                         sparse=sp)
        np.testing.assert_allclose(np.asarray(w1p), np.asarray(w1r),
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(w2p), np.asarray(w2r),
                                   rtol=1e-5, atol=1e-3)

    assert warp_tent_supports_pallas((512, 512), 8)
    assert warp_tent_supports_pallas((2048, 2048), 8)
    assert not warp_tent_supports_pallas((4096, 4096), 8)
