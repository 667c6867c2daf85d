"""MXU banded-matmul correlation (ops/matmul_filter.py) vs the VPU
shift-and-accumulate stencil path.  CPU: numerical parity is round-off level
(the matmul reduces in a different association order, so exact equality is
not expected — the hardware A/B stages in scripts/pallas_ab_results.json
carry the compiled-path evidence)."""

import numpy as np
import jax.numpy as jnp
import pytest

from opticalflow_ri_tpu.ops.stencil import correlate1d
from opticalflow_ri_tpu.ops.matmul_filter import (
    blur5_flow_matmul, matmul_correlate1d, matmul_supports, pick_block,
)
from opticalflow_ri_tpu.models.farneback import (
    _window_blur_spec, box_filter5, gaussian_blur5, update_flow,
)


@pytest.mark.parametrize("axis", [-2, -1])
@pytest.mark.parametrize("mode", ["mirror", "nearest"])
def test_matmul_correlate1d_matches_stencil(axis, mode):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (5, 64, 128)).astype(np.float32))
    k = _window_blur_spec(33, True)[0]
    ref = correlate1d(x, k, axis=axis, mode=mode)
    got = matmul_correlate1d(x, k, axis=axis, mode=mode, block=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-4)


@pytest.mark.parametrize("use_gaussian", [True, False])
def test_blur5_flow_matmul_matches_reference_path(use_gaussian):
    # realistic PSD-ish M field: products keep the 2x2 solve well conditioned
    # (on raw random data the det sits at the 1e-3 regulariser and round-off
    # differences blow up through the reciprocal)
    rng = np.random.default_rng(1)
    a = rng.uniform(0.2, 1.0, (64, 128)).astype(np.float32)
    b = rng.uniform(0.2, 1.0, (64, 128)).astype(np.float32)
    c = rng.uniform(-0.5, 0.5, (64, 128)).astype(np.float32)
    d = rng.uniform(-0.5, 0.5, (64, 128)).astype(np.float32)
    m = jnp.asarray(np.stack([a * a + c * c, (a + b) * c, b * b + c * c,
                              a * d, c * d]))
    taps_np, mode, scale = _window_blur_spec(33, use_gaussian)
    taps = tuple(float(w) for w in taps_np)
    fx, fy = blur5_flow_matmul(m, taps, mode, scale, block=32)
    if use_gaussian:
        ref = update_flow(gaussian_blur5(m, 33, 33 / 2 * 0.3))
    else:
        ref = update_flow(box_filter5(m, 16))
    np.testing.assert_allclose(np.asarray(fx), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(ref[1]),
                               rtol=1e-4, atol=1e-4)


def test_matmul_supports_guards():
    assert matmul_supports((5, 512, 512), 33)
    assert matmul_supports((5, 2048, 2048), 33)
    assert not matmul_supports((5, 500, 512), 33)   # indivisible rows
    assert not matmul_supports((5, 512, 500), 33)   # indivisible cols
    assert not matmul_supports((5, 512, 512), 5)    # narrow stencil stays VPU
    assert pick_block(2048) == 256
    assert pick_block(96) == 32
    assert pick_block(100) is None


def test_poly_expansion_matmul_matches_vpu():
    from opticalflow_ri_tpu.models.farneback import poly_expansion

    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    ref = poly_expansion(src, 7, 1.5, impl="vpu")
    got = poly_expansion(src, 7, 1.5, impl="matmul")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-2)


def test_xla_pinned_solve_never_takes_matmul_paths(monkeypatch):
    """An impl='xla' Farneback solve must stay pure XLA-stencil end to end
    even at matmul-eligible sizes — hardware A/B baselines depend on the
    pin (poly_expansion's own 'auto' once leaked the MXU path in)."""
    import jax
    import opticalflow_ri_tpu.ops.matmul_filter as mf
    from opticalflow_ri_tpu.models.farneback import farneback_solve
    from opticalflow_ri_tpu.ops.pallas import validated as val

    def boom(*a, **k):
        raise AssertionError("matmul path reached under impl='xla'")

    monkeypatch.setattr(mf, "matmul_correlate1d_multi", boom)
    # make every registry gate pass so only the impl pin stands in the way
    monkeypatch.setattr(val, "VALIDATED_KERNELS",
                        dict(val.VALIDATED_KERNELS,
                             blur5_matmul=("x", "y"), poly_matmul=("x", "y")))
    z = jnp.zeros((2048, 2048), jnp.float32)
    jax.eval_shape(
        lambda a, b: farneback_solve.__wrapped__(a, b, b * 0, b * 0,
                                                 impl="xla"), z, z)


def test_dispatch_prefers_matmul_beyond_vmem_when_validated(monkeypatch):
    """Once 'blur5_matmul' is registered, the big-shape blur dispatch must
    route to the MXU path (and never silently fall back to banded)."""
    import opticalflow_ri_tpu.models.farneback as fbm
    import opticalflow_ri_tpu.ops.matmul_filter as mf
    from opticalflow_ri_tpu.ops.pallas import validated as val

    called = {}

    def spy(m, taps, mode, scale, block=None):
        called["hit"] = True
        return m[3], m[4]

    monkeypatch.setattr(fbm, "blur5_flow_matmul", spy, raising=False)
    monkeypatch.setattr(mf, "blur5_flow_matmul", spy)
    def kernel_spy(m, taps, mode, scale):
        called["kernel"] = True
        return m[3], m[4]

    import opticalflow_ri_tpu.ops.pallas.blur5_flow as b5
    monkeypatch.setattr(b5, "blur5_flow_pallas", kernel_spy)
    monkeypatch.setattr(val, "VALIDATED_KERNELS",
                        dict(val.VALIDATED_KERNELS,
                             blur5_matmul=("blur5_matmul_compiled",
                                           "blur5_matmul_2048")))
    # 2048^2 (beyond whole-M VMEM residency) and 1024^2 (matmul measured
    # 1.7x the whole-VMEM kernel, scripts/fb_mm_1024_probe.json) -> matmul
    for side in (2048, 1024):
        called.clear()
        m = jnp.zeros((5, side, side), jnp.float32)
        fbm._blur_flow_dispatch(m, 33, True, impl="pallas")
        assert called.get("hit"), f"{side}^2 dispatch did not route to matmul"
    # 512^2 stays on the whole-VMEM kernel
    called.clear()
    m = jnp.zeros((5, 512, 512), jnp.float32)
    fbm._blur_flow_dispatch(m, 33, True, impl="pallas")
    assert called.get("kernel") and not called.get("hit"), (
        "512^2 dispatch should stay on the whole-VMEM kernel")
