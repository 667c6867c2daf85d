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


def test_hs_supports_pallas_gating():
    assert hk.hs_supports_pallas((512, 512))
    assert not hk.hs_supports_pallas((513, 512))   # sublane misalignment
    assert not hk.hs_supports_pallas((512, 500))   # lane misalignment
    assert not hk.hs_supports_pallas((2048, 2048))  # exceeds VMEM budget
