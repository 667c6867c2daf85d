"""Horn-Schunck global-smoothness optical flow, TPU-native.

Functional re-design of the reference's Numba/scipy implementation
(ref: src/HornSchunck.py): the whole Jacobi relaxation — neighbour-weighted
averaging plus the fused update — runs as a single jitted ``lax.fori_loop``
so every iteration is one fused VPU pass over VMEM-resident tiles instead of
the reference's per-iteration scipy convolution + Numba kernel round trip
(ref: src/HornSchunck.py:62-71).

Numerics parity notes:
  * the derivative stencils and the frame-role swap quirk
    (ref: src/HornSchunck.py:37 calls HS(im1, im2, ...) whose parameters are
    declared (im2, im1, ...)) are folded into ``ops.stencil.hs_derivatives``;
  * the 3x3 averaging kernel [[1/12,1/6,1/12],[1/6,0,1/6],[1/12,1/6,1/12]]
    and its 'mirror' border match ref: src/HornSchunck.py:87-89, :66-68;
  * the denominator alpha^2 + fx^2 + fy^2 is iteration-invariant and hoisted;
  * the returned scalar error is the same normalised Frobenius delta between
    the final flow and the *input* flow (ref: src/HornSchunck.py:100);
  * the adapter keeps the reference's stateful alpha-list pop semantics —
    one alpha consumed per compute() call, last-constructed first, so the
    coarsest pyramid level receives the final list entry
    (ref: src/HornSchunck.py:36).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from opticalflow_ri_tpu.ops.stencil import hs_avg3x3, hs_derivatives

HS_AVG_KERNEL = np.array(
    [
        [1.0 / 12, 1.0 / 6, 1.0 / 12],
        [1.0 / 6, 0.0, 1.0 / 6],
        [1.0 / 12, 1.0 / 6, 1.0 / 12],
    ],
    dtype=np.float32,
)


def _pick_impl(shape) -> str:
    """Use the Pallas fused kernels on TPU for cleanly-tiled shapes, the XLA
    loop elsewhere (CPU tests, odd shapes, batched/vmapped calls).

    Hardware A/B (scripts/pallas_ab_results.json, min-estimator over 5
    repeats): since the separable neighbour average landed in the kernel
    body, the whole-state VMEM-resident kernel beats the XLA fori_loop at
    512^2 too (0.29 vs 0.73 ms per 100 Jacobi iterations, bit-identical
    output) — an earlier 'XLA wins at 512^2' determination predates that
    change.  Beyond whole-state VMEM residency the temporal-blocked tiled
    kernel takes over: 1.39x at 1024^2 (2.77 vs 3.86 ms) and 4.45x at 2048^2
    (9.19 vs 40.9 ms), parity 3.3e-6 over 100 iterations.
    """
    from opticalflow_ri_tpu.ops.pallas import pallas_default_on
    from opticalflow_ri_tpu.ops.pallas.validated import is_validated

    if not pallas_default_on():
        return "xla"
    from opticalflow_ri_tpu.ops.pallas.hs_iter import hs_supports_pallas
    from opticalflow_ri_tpu.ops.pallas.hs_tiled import hs_tiled_supports_pallas

    if hs_supports_pallas(shape) and is_validated("hs_whole"):
        return "pallas"
    if hs_tiled_supports_pallas(shape) and is_validated("hs_tiled"):
        return "pallas_tiled"
    return "xla"


@partial(jax.jit, static_argnames=("niter", "impl"))
def hs_solve(im1, im2, alpha, niter: int, u0, v0, impl: str = "xla"):
    """Run ``niter`` Jacobi iterations; returns (U, V, error).

    ``im1``/``im2`` are frames at t=0/t=1 (driver order); the temporal
    derivative sign convention matches the reference's effective computation.
    ``impl``: "xla" (fused fori_loop) or "pallas" (whole-state VMEM-resident
    kernel, TPU only).
    """
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    u0 = u0.astype(jnp.float32)
    v0 = v0.astype(jnp.float32)
    alpha = jnp.float32(alpha)

    fx, fy, ft = hs_derivatives(im1, im2)

    if impl == "pallas":
        from opticalflow_ri_tpu.ops.pallas.hs_iter import hs_iterate_pallas

        u, v = hs_iterate_pallas(fx, fy, ft, u0, v0, alpha, niter)
    elif impl == "pallas_tiled":
        from opticalflow_ri_tpu.ops.pallas.hs_tiled import hs_iterate_pallas_tiled

        u, v = hs_iterate_pallas_tiled(fx, fy, ft, u0, v0, alpha, niter)
    else:
        # reciprocal hoisted out of the loop (f32 division costs a
        # reciprocal + Newton steps per iteration otherwise); separable
        # neighbour average — see ops.stencil.hs_avg3x3
        rdenom = 1.0 / (alpha * alpha + fx * fx + fy * fy)

        def body(_, uv):
            u, v = uv
            u_avg = hs_avg3x3(u, "mirror")
            v_avg = hs_avg3x3(v, "mirror")
            der = (fx * u_avg + fy * v_avg + ft) * rdenom
            return (u_avg - fx * der, v_avg - fy * der)

        u, v = lax.fori_loop(0, niter, body, (u0, v0))

    npix = im1.shape[-2] * im1.shape[-1]
    err = (
        jnp.linalg.norm(u - u0) + jnp.linalg.norm(v - v0)
    ) / jnp.float32(npix)
    return u, v, err


def hs_iteration_stencil(u, v, fx, fy, ft, denom):
    """One Jacobi update given precomputed derivative fields — shared by the
    single-chip solver, the Pallas fused kernel and the sharded halo path."""
    u_avg = hs_avg3x3(u, "mirror")
    v_avg = hs_avg3x3(v, "mirror")
    der = (fx * u_avg + fy * v_avg + ft) / denom
    return u_avg - fx * der, v_avg - fy * der


class HSOpticalFlowAlgoAdapter:
    """Driver adapter with reference-identical protocol and alpha-list state."""

    def __init__(self, alphas, Niter: int, provideGenericPyramidalDefaults: bool = True,
                 impl: str = "auto"):
        self.provideGenericPyramidalDefaults = provideGenericPyramidalDefaults
        self.alphas = list(alphas)
        self.Niter = int(Niter)
        self.impl = impl

    def compute(self, im1, im2, U, V):
        alpha = self.alphas.pop()
        im1 = jnp.asarray(im1)

        # kernel-sharded context (parallel/context.py): inside an
        # auto-sharded pipeline trace, route the solve through the
        # shard_map-composed tiled kernel on the context's mesh so
        # multi-chip runs keep the validated kernels; per-solve graceful
        # fallback when the local tiles don't support it
        from opticalflow_ri_tpu.parallel.context import current_kernel_shard

        ctx = current_kernel_shard()
        if ctx is not None and self.impl == "auto":
            mesh, interp = ctx
            from opticalflow_ri_tpu.parallel.sharded_pallas import (
                hs_solve_sharded_kernel, pick_hs_shard_t,
            )

            t = pick_hs_shard_t(mesh, im1.shape, interp)
            if t is not None:
                return hs_solve_sharded_kernel(
                    mesh, im1, jnp.asarray(im2), float(alpha), self.Niter,
                    jnp.asarray(U), jnp.asarray(V), t_block=t,
                    interpret=interp,
                )

        impl = _pick_impl(im1.shape) if self.impl == "auto" else self.impl
        u, v, err = hs_solve(
            im1, jnp.asarray(im2), float(alpha), self.Niter,
            jnp.asarray(U), jnp.asarray(V), impl=impl,
        )
        return u, v, err

    def getAlgoName(self):
        return "Horn-Schunck"

    def hasGenericPyramidalDefaults(self):
        return self.provideGenericPyramidalDefaults

    def getGenericPyramidalDefaults(self):
        return {"warping": True, "biLinear": True, "scaling": True}
