"""Auto-sharded execution of whole pipelines over a device mesh.

Two routes, resolved per (config, mesh, shape) at trace time:

1. **Kernel-sharded** (preferred): single-level Horn-Schunck configurations
   run prefilter + solve inside ``shard_map`` with every device executing the
   hardware-validated temporal-blocked Pallas kernel on its local tile and
   T-deep ppermute halo exchanges between launches
   (parallel/sharded_pallas.py) — a multi-chip run keeps the single-chip
   kernel wins.
2. **GSPMD**: any other configuration is traced with XLA-only solver bodies
   (``force_xla``) and annotated with a ('y', 'x') spatial sharding
   (optionally 'batch'); XLA's SPMD partitioner inserts the halo exchanges
   and collectives: stencil shift-sums become neighbour ppermutes, resize
   matmuls become collective matmuls, reductions become all-reduces — all
   riding ICI.  (GSPMD cannot partition a Pallas custom call, hence the
   kernel-sharded route above for the configs that dominate throughput.)

    mesh = make_mesh(8)
    fn = auto_sharded_pipeline("PyHSchunck_Fs3_4", mesh)
    U, V = fn(im1, im2)          # executes across all 8 devices

Numerical parity with the single-device run is asserted in tests for both
routes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
from functools import partial

from opticalflow_ri_tpu.compile import pipeline_fn

# single-level Horn-Schunck configs: pipeline == calibrated prefilter + one
# HS solve, exactly what the kernel-sharded step implements
_HS_SINGLE_LEVEL = {"PyHSchunck_Fs3_4", "HS_Fs3_4", "HS_Fs0_0"}


def hs_kernel_sharded_eligible(name: str, mesh: Mesh, shape,
                               interpret: bool = False):
    """T-block when ``auto_sharded_pipeline`` will route ``name`` to the
    kernel-sharded path instead of force_xla GSPMD; None otherwise.
    (pick_hs_shard_t is the single source of tile-shape truth, shared with
    the adapter-level solver context.)"""
    if name not in _HS_SINGLE_LEVEL:
        return None
    from opticalflow_ri_tpu.ops.pallas import pallas_default_on
    from opticalflow_ri_tpu.ops.pallas.validated import is_validated
    from opticalflow_ri_tpu.parallel.sharded_pallas import pick_hs_shard_t

    if not (pallas_default_on() and is_validated("hs_tiled")):
        return None
    return pick_hs_shard_t(mesh, shape, interpret)


def _hs_config_kernel_sharded(name: str, mesh: Mesh, t_block: int,
                              interpret: bool):
    """shard_map'd (im1, im2) -> (U, V) for a single-level HS config: local
    calibrated prefilter + per-device Pallas Jacobi kernel with halo
    exchanges (ref pipeline: src/GenericPyramidalOpticalFlow.py:368-414 at
    pyramidalLevels=1)."""
    from opticalflow_ri_tpu.configs import build_config
    from opticalflow_ri_tpu.parallel.sharded import _prefilter_local
    from opticalflow_ri_tpu.parallel.sharded_pallas import (
        _hs_body_shardkernel,
    )
    from opticalflow_ri_tpu.ops.pallas.hs_tiled import stripe_height

    cfg = build_config(name)
    adapter = cfg.main()
    alpha = float(adapter.alphas[-1])
    niter = adapter.Niter
    sigma = cfg.filter_sigma
    spec = P("y", "x")

    def sharded(im1, im2):
        my = mesh.shape["y"]
        mx = mesh.shape["x"]
        bh = stripe_height(im1.shape[-2] // my, im1.shape[-1] // mx, t_block)

        def step(a, b):
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32)
            if sigma > 1e-3:
                a = _prefilter_local(a, sigma, 3)
                b = _prefilter_local(b, sigma, 3)
            z = jnp.zeros_like(a)
            u, v, _ = _hs_body_shardkernel(
                a, b, z, z, alpha=alpha, niter=niter, t_block=t_block,
                bh=bh, interpret=interpret,
            )
            return u, v

        f = shard_map(step, mesh=mesh, in_specs=(spec, spec),
                      out_specs=(spec, spec), check_vma=False)
        return f(im1, im2)

    return sharded


def auto_sharded_pipeline(name: str, mesh: Mesh, batch: bool = False,
                          kernel_interpret: bool = False,
                          _force_sharded: bool = False):
    """Jitted (im1, im2) -> (U, V) running SPMD over ``mesh``.

    ``batch=True`` expects (B, H, W) inputs and additionally shards the
    leading axis over the mesh's 'batch' axis.  ``kernel_interpret=True``
    runs the kernel-sharded route's Pallas kernels in interpreter mode
    (CPU-mesh validation).

    A single-device mesh short-circuits to the plain compiled pipeline —
    there is nothing to decompose, and the unsharded dispatch (whole-solve
    kernels, single launches) is strictly faster than paying the sharded
    schedule's T-launch structure for no halo benefit (hardware A/B:
    ``sharded_pyramid`` stages).  ``_force_sharded=True`` disables the
    shortcut for measurement.
    """
    if mesh.size == 1 and not _force_sharded:
        from opticalflow_ri_tpu.compile import compiled_pipeline, scan_pipeline

        # scan_pipeline has the same (B, H, W)-stack contract as the batched
        # route and is the production batch construct (the vmapped
        # batched_pipeline is deprecated, ~4.7x slower)
        return scan_pipeline(name) if batch else compiled_pipeline(name)

    spec = P("batch", "y", "x") if batch else P("y", "x")
    sharding = NamedSharding(mesh, spec)
    fn = pipeline_fn(name)
    if batch:
        import warnings

        # vmapping the pipeline pins every solver to XLA (shard_map inside
        # vmap is not a supported composition), so this route forfeits the
        # validated kernels.  The campaign construct that KEEPS them is
        # batch_sharded_scan (parallel/batch_stream.py): shard_map over the
        # 'batch' axis with a per-device validated-kernel scan stream.
        warnings.warn(
            "auto_sharded_pipeline(batch=True) on a multi-device mesh runs "
            "pure-GSPMD XLA (no Pallas kernels); for campaign streaming use "
            "parallel.batch_sharded_scan, which keeps the validated kernels "
            "per device",
            stacklevel=2,
        )
        fn = jax.vmap(fn)

    def wrapped(im1, im2):
        import contextlib

        from opticalflow_ri_tpu.ops.pallas import force_xla, pallas_default_on
        from opticalflow_ri_tpu.parallel.context import kernel_sharded_solvers

        im1 = jax.lax.with_sharding_constraint(im1, sharding)
        im2 = jax.lax.with_sharding_constraint(im2, sharding)
        t_blk = (
            hs_kernel_sharded_eligible(name, mesh, im1.shape,
                                       interpret=kernel_interpret)
            if not batch else None
        )
        if t_blk is not None:
            u, v = _hs_config_kernel_sharded(
                name, mesh, t_blk, kernel_interpret)(im1, im2)
        else:
            # GSPMD route: trace the XLA ops, which partition into halo
            # exchanges and collectives (Pallas calls would replicate) —
            # EXCEPT the HS/LS solver bodies, which the kernel-sharded
            # context (parallel/context.py) routes through shard_map-composed
            # validated kernels per level when the policy and tile shapes
            # allow (multi-chip pyramids keep single-chip kernels too).
            # (batch=True vmaps the pipeline — shard_map inside vmap is not
            # a supported composition, so batched runs stay pure GSPMD)
            use_kernels = not batch and (pallas_default_on() or kernel_interpret)
            solver_ctx = (
                kernel_sharded_solvers(mesh, kernel_interpret)
                if use_kernels else contextlib.nullcontext()
            )
            with force_xla(), solver_ctx:
                u, v = fn(im1, im2)
        return (
            jax.lax.with_sharding_constraint(u, sharding),
            jax.lax.with_sharding_constraint(v, sharding),
        )

    return jax.jit(wrapped, in_shardings=(sharding, sharding))
