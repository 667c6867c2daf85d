"""GSPMD auto-sharded execution of whole pipelines.

Complementing the hand-tuned shard_map solvers (parallel/sharded.py), this
module runs ANY compiled configuration SPMD over a mesh by annotating the
input images with a ('y', 'x') spatial sharding (optionally 'batch') and
letting XLA's SPMD partitioner insert the halo exchanges and collectives:
stencil shift-sums become neighbour ppermutes, resize matmuls become
collective matmuls, reductions become all-reduces — all riding ICI.

    mesh = make_mesh(8)
    fn = auto_sharded_pipeline("PyHSchunck_Fs3_4", mesh)
    U, V = fn(im1, im2)          # executes across all 8 devices

Numerical parity with the single-device run is asserted in tests.
"""

from __future__ import annotations

from functools import lru_cache

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opticalflow_ri_tpu.compile import pipeline_fn


def auto_sharded_pipeline(name: str, mesh: Mesh, batch: bool = False):
    """Jitted (im1, im2) -> (U, V) running SPMD over ``mesh``.

    ``batch=True`` expects (B, H, W) inputs and additionally shards the
    leading axis over the mesh's 'batch' axis.
    """
    spec = P("batch", "y", "x") if batch else P("y", "x")
    sharding = NamedSharding(mesh, spec)
    fn = pipeline_fn(name)
    if batch:
        fn = jax.vmap(fn)

    def wrapped(im1, im2):
        from opticalflow_ri_tpu.ops.pallas import force_xla

        im1 = jax.lax.with_sharding_constraint(im1, sharding)
        im2 = jax.lax.with_sharding_constraint(im2, sharding)
        # GSPMD cannot partition Pallas custom calls (it would replicate the
        # whole solve on every device); trace the XLA ops, which partition
        # into halo exchanges and collectives.
        with force_xla():
            u, v = fn(im1, im2)
        return (
            jax.lax.with_sharding_constraint(u, sharding),
            jax.lax.with_sharding_constraint(v, sharding),
        )

    return jax.jit(wrapped, in_shardings=(sharding, sharding))
