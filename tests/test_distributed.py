"""Multi-host glue (parallel/distributed.py) exercised for real.

jax.distributed supports a single-process cluster (coordinator on
localhost), which drives the exact code path a multi-host launch uses:
distributed service init -> global mesh -> make_array_from_process_local_data
-> sharded pipeline.  Runs in a subprocess because jax.distributed must be
initialised before ANY backend use, and the test session's backend is already
live.
"""

import os
import subprocess
import sys

import numpy as np

_CHILD = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import numpy as np
from opticalflow_ri_tpu.parallel import distributed as dist

# must work BEFORE any backend-initialising call (regression: the old guard
# called jax.process_count() first, which broke every real launch)
dist.initialize(coordinator_address="localhost:12421", num_processes=1,
                process_id=0)
assert jax.distributed.is_initialized()
assert jax.process_count() == 1

# second call is a no-op, not an error
dist.initialize()

mesh = dist.global_mesh(batch=2)
assert mesh.shape == {"batch": 2, "y": 2, "x": 2}, mesh.shape

rng = np.random.default_rng(0)
b1 = rng.uniform(0, 255, (4, 32, 32)).astype(np.float32)
b2 = rng.uniform(0, 255, (4, 32, 32)).astype(np.float32)
g1, g2 = dist.shard_batch_global(mesh, b1, b2)
assert g1.shape == (4, 32, 32)

from opticalflow_ri_tpu.parallel.sharded import batched_hs_pipeline
from opticalflow_ri_tpu.models.horn_schunck import hs_solve
from opticalflow_ri_tpu.ops.gaussian import gaussian_filter_px
import jax.numpy as jnp

u, v, err = batched_hs_pipeline(mesh, g1, g2, niter=5)
assert np.isfinite(np.asarray(err)).all()

# parity vs the unsharded pipeline on the same host-local data
def one(a, b):
    f1 = gaussian_filter_px(a, 3.4, 3)
    f2 = gaussian_filter_px(b, 3.4, 3)
    z = jnp.zeros_like(f1)
    return hs_solve(f1, f2, 21.0, 5, z, z)[:2]

ur, vr = jax.jit(jax.vmap(one))(jnp.asarray(b1), jnp.asarray(b2))
aee = float(np.mean(np.hypot(np.asarray(u) - np.asarray(ur),
                             np.asarray(v) - np.asarray(vr))))
assert aee < 1e-5, aee
print("DIST_OK", aee)
"""


def test_distributed_single_process_cluster():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True,
        text=True, timeout=240, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "DIST_OK" in out.stdout, f"stdout={out.stdout}\nstderr={out.stderr}"
