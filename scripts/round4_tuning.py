#!/usr/bin/env python3
"""Round-4 micro-tuning probes: um_channel band sweep at 2048^2 and the
Liu-Shen tiled T=16-vs-20 check at 1024^2 (the 2048^2 T-sweep in
hs_ls_limiter.json measured T16 ~8% faster; confirm before flipping the
default).

    PALLAS_AXON_REMOTE_COMPILE=1 timeout 4800 python3 scripts/round4_tuning.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "round4_tuning.json")
RESULTS = {}


def emit(stage, **kw):
    RESULTS[stage] = kw
    print(json.dumps({"stage": stage, **kw}), flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    import signal

    def on_alarm(signum, frame):
        emit("watchdog", error="compile overran")
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(3600)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ofri_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    emit("probe", device=str(jax.devices()[0]))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from measure_pallas import marginal

    from opticalflow_ri_tpu.utils.synthetic import particle_image_pair
    from opticalflow_ri_tpu.models.farneback import poly_expansion
    from opticalflow_ri_tpu.ops.pallas.tent_sample import (
        update_matrices_channel_pallas,
    )

    s1, s2, _, _ = particle_image_pair(shape=(2048, 2048), seed=0)
    b1 = jnp.asarray(s1, jnp.float32)
    b2 = jnp.asarray(s2, jnp.float32)
    z = jnp.zeros((2048, 2048), jnp.float32)
    r0 = jax.block_until_ready(poly_expansion(b1, 7, 1.5))
    r1 = jax.block_until_ready(poly_expansion(b2, 7, 1.5))

    for bnd in (32, 64, 128):
        try:
            signal.alarm(2400)
            fn = lambda fx, fy: update_matrices_channel_pallas(
                fx, fy, r0, r1, band=bnd)
            jax.block_until_ready(fn(z, z))
            signal.alarm(900)
            m, _ = marginal(fn, (z, z), chain=4, repeats=3)
            emit(f"um_channel_band_{bnd}", marginal_ms=m * 1e3)
        except Exception as e:
            emit(f"um_channel_band_{bnd}", skipped=repr(e)[:200])

    from opticalflow_ri_tpu.models.liu_shen import liu_shen_precompute
    from opticalflow_ri_tpu.ops.pallas.ls_tiled import (
        liu_shen_iterate_pallas_tiled,
    )

    t1, t2_, _, _ = particle_image_pair(shape=(1024, 1024), seed=0)
    a1 = jnp.asarray(t1, jnp.float32)
    a2 = jnp.asarray(t2_, jnp.float32)
    z1 = jnp.zeros((1024, 1024), jnp.float32)
    fields = jax.block_until_ready(
        liu_shen_precompute(a1 / jnp.max(a1), a2 / jnp.max(a2), 10.0))
    for t in (16, 20):
        signal.alarm(2400)
        fn = lambda f, t=t: liu_shen_iterate_pallas_tiled(
            10.0, f, z1, z1, max_iter=60, tol=0.0, t_block=t)
        jax.block_until_ready(fn(fields))
        signal.alarm(900)
        m, _ = marginal(fn, (fields,), chain=8, repeats=3)
        emit(f"ls_1024_T{t}", marginal_ms=m * 1e3)

    signal.alarm(0)
    emit("done")


if __name__ == "__main__":
    main()
