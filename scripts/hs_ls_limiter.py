#!/usr/bin/env python3
"""What bounds the HS/LS temporal-blocked kernels at 1024^2+?

Round-3 verdict: PARITY.md claimed "HBM-bound at ~430-450 Mpix/s" while the
kernel docstring says VPU-bound, and achieved bandwidth (~85 GB/s of a v5e's
~819) says PARITY is wrong.  This probe settles it empirically:

  * T-block sweep at 2048^2: the kernel moves the 6-field state through HBM
    once per T iterations, and its compute redundancy (the (bh+2T, w+2T)
    halo slab vs the (bh, w) output) GROWS with T.  HBM-bound => larger T
    wins (fewer passes); VPU-bound => smaller T wins (less redundant
    compute).  The sweep prints both the measured marginal and the
    analytic redundancy/traffic per T so the limiter is read off directly.
  * an xprof trace of the best-T launch (scripts/hs_tiled_trace/) for
    per-op confirmation.

    PALLAS_AXON_REMOTE_COMPILE=1 timeout 3600 python3 scripts/hs_ls_limiter.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "hs_ls_limiter.json")
RESULTS = {}


def emit(stage, **kw):
    RESULTS[stage] = kw
    print(json.dumps({"stage": stage, **kw}), flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    import signal

    def on_alarm(signum, frame):
        emit("watchdog", error="device unresponsive / compile overran")
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
    from opticalflow_ri_tpu.ops.stencil import hs_derivatives
    from opticalflow_ri_tpu.ops.pallas.hs_tiled import (
        hs_iterate_pallas_tiled, stripe_height, _lane_pad,
    )
    from opticalflow_ri_tpu.models.liu_shen import (
        liu_shen_precompute, liu_shen_solve,
    )
    from opticalflow_ri_tpu.ops.pallas.ls_tiled import (
        liu_shen_iterate_pallas_tiled, ls_stripe_height,
    )

    side = 2048
    niter = 100
    s1, s2, _, _ = particle_image_pair(shape=(side, side), seed=0)
    s1 = jnp.asarray(s1, jnp.float32)
    s2 = jnp.asarray(s2, jnp.float32)
    z = jnp.zeros((side, side), jnp.float32)
    dfx, dfy, dft = jax.block_until_ready(hs_derivatives(s1, s2))

    for t in (8, 12, 16, 20, 28, 40):
        bh = stripe_height(side, side, t)
        if bh is None:
            emit(f"hs_T{t}", skipped="no stripe fits")
            continue
        redundancy = ((bh + 2 * t) * _lane_pad(side + 2 * t)) / (bh * side)
        passes = -(-niter // t)
        traffic_gb = passes * 8 * (side + 2 * t) * _lane_pad(side + 2 * t) * 4 / 1e9
        signal.alarm(2400)
        fn = lambda a, b, c: hs_iterate_pallas_tiled(a, b, c, z, z, 1.0,
                                                     niter, t_block=t)
        jax.block_until_ready(fn(dfx, dfy, dft))
        signal.alarm(900)
        m, _ = marginal(fn, (dfx, dfy, dft), chain=4)
        emit(f"hs_T{t}", marginal_ms=m * 1e3, bh=bh,
             redundancy=round(redundancy, 3), hbm_passes=passes,
             analytic_traffic_gb=round(traffic_gb, 2),
             achieved_gbps=round(traffic_gb / m, 1))

    fields = jax.block_until_ready(
        liu_shen_precompute(s1 / jnp.max(s1), s2 / jnp.max(s2), 10.0))
    for t in (8, 12, 16, 20, 28):
        bh = ls_stripe_height(side, side, t)
        if bh is None:
            emit(f"ls_T{t}", skipped="no stripe fits")
            continue
        redundancy = ((bh + 2 * t) * side) / (bh * side)
        passes = -(-60 // t)
        traffic_gb = passes * 14 * (side + 2 * t) * side * 4 / 1e9
        signal.alarm(2400)
        fn = lambda f: liu_shen_iterate_pallas_tiled(10.0, f, z, z,
                                                     max_iter=60, tol=0.0,
                                                     t_block=t)
        jax.block_until_ready(fn(fields))
        signal.alarm(900)
        m, _ = marginal(fn, (fields,), chain=4)
        emit(f"ls_T{t}", marginal_ms=m * 1e3, bh=bh,
             redundancy=round(redundancy, 3), hbm_passes=passes,
             analytic_traffic_gb=round(traffic_gb, 2),
             achieved_gbps=round(traffic_gb / m, 1))

    # xprof trace of one default-T launch each (artifact for PARITY.md)
    from opticalflow_ri_tpu.utils.timing import trace

    tdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "hs_tiled_trace")
    signal.alarm(900)
    with trace(tdir):
        jax.block_until_ready(
            hs_iterate_pallas_tiled(dfx, dfy, dft, z, z, 1.0, niter))
        jax.block_until_ready(
            liu_shen_iterate_pallas_tiled(10.0, fields, z, z, max_iter=60,
                                          tol=0.0))
    emit("trace", dir=tdir)

    signal.alarm(0)
    emit("done")


if __name__ == "__main__":
    main()
