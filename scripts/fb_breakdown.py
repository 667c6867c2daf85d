#!/usr/bin/env python3
"""Farneback 512^2 stage breakdown on the TPU: where do the ~3 ms go?

Times (marginal methodology, same estimator as measure_pallas) the full
FB_Fs0_0-style solve and its stages in isolation: image blur+resize, poly
expansion, one updateMatrices, one blur5+updateFlow, and the 5-iteration
loop given fixed R0/R1.  Guides the round-4 fusion work (VERDICT.md next #4).

    PALLAS_AXON_REMOTE_COMPILE=1 timeout 3000 python3 scripts/fb_breakdown.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fb_breakdown.json")
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

    from opticalflow_ri_tpu.utils.io import load_image
    from opticalflow_ri_tpu.models.farneback import (
        farneback_solve, poly_expansion, update_matrices_dispatch,
        _blur_flow_dispatch, gaussian_blur,
    )

    p = "/root/reference/examples/testImages/Bits08/Ni06/parabolic01_%d.tif"
    im1 = jnp.asarray(load_image(p % 0), jnp.float32)
    im2 = jnp.asarray(load_image(p % 1), jnp.float32)
    h, w = im1.shape
    z = jnp.zeros((h, w), jnp.float32)

    signal.alarm(1200)
    fb = jax.jit(lambda a, b: farneback_solve(a, b, z, z, impl="pallas"))
    m, _ = marginal(fb, (im1, im2))
    emit("full_solve", marginal_ms=m * 1e3)

    fbx = jax.jit(lambda a, b: farneback_solve(a, b, z, z, impl="xla"))
    m, _ = marginal(fbx, (im1, im2))
    emit("full_solve_xla", marginal_ms=m * 1e3)

    # poly expansion of both frames (the level's sigma=0 -> smooth=3 blur
    # included, as the level loop pays it)
    poly2 = jax.jit(lambda a, b: (
        poly_expansion(gaussian_blur(a, 3, 0.0), 7, 1.5),
        poly_expansion(gaussian_blur(b, 3, 0.0), 7, 1.5),
    ))
    m, _ = marginal(poly2, (im1, im2))
    emit("poly_both", marginal_ms=m * 1e3)

    r0, r1 = jax.block_until_ready(poly2(im1, im2))

    signal.alarm(1200)
    um_p = jax.jit(lambda fx, fy: update_matrices_dispatch(fx, fy, r0, r1,
                                                           impl="pallas"))
    m, _ = marginal(um_p, (z, z))
    emit("um_once_pallas", marginal_ms=m * 1e3)

    m0 = jax.block_until_ready(um_p(z, z))
    bf_p = jax.jit(lambda mm: _blur_flow_dispatch(mm, 33, True, impl="pallas"))
    m, _ = marginal(bf_p, (m0,))
    emit("blur_flow_once_pallas", marginal_ms=m * 1e3)

    # the iteration loop alone, given fixed R0/R1 (5 blur+solve, 4 um)
    def loop_only(fx, fy):
        mm = update_matrices_dispatch(fx, fy, r0, r1, impl="pallas")
        for i in range(5):
            fx, fy = _blur_flow_dispatch(mm, 33, True, impl="pallas")
            if i < 4:
                mm = update_matrices_dispatch(fx, fy, r0, r1, impl="pallas")
        return fx, fy

    lo = jax.jit(loop_only)
    m, _ = marginal(lo, (z, z))
    emit("loop_only_pallas", marginal_ms=m * 1e3)

    signal.alarm(0)
    emit("done")


if __name__ == "__main__":
    main()
