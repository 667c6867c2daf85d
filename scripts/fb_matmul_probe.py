#!/usr/bin/env python3
"""A/B the MXU banded-matmul blur5 path (ops/matmul_filter.py) on the TPU.

Stages: per-size blur5+updateFlow comparison (current Pallas dispatch vs XLA
stencil vs matmul at block 64/128/256, with flow parity vs the stencil path),
then the full Farneback solve at 2048^2 with the blur pinned to the matmul
path (impl="pallas_mmblur") vs the current default.

    PALLAS_AXON_REMOTE_COMPILE=1 timeout 3600 python3 scripts/fb_matmul_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fb_matmul_probe.json")
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
    from opticalflow_ri_tpu.models.farneback import (
        farneback_solve, poly_expansion, gaussian_blur, update_matrices_dispatch,
        _blur_flow_dispatch,
    )
    from opticalflow_ri_tpu.ops.matmul_filter import blur5_flow_matmul
    from opticalflow_ri_tpu.models.farneback import _window_blur_spec

    taps_np, mode, scale = _window_blur_spec(33, True)
    taps = tuple(float(w) for w in taps_np)

    for side in (512, 2048):
        im1, im2, _, _ = particle_image_pair(shape=(side, side), seed=0)
        im1 = jnp.asarray(im1, jnp.float32)
        im2 = jnp.asarray(im2, jnp.float32)
        z = jnp.zeros((side, side), jnp.float32)

        @jax.jit
        def build_m(a, b, z):
            ra = poly_expansion(gaussian_blur(a, 3, 0.0), 7, 1.5)
            rb = poly_expansion(gaussian_blur(b, 3, 0.0), 7, 1.5)
            return update_matrices_dispatch(z, z, ra, rb, impl="pallas")

        m = jax.block_until_ready(build_m(im1, im2, z))
        _ = float(jnp.sum(m))

        signal.alarm(1800)
        cur = jax.jit(lambda m: _blur_flow_dispatch(m, 33, True, impl="pallas"))
        t, _ = marginal(cur, (m,))
        emit(f"blurflow_cur_{side}", marginal_ms=t * 1e3)

        xla = jax.jit(lambda m: _blur_flow_dispatch(m, 33, True, impl="xla"))
        t, _ = marginal(xla, (m,))
        emit(f"blurflow_xla_{side}", marginal_ms=t * 1e3)
        fxr, fyr = jax.block_until_ready(xla(m))

        for blk in (64, 128, 256):
            mm = jax.jit(lambda m, blk=blk: blur5_flow_matmul(m, taps, mode,
                                                              scale, block=blk))
            t, _ = marginal(mm, (m,))
            fx, fy = jax.block_until_ready(mm(m))
            d = float(jnp.max(jnp.maximum(jnp.abs(fx - fxr), jnp.abs(fy - fyr))))
            emit(f"blurflow_mm{blk}_{side}", marginal_ms=t * 1e3, max_abs_diff=d)

    # full-solve A/B at 2048^2: default kernels vs blur pinned to matmul
    side = 2048
    im1, im2, _, _ = particle_image_pair(shape=(side, side), seed=0)
    im1 = jnp.asarray(im1, jnp.float32)
    im2 = jnp.asarray(im2, jnp.float32)
    z = jnp.zeros((side, side), jnp.float32)

    signal.alarm(1800)
    fb = jax.jit(lambda a, b: farneback_solve(a, b, z, z, impl="pallas"))
    t, _ = marginal(fb, (im1, im2))
    emit("fb_solve_2048_default", marginal_ms=t * 1e3,
         mpix_per_s=side * side / t / 1e6)
    fxr, fyr = jax.block_until_ready(fb(im1, im2))

    fbm = jax.jit(lambda a, b: farneback_solve(a, b, z, z, impl="pallas_mmblur"))
    t, _ = marginal(fbm, (im1, im2))
    fx, fy = jax.block_until_ready(fbm(im1, im2))
    d = float(jnp.max(jnp.maximum(jnp.abs(fx - fxr), jnp.abs(fy - fyr))))
    emit("fb_solve_2048_mmblur", marginal_ms=t * 1e3,
         mpix_per_s=side * side / t / 1e6, max_abs_diff=d)

    emit("done")


if __name__ == "__main__":
    main()
