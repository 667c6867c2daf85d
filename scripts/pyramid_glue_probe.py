#!/usr/bin/env python3
"""Where does the 2-level pyramid's non-solver time go?  (512^2, v5e)

PyHSchunck_Fs3_4_PyrLvls2 measures ~4.9 ms e2e while its two 600-iteration
solves account for ~2.2 — this probe times the glue stages in isolation:
bicubic resize, spline upsample, symmetric warp, prefilter, plus the two
solves, to find the next lever for the six pyramidal grid configs.

    PALLAS_AXON_REMOTE_COMPILE=1 timeout 1800 python3 scripts/pyramid_glue_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "pyramid_glue_probe.json")
RESULTS = {}


def emit(stage, **kw):
    RESULTS[stage] = kw
    print(json.dumps({"stage": stage, **kw}), flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    import signal

    def on_alarm(signum, frame):
        emit("watchdog", error="overran")
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(3000)

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
    from opticalflow_ri_tpu.ops.resize import pil_resize, spline_upsample
    from opticalflow_ri_tpu.ops.warp import symmetric_warp_pair
    from opticalflow_ri_tpu.ops.gaussian import gaussian_filter_px
    from opticalflow_ri_tpu.models.horn_schunck import hs_solve

    p = "/root/reference/examples/testImages/Bits08/Ni06/parabolic01_%d.tif"
    im1 = jnp.asarray(load_image(p % 0), jnp.float32)
    im2 = jnp.asarray(load_image(p % 1), jnp.float32)
    z = jnp.zeros((512, 512), jnp.float32)
    u = jnp.asarray(0.5 * jnp.ones((256, 256)), jnp.float32)

    stages = {
        "resize_bicubic_512to256": jax.jit(
            lambda a: pil_resize(a, (256, 256), "bicubic")),
        "spline_upsample_256to512": jax.jit(
            lambda a: spline_upsample(a, (512, 512))),
        "warp_pair_512": jax.jit(
            lambda a, b: symmetric_warp_pair(a, b, z + 0.5, z - 0.25)),
        "prefilter_512": jax.jit(lambda a: gaussian_filter_px(a, 3.4, 3)),
        "hs600_512": jax.jit(
            lambda a, b: hs_solve(a, b, 21.0, 600, z, z,
                                  impl="pallas")[:2]),
    }
    for name, fn in stages.items():
        signal.alarm(1200)
        args = (im1, im2) if name in ("warp_pair_512", "hs600_512") else (
            (u,) if name == "spline_upsample_256to512" else (im1,))
        out = fn(*args)
        jax.block_until_ready(out)
        signal.alarm(600)
        m, _ = marginal(fn, args)
        emit(name, marginal_ms=m * 1e3)

    signal.alarm(0)
    emit("done")


if __name__ == "__main__":
    main()
