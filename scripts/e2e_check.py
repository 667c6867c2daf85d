#!/usr/bin/env python3
"""Fresh-process e2e marginal timing for the Pallas-affected configs.

    PALLAS_AXON_REMOTE_COMPILE=1 timeout 1800 python3 scripts/e2e_check.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def force(*xs):
    import jax.numpy as jnp

    return sum(float(jnp.sum(x)) for x in xs)


def marginal(fn, args, chain=8, repeats=5):
    out = fn(*args)
    force(*out)

    def run_k(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        force(*out)
        return time.perf_counter() - t0

    t1 = float(np.median([run_k(1) for _ in range(repeats)]))
    tk = float(np.median([run_k(chain) for _ in range(repeats)]))
    return max((tk - t1) / (chain - 1), 1e-9), t1


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/ofri_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0

    from opticalflow_ri_tpu.utils.io import load_image
    from opticalflow_ri_tpu.compile import compiled_pipeline
    from opticalflow_ri_tpu.ops.pallas import pallas_default_on

    print(json.dumps({"pallas_default_on": pallas_default_on()}), flush=True)

    p = "/root/reference/examples/testImages/Bits08/Ni06/parabolic01_%d.tif"
    d1 = jnp.asarray(load_image(p % 0))
    d2 = jnp.asarray(load_image(p % 1))

    for cfg in sys.argv[1:] or ("denseLK_Fs2_0", "Farneback_Fs0_0",
                                "LiuSE_denseLK_Fs2_0_PyrLvls2",
                                "LiuSE_Farneback_Fs0_0_PyrLvls2"):
        fn = compiled_pipeline(cfg)
        m, t1 = marginal(fn, (d1, d2))
        u, v = fn(d1, d2)
        print(json.dumps({
            "config": cfg, "marginal_ms": m * 1e3, "latency_s": t1,
            "mpix_per_s": 512 * 512 / 1e6 / m,
            "u_range": [float(jnp.min(u)), float(jnp.max(u))],
            "v_range": [float(jnp.min(v)), float(jnp.max(v))],
        }), flush=True)


if __name__ == "__main__":
    main()
