#!/usr/bin/env python3
"""Liu-Shen solver size scaling on TPU: is a temporal-blocked tiled kernel
warranted (as it was for Horn-Schunck)?

Measures the XLA while_loop path (the whole-solve Pallas kernel caps at
~512^2 VMEM residency) at 512/1024/2048 squared with a fixed 60-iteration
budget, and records bytes-limited roofline estimates next to the measured
marginals in scripts/ls_size_scaling.json.

Run ON THE TPU:

    PALLAS_AXON_REMOTE_COMPILE=1 timeout 3600 python3 scripts/ls_size_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ls_size_scaling.json")
RESULTS = {}

# v5e HBM bandwidth (public spec: 819 GB/s)
HBM_GBPS = 819.0


def emit(stage, **kw):
    RESULTS[stage] = kw
    print(json.dumps({"stage": stage, **kw}), flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def marginal(fn, args, chain=16, repeats=5):
    import jax.numpy as jnp

    def force(o):
        return sum(float(jnp.sum(x)) for x in o)

    force(fn(*args))

    def run_k(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn(*args)
        force(o)
        return time.perf_counter() - t0

    tk = float(min(run_k(chain) for _ in range(repeats)))
    t2k = float(min(run_k(2 * chain) for _ in range(repeats)))
    m = (t2k - tk) / chain
    return m if m > 0.05 * (t2k / (2 * chain)) else t2k / (2 * chain)


def main():
    import signal

    def on_alarm(signum, frame):
        print(json.dumps({"stage": "watchdog", "error": "unresponsive"}))
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(3600)  # claim queues of 25+ min observed under contention

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ofri_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    emit("probe", device=str(jax.devices()[0]))

    from opticalflow_ri_tpu.models.liu_shen import liu_shen_solve
    from opticalflow_ri_tpu.utils.synthetic import particle_image_pair

    sides = tuple(int(s) for s in
                  os.environ.get("LS_SIDES", "512,1024,2048").split(","))
    for side in sides:
        s1, s2, _, _ = particle_image_pair(shape=(side, side), seed=0)
        d1, d2 = jnp.asarray(s1), jnp.asarray(s2)
        z = jnp.zeros((side, side), jnp.float32)
        # tol=0 forces the full 60 iterations: scaling measurement, not a
        # convergence race (synthetic pairs converge at different rates)
        fn = lambda a, b: liu_shen_solve(a, b, 10.0, z, z, max_iter=60,
                                         tol=0.0, impl="xla")
        signal.alarm(2400)
        m = marginal(fn, (d1, d2))
        # per iteration the 10 resident fields (8 precomputed + u + v) are
        # read and u/v written: 12 arrays of side^2 f32 per iteration is the
        # bytes floor for a non-temporal-blocked schedule
        bytes_per_iter = 12 * side * side * 4
        roofline_s = 60 * bytes_per_iter / (HBM_GBPS * 1e9)
        emit(f"ls_xla_{side}", marginal_ms=m * 1e3,
             hbm_roofline_ms=roofline_s * 1e3,
             x_off_roofline=m / roofline_s)

    emit("done")


if __name__ == "__main__":
    main()
