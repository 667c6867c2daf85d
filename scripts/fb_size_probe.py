#!/usr/bin/env python3
"""Farneback at 1024^2 on hardware: parity + timing of the Pallas um/blur5
kernels at their raised VMEM envelopes, BEFORE the bench exercises them.

timeout 3600 python3 scripts/fb_size_probe.py
"""

import json
import os
import sys

if (
    os.environ.get("PALLAS_AXON_REMOTE_COMPILE") is None
    and "jax" not in sys.modules
):
    os.execve(sys.executable, [sys.executable] + sys.argv,
              dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import time_config
from opticalflow_ri_tpu.models.farneback import farneback_solve
from opticalflow_ri_tpu.utils.synthetic import particle_image_pair

results = {}
PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "fb_size_probe.json")


def record(name, val):
    results[name] = val
    print(json.dumps({name: val}), flush=True)
    with open(PATH, "w") as f:
        json.dump(results, f, indent=1)


def main():
    cache = os.path.expanduser("~/.cache/ofri_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"# probe {jax.devices()[0]}", file=sys.stderr, flush=True)

    side = 1024
    s1, s2, _, _ = particle_image_pair(shape=(side, side), seed=0)
    d1 = jnp.asarray(s1, jnp.float32)
    d2 = jnp.asarray(s2, jnp.float32)
    z = jnp.zeros((side, side), jnp.float32)

    def run(impl):
        return jax.jit(lambda a, b, impl=impl: farneback_solve(
            a, b, z, z, impl=impl)[:2])

    ux, vx = run("xla")(d1, d2)
    ud, vd = run("auto")(d1, d2)
    diff = float(jnp.max(jnp.abs(ud - ux))) + float(jnp.max(jnp.abs(vd - vx)))
    record("parity_1024_auto_vs_xla", diff)

    for tag in ("xla", "auto"):
        lat, marg, amort, _, _, _ = time_config(
            run(tag), d1, d2, repeats=3, chain=4)
        record(f"time_1024_{tag}", {"marginal_ms": round(marg * 1e3, 3),
                                    "amortized_fallback": amort})

    print(json.dumps(results))


if __name__ == "__main__":
    main()
