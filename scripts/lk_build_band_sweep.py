#!/usr/bin/env python3
"""Band-size sweep for the LK Pallas build kernel vs the XLA hier build.

timeout 3600 python3 scripts/lk_build_band_sweep.py
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

from functools import partial

import jax
import jax.numpy as jnp

from bench import load_pair, time_config
from scripts.lk_breakdown import prep, RUNS, HW
from opticalflow_ri_tpu.models.lucas_kanade import lk_build_planes
from opticalflow_ri_tpu.ops.pallas.lk_build import lk_build_planes_pallas

R = 5


def main():
    cache = os.path.expanduser("~/.cache/ofri_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    d1, d2 = load_pair()
    d1 = jnp.asarray(d1, jnp.float32)
    d2 = jnp.asarray(d2, jnp.float32)
    h, w = d1.shape
    print(f"# probe {float(jnp.sum(d1)):.0f} on {jax.devices()[0]}",
          file=sys.stderr, flush=True)

    results = {}

    def record(name, fn, chain=8, repeats=3):
        lat, marg, amort, _, _, _ = time_config(
            fn, d1, d2, repeats=repeats, chain=chain)
        results[name] = {"marginal_ms": round(marg * 1e3, 4),
                         "amortized_fallback": amort}
        print(json.dumps({name: results[name]}), flush=True)

    prep5 = jax.jit(partial(prep, R=R))

    @jax.jit
    def build_xla(a, b):
        slab, g, *_ = prep(a, b, R)
        return lk_build_planes(slab, g, RUNS, RUNS, HW, h, w, R,
                               hierarchical=True)
    record("xla_hier", build_xla)

    @jax.jit
    def build_xla_ladder(a, b):
        slab, g, *_ = prep(a, b, R)
        return lk_build_planes(slab, g, RUNS, RUNS, HW, h, w, R,
                               hierarchical="ladder")
    record("xla_ladder", build_xla_ladder)

    for band, mode in ((64, True), (128, True), (256, True), (512, True),
                       (256, "ladder"), (512, "ladder")):
        @jax.jit
        def build_p(a, b, band=band, mode=mode):
            slab, g, *_ = prep(a, b, R)
            return lk_build_planes_pallas(slab, g, HW, R, RUNS, RUNS,
                                          band=band, mode=mode)
        tag = f"pallas_band{band}" + ("_ladder" if mode == "ladder" else "")
        try:
            record(tag, build_p)
        except Exception as e:
            results[tag] = {"error": repr(e)[:200]}
            print(json.dumps(results[tag]), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "lk_build_band_sweep.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
