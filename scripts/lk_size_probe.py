#!/usr/bin/env python3
"""LK at 1024^2 / 2048^2 on hardware: parity + timing of the dispatch paths.

Validates the lk_build/lk_gn envelopes at sizes the bench size-scaling will
exercise, BEFORE the bench runs them (a new shape must never first lower
inside the bench).  Also A/Bs a raised GN VMEM cap at 2048^2 via band=8
blocks (t_block 15.9 MB) against the XLA fori GN.

timeout 3600 python3 scripts/lk_size_probe.py
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
from opticalflow_ri_tpu.models.lucas_kanade import (
    lk_dense_solve, _lk_impl, _lk_build_impl, _lk_striped_impl)
from opticalflow_ri_tpu.utils.synthetic import particle_image_pair

results = {}
PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "lk_size_probe.json")


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

    for side in (1024, 2048):
        s1, s2, _, _ = particle_image_pair(shape=(side, side), seed=0)
        d1 = jnp.asarray(s1, jnp.float32)
        d2 = jnp.asarray(s2, jnp.float32)
        z = jnp.zeros((side, side), jnp.float32)
        impl = _lk_impl(side, side, 5)
        record(f"dispatch_{side}", {"impl": impl,
                                    "build": _lk_build_impl(side, side, 5),
                                    "striped": _lk_striped_impl(side, side, 5)})

        def run(impl):
            return jax.jit(lambda a, b, impl=impl: lk_dense_solve(
                a, b, z, z, impl=impl)[:2])

        # parity of the default path vs pure XLA
        ux, vx = run("xla")(d1, d2)
        ud, vd = run(impl)(d1, d2)
        diff = float(jnp.max(jnp.abs(ud - ux))) + float(jnp.max(jnp.abs(vd - vx)))
        record(f"parity_{side}_default_vs_xla", diff)

        for tag in {"xla", impl}:
            lat, marg, amort, _, _, _ = time_config(
                run(tag), d1, d2, repeats=3, chain=4)
            record(f"time_{side}_{tag}",
                   {"marginal_ms": round(marg * 1e3, 3),
                    "amortized_fallback": amort})

    print(json.dumps(results))


if __name__ == "__main__":
    main()
