#!/usr/bin/env python3
"""Full-grid TPU e2e gate: run EVERY registered config on hardware.

The snapshot ritual (VERDICT.md round 2, directive 2): before a round ends,
all 19 registered configs — the 11-config bench grid plus the 9 example
configs (they overlap) — must execute on the real TPU with the default
(Pallas-enabled) dispatch.  Round 2 shipped with only 4 configs e2e-checked
and an unproven kernel crashed the other half of the grid.

    PALLAS_AXON_REMOTE_COMPILE=1 timeout 3600 python3 scripts/e2e_check.py

Exits non-zero if ANY config fails.  Pass config names as argv to subset.

The script owns its log: every record is appended to scripts/e2e_check.log
directly (tee is no longer part of the ritual — round 3's final snapshot
committed a 147-byte stub because an aborted tee overwrote the green log),
and before exiting 0 the script re-reads the log and refuses success unless
it contains the per-config records and the final summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "e2e_check.log")


def record(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


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
    t0 = time.perf_counter()
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    with open(LOG, "w") as f:  # fresh log for this run
        f.write("")
    record({"device": str(jax.devices()[0]),
            "claim_s": round(time.perf_counter() - t0, 1)})

    from opticalflow_ri_tpu.utils.io import load_image
    from opticalflow_ri_tpu.compile import compiled_pipeline
    from opticalflow_ri_tpu.configs import CONFIGS
    from opticalflow_ri_tpu.ops.pallas import pallas_default_on

    record({"pallas_default_on": pallas_default_on()})

    p = "/root/reference/examples/testImages/Bits08/Ni06/parabolic01_%d.tif"
    d1 = jnp.asarray(load_image(p % 0))
    d2 = jnp.asarray(load_image(p % 1))

    names = sys.argv[1:] or sorted(CONFIGS)
    failed = []
    for cfg in names:
        try:
            fn = compiled_pipeline(cfg)
            m, t1 = marginal(fn, (d1, d2))
            u, v = fn(d1, d2)
            record({
                "config": cfg, "marginal_ms": round(m * 1e3, 3),
                "latency_s": round(t1, 3),
                "mpix_per_s": round(512 * 512 / 1e6 / m, 1),
                "u_range": [float(jnp.min(u)), float(jnp.max(u))],
                "v_range": [float(jnp.min(v)), float(jnp.max(v))],
            })
        except Exception as e:
            failed.append(cfg)
            record({"config": cfg, "error": repr(e)})

    record({"summary": f"{len(names) - len(failed)}/{len(names)} ok",
            "failed": failed})
    if failed:
        sys.exit(1)

    # an aborted run must not look like a pass: re-read the log this run
    # wrote and demand one record per config plus the summary line
    with open(LOG) as f:
        lines = [json.loads(x) for x in f.read().splitlines() if x.strip()]
    n_cfg = sum(1 for x in lines if "config" in x)
    n_sum = sum(1 for x in lines if "summary" in x)
    if n_cfg < len(names) or n_sum != 1:
        print(json.dumps({"error": f"log incomplete: {n_cfg}/{len(names)} "
                          f"config records, {n_sum} summaries"}), flush=True)
        sys.exit(3)


if __name__ == "__main__":
    main()
