#!/usr/bin/env python3
"""TPU benchmark for opticalflow_ri_tpu.

Times the calibrated configurations end to end (same surface the reference's
``benchmark_of_methods.py`` times: ``calculateFlow`` wall-clock on a 512x512
PIV pair) on the current default JAX device, and prints ONE JSON line:

    {"metric": "hs_fs3_4_throughput", "value": ..., "unit": "Mpix/s",
     "vs_baseline": ...}

Baseline: the reference's published HS_Fs3_4 wall time of 23.07 s
(benchmark_results/benchmark_summary.txt:7) normalised to the bundled
512x512 pair (0.262 Mpix) -> 0.01136 Mpix/s (see BASELINE.md).

Per-config details are written to bench_details.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_IMAGES = "/root/reference/examples/testImages/Bits08/Ni06"
BASELINE_HS_FS34_SECONDS = 23.07
MPIX = 512 * 512 / 1e6
BASELINE_MPIX_S = MPIX / BASELINE_HS_FS34_SECONDS

# reference benchmark wall times for the CPU rows (benchmark_summary.txt)
BASELINE_SECONDS = {
    "PyHSchunck_Fs3_4": None,           # example config (Niter=600), no published time
    "HS_Fs0_0": 21.53,
    "HS_Fs3_4": 23.07,
    "HS_Fs3_4_PyrLvls2": 39.39,
    "LiuSE_HS_Fs3_4_PyrLvls2": 82.88,
}


def load_pair():
    p0 = os.path.join(REF_IMAGES, "parabolic01_0.tif")
    p1 = os.path.join(REF_IMAGES, "parabolic01_1.tif")
    if os.path.exists(p0):
        from opticalflow_ri_tpu.utils.io import load_image

        return load_image(p0), load_image(p1)
    from opticalflow_ri_tpu.utils.synthetic import particle_image_pair

    im1, im2, _, _ = particle_image_pair(shape=(512, 512), seed=0)
    return im1, im2


def time_config(name, im1, im2, repeats=3):
    from opticalflow_ri_tpu.configs import run_config

    # warm-up/compile
    u, v = run_config(name, im1, im2)
    np.asarray(u)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        u, v = run_config(name, im1, im2)
        np.asarray(u)
        np.asarray(v)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), np.asarray(u), np.asarray(v)


def main():
    import jax

    device = str(jax.devices()[0])
    im1, im2 = load_pair()

    names = [
        "HS_Fs3_4",
        "HS_Fs0_0",
        "HS_Fs3_4_PyrLvls2",
        "LiuSE_HS_Fs3_4_PyrLvls2",
        "PyHSchunck_Fs3_4",
        "denseLK_Fs2_0",
        "Farneback_Fs0_0",
        "LiuSE_denseLK_Fs2_0_PyrLvls2",
        "LiuSE_Farneback_Fs0_0_PyrLvls2",
    ]
    if os.environ.get("BENCH_QUICK"):
        names = names[:1]

    details = {"device": device, "image": "parabolic01 512x512", "configs": {}}
    for name in names:
        try:
            t, u, v = time_config(name, im1, im2)
            entry = {
                "seconds": t,
                "mpix_per_s": MPIX / t,
                "u_range": [float(u.min()), float(u.max())],
                "v_range": [float(v.min()), float(v.max())],
            }
            ref_t = BASELINE_SECONDS.get(name)
            if ref_t:
                entry["speedup_vs_reference"] = ref_t / t
            details["configs"][name] = entry
            print(f"# {name}: {t*1e3:.1f} ms ({MPIX/t:.2f} Mpix/s)", file=sys.stderr)
        except Exception as e:  # keep benching other configs, like the reference harness
            details["configs"][name] = {"error": repr(e)}
            print(f"# {name}: FAILED {e!r}", file=sys.stderr)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_details.json"), "w") as f:
        json.dump(details, f, indent=2)

    hs = details["configs"].get("HS_Fs3_4", {})
    value = hs.get("mpix_per_s", 0.0)
    print(json.dumps({
        "metric": "hs_fs3_4_throughput",
        "value": round(value, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(value / BASELINE_MPIX_S, 1),
    }))


if __name__ == "__main__":
    main()
