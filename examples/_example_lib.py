"""Shared plumbing for the per-config example scripts.

Each example script mirrors one of the reference's calibrated example scripts
(ref: examples/*.py): it constructs its own solver adapters with the
calibration constants visible in the script, then hands them here for the
common load-images -> pyramidal driver -> save-.mat flow.

IMPORTANT: import this module FIRST in every example script — it re-execs
the interpreter once to set PALLAS_AXON_REMOTE_COMPILE (the tunneled axon
backend needs client-side Mosaic compiles and reads the variable at
interpreter start-up) before anything imports jax.
"""

import argparse
import os
import sys

if (
    os.environ.get("PALLAS_AXON_REMOTE_COMPILE") is None
    and os.environ.get("OFRI_DISABLE_PALLAS") != "1"
    and "jax" not in sys.modules
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# Honor an explicit JAX_PLATFORMS=cpu request (tests, machines without the
# TPU): this environment's sitecustomize force-sets the axon backend via
# jax.config at interpreter start, so the env var alone does not switch
# backends — it must be re-applied through jax.config before first use.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

DEFAULT_BASE = "/root/reference/examples/testImages/Bits08/Ni06"


def run_example(name: str, main_adapter, filter_sigma: float,
                pyr_levels: int = 1, k_levels: int = 1,
                filter_opt=None, optional_adapter=None, **driver_kwargs):
    """CLI + IO wrapper around ``generic_pyramidal_optical_flow``; returns
    (U, V) numpy arrays and writes the .mat output."""
    import numpy as np

    from opticalflow_ri_tpu.pyramid import generic_pyramidal_optical_flow
    from opticalflow_ri_tpu.utils.io import load_image, save_flow

    ap = argparse.ArgumentParser(description=f"calibrated config {name}")
    ap.add_argument("--im1", default=os.path.join(DEFAULT_BASE, "parabolic01_0.tif"))
    ap.add_argument("--im2", default=os.path.join(DEFAULT_BASE, "parabolic01_1.tif"))
    ap.add_argument("--out", default=f"{name}.mat")
    args = ap.parse_args()

    if os.path.exists(args.im1):
        im1, im2 = load_image(args.im1), load_image(args.im2)
    else:
        print("input images not found; using a synthetic PIV pair", file=sys.stderr)
        from opticalflow_ri_tpu.utils.synthetic import particle_image_pair

        im1, im2, _, _ = particle_image_pair(shape=(512, 512), seed=0)

    u, v = generic_pyramidal_optical_flow(
        im1, im2, filter_sigma, main_adapter,
        pyramidalLevels=pyr_levels, kLevels=k_levels,
        FILTER_OPT=filter_opt, optionalOFlowAlgoAdapter=optional_adapter,
        **driver_kwargs,
    )
    u, v = np.asarray(u), np.asarray(v)
    save_flow(u, v, args.out)
    print(f"{name}: U range [{u.min():.3f}, {u.max():.3f}], "
          f"V range [{v.min():.3f}, {v.max():.3f}] -> {args.out}")
    return u, v
