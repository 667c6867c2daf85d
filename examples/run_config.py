#!/usr/bin/env python3
"""Run a calibrated optical-flow configuration and save the flow as .mat.

Equivalent of the reference's per-config example scripts (ref: examples/*.py):

    python3 examples/run_config.py PyHSchunck_Fs3_4
    python3 examples/run_config.py LiuSE_denseLK_Fs2_0_PyrLvls2 \
        --im1 path/a.tif --im2 path/b.tif --out flow.mat

Default input is the reference's bundled 512x512 PIV pair when available.
"""

import argparse
import os
import sys

# pick up the fast Pallas kernel path on the tunneled axon backend (the
# interpreter must see this at start-up; see bench.py for the full note)
if (
    __name__ == "__main__"
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") is None
    and os.environ.get("OFRI_DISABLE_PALLAS") != "1"
    and "jax" not in sys.modules
):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

DEFAULT_BASE = "/root/reference/examples/testImages/Bits08/Ni06"


def main():
    from opticalflow_ri_tpu.configs import CONFIGS, EXAMPLE_CONFIG_NAMES, run_config
    from opticalflow_ri_tpu.utils.io import load_image, save_flow

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", choices=sorted(CONFIGS), metavar="config",
                    help="one of: " + ", ".join(EXAMPLE_CONFIG_NAMES) + ", ...")
    ap.add_argument("--im1", default=os.path.join(DEFAULT_BASE, "parabolic01_0.tif"))
    ap.add_argument("--im2", default=os.path.join(DEFAULT_BASE, "parabolic01_1.tif"))
    ap.add_argument("--out", default=None, help="output .mat path (default <config>.mat)")
    args = ap.parse_args()

    if os.path.exists(args.im1):
        im1 = load_image(args.im1)
        im2 = load_image(args.im2)
    else:
        print("input images not found; using a synthetic PIV pair", file=sys.stderr)
        from opticalflow_ri_tpu.utils.synthetic import particle_image_pair

        im1, im2, _, _ = particle_image_pair(shape=(512, 512), seed=0)

    u, v = run_config(args.config, im1, im2)
    u = np.asarray(u)
    v = np.asarray(v)
    out = args.out or f"{args.config}.mat"
    save_flow(u, v, out)
    print(f"{args.config}: U in [{u.min():.3f}, {u.max():.3f}], "
          f"V in [{v.min():.3f}, {v.max():.3f}] -> {out}")


if __name__ == "__main__":
    main()
