#!/usr/bin/env python3
"""One-claim TPU drive: verify the public API end-to-end (flipped HS Pallas
default), then run the LS size-scaling probe and the batch-runner throughput
campaign in the same process so the device-pool claim queue is paid once.

    PALLAS_AXON_REMOTE_COMPILE=1 timeout 10800 python3 scripts/session_drive.py
"""

import os
import runpy
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import signal

    def on_alarm(signum, frame):
        print("WATCHDOG: stage overran", flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(3600)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ofri_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t0 = time.perf_counter()
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    print(f"claimed in {time.perf_counter()-t0:.1f} s; device {jax.devices()[0]}",
          flush=True)

    # ---- verify drive: public API on the bundled PIV pair ----
    signal.alarm(3000)
    from opticalflow_ri_tpu import (
        GenericPyramidalOpticalFlowWrapper, HSOpticalFlowAlgoAdapter,
    )
    from opticalflow_ri_tpu.utils.io import load_image, save_flow

    p = "/root/reference/examples/testImages/Bits08/Ni06/parabolic01_%d.tif"
    im1, im2 = load_image(p % 0), load_image(p % 1)
    wrap = GenericPyramidalOpticalFlowWrapper(
        HSOpticalFlowAlgoAdapter([21.0], 600), filter_sigma=3.4, pyr_levels=1)
    U, V = wrap.calculateFlow(im1, im2)
    U, V = np.asarray(U), np.asarray(V)
    print(f"calculateFlow OK: U range [{U.min():.2f},{U.max():.2f}], "
          f"V range [{V.min():.2f},{V.max():.2f}]", flush=True)
    save_flow(U, V, "/tmp/verify_out.mat")

    from opticalflow_ri_tpu.oracle.horn_schunck import OracleHSAdapter
    from opticalflow_ri_tpu.oracle.pyramid import pyramidal_optical_flow

    oU, oV = pyramidal_optical_flow(
        im1, im2, 3.4, OracleHSAdapter([21.0], 600), 1, 1)
    aee = float(np.mean(np.hypot(U - oU, V - oV)))
    print(f"verify golden AEE vs oracle: {aee:.2e}", flush=True)
    assert aee < 1e-5, aee

    # ---- LS size scaling probe ----
    signal.alarm(0)
    runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "ls_size_scaling.py"), run_name="__main__")

    # ---- batch-runner throughput campaign ----
    runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "runner_throughput.py"), run_name="__main__")

    print("SESSION_DRIVE_DONE", flush=True)


if __name__ == "__main__":
    main()
