#!/usr/bin/env python3
"""End-to-end FlowBatchRunner throughput on a synthetic TIFF campaign.

Demonstrates that the production batch runner (scan_pipeline streaming +
host prefetch + checkpointing + .mat outputs) sustains the streamed bench
throughput on real files, not just on pre-staged device arrays.  Writes one
JSON artifact (scripts/runner_throughput.json) with pairs/s and Mpix/s for
the compute path and for the whole campaign including IO.

Run ON THE TPU:

    PALLAS_AXON_REMOTE_COMPILE=1 timeout 3600 python3 scripts/runner_throughput.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "runner_throughput.json")

N_PAIRS = int(os.environ.get("RUNNER_PAIRS", "64"))
BATCH = int(os.environ.get("RUNNER_BATCH", "16"))
SIDE = int(os.environ.get("RUNNER_SIDE", "512"))
CONFIG = os.environ.get("RUNNER_CONFIG", "PyHSchunck_Fs3_4")


def main():
    if os.environ.get("RUNNER_CPU") == "1":  # smoke-test mode
        import jax

        jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    from opticalflow_ri_tpu.harness.batch_runner import FlowBatchRunner, pairs_from_glob
    from opticalflow_ri_tpu.utils.synthetic import particle_image_pair

    data_dir = tempfile.mkdtemp(prefix="ofri_campaign_")
    out_dir = tempfile.mkdtemp(prefix="ofri_flow_")
    try:
        for i in range(N_PAIRS):
            im1, im2, _, _ = particle_image_pair(shape=(SIDE, SIDE), seed=i)
            Image.fromarray(im1.astype(np.uint8)).save(
                os.path.join(data_dir, f"pair{i:04d}_0.tif"))
            Image.fromarray(im2.astype(np.uint8)).save(
                os.path.join(data_dir, f"pair{i:04d}_1.tif"))

        pairs = pairs_from_glob(os.path.join(data_dir, "*_0.tif"),
                                os.path.join(data_dir, "*_1.tif"))
        assert len(pairs) == N_PAIRS

        # warm-up run compiles the scan pipeline (separate output dir so the
        # timed campaign starts from a clean checkpoint)
        warm = FlowBatchRunner(CONFIG, batch_size=BATCH,
                               output_dir=os.path.join(out_dir, "warm"),
                               save_outputs=False)
        warm.run(pairs[:BATCH])

        runner = FlowBatchRunner(CONFIG, batch_size=BATCH,
                                 output_dir=os.path.join(out_dir, "run"),
                                 save_outputs=True)
        t0 = time.perf_counter()
        state = runner.run(pairs)
        wall = time.perf_counter() - t0

        done = len(state["done"])
        mpix = SIDE * SIDE / 1e6
        result = {
            "config": CONFIG,
            "pairs": done,
            "failed": len(state["failed"]),
            "batch_size": BATCH,
            "image": f"{SIDE}x{SIDE} synthetic TIFF",
            "campaign_wall_seconds": wall,
            "compute_wait_seconds": state.get("compute_wait_s"),
            "transfer_save_seconds": state.get("transfer_save_s"),
            "pairs_per_s_wall": done / wall,
            "mpix_per_s_wall": done * mpix / wall,
            "mat_outputs_written": done,
        }
        assert done == N_PAIRS and not state["failed"], state
        with open(OUT, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
